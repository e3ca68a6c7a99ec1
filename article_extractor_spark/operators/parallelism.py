"""Parallelism floor for CPU-bound Arrow stages.

Parquet splits are sized by COMPRESSED bytes, and compressible web
text hides ~50x its IO in extraction CPU — a 6 MB file holding 500k
documents plans 2 scan partitions and strands 30 of 32 cores for the
whole stage.  ``ensure_compute_parallelism`` re-spreads the pruned
input round-robin when (and only when) the planned partition count is
below the cluster's parallelism: the shuffle moves each payload ONCE
and is amortized many times over by the per-row parse/extract CPU it
unlocks (measured 130.8 s -> 13.4 s for extract_spans_full over 500k
docs on local[32]).

On a production-scale corpus the scan already has >= cores partitions
and this is a no-op — no Exchange enters the plan.  The batch job
path instead sizes scan partitions via spark.sql.files
.maxPartitionBytes (job.py), which avoids even the one shuffle; this
floor covers direct operator use where the session conf is not ours
to set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Waves of tasks per core after a re-spread: fine-grained enough that
# one slow partition cannot stall the stage, coarse enough that Arrow
# batching stays efficient.
_WAVES = 4


# (cache_key, applicationId) -> whether the floor is needed; planning
# the RDD to count partitions costs ~100 ms, so per-path decisions are
# memoized for repeated load() calls inside one session
_NEED_FLOOR: dict[tuple[str, str], bool] = {}


def ensure_compute_parallelism(
    df: DataFrame, cache_key: str | None = None
) -> DataFrame:
    """Round-robin ``df`` across the cluster when its planned partition
    count is below ``defaultParallelism``; identity otherwise.  Call on
    the PRUNED projection feeding a CPU-bound ``mapInArrow`` stage, so
    only consumed columns cross the shuffle."""
    if df.isStreaming:
        # Streaming plans cannot be inspected via .rdd, and micro-batch
        # parallelism is governed by the source (maxFilesPerTrigger /
        # file-split sizing), not by a static floor.
        return df
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if cache_key is not None:
        key = (cache_key, sc.applicationId)
        need = _NEED_FLOOR.get(key)
        if need is None:
            need = df.rdd.getNumPartitions() < cores
            _NEED_FLOOR[key] = need
    else:
        need = df.rdd.getNumPartitions() < cores
    if need:
        return df.repartition(cores * _WAVES)
    return df
