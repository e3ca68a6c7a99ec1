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

# Minimum compressed bytes a re-spread task should carry.  Task launch
# costs ~5-10 ms of pure scheduling; on a small table the full
# cores*_WAVES width is all overhead (measured +0.84 s at 128 tasks vs
# +0.27 s at 32 on a sub-second query over a 6 MB table), and
# ITERATIVE consumers (PageRank, connected components, k-means) pay
# the width again every iteration.  A byte-sized width keeps the floor
# at exactly ``cores`` for small inputs and full width for big ones.
_TARGET_BYTES_PER_TASK = 2 << 20


# (cache_key, applicationId) -> respread width (0 = no floor needed);
# planning the RDD to count partitions costs ~100 ms, so per-path
# decisions are memoized for repeated load() calls inside one session
_FLOOR_WIDTH: dict[tuple[str, str], int] = {}


def _width(cores: int, size_bytes: int | None) -> int:
    if size_bytes is None:
        return cores * _WAVES
    by_bytes = (size_bytes + _TARGET_BYTES_PER_TASK - 1) // (
        _TARGET_BYTES_PER_TASK
    )
    return max(cores, min(cores * _WAVES, int(by_bytes)))


def ensure_compute_parallelism(
    df: DataFrame,
    cache_key: str | None = None,
    size_bytes: int | None = None,
) -> DataFrame:
    """Round-robin ``df`` across the cluster when its planned partition
    count is below ``defaultParallelism``; identity otherwise.  Call on
    the PRUNED projection feeding a CPU-bound ``mapInArrow`` stage, so
    only consumed columns cross the shuffle.  Pass ``size_bytes`` (the
    table's compressed on-disk size) when known so the re-spread width
    is sized to the data instead of the full cores*_WAVES fan."""
    if df.isStreaming:
        # Streaming plans cannot be inspected via .rdd, and micro-batch
        # parallelism is governed by the source (maxFilesPerTrigger /
        # file-split sizing), not by a static floor.
        return df
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if cache_key is not None:
        key = (cache_key, sc.applicationId)
        width = _FLOOR_WIDTH.get(key)
        if width is None:
            width = (
                _width(cores, size_bytes)
                if df.rdd.getNumPartitions() < cores
                else 0
            )
            _FLOOR_WIDTH[key] = width
    else:
        width = (
            _width(cores, size_bytes)
            if df.rdd.getNumPartitions() < cores
            else 0
        )
    if width:
        return df.repartition(width)
    return df


def table_size_bytes(spark, path: str) -> int | None:
    """Compressed on-disk size of ``path`` via the Hadoop FileSystem
    API (works for local, HDFS, and object stores alike); None if the
    path cannot be summed (size hints are best-effort)."""
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(p).getLength())
    except Exception:
        return None
