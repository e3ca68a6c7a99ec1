"""JSONL shard export — the standard training-data interchange
artifact (one JSON object per line, fixed-count shard files with
deterministic names, plus a manifest).  The reference ships Markdown
files (crawler.py:354-423, the sibling sink); LLM data pipelines ship
``shard-00042-of-00256.jsonl``.

Spark-first split (same shape as the markdown sink):

- **the JSON line is a Column expression** (``to_json(struct(...))``,
  JVM-side, whole-stage codegen) — key order is the struct field
  order, so lines are deterministic and oracle-checkable;
- **shard assignment is a pure function of the id** (md5-derived hash
  mod ``n_shards``) — re-runs and resumes land every document in the
  same shard regardless of partitioning;
- **file IO is one ``applyInPandas`` group per shard** — each task
  owns exactly one shard file, writes it atomically (temp + rename),
  and emits one manifest row.  Lines are sorted by id within the
  shard so the artifact is byte-identical across runs.

Scale: one shuffle on the shard key.  Size ``n_shards`` so a shard
fits an executor (corpus_bytes / target_shard_bytes — e.g. 100 TB at
1 GiB shards → ~100k shards); the per-shard group then bounds task
memory the same way the target shard size bounds the file.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import md5_int

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("file", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def shard_of(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard id: md5-derived 60-bit hash mod n_shards —
    a pure function of the document id (never of the partitioning)."""
    return F.pmod(md5_int(id_col.cast("string")), F.lit(n_shards)).cast(
        "int"
    )


def shard_filename(shard: int, n_shards: int) -> str:
    return f"shard-{shard:05d}-of-{n_shards:05d}.jsonl"


def jsonl_line(*fields: Column) -> Column:
    """One JSON object per document; key order = argument order."""
    return F.to_json(F.struct(*fields))


def _shard_writer(out_dir: str, n_shards: int):
    def write(batch: pd.DataFrame) -> pd.DataFrame:
        shard = int(batch["shard"].iloc[0])
        fname = shard_filename(shard, n_shards)
        ordered = batch.sort_values("sort_key", kind="mergesort")
        data = ("\n".join(ordered["line"]) + "\n").encode("utf-8")
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".{fname}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, os.path.join(out_dir, fname))
        return pd.DataFrame(
            {
                "shard": pd.Series([shard], dtype="int32"),
                "file": [fname],
                "n_docs": pd.Series([len(batch)], dtype="int64"),
                "n_bytes": pd.Series([len(data)], dtype="int64"),
            }
        )

    return write


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Export ``df`` as sharded JSONL; every column becomes a JSON
    key (in DataFrame column order).  Returns the manifest DataFrame
    (shard, file, n_docs, n_bytes) — an action on it performs the IO.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    payload = df.select(
        shard_of(F.col(id_col), n_shards).alias("shard"),
        F.col(id_col).cast("string").alias("sort_key"),
        jsonl_line(*[F.col(c) for c in df.columns]).alias("line"),
    )
    return payload.groupBy("shard").applyInPandas(
        _shard_writer(out_dir, n_shards), schema=MANIFEST_SCHEMA
    )
