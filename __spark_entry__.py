"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interleaved-extraction pipeline on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator (SURVEY.md §2 dataflow operators, text analysis, dedup family,
similarity search, multimodal plumbing, and the end-to-end extraction
engine) with exact DuckDB oracles where SQL can express the semantics.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from article_extractor_spark.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERY_FNS,
    extract_spans_raw,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over an interleaved text+media span
    corpus built from /root/testdata/sf0.001/documents.parquet.
    Returns the raw nested span output; the registered
    ``extract_spans_full`` query serializes the nested columns for the
    driver's canonicalization."""
    return extract_spans_raw(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
