"""Grouped-map (applyInPandas) operators.

Demonstrates the third vectorized-Python surface (after mapInArrow and
scalar pandas_udf): per-group pandas computation with Arrow transport.
Used where per-group logic genuinely needs a dataframe view of the whole
group (here: medians/percentiles per source).  Aggregations that Spark
expresses natively (count/sum/avg) stay in JVM aggregates — this surface
is for the remainder.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GROUP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("median_tokens", T.DoubleType()),
        T.StructField("p90_chars", T.DoubleType()),
    ]
)


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    toks = pdf["n_tokens"].sort_values().reset_index(drop=True)
    chars = pdf["n_chars"].sort_values().reset_index(drop=True)
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "n_docs": [len(pdf)],
            # explicit linear-interpolation quantiles (match the SQL
            # oracle's quantile_cont semantics)
            "median_tokens": [float(toks.quantile(0.5, "linear"))],
            "p90_chars": [float(chars.quantile(0.9, "linear"))],
        }
    )


def source_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source document statistics via applyInPandas.

    The token/char counts are computed JVM-side first so only three
    small numeric columns cross the Arrow boundary — never the text.
    """
    from ..shipping import ensure_shipped
    from .text import token_count

    ensure_shipped(docs.sparkSession)
    slim = docs.select(
        F.col("source"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    stats = slim.groupBy("source").applyInPandas(
        _group_stats, schema=GROUP_STATS_SCHEMA
    )
    return stats.select(
        "source",
        "n_docs",
        F.round("median_tokens", 6).alias("median_tokens"),
        F.round("p90_chars", 6).alias("p90_chars"),
    )
