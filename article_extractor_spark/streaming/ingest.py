"""Structured Streaming surfaces.

The reference engine is batch-only (SURVEY.md §2.3: the BFS crawler is
its only unbounded dataflow), but the natural Spark deployment of this
engine at 10^12 documents is incremental: new corpus files land in the
bucketed table and a `Trigger.AvailableNow` stream drains whatever is
available, extracts it, and checkpoints — the streaming analog of the
job's lineage/resume protocol (reference storage_queue.py:87-293).

Two surfaces:

- ``streaming_extraction`` — readStream over the corpus table → the same
  mapInArrow extraction stage (DataFrame code is identical in batch and
  streaming) → parquet sink with checkpoint.  ``Trigger.AvailableNow``
  processes the backlog then stops; re-running resumes from the
  checkpoint and processes only new files.
- ``windowed_event_rates`` — watermarked tumbling-window aggregation
  (the streaming form of the reference's rate-limiter event window,
  rate_limiter.py:111-118): late events beyond the watermark are
  dropped, state is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import extract_articles, render_spans_to_html


def streaming_extraction(
    spark: SparkSession,
    corpus_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    min_word_count: int = 150,
    max_files_per_trigger: int | None = None,
):
    """Incrementally extract newly-landed corpus files.

    Returns the started StreamingQuery (AvailableNow: drains the current
    backlog and stops; the checkpoint makes re-runs incremental).
    """
    static = spark.read.parquet(corpus_path)
    reader = (
        spark.readStream.schema(static.schema)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    corpus = reader.parquet(corpus_path)

    if "html" not in corpus.columns:
        corpus = render_spans_to_html(corpus)
    if "url" not in corpus.columns:
        corpus = corpus.withColumn("url", F.lit(""))
    extracted = extract_articles(corpus, min_word_count=min_word_count)

    return (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_rates(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window event counts per user.

    Works on both a static and a streaming ``events`` DataFrame (same
    plan); with a stream, state for windows older than the watermark is
    evicted, so memory is bounded regardless of run length.
    """
    # parquet TIMESTAMP_NTZ → TIMESTAMP (session tz is pinned UTC);
    # watermarks require event-time on TIMESTAMP
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            "n_events",
        )
    )
