"""The end-to-end extraction job (spark-submit entry point).

    spark-submit --py-files aes.zip -m article_extractor_spark.job ...

Dataflow (one map stage + one tiny metrics shuffle; SURVEY.md §3.1/§4):

    read corpus (doc_id, spans)        # bucketed Parquet / Iceberg scan
      → skip committed buckets         # resume: lineage anti-join
      → render spans → html            # JVM-side, whole-stage codegen
      → mapInPandas extraction         # the single vectorized UDF stage
      → write bucketed output          # dynamic partition overwrite
      → aggregate + append lineage     # per-bucket metrics commit

Wave execution: buckets are processed in ``waves`` groups, each wave
committing its lineage after its output lands — a killed job resumes at
wave granularity, re-running only uncommitted buckets.
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extraction import extract_articles, render_spans_to_html
from .session import build_session
from .sources import tableio
from .sources.synth import corpus_dataframe


def run_extraction_job(
    spark: SparkSession,
    corpus: DataFrame | str,
    output_path: str,
    *,
    run_id: str = "run-0",
    n_buckets: int = tableio.DEFAULT_BUCKETS,
    waves: int = 4,
    min_word_count: int = 150,
    resume: bool = True,
) -> dict:
    """Run (or resume) extraction over a corpus table.

    Returns job stats: buckets processed/skipped, docs, wall seconds.
    """
    if isinstance(corpus, str):
        # CPU-bound UDF stage: size scan partitions for compute, not IO.
        # With the default 128m maxPartitionBytes a small corpus
        # collapses to a handful of map tasks and extra cores idle
        # (measured: local[32] no faster than local[8] on 240 MB).
        # Target ~6 waves of tasks per core (fine-grained enough that
        # giant-document skew can't leave a long straggler tail),
        # clamped to [1m, 256m]; at 100 TB the clamp leaves the normal
        # large-scan behavior.
        total_bytes = tableio.dir_size_bytes(spark, corpus)
        cores = spark.sparkContext.defaultParallelism
        target = min(max(total_bytes // (cores * 6), 1 << 20), 256 << 20)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
        corpus = tableio.read_table(spark, corpus)

    if "bucket" not in corpus.columns:
        corpus = tableio.with_bucket(corpus, "doc_id", n_buckets)
    if "html" not in corpus.columns:
        corpus = render_spans_to_html(corpus)
    if "url" not in corpus.columns:
        corpus = corpus.withColumn("url", F.lit(""))

    committed = (
        tableio.read_committed_buckets(spark, output_path) if resume else set()
    )
    todo = [b for b in range(n_buckets) if b not in committed]

    t0 = time.time()
    docs_done = 0
    observed: list[dict] = []
    waves = max(1, min(waves, len(todo))) if todo else 0
    for wave_idx in range(waves):
        wave_buckets = todo[wave_idx::waves]
        wave_df = corpus.where(F.col("bucket").isin(wave_buckets))
        extracted = extract_articles(
            wave_df, min_word_count=min_word_count
        )
        # free metrics piggybacked on the write action (D21 analog:
        # observability.py counters) — no extra pass over the data
        from pyspark.sql import Observation

        obs = Observation(f"wave-{wave_idx}")
        extracted = extracted.observe(
            obs,
            F.count(F.lit(1)).alias("docs"),
            F.sum((~F.col("success")).cast("long")).alias("failures"),
            F.sum("spans_emitted").alias("spans"),
        )
        # re-derive bucket from doc_id (mapInPandas output dropped it);
        # same hash → same bucket, no join needed
        extracted = tableio.with_bucket(extracted, "doc_id", n_buckets)
        tableio.write_bucketed(
            extracted, output_path, mode="overwrite", dynamic=True
        )
        # one scan of the written output feeds both the lineage commit
        # and the progress count (lineage is N_buckets rows — tiny)
        result = tableio.read_table(spark, output_path).where(
            F.col("bucket").isin(wave_buckets)
        )
        lineage = tableio.build_lineage(result, run_id)
        lineage_rows = lineage.collect()
        tableio.append_lineage(
            spark.createDataFrame(lineage_rows, tableio.LINEAGE_SCHEMA),
            output_path,
        )
        docs_done += sum(r["docs_in"] for r in lineage_rows)
        observed.append({"wave": wave_idx, **obs.get})

    return {
        "observed_metrics": observed,
        "run_id": run_id,
        "buckets_total": n_buckets,
        "buckets_skipped": len(committed),
        "buckets_processed": len(todo),
        "docs_processed": docs_done,
        "wall_sec": round(time.time() - t0, 2),
    }


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="article-extractor-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_synth = sub.add_parser("synth", help="generate a synthetic corpus table")
    p_synth.add_argument("--out", required=True)
    p_synth.add_argument("--docs", type=int, default=10000)
    p_synth.add_argument("--seed", type=int, default=42)
    p_synth.add_argument("--buckets", type=int, default=tableio.DEFAULT_BUCKETS)
    p_synth.add_argument(
        "--files-per-bucket",
        type=int,
        default=1,
        help="output files per bucket dir (Iceberg-like layout)",
    )

    p_run = sub.add_parser("extract", help="run the extraction job")
    p_run.add_argument("--corpus", required=True)
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--run-id", default="run-0")
    p_run.add_argument("--buckets", type=int, default=tableio.DEFAULT_BUCKETS)
    p_run.add_argument("--waves", type=int, default=4)
    p_run.add_argument("--no-resume", action="store_true")

    args = parser.parse_args(argv)
    spark = build_session(app_name=f"aes-{args.cmd}")

    if args.cmd == "synth":
        df = corpus_dataframe(spark, args.docs, seed=args.seed)
        df = tableio.with_bucket(df, "doc_id", args.buckets)
        tableio.write_bucketed(
            df, args.out, dynamic=False,
            files_per_bucket=args.files_per_bucket,
        )
        print(f"wrote {args.docs} docs to {args.out}")
        return 0

    stats = run_extraction_job(
        spark,
        args.corpus,
        args.out,
        run_id=args.run_id,
        n_buckets=args.buckets,
        waves=args.waves,
        resume=not args.no_resume,
    )
    print(stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
