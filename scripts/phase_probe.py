"""Diagnose which phase of the extraction job stops scaling at high
core counts: time scan/render/extract/write variants on one corpus.

Usage: python scripts/phase_probe.py [--docs 240000] [--cores 32]
       [--corpus PATH] [--variant all|render|extract|job]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--corpus", default="/tmp/phase-corpus")
    ap.add_argument(
        "--variant",
        default="all",
        choices=[
            "all", "render", "extract", "job",
            "job_noop", "job_obs_noop", "job_write",
        ],
    )
    ap.add_argument("--out", default="/tmp/phase-out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from article_extractor_spark.job import run_extraction_job
    from article_extractor_spark.operators.extraction import (
        extract_articles,
        render_spans_to_html,
    )
    from article_extractor_spark.session import build_session
    from article_extractor_spark.sources import tableio
    from article_extractor_spark.sources.synth import corpus_dataframe

    spark = build_session(app_name="phase-probe", cores=args.cores)

    if not Path(args.corpus).exists():
        df = corpus_dataframe(spark, args.docs, seed=42)
        df = tableio.with_bucket(df, "doc_id", tableio.DEFAULT_BUCKETS)
        tableio.write_bucketed(df, args.corpus, dynamic=False)
        print(f"corpus written to {args.corpus}")

    # warmup python workers
    warm = spark.read.parquet(args.corpus).limit(64 * args.cores)
    warm = render_spans_to_html(warm).withColumn("url", F.lit(""))
    extract_articles(warm.repartition(args.cores), min_word_count=10).write.format(
        "noop"
    ).mode("overwrite").save()

    timings = {}

    def clock(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s")

    corpus = spark.read.parquet(args.corpus)

    if args.variant in ("all", "render"):
        clock(
            "scan_render_noop",
            lambda: render_spans_to_html(corpus)
            .withColumn("url", F.lit(""))
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    if args.variant in ("all", "extract"):
        def run_extract():
            df = render_spans_to_html(corpus).withColumn("url", F.lit(""))
            extract_articles(df, min_word_count=10).write.format(
                "noop"
            ).mode("overwrite").save()

        clock("scan_render_extract_noop", run_extract)

    if args.variant in ("job_noop", "job_obs_noop", "job_write"):
        # the job's own pipeline, built manually, materialized at
        # increasing completeness: extraction+bucket (job_noop),
        # +observation metrics (job_obs_noop), +parquet write
        # (job_write = everything but lineage/manifest)
        from pyspark.sql import Observation

        from article_extractor_spark.job import _bucket_metrics, _hll_metrics
        from article_extractor_spark.functions.sketches import HLL_M, hll_rho
        from article_extractor_spark.functions.text import md5_int
        from article_extractor_spark.sources.tableio import (
            dir_size_bytes,
            with_bucket,
        )

        total_bytes = dir_size_bytes(spark, args.corpus)
        target = min(
            max(total_bytes // (args.cores * 6), 1 << 20), 256 << 20
        )
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
        corpus2 = spark.read.parquet(args.corpus)
        corpus2 = render_spans_to_html(corpus2).withColumn("url", F.lit(""))

        def build(with_obs: bool):
            extracted = extract_articles(corpus2, min_word_count=10)
            extracted = with_bucket(extracted, "doc_id", 32)
            if not with_obs:
                return extracted, None
            obs = Observation(f"probe-{time.time()}")
            _h = md5_int(
                F.concat_ws(
                    "\x1f",
                    F.col("title"),
                    F.col("excerpt"),
                    F.col("word_count").cast("string"),
                )
            )
            extracted = extracted.withColumn(
                "_hll_reg", _h.bitwiseAND(F.lit(HLL_M - 1))
            ).withColumn("_hll_rho", hll_rho(_h))
            extracted = extracted.observe(
                obs, *_bucket_metrics(list(range(32))), *_hll_metrics()
            )
            return extracted.drop("_hll_reg", "_hll_rho"), obs

        if args.variant == "job_noop":
            df, _ = build(False)
            clock(
                "job_noop",
                lambda: df.write.format("noop").mode("overwrite").save(),
            )
        elif args.variant == "job_obs_noop":
            df, _ = build(True)
            clock(
                "job_obs_noop",
                lambda: df.write.format("noop").mode("overwrite").save(),
            )
        else:
            df, _ = build(True)
            shutil.rmtree(args.out, ignore_errors=True)
            from article_extractor_spark.sources.tableio import write_bucketed

            clock(
                "job_write",
                lambda: write_bucketed(
                    df, args.out, mode="append", dynamic=False,
                    n_buckets=32, preshuffled=True,
                ),
            )

    if args.variant in ("all", "job"):
        out = args.out
        shutil.rmtree(out, ignore_errors=True)

        def run_job():
            run_extraction_job(
                spark,
                args.corpus,
                out,
                run_id="probe",
                waves=1,
                resume=False,
                min_word_count=10,
            )

        clock("full_job", run_job)

    n = corpus.count()
    print(
        "RESULT "
        + json.dumps(
            {
                "docs": n,
                "cores": args.cores,
                "timings": timings,
                "docs_per_sec": {
                    k: round(n / v, 1) for k, v in timings.items()
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
