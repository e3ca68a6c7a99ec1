"""Interleaved A/B of the wave write path: classic repartition write
vs the bucket-aligned preshuffled write, alternating trials in one
session so the box's drift phases hit both arms equally.

Usage: python scripts/write_ab.py [--trials 4] [--corpus /tmp/phase-corpus]
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
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--corpus", default="/tmp/phase-corpus")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from article_extractor_spark import job as jobmod
    from article_extractor_spark.operators.extraction import (
        extract_articles,
        render_spans_to_html,
    )
    from article_extractor_spark.session import build_session
    from article_extractor_spark.sources import tableio

    spark = build_session(app_name="write-ab", cores=args.cores)

    warm = spark.read.parquet(args.corpus).limit(64 * args.cores)
    warm = render_spans_to_html(warm).withColumn("url", F.lit(""))
    extract_articles(warm.repartition(args.cores), min_word_count=10).write.format(
        "noop"
    ).mode("overwrite").save()

    del tableio  # arms are forced through the job's preshuffled param

    results = {"shuffled": [], "preshuffled": []}
    for trial in range(args.trials):
        for arm in ("shuffled", "preshuffled"):
            out = f"/tmp/write-ab-out-{arm}"
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            # force each arm explicitly — relying on the job's aligned
            # heuristic made a no-contrast run (both arms repartition)
            # silently measure nothing (ADVICE r4); stats echo the path
            stats = jobmod.run_extraction_job(
                spark,
                args.corpus,
                out,
                run_id=f"ab-{arm}-{trial}",
                waves=1,
                resume=False,
                min_word_count=10,
                preshuffled=arm == "preshuffled",
            )
            assert stats["preshuffled"] == (arm == "preshuffled"), stats
            dt = round(time.time() - t0, 2)
            results[arm].append(dt)
            print(f"trial {trial} {arm}: {dt}s", flush=True)

    summary = {
        arm: {"all": runs, "best": min(runs), "median": sorted(runs)[len(runs) // 2]}
        for arm, runs in results.items()
    }
    print("RESULT " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
