"""Data-size scaling probe for the corpus-wide dedup family.

The north rule's scaling criterion is about CLUSTER size (covered by
scripts/scaling_bench.py); this probe evidences the complementary claim
the dedup docstrings make — that work grows ~linearly with DATA size —
by running the identical query on 1x and Kx replicas of the documents
table and reporting the wall-time ratio.  A shape with a hidden
quadratic (uncapped bucket joins, corpus-wide windows) shows a ratio
>> K; the capped/partial-agg shapes should land at or below K (fixed
per-query overhead amortizes).

Replicas are made INDEPENDENT corpora, not exact duplicates: every
token gets a replica-index suffix, so replicating does not flood the
LSH buckets with identical documents (that adversarial case is covered
separately by the bucket-cap tests) and the Kx run is honestly K times
the workload of the 1x run.

Both measured sizes must be COMPUTE-dominated or the ratio is
meaningless: at sf0.1, 1x (5k docs) is fixed-overhead-dominated and
shows ratio ~1 at any K — so the probe compares --k-low and --k-high
(default 4x vs 16x = 20k vs 80k docs), where the bar is
k_high / k_low.

Usage: python scripts/dedup_scaling.py [--sf-dir /root/testdata/sf0.1]
       [--k-low 4] [--k-high 16] [--trials 2] [--queries ...]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_QUERIES = (
    "minhash_pairs",
    "exact_substring_dedup",
    "line_dedup",
    "dup_ngram_stats",
    "exact_dedup",
    "simhash_pairs",
)


def replicate(spark, sf_dir: str, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    reps = []
    for i in range(k):
        # remap the vocabulary per replica: suffix every token with the
        # replica index so shingles/windows/lines never collide across
        # replicas — Kx data is K independent corpora in one table
        remapped = docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), "\\s+"),
                    lambda t: F.concat(t, F.lit(str(i))),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        reps.append(remapped)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k-low", type=int, default=4)
    ap.add_argument("--k-high", type=int, default=16)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    from article_extractor_spark.queries import QUERY_FNS
    from article_extractor_spark.session import build_session

    spark = build_session(app_name="dedup-scaling")
    names = [q for q in args.queries.split(",") if q]

    tmp = tempfile.mkdtemp(prefix="dedup_scaling_")
    results: dict[str, dict] = {}
    try:
        dirs = {}
        for k in (args.k_low, args.k_high):
            d = f"{tmp}/x{k}"
            replicate(spark, args.sf_dir, k, d)
            dirs[k] = d

        def force(df):
            df.write.format("noop").mode("overwrite").save()

        # warm the JVM + Python workers outside the timed window
        force(QUERY_FNS[names[0]](spark, dirs[args.k_low]))

        bar = args.k_high / args.k_low
        for name in names:
            row = {}
            for k in (args.k_low, args.k_high):
                best = None
                for _ in range(args.trials):
                    t0 = time.time()
                    force(QUERY_FNS[name](spark, dirs[k]))
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                row[f"t{k}"] = round(best, 3)
            row["ratio"] = round(
                row[f"t{args.k_high}"] / row[f"t{args.k_low}"], 2
            )
            row["linear_ok"] = row["ratio"] <= bar * 1.25
            results[name] = row
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "dedup wall-time ratio k_high/k_low data "
                          "(linear bar = k_high/k_low)",
                "k_low": args.k_low,
                "k_high": args.k_high,
                "sf_dir": args.sf_dir,
                "queries": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
