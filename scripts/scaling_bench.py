"""Two-parallelism scaling bench (north rule: ≥0.8 efficiency N→4N).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the IDENTICAL extraction job on the
IDENTICAL input at local[N] and local[4N] and comparing docs/sec
(BASELINE.md measurement protocol).

Usage:
    python scripts/scaling_bench.py [--docs 40000] [--low 8] [--high 32]

Prints one JSON line and (with --update-baseline) appends the measured
table to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_once(cores: int, corpus_path: str, out_path: str, docs: int) -> dict:
    from article_extractor_spark.job import run_extraction_job
    from article_extractor_spark.session import build_session

    spark = build_session(app_name=f"scaling-{cores}", cores=cores)
    t0 = time.time()
    stats = run_extraction_job(
        spark,
        corpus_path,
        out_path,
        run_id=f"scale-{cores}",
        waves=1,  # single wave: measure pure extraction throughput
        resume=False,
        min_word_count=10,
    )
    wall = time.time() - t0
    spark.stop()
    return {"cores": cores, "wall_sec": round(wall, 2), "docs": docs,
            "docs_per_sec": round(docs / wall, 1), **stats}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="aes-scaling-")
    corpus_path = f"{workdir}/corpus"
    try:
        # generate the shared deterministic corpus once (seeded synth)
        from article_extractor_spark.session import build_session
        from article_extractor_spark.sources import tableio
        from article_extractor_spark.sources.synth import corpus_dataframe

        spark = build_session(app_name="scaling-gen", cores=args.high)
        df = corpus_dataframe(spark, args.docs, seed=42)
        df = tableio.with_bucket(df, "doc_id", tableio.DEFAULT_BUCKETS)
        tableio.write_bucketed(df, corpus_path, dynamic=False)
        spark.stop()

        low = run_once(args.low, corpus_path, f"{workdir}/out-low", args.docs)
        high = run_once(args.high, corpus_path, f"{workdir}/out-high", args.docs)

        speedup = high["docs_per_sec"] / low["docs_per_sec"]
        ratio = args.high / args.low
        eff = speedup / ratio
        result = {
            "docs": args.docs,
            "low": low,
            "high": high,
            "speedup": round(speedup, 3),
            "parallelism_ratio": ratio,
            "scaling_efficiency": round(eff, 3),
            "pass": eff >= 0.8,
        }
        print(json.dumps(result))
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
