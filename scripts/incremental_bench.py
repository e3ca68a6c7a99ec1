"""Wave-incremental pipeline cost A/B (VERDICT r4 task #3): with a
large corpus already committed, a new crawl wave through
``run_pipeline_wave`` must cost a small fraction of re-running the
one-shot ``run_pipeline`` over (corpus + wave) — the repack-the-world
cost the incremental path exists to avoid.

Protocol: seed epoch 0 with the base corpus, then measure (a) the
incremental wave (extraction of the wave + state-probing curation +
epoch pack) and (b) the full recompute over base+wave files combined.
Same session, incremental wave measured FIRST so box drift, if
anything, inflates the number we claim is small.

Usage:
    python scripts/incremental_bench.py [--base-docs 480000]
        [--wave-docs 24000] [--chunk-tokens 512]

Prints one JSON line and writes INCREMENTAL.json.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-docs", type=int, default=480000)
    ap.add_argument("--wave-docs", type=int, default=24000)
    ap.add_argument("--chunk-tokens", type=int, default=512)
    args = ap.parse_args()

    from article_extractor_spark.pipeline import (
        run_pipeline,
        run_pipeline_wave,
    )
    from article_extractor_spark.session import build_session
    from article_extractor_spark.sources import tableio
    from article_extractor_spark.sources.synth import corpus_dataframe

    spark = build_session(app_name="incremental-bench")
    workdir = tempfile.mkdtemp(prefix="aes-incr-")
    try:
        base_path = f"{workdir}/base"
        wave_path = f"{workdir}/wave"
        df = corpus_dataframe(spark, args.base_docs, seed=42)
        tableio.write_bucketed(
            tableio.with_bucket(df, "doc_id"), base_path, dynamic=False
        )
        # wave ids disjoint from the base (base ids are synth-%09d of
        # 0..n-1; the wave re-seeds at a high offset via the same
        # generator run over a shifted range)
        wave = corpus_dataframe(spark, args.wave_docs, seed=7)
        from pyspark.sql import functions as F

        wave = wave.withColumn(
            "doc_id", F.concat(F.lit("wave-"), F.col("doc_id"))
        )
        tableio.write_bucketed(
            tableio.with_bucket(wave, "doc_id"), wave_path, dynamic=False
        )
        combined = f"{workdir}/combined"
        shutil.copytree(base_path, combined)
        shutil.copytree(wave_path, combined, dirs_exist_ok=True)

        out_inc = f"{workdir}/out-inc"
        t0 = time.time()
        m0 = run_pipeline_wave(
            spark, base_path, out_inc, min_word_count=10,
            chunk_tokens=args.chunk_tokens,
        )
        seed_sec = round(time.time() - t0, 2)

        t0 = time.time()
        m1 = run_pipeline_wave(
            spark, wave_path, out_inc, min_word_count=10,
            chunk_tokens=args.chunk_tokens,
        )
        wave_sec = round(time.time() - t0, 2)

        t0 = time.time()
        mf = run_pipeline(
            spark, combined, f"{workdir}/out-full", min_word_count=10,
            chunk_tokens=args.chunk_tokens,
        )
        full_sec = round(time.time() - t0, 2)

        result = {
            "base_docs": args.base_docs,
            "wave_docs": args.wave_docs,
            "wave_fraction": round(
                args.wave_docs / (args.base_docs + args.wave_docs), 4
            ),
            "seed_epoch_sec": seed_sec,
            "incremental_wave_sec": wave_sec,
            "full_recompute_sec": full_sec,
            "speedup_vs_full": round(full_sec / wave_sec, 2),
            "wave_kept": m1["kept_docs"],
            "full_kept": mf["kept_docs"],
            "cores": spark.sparkContext.defaultParallelism,
            "protocol": (
                "same session; incremental wave measured BEFORE the "
                "full recompute so drift inflates the incremental "
                "number if anything"
            ),
            "measured_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        line = json.dumps(result)
        print(line)
        # accumulate runs: the at-scale claim is the TREND (wave cost
        # ~flat as the committed corpus grows, full recompute linear),
        # which needs more than one base size in the record
        out = REPO / "INCREMENTAL.json"
        runs = []
        if out.exists():
            try:
                prev = json.loads(out.read_text())
                runs = prev.get("runs", [prev] if prev else [])
            except ValueError:
                pass
        runs.append(result)
        out.write_text(json.dumps({"runs": runs}) + "\n")
        return 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
