"""Spark-free scaling control: the box's own N→4N ceiling.

The north rule's two-cluster criterion is evidenced on this single box
by running the identical job at local[N] and local[4N]
(scripts/scaling_bench.py).  A single box is NOT two clusters: all
cores share one memory bus, so past some docs/sec the wall is memory
bandwidth, not the engine — and every time the extraction kernel gets
faster, that wall moves DOWN to lower core counts (BASELINE.md
"Methodology fix" section measured exactly this when the fast
tokenizer landed).

This control separates the two effects.  It runs the IDENTICAL
per-document Python kernel (``extract_document`` over the same
synthesized corpus, HTML pre-rendered and held in memory — no Spark,
no JVM, no Arrow, no scheduler) under a plain ``multiprocessing``
fork pool pinned to cores 0..N-1, at both parallelism levels.  The
resulting ratio is the best ANY engine could scale this kernel on
this box; the Spark job's efficiency divided by it is the
engine-attributable share.  On the criterion's actual target (N vs 4N
executor NODES, memory bandwidth scaling with node count) the box
ceiling does not exist.

Usage:
    python scripts/control_bench.py [--docs 240000] [--low 2] [--high 8]
        [--trials 3]

Prints one JSON line and updates CONTROL.json.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_DOCS: list[tuple[str, str]] = []  # (doc_id, html), set before fork


def _worker(span: tuple[int, int]) -> int:
    from article_extractor_spark.extract.pipeline import (
        ExtractOptions,
        extract_document,
    )

    opts = ExtractOptions(min_word_count=10)
    lo, hi = span
    n = 0
    for _doc_id, html in _DOCS[lo:hi]:
        extract_document(html, "", opts)
        n += 1
    return n


def _render_corpus(docs: int) -> list[tuple[str, str]]:
    """Synthesize the same corpus scaling_bench.py uses (seed 42) and
    render spans → HTML once, outside the timed window."""
    from article_extractor_spark.operators.extraction import (
        render_spans_to_html,
    )
    from article_extractor_spark.session import build_session
    from article_extractor_spark.sources.synth import corpus_dataframe

    spark = build_session(app_name="control-gen", cores=os.cpu_count())
    df = corpus_dataframe(spark, docs, seed=42)
    rows = render_spans_to_html(df).select("doc_id", "html").collect()
    out = [(r["doc_id"], r["html"]) for r in rows]
    spark.stop()
    return out


def run_level(procs: int, trials: int, chunks_per_proc: int = 12) -> dict:
    # pick N cpus from the ALLOWED set (a cpuset-restricted container
    # may not own cpu 0) and restore the original mask afterwards
    allowed = sorted(os.sched_getaffinity(0))
    if procs > len(allowed):
        raise SystemExit(
            f"--procs {procs} exceeds the {len(allowed)} allowed CPUs"
        )
    os.sched_setaffinity(0, set(allowed[:procs]))
    try:
        n = len(_DOCS)
        n_chunks = procs * chunks_per_proc
        bounds = [
            (i * n // n_chunks, (i + 1) * n // n_chunks)
            for i in range(n_chunks)
        ]
        best = None
        for _ in range(trials):
            with mp.get_context("fork").Pool(procs) as pool:
                pool.map(_worker, bounds[: procs])  # warmup: first slice
                t0 = time.time()
                done = sum(pool.map(_worker, bounds))
                wall = time.time() - t0
            assert done == n
            if best is None or wall < best:
                best = wall
        return {
            "procs": procs,
            "wall_sec": round(best, 2),
            "docs": n,
            "docs_per_sec": round(n / best, 1),
        }
    finally:
        os.sched_setaffinity(0, set(allowed))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    global _DOCS
    _DOCS = _render_corpus(args.docs)

    low = run_level(args.low, args.trials)
    high = run_level(args.high, args.trials)
    speedup = high["docs_per_sec"] / low["docs_per_sec"]
    ratio = args.high / args.low
    result = {
        "kernel": "extract_document (pure Python, no Spark/JVM/Arrow)",
        "docs": args.docs,
        "low": low,
        "high": high,
        "speedup": round(speedup, 3),
        "parallelism_ratio": ratio,
        "ceiling_efficiency": round(speedup / ratio, 3),
        "measured_at": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
    }
    print(json.dumps(result))
    try:
        (REPO / "CONTROL.json").write_text(json.dumps(result) + "\n")
    except OSError:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
