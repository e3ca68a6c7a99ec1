"""Two-parallelism scaling bench (north rule: ≥0.8 efficiency N→4N).

No real network cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the IDENTICAL extraction job on the
IDENTICAL input at two parallelism levels and comparing docs/sec
(BASELINE.md measurement protocol).  Two modes:

- default (threads): local[N] vs local[4N] — one JVM, task-slot scaling.
- ``--cluster`` (executors): local-cluster[1,C,M] vs
  local-cluster[4,C,M] — N vs 4N SEPARATE EXECUTOR JVMS with real
  serialized shuffle blocks, per-executor broadcast materialization,
  and executor-side python workers; the closest in-box analog of the
  north rule's "two cluster sizes".

Each configuration runs in its OWN subprocess → fresh JVM, no GC debt
or heap sizing inherited from the other configuration.  A warmup pass
inside each run excludes Python-worker spawn + import cost from the
timed window.

CPU pinning: ``local[N]`` bounds Spark TASK SLOTS, not the JVM's
scan/shuffle/GC threads or the OS — an unpinned "local[2]" run borrows
extra physical cores for JVM work, inflating the low configuration's
throughput and understating scaling efficiency.  A real N-core cluster
node has exactly N cores for EVERYTHING, so each measured subprocess is
pinned with ``taskset -c 0..N-1`` (disable with --no-pin).

Usage:
    python scripts/scaling_bench.py [--docs 240000] [--low 8] [--high 32]
        [--corpus PATH] [--trials 2] [--no-pin]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _pin_executors(spark, cores: int) -> int:
    """Pin this app's executor JVMs (and the python workers they later
    fork, which inherit affinity) to cores 0..cores-1 — the N-core
    cluster budget.  The driver, standalone master and worker daemons
    stay UNPINNED: on a real cluster those live on other machines, and
    charging their CPU to the executor budget understates scaling (the
    whole-subprocess taskset did exactly that: 4 executor JVMs + driver
    + 5 daemon JVMs crammed into the 8-core pin)."""
    import subprocess as sp
    from pathlib import Path

    app_id = spark.sparkContext.applicationId
    pids = []
    out = sp.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    ).stdout
    for tok in out.split():
        try:
            cmdline = Path(f"/proc/{tok}/cmdline").read_bytes().decode(
                "utf-8", "replace"
            )
        except OSError:
            continue
        if app_id in cmdline:
            pids.append(int(tok))
    for pid in pids:
        sp.run(
            ["taskset", "-a", "-p", "-c", f"0-{cores - 1}", str(pid)],
            capture_output=True,
        )
    return len(pids)


def single_run(
    cores: int,
    corpus_path: str,
    out_path: str,
    master: str | None = None,
    pin_executors: bool = False,
) -> None:
    """Executed in a fresh subprocess: warmup, run job, print wall."""
    from pyspark.sql import functions as F

    from article_extractor_spark.job import run_extraction_job
    from article_extractor_spark.operators.extraction import (
        extract_articles,
        render_spans_to_html,
    )
    from article_extractor_spark.session import build_session

    spark = build_session(
        app_name=f"scaling-{cores}", cores=None if master else cores,
        master=master,
    )
    cores = spark.sparkContext.defaultParallelism
    if pin_executors and shutil.which("taskset"):
        n_pinned = _pin_executors(spark, cores)
        print(f"pinned {n_pinned} executor JVMs to 0-{cores - 1}",
              file=sys.stderr)
    warm = spark.read.parquet(corpus_path).limit(64 * cores)
    warm = render_spans_to_html(warm).withColumn("url", F.lit(""))
    extract_articles(warm.repartition(cores), min_word_count=10).write.format(
        "noop"
    ).mode("overwrite").save()

    shutil.rmtree(out_path, ignore_errors=True)
    t0 = time.time()
    stats = run_extraction_job(
        spark,
        corpus_path,
        out_path,
        run_id=f"scale-{cores}",
        waves=1,
        resume=False,
        min_word_count=10,
    )
    wall = time.time() - t0
    print(
        "RESULT "
        + json.dumps(
            {
                "cores": cores,
                "wall_sec": round(wall, 2),
                "docs": stats["docs_processed"],
            }
        )
    )


def one_trial(
    cores: int,
    corpus_path: str,
    out_path: str,
    pin: bool,
    master: str | None = None,
) -> dict | None:
    # thread mode: pin the whole subprocess (one JVM = the whole
    # "cluster").  cluster mode: launch unpinned and let the child pin
    # ONLY its executor JVMs to the core budget (_pin_executors).
    pin_prefix = (
        ["taskset", "-c", f"0-{cores - 1}"]
        if pin and not master and shutil.which("taskset")
        else []
    )
    proc = subprocess.run(
        pin_prefix
        + [
            sys.executable,
            __file__,
            "--single-cores",
            str(cores),
            "--corpus",
            corpus_path,
            "--out",
            out_path,
        ]
        + (["--single-master", master] if master else [])
        + (["--pin-executors"] if pin and master else []),
        capture_output=True,
        text=True,
        cwd=str(REPO),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    if proc.returncode != 0:
        sys.stderr.write(
            f"trial failed (cores={cores}):\n{proc.stderr[-2000:]}\n"
        )
    return None


def run_configs(
    low_cores: int,
    high_cores: int,
    corpus_path: str,
    workdir: str,
    trials: int,
    pin: bool = True,
    masters: dict[int, str] | None = None,
) -> tuple[dict, dict]:
    """INTERLEAVED trials: low, high, low, high, …  The box's
    multi-minute drift phases (same config measured 27–78 s back to
    back) would otherwise land entirely on whichever config ran
    second; alternating puts both configs through the same phases and
    best-of-N picks each one's quiet-window number."""
    best: dict[int, dict | None] = {low_cores: None, high_cores: None}
    for trial in range(trials):
        for cores in (low_cores, high_cores):
            r = one_trial(
                cores,
                corpus_path,
                f"{workdir}/out-{cores}",
                pin,
                master=(masters or {}).get(cores),
            )
            if r is None:
                continue
            print(
                f"trial {trial} cores={cores}: {r['wall_sec']}s",
                file=sys.stderr,
            )
            if best[cores] is None or r["wall_sec"] < best[cores]["wall_sec"]:
                best[cores] = r
    for cores, r in best.items():
        if r is None:
            raise RuntimeError(f"all trials failed (cores={cores})")
        r["docs_per_sec"] = round(r["docs"] / r["wall_sec"], 1)
    return best[low_cores], best[high_cores]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--no-pin", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--single-cores", type=int, default=None)
    ap.add_argument("--single-master", default=None)
    ap.add_argument("--pin-executors", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--cluster",
        action="store_true",
        help="scale EXECUTOR JVMS, not threads: low = "
        "local-cluster[1,C,M] vs high = local-cluster[4,C,M] — the "
        "north rule's N vs 4N executors with real serialized "
        "shuffles and per-executor broadcasts",
    )
    ap.add_argument(
        "--exec-cores", type=int, default=8,
        help="cores per executor JVM in --cluster mode",
    )
    ap.add_argument(
        "--exec-mem", type=int, default=6144,
        help="MiB per executor JVM in --cluster mode",
    )
    args = ap.parse_args()

    if args.single_cores is not None:
        single_run(
            args.single_cores, args.corpus, args.out,
            master=args.single_master,
            pin_executors=args.pin_executors,
        )
        return 0

    masters = None
    if args.cluster:
        c, m = args.exec_cores, args.exec_mem
        args.low, args.high = 1 * c, 4 * c
        masters = {
            args.low: f"local-cluster[1,{c},{m}]",
            args.high: f"local-cluster[4,{c},{m}]",
        }

    workdir = tempfile.mkdtemp(prefix="aes-scaling-")
    corpus_path = args.corpus or f"{workdir}/corpus"
    try:
        if not args.corpus:
            from article_extractor_spark.session import build_session
            from article_extractor_spark.sources import tableio
            from article_extractor_spark.sources.synth import corpus_dataframe

            spark = build_session(app_name="scaling-gen", cores=args.high)
            df = corpus_dataframe(spark, args.docs, seed=42)
            df = tableio.with_bucket(df, "doc_id", tableio.DEFAULT_BUCKETS)
            tableio.write_bucketed(df, corpus_path, dynamic=False)
            spark.stop()

        low, high = run_configs(
            args.low, args.high, corpus_path, workdir, args.trials,
            pin=not args.no_pin, masters=masters,
        )

        speedup = high["docs_per_sec"] / low["docs_per_sec"]
        ratio = args.high / args.low
        eff = speedup / ratio
        result = {
            "mode": "executors" if args.cluster else "threads",
            "masters": masters,
            "docs": args.docs,
            "pinned": not args.no_pin and bool(shutil.which("taskset")),
            "low": low,
            "high": high,
            "speedup": round(speedup, 3),
            "parallelism_ratio": ratio,
            "scaling_efficiency": round(eff, 3),
            "pass": eff >= 0.8,
        }
        line = json.dumps(result)
        print(line)
        # Persist the measurement so bench.py can embed the latest
        # scaling record into BENCH.json — the north rule's two-cluster
        # criterion then rides the same driver-parsed artifact as the
        # throughput numbers.
        if args.cluster:
            result["protocol"] = (
                "scripts/scaling_bench.py --cluster: identical "
                f"extraction job at {masters[args.low]} (N=1 executor "
                f"JVM) and {masters[args.high]} (4N executor JVMs), "
                "EXECUTOR JVMs (and their forked python workers) "
                "taskset-pinned to the cluster-core budget, driver + "
                "standalone daemons unpinned (separate machines on a "
                "real cluster), fresh JVMs per config, INTERLEAVED "
                f"trials (low,high x{args.trials}) so box drift phases "
                "hit both configs, best per config"
            )
        else:
            result["protocol"] = (
                "scripts/scaling_bench.py: identical extraction job at "
                f"local[{args.low}] and local[{args.high}], CPU-pinned "
                "subprocesses (taskset), fresh JVM per config, "
                f"INTERLEAVED trials (low,high x{args.trials}) so box "
                "drift phases hit both configs, best per config"
            )
        result["measured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        )
        out_name = "SCALING_CLUSTER.json" if args.cluster else "SCALING.json"
        try:
            (REPO / out_name).write_text(json.dumps(result) + "\n")
        except OSError:
            pass
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
