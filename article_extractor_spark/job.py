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

from .operators.extraction import (
    extract_articles,
    render_spans_to_html,
    resolve_giant_threshold,
)
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
    lineage_mode: str = "readback",
    emit_html: bool = False,
    emit_markdown: bool = False,
    emit_metadata: bool = False,
    markdown_dir: str | None = None,
    giant_threshold: int | str | None = "auto",
    preshuffled: bool | None = None,
) -> dict:
    """Run (or resume) extraction over a corpus table.

    Returns job stats: buckets processed/skipped, docs, wall seconds.

    ``giant_threshold`` routes documents above the threshold (bytes of
    HTML) through a salted extraction branch so several multi-MB giants
    can't pile onto one straggler task (2.45× measured on a skewed
    corpus, scripts/giant_bench.py).  The default ``"auto"`` derives
    the threshold — or declines to salt — from the first wave's own
    size distribution (``resolve_giant_threshold``; buckets are
    hash-random, so wave 0 is an unbiased sample and later waves reuse
    its answer for free).  Pass an int from ingest-time stats at scale,
    or ``None`` to disable.

    ``preshuffled`` overrides the bucket-aligned exchange-free write
    heuristic: ``None`` (default) auto-detects — the fast path engages
    only when the corpus came from a ``bucket=k``-partitioned PATH
    (physical task↔bucket alignment) AND a sampled check confirms its
    bucket values equal ``pmod(xxhash64(CAST(doc_id AS STRING)), N)``
    (a corpus bucketed with a different N, a foreign bucket column, or
    a native-numeric id hash all fail it — each would make the
    exchange-free write fan out tasks×buckets small files, ADVICE r4).
    ``True``/``False`` force the path (A/B harnesses).

    ``lineage_mode`` selects how per-bucket lineage metrics + the
    distinct-doc HLL are computed: ``"readback"`` (default) re-reads
    each wave's written output COLUMN-PRUNED (metric ints + short
    strings, ~1% of output bytes — parquet never materializes
    spans/html here) and aggregates with codegen'd hash aggregates,
    doubling as a write verification; ``"observe"`` rides the write
    action with per-bucket conditional aggregates — zero extra jobs,
    but CollectMetrics evaluates its expressions INTERPRETED, and the
    measured cost (~1.9 core-ms/doc at 240k docs, more than extraction
    itself) Amdahl-caps core-count scaling.  Both modes are pinned
    equal by test.

    ``emit_html`` / ``emit_markdown`` populate the rendered-output
    columns in the result table.  ``markdown_dir`` additionally runs the
    D4 markdown-file sink (reference crawler.py:354-423) per wave: one
    frontmatter-headed ``.md`` file per successful document, fed from
    the wave's WRITTEN output table (a cheap column-pruned re-read of
    url/title/markdown/word_count — never a re-extraction), with the
    file manifest appended under ``{markdown_dir}/_manifest``.  Implies
    ``emit_markdown``.
    """
    if markdown_dir:
        emit_markdown = True
    prev_mpb: str | None = None
    bucket_provenance = False
    if isinstance(corpus, str):
        corpus_path = corpus
        # CPU-bound UDF stage: size scan partitions for compute, not IO.
        # With the default 128m maxPartitionBytes a small corpus
        # collapses to a handful of map tasks and extra cores idle
        # (measured: local[32] no faster than local[8] on 240 MB).
        # Target ~6 waves of tasks per core (fine-grained enough that
        # giant-document skew can't leave a long straggler tail),
        # clamped to [1m, 256m]; at 100 TB the clamp leaves the normal
        # large-scan behavior.  The session-global override is restored
        # on exit (try/finally below) so later reads on a shared session
        # don't inherit tiny scan partitions.
        total_bytes = tableio.dir_size_bytes(spark, corpus)
        cores = spark.sparkContext.defaultParallelism
        target = min(max(total_bytes // (cores * 6), 1 << 20), 256 << 20)
        prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
        corpus = tableio.read_table(spark, corpus)
        # provenance half of the preshuffled gate: the corpus is
        # PHYSICALLY laid out as bucket=k dirs (a DataFrame corpus, or
        # a path with a mere bucket data column, never qualifies —
        # task splits there span buckets and the exchange-free write
        # would fan out tasks×buckets files)
        bucket_provenance = (
            "bucket" in corpus.columns
            and tableio.has_bucket_dirs(spark, corpus_path, n_buckets)
        )

    try:
        return _run_waves(
            spark,
            corpus,
            output_path,
            run_id=run_id,
            n_buckets=n_buckets,
            waves=waves,
            min_word_count=min_word_count,
            resume=resume,
            lineage_mode=lineage_mode,
            emit_html=emit_html,
            emit_markdown=emit_markdown,
            emit_metadata=emit_metadata,
            markdown_dir=markdown_dir,
            giant_threshold=giant_threshold,
            preshuffled=preshuffled,
            bucket_provenance=bucket_provenance,
        )
    finally:
        if prev_mpb is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


_METRIC_COLS = (
    "docs_in",
    "docs_ok",
    "parse_failures",
    "nodes_scored",
    "spans_emitted",
    "proc_us",
)


def _bucket_metrics(wave_buckets: list[int]) -> list:
    """Per-bucket conditional aggregates for one wave's Observation —
    lineage metrics ride the write action for free (D21 analog:
    observability.py counters), no second pass over the output."""
    metrics = []
    for b in wave_buckets:
        cond = F.col("bucket") == b
        metrics.extend(
            [
                F.sum(cond.cast("long")).alias(f"b{b}_docs_in"),
                F.sum(
                    F.when(cond, F.col("success").cast("long")).otherwise(0)
                ).alias(f"b{b}_docs_ok"),
                F.sum(
                    F.when(cond, (~F.col("success")).cast("long")).otherwise(0)
                ).alias(f"b{b}_parse_failures"),
                F.sum(F.when(cond, F.col("nodes_scored")).otherwise(0)).alias(
                    f"b{b}_nodes_scored"
                ),
                F.sum(F.when(cond, F.col("spans_emitted")).otherwise(0)).alias(
                    f"b{b}_spans_emitted"
                ),
                F.sum(F.when(cond, F.col("proc_us")).otherwise(0)).alias(
                    f"b{b}_proc_us"
                ),
                F.min(F.when(cond, F.col("doc_id"))).alias(
                    f"b{b}_doc_id_min"
                ),
                F.max(F.when(cond, F.col("doc_id"))).alias(
                    f"b{b}_doc_id_max"
                ),
            ]
        )
    return metrics


def _hll_metrics() -> list:
    """Wave-level HLL register maxima riding the SAME write-side
    Observation as the bucket metrics (one pass, zero extra jobs):
    one conditional ``max`` per register over the precomputed
    ``_hll_reg``/``_hll_rho`` columns.  Registers merge across waves
    driver-side by ``max`` (the standard HLL union — the same merge
    the streaming variant's GroupState does), giving the job a
    running distinct-document estimate in its stats without ever
    shuffling content keys."""
    from .functions.sketches import HLL_M

    return [
        F.max(
            F.when(F.col("_hll_reg") == j, F.col("_hll_rho"))
        ).alias(f"hllr_{j}")
        for j in range(HLL_M)
    ]


def _lineage_rows_from_observation(
    vals: dict, wave_buckets: list[int], run_id: str
) -> list[tuple]:
    from datetime import datetime, timezone

    now = datetime.now(timezone.utc)
    rows = []
    for b in wave_buckets:
        if not vals[f"b{b}_docs_in"]:
            # no docs seen for this bucket: do NOT commit it.  The wave
            # filter can't distinguish "bucket genuinely empty" from
            # "bucket missing from a partial/filtered corpus" (e.g. a
            # killed job's remnant), so an absent bucket stays
            # uncommitted and resume re-examines it — same contract as
            # the read-back path, which only saw written buckets.
            continue
        rows.append(
            (
                run_id,
                b,
                vals[f"b{b}_doc_id_min"],
                vals[f"b{b}_doc_id_max"],
                int(vals[f"b{b}_docs_in"] or 0),
                int(vals[f"b{b}_docs_ok"] or 0),
                int(vals[f"b{b}_parse_failures"] or 0),
                int(vals[f"b{b}_nodes_scored"] or 0),
                int(vals[f"b{b}_spans_emitted"] or 0),
                int(vals[f"b{b}_proc_us"] or 0) // 1000,
                now,
            )
        )
    return rows


def _run_waves(
    spark: SparkSession,
    corpus: DataFrame,
    output_path: str,
    *,
    run_id: str,
    n_buckets: int,
    waves: int,
    min_word_count: int,
    resume: bool,
    lineage_mode: str,
    emit_html: bool = False,
    emit_markdown: bool = False,
    emit_metadata: bool = False,
    markdown_dir: str | None = None,
    giant_threshold: int | str | None = "auto",
    preshuffled: bool | None = None,
    bucket_provenance: bool = False,
) -> dict:
    if "bucket" in corpus.columns:
        # The wave/lineage protocol needs corpus buckets to equal the
        # output table's string-hash re-derivation — otherwise a wave's
        # rows land in OTHER waves' output buckets and per-wave lineage
        # counts are garbage (ADVICE r4).  Sampled check (systematic
        # failure modes, so 128 first rows suffice); a misaligned
        # column is recomputed in place, trading partition pruning for
        # a correct commit protocol.
        values_ok = tableio.bucket_sample_aligned(corpus, n_buckets)
        if not values_ok:
            corpus = corpus.withColumn(
                "bucket", tableio.string_bucket_expr(n_buckets)
            )
        pre_ok = values_ok and bucket_provenance
    else:
        corpus = tableio.with_bucket(corpus, "doc_id", n_buckets)
        pre_ok = False
    if preshuffled is not None:
        pre_ok = preshuffled
    if "html" not in corpus.columns:
        corpus = render_spans_to_html(corpus)
    if "url" not in corpus.columns:
        corpus = corpus.withColumn("url", F.lit(""))

    committed = (
        tableio.read_committed_buckets(spark, output_path) if resume else set()
    )
    todo = [b for b in range(n_buckets) if b not in committed]
    # Wipe every uncommitted bucket dir ONCE up front (a no-op on a
    # fresh output; non-empty only when a crashed wave left partial
    # files), then let each wave APPEND its disjoint bucket set.  This
    # replaces partitionOverwriteMode=dynamic, whose staging-and-move
    # job commit is a fixed driver-side cost (measured +18.5 s per
    # 240k-doc wave; a copy, not a rename, on object stores) that
    # Amdahl-caps N→4N scaling — see tableio.clear_buckets.
    tableio.clear_buckets(spark, output_path, todo)

    t0 = time.time()
    docs_done = 0
    observed: list[dict] = []
    from .functions.sketches import HLL_M as _HLL_M

    run_regs: list[int] = [0] * _HLL_M
    waves = max(1, min(waves, len(todo))) if todo else 0
    cores = spark.sparkContext.defaultParallelism
    for wave_idx in range(waves):
        wave_buckets = todo[wave_idx::waves]
        wave_df = corpus.where(F.col("bucket").isin(wave_buckets))
        if giant_threshold == "auto":
            # derive the salting threshold from wave 0's own size
            # distribution (buckets are hash-random → an unbiased
            # sample of the corpus); later waves reuse the answer, so
            # the probe's column-pruned length scan is paid once
            giant_threshold = resolve_giant_threshold(wave_df)
        # Bucket-aligned fast path: when provenance + the sampled value
        # check passed (pre_ok) and the wave's scan already plans
        # >= cores partitions, extract_articles' parallelism floor
        # no-ops (same predicate), every stage below is narrow, and
        # each task's rows lie inside one bucket directory's splits —
        # so the clustered write needs NO distribution and the whole
        # wave (scan → render → extract → observe → write) runs as one
        # exchange-free stage.  Below the floor the respread breaks
        # alignment and the classic repartition write keeps file
        # counts bounded.  See tableio.write_bucketed(preshuffled=).
        aligned = (
            preshuffled
            if preshuffled is not None
            else pre_ok and wave_df.rdd.getNumPartitions() >= cores
        )
        extracted = extract_articles(
            wave_df,
            min_word_count=min_word_count,
            emit_html=emit_html,
            emit_markdown=emit_markdown,
            emit_metadata=emit_metadata,
            giant_threshold=giant_threshold,
        )
        # re-derive bucket from doc_id (mapInPandas output dropped it);
        # same hash → same bucket, no join needed
        extracted = tableio.with_bucket(extracted, "doc_id", n_buckets)
        from .functions.sketches import HLL_M, hll_rho
        from .functions.text import md5_int

        _h = md5_int(
            F.concat_ws(
                "\x1f",
                F.col("title"),
                F.col("excerpt"),
                F.col("word_count").cast("string"),
            )
        )
        obs = None
        if lineage_mode == "observe":
            # opt-in: lineage metrics piggyback on the write action via
            # per-bucket conditional aggregates + per-register HLL
            # maxes.  "Free" in job count but NOT in CPU: CollectMetrics
            # evaluates its aggregates INTERPRETED (no codegen), and the
            # ~8·buckets + 256 expressions cost ~1.9 core-ms/doc at
            # 240k docs — MORE than extraction itself (~1.0 core-ms) —
            # which Amdahl-capped 8→32 scaling until round 4 flipped
            # the default to the columnar read-back below.
            from pyspark.sql import Observation

            obs = Observation(f"wave-{wave_idx}")
            extracted = extracted.withColumn(
                "_hll_reg", _h.bitwiseAND(F.lit(HLL_M - 1))
            ).withColumn("_hll_rho", hll_rho(_h))
            extracted = extracted.observe(
                obs, *_bucket_metrics(wave_buckets), *_hll_metrics()
            )
            extracted = extracted.drop("_hll_reg", "_hll_rho")
        written_schema = extracted.schema
        tableio.write_bucketed(
            extracted,
            output_path,
            mode="append",
            dynamic=False,
            n_buckets=n_buckets,
            preshuffled=aligned,
        )
        if obs is not None:
            vals = obs.get
            lineage_rows = _lineage_rows_from_observation(
                vals, wave_buckets, run_id
            )
        else:
            # default: lineage + HLL from a COLUMN-PRUNED read-back of
            # the wave just written.  Parquet is columnar, so the two
            # aggregations below scan only the metric ints + short
            # strings (~1% of output bytes; spans/html never
            # materialize), both run as codegen'd hash aggregates, and
            # the read-back doubles as a write verification — the
            # bucket only commits if its rows are READABLE.  Measured
            # at 240k docs / local[32]: the interpreted write-side
            # observation cost ~14.5 s per wave; this path's two
            # pruned aggregations cost well under a second.
            # explicit schema: a wave that wrote ZERO rows to a fresh
            # output leaves only _SUCCESS, and schema inference would
            # throw 'Unable to infer schema' (ADVICE r4) — the schema
            # is known (it was just written), so the empty-dir read
            # degrades to an empty frame instead
            readback = spark.read.schema(written_schema).parquet(
                output_path
            ).where(F.col("bucket").isin(wave_buckets))
            # the readback scan inherits the job's compute-sized (tiny)
            # maxPartitionBytes, planning hundreds of ~1 MB splits for a
            # few MB of pruned metric columns — coalesce to core count
            # so the two aggregations below aren't task-launch-bound
            # (no shuffle: coalesce merges scan partitions in place)
            readback = readback.coalesce(cores)
            lineage_rows = [
                tuple(r)
                for r in tableio.build_lineage(readback, run_id).collect()
            ]
            vals = None
        if markdown_dir:
            # D4 sink fed from the WRITTEN output (column-pruned read of
            # url/title/markdown/word_count — parquet never materializes
            # the span column here), not a second extraction pass.
            # Runs BEFORE append_lineage: lineage is the commit record,
            # and a crash between sink and commit must leave the bucket
            # uncommitted so resume redoes it (md file writes are
            # idempotent overwrites; the manifest partition is
            # dynamically overwritten per bucket, so a redo converges
            # instead of accumulating duplicate rows).
            from .sinks.markdown_sink import write_markdown_files

            wave_out = spark.read.schema(written_schema).parquet(
                output_path
            ).where(F.col("bucket").isin(wave_buckets))
            manifest = tableio.with_bucket(
                write_markdown_files(wave_out, markdown_dir),
                "doc_id",
                n_buckets,
            )
            (
                manifest.repartition("bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(markdown_dir.rstrip("/") + "/_manifest")
            )
        # driver-side pyarrow commit (~2 KB of metadata): the Spark
        # write job here cost 1.5-2.3 s of fixed scheduler time per
        # wave — see tableio.append_lineage_rows
        tableio.append_lineage_rows(spark, lineage_rows, output_path)
        docs_done += sum(r[4] for r in lineage_rows)  # docs_in ordinal
        if vals is not None:
            for j in range(HLL_M):
                v = vals.get(f"hllr_{j}")
                if v is not None and int(v) > run_regs[j]:
                    run_regs[j] = int(v)
        else:
            # register maxes as ONE codegen'd hash aggregate over the
            # pruned read-back (title/excerpt/word_count fingerprint —
            # identical expression to the observe path, so the two
            # modes produce the same registers)
            reg_rows = (
                readback.select(
                    _h.bitwiseAND(F.lit(HLL_M - 1)).alias("reg"),
                    hll_rho(_h).alias("rho"),
                )
                .groupBy("reg")
                .agg(F.max("rho").alias("mx"))
                .collect()
            )
            for r in reg_rows:
                j = int(r["reg"])
                if int(r["mx"]) > run_regs[j]:
                    run_regs[j] = int(r["mx"])
        # wave-level stats from the committed lineage rows themselves
        # (schema ordinals: 4=docs_in, 6=parse_failures, 8=spans)
        observed.append(
            {
                "wave": wave_idx,
                "docs": sum(int(r[4]) for r in lineage_rows),
                "failures": sum(int(r[6]) for r in lineage_rows),
                "spans": sum(int(r[8]) for r in lineage_rows),
            }
        )

    from .functions.sketches import estimate_from_registers

    return {
        "observed_metrics": observed,
        "run_id": run_id,
        "buckets_total": n_buckets,
        "buckets_skipped": len(committed),
        "buckets_processed": len(todo),
        "docs_processed": docs_done,
        "docs_failed": sum(w["failures"] for w in observed),
        # HLL over (title, excerpt, word_count) fingerprints, merged
        # register-wise across this run's waves — ~6.5% std error;
        # 0.0 when the run processed nothing
        "distinct_docs_est": estimate_from_registers(run_regs)
        if any(run_regs)
        else 0.0,
        # which write path / skew strategy actually ran (A/B harnesses
        # and the ADVICE no-contrast check read these)
        "preshuffled": pre_ok,
        "giant_threshold": giant_threshold
        if isinstance(giant_threshold, int)
        else None,
        "wall_sec": round(time.time() - t0, 2),
    }


def write_manifest(stats: dict, path: str) -> None:
    """D5 manifest.json sink (reference crawler.py:549-571): the job's
    fold of per-page outcomes as a JSON file.  Counts come from the
    write-side observation (the distributed fold); this is the
    driver-side serialization of ~10 scalars, not a data pass."""
    import json
    import os

    data = {
        "job_id": stats["run_id"],
        "total_pages": stats["docs_processed"],
        "successful": stats["docs_processed"] - stats["docs_failed"],
        "failed": stats["docs_failed"],
        "skipped_buckets": stats["buckets_skipped"],
        "duration_seconds": stats["wall_sec"],
        "waves": stats["observed_metrics"],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(data, indent=2))


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

    p_cur = sub.add_parser(
        "curate",
        help="Dolma-style curation verdicts over an extraction output "
        "table (quality rules, exact/near dup canonicals, benchmark "
        "contamination, split — one status per document)",
    )
    p_cur.add_argument(
        "--table", required=True, help="output table from 'extract'"
    )
    p_cur.add_argument("--out", required=True)
    p_cur.add_argument(
        "--benchmark-table",
        default=None,
        help="parquet table of benchmark/eval docs (needs a 'text' "
        "column) to decontaminate against; omitted = decontamination "
        "is skipped (the benchmark slice is explicit, never inferred "
        "from doc ids)",
    )

    p_pipe = sub.add_parser(
        "pipeline",
        help="end-to-end: extraction -> curation verdicts -> shuffled "
        "sequence packing -> materialized training examples, each "
        "stage written under --out (see pipeline.run_pipeline)",
    )
    p_pipe.add_argument("--corpus", required=True)
    p_pipe.add_argument("--out", required=True)
    p_pipe.add_argument("--run-id", default="pipe-0")
    p_pipe.add_argument(
        "--buckets", type=int, default=tableio.DEFAULT_BUCKETS
    )
    p_pipe.add_argument("--waves", type=int, default=4)
    p_pipe.add_argument("--min-word-count", type=int, default=150)
    p_pipe.add_argument(
        "--chunk-tokens",
        type=int,
        default=None,
        help="packed example length in whitespace tokens",
    )
    p_pipe.add_argument("--benchmark-table", default=None)
    p_pipe.add_argument("--no-resume", action="store_true")
    p_pipe.add_argument("--manifest-out", default=None)

    p_wave = sub.add_parser(
        "wave",
        help="process ONE crawl wave incrementally: extraction -> "
        "state-probing curation -> epoch-scoped pack appended after "
        "the committed stream (pipeline.run_pipeline_wave; committed "
        "epochs are never rewritten)",
    )
    p_wave.add_argument("--corpus", required=True)
    p_wave.add_argument("--out", required=True)
    p_wave.add_argument(
        "--epoch",
        type=int,
        default=None,
        help="pin the epoch number (default: next uncommitted)",
    )
    p_wave.add_argument("--run-id", default=None)
    p_wave.add_argument(
        "--buckets", type=int, default=tableio.DEFAULT_BUCKETS
    )
    p_wave.add_argument("--waves", type=int, default=4)
    p_wave.add_argument("--min-word-count", type=int, default=150)
    p_wave.add_argument("--chunk-tokens", type=int, default=None)
    p_wave.add_argument("--benchmark-table", default=None)
    p_wave.add_argument("--no-resume", action="store_true")
    p_wave.add_argument("--manifest-out", default=None)

    p_run = sub.add_parser("extract", help="run the extraction job")
    p_run.add_argument("--corpus", required=True)
    p_run.add_argument("--out", required=True)
    p_run.add_argument("--run-id", default="run-0")
    p_run.add_argument("--buckets", type=int, default=tableio.DEFAULT_BUCKETS)
    p_run.add_argument("--waves", type=int, default=4)
    p_run.add_argument("--no-resume", action="store_true")
    p_run.add_argument(
        "--emit-html",
        action="store_true",
        help="populate the content_html column in the output table",
    )
    p_run.add_argument(
        "--emit-markdown",
        action="store_true",
        help="populate the markdown column in the output table",
    )
    p_run.add_argument(
        "--emit-metadata",
        action="store_true",
        help="populate the page_meta struct column (og:*/canonical/"
        "JSON-LD provenance) off the same parse as the spans",
    )
    p_run.add_argument(
        "--markdown-dir",
        default=None,
        help="also write one frontmatter-headed .md file per document "
        "here (implies --emit-markdown)",
    )
    p_run.add_argument(
        "--manifest-out",
        default=None,
        help="write the job manifest (crawler manifest.json analog) here",
    )

    args = parser.parse_args(argv)
    spark = build_session(app_name=f"aes-{args.cmd}")

    if args.cmd == "synth":
        df = corpus_dataframe(spark, args.docs, seed=args.seed)
        df = tableio.with_bucket(df, "doc_id", args.buckets)
        tableio.write_bucketed(
            df, args.out, dynamic=False,
            files_per_bucket=args.files_per_bucket,
            n_buckets=args.buckets,
        )
        print(f"wrote {args.docs} docs to {args.out}")
        return 0

    if args.cmd == "curate":
        from .queries import curation_verdicts

        result = tableio.read_table(spark, args.table)
        # document text = its extracted text spans, in order (the
        # curation attributes run over what extraction KEPT, not the
        # raw HTML).  The funnel runs directly on the STRING doc_id —
        # dup canonicals pick the lexicographic-min id, collision-free
        # by construction (a derived digit-suffix ordinal collided
        # across sources, e.g. 'siteA-42'/'siteB-42' — ADVICE r3) —
        # and the benchmark slice is the explicit --benchmark-table,
        # never inferred from low ids.
        docs = result.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("spans"), lambda s: s["kind"] == "text"
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text"),
        )
        benchmark = (
            spark.read.parquet(args.benchmark_table)
            if args.benchmark_table
            else None
        )
        verdicts = curation_verdicts(
            docs, benchmark=benchmark, bench_ids_below=None
        )
        verdicts.write.mode("overwrite").parquet(args.out)
        # summary reads the WRITTEN table back instead of re-executing
        # the whole funnel a second time (ADVICE r3)
        summary = {
            r["status"]: r["n"]
            for r in spark.read.parquet(args.out)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        kept = sum(v for k, v in summary.items() if k.startswith("kept:"))
        print(
            f"curated {sum(summary.values())} docs -> kept {kept}; "
            f"statuses: {dict(sorted(summary.items()))}"
        )
        return 0

    if args.cmd == "wave":
        from .pipeline import PIPE_CHUNK_TOKENS, run_pipeline_wave

        manifest = run_pipeline_wave(
            spark,
            args.corpus,
            args.out,
            epoch=args.epoch,
            run_id=args.run_id,
            n_buckets=args.buckets,
            waves=args.waves,
            min_word_count=args.min_word_count,
            chunk_tokens=args.chunk_tokens or PIPE_CHUNK_TOKENS,
            benchmark_path=args.benchmark_table,
            resume=not args.no_resume,
            manifest_path=args.manifest_out,
        )
        print(manifest)
        return 0

    if args.cmd == "pipeline":
        from .pipeline import PIPE_CHUNK_TOKENS, run_pipeline

        manifest = run_pipeline(
            spark,
            args.corpus,
            args.out,
            run_id=args.run_id,
            n_buckets=args.buckets,
            waves=args.waves,
            min_word_count=args.min_word_count,
            chunk_tokens=args.chunk_tokens or PIPE_CHUNK_TOKENS,
            benchmark_path=args.benchmark_table,
            resume=not args.no_resume,
            manifest_path=args.manifest_out,
        )
        print(manifest)
        return 0

    stats = run_extraction_job(
        spark,
        args.corpus,
        args.out,
        run_id=args.run_id,
        n_buckets=args.buckets,
        waves=args.waves,
        resume=not args.no_resume,
        emit_html=args.emit_html,
        emit_markdown=args.emit_markdown,
        emit_metadata=args.emit_metadata,
        markdown_dir=args.markdown_dir,
    )
    if args.manifest_out:
        write_manifest(stats, args.manifest_out)
    print(stats)
    return 0


if __name__ == "__main__":
    sys.exit(main())
