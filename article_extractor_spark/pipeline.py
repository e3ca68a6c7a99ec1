"""End-to-end production pipeline: corpus → extraction → curation →
shuffled sequence packing — the single spark-submit job a user of the
reference would run to go from a raw crawled-document table to packed
training examples.

The reference covers only the first stage of this path (crawl → extract
→ save markdown files, crawler.py:354-423); everything downstream —
quality/dedup curation, deterministic training-order shuffle, fixed
length example packing — is what a training-data deployment layers on
top, and each stage here reuses an operator the registry already
verifies in isolation (``curation_funnel``, ``training_order``,
``sequence_pack``, ``packed_examples``).  What this module adds is the
COMPOSED, resumable job plus the one new primitive the composition
needs: packing in *shuffled training order* over *string* document ids.

``shuffled_pack`` fuses ``training_order`` and ``sequence_pack`` into
ONE bucket decomposition: the md5 shuffle hash's first hex byte is the
range bucket (a prefix of the sort key, so lexicographic bucket order
IS global hash order), and a single 256-row totals collect yields both
the global train position base and the global token-offset base per
bucket.  No unpartitioned window anywhere; the corpus-sized work is one
hash-aggregate plus one bucket-keyed window.  ``doc_id`` may be any
orderable type — the hash rides ``CAST(doc_id AS STRING)``, so the
extraction job's string ids need no collision-prone numeric ordinal
(the ADVICE-r3 lesson baked into ``curation_verdicts``).

``materialize_chunks`` emits the actual examples with the same
array-slice shuffle shape as ``q_packed_examples``: one row per
document-chunk overlap carrying a token-array SLICE (≤ len/chunk+2 rows
per doc), never a row per token — at 10^12 docs the exploded spelling
pays per-record shuffle overhead 10^2 tokens/doc times (measured 81.6 s
vs the slice spelling at 500k docs, queries.py:2040-2052).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import text as X

PIPE_SHUFFLE_SEED = "pipeline-shuffle-1|"
PIPE_CHUNK_TOKENS = 512


def shuffled_pack(
    docs: DataFrame,
    *,
    chunk_tokens: int = PIPE_CHUNK_TOKENS,
    seed: str = PIPE_SHUFFLE_SEED,
) -> DataFrame:
    """Assign every (doc_id, text) row a deterministic shuffled global
    train position AND its global token offset on the concatenated
    training stream, in one two-phase bucket decomposition.

    Output: (doc_id, train_pos, n_tokens, start_token, first_chunk,
    last_chunk, spans_boundary).  ``start_token`` is the sum of
    ``n_tokens`` over all docs EARLIER IN SHUFFLED ORDER — the packing
    axis a trainer actually consumes (documents are concatenated in
    epoch order, not id order).  Zero-token documents keep a train
    position but are degenerate on the token axis (first_chunk ==
    last_chunk == start DIV chunk); the pipeline filters them out
    before packing (curation's quality gate already has).

    Scale shape: md5 buckets are uniform by construction (no skew), the
    totals collect is 256 rows of metadata, and the per-bucket window
    sorts ~1/256th of the corpus per task.  The DuckDB oracle is the
    single-node global window — agreement is evidence the decomposition
    is exact (the ``training_order``/``sequence_pack`` protocol).
    """
    hashed = docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        F.md5(
            F.concat(F.lit(seed), F.col("doc_id").cast("string"))
        ).alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    totals = {
        r["bucket"]: (r["cnt"], r["toks"])
        for r in hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tokens").alias("toks"),
        )
        .collect()
    }
    base_pos: dict[str, int] = {}
    base_tok: dict[str, int] = {}
    acc_pos = acc_tok = 0
    for b in sorted(totals):
        base_pos[b] = acc_pos
        base_tok[b] = acc_tok
        acc_pos += totals[b][0]
        acc_tok += totals[b][1]

    def _base(mapping: dict[str, int]):
        if not mapping:
            return F.lit(0)
        return F.coalesce(
            *[
                F.when(F.col("bucket") == b, F.lit(off))
                for b, off in mapping.items()
            ]
        )

    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, -1)
    out = hashed.select(
        "doc_id",
        "n_tokens",
        (_base(base_pos) + F.row_number().over(w) - 1)
        .cast("long")
        .alias("train_pos"),
        (
            _base(base_tok)
            + F.coalesce(F.sum("n_tokens").over(wsum), F.lit(0))
        )
        .cast("long")
        .alias("start_token"),
    )
    return out.select(
        "doc_id",
        "train_pos",
        "n_tokens",
        "start_token",
        F.expr(f"start_token DIV {chunk_tokens}").alias("first_chunk"),
        F.expr(
            f"(start_token + n_tokens - 1) DIV {chunk_tokens}"
        ).alias("last_chunk"),
        (
            F.expr(f"start_token DIV {chunk_tokens}")
            != F.expr(
                f"(start_token + n_tokens - 1) DIV {chunk_tokens}"
            )
        ).alias("spans_boundary"),
    )


def materialize_chunks(
    docs: DataFrame,
    pack: DataFrame,
    *,
    chunk_tokens: int = PIPE_CHUNK_TOKENS,
) -> DataFrame:
    """Cut the shuffled token stream into fixed-size examples:
    (chunk_id, example, n_tokens), ``example`` the space-joined token
    sequence of the chunk (the final chunk may be short).

    One row per document-chunk OVERLAP crosses the shuffle, carrying an
    array slice — the ``q_packed_examples`` spelling.  Chunk assembly
    is a groupBy(chunk_id) whose collect_list is bounded by
    ``chunk_tokens`` entries; slices within a chunk are reassembled in
    ``start_token`` order (disjoint ranges, so the order key is exact).
    """
    toked = docs.select(
        "doc_id", X.ws_tokens(F.col("text")).alias("toks")
    )
    joined = toked.join(
        pack.select("doc_id", "n_tokens", "start_token"), "doc_id"
    ).where(F.col("n_tokens") > 0)
    C = chunk_tokens
    pieces = joined.select(
        "start_token",
        "n_tokens",
        "toks",
        F.explode(
            F.sequence(
                F.expr(f"start_token DIV {C}"),
                F.expr(f"(start_token + n_tokens - 1) DIV {C}"),
            )
        ).alias("chunk_id"),
    ).select(
        "chunk_id",
        # slice bounds of THIS doc's tokens that land in chunk_id:
        # global [max(start, chunk*C), min(start+n, (chunk+1)*C))
        F.greatest(
            F.col("chunk_id") * C, F.col("start_token")
        ).alias("gstart"),
        F.least(
            (F.col("chunk_id") + 1) * C,
            F.col("start_token") + F.col("n_tokens"),
        ).alias("gend"),
        "start_token",
        "toks",
    )
    sliced = pieces.select(
        "chunk_id",
        F.col("gstart").alias("pos"),
        F.slice(
            "toks",
            (F.col("gstart") - F.col("start_token") + 1).cast("int"),
            (F.col("gend") - F.col("gstart")).cast("int"),
        ).alias("piece"),
    )
    return (
        sliced.groupBy("chunk_id")
        .agg(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "piece"))
                        ),
                        lambda s: s["piece"],
                    )
                ),
                " ",
            ).alias("example"),
            F.sum(F.size("piece")).cast("int").alias("n_tokens"),
        )
    )


def docs_from_extraction(extracted: DataFrame) -> DataFrame:
    """(doc_id, text) view of an extraction output table: the document
    text is its extracted text spans in span order — curation runs
    over what extraction KEPT, not the raw HTML (job.py curate)."""
    return extracted.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
    )


def run_pipeline(
    spark: SparkSession,
    corpus: str,
    out: str,
    *,
    run_id: str = "pipe-0",
    n_buckets: int | None = None,
    waves: int = 4,
    min_word_count: int = 150,
    chunk_tokens: int = PIPE_CHUNK_TOKENS,
    benchmark_path: str | None = None,
    resume: bool = True,
    manifest_path: str | None = None,
) -> dict:
    """The composed job: extraction (resumable, lineage-committed) →
    curation verdicts → shuffled pack of the kept documents →
    materialized examples, each stage written under ``out``.

    Layout:  ``out/extracted`` (bucketed result table + lineage),
    ``out/verdicts`` (one status row per document), ``out/pack``
    (per-doc train position + chunk assignment), ``out/examples``
    (chunk_id, example, n_tokens), and a stage-count manifest returned
    (and written to ``manifest_path`` when given).

    Resume rides the extraction job's bucket lineage: a re-run after a
    kill skips committed buckets, and the downstream stages are
    deterministic functions of the extraction table, so re-deriving
    them is idempotent (the crawler-manifest analog folds per stage).
    Each downstream stage READS BACK the parquet the previous stage
    wrote — lineage stays flat across stages, and a stage re-run never
    re-executes its upstream (the ADVICE-r3 curate-summary lesson,
    applied between every stage).
    """
    from .job import run_extraction_job
    from .queries import curation_verdicts
    from .sources import tableio

    if n_buckets is None:
        n_buckets = tableio.DEFAULT_BUCKETS
    t0 = time.time()
    ex_stats = run_extraction_job(
        spark,
        corpus,
        f"{out}/extracted",
        run_id=run_id,
        n_buckets=n_buckets,
        waves=waves,
        min_word_count=min_word_count,
        resume=resume,
    )

    extracted = tableio.read_table(spark, f"{out}/extracted").where(
        F.col("success")
    )
    docs = docs_from_extraction(extracted)
    benchmark = (
        spark.read.parquet(benchmark_path) if benchmark_path else None
    )
    verdicts = curation_verdicts(
        docs, benchmark=benchmark, bench_ids_below=None
    )
    verdicts.write.mode("overwrite").parquet(f"{out}/verdicts")

    verdicts_rb = spark.read.parquet(f"{out}/verdicts")
    status_counts = {
        r["status"]: r["n"]
        for r in verdicts_rb.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept_docs = docs.join(
        verdicts_rb.where(F.col("status").startswith("kept:")).select(
            "doc_id"
        ),
        "doc_id",
    )

    pack = shuffled_pack(kept_docs, chunk_tokens=chunk_tokens)
    pack.write.mode("overwrite").parquet(f"{out}/pack")

    pack_rb = spark.read.parquet(f"{out}/pack")
    chunks = materialize_chunks(
        kept_docs, pack_rb, chunk_tokens=chunk_tokens
    )
    chunks.write.mode("overwrite").parquet(f"{out}/examples")

    ex_agg = (
        spark.read.parquet(f"{out}/examples")
        .agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tokens"),
        )
        .first()
    )
    manifest = {
        "run_id": run_id,
        "extraction": ex_stats,
        "curation": dict(sorted(status_counts.items())),
        "kept_docs": sum(
            n for s, n in status_counts.items() if s.startswith("kept:")
        ),
        "chunk_tokens": chunk_tokens,
        "n_examples": int(ex_agg["n_examples"]),
        "packed_tokens": int(ex_agg["tokens"]),
        "wall_sec": round(time.time() - t0, 2),
    }
    if manifest_path:
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
            fh.write("\n")
    return manifest
