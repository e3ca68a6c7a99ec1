"""Wave-incremental pipeline (pipeline.run_pipeline_wave): a second
crawl wave costs O(wave) — curation probes persisted dedup state
instead of re-pairing the corpus, packing appends epoch-scoped
positions after the committed token offset — and committed epochs are
never rewritten (VERDICT r4 task #3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from article_extractor_spark.pipeline import (
    committed_epochs,
    run_pipeline,
    run_pipeline_wave,
)
from article_extractor_spark.sources import tableio
from article_extractor_spark.sources.synth import (
    corpus_dataframe,
    generate_document,
)

N_W1 = 100
N_BUCKETS = 8
CHUNK = 64


def _span_rows(doc: dict) -> list:
    return [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in doc["spans"]
    ]


@pytest.fixture(scope="module")
def wave_paths(spark, tmp_path_factory):
    """wave1: 100 synth docs.  wave2: 1 exact dup of a wave-1 doc,
    1 near dup (one word changed), 20 fresh docs."""
    from pyspark.sql import types as T

    from article_extractor_spark.operators.extraction import SPAN_TYPE

    root = tmp_path_factory.mktemp("waves")
    w1 = str(root / "wave1")
    df = corpus_dataframe(spark, N_W1, seed=42, partitions=4)
    tableio.write_bucketed(
        tableio.with_bucket(df, "doc_id", N_BUCKETS), w1, dynamic=False
    )

    # base doc for the dup/near-dup pair: a 'simple' template page
    base = None
    for i in range(N_W1):
        d = generate_document(f"synth-{i:09d}", seed=42)
        if d["template"] == "simple":
            base = d
            break
    assert base is not None

    dup_rows = [("zdup-exact", base["url"], _span_rows(base))]
    near = [list(r) for r in _span_rows(base)]
    # perturb one word in the longest text span → near but not exact
    longest = max(
        (i for i, r in enumerate(near) if r[0] == "text" and r[1]),
        key=lambda i: len(near[i][1]),
    )
    assert " the " in near[longest][1]
    near[longest][1] = near[longest][1].replace(
        " the ", " thequail ", 1
    )
    dup_rows.append(("zdup-near", base["url"], [tuple(r) for r in near]))
    for i in range(20):
        d = generate_document(f"wave2-{i:09d}", seed=7)
        dup_rows.append((d["doc_id"], d["url"], _span_rows(d)))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("spans", SPAN_TYPE),
        ]
    )
    w2 = str(root / "wave2")
    w2df = spark.createDataFrame(dup_rows, schema)
    tableio.write_bucketed(
        tableio.with_bucket(w2df, "doc_id", N_BUCKETS), w2, dynamic=False
    )
    return w1, w2


@pytest.fixture(scope="module")
def incremental_out(spark, wave_paths, tmp_path_factory):
    w1, w2 = wave_paths
    out = str(tmp_path_factory.mktemp("inc") / "out")
    m1 = run_pipeline_wave(
        spark, w1, out, n_buckets=N_BUCKETS, waves=2,
        min_word_count=10, chunk_tokens=CHUNK,
    )
    epoch0 = {
        name: spark.read.parquet(f"{out}/epochs/0/{name}").collect()
        for name in ("verdicts", "pack", "examples")
    }
    m2 = run_pipeline_wave(
        spark, w2, out, n_buckets=N_BUCKETS, waves=2,
        min_word_count=10, chunk_tokens=CHUNK,
    )
    return out, m1, m2, epoch0


def test_epoch0_equals_one_shot_pipeline(
    spark, wave_paths, incremental_out, tmp_path
):
    """Epoch 0 of the wave runner is the identical full funnel as
    run_pipeline on the same corpus — row-identical verdicts, pack,
    and examples."""
    w1, _ = wave_paths
    out, m1, _, _ = incremental_out
    oneshot = str(tmp_path / "oneshot")
    m = run_pipeline(
        spark, w1, oneshot, n_buckets=N_BUCKETS, waves=2,
        min_word_count=10, chunk_tokens=CHUNK,
    )
    assert m["kept_docs"] == m1["kept_docs"]
    for name in ("verdicts", "pack", "examples"):
        a = spark.read.parquet(f"{out}/epochs/0/{name}")
        b = spark.read.parquet(f"{oneshot}/{name}")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_wave2_statuses_probe_the_state(spark, incremental_out):
    out, _, m2, _ = incremental_out
    assert m2["epoch"] == 1
    verdicts = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(f"{out}/epochs/1/verdicts").collect()
    }
    # the byte-identical re-ingest of a wave-1 doc is an exact dup of
    # the STORED corpus; the one-word perturbation is a near dup
    assert verdicts["zdup-exact"] == "exact_dup"
    assert verdicts["zdup-near"] == "near_dup"
    # fresh docs flow through to kept/quality statuses normally
    fresh = {v for k, v in verdicts.items() if k.startswith("wave2-")}
    assert any(s.startswith("kept:") for s in fresh)
    assert m2["kept_docs"] > 0


def test_epoch0_outputs_frozen_and_epochs_committed(
    spark, incremental_out
):
    out, _, _, epoch0_before = incremental_out
    assert committed_epochs(spark, out) == [0, 1]
    for name, before in epoch0_before.items():
        after = spark.read.parquet(f"{out}/epochs/0/{name}").collect()
        assert sorted(map(tuple, after)) == sorted(map(tuple, before))


def test_wave2_pack_appends_on_chunk_boundary(spark, incremental_out):
    out, m1, m2, _ = incremental_out
    p0 = spark.read.parquet(f"{out}/epochs/0/pack")
    p1 = spark.read.parquet(f"{out}/epochs/1/pack")
    n0 = p0.count()
    agg0 = p0.agg(
        F.max("train_pos").alias("mp"), F.max("last_chunk").alias("mc")
    ).first()
    agg1 = p1.agg(
        F.min("train_pos").alias("minp"),
        F.min("first_chunk").alias("minc"),
        F.min("start_token").alias("mint"),
    ).first()
    # positions continue exactly after the committed epoch
    assert agg0["mp"] == n0 - 1
    assert agg1["minp"] == n0
    assert m2["base_train_pos"] == n0
    # hard chunk boundary: epoch 1 starts at the next chunk id, on the
    # chunk-aligned token offset
    assert agg1["minc"] == agg0["mc"] + 1
    assert agg1["mint"] == (agg0["mc"] + 1) * CHUNK
    assert m2["base_token"] == (agg0["mc"] + 1) * CHUNK
    # chunk ids across epochs are disjoint and contiguous
    e0 = spark.read.parquet(f"{out}/epochs/0/examples")
    e1 = spark.read.parquet(f"{out}/epochs/1/examples")
    ids0 = sorted(r["chunk_id"] for r in e0.select("chunk_id").collect())
    ids1 = sorted(r["chunk_id"] for r in e1.select("chunk_id").collect())
    assert ids0 == list(range(len(ids0)))
    assert ids1 == list(range(ids0[-1] + 1, ids0[-1] + 1 + len(ids1)))


def test_wave2_examples_reconstruct_wave2_stream(spark, incremental_out):
    from article_extractor_spark.pipeline import docs_from_extraction

    out, _, _, _ = incremental_out
    ex = (
        spark.read.parquet(f"{out}/epochs/1/examples")
        .orderBy("chunk_id")
        .collect()
    )
    packed = " ".join(r["example"] for r in ex)
    docs = docs_from_extraction(
        tableio.read_table(spark, f"{out}/epochs/1/extracted").where(
            F.col("success")
        )
    )
    kept = docs.join(
        spark.read.parquet(f"{out}/epochs/1/pack").select(
            "doc_id", "train_pos"
        ),
        "doc_id",
    )
    stream = " ".join(
        " ".join(r["text"].split())
        for r in kept.orderBy("train_pos").collect()
    )
    assert packed == stream


def test_pipeline_wave_replay_skips_committed_epoch(
    spark, wave_paths, tmp_path
):
    """Exactly-once for the streaming funnel: a replayed micro-batch
    (explicit epoch whose state marker already committed) is skipped,
    leaving every output byte untouched."""
    w1, _ = wave_paths
    out = str(tmp_path / "replay")
    m1 = run_pipeline_wave(
        spark, w1, out, epoch=0, n_buckets=N_BUCKETS, waves=1,
        min_word_count=10, chunk_tokens=CHUNK,
    )
    assert m1["epoch"] == 0 and "skipped" not in m1
    before = sorted(
        map(tuple, spark.read.parquet(f"{out}/epochs/0/pack").collect())
    )
    m2 = run_pipeline_wave(
        spark, w1, out, epoch=0, n_buckets=N_BUCKETS, waves=1,
        min_word_count=10, chunk_tokens=CHUNK,
    )
    assert m2 == {"epoch": 0, "skipped": True}
    after = sorted(
        map(tuple, spark.read.parquet(f"{out}/epochs/0/pack").collect())
    )
    assert before == after


def test_compact_state_equals_from_scratch_index(spark, incremental_out):
    """After two appended waves, compacting the persisted band index
    must reproduce ROW FOR ROW the from-scratch capped index over the
    union of both waves' extracted text (the exactness property that
    makes compaction safe maintenance, not lossy pruning)."""
    from article_extractor_spark.functions import dedup as D
    from article_extractor_spark.pipeline import (
        compact_state,
        docs_from_extraction,
    )

    out, _, _, _ = incremental_out
    stats = compact_state(spark, out)
    assert stats["rows_after"] <= stats["rows_before"]

    extracted = spark.read.parquet(f"{out}/epochs/0/extracted").unionByName(
        spark.read.parquet(f"{out}/epochs/1/extracted")
    )
    docs = docs_from_extraction(extracted.where(F.col("success")))
    scratch = D.capped_band_index(docs)
    stored = spark.read.parquet(f"{out}/state/band_index").select(
        "doc_id", "band", "band_hash"
    )
    assert stored.exceptAll(scratch).count() == 0
    assert scratch.exceptAll(stored).count() == 0
    # probes still work against the compacted index
    pairs = D.incremental_minhash_pairs(
        docs.where(F.col("doc_id") == "zdup-near"),
        spark.read.parquet(f"{out}/state/band_index"),
    )
    assert pairs.count() > 0
