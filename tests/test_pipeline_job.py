"""End-to-end pipeline job: extraction → curation → shuffled pack →
materialized examples (pipeline.run_pipeline), plus unit invariants for
the fused shuffled_pack decomposition.

The reconstruction test is the strong one: concatenating the emitted
examples in chunk order must reproduce, token-exactly, the kept
documents' text concatenated in train_pos order — any error in the
two-base bucket decomposition, the slice bounds, or the within-chunk
reassembly order breaks it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from article_extractor_spark.pipeline import (
    materialize_chunks,
    run_pipeline,
    shuffled_pack,
)
from article_extractor_spark.sources import tableio
from article_extractor_spark.sources.synth import corpus_dataframe

N_DOCS = 120
N_BUCKETS = 8
CHUNK = 64


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pipe-corpus") / "docs")
    df = corpus_dataframe(spark, N_DOCS, seed=42, partitions=4)
    df = tableio.with_bucket(df, "doc_id", N_BUCKETS)
    tableio.write_bucketed(df, path, dynamic=False)
    return path


@pytest.fixture(scope="module")
def pipeline_out(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe") / "out")
    manifest = run_pipeline(
        spark,
        corpus_path,
        out,
        n_buckets=N_BUCKETS,
        waves=2,
        min_word_count=10,
        chunk_tokens=CHUNK,
    )
    return out, manifest


def test_manifest_counts_are_consistent(spark, pipeline_out):
    out, manifest = pipeline_out
    assert manifest["extraction"]["docs_processed"] == N_DOCS
    # curation statuses cover exactly the successfully-extracted docs
    n_success = (
        tableio.read_table(spark, f"{out}/extracted")
        .where(F.col("success"))
        .count()
    )
    assert sum(manifest["curation"].values()) == n_success
    assert manifest["kept_docs"] > 0
    ex = spark.read.parquet(f"{out}/examples")
    assert manifest["n_examples"] == ex.count()
    assert (
        manifest["packed_tokens"]
        == ex.agg(F.sum("n_tokens")).first()[0]
    )
    # every kept doc appears in the pack table and vice versa
    assert (
        spark.read.parquet(f"{out}/pack").count() == manifest["kept_docs"]
    )


def test_chunks_are_full_and_contiguous(spark, pipeline_out):
    out, _ = pipeline_out
    rows = (
        spark.read.parquet(f"{out}/examples")
        .orderBy("chunk_id")
        .collect()
    )
    ids = [r["chunk_id"] for r in rows]
    assert ids == list(range(len(rows)))
    # all chunks except the final one are exactly CHUNK tokens; every
    # example string's token count agrees with its n_tokens column
    for r in rows[:-1]:
        assert r["n_tokens"] == CHUNK
    assert 0 < rows[-1]["n_tokens"] <= CHUNK
    for r in rows:
        assert len(r["example"].split(" ")) == r["n_tokens"]


def test_examples_reconstruct_the_shuffled_stream(spark, pipeline_out):
    out, _ = pipeline_out
    from article_extractor_spark.pipeline import docs_from_extraction

    ex = (
        spark.read.parquet(f"{out}/examples").orderBy("chunk_id").collect()
    )
    packed = " ".join(r["example"] for r in ex)

    docs = docs_from_extraction(
        tableio.read_table(spark, f"{out}/extracted").where(
            F.col("success")
        )
    )
    kept = docs.join(
        spark.read.parquet(f"{out}/pack").select("doc_id", "train_pos"),
        "doc_id",
    )
    stream = " ".join(
        " ".join(r["text"].split())
        for r in kept.orderBy("train_pos").collect()
    )
    assert packed == stream


def test_pipeline_rerun_resumes_and_is_deterministic(
    spark, corpus_path, pipeline_out
):
    out, _ = pipeline_out
    before = {
        r["chunk_id"]: r["example"]
        for r in spark.read.parquet(f"{out}/examples").collect()
    }
    manifest2 = run_pipeline(
        spark,
        corpus_path,
        out,
        n_buckets=N_BUCKETS,
        waves=2,
        min_word_count=10,
        chunk_tokens=CHUNK,
    )
    # extraction resumed: all buckets already committed
    assert manifest2["extraction"]["buckets_skipped"] == N_BUCKETS
    assert manifest2["extraction"]["docs_processed"] == 0
    after = {
        r["chunk_id"]: r["example"]
        for r in spark.read.parquet(f"{out}/examples").collect()
    }
    assert before == after


def test_shuffled_pack_invariants(spark):
    docs = spark.createDataFrame(
        [(f"doc-{i}", "tok " * (i % 7 + 1)) for i in range(50)]
        + [("empty-doc", "   ")],
        "doc_id string, text string",
    )
    pack = shuffled_pack(docs, chunk_tokens=16).collect()
    n = len(pack)
    assert n == 51
    assert sorted(r["train_pos"] for r in pack) == list(range(n))
    by_pos = sorted(pack, key=lambda r: r["train_pos"])
    acc = 0
    for r in by_pos:
        assert r["start_token"] == acc
        acc += r["n_tokens"]
    empty = next(r for r in pack if r["doc_id"] == "empty-doc")
    assert empty["n_tokens"] == 0


def test_materialize_chunks_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", ""), ("c", "p q")],
        "doc_id string, text string",
    )
    pack = shuffled_pack(docs, chunk_tokens=4)
    chunks = materialize_chunks(docs, pack, chunk_tokens=4).collect()
    total = sum(r["n_tokens"] for r in chunks)
    assert total == 5
    joined = " ".join(
        r["example"]
        for r in sorted(chunks, key=lambda r: r["chunk_id"])
    )
    assert sorted(joined.split(" ")) == ["p", "q", "x", "y", "z"]
