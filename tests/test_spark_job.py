"""Tier-3 Spark end-to-end tests (SURVEY.md §5): synthetic corpus table →
extraction job → span equality, lineage metrics, kill-and-resume."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from article_extractor_spark.job import run_extraction_job
from article_extractor_spark.operators.extraction import (
    extract_articles,
    render_spans_to_html,
)
from article_extractor_spark.sources import tableio
from article_extractor_spark.sources.synth import (
    corpus_dataframe,
    generate_document,
)

N_DOCS = 120
N_BUCKETS = 8


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "docs")
    df = corpus_dataframe(spark, N_DOCS, seed=42, partitions=4)
    df = tableio.with_bucket(df, "doc_id", N_BUCKETS)
    tableio.write_bucketed(df, path, dynamic=False)
    return path


def expected_span_tuples(doc_id: str) -> list[tuple]:
    doc = generate_document(doc_id, seed=42)
    return [
        (s["kind"], s["text"], s["media_ref"]) for s in doc["expected_spans"]
    ]


def test_job_end_to_end_span_equality(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    stats = run_extraction_job(
        spark, corpus_path, out, n_buckets=N_BUCKETS, waves=2
    )
    assert stats["docs_processed"] == N_DOCS
    # the write-side HLL rode the waves' Observations: the run-level
    # distinct-document estimate must track the (all-unique) corpus
    # within the sketch's small-range band (linear counting at n=120)
    assert abs(stats["distinct_docs_est"] - N_DOCS) / N_DOCS < 0.15

    result = spark.read.parquet(out)
    assert result.count() == N_DOCS
    assert result.where("success").count() == N_DOCS

    # spot-check span equality against generation-time expectations
    sample = result.orderBy("doc_id").limit(25).collect()
    for row in sample:
        got = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        assert got == expected_span_tuples(row["doc_id"]), row["doc_id"]

    # lineage: every bucket committed, totals add up
    lineage = spark.read.parquet(tableio.lineage_path(out))
    agg = lineage.agg(
        F.sum("docs_in").alias("docs"),
        F.sum("docs_ok").alias("ok"),
        F.countDistinct("bucket").alias("buckets"),
    ).collect()[0]
    assert agg["docs"] == N_DOCS
    assert agg["ok"] == N_DOCS
    assert agg["buckets"] == N_BUCKETS
    assert lineage.where("cpu_ms < 0").count() == 0


def test_job_resume_is_noop_when_committed(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out")
    run_extraction_job(spark, corpus_path, out, n_buckets=N_BUCKETS, waves=2)
    stats = run_extraction_job(
        spark, corpus_path, out, n_buckets=N_BUCKETS, waves=2
    )
    assert stats["buckets_skipped"] == N_BUCKETS
    assert stats["docs_processed"] == 0


def test_kill_and_resume_produces_identical_table(spark, corpus_path, tmp_path):
    """Simulated mid-job death: half the buckets committed, output for
    the rest partially written without lineage → resume must re-run only
    uncommitted buckets and converge to the uninterrupted result."""
    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resumed")

    run_extraction_job(spark, corpus_path, out_full, n_buckets=N_BUCKETS, waves=1)

    # "killed" first run: waves=8 → each wave is one bucket; run via the
    # public API but only over half the corpus (as if the job died after
    # committing those buckets)...
    half = spark.read.parquet(corpus_path).where(F.col("bucket") < N_BUCKETS // 2)
    run_extraction_job(
        spark, half, out_resume, n_buckets=N_BUCKETS, waves=1, resume=False
    )
    # ...plus an uncommitted partial write for one more bucket (data
    # landed, lineage did not)
    orphan = spark.read.parquet(corpus_path).where(
        F.col("bucket") == N_BUCKETS // 2
    )
    orphan_out = extract_articles(render_spans_to_html(orphan))
    orphan_out = tableio.with_bucket(orphan_out, "doc_id", N_BUCKETS)
    # truncate to simulate a partial task write
    tableio.write_bucketed(orphan_out.limit(3), out_resume, dynamic=True)

    committed_before = tableio.read_committed_buckets(spark, out_resume)
    assert committed_before == set(range(N_BUCKETS // 2))

    stats = run_extraction_job(
        spark, corpus_path, out_resume, n_buckets=N_BUCKETS, waves=2
    )
    assert stats["buckets_skipped"] == N_BUCKETS // 2

    full = spark.read.parquet(out_full)
    resumed = spark.read.parquet(out_resume)
    assert resumed.count() == N_DOCS
    # content equality, order-insensitive (resume overwrote the orphan)
    cols = ["doc_id", "title", "word_count", "success", "spans_emitted"]
    assert (
        full.select(cols).exceptAll(resumed.select(cols)).count() == 0
        and resumed.select(cols).exceptAll(full.select(cols)).count() == 0
    )
    # span-level equality via hash of the span structs
    h = lambda df: df.select(
        "doc_id", F.xxhash64(F.to_json("spans")).alias("h")
    )
    assert h(full).exceptAll(h(resumed)).count() == 0


def test_lineage_readback_matches_observation_mode(
    spark, corpus_path, tmp_path
):
    """The default lineage path (column-pruned read-back of the written
    wave) must agree with the opt-in observe mode (write-side
    conditional aggregates) on every metric except wall-clock cpu_ms —
    same pin as before round 4, with the default flipped (the
    interpreted CollectMetrics expressions cost more CPU than
    extraction itself; see run_extraction_job docstring)."""
    out_a = str(tmp_path / "obs")
    out_b = str(tmp_path / "audit")
    run_extraction_job(
        spark,
        corpus_path,
        out_a,
        n_buckets=N_BUCKETS,
        waves=2,
        lineage_mode="observe",
    )
    run_extraction_job(
        spark,
        corpus_path,
        out_b,
        n_buckets=N_BUCKETS,
        waves=2,
    )
    cols = [
        "bucket",
        "doc_id_min",
        "doc_id_max",
        "docs_in",
        "docs_ok",
        "parse_failures",
        "nodes_scored",
        "spans_emitted",
    ]
    a = (
        spark.read.parquet(tableio.lineage_path(out_a))
        .select(cols)
        .orderBy("bucket")
        .collect()
    )
    b = (
        spark.read.parquet(tableio.lineage_path(out_b))
        .select(cols)
        .orderBy("bucket")
        .collect()
    )
    assert a == b


def test_files_per_bucket_salt_splits_buckets(spark, tmp_path):
    """files_per_bucket > 1 must actually produce multiple files per
    bucket directory (round-1 bug: repartition on the bucket value alone
    made it a no-op)."""
    import glob

    df = corpus_dataframe(spark, 200, seed=5, partitions=4)
    df = tableio.with_bucket(df, "doc_id", 4)
    out = str(tmp_path / "t")
    tableio.write_bucketed(
        df, out, dynamic=False, files_per_bucket=4, n_buckets=4
    )
    per_bucket = [
        len(glob.glob(f"{out}/bucket={b}/*.parquet")) for b in range(4)
    ]
    assert all(n >= 1 for n in per_bucket)
    assert sum(per_bucket) > 4  # salt actually split bucket output
    assert max(per_bucket) > 1


def test_wave_filter_prunes_bucket_partitions(spark, corpus_path):
    """Each wave reads ONLY its buckets' partition directories — the
    wave predicate must land in PartitionFilters, not a post-scan
    Filter.  At 100 TB, waves without pruning would rescan the full
    corpus once per wave."""
    corpus = tableio.read_table(spark, corpus_path)
    wave = corpus.where(F.col("bucket").isin([0, 1]))
    plan = wave._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan[:500]
    assert "bucket" in pf[1][:120]


def test_manifest_json_sink(spark, corpus_path, tmp_path):
    """D5 manifest.json analog: job stats fold serialized to a file."""
    import json

    from article_extractor_spark.job import write_manifest

    out = str(tmp_path / "out")
    stats = run_extraction_job(
        spark, corpus_path, out, n_buckets=N_BUCKETS, waves=2,
        min_word_count=10,
    )
    mpath = str(tmp_path / "manifest.json")
    write_manifest(stats, mpath)
    data = json.loads(open(mpath, encoding="utf-8").read())
    assert data["total_pages"] == N_DOCS
    assert data["successful"] + data["failed"] == N_DOCS
    assert data["duration_seconds"] > 0
    assert len(data["waves"]) == 2


def test_job_with_markdown_dir_writes_files_and_manifest(
    spark, corpus_path, tmp_path
):
    """The full job with --markdown-dir produces the reference
    crawler's primary artifact — one .md per document — fed from the
    written output table, plus a manifest."""
    import glob

    out = str(tmp_path / "out")
    md_dir = str(tmp_path / "md")
    stats = run_extraction_job(
        spark,
        corpus_path,
        out,
        n_buckets=N_BUCKETS,
        waves=2,
        min_word_count=10,
        markdown_dir=md_dir,
    )
    n_ok = spark.read.parquet(out).where("success").count()
    md_files = glob.glob(f"{md_dir}/*.md")
    assert stats["docs_processed"] == N_DOCS
    assert len(md_files) == n_ok > 0
    manifest = spark.read.parquet(f"{md_dir}/_manifest")
    assert manifest.count() == n_ok
    body = open(md_files[0], encoding="utf-8").read()
    assert body.startswith("---\nurl: ")
    # markdown column landed in the output table too
    assert (
        spark.read.parquet(out)
        .where("success AND length(markdown) = 0")
        .count()
        == 0
    )


def test_markdown_sink_failure_leaves_bucket_uncommitted(
    spark, corpus_path, tmp_path
):
    """Crash-safety ordering: the markdown sink runs BEFORE the lineage
    commit, so a sink failure must leave every bucket uncommitted (a
    resume redoes the wave and backfills the missing .md files).  The
    old order committed lineage first — a crash in the sink silently
    lost the wave's markdown artifacts forever."""
    out = str(tmp_path / "out")
    blocker = tmp_path / "md"
    blocker.write_text("a file where the sink needs a directory")
    with pytest.raises(Exception):
        run_extraction_job(
            spark,
            corpus_path,
            out,
            n_buckets=N_BUCKETS,
            waves=1,
            markdown_dir=str(blocker),
        )
    assert tableio.read_committed_buckets(spark, out) == set()
    # resume after fixing the sink target completes the job
    blocker.unlink()
    stats = run_extraction_job(
        spark,
        corpus_path,
        out,
        n_buckets=N_BUCKETS,
        waves=1,
        resume=True,
        markdown_dir=str(blocker),
    )
    assert stats["docs_processed"] == N_DOCS
    manifest = spark.read.parquet(f"{blocker}/_manifest")
    assert manifest.count() == N_DOCS


def test_manifest_rerun_converges_no_duplicates(
    spark, corpus_path, tmp_path
):
    """Re-running a wave over the same markdown_dir (crash-before-
    commit redo, or a retried run) must converge: the manifest is
    dynamically overwritten per bucket, not blindly appended, so no
    duplicate rows accumulate for the same files."""
    md_dir = str(tmp_path / "md")
    for out in (str(tmp_path / "o1"), str(tmp_path / "o2")):
        run_extraction_job(
            spark,
            corpus_path,
            out,
            n_buckets=N_BUCKETS,
            waves=2,
            markdown_dir=md_dir,
        )
    manifest = spark.read.parquet(f"{md_dir}/_manifest")
    assert manifest.count() == N_DOCS
    assert manifest.select("md_file").distinct().count() == N_DOCS


def test_markdown_sink_writes_frontmatter_files(spark, tmp_path):
    """D4 sink e2e (reference crawler.py:354-423): extraction with
    emit_markdown → one .md file per doc, YAML frontmatter header,
    deterministic flat filenames; manifest rows match the files."""
    import os

    from article_extractor_spark.sinks import write_markdown_files

    out_dir = str(tmp_path / "md")
    corpus = render_spans_to_html(corpus_dataframe(spark, 30, seed=7))
    articles = extract_articles(corpus, min_word_count=10, emit_markdown=True)
    manifest = write_markdown_files(
        articles, out_dir, extracted_at="2026-01-01T00:00:00+00:00"
    ).collect()
    ok = [r for r in articles.collect() if r["success"]]
    assert len(manifest) == len(ok) > 0

    files = sorted(os.listdir(out_dir))
    assert files == sorted(r["md_file"] for r in manifest)
    for row in manifest[:5]:
        path = os.path.join(out_dir, row["md_file"])
        content = open(path, encoding="utf-8").read()
        assert content.startswith("---\nurl: https://synth.example/")
        assert "\nextracted_at: 2026-01-01T00:00:00+00:00\n" in content
        assert "\nword_count: " in content
        assert content.split("---\n\n", 1)[1] != ""
        assert os.path.getsize(path) == row["n_bytes"]
        assert row["md_file"].startswith("synth.example__")
        assert row["md_file"].endswith(".md")


def test_jsonl_sink_round_trip_and_determinism(spark, tmp_path):
    """JSONL export e2e: every input row survives a parse round trip,
    shard assignment is the documented pure function of the id (md5
    mod n_shards — recomputed here in plain Python), the manifest
    matches the directory exactly, and a re-run over the same
    directory is byte-identical (idempotent resume)."""
    import hashlib
    import json
    import os

    from article_extractor_spark.sinks import write_jsonl_shards

    n_shards = 4
    out_dir = str(tmp_path / "jsonl")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "source")
        .limit(200)
    )
    manifest = sorted(
        write_jsonl_shards(
            docs, out_dir, id_col="doc_id", n_shards=n_shards
        ).collect()
    )
    want = {r["doc_id"]: r for r in docs.collect()}

    files = sorted(os.listdir(out_dir))
    assert files == sorted(r["file"] for r in manifest)
    assert sum(r["n_docs"] for r in manifest) == len(want)

    seen = {}
    for row in manifest:
        path = os.path.join(out_dir, row["file"])
        assert os.path.getsize(path) == row["n_bytes"]
        lines = open(path, encoding="utf-8").read().splitlines()
        assert len(lines) == row["n_docs"]
        ids_in_file = []
        for line in lines:
            obj = json.loads(line)
            assert list(obj) == ["doc_id", "text", "source"]
            assert obj["text"] == want[obj["doc_id"]]["text"]
            ids_in_file.append(str(obj["doc_id"]))
            # documented pure-function shard assignment
            h = int(hashlib.md5(str(obj["doc_id"]).encode()).hexdigest()[:15], 16)
            assert h % n_shards == row["shard"]
            seen[obj["doc_id"]] = True
        assert ids_in_file == sorted(ids_in_file)
    assert len(seen) == len(want)

    before = {f: open(os.path.join(out_dir, f), "rb").read() for f in files}
    write_jsonl_shards(
        docs, out_dir, id_col="doc_id", n_shards=n_shards
    ).collect()
    after = {f: open(os.path.join(out_dir, f), "rb").read() for f in files}
    assert before == after


def test_markdown_filename_matches_reference_rules(spark):
    """Column-expression filename vs the reference's _url_to_filepath
    semantics (crawler.py:392-423) on edge cases."""
    from article_extractor_spark.sinks import markdown_filename

    cases = [
        ("https://example.com/blog/post-1", "example.com__blog__post-1.md"),
        ("https://Example.COM:8080/", "example.com_8080__index.md"),
        ("https://example.com", "example.com__index.md"),
        ("https://example.com/a/b/?q=1&r=2", "example.com__a__b_q_1_r_2.md"),
        (
            "https://example.com/weird path/(x)!",
            "example.com__weird_path__x.md",
        ),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [
        r["f"]
        for r in df.select(markdown_filename(F.col("url")).alias("f")).collect()
    ]
    assert got == [want for _, want in cases]


def test_render_spans_is_jvm_side(spark):
    """The spans→html bridge must not contain a Python UDF (north rule:
    no per-row Python outside the one vectorized extraction stage)."""
    df = corpus_dataframe(spark, 5, seed=1, partitions=1)
    rendered = render_spans_to_html(df)
    plan = rendered._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_failure_rows_not_task_death(spark):
    """Garbage documents become success=false rows; the stage completes."""
    rows = [
        ("bad-1", "https://x.com/a", ""),
        ("bad-2", "https://x.com/b", "<div"),
        ("good-1", "https://x.com/c",
         "<body><main><article>" + "<p>Plenty of words, with commas, fill "
         "the paragraph for scoring purposes nicely.</p>" * 10
         + "</article></main></body>"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "html"])
    out = extract_articles(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert not by_id["bad-1"]["success"] and by_id["bad-1"]["error"]
    assert by_id["good-1"]["success"]
    assert len(out) == 3


def test_curate_subcommand_over_extraction_output(
    spark, corpus_path, tmp_path
):
    """The CLI curation pass over a real extraction output table:
    exactly one status per document (string ids used directly — no
    derived ordinal to collide), the benchmark slice strictly opt-in
    via --benchmark-table, statuses drawn from the funnel vocabulary."""
    from article_extractor_spark.job import main

    out = str(tmp_path / "cur_out")
    verdicts = str(tmp_path / "cur_verdicts")
    stats = run_extraction_job(
        spark, corpus_path, out, n_buckets=N_BUCKETS, waves=1
    )
    assert stats["docs_processed"] == N_DOCS
    assert main(["curate", "--table", out, "--out", verdicts]) == 0
    rows = spark.read.parquet(verdicts).collect()
    assert len(rows) == N_DOCS
    assert len({r["doc_id"] for r in rows}) == N_DOCS
    statuses = [r["status"] for r in rows]
    # the benchmark slice is opt-in via --benchmark-table; without it
    # NO document is silently classified benchmark (ADVICE r3)
    assert "benchmark" not in statuses
    assert "contaminated" not in statuses
    for s in statuses:
        assert s.startswith(
            ("quality:", "kept:", "exact_dup", "near_dup")
        ), s


def test_curate_benchmark_table_and_collision_free_ids(spark, tmp_path):
    """Explicit --benchmark-table drives decontamination, and ids that
    share a digit suffix ('siteA-42'/'siteB-42') each get exactly one
    status (the old derived ordinal collided them — ADVICE r3)."""
    from article_extractor_spark.job import main

    def spans_of(text):
        return [{"kind": "text", "text": text, "media_ref": None,
                 "offset": 0}]

    english = (
        "The committee published its annual report on Tuesday and the "
        "findings were discussed at length by members present in the "
        "chamber before a vote was finally taken that evening. Several "
        "delegates raised concerns about funding while others argued "
        "for broader reforms across education, transport, housing and "
        "public health. After considerable debate everyone agreed to "
        "revisit these proposals during next quarter once independent "
        "auditors deliver their complete assessment of regional budgets. "
    )
    rows = [
        ("siteA-42", spans_of(english + "Unique first ending appears here today.")),
        ("siteB-42", spans_of(english + "Another different second closing sentence instead.")),
        ("siteC-7", spans_of(english + "Finally this third document simply concludes gracefully.")),
    ]
    table = str(tmp_path / "table")
    spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    ).write.parquet(table)

    verdicts = str(tmp_path / "v1")
    assert main(["curate", "--table", table, "--out", verdicts]) == 0
    got = {r["doc_id"]: r["status"]
           for r in spark.read.parquet(verdicts).collect()}
    # one status per SOURCE id — suffix twins must not cross-assign
    assert set(got) == {"siteA-42", "siteB-42", "siteC-7"}
    assert all(not s.startswith(("benchmark", "contaminated"))
               for s in got.values()), got

    # benchmark table sharing 8-grams with every doc -> all docs that
    # survive quality/dup flip to 'contaminated'
    bench = str(tmp_path / "bench")
    spark.createDataFrame([(english,)], "text string").write.parquet(bench)
    verdicts2 = str(tmp_path / "v2")
    assert main([
        "curate", "--table", table, "--out", verdicts2,
        "--benchmark-table", bench,
    ]) == 0
    got2 = {r["doc_id"]: r["status"]
            for r in spark.read.parquet(verdicts2).collect()}
    assert set(got2) == set(got)
    for doc_id, status in got.items():
        if status.startswith("kept:"):
            assert got2[doc_id] == "contaminated", (doc_id, got2[doc_id])
    assert "contaminated" in got2.values()


def test_auto_giant_threshold_resolution_and_routing(spark):
    """giant_threshold='auto' derives the salting threshold from the
    corpus size distribution: a uniform corpus resolves to None (single
    scan — no regression possible), a giant-tailed one picks a
    threshold that isolates the tail, and the salted output is
    row-identical to the unsalted path."""
    from article_extractor_spark.operators.extraction import (
        GIANT_MIN_BYTES,
        resolve_giant_threshold,
    )

    def mkdf(rows):
        return spark.createDataFrame(
            rows, "doc_id string, url string, html string"
        )

    para = "<p>" + ("word " * 200) + "</p>"
    uniform = mkdf(
        [(f"u{i}", f"https://x.test/{i}",
          f"<html><body><article>{para}</article></body></html>")
         for i in range(50)]
    )
    assert resolve_giant_threshold(uniform) is None

    giant_body = "<p>" + ("lorem ipsum dolor sit amet " * 60000) + "</p>"
    assert len(giant_body) > GIANT_MIN_BYTES
    skewed_rows = [
        (f"n{i}", f"https://x.test/n{i}",
         f"<html><body><article>{para}</article></body></html>")
        for i in range(50)
    ] + [
        (f"g{i}", f"https://x.test/g{i}",
         f"<html><body><article>{giant_body}</article></body></html>")
        for i in range(2)
    ]
    skewed = mkdf(skewed_rows)
    thr = resolve_giant_threshold(skewed)
    assert thr is not None
    assert GIANT_MIN_BYTES <= thr <= len(giant_body) + 200
    auto_out = extract_articles(skewed, giant_threshold="auto")
    plain_out = extract_articles(skewed)
    cols = ["doc_id", "word_count", "success", "spans_emitted"]
    a = {tuple(r) for r in auto_out.select(cols).collect()}
    b = {tuple(r) for r in plain_out.select(cols).collect()}
    assert a == b and len(a) == len(skewed_rows)


def test_iceberg_probe_and_gated_branch(spark, tmp_path):
    """The real-Iceberg write/read twins are gated on a runtime-jar
    probe (``has_iceberg``, the ``has_image_codec`` pattern).  This
    sandbox ships no Iceberg jar, so the gate must (a) report False,
    (b) raise the documented NotImplementedError from both twins; in
    an Iceberg-enabled session the same test exercises the real
    ``USING iceberg`` + bucket-transform branch end-to-end."""
    df = spark.createDataFrame(
        [("d1", "hello"), ("d2", "world")], "doc_id string, text string"
    )
    if not tableio.has_iceberg(spark):
        with pytest.raises(NotImplementedError, match="[Ii]ceberg"):
            tableio.write_bucketed_iceberg(df, "local.db.docs")
        with pytest.raises(NotImplementedError, match="[Ii]ceberg"):
            tableio.read_table_iceberg(spark, "local.db.docs")
        pytest.skip("no Iceberg runtime jar on the classpath")
    # Iceberg-enabled environment: real branch (needs a catalog named
    # `local` configured as a hadoop catalog over a temp warehouse).
    tableio.write_bucketed_iceberg(df, "local.db.docs", n_buckets=4)
    back = tableio.read_table_iceberg(spark, "local.db.docs")
    assert {r["doc_id"] for r in back.collect()} == {"d1", "d2"}


def test_job_emit_metadata_column(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out-meta")
    stats = run_extraction_job(
        spark,
        corpus_path,
        out,
        n_buckets=N_BUCKETS,
        waves=1,
        emit_metadata=True,
    )
    assert stats["docs_processed"] == N_DOCS
    result = spark.read.parquet(out)
    assert "page_meta" in result.columns
    field = dict(
        (f.name, f) for f in result.schema.fields
    )["page_meta"]
    assert [sf.name for sf in field.dataType.fields] == [
        "og_title",
        "og_description",
        "og_image",
        "canonical_url",
        "published_time",
        "headline",
        "author",
    ]
    # the struct is attached on every row (synth pages carry no og
    # tags, so the fields are null but the struct itself is not)
    assert result.where("page_meta is null").count() == 0


def test_preshuffled_gate_on_for_aligned_path_corpus(
    spark, corpus_path, tmp_path
):
    """The exchange-free write engages only with provenance: a corpus
    READ FROM A PATH laid out as bucket=k dirs whose bucket values pass
    the sampled string-hash check (ADVICE r4)."""
    out = str(tmp_path / "out-aligned")
    stats = run_extraction_job(
        spark, corpus_path, out, n_buckets=N_BUCKETS, waves=2
    )
    assert stats["preshuffled"] is True
    assert stats["docs_processed"] == N_DOCS
    # synth corpus is uniform: auto giant salting must decline
    assert stats["giant_threshold"] is None


def test_preshuffled_gate_off_for_dataframe_corpus(
    spark, corpus_path, tmp_path
):
    """A DataFrame corpus has no physical bucket-dir provenance — the
    preshuffled fast path must stay off even when its bucket VALUES are
    aligned (task splits may span buckets, ADVICE r4)."""
    corpus = spark.read.parquet(corpus_path)
    stats = run_extraction_job(
        spark, corpus, str(tmp_path / "out-df"), n_buckets=N_BUCKETS, waves=1
    )
    assert stats["preshuffled"] is False
    assert stats["docs_processed"] == N_DOCS


def test_misaligned_bucket_corpus_recomputed_and_lineage_sound(
    spark, tmp_path
):
    """A corpus bucketed with a DIFFERENT n_buckets than the job's must
    (a) not take the preshuffled path, (b) have its bucket column
    recomputed so per-wave lineage counts stay correct — with the
    foreign column kept, a wave's rows land in other waves' output
    buckets and commit counts double (ADVICE r4)."""
    path = str(tmp_path / "c16")
    df = corpus_dataframe(spark, 40, seed=3, partitions=2)
    df = tableio.with_bucket(df, "doc_id", 16)
    tableio.write_bucketed(df, path, dynamic=False, n_buckets=16)

    out = str(tmp_path / "out16")
    stats = run_extraction_job(spark, path, out, n_buckets=8, waves=2)
    assert stats["preshuffled"] is False
    assert stats["docs_processed"] == 40

    lineage = spark.read.parquet(tableio.lineage_path(out))
    assert lineage.agg(F.sum("docs_in")).collect()[0][0] == 40
    result = spark.read.parquet(out)
    assert result.count() == 40
    # every row's partition-dir bucket equals the string-hash bucket
    expected = F.pmod(
        F.xxhash64(F.col("doc_id").cast("string")), F.lit(8)
    ).cast("int")
    assert result.where(F.col("bucket") != expected).count() == 0
    # resume over the same misaligned corpus is a no-op
    stats2 = run_extraction_job(spark, path, out, n_buckets=8, waves=2)
    assert stats2["docs_processed"] == 0


def test_empty_corpus_wave_does_not_crash_readback(spark, corpus_path, tmp_path):
    """A wave that writes ZERO rows leaves an output dir with only
    _SUCCESS; the lineage read-back must degrade to an empty frame (it
    reads with the known written schema), not throw 'Unable to infer
    schema' (ADVICE r4)."""
    out = str(tmp_path / "out-empty")
    empty = spark.read.parquet(corpus_path).where(F.lit(False))
    stats = run_extraction_job(spark, empty, out, n_buckets=N_BUCKETS, waves=2)
    assert stats["docs_processed"] == 0
    assert stats["docs_failed"] == 0
    # a later run over the real corpus proceeds normally on the same out
    stats2 = run_extraction_job(
        spark, corpus_path, out, n_buckets=N_BUCKETS, waves=2
    )
    assert stats2["docs_processed"] == N_DOCS
