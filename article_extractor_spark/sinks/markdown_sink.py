"""D4 markdown-file sink (reference crawler.py:354-423).

The reference's primary artifact is one Markdown file per page with a
YAML frontmatter header, named ``{hostname}__{path-slug}.md`` in a flat
output directory.  Spark-first split of that work:

- **naming + frontmatter are Column expressions** (JVM-side, whole-stage
  codegen) so they are cheap, deterministic, and oracle-checkable;
- **file IO runs inside one ``mapInPandas`` stage** — each task writes
  its partition's files and emits a tiny manifest row per file, so the
  sink distributes across executors and never funnels documents through
  the driver.  (On a real cluster point ``out_dir`` at a shared
  filesystem / object store mount; the manifest is the commit record.)

Determinism: the reference stamps files with ``datetime.now()``
(crawler.py:319); here the caller passes ``extracted_at`` explicitly so
re-runs are byte-identical (resume produces identical files).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("md_file", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _sanitized_components(path: Column) -> Column:
    """Split a URL path on '/', sanitize each component the way the
    reference does (crawler.py:404-417): keep word chars + hyphens,
    collapse runs of '_', strip edge '_', drop empties."""
    comp = F.split(path, "/")
    cleaned = F.transform(
        comp,
        lambda c: F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, r"[^\w\-]", "_"), "_+", "_"
            ),
            "^_+|_+$",
            "",
        ),
    )
    return F.filter(cleaned, lambda c: c != "")


def markdown_filename(url: Column) -> Column:
    """Deterministic flat filename ``{hostname}__{path-slug}.md`` from a
    URL (reference ``_url_to_filepath``, crawler.py:392-423): hostname
    lowercased with ':' → '_', path stripped of edge '/' (or 'index'),
    query appended with '_', components sanitized and joined '__'."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"^[a-zA-Z][\w+.-]*://([^/?#]+)", 1)),
        ":",
        "_",
    )
    raw_path = F.regexp_replace(
        F.regexp_extract(url, r"^[a-zA-Z][\w+.-]*://[^/?#]*([^?#]*)", 1),
        "^/+|/+$",
        "",
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    path = F.when(raw_path == "", F.lit("index")).otherwise(raw_path)
    path = F.when(query != "", F.concat(path, F.lit("_"), query)).otherwise(
        path
    )
    slug = F.array_join(_sanitized_components(path), "__")
    slug = F.when(slug == "", F.lit("index")).otherwise(slug)
    return F.concat(host, F.lit("__"), slug, F.lit(".md"))


def markdown_document(
    url: Column,
    title: Column,
    markdown: Column,
    word_count: Column,
    extracted_at: str,
) -> Column:
    """Full file content: YAML frontmatter + markdown body, matching the
    reference's template byte-for-byte (crawler.py:380-388)."""
    quoted_title = F.regexp_replace(title, '"', '\\\\"')
    return F.concat(
        F.lit("---\nurl: "),
        url,
        F.lit('\ntitle: "'),
        quoted_title,
        F.lit('"\nextracted_at: '),
        F.lit(extracted_at),
        F.lit("\nword_count: "),
        word_count.cast("string"),
        F.lit("\n---\n\n"),
        markdown,
    )


def _writer_batches(
    out_dir: str,
) -> "Iterator[pd.DataFrame]":
    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for batch in batches:
            sizes = []
            for fname, content in zip(batch["md_file"], batch["md_doc"]):
                data = (content or "").encode("utf-8")
                with open(os.path.join(out_dir, fname), "wb") as fh:
                    fh.write(data)
                sizes.append(len(data))
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype(str),
                    "md_file": batch["md_file"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return write


def write_markdown_files(
    articles: DataFrame,
    out_dir: str,
    *,
    extracted_at: str = "1970-01-01T00:00:00+00:00",
) -> DataFrame:
    """Write one ``.md`` file per successful article; returns the
    manifest DataFrame (doc_id, md_file, n_bytes) — an action on it
    (collect/write) performs the IO.

    Input needs (doc_id, url, title, markdown, word_count, success);
    run ``extract_articles(..., emit_markdown=True)`` upstream.  Name
    and content are computed JVM-side; the Python stage only does IO.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(articles.sparkSession)
    payload = (
        articles.where(F.col("success"))
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            markdown_filename(F.col("url")).alias("md_file"),
            markdown_document(
                F.col("url"),
                F.col("title"),
                F.col("markdown"),
                F.col("word_count"),
                extracted_at,
            ).alias("md_doc"),
        )
    )
    return payload.mapInPandas(
        _writer_batches(out_dir), schema=MANIFEST_SCHEMA
    )
