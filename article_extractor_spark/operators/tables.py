"""HTML table extraction — structured (row, col, cell) records.

The reference's span model flattens tables into text (extractor.py's
serializer walks them like any block); a training-data pipeline that
wants structured table corpora (document-AI pretraining, table-QA
data) needs the grid back.  ``extract_tables`` walks the SAME DOM the
extraction pipeline parses and emits one row per cell with document
order preserved: tables in document order (``table_idx``), rows in
document order (``row_idx``), and ``col_idx`` advanced by ``colspan``
(malformed/absent colspan counts as 1) — the part naive splitters get
wrong.  ``is_header`` is the th/td distinction.

Nested tables are kept separate: a row belongs to its NEAREST ancestor
table, so an inner table's cells never leak into the outer grid (the
ancestor check, not an "all descendants" query).  ``rowspan`` is
recorded as-is via col advance only (cells spanning rows are emitted
once, at their anchor row — the Wikipedia-scale corner case a consumer
reconstructs from the colspan/rowspan attrs if it needs the full
raster; attrs are deterministic here so the oracle stays analytic).

Spark shape: ONE ``mapInArrow`` stage over (doc_id, html) pruned
columns — the same zero-shuffle scan→Arrow→rows plan as the extraction
flagship; per-document failure isolation (malformed HTML yields no
rows for that doc rather than task death — parse_html never raises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TABLE_SCHEMA = (
    "doc_id bigint, table_idx int, row_idx int, col_idx int, "
    "is_header boolean, cell string"
)


def _nearest_ancestor(node, names):
    p = node.parent
    while p is not None:
        if p.name in names:
            return p
        p = p.parent
    return None


def _int_attr(node, name: str, default: int = 1) -> int:
    raw = node.attrs.get(name, "")
    try:
        v = int(raw)
    except (TypeError, ValueError):
        return default
    return v if v >= 1 else default


def extract_tables_rows(html: str, doc_id: int) -> list[tuple]:
    """Pure per-document kernel (shared by the Arrow stage and tests)."""
    from ..dom.parser import parse_html

    try:
        root = parse_html(html)
    except Exception:  # contract: damaged docs yield no rows, not death
        return []
    out: list[tuple] = []
    tables = [n for n in root.iter_elements() if n.name == "table"]
    for t_idx, table in enumerate(tables):
        rows = [
            n
            for n in table.iter_elements()
            if n.name == "tr" and _nearest_ancestor(n, ("table",)) is table
        ]
        for r_idx, tr in enumerate(rows):
            col = 0
            for cell in tr.children:
                if cell.name not in ("td", "th"):
                    continue
                out.append(
                    (
                        doc_id,
                        t_idx,
                        r_idx,
                        col,
                        cell.name == "th",
                        cell.to_text(separator=" ", strip=True),
                    )
                )
                col += _int_attr(cell, "colspan")
    return out


def _table_batches(batches):
    import pyarrow as pa

    names = ["doc_id", "table_idx", "row_idx", "col_idx", "is_header", "cell"]
    types = [
        pa.int64(), pa.int32(), pa.int32(), pa.int32(), pa.bool_(),
        pa.string(),
    ]
    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        htmls = batch.column("html").to_pylist()
        rows: list[tuple] = []
        for doc_id, html in zip(doc_ids, htmls):
            rows.extend(extract_tables_rows(html or "", doc_id))
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(c), t) for c, t in zip(cols, types)],
            names=names,
        )


def extract_tables(
    df: DataFrame, *, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One-to-many Arrow expansion: (id, html) → one row per table
    cell.  Input is pruned to the two columns before the exchange."""
    from ..shipping import ensure_shipped
    from .parallelism import ensure_compute_parallelism

    ensure_shipped(df.sparkSession)
    pruned = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(html_col).cast("string").alias("html"),
    )
    return ensure_compute_parallelism(pruned).mapInArrow(
        _table_batches, schema=TABLE_SCHEMA
    )


TABLE_COLS = 4  # synthetic grid width


def documents_as_table_html(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benchmarks: render each document as a page
    whose article holds a real data table (thead + tbody grid of the
    document's tokens, ``TABLE_COLS`` per row) plus a fixed auxiliary
    table — entirely JVM-side Column expressions, so corpus synthesis
    never leaves codegen.  Every 4th document's header uses
    ``colspan="2"`` on the first th (header cells land at col 0, 2, 3)
    — the col-advance rule the extractor must honor.  The expected
    cell set is analytically derivable from the text, so the extractor
    has an exact SQL oracle."""
    from ..functions import text as X

    esc = lambda c: F.replace(  # noqa: E731
        F.replace(
            F.replace(c, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    toks = X.ws_tokens(F.lower(F.col("text")))
    n = F.size(toks)
    nrows = F.floor((n + TABLE_COLS - 1) / TABLE_COLS).cast("int")
    body = F.when(n > 0, F.array_join(
        F.transform(
            F.sequence(F.lit(0), nrows - 1),
            lambda r: F.concat(
                F.lit("<tr>"),
                F.array_join(
                    F.transform(
                        F.slice(toks, r * TABLE_COLS + 1, TABLE_COLS),
                        lambda t: F.concat(
                            F.lit("<td>"), esc(t), F.lit("</td>")
                        ),
                    ),
                    "",
                ),
                F.lit("</tr>"),
            ),
        ),
        "",
    )).otherwise(F.lit(""))
    header = F.when(
        F.col("doc_id") % 4 == 0,
        F.lit('<tr><th colspan="2">c0</th><th>c2</th><th>c3</th></tr>'),
    ).otherwise(
        F.lit("<tr><th>c0</th><th>c1</th><th>c2</th><th>c3</th></tr>")
    )
    html = F.concat(
        F.lit("<html><body><nav><a href=\"/\">home</a></nav><article>"),
        F.lit("<h1>Doc </h1><table class=\"data\"><thead>"),
        header,
        F.lit("</thead><tbody>"),
        body,
        F.lit("</tbody></table><p>after the table</p>"),
        F.lit("<table class=\"aux\"><tr><td>x</td><td>y</td></tr></table>"),
        F.lit("</article><footer>footer</footer></body></html>"),
    )
    return docs.select(F.col("doc_id").cast("long"), html.alias("html"))
