"""Deterministic scale-up of the driver's test tables.

Replicates /root/testdata/sf0.1 R times (default 10 -> "sf1") with
per-replica key offsets that preserve referential integrity:

- region / nation are fixed dimensions and copied as-is;
- every replicated table shifts its primary key by ``i * (max_key + 1)``
  and shifts foreign keys into OTHER replicated tables by the same
  per-table offset, so replica i's orders reference replica i's
  customers etc. (n_nationkey references stay unshifted — nation is
  shared);
- documents/embeddings payloads are copied verbatim, which makes the
  scaled corpus an honest dedup stress: every document exists R times
  exactly, so the dedup family sees real duplicate mass instead of
  near-unique rows.

Everything is a pure function of the source tables — no wall clock, no
RNG — so the output is bit-reproducible and BOTH engines (Spark query,
DuckDB oracle) read the identical files.  Usage:

    python scripts/make_bigsf.py /tmp/sf1 [R] [src_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"

# table -> (pk column, {fk column -> table whose pk-offset it follows})
KEYED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        "l_orderkey",
        {"l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "events_user"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
COPY_AS_IS = ("region", "nation")


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = Path(sys.argv[3] if len(sys.argv) > 3 else SRC_DEFAULT)
    out_dir.mkdir(parents=True, exist_ok=True)

    con = duckdb.connect()

    # per-table offsets = max(pk) + 1 so replica key ranges never overlap
    offsets: dict[str, int] = {}
    for table, (pk, _) in KEYED.items():
        offsets[table] = (
            con.execute(
                f"SELECT max({pk}) + 1 FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
        )
    # l_orderkey is really a FK to orders — force the same offset so
    # replica i's lineitems always reference replica i's orders, even
    # if max(l_orderkey) != max(o_orderkey) in some source generation
    offsets["lineitem"] = offsets["orders"]
    # user_id is a key in its own right (not events' pk)
    offsets["events_user"] = (
        con.execute(
            f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
        ).fetchone()[0]
    )

    for table in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied as-is")

    for table, (pk, fks) in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        select = []
        for c in cols:
            if c == pk:
                select.append(f"{c} + i * {offsets[table]} AS {c}")
            elif c in fks:
                select.append(f"{c} + i * {offsets[fks[c]]} AS {c}")
            else:
                select.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(select)} "
            f"FROM '{src}/{table}.parquet', range({replicas}) AS r(i) "
            f"ORDER BY i, {pk}) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({replicas}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
