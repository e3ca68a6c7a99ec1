"""Staged evaluation of a query's DuckDB oracle for 100x-scale runs.

DuckDB inlines non-materialized CTEs at every reference site; for an
oracle whose top-level CTE chain re-references earlier CTEs several
times (quality_lexical: `base` x3, `tok` x2, each recomputing the whole
weak-label pipeline), the one-shot evaluation recomputes the expensive
stages multiplicatively and its concurrent out-of-core operators spill
far beyond this sandbox's disk at 100x scale (observed >60 GB on a
150 MB corpus before being killed).

This runner executes the SAME oracle SQL text stage-by-stage: it splits
the top-level `WITH name AS (...), ...` chain by balanced-parenthesis
scan — no rewriting of any stage body — and materializes each CTE once
as a DuckDB temp table, in order, then runs the final SELECT.  CTE →
temp-table materialization is semantics-preserving for non-recursive
CTEs, so the comparison is still against the registered oracle, just
evaluated with each stage computed exactly once.

Usage: python scripts/staged_oracle.py <query> [sf_dir] [--merge ART]

--merge writes the verdict into the given CORRECTNESS artifact with a
`staged_oracle: true` marker.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def split_ctes(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Split a top-level `WITH a AS (...), b AS (...) SELECT ...` into
    [(name, body), ...] and the final statement. Bodies are returned
    verbatim (balanced-paren scan; nested WITHs stay inside bodies)."""
    s = sql.strip()
    assert s.upper().startswith("WITH"), "oracle is not a WITH query"
    i = 4
    ctes: list[tuple[str, str]] = []
    while True:
        while s[i].isspace() or s[i] == ",":
            i += 1
        j = i
        while s[j] not in " \t\n(":
            j += 1
        name = s[i:j]
        k = s.index("(", j)
        depth = 0
        for m in range(k, len(s)):
            if s[m] == "(":
                depth += 1
            elif s[m] == ")":
                depth -= 1
                if depth == 0:
                    break
        body = s[k + 1 : m]
        ctes.append((name, body))
        i = m + 1
        while i < len(s) and s[i].isspace():
            i += 1
        if i < len(s) and s[i] == ",":
            continue
        return ctes, s[i:]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = sys.argv[1:]
    merge = None
    if "--merge" in argv:
        i = argv.index("--merge")
        merge = argv[i + 1]
        del argv[i : i + 2]
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/tmp/sf10"

    from article_extractor_spark.queries import ORACLE_SQL, QUERY_FNS
    from article_extractor_spark.session import build_session

    ctes, final = split_ctes(ORACLE_SQL[name])
    print(f"{len(ctes)} stages: {[c[0] for c in ctes]}")

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_staged_tmp'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='60GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.monotonic()
    for cname, body in ctes:
        ts = time.monotonic()
        con.execute(f"CREATE TEMP TABLE {cname} AS {body}")
        n = con.execute(f"SELECT count(*) FROM {cname}").fetchone()[0]
        print(f"  stage {cname}: {n} rows in "
              f"{time.monotonic() - ts:.1f}s", flush=True)
    oracle_pdf = con.execute(final).fetchdf()
    oracle_sec = time.monotonic() - t0
    print(f"oracle: {len(oracle_pdf)} rows in {oracle_sec:.1f}s", flush=True)

    spark = build_session(app_name=f"staged-oracle-{name}")
    t0 = time.monotonic()
    spark_pdf = QUERY_FNS[name](spark, sf_dir).toPandas()
    spark_sec = time.monotonic() - t0
    print(f"spark:  {len(spark_pdf)} rows in {spark_sec:.1f}s", flush=True)

    schema_ok = sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    rows_ok = len(spark_pdf) == len(oracle_pdf)
    hash_ok = False
    if schema_ok and rows_ok:
        a, b = normalize(spark_pdf), normalize(oracle_pdf)
        hash_ok = a.equals(b)
        if not hash_ok:
            diff = (a != b).any(axis=1)
            print(f"values differ in {int(diff.sum())}/{len(a)} rows")
            print(a[diff].head(3))
            print(b[diff].head(3))
    rec = {
        "rows_match": rows_ok,
        "schema_match": schema_ok,
        "hash_match": hash_ok,
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "spark_sec": round(spark_sec, 3),
        "oracle_sec": round(oracle_sec, 3),
        "staged_oracle": True,
    }
    print(f"{name}: {'GREEN' if hash_ok else 'RED'}  {rec}")
    if merge:
        with open(merge) as f:
            art = json.load(f)
        art["queries"][name] = rec
        with open(merge, "w") as f:
            json.dump(art, f, indent=1)
        print(f"merged into {merge}")
    return 0 if hash_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
