"""Driver-style correctness check: run every registered Spark query and
its DuckDB oracle on the same parquet tables; compare row count, schema
(column names), and exact values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from article_extractor_spark.queries import ORACLE_SQL, QUERY_FNS
    from article_extractor_spark.session import build_session

    spark = build_session(app_name="check-oracles")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in QUERY_FNS.items():
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in ORACLE_SQL:
            print(f"{name:28s} rows-only: {len(spark_pdf)} rows")
            continue
        oracle_pdf = con.execute(ORACLE_SQL[name]).fetchdf()
        issues = []
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            issues.append(
                f"schema {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
            )
        if len(spark_pdf) != len(oracle_pdf):
            issues.append(f"rows {len(spark_pdf)} vs {len(oracle_pdf)}")
        if not issues:
            a, b = normalize(spark_pdf), normalize(oracle_pdf)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                n_bad = int(diff.sum())
                issues.append(f"values differ in {n_bad}/{len(a)} rows")
                bad = a[diff].head(3)
                badb = b[diff].head(3)
                issues.append(f"spark:\n{bad}\noracle:\n{badb}")
        status = "OK" if not issues else "FAIL"
        print(f"{name:28s} {status}  ({len(spark_pdf)} rows)")
        for i in issues:
            print(f"    {i}")
        if issues:
            failures.append(name)

    print()
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
