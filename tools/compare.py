#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the testdata parquet tables and compare with the Spark
parquet dumps produced by graft.Verify (columns sorted by name, dtypes
checked, values hashed). Usage:

    python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            # Read the Spark dump through DuckDB, exactly like the driver —
            # pandas.read_parquet maps date32 differently and false-fails.
            spark_df = norm(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            ora_df = norm(con.sql(sql).df())
            rows = len(spark_df) == len(ora_df)
            schema = list(spark_df.dtypes.astype(str)) == list(
                ora_df.dtypes.astype(str))
            values = rows and schema and spark_df.equals(ora_df)
            status = "OK " if (rows and schema and values) else "FAIL"
            if status == "FAIL":
                n_bad += 1
            print(f"{status} {name}: rows={rows} ({len(spark_df)}/"
                  f"{len(ora_df)}) schema={schema} values={values}")
            if not schema:
                print(f"  spark dtypes: {dict(spark_df.dtypes.astype(str))}")
                print(f"  oracle dtypes: {dict(ora_df.dtypes.astype(str))}")
            if rows and schema and not values:
                neq = (spark_df != ora_df) & ~(
                    spark_df.isna() & ora_df.isna())
                bad_rows = neq.any(axis=1)
                print(spark_df[bad_rows].head(3))
                print(ora_df[bad_rows].head(3))
        except Exception as e:  # noqa: BLE001 - report and continue
            n_bad += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
