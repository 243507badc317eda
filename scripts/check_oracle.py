#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each
oracle_sql.json query in DuckDB over the same parquet tables, compare to
the Spark result parquet (sorted columns by name, sorted rows, hashed
values). Usage: check_oracle.py <sfDir> <verifyOutDir>
Driver-side tool only — the Scala library does not depend on this."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps → iso strings, floats stay floats
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # explicit per-key Spark failures recorded by Verify — surface them
    # even though the missing parquet would also be caught below
    fail_path = f"{out_dir}/failures.json"
    if os.path.exists(fail_path):
        for name, msg in sorted(json.load(open(fail_path)).items()):
            print(f"  SPARK FAILED {name}: {msg[:200]}")
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"  MISSING spark result: {name}")
            n_fail += 1
            continue
        try:
            duck = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"  ORACLE ERROR {name}: {e}")
            n_fail += 1
            continue
        spark = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
        if list(duck.columns) != list(spark.columns):
            print(f"  FAIL {name}: columns duck={list(duck.columns)} spark={list(spark.columns)}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"  FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        mism = []
        for c in duck.columns:
            a, b = duck[c], spark[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
            else:
                try:
                    eq = (a == b) | (a.isna() & b.isna())
                except Exception:
                    eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                mism.append(f"{c}[row{i}]: duck={a[i]!r} spark={b[i]!r}")
        if mism:
            print(f"  FAIL {name}: {'; '.join(mism[:3])}")
            n_fail += 1
        else:
            print(f"  PASS {name} ({len(duck)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
