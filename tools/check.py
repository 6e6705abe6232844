#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify's output
parquet + oracle_sql.json, runs each oracle in DuckDB against the same
source tables, and compares (sorted columns, sorted rows, dtypes).
Usage: python3 tools/check.py [sfdir] [outdir]
"""
import duckdb, json, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            exp = canon(con.sql(oracle[name]).df())
            got = canon(con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
        elif not exp.equals(got):
            neq = (exp != got) & ~(exp.isna() & got.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(exp)} rows differ; first:")
            print("  exp:", exp[bad].head(2).to_dict("records"))
            print("  got:", got[bad].head(2).to_dict("records"))
            if [str(t) for t in exp.dtypes] != [str(t) for t in got.dtypes]:
                print("  dtypes exp:", dict(zip(exp.columns, map(str, exp.dtypes))))
                print("  dtypes got:", dict(zip(got.columns, map(str, got.dtypes))))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
