#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
sf parquet tables; sorts columns by name, sorts rows, compares values.
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return repr(v)

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); bad += 1; continue
            sdf = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); bad += 1; continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); bad += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"); bad += 1
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); bad += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)"); ok += 1
    print(f"\n{ok} ok, {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
