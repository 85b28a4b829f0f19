#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name on both sides, and compares schema +
row-for-row values. Exit 1 if any query mismatches.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: exact repr of the rounded double
        return repr(v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_bad += 1
            continue
        try:
            duck_tbl = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_bad += 1
            continue
        stypes = {c: str(spark_tbl.schema.field(c).type) for c in s_cols}
        dtypes = {c: str(duck_tbl.schema.field(c).type) for c in d_cols}
        type_diff = {c: (stypes[c], dtypes[c]) for c in s_cols if stypes[c] != dtypes[c]}
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
            n_bad += 1
            continue
        s_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols])) if s_cols else []
        d_rows = list(zip(*[duck_tbl.column(c).to_pylist() for c in d_cols])) if d_cols else []
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if tuple(map(canon, sr)) != tuple(map(canon, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}")
            n_bad += 1
        elif type_diff:
            print(f"WARN {name}: values OK but dtype diff {type_diff}")
        else:
            print(f"OK   {name}: {spark_tbl.num_rows} rows")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
