#!/usr/bin/env python3
"""Two-run determinism compare: canonical row-set MD5 per query dir.

Usage: compare_runs.py <outDirA> <outDirB>

For each query subdirectory present in A, reads both runs' parquet,
sorts columns by name and rows by their string form (the canonical form
BASELINE.md documents), hashes, and reports per-query MATCH/DIFF.
Exit 0 iff every query matches and B is missing none.
"""
import sys, os, hashlib
import duckdb


def digest(con, path):
    rel = con.sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')")
    cols = sorted(rel.columns)
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(
        f"SELECT {sel} FROM read_parquet('{path}/*.parquet')").fetchall()
    canon = sorted(repr(r) for r in rows)
    h = hashlib.md5()
    for r in canon:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows)


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d)))
    bad = 0
    for n in names:
        pa, pb = os.path.join(a, n), os.path.join(b, n)
        if not os.path.isdir(pb):
            print(f"MISS {n}: absent in {b}")
            bad += 1
            continue
        (ha, na), (hb, nb) = digest(con, pa), digest(con, pb)
        if ha == hb:
            print(f"OK   {n}: {na} rows bit-identical")
        else:
            print(f"DIFF {n}: {na} vs {nb} rows, {ha} vs {hb}")
            bad += 1
    print(f"{bad} DIFFERENCES" if bad else
          f"ALL {len(names)} QUERIES BIT-IDENTICAL")
    sys.exit(1 if bad else 0)


main()
