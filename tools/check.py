#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each entry in
outDir/oracle_sql.json, run the SQL in DuckDB over the sfDir parquet tables
and compare (rows, schema-ish, values) against outDir/<name>/ parquet written
by graft.Verify. Dev tool only — not part of the library.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob, math

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

from graft_tables import create_views


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_to_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = [tuple(norm_cell(v) for v in row) for row in zip(
        *[tbl.column(c).to_pylist() for c in cols])]
    rows.sort()
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    create_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_bad += 1
                continue
            got = pa.Table.from_batches([b for f in files for b in pq.read_table(f).to_batches()]) \
                if len(files) > 1 else pq.read_table(files[0])
            want = con.execute(sql).fetch_arrow_table()
            gc, gr = table_to_rows(got)
            wc, wr = table_to_rows(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_bad += 1
            elif len(gr) != len(wr):
                print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
                print(f"  spark[0]: {gr[0] if gr else None}")
                print(f"  duck [0]: {wr[0] if wr else None}")
                n_bad += 1
            elif gr != wr:
                diffs = [(a, b) for a, b in zip(gr, wr) if a != b]
                print(f"FAIL {name}: {len(diffs)}/{len(gr)} row diffs; first: ")
                print(f"  spark: {diffs[0][0]}")
                print(f"  duck : {diffs[0][1]}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(gr)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
    # rows-only entries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        rows = sum(pq.read_metadata(f).num_rows for f in files) if files else 0
        print(f"info {name}: rows-only, {rows} rows")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
