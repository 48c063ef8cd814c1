#!/usr/bin/env python3
"""Parallel variant of check.py for large-SF gate probes: one DuckDB process
per entry (N workers), same column-sorted cell-normalized compare. Heavy
oracles can be excluded (--skip a,b,c) and reported as SKIPPED so the gate
record stays honest. Dev tool only — not part of the library.

Usage: python3 tools/check_par.py <sfDir> <outDir> [workers] [--skip a,b,c]
"""
import json, sys, glob, math, os
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_of(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = [tuple(norm_cell(v) for v in row) for row in zip(
        *[tbl.column(c).to_pylist() for c in cols])]
    rows.sort()
    return cols, rows


def check_one(args):
    sf_dir, out_dir, name, sql = args
    import time
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from graft_tables import create_views
    t0 = time.time()
    try:
        con = duckdb.connect()
        create_views(con, sf_dir)
        # naming matches check.py's sides exactly (spark = engine dump,
        # duck = DuckDB oracle) so FAIL details can't mislabel sides
        duck = con.sql(sql).arrow()
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            return (name, "MISSING", 0, time.time() - t0, "no spark dump")
        spark = pa.concat_tables([pq.read_table(f) for f in files])
        duck_cols, duck_rows = rows_of(duck)
        spark_cols, spark_rows = rows_of(spark)
        if duck_cols != spark_cols:
            return (name, "FAIL", len(spark_rows), time.time() - t0,
                    f"schema spark={spark_cols} vs duck={duck_cols}")
        if duck_rows != spark_rows:
            detail = f"rows spark={len(spark_rows)} vs duck={len(duck_rows)}"
            if len(duck_rows) == len(spark_rows):
                bad = next((i for i, (a, b) in enumerate(
                    zip(spark_rows, duck_rows)) if a != b), -1)
                detail = (f"cell mismatch at sorted row {bad}: "
                          f"spark={spark_rows[bad][:4]} duck={duck_rows[bad][:4]}")
            return (name, "FAIL", len(spark_rows), time.time() - t0, detail)
        return (name, "ok", len(spark_rows), time.time() - t0, "")
    except Exception as e:
        return (name, "ERR", 0, time.time() - t0, f"{type(e).__name__}: {e}"[:200])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else 8
    skip = set()
    for i, a in enumerate(sys.argv):
        if a == "--skip":
            skip = set(sys.argv[i + 1].split(","))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    jobs = [(sf_dir, out_dir, n, s) for n, s in sorted(oracle.items())
            if n not in skip]
    for n in sorted(skip & set(oracle)):
        print(f"SKIP {n} (excluded heavy oracle)", flush=True)
    ok = fail = 0
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for name, status, rows, sec, detail in ex.map(check_one, jobs):
            print(f"{status:4} {name} ({rows} rows, {sec:.1f}s) {detail}", flush=True)
            if status == "ok":
                ok += 1
            else:
                fail += 1
    # rows-only entries (present in outDir, absent from oracle_sql.json) —
    # same superset behavior as check.py: without this loop a no-oracle
    # entry silently vanishes from the gate record
    import pyarrow.parquet as pq
    rows_only = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        rows = sum(pq.read_metadata(f).num_rows for f in files) if files else 0
        rows_only += 1
        print(f"info {name}: rows-only, {rows} rows", flush=True)
    print(f"\n{ok} ok, {fail} failed, {len(skip)} skipped, "
          f"{rows_only} rows-only", flush=True)


if __name__ == "__main__":
    main()
