#!/usr/bin/env python3
"""Static oracle-SQL type audit (the q51 HUGEINT class).

DuckDB types sum(BIGINT) — including window sums — as HUGEINT. The driver's
correctness harness fetches DuckDB results via pandas, which renders HUGEINT
cells as float64 ("47211234.0") while Spark emits int64 ("47211234"): a hash
mismatch on value-identical rows. The builder-side check (tools/check.py)
fetches via Arrow, which masks the class. This tool closes the gap statically:
it runs `DESCRIBE <sql>` for every oracle entry and fails if any OUTPUT column
has a type the two fetch paths normalize differently (HUGEINT/UHUGEINT).

Usage:
  sbt 'runMain graft.DumpOracleSql target/oracle_sql.json'
  python3 tools/oracle_audit.py /root/testdata/sf0.001 target/oracle_sql.json

Dev tool only — not part of the library. Rule for new entries: any output
cell fed by a DuckDB sum()/window-sum over integers must be wrapped
CAST(... AS BIGINT) (or CAST AS DOUBLE if fractional) in the final SELECT.
"""
import json
import sys

import duckdb

from graft_tables import create_views

BAD_TYPES = {"HUGEINT", "UHUGEINT"}

# Second flagged class: raw TIMESTAMP/TIMESTAMPTZ output cells. q51's first
# two rounds of red were timestamp-normalization-flavored before the HUGEINT
# root cause surfaced — the driver's pandas fetch and the builder's Arrow
# fetch render timestamp cells through different normalization paths, so any
# NEW entry emitting one must be a deliberate decision, not an accident.
# DATE cells are fine (both fetch paths render 'YYYY-MM-DD').
# Allowlist: every entry below has been hash-green on the DRIVER gate for
# multiple rounds with these exact raw-timestamp cells (r10 = 210/210), so
# their cell paths are proven; new entries should prefer DATE casts or
# epoch/yyyymmdd BIGINT keys and only join this list once driver-proven.
TIMESTAMP_ALLOWLIST = {
    "delete_partial", "delete_partition", "delta_partition_pruning",
    "delta_scan_full", "delta_scan_pruned", "events_funnel", "events_hourly",
    "events_session_bounds", "generate_manifest", "merge_upsert",
    "optimize_compact", "optimize_incremental", "optimize_zorder",
    "replace_where", "stats_columns", "streaming_sessions",
    "streaming_windowed_agg", "time_travel", "tpch_q18_shape",
    "tpch_q3_shape", "vacuum_op",
}


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    create_views(con, sf_dir)
    oracle = json.load(open(oracle_json))
    bad_entries = set()
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            # un-auditable SQL is a FAILURE, not a skip: an entry DuckDB
            # can't even DESCRIBE is exactly the unvetted class this gate
            # exists to stop (and would fail the driver's oracle run too)
            print(f"BAD  {name}: DESCRIBE failed: {str(e)[:200]}")
            bad_entries.add(name)
            continue
        bad = [(c[0], c[1]) for c in cols
               if any(b in c[1].upper() for b in BAD_TYPES)]
        if bad:
            bad_entries.add(name)
            print(f"BAD  {name}: un-cast widened output cells: {bad}")
        ts = [(c[0], c[1]) for c in cols if "TIMESTAMP" in c[1].upper()]
        if ts and name not in TIMESTAMP_ALLOWLIST:
            bad_entries.add(name)
            print(f"BAD  {name}: raw timestamp output cells {ts} — prefer a "
                  "DATE cast or an epoch/yyyymmdd BIGINT key; allowlist only "
                  "once the DRIVER gate has proven the cells green")
    n_bad = len(bad_entries)
    if n_bad:
        print(f"\n{n_bad}/{len(oracle)} entries failed the audit — un-cast "
              "HUGEINT cells need CAST(... AS BIGINT) in the final SELECT; "
              "un-allowlisted TIMESTAMP cells need DATE/BIGINT forms; "
              "DESCRIBE failures need DuckDB-runnable SQL.")
        sys.exit(1)
    print(f"clean: {len(oracle)} oracle entries, no HUGEINT/UHUGEINT and no "
          "un-vetted timestamp output cells")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
