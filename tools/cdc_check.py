#!/usr/bin/env python3
"""Independent (pyarrow, non-JVM) read of the CDC files of ONE commit:
replays the JSON log for the metadata in effect AT that commit (including
the commit's OWN metaData action — a schema-evolving MERGE commits the
evolved metadata alongside its cdc actions, and CDC files are written
under the COMMITTED physical names), maps a logical column to its
physical name under column mapping, and reports what a third-party CDF
reader derives: row count, the logical column's non-null count, and the
_change_type values present.

Usage: python3 tools/cdc_check.py <tableDir> <version> <logicalCol>
Prints one JSON line. CrossLangSpec drives it.
"""
import json, os, sys, urllib.parse

import pyarrow.parquet as pq


def main(table, version, col):
    log = os.path.join(table, "_delta_log")
    meta = None
    cdc = []
    for v in range(version + 1):
        p = os.path.join(log, "%020d.json" % v)
        if not os.path.exists(p):
            continue
        for line in open(p):
            line = line.strip()
            if not line:
                continue
            a = json.loads(line)
            if "metaData" in a:
                meta = a["metaData"]
            if v == version and "cdc" in a:
                cdc.append(a["cdc"])
    assert meta is not None, "no metaData action found in the log"
    assert cdc, "commit %d carries no cdc actions" % version

    schema = json.loads(meta["schemaString"])
    mapping = meta.get("configuration", {}).get(
        "delta.columnMapping.mode", "none")
    phys = None
    for f in schema["fields"]:
        if f["name"] == col:
            md = f.get("metadata", {})
            phys = (md.get("delta.columnMapping.physicalName", col)
                    if mapping != "none" else col)
    assert phys is not None, "logical column %r not in committed schema %s" % (
        col, [f["name"] for f in schema["fields"]])

    rows = nonnull = 0
    types = set()
    for c in cdc:
        rel = urllib.parse.unquote(c["path"])
        t = pq.read_table(os.path.join(table, rel))
        rows += t.num_rows
        if "_change_type" in t.column_names:
            types.update(t.column("_change_type").to_pylist())
        assert phys in t.column_names, (
            "physical column %r absent from CDC file %s (have %s) — the "
            "file was written under a stale pre-commit metadata" % (
                phys, rel, t.column_names))
        nonnull += t.num_rows - t.column(phys).null_count
    print(json.dumps({"rows": rows, "nonnull": nonnull, "physical": phys,
                      "mapping": mapping, "change_types": sorted(types)}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
