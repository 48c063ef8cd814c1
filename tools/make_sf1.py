#!/usr/bin/env python3
"""Synthesize an sf1-scale bench dataset (10x sf0.1) for the scaling probe
(round-11 verdict item: "this code targets ~100 TB but has only ever been
benched at sf0.1"). The driver ships no sf1 testdata, so big tables are
duplicated 10x with key offsets that preserve the join/dedup topology:

- orders/lineitem: o_orderkey/l_orderkey offset by copy*maxKey so the
  orders-lineitem join keeps its 1:4 shape and merge sources stay
  duplicate-free; o_custkey unchanged (10x orders per customer, customer
  dim untouched — join_agg still broadcasts it).
- documents: doc_id offset; text salted with a per-copy prefix so the
  near-dup family measures ENGINE scaling, not a synthetic 10-identical-
  copies near-dup blowup (which would inflate candidate pairs O(copies^2)
  by construction).
- embeddings: vec_id offset, vectors/labels unchanged (ANN just sees 10x
  rows per cell).
- events: event_id/user_id offset (10x users, same per-user density).
- dims (region nation customer supplier part): copied as-is.

Usage: python3 tools/make_sf1.py [outDir=/tmp/graft_sf1] [copies=10]
Dev tool only — not part of the library.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(out_dir="/tmp/graft_sf1", copies=10):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    rng = f"range({copies})"

    def write(name, sql):
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        write(dim, f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')")

    ok = con.execute(
        f"SELECT max(o_orderkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    # MergeGrid.benchUpsertSource builds its insert keys as o_orderkey +
    # 10,000,000; scaled keys crossing that constant would collide with the
    # shifted rows and garble the merge benches this dataset exists to feed
    assert copies * ok < 10_000_000, (
        f"copies*maxKey = {copies * ok} would cross MergeGrid's 10M "
        "insert-key shift; lower copies or raise the shift in MergeGrid")
    write("orders", f"""
        SELECT o_orderkey + c.i*{ok} AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), (SELECT unnest({rng}) AS i) c""")
    write("lineitem", f"""
        SELECT l_orderkey + c.i*{ok} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), (SELECT unnest({rng}) AS i) c""")

    did = con.execute(
        f"SELECT max(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    # WORD-level salt: a prefix-only salt leaves the copies' 3-gram shingle
    # sets ~identical (jaccard → 1), making every copy a TRUE near-dup of
    # its siblings — output pairs then inflate C(copies,2) per identity
    # group by construction and the near-dup rows measure the synthetic
    # blowup, not engine scaling (observed: 27x ngram_jaccard at 10x rows).
    # Prefixing every token gives cross-copy-disjoint shingles while each
    # copy keeps the organic within-copy near-dup density → true pairs
    # scale linearly in copies, which is the honest scaling workload.
    write("documents", f"""
        WITH salted AS (
          SELECT doc_id + c.i*{did} AS doc_id,
                 CASE WHEN c.i = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> 'c' || c.i || w), ' ') END AS text,
                 lang, source
          FROM read_parquet('{SRC}/documents.parquet'), (SELECT unnest({rng}) AS i) c)
        SELECT doc_id, text, lang, source,
               -- recomputed: the salt changes the length, and the sf0.1
               -- invariant n_chars = length(text) must hold at sf1 too
               CAST(length(text) AS BIGINT) AS n_chars
        FROM salted""")

    vid = con.execute(
        f"SELECT max(vec_id)+1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    write("embeddings", f"""
        SELECT vec_id + c.i*{vid} AS vec_id, embedding, label
        FROM read_parquet('{SRC}/embeddings.parquet'), (SELECT unnest({rng}) AS i) c""")

    eid = con.execute(
        f"SELECT max(event_id)+1, max(user_id)+1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    write("events", f"""
        SELECT event_id + c.i*{eid[0]} AS event_id, ts,
               user_id + c.i*{eid[1]} AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), (SELECT unnest({rng}) AS i) c""")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, copies)
