#!/usr/bin/env python3
"""Independent (non-Spark, non-JVM) replay of a graft-written Delta table:
parses the JSON log + classic checkpoint, URL-decodes paths, decodes
deletion-vector blobs (z85 + portable RoaringBitmapArray, reimplemented here
from the public PROTOCOL.md spec), and prints the table's live row count —
what a third-party reader would see. Dev tool; CrossLangSpec drives it.

Usage: python3 tools/compat_check.py <tableDir> [sumCol]  →  one JSON line
With sumCol, also sums that int column over LIVE rows only (deletion-vector
positions excluded) — a content-level check, not just a row count. Tables
whose schema carries VARIANT columns get their physical parquet layout
validated (struct<metadata: binary, value: binary> per the spec).
"""
import json, glob, os, struct, sys, urllib.parse

import pyarrow.parquet as pq

Z85 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" \
      ".-:+=^!/*?&<>()[]{}@%$#"
Z85D = {c: i for i, c in enumerate(Z85)}


def z85_decode(s):
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            v = v * 85 + Z85D[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def decode_roaring32(buf, off):
    (cookie,) = struct.unpack_from("<i", buf, off)
    off += 4
    run_bitmap = None
    if (cookie & 0xFFFF) == 12347:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_bitmap = buf[off:off + nb]
        off += nb
    elif cookie == 12346:
        (n,) = struct.unpack_from("<i", buf, off)
        off += 4
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, off)
        off += 4
        keys.append(k)
        cards.append(c + 1)
    if run_bitmap is None or n >= 4:
        off += 4 * n  # offset headers
    vals = []
    for i in range(n):
        base = keys[i] << 16
        is_run = run_bitmap is not None and (run_bitmap[i // 8] >> (i % 8)) & 1
        if is_run:
            (nruns,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(nruns):
                s, l = struct.unpack_from("<HH", buf, off)
                off += 4
                vals += [base | v for v in range(s, s + l + 1)]
        elif cards[i] > 4096:
            for w in range(1024):
                (word,) = struct.unpack_from("<Q", buf, off)
                off += 8
                b = 0
                while word:
                    if word & 1:
                        vals.append(base | (w * 64 + b))
                    word >>= 1
                    b += 1
        else:
            for _ in range(cards[i]):
                (v,) = struct.unpack_from("<H", buf, off)
                off += 2
                vals.append(base | v)
    return vals, off


def decode_dv_data(data):
    (magic,) = struct.unpack_from("<i", data, 0)
    assert magic == 1681511377, f"bad DV magic {magic}"
    (nbitmaps,) = struct.unpack_from("<q", data, 4)
    off = 12
    out = []
    for _ in range(nbitmaps):
        (high,) = struct.unpack_from("<i", data, off)
        off += 4
        vals, off = decode_roaring32(data, off)
        out += [(high << 32) | v for v in vals]
    return out


def read_dv(base, dv):
    st = dv["storageType"]
    if st == "i":
        return decode_dv_data(z85_decode(dv["pathOrInlineDv"]))
    assert st == "u", f"unsupported storageType {st}"
    s = dv["pathOrInlineDv"]
    prefix, z = s[:-20], s[-20:]
    raw = z85_decode(z)
    hi, lo = struct.unpack(">qq", raw)
    uuid = f"{hi & (2**64-1):016x}"[:8] + "-" + f"{hi & (2**64-1):016x}"[8:12] + \
        "-" + f"{hi & (2**64-1):016x}"[12:] + "-" + f"{lo & (2**64-1):016x}"[:4] + \
        "-" + f"{lo & (2**64-1):016x}"[4:]
    name = f"deletion_vector_{uuid}.bin"
    p = os.path.join(base, prefix, name) if prefix else os.path.join(base, name)
    with open(p, "rb") as f:
        f.seek(dv.get("offset", 1))
        size = struct.unpack(">i", f.read(4))[0]
        assert size == dv["sizeInBytes"], "DV size mismatch"
        return decode_dv_data(f.read(size))



def dv_uid(action):
    dv = action.get("deletionVector")
    if not dv:
        return ""
    uid = dv.get("storageType", "") + dv.get("pathOrInlineDv", "")
    if dv.get("offset") is not None:
        uid += f"@{dv['offset']}"
    return uid


def file_key(action):
    # PROTOCOL.md action reconciliation: file identity is
    # (path, deletionVector uniqueId), NOT path alone — a DV rewrite leaves a
    # same-path tombstone beside the live add (delta-rs checkpoints do this)
    return (action["path"], dv_uid(action))


def apply_parquet_actions(path, adds, proto, meta):
    for r in pq.read_table(path).to_pylist():
        if r.get("add"):
            adds[file_key(r["add"])] = r["add"]
        if r.get("remove"):
            adds.pop(file_key(r["remove"]), None)
        if r.get("protocol") and r["protocol"].get("minReaderVersion"):
            proto = r["protocol"]
        if r.get("metaData") and r["metaData"].get("id"):
            meta = r["metaData"]
    return proto, meta


def variant_cols(schema_str):
    """Top-level VARIANT column names from the metaData schemaString."""
    sch = json.loads(schema_str)
    return [f["name"] for f in sch.get("fields", []) if f.get("type") == "variant"]


def check_variant_layout(path, cols):
    """Each VARIANT column must be physically struct<metadata,value binary>."""
    arrow = pq.read_schema(path)
    for c in cols:
        f = arrow.field(c)
        names = sorted(sf.name for sf in f.type)
        assert names == ["metadata", "value"], \
            f"variant col {c} physical children {names}, want [metadata, value]"
        for sf in f.type:
            assert str(sf.type) == "binary", \
                f"variant {c}.{sf.name} is {sf.type}, want binary"
    return True


def main(table, sum_col=None):
    log = os.path.join(table, "_delta_log")
    adds, proto, meta = {}, None, None
    ck = sorted(glob.glob(os.path.join(log, "*.checkpoint*.parquet")))
    # v2: uuid-named json manifest whose sidecar actions carry the file state
    v2 = sorted(p for p in glob.glob(os.path.join(log, "*.checkpoint.*.json")))
    ckv = -1
    if ck:
        ckv = int(os.path.basename(ck[-1]).split(".")[0])
        parts = [p for p in ck if os.path.basename(p).startswith(f"{ckv:020d}.")]
        for p in parts:
            proto, meta = apply_parquet_actions(p, adds, proto, meta)
    v2v = max((int(os.path.basename(p).split(".")[0]) for p in v2), default=-1)
    if v2v > ckv:
        ckv = v2v
        # a checkpoint is a COMPLETE snapshot: replaying the newer v2
        # manifest on top of an older classic checkpoint's state would keep
        # files whose remove tombstones expired before the v2 write
        # (Checkpoints drops tombstones past deletedFileRetentionDuration),
        # resurrecting dead rows in the replay
        adds, proto, meta = {}, None, None
        manifest = [p for p in v2
                    if os.path.basename(p).startswith(f"{ckv:020d}.")][-1]
        for line in open(manifest):
            if not line.strip():
                continue
            a = json.loads(line)
            if "protocol" in a:
                proto = a["protocol"]
            elif "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                adds[file_key(a["add"])] = a["add"]
            elif "sidecar" in a:
                sc = os.path.join(log, "_sidecars", a["sidecar"]["path"])
                proto, meta = apply_parquet_actions(sc, adds, proto, meta)
    for f in sorted(glob.glob(os.path.join(log, "*.json"))):
        if ".checkpoint." in os.path.basename(f):
            continue  # v2 manifest, not a commit
        if int(os.path.basename(f).split(".")[0]) <= ckv:
            continue
        for line in open(f):
            if not line.strip():
                continue
            a = json.loads(line)
            if "add" in a:
                adds[file_key(a["add"])] = a["add"]
            elif "remove" in a:
                adds.pop(file_key(a["remove"]), None)
            elif "protocol" in a:
                proto = a["protocol"]
            elif "metaData" in a:
                meta = a["metaData"]

    rows = 0
    masked = 0
    col_sum = 0 if sum_col else None
    vcols = variant_cols(meta["schemaString"]) if meta else []
    variant_ok = None
    for (rel, _dvid), a in adds.items():
        fs_rel = urllib.parse.unquote(rel)  # paths are percent-encoded URLs
        p = os.path.join(table, fs_rel)
        assert os.path.exists(p), f"missing data file {p}"
        n = pq.read_metadata(p).num_rows
        dv = a.get("deletionVector")
        positions = []
        if dv and dv.get("cardinality", 0) > 0:
            positions = read_dv(table, dv)
            assert len(positions) == dv["cardinality"], \
                f"DV cardinality mismatch: {len(positions)} vs {dv['cardinality']}"
            masked += len(positions)
            n -= len(positions)
        rows += n
        if sum_col is not None:
            vals = pq.read_table(p, columns=[sum_col])[sum_col].to_pylist()
            dead = set(positions)
            col_sum += sum(v for i, v in enumerate(vals)
                           if i not in dead and v is not None)
        if vcols:
            variant_ok = check_variant_layout(p, vcols)
    out = {
        "files": len(adds), "rows": rows, "dv_masked": masked,
        "minReaderVersion": proto.get("minReaderVersion") if proto else None,
        # joined, not a JSON list: CrossLangSpec's one-line parser is flat
        "readerFeatures": "|".join(sorted(proto.get("readerFeatures") or []))
        if proto else None,
        "partitionColumns": meta.get("partitionColumns") if meta else None,
        "variantCols": len(vcols),
        "ok": True}
    if variant_ok is not None:
        out["variantLayoutOk"] = variant_ok
    if sum_col is not None:
        out[f"sum_{sum_col}"] = col_sum
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
