#!/usr/bin/env python3
"""Dev-only sf1 stand-in generator (driver testdata stops at sf0.1).

Builds a 10x scale-up of /root/testdata/sf0.1 into an output dir by
key-shifted copies: fact/dim keys are offset per copy so join
selectivities, per-key group sizes, and dim/fact ratios are preserved
while row counts scale linearly (the TPC-H convention). Value columns
are copied as-is, so VALUE-domain-bounded frames (distinct prices
etc.) deliberately stay constant-size — scaling pressure lands on
rows, keys, and shuffles, which is what the scaling bench measures.

Text and embeddings are perturbed deterministically per copy (every
7th token replaced / one dimension nudged) so near-dup and ANN
workloads don't degenerate into 10-cliques of identical content.

With --widen, measure VALUE columns are also offset per copy so value
DOMAINS scale with the data instead of staying constant: the r08
verdict noted key-shifted copies can never exercise the maxDomain
gates (count-frame operators see a constant domain whatever the row
count). Offsets are chosen per column class: integer-band shifts for
deliberately-discretized measures (l_quantity + i*50 keeps each copy
in its own band → domain ×copies, still tiny), fractional shifts for
near-continuous measures (l_extendedprice, o_totalprice, value →
distincts ≈ rows, the shape the gates exist to refuse). All offsets
are exact in double (≤2 decimal places over small magnitudes), so the
Spark-vs-DuckDB oracle gates stay bit-clean on the widened fixture.

With --row-group-size N, every output parquet is written with N-row
row groups (DuckDB COPY ROW_GROUP_SIZE / pyarrow row_group_size)
instead of the writers' defaults. The driver's sf0.1 fixtures are ONE
row group per file, and Spark assigns a scan task per row-group
midpoint — so every scan-rooted stage is single-task at sf0.1
whatever the core count (the r17 verdict's suspect_cpus_ignored
finding: a fixture artifact, not an engine property). `copies=1
--row-group-size 18000` writes a byte-equal-DATA, multi-row-group
stand-in on which core-count scaling is actually measurable.

Usage: python3 scripts/gen_sf_scale.py [copies] [outDir] [--widen]
         [--row-group-size N]
Defaults: 10 /tmp/graft_sf1
"""
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
WIDEN = "--widen" in sys.argv
args = [a for a in sys.argv[1:] if a != "--widen"]
RGS = None
if "--row-group-size" in args:
    i = args.index("--row-group-size")
    RGS = int(args[i + 1])
    del args[i:i + 2]
COPIES = int(args[0]) if len(args) > 0 else 10
OUT = args[1] if len(args) > 1 else "/tmp/graft_sf1"
RG_COPY = f", ROW_GROUP_SIZE {RGS}" if RGS else ""
RG_PA = {"row_group_size": RGS} if RGS else {}

# per-copy value offsets (applied only with --widen); {i} = copy index
WIDEN_OFFSETS = {
    "orders": {"o_totalprice": "o_totalprice + {i} * 7.25"},
    "lineitem": {"l_quantity": "l_quantity + {i} * 50",
                 "l_extendedprice": "l_extendedprice + {i} * 937.75"},
    "events": {"value": "value + {i} * 0.25"},
}

con = duckdb.connect()


def mx(table, col):
    return con.sql(
        f"SELECT MAX({col}) FROM '{SRC}/{table}.parquet'").fetchall()[0][0]


def copy_union(table, shifted, plain):
    """COPY a UNION ALL of `COPIES` key-shifted selects to parquet."""
    selects = []
    widen = WIDEN_OFFSETS.get(table, {}) if WIDEN else {}
    for i in range(COPIES):
        cols = [f"{c} + {i} * {off + 1} AS {c}" for c, off in shifted] + [
            f"{widen[c].format(i=i)} AS {c}" if c in widen else c
            for c in plain]
        selects.append(
            f"SELECT {', '.join(cols)} FROM '{SRC}/{table}.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{OUT}/{table}.parquet' (FORMAT PARQUET{RG_COPY})")
    n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{table}.parquet'").fetchall()[0][0]
    print(f"[gen] {table}: {n} rows")


import os
os.makedirs(OUT, exist_ok=True)

# tiny dims are shared across copies (the TPC-H region/nation shape)
for t in ("region", "nation"):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET{RG_COPY})")
    print(f"[gen] {t}: copied")

ck, pk, sk, ok = (mx("customer", "c_custkey"), mx("part", "p_partkey"),
                  mx("supplier", "s_suppkey"), mx("orders", "o_orderkey"))
eid, uid = mx("events", "event_id"), mx("events", "user_id")

copy_union("customer", [("c_custkey", ck)],
           ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
copy_union("supplier", [("s_suppkey", sk)],
           ["s_name", "s_nationkey", "s_acctbal"])
copy_union("part", [("p_partkey", pk)],
           ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
copy_union("orders", [("o_orderkey", ok), ("o_custkey", ck)],
           ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"])
copy_union("lineitem",
           [("l_orderkey", ok), ("l_partkey", pk), ("l_suppkey", sk)],
           ["l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"])
copy_union("events", [("event_id", eid), ("user_id", uid)],
           ["ts", "event_type", "value", "props"])

# documents: perturb every 7th token per copy (starting at position 3)
# so copies are neither exact dups nor (usually) simhash near-dups of
# their originals. Positions 0-2 are NEVER touched: prefix-blocked
# operators (edit-distance titles, prefix-dup groups) key on the
# leading tokens, and rewriting position 0 with a per-copy constant
# collapsed their block keys into mega-blocks — an artifact quadratic,
# not a data-scaling signal (measured: q133 85x before this guard).
docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
did = max(docs["doc_id"])
out = {k: [] for k in docs}
for i in range(COPIES):
    for j in range(len(docs["doc_id"])):
        text = docs["text"][j]
        if i > 0 and text:
            toks = text.split(" ")
            for p in range(3, len(toks), 7):
                toks[p] = f"cp{i}w{(p + i) % 5}"
            text = " ".join(toks)
        out["doc_id"].append(docs["doc_id"][j] + i * (did + 1))
        out["text"].append(text)
        out["lang"].append(docs["lang"][j])
        out["source"].append(docs["source"][j])
        out["n_chars"].append(len(text) if text else 0)
pq.write_table(pa.table(out), f"{OUT}/documents.parquet", **RG_PA)
print(f"[gen] documents: {len(out['doc_id'])} rows")

# embeddings: nudge a couple of dimensions per copy (keeps vectors
# near their originals but not identical — ANN top-k stays tie-free)
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
vid = max(emb["vec_id"])
eo = {k: [] for k in emb}
for i in range(COPIES):
    for j in range(len(emb["vec_id"])):
        v = np.array(emb["embedding"][j], dtype=np.float32)
        if i > 0:
            v[(i * 3) % len(v)] += 0.001 * i
            v[(i * 7 + 1) % len(v)] -= 0.0007 * i
        eo["vec_id"].append(emb["vec_id"][j] + i * (vid + 1))
        eo["embedding"].append(v.tolist())
        eo["label"].append(emb["label"][j])
schema = pa.schema([("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int32())])
pq.write_table(pa.table(eo, schema=schema), f"{OUT}/embeddings.parquet",
               **RG_PA)
print(f"[gen] embeddings: {len(eo['vec_id'])} rows")
print(f"[gen] done -> {OUT}")
