#!/usr/bin/env python3
"""Synthesize an sf1 bench corpus (10x sf0.1) into /tmp/testdata_sf1 for
the scale rehearsal (BENCH_SF1.json). NOT for correctness runs — the
oracle corpus stays the driver's read-only /root/testdata.

Strategy: replicate sf0.1 R times with disjoint key ranges, preserving
the generator's own scaling law observed between sf0.01 and sf0.1
(rows x10, key cardinalities x10, FIXED time range / source count /
lang count / dims). Per-replica text gets a per-word prefix so replicas
share no shingles (otherwise every doc would acquire 9 cross-replica
near-duplicates — a heavier-than-real workload); in-replica duplicate
structure is preserved. Embeddings get a tiny deterministic per-replica
rotation for the same reason, matching the generator's 500->2000 (x4)
embedding scaling.
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
DST = "/tmp/testdata_sf1"
R = 10

os.makedirs(DST, exist_ok=True)

def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet", version="2.6",
                   compression="snappy")
    print(f"{name}: {table.num_rows} rows")

def shift(col, delta):
    return pc.add(col, pa.scalar(delta, type=col.type))

def replicate(name, key_shifts, per_replica=None, copies=R):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    spans = {k: int(pc.max(src[k]).as_py()) + 1 for k in key_shifts}
    parts = []
    for i in range(copies):
        cols = {}
        for field in src.schema.names:
            c = src[field].combine_chunks()
            if field in key_shifts:
                c = shift(c, i * spans[field])
            cols[field] = c
        if per_replica:
            cols = per_replica(i, cols)
        parts.append(pa.table(cols))
    write(name, pa.concat_tables(parts))

# tiny dims: fixed across scale factors (like sources/langs)
for t in ["region", "nation"]:
    write(t, pq.read_table(f"{SRC}/{t}.parquet"))

replicate("customer", ["c_custkey"])
replicate("supplier", ["s_suppkey"])
replicate("part", ["p_partkey"])
replicate("orders", ["o_orderkey", "o_custkey"])
replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

def events_replica(i, cols):
    # same one-month range; x10 users at the same per-user density —
    # the generator's own sf0.01 -> sf0.1 law. 1s jitter decorrelates
    # replica timestamps without moving any window boundary.
    cols["ts"] = pc.add(cols["ts"], pa.scalar(i * 1_000_000_000, type=pa.int64())) \
        if pa.types.is_integer(cols["ts"].type) else \
        pc.add(cols["ts"], pa.scalar(i, type=pa.duration("s")))
    return cols

replicate("events", ["event_id", "user_id"], per_replica=events_replica)

def docs_replica(i, cols):
    if i == 0:
        return cols
    # per-word replica prefix: no shingle survives across replicas, so
    # near-dup structure stays x10 the sf0.1 structure instead of
    # gaining 9-way cross-replica cliques
    texts = [f"q{i}" + t.replace(" ", f" q{i}") if t else t
             for t in cols["text"].to_pylist()]
    cols["text"] = pa.array(texts, type=pa.string())
    return cols

replicate("documents", ["doc_id"], per_replica=docs_replica)

def emb_replica(i, cols):
    if i == 0:
        return cols
    # deterministic perturbation: swap a rotating pair of coordinates and
    # nudge one — preserves norms approximately, kills exact duplicates
    vecs = cols["embedding"].to_pylist()
    out = []
    for j, v in enumerate(vecs):
        v = list(v)
        a, b = i % len(v), (i * 7 + 3) % len(v)
        v[a], v[b] = v[b], v[a]
        v[(i + j) % len(v)] += 0.001 * i
        out.append(v)
    cols["embedding"] = pa.array(out, type=cols["embedding"].type)
    return cols

# embeddings scale x4 in the generator's own law (500 -> 2000)
replicate("embeddings", ["vec_id"], per_replica=emb_replica, copies=4)
print("done ->", DST)
