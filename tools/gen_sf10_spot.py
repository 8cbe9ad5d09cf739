#!/usr/bin/env python3
"""Synthesize the sf10 SPOT corpus (100x sf0.1) into /tmp/testdata_sf10
for the worst-tier scale rehearsal (BENCH_SF10_SPOT.json). Only the
tables the spot queries read are generated — orders (src_bloom_skipping,
src_versioned_prune), events (the resample family, rel_outliers_mad),
documents (text_lm_score) — the full corpus at 100x would be wasted I/O.

Same scaling law as gen_sf1.py (replicate with disjoint key ranges,
fixed time range / source count; per-word replica prefix so replicas
share no shingles), with R=100. NOT for correctness runs.
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
DST = "/tmp/testdata_sf10"
R = 100

os.makedirs(DST, exist_ok=True)


def write(name, parts):
    pq.write_table(pa.concat_tables(parts), f"{DST}/{name}.parquet",
                   version="2.6", compression="snappy")


def replicate(name, key_shifts, per_replica=None, copies=R):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    spans = {k: int(pc.max(src[k]).as_py()) + 1 for k in key_shifts}
    parts = []
    for i in range(copies):
        cols = {}
        for field in src.schema.names:
            c = src[field].combine_chunks()
            if field in key_shifts:
                c = pc.add(c, pa.scalar(i * spans[field], type=c.type))
            cols[field] = c
        if per_replica:
            cols = per_replica(i, cols)
        parts.append(pa.table(cols))
    write(name, parts)
    print(f"{name}: {sum(p.num_rows for p in parts)} rows")


# tiny fixed dims: graft.Bench's session warmer reads region
for t in ["region", "nation"]:
    write(t, [pq.read_table(f"{SRC}/{t}.parquet")])

replicate("orders", ["o_orderkey", "o_custkey"])


def events_replica(i, cols):
    # same one-month range; x100 users at the same per-user density.
    # i-second jitter decorrelates replica timestamps without moving any
    # window boundary.
    cols["ts"] = pc.add(cols["ts"], pa.scalar(i * 1_000_000_000,
                                              type=pa.int64())) \
        if pa.types.is_integer(cols["ts"].type) else \
        pc.add(cols["ts"], pa.scalar(i, type=pa.duration("s")))
    return cols


replicate("events", ["event_id", "user_id"], per_replica=events_replica)


def docs_replica(i, cols):
    if i == 0:
        return cols
    texts = [f"q{i}" + t.replace(" ", f" q{i}") if t else t
             for t in cols["text"].to_pylist()]
    cols["text"] = pa.array(texts, type=pa.string())
    return cols


replicate("documents", ["doc_id"], per_replica=docs_replica)
print("done ->", DST)
