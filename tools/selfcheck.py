#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
out/<name> parquet written by graft.Verify, run the matching oracle SQL
from out/oracle_sql.json in DuckDB against the same sf dir, and compare
(columns sorted by name, rows sorted, exact values; floats reported with
max abs diff when not exactly equal)."""
import json, sys, math, datetime
import duckdb
import pandas as pd
import numpy as np

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}"); fails += 1; continue

    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); fails += 1; continue
    a = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
    b = duck_df[dc].sort_values(dc, kind="mergesort").reset_index(drop=True)
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); fails += 1; continue
    # Dtype class: the driver's hash is type-sensitive, so an int64 Spark
    # column vs a float64 oracle column (e.g. DuckDB promoting SUM(BIGINT)
    # to HUGEINT) must FAIL here, not be coerced away. Width differences
    # within a class (int32 vs int64) are tolerated; kind crossings are not.
    def lift_dates(s):
        # Spark DATE parquet comes back as object-of-datetime.date while
        # DuckDB DATE comes back as datetime64 — the driver hashes these as
        # equal, so lift date objects to timestamps before classing.
        if s.dtype.kind == "O":
            nn = s.dropna()
            if len(nn) and all(isinstance(v, datetime.date)
                               and not isinstance(v, datetime.datetime)
                               for v in nn):
                return pd.to_datetime(s)
        return s

    def dclass(s):
        k = s.dtype.kind
        if k in "iu": return "int"
        if k == "f": return "float"
        if k == "b": return "bool"
        if k == "M": return "timestamp"
        return "other"

    def ts_norm(s):
        # tz-aware → UTC naive, then a common unit, so aware-vs-naive and
        # us-vs-ns differences don't produce false diffs once both sides
        # agree they are timestamps.
        if getattr(s.dtype, "tz", None) is not None:
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        return s.astype("datetime64[us]")

    bad = []
    for c in sc:
        av, bv = lift_dates(a[c]), lift_dates(b[c])
        ka, kb = dclass(av), dclass(bv)
        if ka != kb:
            bad.append(f"{c} (DTYPE spark={av.dtype} duck={bv.dtype})")
            continue
        if ka == "float":
            av = av.astype("float64"); bv = bv.astype("float64")
            eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
            if not eq.all():
                d = np.nanmax(np.abs(av.values - bv.values))
                bad.append(f"{c} (float, maxdiff={d:.3e}, n={int((~eq).sum())})")
        elif ka == "timestamp":
            av, bv = ts_norm(av), ts_norm(bv)
            eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
            if not eq.all():
                n = int((~eq).sum()); i = int(np.argmax(~eq))
                bad.append(f"{c} (ts, n={n}, first@{i}: "
                           f"{av.values[i]!r} vs {bv.values[i]!r})")
        else:
            av = av.astype(str); bv = bv.astype(str)
            if not (av.values == bv.values).all():
                n = int((av.values != bv.values).sum())
                i = int(np.argmax(av.values != bv.values))
                bad.append(f"{c} (n={n}, first@{i}: {av.values[i]!r} vs {bv.values[i]!r})")
    if bad:
        print(f"FAIL {name}: {', '.join(bad)}"); fails += 1
    else:
        print(f"OK   {name} ({len(a)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
