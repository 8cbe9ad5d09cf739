#!/usr/bin/env python3
"""Mechanical round-over-round bench comparison.

Joins two BENCH_LOCAL-format records (old, new), normalizes per-query
times by each run's machine-speed calibration (`calib_sec`, the fixed
xxhash64 job Bench times alongside the queries), and reports:

  - host speed ratio (new calib / old calib) — how much of a raw total
    delta is the MACHINE, not the code;
  - raw and calib-normalized totals over the common query set;
  - per-query normalized-ratio outliers beyond a threshold (default
    1.3x / 0.7x) — the list worth reading for real regressions/wins;
  - queries added/removed between the runs.

Usage: bench_compare.py OLD.json NEW.json [threshold]
A record without calib_sec (pre-round-8) degrades to raw ratios with a
loud note. Exit code 0 always — this is a report, not a gate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    return d, qs


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, oq = load(old_path)
    new, nq = load(new_path)
    oc, nc = old.get("calib_sec"), new.get("calib_sec")
    ocpu, ncpu = old.get("cpus"), new.get("cpus")
    if oc and nc and ocpu is not None and str(ocpu) != str(ncpu):
        # the calibration job's partition count tracks SPARK_GRAFT_CPUS, so
        # calib ratios across different cpu counts measure configured
        # parallelism, not host speed — refuse to normalize rather than
        # silently skew every ratio
        host = 1.0
        note = (f" (CPUS DIFFER old={ocpu} new={ncpu} — calib not comparable,"
                " raw ratios only)")
    elif oc and nc:
        host = nc / oc
        note = ""
    else:
        host = 1.0
        note = " (NO CALIB in one record — raw ratios, host speed unknown)"
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    raw_old = sum(oq[q] for q in common)
    raw_new = sum(nq[q] for q in common)
    # normalized ratio: (new/new_calib) / (old/old_calib) = (new/old)/host
    ratios = {q: (nq[q] / oq[q]) / host for q in common if oq[q] > 0}
    med = sorted(ratios.values())[len(ratios) // 2] if ratios else float("nan")
    # raw per-query median alongside: the calib job is pure-CPU, most
    # suite queries are orchestration-bound, so when calib moves but the
    # raw median over UNCHANGED queries sits at ~1.0 the calib delta is a
    # calibration artifact, not a real host-speed change — report both and
    # let the reader pick the one the evidence supports
    raw_ratios = sorted(nq[q] / oq[q] for q in common if oq[q] > 0)
    med_raw = raw_ratios[len(raw_ratios) // 2] if raw_ratios else float("nan")
    out = {
        "old": old_path,
        "new": new_path,
        "host_speed_ratio": round(host, 3),
        "common_queries": len(common),
        "raw_total_old": round(raw_old, 2),
        "raw_total_new": round(raw_new, 2),
        "raw_ratio": round(raw_new / raw_old, 3) if raw_old else None,
        "normalized_ratio": round(raw_new / raw_old / host, 3) if raw_old else None,
        "median_query_ratio": round(med, 3),
        "median_query_ratio_raw": round(med_raw, 3),
        "added": added,
        "removed": removed,
        "regressions": {
            q: {"old": oq[q], "new": nq[q], "norm_ratio": round(r, 2)}
            for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])
            if r >= thr
        },
        "wins": {
            q: {"old": oq[q], "new": nq[q], "norm_ratio": round(r, 2)}
            for q, r in sorted(ratios.items(), key=lambda kv: kv[1])
            if r <= 1.0 / thr
        },
    }
    print(json.dumps(out, indent=1) + note)


if __name__ == "__main__":
    main()
