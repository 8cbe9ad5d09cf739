#!/usr/bin/env python3
"""Mechanical round-over-round bench comparison.

Joins two BENCH_LOCAL-format records (old, new) and reports:

  - RAW ratios as the HEADLINE (r13: two rounds of sub-second calib jobs
    produced artifact normalized ratios on parity runs; the calib job is
    now >= 2 s median-of-5, but raw common-set ratios remain the number
    to judge on — `raw_ratio` and `median_query_ratio_raw` lead);
  - host speed ratio (new calib / old calib) and calib-normalized ratios
    as CONTEXT — when they disagree with raw over unchanged queries, the
    calibration moved, not the code;
  - per-query raw-ratio outliers beyond a threshold (default 1.3x/0.7x)
    — the list worth reading for real regressions/wins;
  - plan-shape diffs: queries whose `plan_sha` changed between the
    records (a plan regression shows here even when sf0.1 timing hides
    it). Since r15, plan_sha is captured in a dedicated pass AFTER the
    full warmup, when every staged substrate is registered — the cache
    state (and so the sha) no longer depends on alphabetical staging
    order, which produced 48 of r14's 54 flags. A flag now means a real
    plan change, a deliberate re-keying of a staged frame, or — when the
    QUERY SET changed — a newly staged substrate substituting its cache
    into an existing plan (adding queries that stage frames legitimately
    shifts neighbors; identical code + surface is stable). The
    r15-vs-r14 compare itself carries a one-time all-shas shift from
    this methodology change — judge that round's plan diffs by the
    within-r15 series instead;
  - queries added/removed between the runs.

Usage: bench_compare.py OLD.json NEW.json [threshold]
A record without calib_sec degrades to raw-only with a note. Exit code
0 always — this is a report, not a gate.
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
    # HEADLINE basis is RAW: regressions/wins are judged on raw per-query
    # ratios. Normalized ratios ((new/old)/host) ride along as context —
    # when they disagree with raw over unchanged queries, the calibration
    # moved, not the code (the r12 lesson).
    raw_r = {q: nq[q] / oq[q] for q in common if oq[q] > 0}
    norm_r = {q: r / host for q, r in raw_r.items()}
    raw_sorted = sorted(raw_r.values())
    med_raw = raw_sorted[len(raw_sorted) // 2] if raw_sorted else float("nan")
    norm_sorted = sorted(norm_r.values())
    med = norm_sorted[len(norm_sorted) // 2] if norm_sorted else float("nan")
    # plan-shape diffs (r13): flag every common query whose physical-plan
    # fingerprint changed — the direct plan-regression signal
    op, np_ = old.get("plan_sha", {}), new.get("plan_sha", {})
    plan_common = sorted(set(op) & set(np_) & set(common))
    plan_changed = [q for q in plan_common if op[q] != np_[q]]
    out = {
        "old": old_path,
        "new": new_path,
        "common_queries": len(common),
        "raw_total_old": round(raw_old, 2),
        "raw_total_new": round(raw_new, 2),
        "raw_ratio": round(raw_new / raw_old, 3) if raw_old else None,
        "median_query_ratio_raw": round(med_raw, 3),
        "host_speed_ratio": round(host, 3),
        "normalized_ratio": round(raw_new / raw_old / host, 3) if raw_old else None,
        "median_query_ratio_norm": round(med, 3),
        "plan_fingerprints_compared": len(plan_common),
        "plan_changed": plan_changed,
        "added": added,
        "removed": removed,
        "regressions": {
            q: {"old": oq[q], "new": nq[q], "raw_ratio": round(r, 2),
                "norm_ratio": round(norm_r[q], 2),
                "plan_changed": q in plan_changed}
            for q, r in sorted(raw_r.items(), key=lambda kv: -kv[1])
            if r >= thr
        },
        "wins": {
            q: {"old": oq[q], "new": nq[q], "raw_ratio": round(r, 2),
                "norm_ratio": round(norm_r[q], 2)}
            for q, r in sorted(raw_r.items(), key=lambda kv: kv[1])
            if r <= 1.0 / thr
        },
    }
    print(json.dumps(out, indent=1) + note)


if __name__ == "__main__":
    main()
