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


def to_gross(d, qs):
    """r16 records publish per-query times NET of staged builds plus a
    query_staging map (median staged seconds each query's samples
    triggered). Adding it back reconstructs the r4-r15 gross accounting
    (builds charged to their first consumer) so cross-era comparisons
    don't read the accounting change as per-query wins."""
    chg = d.get("query_staging", {})
    return {k: v + chg.get(k, 0.0) for k, v in qs.items()}


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, oq = load(old_path)
    new, nq = load(new_path)
    # accounting-era bridge: when exactly one side is an r16+ net-of-
    # staging record, reconstruct its gross numbers so the join compares
    # like with like; when both are net-era, compare net directly (and
    # staging costs are visible in each record's staging_secs).
    old_net, new_net = "query_staging" in old, "query_staging" in new
    era_note = ""
    if new_net and not old_net:
        nq = to_gross(new, nq)
        era_note = " (new record net-of-staging: compared GROSS via query_staging)"
    elif old_net and not new_net:
        oq = to_gross(old, oq)
        era_note = " (old record net-of-staging: compared GROSS via query_staging)"
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
    # Known-jitter queries (r16 diagnosis, via SPARK_GRAFT_PLAN_DUMP text
    # diffs): a multi-countDistinct aggregate goes through Spark's
    # RewriteDistinctAggregates, whose distinct-group (gid) ordering
    # iterates a hash map keyed by attribute sets — exprId-hash order,
    # and exprId allocation depends on session history (concurrent
    # stream threads interleave the counter), so IDENTICAL code can
    # print a different-but-equivalent Expand/aggregate order. Their
    # sha flips are Spark-internal nondeterminism, not plan changes —
    # reported separately so the real plan_changed list stays clean.
    KNOWN_JITTER = {"rel_profile", "rel_count_distinct", "rel_cramers_v"}
    plan_changed = [q for q in plan_common
                    if op[q] != np_[q] and q not in KNOWN_JITTER]
    plan_jitter = [q for q in plan_common
                   if op[q] != np_[q] and q in KNOWN_JITTER]
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
        "plan_changed_known_jitter": plan_jitter,
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
    # still-noisy queries never settled their median even under the rerun
    # loop (write-then-read lifecycle ops on the real filesystem, stream
    # machinery under co-tenant load) — for THOSE, the min across samples
    # is the honest cross-round estimator, so publish min ratios alongside
    # the (load-inflated) median ratios instead of letting them read as
    # regressions
    sn = set(old.get("still_noisy", [])) | set(new.get("still_noisy", []))
    sn &= set(common)
    if sn:
        ops_, nps = old.get("pass_secs", {}), new.get("pass_secs", {})
        def mn(samples):
            ok = [s for s in samples if s >= 0]
            return min(ok) if ok else None
        out["still_noisy_min_ratios"] = {
            q: {"min_old": mn(ops_.get(q, [])), "min_new": mn(nps.get(q, [])),
                "min_ratio": (round(mn(nps[q]) / mn(ops_[q]), 2)
                              if ops_.get(q) and nps.get(q) and mn(ops_[q])
                              else None)}
            for q in sorted(sn)
        }
    # staging-substrate comparison (both records net-era): the shared
    # builds have their own series now — a staging regression is as real
    # as a query regression and no longer hides inside a first consumer
    os_, ns_ = old.get("staging_secs", {}), new.get("staging_secs", {})
    if os_ and ns_:
        out["staging_total_old"] = round(sum(os_.values()), 2)
        out["staging_total_new"] = round(sum(ns_.values()), 2)
        out["staging_regressions"] = {
            k: {"old": os_[k], "new": ns_[k],
                "ratio": round(ns_[k] / os_[k], 2)}
            for k in sorted(set(os_) & set(ns_))
            if os_[k] >= 0.2 and ns_[k] / os_[k] >= thr
        }
    # notes live INSIDE the dict so the emitted artifact stays valid JSON
    # (a trailing free-text note broke json.load on the committed file)
    if note or era_note:
        out["note"] = (note + era_note).strip()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
