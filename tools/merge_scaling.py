#!/usr/bin/env python3
"""Merge graft.Scaling measurement logs into SCALING.json.

Each log line `[scaling] NAME @F.0x -> T s` is already a min-of-2
sample; across logs we take the min per (query, factor) — this host
has neighbor contention (see Bench.scala), so the minimum is the
code's steady state. SKIP/FAIL lines are ignored (capped or failed
points simply don't contribute).

Usage: merge_scaling.py OUT.json LOG [LOG...]
"""
import sys, json, os, re

PAT = re.compile(r"\[scaling\] (\S+) @([0-9.]+)x -> ([0-9.]+) s")

def main(out, logs):
    # round-trip hand-added provenance: a "notes" dict in the existing
    # OUT.json survives regeneration (a refresh once silently dropped
    # the skew_topk re-measurement note)
    notes = {}
    if os.path.exists(out):
        try:
            notes = json.load(open(out)).get("notes", {})
        except Exception:
            pass
    best = {}
    for log in logs:
        for line in open(log, errors="replace"):
            m = PAT.search(line)
            if not m:
                continue
            name, f, t = m.group(1), float(m.group(2)), float(m.group(3))
            k = (name, f)
            best[k] = min(best.get(k, t), t)
    queries = {}
    for (name, f), t in sorted(best.items()):
        queries.setdefault(name, {})[f] = round(t, 3)
    result = {}
    for name, pts in queries.items():
        fs = sorted(pts)
        entry = {"sec_by_factor": {str(f): pts[f] for f in fs}}
        if len(fs) >= 2:
            f0, t0 = fs[0], pts[fs[0]]
            margins = {str(f): round((pts[f] - t0) / (f - f0), 3)
                       for f in fs[1:]}
            entry["marginal_sec_per_unit"] = margins
            ms = [margins[str(f)] for f in fs[1:]]
            if len(ms) >= 2 and ms[0] > 0:
                entry["superlinearity"] = round(ms[-1] / ms[0], 3)
        result[name] = entry
    doc = {"baseline_factor": 1.0,
           "unit": "1x = sf0.1 (~17 MB on disk)",
           "queries": result}
    if notes:
        doc["notes"] = notes
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: {len(result)} queries, "
          f"{sum(len(q['sec_by_factor']) for q in result.values())} points")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
