#!/usr/bin/env python3
"""Surgically update SCALING.json from graft.Scaling logs.

merge_scaling.py REBUILDS the file from logs, which drops every entry
whose log no longer exists (r12 lesson: the stale n6/n7 points survived
precisely because nobody wanted to lose the other 40 queries' history).
This tool UPDATES in place: for each `[scaling] NAME @F.0x -> T s` line,
the (query, factor) point is replaced (min across the given logs when a
point repeats), marginals + superlinearity are recomputed for touched
queries only, and everything else — other queries, notes — is kept.

Also folds `[streamscale] NAME @F.0x tick I -> T s (index_rows=N)` lines
(graft.tools.StreamScaling) into a top-level "streaming" block:
  streaming[NAME][factor] = {"ticks": [t0..], "index_rows": [n0..],
                             "growth": last_tick / first_tick}

Usage: update_scaling.py SCALING.json LOG [LOG...]
"""
import sys, json, re

PAT = re.compile(r"\[scaling\] (\S+) @([0-9.]+)x -> ([0-9.]+) s")
SPAT = re.compile(r"\[streamscale\] (\S+) @([0-9.]+)x tick (\d+) -> "
                  r"([0-9.]+) s \(index_rows=(\d+)\)")


def main(out, logs):
    doc = json.load(open(out))
    queries = doc.setdefault("queries", {})
    best, stream = {}, {}
    for log in logs:
        for line in open(log, errors="replace"):
            m = PAT.search(line)
            if m:
                k = (m.group(1), float(m.group(2)))
                t = float(m.group(3))
                best[k] = min(best.get(k, t), t)
            s = SPAT.search(line)
            if s:
                name, f, tick, t, rows = (s.group(1), float(s.group(2)),
                                          int(s.group(3)),
                                          float(s.group(4)),
                                          int(s.group(5)))
                e = stream.setdefault(name, {}).setdefault(str(f), {})
                e.setdefault("ticks", {})[tick] = t
                e.setdefault("index_rows", {})[tick] = rows
    touched = set()
    for (name, f), t in best.items():
        entry = queries.setdefault(name, {"sec_by_factor": {}})
        entry["sec_by_factor"][str(f)] = round(t, 3)
        touched.add(name)
    for name in touched:
        entry = queries[name]
        pts = sorted((float(f), t)
                     for f, t in entry["sec_by_factor"].items())
        if len(pts) >= 2:
            f0, t0 = pts[0]
            margins = {str(f): round((t - t0) / (f - f0), 3)
                       for f, t in pts[1:]}
            entry["marginal_sec_per_unit"] = margins
            ms = [margins[str(f)] for f, _ in pts[1:]]
            if len(ms) >= 2 and ms[0] > 0:
                entry["superlinearity"] = round(ms[-1] / ms[0], 3)
            else:
                # the ratio is not computable from the fresh points —
                # drop any stale value rather than leave a headline
                # ratio that contradicts its own sec_by_factor (the
                # r12 n6/n7 stale-entry failure class)
                entry.pop("superlinearity", None)
    if stream:
        sblock = doc.setdefault("streaming", {})
        for name, byf in stream.items():
            for f, e in byf.items():
                ticks = [e["ticks"][i] for i in sorted(e["ticks"])]
                rows = [e["index_rows"][i] for i in sorted(e["index_rows"])]
                sblock.setdefault(name, {})[f] = {
                    "tick_sec": [round(t, 2) for t in ticks],
                    "index_rows_before": rows,
                    "growth_last_over_first":
                        round(ticks[-1] / ticks[0], 2) if ticks[0] > 0
                        else None,
                }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: updated {len(touched)} queries, "
          f"{len(stream)} streaming names")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
