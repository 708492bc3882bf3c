#!/usr/bin/env python3
"""Verify every reference citation resolves to a real file.

Scans SURVEY.md / PLANS.md / BASELINE.md / README.md / src for
`path/to/file.ext[:line]` patterns and stats each path under
/root/reference. Exits non-zero listing phantoms (the r9 verdict found
a fabricated api/routes/search.js citation; this keeps it impossible).

Known false positives are skipped: repo-internal paths and extension
truncation artifacts (e.g. BASELINE.json matching as .js).
"""
import re, os, sys, subprocess

PAT = re.compile(
    r"([A-Za-z0-9_\-./]+\.(?:json|jsonl|yaml|yml|js|sql|go|rs|cpp|ts|py))"
    r"(?::\d+)?")
SKIP_TOP = {"src", "graft", "target", "tools", "project", "tmp", "opt",
            "root", "outDir"}

def main():
    files = subprocess.run(
        ["grep", "-rl", ".", "SURVEY.md", "PLANS.md", "BASELINE.md",
         "README.md", "src"],
        capture_output=True, text=True).stdout.split()
    bad = {}
    for f in files:
        try:
            txt = open(f, errors="replace").read()
        except OSError:
            continue
        for ln_no, line in enumerate(txt.splitlines(), 1):
            for m in PAT.finditer(line):
                path = m.group(1)
                if "/" not in path or path.split("/")[0] in SKIP_TOP:
                    continue
                full = path if path.startswith("/root/") else \
                    os.path.join("/root/reference", path.lstrip("/"))
                if not os.path.exists(full):
                    bad.setdefault(path, []).append(f"{f}:{ln_no}")
    for path, sites in sorted(bad.items()):
        print(f"PHANTOM {path} <- {', '.join(sites[:5])}"
              f"{' ...' if len(sites) > 5 else ''}")
    print(f"{len(bad)} phantom path(s)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
