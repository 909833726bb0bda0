#!/usr/bin/env python3
"""Compare the 1M-section sustained/batch rows of two section-run logs
(produced by scripts/ab_1m_section.sh). Usage: ab_compare.py A.log B.log"""
import json, re, sys

def load(path):
    txt = open(path, errors="replace").read()
    for line in txt.splitlines():
        m = re.search(r'\{"metric":"total".*\}', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"no total metric line in {path}")

a, b = load(sys.argv[1]), load(sys.argv[2])
rows = sorted(set(a.get("sustained_qps", {})) | set(b.get("sustained_qps", {})))
print(f"{'sustained row':44s} {'A q/s':>10s} {'B q/s':>10s} {'B/A':>6s}")
for r in rows:
    va = a.get("sustained_qps", {}).get(r)
    vb = b.get("sustained_qps", {}).get(r)
    ratio = f"{vb/va:.2f}" if va and vb else "-"
    print(f"{r:44s} {va or 0:10.1f} {vb or 0:10.1f} {ratio:>6s}")
qrows = sorted(set(a.get("queries", {})) | set(b.get("queries", {})))
print(f"\n{'batch row (sec)':44s} {'A':>10s} {'B':>10s} {'A/B':>6s}")
for r in qrows:
    va = a.get("queries", {}).get(r)
    vb = b.get("queries", {}).get(r)
    ratio = f"{va/vb:.2f}" if va and vb else "-"
    print(f"{r:44s} {va or 0:10.3f} {vb or 0:10.3f} {ratio:>6s}")
