#!/usr/bin/env python3
"""Compare two bench_full.json artifacts row by row (this round vs last).

Usage: python3 scripts/bench_compare.py OLD.json NEW.json

Prints, for every row present in either artifact: old/new q/s (batch rows
convert from seconds using the row's nq convention), the ratio, recall
deltas, and flags rows moving >25% either way — the shared-VM day-scale
variance band this host is known for, so anything inside it is noise
unless a same-JVM A/B says otherwise (bench_out/ab_1m_code_vs_machine.md).
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def qps_map(d):
    out = {}
    nq = d.get("nq", 1000)
    for k, sec in d.get("queries", {}).items():
        if not k.endswith("_batch") or not isinstance(sec, (int, float)) or sec <= 0:
            continue
        # row-local query count, same parse as Bench.rowNqOf: "_nq10k_"
        # then a generic "_nqN_" tag (the nq1/nq100 latency rows would
        # otherwise convert with the global batch size, inflating 1000x)
        m = re.search(r"_nq(\d+)_", k)
        row_nq = 10000 if "_nq10k_" in k else (int(m.group(1)) if m else nq)
        out[k] = row_nq / sec
    for k, v in d.get("sustained_qps", {}).items():
        out[k] = v
    return out


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq_ = qps_map(old), qps_map(new)
    orc, nrc = old.get("recall", {}), new.get("recall", {})
    keys = sorted(set(oq) | set(nq_))
    print(f"{'row':58s} {'old q/s':>10s} {'new q/s':>10s} {'ratio':>6s}  recall old->new")
    for k in keys:
        o, n = oq.get(k), nq_.get(k)
        ratio = (n / o) if (o and n) else float("nan")
        flag = ""
        if o and n and (ratio > 1.25 or ratio < 0.8):
            flag = "  <-- >25%"
        ro, rn = orc.get(k), nrc.get(k)
        rtxt = ""
        if ro is not None or rn is not None:
            rtxt = f"  {ro if ro is not None else '-'} -> {rn if rn is not None else '-'}"
        print(f"{k:58s} {o or 0:10.1f} {n or 0:10.1f} {ratio:6.2f}{rtxt}{flag}")
    for section in ("errors",):
        if new.get(section):
            print(f"\n{section}: {new[section]}")
    print("\nnew-only rows:", [k for k in nq_ if k not in oq])
    print("dropped rows:", [k for k in oq if k not in nq_])


if __name__ == "__main__":
    main()
