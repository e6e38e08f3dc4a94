"""Summarize a jax.profiler trace: where the device time goes.

Usage: python tools/trace_report.py /tmp/trace_step [n_steps]

Groups XLA-op events by HLO category and by model phase (fwd / bwd /
optimizer, inferred from op metadata), prints a roofline view: per-bucket
time, bytes accessed, implied HBM bandwidth, and the top ops with shapes.
One TPU-v5e chip: 197 TFLOP/s bf16, ~819 GB/s HBM.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys

HBM_GBPS = 819.0


def load_events(trace_dir: str):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    evs = d["traceEvents"]
    meta = [e for e in evs if e.get("ph") == "M"]
    tidname = {}
    for e in meta:
        if e.get("name") == "thread_name":
            tidname[(e["pid"], e["tid"])] = e["args"].get("name")
    ops = [
        e for e in evs
        if e.get("ph") == "X"
        and tidname.get((e["pid"], e.get("tid"))) == "XLA Ops"
    ]
    return ops


def main():
    trace_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ops = load_events(trace_dir)

    by_cat = collections.defaultdict(lambda: [0, 0.0, 0])
    by_fam = collections.defaultdict(lambda: [0, 0.0, 0, ""])
    total = 0.0
    for e in ops:
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        dur = e.get("dur", 0.0)  # us
        bts = int(a.get("bytes_accessed", 0) or 0)
        total += dur
        c = by_cat[cat]
        c[0] += 1
        c[1] += dur
        c[2] += bts
        fam = re.sub(r"\.\d+", "", e["name"])
        f = by_fam[(cat, fam)]
        f[0] += 1
        f[1] += dur
        f[2] += bts
        if dur > float(f[3] or 0) if isinstance(f[3], str) and f[3] else True:
            pass
    print(f"device total: {total/1e3/n_steps:.1f} ms/step "
          f"({len(ops)} op events / {n_steps} steps)")
    print("\n-- by HLO category --")
    for cat, (n, dur, bts) in sorted(by_cat.items(), key=lambda kv: -kv[1][1]):
        bw = bts / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"{dur/1e3/n_steps:8.2f} ms/step  x{n//n_steps:5d} "
              f" {bts/1e9/n_steps:7.2f} GB  {bw:6.0f} GB/s  {cat}")
    print("\n-- top op families --")
    fams = sorted(by_fam.items(), key=lambda kv: -kv[1][1])[:25]
    for (cat, fam), (n, dur, bts, _) in fams:
        bw = bts / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"{dur/1e3/n_steps:8.2f} ms/step  x{n//n_steps:5d} "
              f" {bw:6.0f} GB/s  [{cat}] {fam[:70]}")
    print("\n-- top single ops --")
    singles = sorted(ops, key=lambda e: -e.get("dur", 0))[: 60]
    seen = set()
    for e in singles:
        if e["name"] in seen:
            continue
        seen.add(e["name"])
        a = e.get("args", {})
        ln = a.get("long_name", "")[:140].replace("\n", " ")
        print(f"{e['dur']/1e3:8.3f} ms  {e['name'][:40]}  {ln}")
        if len(seen) >= 20:
            break


if __name__ == "__main__":
    main()
