"""Aggregate device op time from a ``bench.py --profile-dir`` capture.

Reads the ``*.trace.json.gz`` under ``<dir>/plugins/profile/*/`` and prints
per-op-category and per-op totals for the TPU device track, normalized per
step. The xplane trace double-counts nested events, so only leaf-level
"XLA Ops"-thread events are summed.

Usage: python scripts/parse_profile.py /tmp/prof_dir [--steps N] [--top K]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os.path as osp
import re
import sys


def _category(name: str) -> str:
    n = name.lower()
    if "splash" in n or "flash" in n:
        return "splash attention"
    if "ttt" in n or re.search(r"custom-call", n):
        return "ttt pallas"
    if "convolution" in n or n.startswith(("dot", "gemm")) or "matmul" in n:
        return "dense matmul/conv"
    if "fusion" in n:
        # Includes bitcast_add_fusion/pad_bitcast_fusion/...: despite the
        # layout-op prefix these are fused *compute* (e.g. bitcast_add_fusion
        # at d3072 is the MLP layer2 matmul with its residual add, ~86 % of
        # peak) — only standalone layout ops count as formatting.
        return "fusion (matmuls + elementwise/reduce soup)"
    if n.startswith(("copy", "transpose", "bitcast", "reshape", "convert", "pad", "slice", "concatenate", "dynamic")):
        return "formatting (copies/converts/pads)"
    if n.startswith(("reduce", "all-reduce", "reduce-scatter", "all-gather")):
        return "reductions/collectives"
    if n.startswith(("rng", "iota", "constant", "broadcast", "select", "compare")):
        return "misc elementwise"
    return "other"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by N steps (default: report raw totals)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    traces = sorted(glob.glob(osp.join(args.profile_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print(f"no trace.json.gz under {args.profile_dir}", file=sys.stderr)
        return 1
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]

    # Identify TPU device pids and their "XLA Ops" tids (leaf op events).
    dev_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e.get("args", {}).get("name", ""):
                dev_pids.add(e["pid"])
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e.get("pid") in dev_pids:
            tname = e.get("args", {}).get("name", "")
            if "XLA Ops" in tname or "Ops" == tname.strip():
                op_tids.add((e["pid"], e["tid"]))

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        per_cat[_category(name)] += dur
        total += dur

    div = args.steps or 1
    unit = "ms/step" if args.steps else "ms total"
    print(f"device op time: {total/div:.1f} {unit}  (trace: {traces[-1]})")
    print("\nby category:")
    for k, v in per_cat.most_common():
        print(f"  {v/div:8.1f} {unit}  {k}")
    print(f"\ntop {args.top} ops:")
    for k, v in per_op.most_common(args.top):
        print(f"  {v/div:8.2f} {unit}  {k[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
