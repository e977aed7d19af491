"""Join a profiler trace with dumped optimized HLO to attribute device time
to source sites.

Usage:
  python tools/profile_step.py --stage2 --dump-hlo /tmp/stage2_opt.hlo
  python tools/profile_step.py --stage2 --trace-dir /tmp/tr
  python tools/attribute_ops.py --hlo /tmp/stage2_opt.hlo --trace-dir /tmp/tr \
      --prefix copy

For every device op whose name starts with --prefix, finds its HLO definition,
extracts shape + op_name/source metadata, and aggregates total time by
(source_file:line, op_name tail, shape) — the per-site closure table the
copy-bucket work needs (VERDICT round-2 #2).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def load_trace(trace_dir: str):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Chip" in n
    }
    dur_by_op = defaultdict(float)
    cnt_by_op = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        d = float(e.get("dur", 0.0))
        if d:
            dur_by_op[e["name"]] += d
            cnt_by_op[e["name"]] += 1
    return dur_by_op, cnt_by_op


HLO_DEF = re.compile(r"^\s*%?([\w.\-]+) = (\S+) ")
META = re.compile(
    r'metadata=\{[^}]*?op_name="([^"]*)"'
    r'(?:[^}]*?source_file="([^"]*)")?'
    r'(?:[^}]*?source_line=(\d+))?'
)


def load_hlo(path: str):
    info = {}
    with open(path) as f:
        for line in f:
            m = HLO_DEF.match(line)
            if not m:
                continue
            name, shape = m.group(1), m.group(2)
            mm = META.search(line)
            if mm:
                op_name, sf, sl = mm.group(1), mm.group(2), mm.group(3)
                src = f"{os.path.basename(sf)}:{sl}" if sf else "?"
            else:
                op_name, src = "", "?"
            info[name] = (shape, op_name, src)
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--trace-dir", required=True)
    ap.add_argument("--prefix", default="copy")
    ap.add_argument("--steps", type=int, default=3,
                    help="profiled steps (durations divided by this)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--by-shape", action="store_true",
                    help="group by shape only (ignore source site)")
    args = ap.parse_args()

    dur_by_op, cnt_by_op = load_trace(args.trace_dir)
    hlo = load_hlo(args.hlo)

    groups = defaultdict(lambda: [0.0, 0, 0])  # us, op-count, unresolved
    bucket = 0.0
    for op, dur in dur_by_op.items():
        if not op.startswith(args.prefix):
            continue
        bucket += dur
        rec = hlo.get(op) or hlo.get(op.split(".")[0])
        if rec is None:
            key = ("<not in HLO dump>", "", "")
        else:
            shape, op_name, src = rec
            # keep the semantic tail of the op_name (module path after jit())
            tail = "/".join(op_name.split("/")[-3:]) if op_name else ""
            key = (shape,) if args.by_shape else (src, tail, shape)
        g = groups[key]
        g[0] += dur
        g[1] += cnt_by_op[op]

    per_step = bucket / args.steps / 1e3
    print(f"'{args.prefix}*' total: {per_step:.1f} ms/step "
          f"({len(groups)} sites)")
    for key, (dur, cnt, _) in sorted(groups.items(), key=lambda kv: -kv[1][0])[: args.top]:
        ms = dur / args.steps / 1e3
        print(f"{ms:8.2f} ms/step  ×{cnt // args.steps:<5d} {' | '.join(key)}")


if __name__ == "__main__":
    main()
