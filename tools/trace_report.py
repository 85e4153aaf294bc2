"""Aggregate a jax.profiler trace into a per-kernel device-time table.

Usage: python tools/trace_report.py /tmp/ovo_trace/<tag> [--div N]

Reads the newest vm.trace.json.gz under the given directory, selects the
'/device:TPU:0' process, and prints:
  - per-kernel-name totals (count, total ms, mean us), sorted by total;
  - total device busy time, wall span, and total gap (idle) time;
  - the largest individual gaps between consecutive device events.
--div N divides totals by N (e.g. 16 frames, 10 reps) for per-unit cost.
Pure host-side parsing: safe to run while no TPU process is active.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_events(root):
    paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name") for e in evs
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = [p for p, n in pid_names.items()
                if n and n.startswith("/device:TPU")]
    if not dev_pids:
        raise SystemExit(f"no TPU device process in trace ({pid_names})")
    dev = [e for e in evs if e.get("ph") == "X" and e["pid"] in dev_pids]
    return paths[-1], dev


def main():
    root = sys.argv[1]
    div = 1.0
    if "--div" in sys.argv:
        div = float(sys.argv[sys.argv.index("--div") + 1])
    path, dev = load_events(root)
    print(f"# {path}: {len(dev)} device events (div={div:g})")

    # The device timeline usually has one top-level 'jit_*' row plus a
    # nested per-fusion row; drop enclosing events that strictly contain
    # others (keep the leaf level for the busy/gap math). Stack-based
    # sweep: an event is a parent iff the next event (in (ts, -dur)
    # order) starts inside it.
    dev.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    leaves = []
    stack = []  # events whose interval is still open
    for e in dev:
        while stack and stack[-1][0] <= e["ts"]:
            end, prev, had_child = stack.pop()
            if not had_child:
                leaves.append(prev)
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1], True)
        if stack:
            stack[-1] = (stack[-1][0], stack[-1][1], True)
        stack.append((e["ts"] + e.get("dur", 0), e, False))
    while stack:
        end, prev, had_child = stack.pop()
        if not had_child:
            leaves.append(prev)
        if stack:
            stack[-1] = (stack[-1][0], stack[-1][1], True)
    if not leaves:
        leaves = dev

    tot = defaultdict(lambda: [0, 0.0])
    for e in leaves:
        t = tot[e["name"]]
        t[0] += 1
        t[1] += e.get("dur", 0)
    busy = sum(v[1] for v in tot.values())
    t0 = min(e["ts"] for e in leaves)
    t1 = max(e["ts"] + e.get("dur", 0) for e in leaves)
    span = t1 - t0

    print(f"{'kernel':68s} {'n':>5s} {'tot ms':>9s} {'mean us':>9s} "
          f"{'/unit ms':>9s}")
    for name, (n, dur) in sorted(tot.items(), key=lambda kv: -kv[1][1]):
        print(f"{name[:68]:68s} {n:5d} {dur/1000:9.3f} {dur/n:9.1f} "
              f"{dur/1000/div:9.3f}")
    print(f"\ndevice busy {busy/1000:.3f} ms, wall span {span/1000:.3f} ms, "
          f"idle {100*(span-busy)/max(span,1):.1f}%  "
          f"(per unit: busy {busy/1000/div:.3f} ms, span {span/1000/div:.3f})")

    gaps = []
    prev_end = None
    for e in sorted(leaves, key=lambda e: e["ts"]):
        if prev_end is not None and e["ts"] > prev_end:
            gaps.append((e["ts"] - prev_end, prev_name, e["name"]))
        prev_end = max(prev_end or 0, e["ts"] + e.get("dur", 0))
        prev_name = e["name"]
    gaps.sort(reverse=True)
    gtot = sum(g for g, _, _ in gaps)
    print(f"total gap {gtot/1000:.3f} ms over {len(gaps)} gaps "
          f"({gtot/1000/div:.3f} ms/unit); largest:")
    for g, a, b in gaps[:15]:
        print(f"  {g/1000:8.3f} ms  after {a[:44]:44s} -> {b[:44]}")


if __name__ == "__main__":
    main()
