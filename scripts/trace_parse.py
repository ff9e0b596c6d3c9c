"""Parse a jax.profiler trace dir: aggregate device-lane op durations.

Usage: python scripts/trace_parse.py /tmp/r4trace [n_iters]

Prints total device-busy time per op-name group and the per-iteration
device time (divide by the number of traced iterations).  This is the
methodology behind the round-3 "device-time ground truth" numbers in
benchmarks/RESULTS.md.
"""

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    trace_dir = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ev = load_events(trace_dir)

    # find device (TPU) process ids: process_name metadata containing 'TPU'
    # (XLA op lanes live under '/device:TPU:0' style processes)
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}

    groups = collections.Counter()
    total = 0.0
    tmin, tmax = None, None
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        groups[name] += dur
        total += dur
        ts = e.get("ts", 0)
        tmin = ts if tmin is None else min(tmin, ts)
        tmax = max(tmax or 0, ts + e.get("dur", 0))
    print(f"device processes: {[pids[p] for p in dev_pids]}")
    span = ((tmax - tmin) / 1e3) if tmin is not None else 0.0
    print(f"device busy total: {total:.3f} ms over {iters} iters "
          f"-> {total/iters:.3f} ms/iter;  span {span:.3f} ms "
          f"({span/iters:.3f} ms/iter)")
    print("top ops:")
    for name, dur in groups.most_common(25):
        print(f"  {dur:9.3f} ms  {dur/iters:8.4f} ms/iter  {name[:90]}")


if __name__ == "__main__":
    main()
