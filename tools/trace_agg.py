"""Aggregate a jax.profiler trace (vm.trace.json.gz) by kernel source.

Usage: python tools/trace_agg.py TRACE_DIR [--steps N] [--top K]

Sums device-timeline event durations grouped by ``args.source`` (falling
back to the event name), reports per-step cost when --steps is given, and
counts launches.  This is the kernels-per-step accounting the round-4
verdict asks for (reference methodology analogue:
benchmark/benchmark_cutlass_flash_attn_decode.py:272-277 roofline rows).
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import pathlib
import re


def load_events(trace_dir: str):
    paths = sorted(pathlib.Path(trace_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=32,
                    help="decode steps in the traced run (per-step cost)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-name", action="store_true",
                    help="group by event name instead of args.source")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    # device-lane complete events only (phase X with a duration, on a TPU
    # core pid — host pids carry python/runtime rows we don't want)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|/device|Core", n, re.I)
                and "host" not in n.lower()}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e.get("args", {}).get(
                "name", "")

    tot = collections.Counter()
    cnt = collections.Counter()
    lane_of = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        # keep only the op lane (XLA Ops / Steps); skip derived lanes
        if lane and not re.search(r"xla op|tensorflow op|steps?$",
                                  lane, re.I):
            continue
        a = e.get("args", {}) or {}
        key = (e.get("name", "?") if args.by_name
               else a.get("source") or e.get("name", "?"))
        tot[key] += e["dur"]
        cnt[key] += 1
        lane_of[key] = lane

    grand = sum(tot.values())
    n_launch = sum(cnt.values())
    print(f"total device time: {grand/1e3:.2f} ms   events: {n_launch}"
          f"   per step: {grand/1e3/args.steps:.3f} ms,"
          f" {n_launch/args.steps:.0f} launches")
    print(f"{'us_total':>10} {'us/step':>9} {'count':>6}  source")
    for k, v in tot.most_common(args.top):
        print(f"{v:10.0f} {v/args.steps:9.1f} {cnt[k]:6d}  {k[:110]}")


if __name__ == "__main__":
    main()
