"""Run ONE scaling leg, gated on a quiet load window.

The sandbox VM is a shared host whose external load swings 30-70%
over minutes (BENCH.md).  A back-to-back two-leg A/B therefore often
straddles a load ramp; per-leg gating instead waits for a quiet
window (CPU probe <= --quiet, quiet baseline ~2.9s), runs the single
leg, and records probes before and after so the leg's window is
auditable.  Two legs each measured in a quiet window ARE comparable:
the gate establishes equal external conditions.

Usage: python scripts/gated_leg.py --cpus 2 [--quiet 3.3]
       [--max-wait 3600] [--out /tmp/leg2.json]
Corpus shape matches scripts/scaling_bench.py defaults (768 hosts x
400 pages, 100 links/page, seed-all big-batch superstep).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import cpu_probe, idle_cores, run_at, steal_frac  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--quiet", type=float, default=3.3)
    # round-4 methodology fix (BENCH.md "Instrumented leg"): gate on
    # per-core idleness and hypervisor steal, not just the timing
    # probe — a narrow taskset can dodge load the whole-host probe
    # misses, and a wide one can't
    ap.add_argument("--idle-margin", type=int, default=2)
    ap.add_argument("--max-steal", type=float, default=0.002)
    ap.add_argument("--max-wait", type=float, default=3600)
    ap.add_argument("--poll", type=float, default=120)
    ap.add_argument("--out", default=None)
    ap.add_argument("--hosts", type=int, default=768)
    ap.add_argument("--pages", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--budget", type=int, default=400)
    ap.add_argument("--links", type=int, default=100)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--seed_all", type=int, default=1)
    args = ap.parse_args()
    args.seed_all = bool(args.seed_all)

    deadline = time.time() + args.max_wait
    probes = []
    while True:
        p = cpu_probe()
        idle = idle_cores()
        st = steal_frac()
        probes.append({"probe": p, "idle": idle, "steal": st})
        print(f"probe {p} idle {idle} steal {st}", flush=True)
        # cap the idle requirement at the host's core count: a leg as
        # wide as the box could otherwise never satisfy the gate and
        # would silently run ungated after --max-wait
        need_idle = min(args.cpus + args.idle_margin, os.cpu_count() or 1)
        if (p <= args.quiet and idle >= need_idle
                and st <= args.max_steal):
            break
        if time.time() > deadline:
            print("gave up waiting for quiet window", flush=True)
            p = None
            break
        time.sleep(args.poll)

    idle_before, steal_before = idle_cores(), steal_frac()
    res = run_at(args.cpus, args)
    p_after = cpu_probe()
    idle_after, steal_after = idle_cores(), steal_frac()
    out = {
        "cpus": args.cpus,
        "probe_before": p,
        "probe_after": p_after,
        "probe_history": probes,
        "idle_cores": [idle_before, idle_after],
        "steal_frac": [steal_before, steal_after],
        "throughput": res["value"],
        "crawl": res["crawl"],
        "total_sec": res["total_sec"],
    }
    if "crawl_phases" in res:
        out["crawl_phases"] = res["crawl_phases"]
    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
