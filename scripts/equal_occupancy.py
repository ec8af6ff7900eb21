"""Equal-occupancy scaling measurement (round-5, VERDICT item 3).

The round-4 finding: on this shared single-socket host, every WIDE
(8-core) leg ends with a raised after-probe while every NARROW
(2-core) leg stays flat — the signature of a shared package turbo
budget.  A classic 2-vs-8-core pair therefore conflates two effects:

  classic_eff = thr(1x8) / (4 * thr(1x2 solo))
              = engine_scaling * host_frequency_droop

This harness separates them by running THREE gated legs on the same
input (standard 768x400 big-batch superstep):

  A. **solo2**   — one 2-core crawl, cores 0-1 (2 busy cores, full
     turbo: the classic narrow leg);
  B. **quad2**   — FOUR concurrent, fully independent 2-core crawls
     pinned to disjoint pairs (0-1, 2-3, 4-5, 6-7): 8 busy cores,
     zero shared engine state.  Their aggregate throughput is what
     four perfectly-scaling 2-core "nodes" achieve UNDER THE 8-BUSY-
     CORE CLOCK REGIME — engine scaling is 1.0 by construction, so
       host_droop = agg(quad2) / (4 * thr(solo2))
     is a pure host-physics number;
  C. **wide8**   — one 8-core crawl, cores 0-7 (the classic wide leg).

Both B and C occupy the same 8 cores with the same total work, so

  equal_occupancy_eff = thr(wide8) / agg(quad2)

compares the ENGINE at 8-way parallelism against the ideal-scaling
control at IDENTICAL per-core clock conditions — the turbo budget
cancels.  This is the in-sandbox analogue of N -> 4N nodes on a real
cluster, where 4N executors are 4N sockets each at full clock and no
package budget is shared (BENCH.md round-3/4 instrumented legs).

Every leg passes the full round-4 triple gate (timing probe, idle
cores >= width+2, steal ~ 0) before starting; probes are recorded
before/after each leg.

Usage: python scripts/equal_occupancy.py [--hosts 768] [--pages 400]
       [--quiet 3.3] [--out /tmp/eo.json] [--skip-gate]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import (  # noqa: E402
    cpu_probe,
    idle_cores,
    run_at,
    steal_frac,
)


def wait_quiet(args, width: int) -> list[dict]:
    """Block until the triple gate opens for a leg of ``width`` busy
    cores; returns the probe log."""
    deadline = time.time() + args.max_wait
    log = []
    while True:
        p = cpu_probe()
        idle = idle_cores()
        st = steal_frac()
        log.append({"probe": p, "idle": idle, "steal": st})
        print(f"[gate w={width}] probe {p} idle {idle} steal {st}", flush=True)
        need_idle = min(width + args.idle_margin, os.cpu_count() or width)
        if args.skip_gate or (
            p <= args.quiet
            and idle >= need_idle
            and st <= args.max_steal
        ):
            return log
        if time.time() > deadline:
            print("[gate] max-wait exceeded — proceeding UNGATED", flush=True)
            return log
        time.sleep(args.poll)


def snapshot() -> dict:
    return {"probe": cpu_probe(), "idle": idle_cores(), "steal": steal_frac()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=768)
    ap.add_argument("--pages", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--budget", type=int, default=400)
    ap.add_argument("--links", type=int, default=100)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--seed_all", default=True, action="store_true")
    ap.add_argument("--quiet", type=float, default=3.3)
    ap.add_argument("--idle-margin", type=int, default=2)
    ap.add_argument("--max-steal", type=float, default=0.002)
    ap.add_argument("--max-wait", type=float, default=3600)
    ap.add_argument("--poll", type=float, default=90)
    ap.add_argument("--skip-gate", action="store_true")
    ap.add_argument("--n", type=int, default=2,
                    help="base leg width; legs are soloN / 4x concurrent "
                         "N-core / one 4N-core")
    ap.add_argument("--legs", default="solo2,quad2,wide8",
                    help="comma list (names fixed as solo2/quad2/wide8 "
                         "regardless of --n); rerun a single leg by naming it")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    legs = args.legs.split(",")

    result: dict = {
        "job": "crawl_frontier_big_batch",
        "input": {
            "hosts": args.hosts, "pages_per_host": args.pages,
            "links_per_page": args.links, "budget_per_host": args.budget,
            "epochs": args.epochs, "n_shards": args.shards,
        },
        "legs": {},
    }

    n = args.n
    result["base_width"] = n
    if "solo2" in legs:
        result["legs"]["solo2"] = {"gate": wait_quiet(args, n)[-1]}
        t0 = time.time()
        r = run_at(n, args, cores=f"0-{n - 1}")
        result["legs"]["solo2"].update(
            throughput=r["value"], wall=round(time.time() - t0, 1),
            visited=r["crawl"]["visited"], after=snapshot(),
        )
        print(json.dumps(result["legs"]["solo2"]), flush=True)

    if "quad2" in legs:
        result["legs"]["quad2"] = {"gate": wait_quiet(args, 4 * n)[-1]}
        t0 = time.time()
        procs = [
            run_at(n, args, cores=f"{n * i}-{n * i + n - 1}", background=True)
            for i in range(4)
        ]
        vals, visited = [], []
        for p in procs:
            out, err = p.communicate()
            if p.returncode != 0:
                print(err[-2000:], flush=True)
                raise SystemExit(f"quad2 job failed rc={p.returncode}")
            r = json.loads(out.strip().splitlines()[-1])
            vals.append(r["value"])
            visited.append(r["crawl"]["visited"])
        wall = time.time() - t0
        result["legs"]["quad2"].update(
            per_job=vals,
            aggregate=round(sum(vals), 1),
            total_visited=sum(visited),
            wall=round(wall, 1),
            after=snapshot(),
        )
        print(json.dumps(result["legs"]["quad2"]), flush=True)

    if "wide8" in legs:
        result["legs"]["wide8"] = {"gate": wait_quiet(args, 4 * n)[-1]}
        t0 = time.time()
        r = run_at(4 * n, args, cores=f"0-{4 * n - 1}")
        result["legs"]["wide8"].update(
            throughput=r["value"], wall=round(time.time() - t0, 1),
            visited=r["crawl"]["visited"], after=snapshot(),
        )
        print(json.dumps(result["legs"]["wide8"]), flush=True)

    L = result["legs"]
    if {"solo2", "quad2", "wide8"} <= set(L):
        solo, agg, wide = (
            L["solo2"]["throughput"], L["quad2"]["aggregate"],
            L["wide8"]["throughput"],
        )
        result["classic_eff_N_to_4N"] = round(wide / (4 * solo), 3)
        result["host_droop_4x2_vs_solo"] = round(agg / (4 * solo), 3)
        result["equal_occupancy_eff"] = round(wide / agg, 3)
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
