"""Two-cluster-size scaling proxy (north rule: throughput scaling
efficiency >= 0.8 going N -> 4N executors).

No real cluster exists in-sandbox, so per the task directive we run
the IDENTICAL crawl job on the IDENTICAL input at two parallelism
levels (default N=2 vs 4N=8 cores) in separate JVMs and report both
throughputs plus efficiency = (thr_4N / thr_N) / 4.

Methodology notes (all measured, see BENCH.md):

* **CPU pinning.** Each level is run under ``taskset`` so the WHOLE
  process tree (JVM + Python workers) is confined to N cores.
  ``local[N]`` alone only caps task slots — GC, shuffle, Arrow and
  Python workers still spill onto every core, which flatters the
  small "cluster" and understates scaling.  Pinning emulates two
  real cluster sizes.
* **Fixed shuffle partitioning.** Both levels use the same
  ``spark.sql.shuffle.partitions`` (same physical plan, different
  executor count) — exactly how a real N vs 4N comparison works.
* **N=2 vs 8, not 8 vs 32.** The sandbox VM is a shared host; at 32
  concurrent workers the hypervisor adds ~70% CPU inflation (pure-
  CPU probe: 32 procs take 4.84s for a 2.89s single-proc loop) which
  measures the hardware, not the engine.  2 vs 8 stays in the
  uncontended regime.
* **Corpus sized so compute dominates.** Epochs must carry real
  parallel work (hundreds of thousands of URLs, ~100 links/page);
  tiny epochs only measure the driver's serial superstep overhead,
  which a 10^10-URL crawl amortizes away.

Usage: python scripts/scaling_bench.py [--hosts 768] [--pages 400] [--n 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, args) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_CRAWL_HOSTS=str(args.hosts),
        BENCH_CRAWL_PAGES=str(args.pages),
        BENCH_CRAWL_SEEDS=str(args.seeds),
        BENCH_CRAWL_BUDGET=str(args.budget),
        BENCH_CRAWL_LINKS=str(args.links),
        BENCH_ONLY_CRAWL="1",
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, check=True, cwd=REPO
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=768)
    ap.add_argument("--pages", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--budget", type=int, default=224)
    ap.add_argument("--links", type=int, default=100)
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    lo = run_at(args.n, args)
    hi = run_at(args.n * 4, args)
    thr_lo, thr_hi = lo["value"], hi["value"]
    eff = (thr_hi / thr_lo) / 4 if thr_lo else 0.0
    result = {
        "job": "crawl_frontier",
        "input": {
            "hosts": args.hosts,
            "pages_per_host": args.pages,
            "links_per_page": args.links,
            "seeds_per_host": args.seeds,
            "budget_per_host": args.budget,
        },
        "visited": hi["crawl"]["visited"],
        f"throughput_local[{args.n}]": thr_lo,
        f"throughput_local[{args.n * 4}]": thr_hi,
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — crawl throughput + scaling efficiency\n\n"
            "Sandbox proxy for two cluster sizes (no real cluster): the "
            "identical crawl job on the identical synthetic corpus at "
            f"`local[{args.n}]` vs `local[{args.n * 4}]`, each pinned "
            f"with `taskset` to {args.n} / {args.n * 4} cores so the "
            "whole process tree (JVM + Python workers) sees exactly the "
            "\"cluster\" it claims — `local[N]` alone caps task slots "
            "but lets GC/shuffle/Arrow spill onto every core, which "
            "flatters the small level.  Shuffle partitioning is held "
            "fixed across levels (same plan, more executors).\n\n"
            "| quantity | value |\n|---|---|\n"
            f"| corpus | {args.hosts} hosts x {args.pages} pages, "
            f"{args.links} links/page (budget {args.budget}/host, "
            f"{args.seeds} seeds/host, 3 epochs) |\n"
            f"| URLs visited | {hi['crawl']['visited']} |\n"
            f"| URLs seen (deduped) | {hi['crawl']['seen']} |\n"
            f"| image payload rows | {hi['crawl']['payload']} |\n"
            f"| cookie jar rows | {hi['crawl']['jar']} |\n"
            f"| throughput @ local[{args.n}] ({args.n} cores) | "
            f"{thr_lo} urls/sec |\n"
            f"| throughput @ local[{args.n * 4}] ({args.n * 4} cores) | "
            f"{thr_hi} urls/sec |\n"
            f"| scaling efficiency (N -> 4N) | **{eff:.3f}** "
            f"(target >= 0.8) |\n\n"
            "Why N=2 vs 8 and not 8 vs 32: the sandbox VM is a shared "
            "host; a pure-CPU probe (32 independent python processes "
            "running a fixed loop) shows ~12% inflation at 8 procs but "
            "~70% at 32 — beyond 8 cores the measurement reflects "
            "hypervisor contention, not the engine.  The directive "
            "allows any N vs 4N pair.\n"
        )


if __name__ == "__main__":
    main()
