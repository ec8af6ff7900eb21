"""Two-cluster-size scaling proxy (north rule: throughput scaling
efficiency >= 0.8 going N -> 4N executors).

No real cluster exists in-sandbox, so per the task directive we run
the IDENTICAL crawl job on the IDENTICAL input at local[N] and
local[4N] (default 8 vs 32 cores) in separate JVMs and report both
throughputs plus efficiency = (thr_4N / thr_N) / 4.

Writes BENCH.md and prints the JSON result.

Usage: python scripts/scaling_bench.py [--hosts 64] [--pages 120]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, hosts: int, pages: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_CRAWL_HOSTS=str(hosts),
        BENCH_CRAWL_PAGES=str(pages),
        BENCH_ONLY_CRAWL="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--pages", type=int, default=120)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    lo = run_at(args.n, args.hosts, args.pages)
    hi = run_at(args.n * 4, args.hosts, args.pages)
    thr_lo, thr_hi = lo["value"], hi["value"]
    eff = (thr_hi / thr_lo) / 4 if thr_lo else 0.0
    result = {
        "job": "crawl_frontier",
        "input": {"hosts": args.hosts, "pages_per_host": args.pages},
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
            f"`local[{args.n}]` vs `local[{args.n * 4}]` "
            "(task directive / BASELINE.md).\n\n"
            "| quantity | value |\n|---|---|\n"
            f"| corpus | {args.hosts} hosts x {args.pages} pages "
            f"(budget {os.environ.get('BENCH_CRAWL_BUDGET', '96')}/host, "
            f"{os.environ.get('BENCH_CRAWL_SEEDS', '8')} seeds/host, "
            f"3 epochs) |\n"
            f"| URLs visited | {hi['crawl']['visited']} |\n"
            f"| URLs seen (deduped) | {hi['crawl']['seen']} |\n"
            f"| throughput @ local[{args.n}] | {thr_lo} urls/sec |\n"
            f"| throughput @ local[{args.n * 4}] | {thr_hi} urls/sec |\n"
            f"| scaling efficiency (N -> 4N) | **{eff:.3f}** "
            f"(target >= 0.8) |\n"
        )


if __name__ == "__main__":
    main()
