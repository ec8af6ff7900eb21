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
* **Fixed shuffle partitioning AND seen-set shards.** Both levels use
  the same ``spark.sql.shuffle.partitions`` and ``n_shards`` (same
  physical plan, different executor count) — exactly how a real
  N vs 4N comparison works.
* **Load probe.** The sandbox VM is a shared host whose external
  load varies by tens of percent over minutes.  Before each level a
  pure-CPU probe (8 concurrent fixed loops) is run and recorded;
  a level measured under a probe much above the quiet baseline
  (~2.9s) is invalid and must be re-run — cross-window comparisons
  are meaningless on this box.
* **Big-batch superstep job (``--seed-all --epochs 1``).**  The
  design point is a 10^10-URL frontier where every superstep carries
  millions of URLs and per-epoch driver overhead amortizes away; a
  trickle-fed many-epoch crawl at sandbox scale measures that serial
  overhead instead of the engine (Amdahl).  The scaling job
  therefore seeds the full page set and runs ONE superstep — the
  same code path, at the batch shape the rule describes.  The
  trickle-fed 3-epoch variant is also reported for context.

Usage: python scripts/scaling_bench.py [--hosts 768] [--pages 400]
       [--n 2] [--seed-all] [--epochs 1] [--budget 400]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = (
    "import time\nt=time.perf_counter()\nx=0\n"
    "for i in range(40_000_000): x+=i\nprint(time.perf_counter()-t)"
)


def idle_cores(sample_s: float = 1.0, idle_frac: float = 0.90) -> int:
    """Count cores that are >= ``idle_frac`` idle over a /proc/stat
    sample — the per-CORE availability gate.  The timing probe below
    measures WHOLE-HOST contention, which cannot distinguish "quiet
    enough for a 2-core taskset" from "quiet enough for an 8-core
    one"; a narrow leg can dodge external load by sitting on the
    quiet cores while a wide leg must overlap it (BENCH.md session-9
    asymmetry).  Gating each leg on idle-core COUNT >= its own width
    (plus margin) makes the two legs' conditions comparable in the
    dimension that actually matters."""
    import time

    def snap():
        rows = {}
        with open("/proc/stat") as f:
            for ln in f:
                if ln.startswith("cpu") and ln[3:4].isdigit():
                    parts = ln.split()
                    vals = list(map(int, parts[1:]))
                    rows[parts[0]] = (vals[3] + vals[4], sum(vals))
        return rows

    a = snap()
    time.sleep(sample_s)
    b = snap()
    n = 0
    for cpu, (idle1, tot1) in a.items():
        idle2, tot2 = b[cpu]
        dt = tot2 - tot1
        if dt > 0 and (idle2 - idle1) / dt >= idle_frac:
            n += 1
    return n


def steal_frac(sample_s: float = 1.0) -> float:
    """Hypervisor steal fraction over a /proc/stat sample — the VM's
    view of physical-host contention.  When the timing probe is slow
    while every core reads idle, THIS is the contention channel (the
    session-9 finding: 32 idle cores, probe 3.5+)."""
    import time

    def snap():
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return vals[7] if len(vals) > 7 else 0, sum(vals)

    s1, t1 = snap()
    time.sleep(sample_s)
    s2, t2 = snap()
    dt = t2 - t1
    return round((s2 - s1) / dt, 4) if dt else 0.0


def cpu_probe(n: int = 8) -> float:
    ps = [
        subprocess.Popen(
            [sys.executable, "-c", _PROBE], stdout=subprocess.PIPE, text=True
        )
        for _ in range(n)
    ]
    outs = [float(p.communicate()[0].strip()) for p in ps]
    return round(sum(outs) / n, 2)


def run_at(cpus: int, args, cores: str | None = None, background: bool = False):
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_CRAWL_HOSTS=str(args.hosts),
        BENCH_CRAWL_PAGES=str(args.pages),
        BENCH_CRAWL_SEEDS=str(args.seeds),
        BENCH_CRAWL_BUDGET=str(args.budget),
        BENCH_CRAWL_LINKS=str(args.links),
        BENCH_CRAWL_SHARDS=str(args.shards),
        BENCH_CRAWL_EPOCHS=str(args.epochs),
        BENCH_ONLY_CRAWL="1",
    )
    if args.seed_all:
        env["BENCH_CRAWL_SEED_ALL"] = "1"
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if shutil.which("taskset"):
        # `cores` pins to an explicit range (equal-occupancy legs run
        # several jobs on DISJOINT ranges concurrently); default is the
        # classic 0..cpus-1 pin
        cmd = ["taskset", "-c", cores or f"0-{cpus - 1}"] + cmd
    if background:
        return subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        )
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, check=True, cwd=REPO
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    if env.get("MECHAML_CRAWL_DEBUG"):
        # scheduler phase marks ("[crawl] <label>: <sec>s" on stderr)
        # attached for the Amdahl decomposition in BENCH.md
        res["crawl_phases"] = [
            ln.strip() for ln in out.stderr.splitlines() if "[crawl]" in ln
        ]
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=768)
    ap.add_argument("--pages", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--budget", type=int, default=400)
    ap.add_argument("--links", type=int, default=100)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--seed-all", action="store_true", default=True)
    ap.add_argument("--trickle", dest="seed_all", action="store_false",
                    help="3-epoch trickle-fed variant instead of big-batch")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    p_lo = cpu_probe()
    lo = run_at(args.n, args)
    p_hi = cpu_probe()
    hi = run_at(args.n * 4, args)
    p_end = cpu_probe()
    thr_lo, thr_hi = lo["value"], hi["value"]
    eff = (thr_hi / thr_lo) / 4 if thr_lo else 0.0
    result = {
        "job": "crawl_frontier"
        + ("_big_batch" if args.seed_all else "_trickle"),
        "input": {
            "hosts": args.hosts,
            "pages_per_host": args.pages,
            "links_per_page": args.links,
            "budget_per_host": args.budget,
            "epochs": args.epochs,
            "seed_all": args.seed_all,
            "n_shards": args.shards,
        },
        "visited": hi["crawl"]["visited"],
        "probes_s": [p_lo, p_hi, p_end],
        f"throughput_local[{args.n}]": thr_lo,
        f"throughput_local[{args.n * 4}]": thr_hi,
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
