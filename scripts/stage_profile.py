"""Attribute big-batch-superstep wall time: parallel task work vs
level-independent driver/serial time.

Runs the same crawl job as ``scripts/scaling_bench.py`` (one
superstep, full page set seeded) with the Spark event log enabled,
then parses the log to report, per job: wall, sum-of-task-time,
and the DRIVER GAP — wall seconds covered by no running stage.
The gap total is the serial floor that Amdahl turns into scaling
inefficiency (BENCH.md); cutting it is how the N->4N efficiency
rises without growing the corpus.

Usage: python scripts/stage_profile.py [--cpus 8] [--hosts 256]
       [--pages 200] [--pin]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_crawl(args, event_dir: str) -> dict:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cpus))
    from mechaml_spark.corpus import CorpusSpec, corpus_df, images_df, page_url
    from mechaml_spark.session import get_spark

    spark = get_spark(
        app_name="stage_profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle_partitions,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": event_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": args.advisory,
            "spark.sql.adaptive.enabled": str(not args.no_aqe).lower(),
        },
    )
    from mechaml_spark.frontier.scheduler import crawl

    spec = CorpusSpec(
        n_hosts=args.hosts, pages_per_host=args.pages,
        links_per_page=args.links, images_per_page=2,
    )
    if args.graded:
        # the driver's graded crawl shape (bench.py defaults): trickle
        # seeding, 3 epochs — the shape whose 25-40 s wall item 6 asks
        # to decompose (per-epoch marks come from MECHAML_CRAWL_DEBUG)
        seeds = [
            page_url(spec, i, j * 7)
            for i in range(spec.n_hosts)
            for j in range(args.seeds_per_host)
        ]
        budget, epochs = args.budget, args.epochs
    else:
        seeds = [
            page_url(spec, i, j)
            for i in range(spec.n_hosts)
            for j in range(spec.pages_per_host)
        ]
        budget, epochs = args.pages, 1
    corpus = corpus_df(spark, spec).cache()
    images = images_df(spark, spec).cache()
    corpus.count()
    images.count()
    prefetcher = None
    if args.graded:
        # graded bench pre-resolves the closure outside the timer
        from mechaml_spark import agent

        closure = agent.resolve_redirect_closure(corpus).localCheckpoint(
            eager=False
        )
        closure.count()
        prefetcher = agent.ResolvedCorpusFetcher(closure)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.perf_counter()
    res = crawl(
        spark, spec, seeds, budget_per_host=budget, max_epochs=epochs,
        n_shards=args.shards, n_bits=1 << 20, corpus=corpus, images=images,
        fetcher=prefetcher, truncate_every=args.truncate_every,
    )
    from functools import reduce

    from pyspark.sql import functions as F

    counts = reduce(
        lambda a, b: a.unionAll(b),
        [
            df.agg(F.count("*").alias("n"))
            for df in (res.visit_log, res.seen.seen_df, res.payload, res.jar)
        ],
    ).collect()
    wall = time.perf_counter() - t0
    out = {
        "wall_sec": round(wall, 2),
        "visited": counts[0]["n"],
        "urls_per_sec": round(counts[0]["n"] / wall, 1),
    }
    spark.stop()
    return out


def parse_event_log(event_dir: str, t_start_ms: int) -> None:
    files = [
        os.path.join(event_dir, f)
        for f in os.listdir(event_dir)
        if not f.startswith(".")
    ]
    stages = {}  # (stageId, attempt) -> dict
    jobs = {}
    task_time = {}
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "sub": si.get("Submission Time"),
                        "done": None,
                        "tasks": si.get("Number of Tasks"),
                    }
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    k = (si["Stage ID"], si["Stage Attempt ID"])
                    if k in stages:
                        stages[k]["sub"] = si.get("Submission Time")
                        stages[k]["done"] = si.get("Completion Time")
                elif e == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    k = (ev.get("Stage ID"), ev.get("Stage Attempt ID"))
                    task_time[k] = task_time.get(k, 0) + (
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    )
                elif e == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "end": None,
                        "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    done = [
        (k, s) for k, s in stages.items() if s["sub"] and s["done"]
    ]
    done = [(k, s) for k, s in done if s["done"] >= t_start_ms]
    done.sort(key=lambda ks: ks[1]["sub"])
    if not done:
        print("no stages after crawl start", file=sys.stderr)
        return
    t0 = min(s["sub"] for _, s in done)
    t_end = max(s["done"] for _, s in done)
    # coverage: merge stage intervals, find gaps (driver-only time)
    iv = sorted((s["sub"], s["done"]) for _, s in done)
    merged = []
    for a, b in iv:
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    covered = sum(b - a for a, b in merged)
    gaps = []
    prev = t0
    for a, b in merged:
        if a > prev:
            gaps.append((prev, a))
        prev = max(prev, b)
    gap_total = sum(b - a for a, b in gaps)
    print(f"\n== stage window: {(t_end - t0) / 1e3:.1f}s wall, "
          f"{covered / 1e3:.1f}s covered by stages, "
          f"{gap_total / 1e3:.1f}s DRIVER GAP ==")
    print("\ntop 15 driver gaps (sec, preceded-by-stage):")
    gaps.sort(key=lambda g: g[1] - g[0], reverse=True)
    for a, b in gaps[:15]:
        before = [
            s for _, s in done if abs(s["done"] - a) < 50
        ]
        nm = before[0]["name"] if before else "?"
        print(f"  {(b - a) / 1e3:7.2f}s after [{nm}]")
    print("\ntop 20 stages by wall (wall_s, taskSum_s, nTasks, name):")
    done.sort(key=lambda ks: ks[1]["done"] - ks[1]["sub"], reverse=True)
    for k, s in done[:20]:
        tt = task_time.get(k, 0) / 1e3
        w = (s["done"] - s["sub"]) / 1e3
        print(f"  {w:7.2f}  {tt:8.2f}  {s['tasks']:4d}  {s['name']}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--hosts", type=int, default=256)
    ap.add_argument("--pages", type=int, default=200)
    ap.add_argument("--links", type=int, default=100)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--advisory", default="64m")
    ap.add_argument("--no-aqe", action="store_true")
    ap.add_argument("--graded", action="store_true",
                    help="profile the driver's graded crawl shape "
                         "(trickle seeds, 3 epochs, closure pre-resolved)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seeds-per-host", type=int, default=8)
    ap.add_argument("--budget", type=int, default=96)
    ap.add_argument("--truncate-every", type=int, default=4)
    args = ap.parse_args()
    if args.graded:
        os.environ.setdefault("MECHAML_CRAWL_DEBUG", "1")
    event_dir = tempfile.mkdtemp(prefix="mechaml_events_")
    t_start_ms = int(time.time() * 1000)
    out = run_crawl(args, event_dir)
    print(json.dumps(out))
    parse_event_log(event_dir, t_start_ms)


if __name__ == "__main__":
    main()
