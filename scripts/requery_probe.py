"""Quiet-window re-measure of specific driver queries (round-4 item 2).

Round 3's driver bench showed four >2x per-query slowdowns vs round 2
(seen_dedupe 2.0->6.1s, simhash_buckets 1.4->5.2s, submit_fetch
4.2->9.7s, dedup_exact 0.28->0.77s) with unchanged plans.  This
harness re-measures exactly those queries on the graded config
(local[32], sf0.1, shuffle=32) with the BENCH.md probe discipline:
a pure-CPU probe + per-core idle + hypervisor steal recorded before
and after, several repeats per query, min/median reported (min is
the contention-free estimate on a shared host).

Usage: python scripts/requery_probe.py [query ...]  (default: the four)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_bench import cpu_probe, idle_cores, steal_frac  # noqa: E402

DEFAULT = ["seen_dedupe", "simhash_buckets", "submit_fetch", "dedup_exact"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("REQUERY_REPEATS", "5"))

    from mechaml_spark.session import get_spark

    spark = get_spark(
        app_name="requery_probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from mechaml_spark.queries import QUERIES

    probe_before = cpu_probe()
    idle_before, steal_before = idle_cores(), steal_frac()

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        ts = sorted(times)
        results[name] = {
            "times": times,
            "min": ts[0],
            "median": ts[len(ts) // 2],
        }

    probe_after = cpu_probe()
    idle_after, steal_after = idle_cores(), steal_frac()
    spark.stop()
    print(json.dumps({
        "sf_dir": sf_dir,
        "repeats": repeats,
        "probe": [probe_before, probe_after],
        "idle_cores": [idle_before, idle_after],
        "steal_frac": [steal_before, steal_after],
        "results": results,
    }))


if __name__ == "__main__":
    main()
