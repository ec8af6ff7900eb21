"""Jar-size scaling micro-bench for cookies.add_to_headers.

Fixed request stream, growing jar: the "scan" strategy (broadcast
array, O(|jar|) per request) should degrade linearly with jar size,
the "join" strategy (host-suffix explode + broadcast hash equi-join)
should stay flat.  VERDICT r2 item 1's "done" criterion.

Usage: python scripts/cookie_jar_bench.py [n_requests]
Prints one JSON line per (strategy, jar_size) with wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mechaml_spark import cookies as ck  # noqa: E402
from mechaml_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="cookie_jar_bench")

    # requests over ~n_req/4 distinct hosts, half with a subdomain hop
    rid = F.col("id")
    host = F.concat(
        F.when(rid % 2 == 0, F.lit("sub.")).otherwise(F.lit("")),
        F.lit("h"),
        (rid % (n_req // 4)).cast("string"),
        F.lit(".bench.test"),
    )
    req = (
        spark.range(n_req)
        .select(
            rid.alias("rid"),
            F.concat(F.lit("http://"), host, F.lit("/p/"), rid).alias("url"),
        )
        .localCheckpoint()  # freeze the input so each leg measures matching only
    )

    results = []
    for jar_n in (100, 1_000, 10_000, 100_000):
        jid = F.col("id")
        jar = (
            spark.range(jar_n)
            .select(
                F.concat(F.lit("c"), jid % 8).alias("name"),
                F.concat(F.lit("v"), jid).alias("value"),
                F.lit(None).cast("long").alias("max_age"),
                F.concat(
                    F.lit("h"), (jid % (n_req // 4)).cast("string"), F.lit(".bench.test")
                ).alias("domain"),
                F.lit("").alias("path"),
                F.lit(False).alias("secure"),
            )
            .dropDuplicates(["name", "domain", "path"])
            .localCheckpoint()
        )
        for strategy in ("scan", "join"):
            out = ck.add_to_headers(req, jar, strategy=strategy)
            t0 = time.monotonic()
            n = out.where(F.length("cookie_header") >= 0).count()
            dt = time.monotonic() - t0
            assert n == n_req, (n, n_req)
            rec = {
                "strategy": strategy,
                "jar_size": jar_n,
                "n_requests": n_req,
                "sec": round(dt, 3),
                "us_per_request": round(dt / n_req * 1e6, 2),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
