"""spark-submit entry point for the crawl (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

The package ships as a --py-files zip, so this script must import
``mechaml_spark`` from the distributed archive, never from a
repo-relative path — run it from any cwd:

    cd /root/repo && zip -qr /tmp/mechaml_spark.zip mechaml_spark
    cd /tmp && /opt/spark/bin/spark-submit \
        --master 'local[8]' \
        --py-files /tmp/mechaml_spark.zip \
        /root/repo/scripts/submit_crawl.py \
        --hosts 8 --pages 20 --budget 12 --epochs 3 --out /tmp/crawl_out

On a real cluster only --master (yarn / k8s / spark://...) and the
executor sizing change; the job itself is identical.  The session is
built WITHOUT forcing a master so spark-submit's --master/--conf are
honored.

Outputs: parquet sinks under --out (visit_log/, payload/, jar/) plus
ONE JSON line of crawl metrics on stdout.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--pages", type=int, default=20)
    ap.add_argument("--budget", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seeds-per-host", type=int, default=2)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--bits", type=int, default=1 << 20)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # no .master(): spark-submit decides the cluster
    spark = SparkSession.builder.appName("mechaml_crawl").getOrCreate()
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
    )
    # superstep chains dozens of exchanges; AQE's per-exchange
    # materialize-and-replan barrier loses on this shape (BENCH.md)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")

    # imports resolve from the --py-files zip on every executor
    from mechaml_spark import agent
    from mechaml_spark.corpus import CorpusSpec, corpus_df, images_df, page_url
    from mechaml_spark.frontier.scheduler import crawl

    spec = CorpusSpec(
        n_hosts=args.hosts, pages_per_host=args.pages, images_per_page=2
    )
    seeds = [
        page_url(spec, i, (j * 7) % args.pages)
        for i in range(args.hosts)
        for j in range(args.seeds_per_host)
    ]
    corpus = corpus_df(spark, spec).cache()
    images = images_df(spark, spec).cache()
    corpus.count(), images.count()  # the "network", outside the timer

    t0 = time.perf_counter()
    res = crawl(
        spark, spec, seeds,
        budget_per_host=args.budget, max_epochs=args.epochs,
        n_shards=args.shards, n_bits=args.bits,
        corpus=corpus, images=images,
        checkpoint_dir=args.checkpoint_dir,
    )
    if args.out:
        res.visit_log.write.mode("overwrite").parquet(f"{args.out}/visit_log")
        agent.save_content(res.payload, f"{args.out}/payload", mode="overwrite")
        res.jar.write.mode("overwrite").parquet(f"{args.out}/jar")
    metrics = {
        "visited": res.visit_log.count(),
        "seen": res.seen.seen_df.count(),
        "payload": res.payload.count(),
        "jar": res.jar.count(),
        "epochs": res.epochs,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "master": spark.sparkContext.master,
    }
    print(json.dumps(metrics), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
