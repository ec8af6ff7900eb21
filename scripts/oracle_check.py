"""Pandas-strict self-check of the driver correctness gate.

Runs every `__spark_entry__.queries()` entry AND its `oracle_sql()`
DuckDB twin, converts BOTH sides to pandas (Spark ``toPandas()`` vs
DuckDB ``.df()``) and compares with `mechaml_spark.selfcheck` — dtype
equality asserted per column, exact string canonicalization, multiset
compare with columns sorted by name.  This is at least as strict as
the driver's gate (which is pandas-based and dtype-sensitive), so a
query green here cannot go red in a driver round on a typing defect.

Writes the standing per-round artifact SELFCHECK_r{N}.json (same
per-query fields as the driver's CORRECTNESS_r{N}.json plus
``dtype_match``) when --out is given.

Usage: python scripts/oracle_check.py [sf_dir] [--out SELFCHECK.json] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args)

    import duckdb

    import __spark_entry__ as entry
    from mechaml_spark.selfcheck import compare_frames
    from mechaml_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    results, bad = {}, []
    t0 = time.time()
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            results[name] = {"err": f"spark: {e!r}"}
            bad.append(name)
            print(f"{name}: SPARK ERROR {e!r}")
            continue
        if sql is None:
            results[name] = {
                "rows_match": len(spdf) > 0,
                "spark_rows": int(len(spdf)),
                "oracle_rows": None,
                "err": None if len(spdf) else "empty rows-only result",
            }
            print(f"{name}: rows={len(spdf)} (no oracle — rows-only check)")
            if not len(spdf):
                bad.append(name)
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e!r}"}
            bad.append(name)
            print(f"{name}: ORACLE ERROR {e!r}")
            continue
        rec = compare_frames(spdf, odf)
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["dtype_match"] and rec["hash_match"]
        print(
            f"{name}: {'OK' if ok else 'FAIL'} rows {rec['spark_rows']}/"
            f"{rec['oracle_rows']} schema={rec['schema_match']} "
            f"dtype={rec['dtype_match']} hash={rec['hash_match']}"
            + (f" err={rec['err']}" if rec["err"] else "")
        )
        if not ok:
            bad.append(name)
    elapsed = time.time() - t0
    print(f"checked {len(results)} queries in {elapsed:.1f}s")
    print("FAILURES:", bad if bad else "none")
    if out_path:
        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_failures": len(bad),
            "failures": bad,
            "elapsed_sec": round(elapsed, 1),
            "comparator": "pandas dtype-strict (mechaml_spark.selfcheck)",
            "queries": results,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        print(f"wrote {out_path}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
