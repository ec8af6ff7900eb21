"""Self-check of the driver correctness gate: run every
`__spark_entry__.queries()` entry AND its `oracle_sql()` DuckDB
equivalent at sf0.01, compare row count, column-name set, and a
value multiset (columns sorted by name, floats rounded) per query.

Usage: python scripts/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def multiset(rows, cols):
    return Counter(tuple(canon(r[c]) for c in cols) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from mechaml_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        if sql is None:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        ores = con.execute(sql)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        scols = sorted(sdf.columns)
        ok_schema = scols == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        ok_hash = False
        if ok_schema and ok_rows:
            om = Counter(
                tuple(canon(r[ocols.index(c)]) for c in scols) for r in orows
            )
            ok_hash = multiset(srows, scols) == om
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL":
            bad.append(name)
    print("FAILURES:", bad if bad else "none")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
