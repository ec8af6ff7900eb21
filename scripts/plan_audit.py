"""Physical-plan audit of every driver-contract query -> markdown.

Regenerates the table in PLANS.md: for each ``queries()`` entry at
sf0.01 we capture ``explain("formatted")`` (static plan; AQE further
improves at runtime) and count shuffle exchanges, join strategies,
whole-stage-codegen spans, pushed parquet filters, and the narrowest
scanned schema — the things that decide whether the plan survives a
100x scale-up.

Usage: python scripts/plan_audit.py [sf_dir]  (writes markdown to stdout)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def audit_one(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    ops = plan.split("\n\n")[0]
    n_ex = len(re.findall(r"\bExchange\b|\bShuffleExchange", ops))
    n_reuse = len(re.findall(r"ReusedExchange", ops))
    bhj = len(re.findall(r"BroadcastHashJoin", ops))
    smj = len(re.findall(r"SortMergeJoin", ops))
    bnlj = len(re.findall(r"BroadcastNestedLoopJoin", ops))
    codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
    pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    min_cols = (
        min((len(s.split(",")) if s else 0) for s in scans) if scans else None
    )
    return {
        "exchanges": n_ex - n_reuse,
        "bhj": bhj,
        "smj": smj,
        "bnlj": bnlj,
        "codegen": codegen,
        "pushed": "Y" if pushed else "–",
        "min_scan": min_cols if min_cols is not None else "–",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from mechaml_spark.session import get_spark

    spark = get_spark(
        app_name="plan_audit", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import __spark_entry__ as entry

    print("| query | exchanges | BHJ | SMJ | BNLJ | codegen | pushed filters"
          " | min scan cols |")
    print("|---|---|---|---|---|---|---|---|")
    for name, fn in sorted(entry.queries().items()):
        try:
            a = audit_one(fn(spark, sf_dir))
            print(
                f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | "
                f"{a['bnlj']} | {a['codegen']} | {a['pushed']} | "
                f"{a['min_scan']} |"
            )
        except Exception as e:  # pragma: no cover
            print(f"| {name} | ERROR {type(e).__name__} | | | | | | |")
    spark.stop()


if __name__ == "__main__":
    main()
