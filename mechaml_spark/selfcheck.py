"""Pandas-strict replica of the driver's correctness gate.

The driver compares each `queries()` result against its `oracle_sql()`
twin via pandas frames (Spark ``toPandas()`` vs DuckDB ``.df()``): it
sorts columns by name, string-canonicalizes every cell, and hashes the
row multiset.  That pipeline is *dtype-sensitive* — a DuckDB window
``SUM`` that silently returns HUGEINT lands in pandas as float64, so
the canonical string is ``'103.0'`` while Spark's int64 says ``'103'``
and the hash mismatches even though the values are numerically equal
(round 4's one red row, ``webm_blocks``).

This module is the shared strict comparator used by both
``scripts/oracle_check.py`` (the standing SELFCHECK_rN artifact) and
``tests/test_driver_contract.py``, so the self-check is at least as
strict as the driver:

* both sides converted to pandas (the driver's own representation);
* **dtype equality asserted per column** — catches HUGEINT/float64
  drift even when string forms happen to agree;
* cells string-canonicalized exactly (no float rounding) and compared
  as a multiset with columns sorted by name.
"""

from __future__ import annotations

import math
from collections import Counter

__all__ = ["canon_cell", "frame_multiset", "compare_frames"]


def canon_cell(v):
    """The driver-style string canonicalization of one pandas cell.

    ``str()`` of the cell, which is what makes the gate dtype-strict:
    ``str(numpy.int64(103)) == '103'`` but ``str(numpy.float64(103.0))
    == '103.0'``.  NaN/None normalize to a shared token only for the
    *null* case (both engines emit NaN for SQL NULL in float columns).
    """
    if v is None:
        return "\0null"
    if isinstance(v, float) and math.isnan(v):
        return "\0null"
    if isinstance(v, (bytes, bytearray)):
        return "\0b" + bytes(v).hex()
    return str(v)


def frame_multiset(df):
    """Multiset of canonicalized row tuples, columns sorted by name."""
    cols = sorted(df.columns)
    it = (tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None))
    return Counter(it)


def compare_frames(spdf, odf):
    """Compare a Spark-result pandas frame against a DuckDB ``.df()``.

    Returns the driver's record shape plus a ``dtype_match`` field and
    an ``err`` string naming the first divergence (None when green).
    """
    rec = {
        "rows_match": len(spdf) == len(odf),
        "schema_match": sorted(spdf.columns) == sorted(odf.columns),
        "dtype_match": False,
        "hash_match": False,
        "spark_rows": int(len(spdf)),
        "oracle_rows": int(len(odf)),
        "err": None,
    }
    if not rec["schema_match"]:
        rec["err"] = (
            f"columns differ: spark={sorted(spdf.columns)} "
            f"oracle={sorted(odf.columns)}"
        )
        return rec
    bad_dtypes = [
        (c, str(spdf[c].dtype), str(odf[c].dtype))
        for c in sorted(spdf.columns)
        if str(spdf[c].dtype) != str(odf[c].dtype)
    ]
    rec["dtype_match"] = not bad_dtypes
    if bad_dtypes:
        rec["err"] = f"dtype drift (spark vs oracle): {bad_dtypes[:4]}"
        return rec
    if not rec["rows_match"]:
        rec["err"] = f"row count {len(spdf)} vs oracle {len(odf)}"
        return rec
    sm, om = frame_multiset(spdf), frame_multiset(odf)
    rec["hash_match"] = sm == om
    if not rec["hash_match"]:
        only_s = list((sm - om).items())[:2]
        only_o = list((om - sm).items())[:2]
        rec["err"] = f"value multiset differs; spark-only={only_s} oracle-only={only_o}"
    return rec
