"""Mimics the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side (DuckDB) at sf0.001 and compare
row multisets (columns sorted by name — same normalization the
driver hashes)."""

from __future__ import annotations

import math
import pathlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = pathlib.Path(SF_DIR) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if sql is None:
        # every current op is oracle-checkable; a new non-SQL op must
        # be registered here explicitly
        assert name in set(), f"{name} missing an oracle"
        assert len(srows) > 0
        return
    ores = ddb.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = [tuple(r) for r in ores.fetchall()]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    ncols, nsrows = _normalize(scols, srows)
    _, norows = _normalize(ocols, orows)
    assert len(nsrows) == len(norows), (
        f"{name}: row count {len(nsrows)} vs oracle {len(norows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(nsrows, norows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_no_complex_output_columns(spark):
    """The driver's oracle harness canonicalizes result rows with a
    pandas lexsort that cannot factorize list/dict cells, so a query
    emitting array/map/struct columns crashes the gate even when its
    values are right (this cost round 3 its one red row,
    image_colorhist).  Pin structurally: every queries() entry must
    emit only atomic-typed columns.  Schema analysis only — no
    execution."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, q in sorted(entrymod.queries().items()):
        schema = q(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"complex-typed output columns: {bad}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"lang", "n_links"}


def test_bpe_ish_pretokens_differ_from_whitespace(spark):
    """The two directive token-count flavors must actually differ on
    punctuated text (the synthetic corpus is space-separated words,
    where they coincide): "don't stop!" -> 2 whitespace tokens but 5
    BPE-ish pretokens (don / ' / t / stop / !)."""
    from pyspark.sql import functions as F

    from mechaml_spark.queries import _BPE_RE, _toks

    df = spark.createDataFrame([("don't stop!",)], "text string").select(
        F.size(_toks(F.col("text"))).alias("ws"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
        ).alias("bpe"),
    )
    (row,) = df.collect()
    assert (row["ws"], row["bpe"]) == (2, 5)
    # and DuckDB (the oracle engine) agrees on the same pattern
    import duckdb

    (n,) = duckdb.sql(
        "SELECT len(regexp_extract_all('don''t stop!', "
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
    ).fetchone()
    assert n == 5
