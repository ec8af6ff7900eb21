"""Mimics the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side (DuckDB) at sf0.001 and compare
via pandas frames with dtype equality asserted — the same (strictly:
a stricter) normalization the driver hashes.  Round 4's red row
(`webm_blocks`) was value-correct but dtype-drifted (DuckDB window
SUM → HUGEINT → float64 → '103.0' vs '103'); this gate now fails on
any such uncast oracle column before the driver can see it."""

from __future__ import annotations

import pathlib

import duckdb
import pytest

import __spark_entry__ as entrymod
from mechaml_spark.selfcheck import compare_frames

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


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    spdf = q(spark, SF_DIR).toPandas()
    if sql is None:
        # every current op is oracle-checkable; a new non-SQL op must
        # be registered here explicitly
        assert name in set(), f"{name} missing an oracle"
        assert len(spdf) > 0
        return
    odf = ddb.execute(sql).df()
    rec = compare_frames(spdf, odf)
    assert rec["schema_match"], f"{name}: {rec['err']}"
    assert rec["dtype_match"], f"{name}: {rec['err']}"
    assert rec["rows_match"], f"{name}: {rec['err']}"
    assert rec["hash_match"], f"{name}: {rec['err']}"


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
