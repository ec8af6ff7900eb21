"""publicsuffix.org algorithm (domains.py): rule precedence edges."""

from __future__ import annotations

from mechaml_spark import domains


def _reg(spark, hosts):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "k long, host string"
    )
    out = domains.registered_domain(
        df, "host", "k", domains.rule_table(spark)
    )
    rows = {r["k"]: (r["public_suffix"], r["registered_domain"])
            for r in out.collect()}
    return [rows[i] for i in range(len(hosts))]


def test_psl_rule_shapes(spark):
    got = _reg(
        spark,
        [
            "WWW.Site.CO.UK",        # case-folds; multi-label rule
            "deep.a.site.com",       # longest=com; extra labels dropped
            "b.foo.ck",              # wildcard *.ck: suffix foo.ck
            "foo.ck",                # wildcard: host IS the suffix
            "www.ck",                # exception !www.ck beats *.ck
            "a.www.ck",              # exception: ps=ck, reg=www.ck
            "host.unknowntld",       # implicit default rule *
            "co.uk",                 # bare public suffix
            "sub.x.github.io",       # private-domain rule wins over io
            "ck",                    # bare TLD under a wildcard rule:
                                     # *.ck can't match (no star label)
        ],
    )
    assert got == [
        ("co.uk", "site.co.uk"),
        ("com", "site.com"),
        ("foo.ck", "b.foo.ck"),
        ("foo.ck", None),
        ("ck", "www.ck"),
        ("ck", "www.ck"),
        ("unknowntld", "host.unknowntld"),
        ("co.uk", None),
        ("github.io", "x.github.io"),
        ("ck", None),
    ]


def test_deep_host_bounded_explode(spark):
    # 12 labels: only the rightmost MAX_LABELS are considered, the
    # rule still matches and the row is not dropped or duplicated.
    host = ".".join(f"l{i}" for i in range(11)) + ".com"
    got = _reg(spark, [host])
    assert got == [("com", "l10.com")]


def test_rule_table_shapes(spark):
    rows = dict(
        (k, (e, x)) for k, e, x in domains.rule_rows(["a.b", "*.c", "!d.c"])
    )
    assert rows == {"a.b": (0, 0), "c": (1, 0), "d.c": (-1, 1)}


def test_link_stats_query_shape(spark):
    # internal/external classification keys on eTLD+1, not host
    from mechaml_spark.queries import QUERIES

    out = QUERIES["link_stats"](spark, "/root/testdata/sf0.001")
    r = {x["doc_id"]: x for x in out.collect()}
    for did, row in r.items():
        assert row["n_internal"] == 2
        assert row["n_links"] == 3 + (1 if did % 3 == 0 else 0)
        assert row["n_ext_domains"] == 1 + (1 if did % 3 == 0 else 0)
