"""Differential tests for urlkit.ip_literal_cols: the expression-only
inet_aton recognizer/canonicalizer vs CPython's ``socket.inet_aton``
(glibc semantics), and the reserved-range classifier vs the stdlib
``ipaddress`` module.

Documented boundary (urlkit.ip_literal_cols): hex parts support at
most 8 hex digits after ``0x`` — ``0x0ffffffff`` (9 digits, leading
zero) is treated as a hostname, not an IP.  The random generator
therefore never emits >8-hex-digit parts; everything else inet_aton
accepts is covered.
"""

from __future__ import annotations

import ipaddress
import random
import socket

import pytest
from pyspark.sql import functions as F

from mechaml_spark.urlkit import ip_literal_cols


def _classify(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = df.select("host", *ip_literal_cols(F.col("host"))).collect()
    return {r["host"]: r for r in rows}


def _aton(host):
    """(is_ip, dotted_quad) per socket.inet_aton, None canonical if not."""
    try:
        return True, socket.inet_ntoa(socket.inet_aton(host))
    except OSError:
        return False, None


_NETS = {
    "this-network": ipaddress.ip_network("0.0.0.0/8"),
    "loopback": ipaddress.ip_network("127.0.0.0/8"),
    "rfc1918": None,  # three ranges, handled below
    "link-local": ipaddress.ip_network("169.254.0.0/16"),
    "cgnat": ipaddress.ip_network("100.64.0.0/10"),
    "multicast-reserved": ipaddress.ip_network("224.0.0.0/3"),
}
_RFC1918 = [ipaddress.ip_network(n)
            for n in ("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16")]


def _expected_reason(dq):
    a = ipaddress.ip_address(dq)
    if a in _NETS["this-network"]:
        return "this-network"
    if a in _NETS["loopback"]:
        return "loopback"
    if any(a in n for n in _RFC1918):
        return "rfc1918"
    if a in _NETS["link-local"]:
        return "link-local"
    if a in _NETS["cgnat"]:
        return "cgnat"
    if a in _NETS["multicast-reserved"]:
        return "multicast-reserved"
    return None


def test_fixture_table_semantics(spark):
    from mechaml_spark.queries import _IP_HOSTS

    got = _classify(spark, _IP_HOSTS)
    for h in _IP_HOSTS:
        is_ip, dq = _aton(h)
        r = got[h]
        assert r["is_ip"] == is_ip, h
        assert r["ip_canonical"] == dq, h
        want = _expected_reason(dq) if is_ip else None
        assert r["block_reason"] == want, h
        assert r["blocked"] == (want is not None), h


def _rand_part(rng):
    kind = rng.randrange(6)
    if kind == 0:  # decimal
        return str(rng.choice([0, 1, 9, 10, 99, 127, 255, 256, 257,
                               65535, 65536, 2130706433, 4294967295,
                               4294967296, rng.randrange(10**9)]))
    if kind == 1:  # octal (leading zero)
        return "0" + "".join(rng.choice("01234567")
                             for _ in range(rng.randrange(0, 12)))
    if kind == 2:  # hex, <= 8 digits (documented boundary)
        return "0x" + "".join(rng.choice("0123456789abcdefABCDEF")
                              for _ in range(rng.randrange(1, 9)))
    if kind == 3:  # bad octal / bad decimal shapes
        return rng.choice(["08", "0x", "00x1", "1a", "a1", ""])
    if kind == 4:  # plain hostname label
        return rng.choice(["www", "example", "com", "xn--x", "a-b"])
    return str(rng.randrange(0, 256))


def test_differential_vs_inet_aton(spark):
    rng = random.Random(20260820)
    hosts = set()
    while len(hosts) < 400:
        n = rng.choice([1, 1, 2, 3, 4, 4, 4, 5])
        hosts.add(".".join(_rand_part(rng) for _ in range(n)))
    hosts = sorted(hosts)
    got = _classify(spark, hosts)
    for h in hosts:
        is_ip, dq = _aton(h)
        r = got[h]
        assert r["is_ip"] == is_ip, (h, r["is_ip"], is_ip)
        assert r["ip_canonical"] == dq, (h, r["ip_canonical"], dq)
        if is_ip:
            want = _expected_reason(dq)
            assert r["block_reason"] == want, (h, dq)
            assert r["blocked"] == (want is not None), (h, dq)
        else:
            assert not r["blocked"]
            assert r["block_reason"] is None


def test_reserved_range_edges(spark):
    # exact boundary addresses of every gated range, both sides
    edges = [
        "0.0.0.0", "0.255.255.255", "1.0.0.0",
        "126.255.255.255", "127.0.0.0", "127.255.255.255", "128.0.0.0",
        "9.255.255.255", "10.0.0.0", "10.255.255.255", "11.0.0.0",
        "172.15.255.255", "172.16.0.0", "172.31.255.255", "172.32.0.0",
        "192.167.255.255", "192.168.0.0", "192.168.255.255",
        "192.169.0.0",
        "169.253.255.255", "169.254.0.0", "169.254.255.255",
        "169.255.0.0",
        "100.63.255.255", "100.64.0.0", "100.127.255.255",
        "100.128.0.0",
        "223.255.255.255", "224.0.0.0", "255.255.255.255",
    ]
    got = _classify(spark, edges)
    for h in edges:
        want = _expected_reason(h)
        r = got[h]
        assert r["is_ip"] and r["ip_canonical"] == h
        assert r["block_reason"] == want, (h, r["block_reason"], want)
        assert r["blocked"] == (want is not None)


def test_non_ip_shapes_pass_through(spark):
    hosts = ["example.com", "1.2.3.4.5", "256.1.1.1", "", "127.0.0.1.",
             ".127.0.0.1", "1..2", "0x123456789", "a.10.0.0.1"]
    got = _classify(spark, hosts)
    for h in hosts:
        r = got[h]
        assert not r["is_ip"], h
        assert not r["blocked"], h
        assert r["ip_canonical"] is None and r["block_reason"] is None


@pytest.mark.parametrize("h,dq", [
    ("012.3.4.5", "10.3.4.5"),       # octal FIRST octet
    ("0X7F.0.0.1", "127.0.0.1"),     # uppercase 0X
    ("0xffffffff", "255.255.255.255"),
    ("127.0.1", "127.0.0.1"),        # 3-part: last fills 2 bytes
    ("0.0", "0.0.0.0"),
])
def test_short_and_radix_forms(spark, h, dq):
    r = _classify(spark, [h])[h]
    assert r["is_ip"] and r["ip_canonical"] == dq
    # sanity: agrees with the platform inet_aton too
    assert _aton(h) == (True, dq)


def test_ip6_fixture_agrees_with_stdlib(spark):
    import ipaddress as ip

    from mechaml_spark.queries import QUERIES

    out = QUERIES["ip6_hostnames"](spark, "/root/testdata/sf0.001")
    rows = {r["host"]: r for r in out.collect()}
    for host, r in rows.items():
        inner = host[1:-1] if host.startswith("[") else None
        try:
            addr = ip.IPv6Address(inner) if inner else None
        except ValueError:
            addr = None
        assert r["is_ip6"] == (addr is not None), host
        if addr is not None:
            assert r["canonical"] == addr.compressed
            v4 = addr.ipv4_mapped
            if v4 is not None:
                # the v4 twin gate must agree on the embedded address
                assert r["blocked"] == (v4.is_loopback or v4.is_private)
            elif r["block_reason"] == "documentation":
                assert addr in ip.ip_network("2001:db8::/32")
        else:
            assert not r["blocked"] and r["canonical"] is None
