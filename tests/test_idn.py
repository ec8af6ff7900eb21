"""IDN punycode decoder + homograph flags (mechaml_spark.idn).

The decoder is written from RFC 3492 §6.2; the authoritative check is
differential against CPython's independently-implemented ``punycode``
codec over both the published sample vectors and randomized labels.
"""

from __future__ import annotations

import random

import pytest

from mechaml_spark.idn import (
    PunycodeError,
    decode_host,
    punycode_decode,
    script_flags,
)

# RFC 3492 §7.1 sample strings (the decoded side of the published
# test vectors; the ACE side is derived through CPython's independent
# encoder, so the assertion is differential with zero transcription
# risk).
RFC_STRINGS = [
    "ليهمابتكلموشعربي؟",
    "他们为什么不说中文",
    "他們爲什麽不說中文",
    "Pročprostěnemluvíčesky",
    "למההםפשוטלאמדבריםעברית",
    "यहलोगहिन्दीक्योंनहींबोलसकतेहैं",
    "なぜみんな日本語を話してくれないのか",
    "세계의모든사람들이한국어를이해한다면얼마나좋을까",
    "почемужеонинеговорятпорусски",
    "PorquénopuedensimplementehablarenEspañol",
    "TạisaohọkhôngthểchỉnóitiếngViệt",
    "3年B組金八先生",
    "安室奈美恵-with-SUPER-MONKEYS",
    "Hello-Another-Way-それぞれの場所",
    "ひとつ屋根の下2",
    "MajiでKoiする5秒前",
    "パフィーdeルンバ",
    "そのスピードで",
    "-> $1.00 <-",
]


@pytest.mark.parametrize("expected", RFC_STRINGS)
def test_rfc3492_sample_vectors(expected):
    ace = expected.encode("punycode").decode("ascii")
    assert punycode_decode(ace) == expected


def test_differential_vs_cpython_random_labels():
    """Round-trip random unicode labels through CPython's encoder and
    check our spec decoder agrees with CPython's decoder."""
    rng = random.Random(3492)
    pools = [
        (0x61, 0x7A),  # ascii lowercase
        (0x430, 0x44F),  # cyrillic
        (0x3B1, 0x3C9),  # greek
        (0x4E00, 0x4E80),  # han slice
        (0x5D0, 0x5EA),  # hebrew
    ]
    for _ in range(300):
        n = rng.randint(1, 12)
        label = "".join(
            chr(rng.randint(*pools[rng.randrange(len(pools))]))
            for _ in range(n)
        )
        ace = label.encode("punycode").decode("ascii")
        assert punycode_decode(ace) == ace.encode("ascii").decode(
            "punycode"
        )
        assert punycode_decode(ace) == label


@pytest.mark.parametrize(
    "bad", ["99999999999", "!!!", "a-b-!", "ls8h=", "éabc"]
)
def test_malformed_ace_raises(bad):
    with pytest.raises(PunycodeError):
        punycode_decode(bad)


def test_decode_host_unwraps_only_ace_labels():
    dec, bad = decode_host("www.xn--bcher-kva.example")
    assert (dec, bad) == ("www.bücher.example", False)
    # malformed ACE label: kept verbatim, flagged, no crash
    dec, bad = decode_host("xn--!!!.bad")
    assert (dec, bad) == ("xn--!!!.bad", True)
    # uppercase ACE prefix also unwraps (hostnames are case-folded)
    dec, bad = decode_host("XN--BCHER-KVA.example")
    assert (dec, bad) == ("bücher.example", False)


def test_script_flags_homograph_signals():
    # whole-script Cyrillic confusable (the apple.com spoof)
    s, mixed, conf = script_flags("аррӏе.com")
    assert (s, mixed, conf) == ("cyrillic,latin", False, True)
    # mixed-script single label (Latin paypal with one Cyrillic а)
    s, mixed, conf = script_flags("pаypal.com")
    assert (s, mixed, conf) == ("cyrillic,latin", True, False)
    # plain ascii and legitimate single-script IDNs stay clean
    assert script_flags("example.com") == ("latin", False, False)
    assert script_flags("bücher.example") == ("latin", False, False)
    s, mixed, conf = script_flags("www.中国")
    assert (s, mixed, conf) == ("han,latin", False, False)
    # Greek whole-script confusable (οκ)
    s, mixed, conf = script_flags("οκ.com")
    assert (s, mixed, conf) == ("greek,latin", False, True)
    # Greek that is NOT fully confusable stays unflagged
    s, mixed, conf = script_flags("αβγδ.example")
    assert (s, mixed, conf) == ("greek,latin", False, False)


def test_digits_and_hyphens_are_common_script():
    # digits/hyphens never create a mixed-script or confusable flag
    assert script_flags("abc-123.com") == ("latin", False, False)
    s, mixed, conf = script_flags("сайт-7.рф")
    assert (s, mixed, conf) == ("cyrillic", False, False)
