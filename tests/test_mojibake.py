"""Mojibake detection/repair semantics (textclean.fix_mojibake)."""

from __future__ import annotations

from mechaml_spark.textclean import _sloppy_cp1252_encode, fix_mojibake


def _garble(s: str) -> str:
    return s.encode("utf-8").decode("cp1252")


def test_single_and_double_mojibake_repair():
    base = "naïve café — “fancy” ‘quotes’ №…"
    # ” is cp1252-hole 0x9D, № is non-cp1252: restrict to round-trip
    # -safe chars for the strict path
    base = "naïve café – ‘quotes’ über"
    one = _garble(base)
    assert fix_mojibake(one) == (base, 1)
    assert fix_mojibake(_garble(one)) == (base, 2)


def test_non_latin_scripts_repaired():
    """The hint class covers ALL UTF-8 lead bytes decoded as
    cp1252/latin-1 (0xC2-0xF4), not just the Latin-1-range leads —
    Cyrillic/Greek garble was a false-negative class before r4."""
    for clean in ["привет", "Ελλάδα", "çağrı", "🙂 ok"]:
        garbled = clean.encode("utf-8").decode("cp1252")
        assert fix_mojibake(garbled) == (clean, 1), clean


def test_clean_text_untouched():
    for s in ("plain ascii", "café déjà", "日本語テキスト", ""):
        assert fix_mojibake(s) == (s, 0)


def test_real_A_tilde_not_mangled():
    # 'Ãber' re-encodes to C3 62 — invalid UTF-8, so repair declines
    s = "Ãber alles"
    assert fix_mojibake(s) == (s, 0)


def test_sloppy_cp1252_holes():
    # U+2019 garbled via latin-1 (not cp1252) leaves C1 control 0x90?
    # Construct the hole case directly: bytes with 0x9D decoded
    # latin-1 then repaired through the sloppy encoder.
    base = "x”y"  # ” = E2 80 9D, 9D is a cp1252 hole
    damaged = base.encode("utf-8").decode("latin-1")
    assert fix_mojibake(damaged) == (base, 1)
    assert _sloppy_cp1252_encode(damaged) == base.encode("utf-8")


def test_non_encodable_left_alone():
    s = "â€ plus 日本語"  # hint matches but CJK can't re-encode
    assert fix_mojibake(s) == (s, 0)


def test_max_passes_bounds_work():
    base = "é"
    thrice = _garble(_garble(_garble(base)))
    fixed, n = fix_mojibake(thrice)  # two passes only
    assert n == 2 and fixed == _garble(base)
    assert fix_mojibake(fixed) == (base, 1)
