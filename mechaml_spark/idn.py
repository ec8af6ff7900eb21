"""IDN hostname hygiene: RFC 3492 punycode decode + UTS #39-style
mixed-script / whole-script-confusable flags for the URL frontier.

A crawl frontier at web scale sees internationalized hostnames both
legitimately (bücher.example, 中国 TLD labels) and adversarially
(IDN homograph spoofs such as the famous all-Cyrillic
``xn--80ak6aa92e.com`` = "аррӏе.com" lookalike of apple.com).  The
reference agent never decodes hostnames (src/agent.ml hands the URI
to ocaml-cohttp untouched); a frontier scheduler that dedupes,
rate-limits, and safety-gates by host needs the decoded form and the
spoof signals.  This module is pure stdlib:

* ``punycode_decode`` — RFC 3492 §6.2 decode, written from the spec
  (differentially tested against CPython's independent ``punycode``
  codec in tests/test_idn.py).
* ``decode_host`` — per-label ``xn--`` ACE unwrap of a dotted host;
  malformed ACE labels stay as-is (a crawler must not crash on
  hostile input) and set the ``bad_ace`` flag.
* ``script_flags`` — per-label writing-system classification by
  codepoint block (Latin / Cyrillic / Greek / Han / Arabic / Hebrew;
  digits, hyphen and dots are Common), yielding the two standard
  homograph signals, simplified from UTS #39:
  - ``mixed_script``: one label mixes >= 2 non-Common scripts
    (UTS #39 "highly restrictive" profile violation);
  - ``confusable``: a label is entirely non-Latin yet every cased
    letter lies in a small published Cyrillic/Greek->Latin
    lookalike set (whole-script confusable — the аррӏе.com shape).

Everything here is per-row scalar work over the host column —
Arrow-batched inside the caller's pandas stage, no shuffle, no state;
at 10^10 URLs it scales exactly like the canonicalizer.
"""

from __future__ import annotations

# RFC 3492 §5 parameter values.
_BASE, _TMIN, _TMAX = 36, 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS, _INITIAL_N = 72, 128


class PunycodeError(ValueError):
    """Malformed ACE label (overflow, bad digit, truncated input)."""


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    # RFC 3492 §6.1, verbatim arithmetic.
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit(ch: str) -> int:
    o = ord(ch)
    if 0x30 <= o <= 0x39:  # 0-9 -> 26..35
        return o - 22
    if 0x41 <= o <= 0x5A:  # A-Z -> 0..25
        return o - 0x41
    if 0x61 <= o <= 0x7A:  # a-z -> 0..25
        return o - 0x61
    raise PunycodeError(f"bad base-36 digit {ch!r}")


def punycode_decode(text: str) -> str:
    """RFC 3492 §6.2 decoder for one label's post-``xn--`` text."""
    if not text.isascii():
        raise PunycodeError("non-ASCII input to punycode decode")
    pos = text.rfind("-")
    if pos > 0:
        output = list(text[:pos])
        ext = text[pos + 1 :]
    else:
        output = []
        ext = text[1:] if pos == 0 else text
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    j = 0
    while j < len(ext):
        oldi, w, k = i, 1, _BASE
        while True:
            if j >= len(ext):
                raise PunycodeError("truncated variable-length integer")
            digit = _digit(ext[j])
            j += 1
            i += digit * w
            if i > 0x10FFFF * 1000:  # generous overflow guard
                raise PunycodeError("overflow")
            t = min(max(k - bias, _TMIN), _TMAX)
            if digit < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise PunycodeError("code point out of range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def decode_host(host: str) -> tuple[str, bool]:
    """Unwrap every ``xn--`` ACE label of a dotted hostname.

    Returns ``(decoded_host, bad_ace)``; a label that fails to decode
    is kept verbatim and sets ``bad_ace`` (hostile input must flag,
    never crash, per the crawler-wide status-0 philosophy)."""
    out, bad = [], False
    for label in host.split("."):
        low = label.lower()
        if low.startswith("xn--"):
            try:
                out.append(punycode_decode(low[4:]))
            except PunycodeError:
                out.append(label)
                bad = True
        else:
            out.append(label)
    return ".".join(out), bad


# Codepoint-block script classes (the blocks a hostname plausibly
# carries; everything else maps to "other" which counts as a script).
_BLOCKS = (
    (0x0041, 0x005A, "latin"),
    (0x0061, 0x007A, "latin"),
    (0x00C0, 0x024F, "latin"),  # Latin-1 supplement + Extended-A/B letters
    (0x0370, 0x03FF, "greek"),
    (0x0400, 0x04FF, "cyrillic"),
    (0x0500, 0x052F, "cyrillic"),
    (0x0590, 0x05FF, "hebrew"),
    (0x0600, 0x06FF, "arabic"),
    (0x4E00, 0x9FFF, "han"),
    (0x3400, 0x4DBF, "han"),
)

# Whole-script confusables: non-Latin letters whose standard rendering
# is indistinguishable from a Latin letter (the core of UTS #39's
# confusables.txt restricted to hostname-plausible Cyrillic + Greek).
_CONFUSABLE = set("аеорсухіјѕќһԁᏟ" "οικνυρϲ" "ӏ")


def _script_of(ch: str) -> str:
    o = ord(ch)
    if ch.isdigit() or ch in "-._":
        return "common"
    for lo, hi, name in _BLOCKS:
        if lo <= o <= hi:
            return name
    return "other"


def script_flags(decoded_host: str) -> tuple[str, bool, bool]:
    """(sorted script set, mixed_script, whole-script confusable)."""
    scripts: set[str] = set()
    mixed = False
    confusable = False
    for label in decoded_host.split("."):
        label_scripts = {s for s in map(_script_of, label) if s != "common"}
        scripts |= label_scripts
        if len(label_scripts) >= 2:
            mixed = True
        letters = [c for c in label if not c.isdigit() and c not in "-_"]
        if (
            letters
            and "latin" not in label_scripts
            and label_scripts
            and all(c in _CONFUSABLE for c in letters)
        ):
            confusable = True
    return ",".join(sorted(scripts)), mixed, confusable
