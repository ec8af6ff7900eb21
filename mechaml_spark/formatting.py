"""Validated HTML5 input formatting: Color / Date / Time.

Parity target: reference src/format.ml (v1.2.1).
  * Color: r,g,b each in [0,255] -> "#RRGGBB" uppercase hex, else
    NULL (format.ml:24-34).
  * Date: full Gregorian validation incl. leap years
    (format.ml:40-54; y%400==0 or (y%4==0 and y%100!=0)), year > 0;
    output "%d-%02d-%02d" — year NOT zero-padded ("800-02-29" is
    valid, reference test.ml:470).  Deliberately not `date_format`
    (it pads the year to 4 digits).
  * Time: h in [0,23], m,s in [0,59] -> "%02d:%02d:%02d"
    (format.ml:65-75).

Pure Column expressions — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_col(x) -> Column:
    return F.lit(x) if isinstance(x, int) else x


def color(r, g, b) -> Column:
    r, g, b = _to_col(r), _to_col(g), _to_col(b)
    valid = (
        (r >= 0) & (r <= 255) & (g >= 0) & (g <= 255) & (b >= 0) & (b <= 255)
    )
    return F.when(valid, F.format_string("#%02X%02X%02X", r, g, b))


def _is_leap(y: Column) -> Column:
    return (y % 400 == 0) | ((y % 4 == 0) & (y % 100 != 0))


def date(d, m, y) -> Column:
    d, m, y = _to_col(d), _to_col(m), _to_col(y)
    max_day = (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), F.lit(31))
        .when(m.isin(4, 6, 9, 11), F.lit(30))
        .when(m == 2, F.when(_is_leap(y), F.lit(29)).otherwise(F.lit(28)))
        .otherwise(F.lit(0))
    )
    valid = (y > 0) & (m >= 1) & (m <= 12) & (d >= 1) & (d <= max_day)
    return F.when(valid, F.format_string("%d-%02d-%02d", y, m, d))


def time(h, mi, s) -> Column:
    h, mi, s = _to_col(h), _to_col(mi), _to_col(s)
    valid = (h >= 0) & (h <= 23) & (mi >= 0) & (mi <= 59) & (s >= 0) & (s <= 59)
    return F.when(valid, F.format_string("%02d:%02d:%02d", h, mi, s))


# ------------------------------------------------------------ Python mirror

def color_py(r: int, g: int, b: int) -> str | None:
    if all(0 <= v <= 255 for v in (r, g, b)):
        return "#%02X%02X%02X" % (r, g, b)
    return None


def _is_leap_py(y: int) -> bool:
    return y % 400 == 0 or (y % 4 == 0 and y % 100 != 0)


def date_py(d: int, m: int, y: int) -> str | None:
    if y <= 0 or not (1 <= m <= 12):
        return None
    lengths = [31, 29 if _is_leap_py(y) else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    if not (1 <= d <= lengths[m - 1]):
        return None
    return "%d-%02d-%02d" % (y, m, d)


def time_py(h: int, mi: int, s: int) -> str | None:
    if 0 <= h <= 23 and 0 <= mi <= 59 and 0 <= s <= 59:
        return "%02d:%02d:%02d" % (h, mi, s)
    return None
