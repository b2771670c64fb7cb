"""Date-math resolution for range queries.

The reference resolves expressions like ``now-7d/d`` and
``2024-01-01||+1M/d`` at query-rewrite time
(``index/query/RangeQueryBuilder.java`` via ``common/time/
DateMathParser.java``; ``DateRangeIncludingNowQuery`` pins ``now``).
Grammar subset implemented here:

    expr     := anchor ops?
    anchor   := "now" | "<date>||"
    ops      := ( ("+"|"-") <n> <unit> | "/" <unit> )*
    unit     := y | M | w | d | h | H | m | s

Rounding follows the reference's side-dependent rule: the LOWER bound
of a range rounds DOWN to the unit start and the UPPER bound rounds UP
to the last millisecond of the unit (``gte``/``lt`` round down,
``gt``/``lte`` round up — DateMathParser ``roundUpProperty``)."""

from __future__ import annotations

import datetime as dt
import re
from typing import Optional

_OP_RE = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

_UNIT_SECONDS = {
    "w": 7 * 86400,
    "d": 86400,
    "h": 3600,
    "H": 3600,
    "m": 60,
    "s": 1,
}


def is_date_math(value) -> bool:
    return isinstance(value, str) and (value.startswith("now") or "||" in value)


def _add_months(t: dt.datetime, n: int) -> dt.datetime:
    m = t.month - 1 + n
    y = t.year + m // 12
    m = m % 12 + 1
    day = min(t.day, [31, 29 if y % 4 == 0 and (y % 100 != 0 or y % 400 == 0) else 28,
                      31, 30, 31, 30, 31, 31, 30, 31, 30, 31][m - 1])
    return t.replace(year=y, month=m, day=day)


def _floor(t: dt.datetime, unit: str) -> dt.datetime:
    if unit == "y":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "M":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":  # ISO week start (Monday), like the reference
        d0 = t - dt.timedelta(days=t.weekday())
        return d0.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "d":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("h", "H"):
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "m":
        return t.replace(second=0, microsecond=0)
    return t.replace(microsecond=0)


def _ceil(t: dt.datetime, unit: str) -> dt.datetime:
    """Round up = last millisecond of the unit (the reference subtracts
    1ms from the start of the next unit)."""
    f = _floor(t, unit)
    if unit == "y":
        nxt = f.replace(year=f.year + 1)
    elif unit == "M":
        nxt = _add_months(f, 1)
    else:
        nxt = f + dt.timedelta(seconds=_UNIT_SECONDS[unit])
    return nxt - dt.timedelta(milliseconds=1)


def resolve(value: str, now: Optional[dt.datetime] = None, round_up: bool = False) -> dt.datetime:
    """Resolve a date-math expression to a datetime.  ``round_up``
    selects the upper-bound rounding behavior for ``/unit`` ops."""
    now = now or dt.datetime.utcnow()
    if value.startswith("now"):
        t, rest = now, value[3:]
    else:
        anchor, _, rest = value.partition("||")
        t = _parse_anchor(anchor)
    for op, num, unit in _OP_RE.findall(rest):
        if op == "/":
            t = _ceil(t, unit) if round_up else _floor(t, unit)
            continue
        n = int(num or 1) * (1 if op == "+" else -1)
        if unit == "y":
            t = _add_months(t, 12 * n)  # clamps Feb 29 anchors
        elif unit == "M":
            t = _add_months(t, n)
        else:
            t = t + dt.timedelta(seconds=n * _UNIT_SECONDS[unit])
    return t


def _parse_anchor(anchor: str) -> dt.datetime:
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y-%m", "%Y"):
        try:
            return dt.datetime.strptime(anchor, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date-math anchor: {anchor!r}")
