"""Go-style duration strings ("2h3m30s", "1d10s", "1mo5d") ⇄ timedelta.

Same unit table and formatting behavior as the reference's vendored
durationpy (`/root/reference/src/validr/_vendor/durationpy.py`), implemented
independently.  Units: ns us µs μs ms s m h d w mm mo y (mo=30d, y=365d).
"""

from __future__ import annotations

import datetime
import re

_NS = 1
_US = 1000 * _NS
_MS = 1000 * _US
_SEC = 1000 * _MS
_MIN = 60 * _SEC
_HOUR = 60 * _MIN
_DAY = 24 * _HOUR
_WEEK = 7 * _DAY
_MONTH = 30 * _DAY
_YEAR = 365 * _DAY

UNIT_NS = {
    "ns": _NS, "us": _US, "µs": _US, "μs": _US, "ms": _MS,
    "s": _SEC, "m": _MIN, "h": _HOUR, "d": _DAY, "w": _WEEK,
    "mm": _MONTH, "mo": _MONTH, "y": _YEAR,
}


class DurationError(ValueError):
    """Bad duration string."""


_PART = re.compile(r"([\d\.]+)([a-zµμ]+)")


def parse_duration(text: str) -> datetime.timedelta:
    """Parse "12h59s" → timedelta.  Raises DurationError on bad input."""
    text = text.strip()
    if text in ("0", "+0", "-0"):
        return datetime.timedelta()
    if not text:
        raise DurationError(f"Invalid duration {text}")
    sign = -1 if text[0] == "-" else 1
    parts = _PART.findall(text)
    if not parts:
        raise DurationError(f"Invalid duration {text}")
    total_ns = 0.0
    for value, unit in parts:
        scale = UNIT_NS.get(unit)
        if scale is None:
            raise DurationError(f"Unknown unit {unit} in duration {text}")
        try:
            total_ns += float(value) * scale
        except ValueError:
            raise DurationError(
                f"Invalid value {value} in duration {text}") from None
    return datetime.timedelta(microseconds=sign * total_ns / _US)


def format_duration(delta: datetime.timedelta, extended: bool = False) -> str:
    """Format timedelta → Go-duration string, byte-identical to the
    reference's vendored durationpy.to_str (durationpy.py:113-189),
    including its quirks which the reference inherits:

    * the small/large split tests the SIGNED seconds (< 1), so every
      negative duration formats through the sub-second decomposition
      ("-1000ms" for −1 s);
    * zero formats as "0" (no unit);
    * sub-second values decompose into concatenated ms/us/ns components
      ("1ms500us"), not a single unit.
    """
    total = delta.total_seconds()
    sign = "-" if total < 0 else ""
    ns = abs(total * _SEC)
    body = _small_body(ns) if total < 1 else _large_body(ns, extended)
    return sign + body


def _small_body(ns: float) -> str:
    if not ns:
        return "0"
    out = []
    for unit, scale in (("ms", _MS), ("us", _US)):
        qty = int(ns / scale)
        if qty:
            ns -= scale * qty
            out.append(f"{qty:g}{unit}")
    if ns:
        out.append(f"{ns:g}ns")
    return "".join(out)


def _large_body(ns: float, extended: bool) -> str:
    out = []
    ladder = [("y", _YEAR), ("mo", _MONTH), ("d", _DAY)] if extended else []
    ladder += [("h", _HOUR), ("m", _MIN)]
    for unit, scale in ladder:
        qty = int(ns / scale)
        if qty:
            ns -= scale * qty
            out.append(f"{qty:g}{unit}")
    seconds = float(ns) / float(_SEC)
    if seconds:
        out.append(f"{seconds:g}s")
    return "".join(out)
