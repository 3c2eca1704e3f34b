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


# descending unit ladders used when formatting
_LARGE_BASIC = [("h", _HOUR), ("m", _MIN), ("s", _SEC)]
_LARGE_EXT = [("y", _YEAR), ("mo", _MONTH), ("d", _DAY)] + _LARGE_BASIC
_SMALL = [("ms", _MS), ("us", _US), ("ns", _NS)]


def format_duration(delta: datetime.timedelta, extended: bool = False) -> str:
    """Format timedelta → shortest Go-duration string ("1h1m5s")."""
    total = delta.total_seconds()
    sign = "-" if total < 0 else ""
    ns = abs(total) * _SEC
    out = []
    if abs(total) < 1:
        # sub-second: single largest non-zero unit
        for unit, scale in _SMALL:
            if ns >= scale:
                out.append(f"{ns / scale:g}{unit}")
                break
        else:
            out.append("0s" if ns == 0 else f"{ns:g}ns")
    else:
        ladder = _LARGE_EXT if extended else _LARGE_BASIC
        rem = ns
        for unit, scale in ladder:
            qty = int(rem // scale)
            if qty:
                out.append(f"{qty}{unit}")
                rem -= qty * scale
        frac = rem / _SEC
        if frac:
            # leftover sub-second tail folds into seconds
            if out and out[-1].endswith("s") and not out[-1].endswith("ms"):
                qty = float(out[-1][:-1])
                out[-1] = f"{qty + frac:g}s"
            else:
                out.append(f"{frac:g}s")
    return sign + "".join(out)
