"""Error model: Invalid / SchemaError / ModelInvalid with position marks.

Reproduces the observable error contract of the reference engine
(guyskk/validr `src/validr/_validator_c.pyx:42-193`): every error carries a
stack of (is_key, index_or_key) *marks* appended while the error unwinds
outward, rendered into a dotted/bracketed *position* string such as
``key[0].name`` or ``[][0].key``; `Invalid.__str__` appends the offending
value shortened to 75 chars.

This module is pure driver-side Python. The distributed engine surfaces the
same (rule_id, position, message, value) tuple as columns of the violations
DataFrame instead of raising — see `validr_spark.compiler`.
"""

from __future__ import annotations

_UNSET = object()

#: max characters of an offending value kept in messages / violation rows
VALUE_CLIP = 75


def clip_text(text: str, limit: int = VALUE_CLIP) -> str:
    """Shorten text to ``limit`` chars, appending '..' (pyx:20-23 contract)."""
    if len(text) > limit:
        return text[:limit] + ".."
    return text


def render_value(value) -> str:
    """Stringify an offending value the way error messages expect."""
    if isinstance(value, str):
        return repr(clip_text(value))
    return clip_text(str(value))


class ValidrError(ValueError):
    """Base error; carries marks + optional offending value."""

    def __init__(self, *args, value=_UNSET, **kwargs):
        super().__init__(*args, **kwargs)
        self._value = value
        self.marks: list[tuple[bool, object]] = []

    # --- mark stack -------------------------------------------------
    def mark_index(self, index: int = -1) -> "ValidrError":
        self.marks.append((False, index))
        return self

    def mark_key(self, key: str) -> "ValidrError":
        self.marks.append((True, key))
        return self

    # --- value ------------------------------------------------------
    @property
    def has_value(self) -> bool:
        return self._value is not _UNSET

    def set_value(self, value) -> None:
        """Attach offending value, first writer wins."""
        if self._value is _UNSET:
            self._value = value

    @property
    def value(self):
        return None if self._value is _UNSET else self._value

    # --- rendering ----------------------------------------------------
    @property
    def field(self):
        """Outermost mark (usually the top-level field name)."""
        if not self.marks:
            return None
        return self.marks[-1][1]

    @property
    def position(self) -> str:
        """Render marks outermost-first: keys as ``.key``, indexes as
        ``[i]`` (or ``[]`` when the index is unknown)."""
        out = ""
        for is_key, mark in reversed(self.marks):
            if is_key:
                out = f"{out}.{mark}"
            elif mark == -1:
                out = f"{out}[]"
            else:
                out = f"{out}[{mark:d}]"
        return out[1:] if out.startswith(".") else out

    @property
    def message(self):
        return self.args[0] if self.args else None

    def _render(self, value_clause: str | None = None) -> str:
        msg = str(self.args[0]) if self.args else "invalid"
        if self.position:
            msg = f"{self.position}: {msg}"
        if value_clause:
            msg = f"{msg}, {value_clause}"
        return msg

    def __str__(self) -> str:
        return self._render()


class Invalid(ValidrError):
    """A value failed validation."""

    def __str__(self) -> str:
        clause = f"value={render_value(self.value)}" if self.has_value else None
        return self._render(clause)


class ModelInvalid(Invalid):
    """Aggregate of all per-field errors of a model (collect-all)."""

    def __init__(self, errors):
        if not errors:
            raise ValueError("errors is required")
        self.errors = errors
        head = errors[0].message or "invalid"
        super().__init__(f"{head} ...total {len(errors)} errors")

    def __str__(self) -> str:
        return "; ".join(f"{ex.position} {ex.message}" for ex in self.errors)


class SchemaError(ValidrError):
    """The schema itself is malformed."""

    def __str__(self) -> str:
        clause = None
        if self.has_value:
            clause = f"schema={self.value.repr(prefix=False, desc=False)}"
        return self._render(clause)


class mark_index:
    """Context manager: annotate escaping ValidrError with a list index."""

    def __init__(self, index: int = -1):
        self.index = index

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is not None and issubclass(exc_type, ValidrError):
            exc_val.mark_index(self.index)


class mark_key:
    """Context manager: annotate escaping ValidrError with a dict key."""

    def __init__(self, key: str):
        self.key = key

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is not None and issubclass(exc_type, ValidrError):
            exc_val.mark_key(self.key)
