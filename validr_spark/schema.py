"""Schema tree + the three authoring syntaxes.

The logical IR of the engine is a recursive ``Schema(validator, items,
params)`` tree with three isomorphic front-ends, matching the reference
contract (guyskk/validr ``src/validr/schema.py``):

1. fluent builder   ``T.str.maxlen(16).optional``
2. element strings  ``"int.min(0).max(9)"``       (hand-written parser here —
   the reference uses pyparsing, schema.py:69-81; same grammar
   ``validator ( items )? ( .key ( value )? )*``)
3. isomorph JSON    ``{"$self": "dict.optional", "key": ["int"]}``

All of this runs on the Spark *driver* only; the compiled output is a bundle
of Catalyst Column expressions (see `validr_spark.compiler`).
"""

from __future__ import annotations

import enum as _enum
import inspect
import json
import re

from .errors import SchemaError, mark_index, mark_key

__all__ = ["Schema", "Builder", "T"]


# --------------------------------------------------------------------------
# scalar-literal helpers shared by the parser and the renderers
# --------------------------------------------------------------------------

def _render_scalar(value) -> str:
    if value is None:
        return "null"
    if value is False:
        return "false"
    if value is True:
        return "true"
    if isinstance(value, str):
        return repr(value)
    if isinstance(value, Schema):
        return value.validator
    return str(value)


def _kv(key, value) -> str:
    return f"{key}({_render_scalar(value)})"


def _param_sort_key(item):
    """Render order: values first (number < string < bool), then
    default, optional, desc last — reference schema.py:103-118."""
    k, v = item
    if k == "desc":
        return 3
    if k == "optional":
        return 2
    if k == "default":
        return 1
    if isinstance(v, bool):
        return -1
    if isinstance(v, str):
        return -2
    return -3


def _sorted_params(params):
    return sorted(params, key=_param_sort_key)


def _as_schema(obj):
    """Unwrap Builder / model classes to their Schema."""
    if hasattr(obj, "__schema__"):
        return obj.__schema__
    return obj


def _copied(obj):
    return obj.copy() if isinstance(obj, Schema) else obj


def _primitive(obj):
    return obj.to_primitive() if isinstance(obj, Schema) else obj


def _is_model_class(obj) -> bool:
    return inspect.isclass(obj) and hasattr(obj, "__schema__")


# --------------------------------------------------------------------------
# element-string parser (regex tokenizer; grammar identical to reference)
# --------------------------------------------------------------------------

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_NUMBER = r"[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"
_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<ident>{ident})
      | (?P<number>{number})
      | (?P<dq>"(?:[^"\\]|\\.)*")
      | (?P<sq>'(?:[^'\\]|\\.)*')
      | (?P<punct>[().])
    )""".format(ident=_IDENT, number=_NUMBER),
    re.VERBOSE,
)

_KEYWORD_VALUES = {"true": True, "false": False, "null": None}


class _ElementTokens:
    """Tiny cursor over the token stream of one element string."""

    def __init__(self, text: str):
        self.text = text
        self.tokens: list[tuple[str, object, int]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                raise SchemaError(
                    f"invalid syntax in col {pos + 1} of {repr(text)!r}")
            kind = m.lastgroup
            raw = m.group(kind)
            if kind == "number":
                val = float(raw) if re.search(r"[.eE]", raw) else int(raw)
            elif kind in ("dq", "sq"):
                # latin-1 + backslashreplace keeps non-ASCII intact:
                # encode() (utf-8) would feed multi-byte sequences to
                # unicode_escape's latin-1 decoder and corrupt 'café' to
                # 'cafÃ©' in match regexes / defaults; chars above U+00FF
                # round-trip via the synthesized \uXXXX escapes
                val = (raw[1:-1]
                       .encode("latin-1", "backslashreplace")
                       .decode("unicode_escape"))
            else:
                val = raw
            self.tokens.append((kind, val, m.start()))
            pos = m.end()
        self.i = 0

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self, expect_kind=None, expect_val=None):
        tok = self.peek()
        if tok is None:
            raise SchemaError(
                f"invalid syntax in col {len(self.text) + 1} of {repr(self.text)!r}")
        kind, val, start = tok
        if (expect_kind and kind != expect_kind) or (
                expect_val is not None and val != expect_val):
            raise SchemaError(
                f"invalid syntax in col {start + 1} of {repr(self.text)!r}")
        self.i += 1
        return tok

    def value(self):
        """A literal: true/false/null keyword, quoted string or number."""
        kind, val, start = self.next()
        if kind == "ident":
            if val in _KEYWORD_VALUES:
                return _KEYWORD_VALUES[val]
            raise SchemaError(
                f"invalid syntax in col {start + 1} of {repr(self.text)!r}")
        if kind in ("number", "dq", "sq"):
            return val
        raise SchemaError(
            f"invalid syntax in col {start + 1} of {repr(self.text)!r}")


def _parse_element_text(text: str) -> tuple[str, object, dict]:
    toks = _ElementTokens(text)
    _, validator, _ = toks.next("ident")
    items = None
    tok = toks.peek()
    if tok and tok[:2] == ("punct", "("):
        toks.next()
        items = toks.value()
        toks.next("punct", ")")
    params: dict = {}
    while toks.peek() is not None:
        toks.next("punct", ".")
        _, key, _ = toks.next("ident")
        value = True
        tok = toks.peek()
        if tok and tok[:2] == ("punct", "("):
            toks.next()
            value = toks.value()
            toks.next("punct", ")")
        params[key] = value
    return validator, items, params


# --------------------------------------------------------------------------
# Schema
# --------------------------------------------------------------------------

class Schema:
    """One node of the logical schema tree: (validator, items, params)."""

    def __init__(self, *, validator=None, items=None, params=None):
        self.validator = validator
        self.items = items
        self.params = params or {}

    # --- equality / hashing ------------------------------------------
    def __eq__(self, other):
        other = _as_schema(other)
        if not isinstance(other, Schema):
            return False
        return (self.validator == other.validator
                and self.items == other.items
                and self.params == other.params)

    def __hash__(self):
        items = self.items
        if isinstance(items, dict):
            items = tuple(sorted(items.items()))
        elif isinstance(items, list):
            items = tuple(items)
        return hash((self.validator, items, tuple(sorted(self.params.items()))))

    # --- rendering ----------------------------------------------------
    def __str__(self):
        return json.dumps(self.to_primitive(), indent=4,
                          ensure_ascii=False, sort_keys=True)

    def repr(self, *, prefix=True, desc=True) -> str:
        if not self.validator:
            return "T" if prefix else ""
        parts = ["T"] if prefix else []
        if self.items is None:
            parts.append(self.validator)
        elif self.validator == "dict":
            keys = ", ".join(sorted(self.items)) if self.items else ""
            parts.append(f"dict({{{keys}}})")
        elif self.validator == "list":
            parts.append(f"list({self.items.validator})")
        elif self.validator == "enum":
            vals = ", ".join(map(_render_scalar, self.items)) if self.items else ""
            parts.append(f"enum({{{vals}}})")
        elif self.validator == "union":
            if self.items and isinstance(self.items, list):
                keys = ", ".join(x.validator for x in self.items)
                parts.append(f"union([{keys}])")
            else:
                keys = ", ".join(sorted(self.items)) if self.items else ""
                parts.append(f"union({{{keys}}})")
        elif self.validator == "model" and self.items is not None:
            parts.append(f"model({self.items.__name__})")
        else:
            parts.append(_kv(self.validator, self.items))
        for k, v in _sorted_params(self.params.items()):
            if not desc and k == "desc":
                continue
            if v is False:
                continue
            parts.append(k if v is True else _kv(k, v))
        return ".".join(parts)

    def __repr__(self):
        return f"{type(self).__name__}<{self.repr(prefix=False)}>"

    # --- copy -----------------------------------------------------------
    def copy(self) -> "Schema":
        params = {k: _copied(v) for k, v in self.params.items()}
        out = type(self)(validator=self.validator, params=params)
        items = self.items
        if items is not None:
            if self.validator == "dict":
                items = {k: _copied(v) for k, v in items.items()}
            elif self.validator == "list":
                items = _copied(items)
            elif self.validator == "union":
                if isinstance(items, list):
                    items = [_copied(x) for x in items]
                else:
                    items = {k: _copied(v) for k, v in items.items()}
            elif isinstance(items, (list, dict)):
                items = type(items)(items)
        out.items = items
        return out

    __copy__ = copy

    def __deepcopy__(self, memo):
        return self.copy()

    # --- serialization ---------------------------------------------------
    def to_primitive(self):
        if not self.validator:
            return None
        node = self
        if node.validator == "model":
            # JSON form has no model notion; degrade to dict
            items = None if node.items is None else _as_schema(node.items).items
            node = Schema(validator="dict", items=items, params=node.params)
        parts = []
        if node.validator in {"dict", "list", "union", "enum"} or node.items is None:
            parts.append(node.validator)
        else:
            parts.append(_kv(node.validator, node.items))
        for k, v in _sorted_params(node.params.items()):
            if node.validator == "dict" and k in {"key", "value"}:
                continue
            if v is False:
                continue
            parts.append(k if v is True else _kv(k, v))
        element = ".".join(parts)
        if node.validator == "dict":
            out = {"$self": element}
            for pkey in ("key", "value"):
                pvalue = node.params.get(pkey)
                if pvalue is not None:
                    out[f"$self_{pkey}"] = _primitive(pvalue)
            if node.items is not None:
                for k, v in node.items.items():
                    out[k] = _primitive(v)
            return out
        if node.validator == "list" and node.items is not None:
            return [element, _primitive(node.items)]
        if node.validator == "enum" and node.items is not None:
            return [element, *node.items]
        if node.validator == "union" and node.items is not None:
            if isinstance(node.items, list):
                return [element, *(_primitive(x) for x in node.items)]
            out = {"$self": element}
            for k, v in node.items.items():
                out[k] = _primitive(v)
            return out
        return element

    # --- parsers ----------------------------------------------------------
    @classmethod
    def parse_element(cls, text) -> "Schema":
        if text is None:
            raise SchemaError("can't parse None")
        text = text.strip()
        if not text:
            raise SchemaError("can't parse empty string")
        validator, items, params = _parse_element_text(text)
        return cls(validator=validator, items=items, params=params)

    @classmethod
    def parse_isomorph_schema(cls, obj) -> "Schema":
        if isinstance(obj, str):
            return cls.parse_element(obj)
        if isinstance(obj, dict):
            obj = dict(obj)
            head = cls.parse_element(obj.pop("$self", "dict"))
            items = {}
            for k, v in obj.items():
                with mark_key(k):
                    items[k] = cls.parse_isomorph_schema(v)
            for pkey in ("key", "value"):
                pvalue = items.pop(f"$self_{pkey}", None)
                if pvalue is not None:
                    head.params[pkey] = pvalue
            return cls(validator=head.validator, items=items, params=head.params)
        if isinstance(obj, list):
            if len(obj) == 1:
                return cls(validator="list",
                           items=cls.parse_isomorph_schema(obj[0]))
            if len(obj) >= 2:
                head = cls.parse_element(obj[0])
                if head.validator == "list":
                    if len(obj) > 2:
                        raise SchemaError("invalid list schema")
                    with mark_index():
                        items = cls.parse_isomorph_schema(obj[1])
                elif head.validator == "enum":
                    items = list(obj[1:])
                elif head.validator == "union":
                    items = []
                    for i, x in enumerate(obj[1:]):
                        with mark_index(i):
                            items.append(cls.parse_isomorph_schema(x))
                else:
                    raise SchemaError(f"unknown {head.validator} schema")
                return cls(validator=head.validator, items=items,
                           params=head.params)
            raise SchemaError("invalid list schema")
        raise SchemaError(f"{type(obj)} object is not schema")


# --------------------------------------------------------------------------
# Builder — the fluent `T` front-end (immutable state machine)
# --------------------------------------------------------------------------

_ST_INIT = "init"
_ST_ATTR = "expect-attr"
_ST_ATTR_OR_ITEMS = "expect-attr-or-items"
_ST_ATTR_OR_CALL = "expect-attr-or-call"


class Builder:
    """Immutable fluent schema builder; ``T`` is the empty instance.

    ``T.<validator>`` starts a node; a following call supplies items
    (for container/enum/union nodes) or nothing; ``.param`` sets a flag,
    ``.param(v)`` sets a value; ``T[keys]`` slices a dict schema;
    ``T(obj)`` loads any schema-like object.

    Attribution: this class closely follows the reference Builder's
    four-state machine design and its exact error strings
    (guyskk/validr src/validr/schema.py:373-469) — the observable DSL
    behavior, including SchemaError messages, is contract: the test
    goldens and the differential oracle assert them verbatim.
    """

    def __init__(self, state=_ST_INIT, *, validator=None, items=None,
                 params=None, pending=None):
        self._state = state
        self._schema = Schema(validator=validator, items=items, params=params)
        self._pending = pending  # name of the param awaiting a call value

    @property
    def __schema__(self) -> Schema:
        return self._schema

    def __repr__(self):
        return self._schema.repr()

    def __str__(self):
        return self._schema.__str__()

    def __eq__(self, other):
        return self._schema == _as_schema(other)

    def __hash__(self):
        return self._schema.__hash__()

    # --- dict slicing ---------------------------------------------------
    def __getitem__(self, keys):
        if not self._schema.validator:
            raise ValueError("can not slice empty schema")
        if self._schema.validator != "dict":
            raise ValueError("can not slice non-dict schema")
        if not isinstance(keys, (list, tuple)):
            keys = (keys,)
        sliced = Schema(validator="dict", params=self._schema.params.copy())
        sliced.items = {}
        have = self._schema.items or {}
        for k in keys:
            if k not in have:
                raise ValueError(f"key {k!r} is not exists")
            sliced.items[k] = have[k]
        return T(sliced)

    # --- attribute chaining ----------------------------------------------
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(
                f"{type(self).__name__!r} object has no attribute {name!r}")
        if self._state == _ST_INIT:
            return Builder(_ST_ATTR_OR_ITEMS, validator=name)
        params = self._schema.params.copy()
        params[name] = True
        return Builder(_ST_ATTR_OR_CALL, validator=self._schema.validator,
                       items=self._schema.items, params=params, pending=name)

    # --- calls -----------------------------------------------------------
    def __call__(self, *args, **kwargs):
        if self._state == _ST_INIT:
            return self._load(*args, **kwargs)
        if self._state not in (_ST_ATTR_OR_ITEMS, _ST_ATTR_OR_CALL):
            raise SchemaError("current state not callable")
        if self._state == _ST_ATTR_OR_ITEMS:
            items = self._items_from_call(args, kwargs)
            params = self._schema.params
        else:
            if kwargs:
                raise SchemaError("can't call with keyword argument")
            if not args:
                raise SchemaError("require one positional argument")
            if len(args) > 1:
                raise SchemaError(
                    "can't call with more than one positional argument")
            value = self._check_param(self._pending, args[0])
            items = self._schema.items
            params = self._schema.params.copy()
            params[self._pending] = value
        return Builder(_ST_ATTR, validator=self._schema.validator,
                       items=items, params=params)

    # --- loading arbitrary schema-like objects -----------------------------
    def _load(self, obj):
        obj = _as_schema(obj)
        if isinstance(obj, Schema):
            obj = obj.copy()
        elif isinstance(obj, (str, list, dict)):
            obj = Schema.parse_isomorph_schema(obj)
        else:
            raise SchemaError(f"{type(obj)} object is not schema")
        if not obj.validator:
            state = _ST_INIT
        elif not obj.items and not obj.params:
            state = _ST_ATTR_OR_ITEMS
        else:
            state = _ST_ATTR
        return Builder(state, validator=obj.validator, items=obj.items,
                       params=obj.params)

    # --- item / param checking --------------------------------------------
    def _items_from_call(self, args, kwargs):
        v = self._schema.validator
        if args and kwargs:
            raise SchemaError(
                "can't call with both positional argument and keyword argument")
        if len(args) > 1:
            raise SchemaError(
                "can't call with more than one positional argument")
        if v in {"dict", "union"}:
            items = args[0] if args else kwargs
        elif v == "model":
            if len(args) != 1 or kwargs:
                raise SchemaError("require exactly one positional argument")
            items = args[0]
        else:
            if kwargs:
                raise SchemaError("can't call with keyword argument")
            if not args:
                raise SchemaError("require one positional argument")
            items = args[0]
        return self._check_items(items)

    def _check_dict_items(self, items):
        if not isinstance(items, dict):
            raise SchemaError("items must be dict")
        out = {}
        for k, v in items.items():
            v = _as_schema(v)
            if not isinstance(v, Schema):
                raise SchemaError(f"items[{k}] is not schema")
            out[k] = v
        return out

    def _check_items(self, items):
        v = self._schema.validator
        if v == "dict":
            return self._check_dict_items(items)
        if v == "list":
            items = _as_schema(items)
            if not isinstance(items, Schema):
                raise SchemaError("items is not schema")
            return items
        if v == "enum":
            if isinstance(items, str):
                items = set(items.replace(",", " ").strip().split())
            if inspect.isclass(items) and issubclass(items, _enum.Enum):
                items = [x.value for x in items.__members__.values()]
            if not isinstance(items, (list, tuple, set)):
                raise SchemaError("items is not list or set")
            for x in items:
                if not isinstance(x, (bool, int, float, str)):
                    raise SchemaError("enum value must be bool, int, float or str")
            return sorted(set(items), key=lambda x: (str(type(x)), str(x)))
        if v == "union":
            if isinstance(items, list):
                out = []
                for i, x in enumerate(items):
                    x = _as_schema(x)
                    if not isinstance(x, Schema):
                        raise SchemaError(f"items[{i}] is not schema")
                    out.append(x)
                return out
            return self._check_dict_items(items)
        if v == "model":
            if not _is_model_class(items):
                raise SchemaError("items must be model class")
            return items
        if not isinstance(items, (bool, int, float, str)):
            raise SchemaError("items must be bool, int, float or str")
        return items

    def _check_param(self, key, value):
        if self._schema.validator == "dict" and key in {"key", "value"}:
            value = _as_schema(value)
            if value is not None and not isinstance(value, Schema):
                raise SchemaError(f"dict {key} parameter is not schema")
            return value
        if value is not None and not isinstance(value, (bool, int, float, str)):
            raise SchemaError("parameter value must be bool, int, float or str")
        return value


T = Builder()
