"""Schema-evolution diff: what changed between two validr schemas, and is
it safe?

At 10^12-row scale the question "do I have to re-validate everything?" is
a budget decision.  The manifest layer (plans/manifest.py) already makes
rule changes *detectable* (a new lineage hash invalidates checkpoints);
this module makes them *explainable and classifiable*, per path:

* ``widening``   — the new rule accepts a superset (min lowered, enum
  value added, ``optional`` added): previously-valid data is still valid,
  no re-validation required;
* ``narrowing``  — accepts a subset (min raised, maxlen lowered, enum
  value removed, required key added): previously-passing rows may now
  fail → re-validate;
* ``behavioral`` — same accept-set but different OUTPUTS (default value
  changed, ``strip``/``escape`` toggled, a dict key removed — extra keys
  are dropped by validr, so inputs still validate, but the output loses a
  field) → re-run to refresh outputs;
* ``breaking``   — validator/type changed, or a change whose direction is
  undecidable (``match`` regex replaced) → treat as a new schema;
* ``info``       — ``desc`` only.

The directionality table mirrors the reference's parameter semantics
(`/root/reference/src/validr/_validator_c.pyx:269-320` accept/output
contract; min/max at pyx:763-785, minlen/maxlen at pyx:859-907, optional/
default/invalid_to at pyx:381-421).  Purely driver-side tree walk — no
Spark session needed.
"""

from __future__ import annotations

from .schema import Schema

__all__ = ["schema_diff", "diff_verdict", "needs_revalidation",
           "SEVERITY_ORDER"]

SEVERITY_ORDER = ["info", "widening", "behavioral", "narrowing", "breaking"]

# params where a HIGHER value accepts less (tighter)
_TIGHTER_UP = {"min", "minlen", "exmin"}
# params where a LOWER value accepts less
_TIGHTER_DOWN = {"max", "maxlen", "exmax"}
# boolean params whose True accepts MORE
_WIDER_TRUE = {"optional", "invalid_to_default"}
# boolean params whose True accepts LESS
_TIGHTER_TRUE = {"unique"}
# output-shaping params: accept-set unchanged, coerced outputs differ
# (default/invalid_to/by have dedicated handling below)
_BEHAVIORAL = {"strip", "escape", "slim", "object", "fmt", "format"}


def _as_schema(s) -> Schema:
    if isinstance(s, Schema):
        return s
    sch = getattr(s, "__schema__", None)
    if isinstance(sch, Schema):
        return sch
    if isinstance(s, str):
        return Schema.parse_element(s)
    if isinstance(s, (dict, list)):
        return Schema.parse_isomorph_schema(s)
    raise TypeError(f"not a schema: {s!r}")


def _entry(path, kind, old, new, severity):
    return {"path": path or "$", "kind": kind, "old": old, "new": new,
            "severity": severity}


def _param_severity(name, old, new):
    """Classify one param's old→new move."""
    if name == "desc":
        return "info"
    if name in _BEHAVIORAL:
        return "behavioral"
    if name == "match":
        if old is None:
            return "narrowing"       # regex added: accepts less
        if new is None:
            return "widening"
        return "breaking"             # regex replaced: direction unknown
    if name == "default":
        # adding a default makes null inputs pass (and changes outputs);
        # removing one makes them fail again (unless optional, where it
        # is an output change — approximated as narrowing to stay safe)
        if old is None:
            return "widening"
        if new is None:
            return "narrowing"
        return "behavioral"           # value changed: outputs differ
    if name == "invalid_to":
        if old is None:
            return "widening"         # invalid inputs now substituted
        if new is None:
            return "narrowing"
        return "behavioral"
    if name in _TIGHTER_UP or name in _TIGHTER_DOWN:
        # adding an explicit bound tightens vs the validator's (looser)
        # default envelope; removing it returns to that default
        if old is None:
            return "narrowing"
        if new is None:
            return "widening"
        numeric = (isinstance(old, (int, float))
                   and isinstance(new, (int, float))
                   and not isinstance(old, bool)
                   and not isinstance(new, bool))
        if not numeric:
            return "breaking"     # e.g. duration-string bounds: unknowable
        if name in _TIGHTER_UP:
            return "narrowing" if new > old else "widening"
        return "narrowing" if new < old else "widening"
    if name in _WIDER_TRUE:
        return "widening" if bool(new) and not bool(old) else "narrowing"
    if name in _TIGHTER_TRUE:
        return "narrowing" if bool(new) and not bool(old) else "widening"
    return "breaking"                 # unknown param: direction unknown


def _diff_params(path, old: dict, new: dict, out: list):
    for k in sorted(set(old) | set(new)):
        ov, nv = old.get(k), new.get(k)
        if ov == nv:
            continue
        sev = _param_severity(k, ov, nv)
        if ov is None:
            kind = "param_added"
        elif nv is None:
            kind = "param_removed"
        else:
            kind = "param_changed"
        out.append(_entry(f"{path}.{k}" if path else k, kind, ov, nv, sev))


def _items_schema(node: Schema):
    """Model items are a class carrying __schema__ (a dict-validator
    Schema); unwrap to that schema's FIELD MAP so the dict/model branch
    can iterate it — returning the Schema itself would crash the field
    walk (`set(Schema)` is not iterable)."""
    it = node.items
    sch = getattr(it, "__schema__", None)
    if isinstance(sch, Schema):
        return sch.items
    return it


def _diff_node(path, old: Schema, new: Schema, out: list):
    if old.validator != new.validator:
        out.append(_entry(path, "validator_changed", old.validator,
                          new.validator, "breaking"))
        return
    v = old.validator
    op, np_ = dict(old.params), dict(new.params)
    if v == "dict":
        # map-schema key/value params hold SCHEMAS, not scalars: recurse
        # like any other child node instead of letting _diff_params embed
        # raw Schema objects (unserializable) and stamp every change
        # 'breaking' regardless of direction
        for pname in ("key", "value"):
            os_, ns_ = op.pop(pname, None), np_.pop(pname, None)
            if os_ is None and ns_ is None:
                continue
            sub = f"{path}.$self_{pname}" if path else f"$self_{pname}"
            if os_ is None:
                out.append(_entry(sub, "param_added", None,
                                  _as_schema(ns_).repr(), "narrowing"))
            elif ns_ is None:
                out.append(_entry(sub, "param_removed",
                                  _as_schema(os_).repr(), None, "widening"))
            else:
                _diff_node(sub, _as_schema(os_), _as_schema(ns_), out)
    _diff_params(path, op, np_, out)
    oi, ni = _items_schema(old), _items_schema(new)
    if v in ("dict", "model") or (v == "union" and isinstance(oi, dict)
                                  and isinstance(ni, dict)):
        oi, ni = oi or {}, ni or {}
        for k in sorted(set(oi) | set(ni)):
            sub = f"{path}.{k}" if path else k
            if k not in oi:
                child = _as_schema(ni[k])
                if v == "union":
                    sev = "widening"        # a new accepted shape
                elif (child.params.get("optional")
                      or "default" in child.params):
                    # inputs still validate, but every OUTPUT row gains
                    # the field (filled with default/null) — by this
                    # module's taxonomy an output-shape change is
                    # behavioral → re-run, mirroring field_removed
                    sev = "behavioral"
                else:
                    sev = "narrowing"       # required key added
                out.append(_entry(
                    sub, "field_added", None, child.repr(), sev))
            elif k not in ni:
                # validr drops extra input keys: inputs still validate,
                # the OUTPUT loses the field (union: an accepted shape
                # disappears → narrowing)
                out.append(_entry(sub, "field_removed",
                                  _as_schema(oi[k]).repr(), None,
                                  "narrowing" if v == "union"
                                  else "behavioral"))
            else:
                _diff_node(sub, _as_schema(oi[k]), _as_schema(ni[k]), out)
    elif v == "list":
        sub = f"{path}[]"
        if oi is None and ni is not None:
            # bare 'list' accepted ANY element; an item schema narrows
            out.append(_entry(sub, "items_added", None,
                              _as_schema(ni).repr(), "narrowing"))
        elif oi is not None and ni is None:
            out.append(_entry(sub, "items_removed",
                              _as_schema(oi).repr(), None, "widening"))
        elif oi is not None and ni is not None:
            _diff_node(sub, _as_schema(oi), _as_schema(ni), out)
    elif v == "enum":
        ov, nv = set(oi or []), set(ni or [])
        if nv - ov:
            out.append(_entry(path, "enum_values_added", None,
                              sorted(nv - ov, key=repr), "widening"))
        if ov - nv:
            out.append(_entry(path, "enum_values_removed",
                              sorted(ov - nv, key=repr), None, "narrowing"))
    elif v == "union" and isinstance(oi, list) and isinstance(ni, list):
        om = {_as_schema(x).validator: _as_schema(x) for x in oi}
        nm = {_as_schema(x).validator: _as_schema(x) for x in ni}
        for k in sorted(set(om) | set(nm)):
            sub = f"{path}@{k}" if path else f"@{k}"
            if k not in om:
                out.append(_entry(sub, "union_alternative_added", None,
                                  nm[k].repr(), "widening"))
            elif k not in nm:
                out.append(_entry(sub, "union_alternative_removed",
                                  om[k].repr(), None, "narrowing"))
            else:
                _diff_node(sub, om[k], nm[k], out)
    elif oi != ni:
        out.append(_entry(path, "items_changed", repr(oi), repr(ni),
                          "breaking"))


def schema_diff(old, new) -> list[dict]:
    """Path-level diff between two schemas (Builder / Schema / element
    string / isomorph dict / modelclass all accepted).  Each entry:
    ``{path, kind, old, new, severity}`` with severity ∈
    ``SEVERITY_ORDER``.  Empty list = identical."""
    out: list[dict] = []
    _diff_node("", _as_schema(old), _as_schema(new), out)
    return out


def diff_verdict(entries: list[dict]) -> str:
    """Collapse a diff to one action word: ``identical`` /
    ``compatible`` (info+widening only: old-valid data stays valid) /
    ``outputs_changed`` (re-run to refresh outputs) / ``narrowed``
    (previously-passing rows may fail: re-validate) / ``breaking``."""
    if not entries:
        return "identical"
    worst = max(SEVERITY_ORDER.index(e["severity"]) for e in entries)
    return {"info": "compatible", "widening": "compatible",
            "behavioral": "outputs_changed", "narrowing": "narrowed",
            "breaking": "breaking"}[SEVERITY_ORDER[worst]]


def needs_revalidation(old, new) -> bool:
    """True when a manifest checkpointed under ``old`` cannot be trusted
    for ``new`` — the decision the lineage hash makes bluntly (any change
    → re-run); this is the surgical version for widening-only edits."""
    return diff_verdict(schema_diff(old, new)) not in (
        "identical", "compatible")
