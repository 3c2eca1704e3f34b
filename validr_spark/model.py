"""Model-class layer: schema-validated record classes.

Behavioral contract from the reference (guyskk/validr):

* ``@modelclass`` collects ``Schema``-valued class attributes over the
  reversed MRO (subclasses override/extend base fields), compiles each into
  a validating ``Field`` descriptor at class-definition time, and
  synthesizes ``__schema__`` (a dict schema) and ``__fields__``
  (reference ``src/validr/model.py:42-85``).
* ``Model(obj)`` / ``Model(**params)`` validates every field and collects
  **all** errors — including ``undesired key`` for unknown kwargs — into one
  ``ModelInvalid`` (reference ``_validator_c.pyx:1320-1355``).
* ``Field.__set__`` re-validates on attribute assignment under
  ``mark_key(name)`` so error positions are field-prefixed
  (reference ``_validator_c.pyx:1281-1306``).
* ``immutable=True`` freezes instances after ``__init__``/``__post_init__``
  (reference ``src/validr/model.py:105-117``).
* ``asdict``/``fields`` helpers and recursive ``__asdict__`` serialization
  (reference ``src/validr/model.py:154-173``, ``_validator_c.pyx:1309-1317``).

In the Spark engine a model class is also a schema source: its
``__schema__`` feeds :class:`validr_spark.compiler.SparkCompiler` directly,
so ``SparkCompiler().compile(MyModel)`` validates a DataFrame whose columns
are the model fields — the distributed analogue of constructing one model
instance per row (every field error lands in the violations table, matching
ModelInvalid's collect-all semantics).
"""

from __future__ import annotations

from .errors import Invalid, ModelInvalid, mark_key
from .pyvalidate import Compiler, _is_mapping
from .schema import Builder, Schema, T


class ImmutableInstanceError(AttributeError):
    """Attempt to mutate an instance of an immutable model class."""


class Field:
    """Validating data descriptor for one model field."""

    def __init__(self, name: str, schema: Schema, compiler: Compiler):
        self.name = name
        self.__schema__ = schema
        with mark_key(name):  # SchemaError positions get the field prefix
            self.validate = compiler.compile(schema)

    def __repr__(self):
        return f"Field(name={self.name!r}, schema={self.__schema__!r})"

    def __get__(self, obj, obj_type=None):
        if obj is None:
            return self
        return obj.__dict__.get(self.name, None)

    def __set__(self, obj, value):
        with mark_key(self.name):
            value = self.validate(value)
        obj.__dict__[self.name] = value


def _schemas_of(cls) -> dict[str, Schema]:
    out = {}
    for k, v in vars(cls).items():
        if k == "__schema__":
            continue
        if hasattr(v, "__schema__"):  # Builder / nested model class
            v = v.__schema__
        if isinstance(v, Schema):
            out[k] = v
    return out


def _value_asdict(value):
    if hasattr(value, "__asdict__"):
        return value.__asdict__()
    if _is_mapping(value):
        return {k: _value_asdict(v) for k, v in value.items()}
    if isinstance(value, (list, tuple, set)):
        return [_value_asdict(x) for x in value]
    return value


def modelclass(cls=None, *, compiler: Compiler | None = None,
               immutable: bool = False):
    """Class decorator: turn schema-annotated attributes into a validating
    record class.  Usable bare (``@modelclass``) or with options."""
    if cls is not None:
        return _build_model(cls, compiler, immutable)

    def decorate(c):
        return _build_model(c, compiler, immutable)

    return decorate


def _build_model(user_cls, compiler, immutable):
    compiler = compiler or Compiler()

    class ModelMeta(type):
        def __init__(cls, *args, **kwargs):
            super().__init__(*args, **kwargs)
            schemas: dict[str, Schema] = {}
            post_inits = []
            for klass in reversed(cls.__mro__):
                f = vars(klass).get("__post_init__")
                if callable(f):
                    post_inits.append(f)
                schemas.update(_schemas_of(klass))
            for name, schema in schemas.items():
                setattr(cls, name, Field(name, schema, compiler))
            cls._post_inits = post_inits
            cls.__schema__ = T.dict(schemas).__schema__
            cls.__fields__ = frozenset(schemas)

        def post_init(cls, instance):
            for f in cls._post_inits:
                f(instance)

        def __repr__(cls):
            # __schema__.items preserves declaration order
            return "{}<{}>".format(cls.__name__,
                                   ", ".join(cls.__schema__.items))

        def __getitem__(cls, keys):
            items = cls.__schema__.items or {}
            if not isinstance(keys, (list, tuple, set, frozenset)):
                if keys not in items:
                    raise KeyError(f"key {keys!r} is not exists")
                return items[keys]
            sub = Schema(validator=cls.__schema__.validator,
                         params=dict(cls.__schema__.params))
            sub.items = {}
            for k in keys:
                if k not in items:
                    raise KeyError(f"key {k!r} is not exists")
                sub.items[k] = items[k]
            return T(sub)

    class Model(user_cls, metaclass=ModelMeta):

        if "__init__" not in vars(user_cls):

            def __init__(self, *obj, **params):
                self.__dict__["__immutable__"] = False
                _model_init(self, obj, params)
                type(self).post_init(self)
                self.__dict__["__immutable__"] = immutable

        else:

            def __init__(self, *args, **kwargs):
                self.__dict__["__immutable__"] = False
                super().__init__(*args, **kwargs)
                type(self).post_init(self)
                self.__dict__["__immutable__"] = immutable

        if immutable:

            def __setattr__(self, name, value):
                if self.__immutable__:
                    raise ImmutableInstanceError(
                        f"{type(self).__name__} object is immutable!")
                object.__setattr__(self, name, value)

            def __delattr__(self, name):
                if self.__immutable__:
                    raise ImmutableInstanceError(
                        f"{type(self).__name__} object is immutable!")
                object.__delattr__(self, name)

        if "__repr__" not in vars(user_cls):

            def __repr__(self):
                kv = ", ".join(f"{k}={getattr(self, k)!r}"
                               for k in self.__schema__.items)
                return f"{type(self).__name__}({kv})"

        if "__eq__" not in vars(user_cls):

            def __eq__(self, other):
                other_fields = getattr(other, "__fields__", None)
                if not other_fields or self.__fields__ != other_fields:
                    return False
                return all(getattr(self, k, None) == getattr(other, k, None)
                           for k in self.__fields__)

            __hash__ = None

        def __asdict__(self, *, keys=None):
            use = (self.__fields__ if not keys
                   else set(keys) & self.__fields__)
            out = {}
            for k in use:
                v = getattr(self, k)
                out[k] = _value_asdict(v) if v is not None else None
            return out

    Model.__module__ = user_cls.__module__
    Model.__name__ = user_cls.__name__
    Model.__qualname__ = user_cls.__qualname__
    Model.__doc__ = user_cls.__doc__
    return Model


def _model_init(self, obj, params):
    """Validate every field, collecting ALL errors (not fail-fast) into one
    ModelInvalid — the semantics the Spark violations table mirrors."""
    errors: list[Invalid] = []
    param_keys = set(params)
    if obj:
        if len(obj) > 1:
            raise TypeError("__init__() takes 2 positional arguments "
                            f"but {len(obj) + 1} were given")
        src = obj[0]
        if _is_mapping(src):
            def getter(o, k):
                return o.get(k, None)
        else:
            def getter(o, k):
                return getattr(o, k, None)
        for k in self.__fields__ - param_keys:
            try:
                setattr(self, k, getter(src, k))
            except Invalid as ex:
                errors.append(ex)
    else:
        for k in self.__fields__ - param_keys:
            try:
                setattr(self, k, None)
            except Invalid as ex:
                errors.append(ex)
    for k in self.__fields__ & param_keys:
        try:
            setattr(self, k, params[k])
        except Invalid as ex:
            errors.append(ex)
    for k in param_keys - self.__fields__:
        errors.append(Invalid("undesired key").mark_key(k))
    if errors:
        raise ModelInvalid(errors)


def fields(m) -> set:
    """Field-name set of a model class/instance or a dict schema."""
    if hasattr(m, "__fields__"):
        return set(m.__fields__)
    schema = m.__schema__ if hasattr(m, "__schema__") else m
    if isinstance(schema, Schema) and schema.validator == "dict":
        return set(schema.items.keys()) if schema.items else set()
    raise TypeError(f"can not find fields of {m!r}")


def asdict(m, *, keys=None) -> dict:
    """Serialize a model instance (recursively) to a plain dict."""
    return m.__asdict__(keys=keys)


__all__ = ["modelclass", "fields", "asdict", "Field",
           "ImmutableInstanceError"]
