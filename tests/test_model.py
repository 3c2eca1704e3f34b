"""Model-class layer (reference behavior: tests/test_model.py,
src/validr/model.py, _validator_c.pyx:1281-1355)."""

import pytest

from validr_spark import Invalid, ModelInvalid, T, asdict, fields, modelclass
from validr_spark.model import ImmutableInstanceError
from validr_spark.pyvalidate import Compiler


@modelclass
class User:
    userid = T.int.min(0).max(9)
    name = T.str.maxlen(16).optional


def test_init_from_kwargs():
    u = User(userid="3", name="kk")
    assert u.userid == 3          # coerced str -> int
    assert u.name == "kk"


def test_init_from_mapping_and_object():
    u = User({"userid": 5, "name": "a"})
    assert u.userid == 5
    v = User(u)                   # object-attr getter path
    assert v.userid == 5 and v.name == "a"


def test_optional_field_null_output():
    u = User(userid=1)
    assert u.name == ""           # str optional null-output is ''


def test_collect_all_errors_and_undesired_key():
    with pytest.raises(ModelInvalid) as exc:
        User(userid=100, name="x" * 20, bogus=1)
    errors = exc.value.errors
    assert len(errors) == 3
    positions = sorted(e.position for e in errors)
    assert positions == ["bogus", "name", "userid"]
    by_pos = {e.position: e for e in errors}
    assert by_pos["bogus"].message == "undesired key"
    assert "...total 3 errors" in exc.value.message


def test_missing_required_field():
    with pytest.raises(ModelInvalid) as exc:
        User(name="a")
    assert exc.value.errors[0].position == "userid"
    assert exc.value.errors[0].message == "required"


def test_field_set_revalidates():
    u = User(userid=1)
    u.userid = "7"
    assert u.userid == 7
    with pytest.raises(Invalid) as exc:
        u.userid = 50
    assert exc.value.position == "userid"


def test_inheritance_merges_and_overrides():
    @modelclass
    class Base:
        a = T.int
        b = T.int

    class Sub(Base):       # subclasses inherit the metaclass: no re-decorate
        b = T.str          # override type
        c = T.int.optional

    assert fields(Sub) == {"a", "b", "c"}
    s = Sub(a=1, b=2)
    assert s.b == "2"      # str override wins


def test_post_init_chain():
    @modelclass
    class Base:
        x = T.int

        def __post_init__(self):
            self.doubled = self.x * 2

    class Sub(Base):
        def __post_init__(self):
            self.quad = self.doubled * 2

    s = Sub(x=3)
    assert s.doubled == 6 and s.quad == 12


def test_custom_init_still_validates_on_set():
    @modelclass
    class M:
        v = T.int.min(0)

        def __init__(self, raw):
            self.v = raw * 2

    assert M(4).v == 8
    with pytest.raises(Invalid):
        M(-4)


def test_immutable():
    @modelclass(immutable=True)
    class Frozen:
        v = T.int

    f = Frozen(v=1)
    with pytest.raises(ImmutableInstanceError):
        f.v = 2
    with pytest.raises(ImmutableInstanceError):
        del f.v


def test_class_getitem_slice():
    sub = User["userid"]
    assert sub.validator == "int"
    sliced = User[["userid"]]
    schema = sliced.__schema__
    assert schema.validator == "dict"
    assert set(schema.items) == {"userid"}
    with pytest.raises(KeyError):
        User["nope"]
    with pytest.raises(KeyError):
        User[["userid", "nope"]]


def test_asdict_and_keys():
    u = User(userid=2, name="n")
    assert asdict(u) == {"userid": 2, "name": "n"}
    assert asdict(u, keys=["userid"]) == {"userid": 2}


def test_asdict_recursive_nested_model():
    @modelclass
    class Outer:
        user = T.model(User)
        tags = T.list(T.int).optional

    o = Outer(user={"userid": 1, "name": "k"}, tags=[1, 2])
    d = asdict(o)
    assert d["user"] == {"userid": 1, "name": "k"}
    assert d["tags"] == [1, 2]


def test_eq_and_repr():
    assert User(userid=1, name="a") == User(userid=1, name="a")
    assert User(userid=1, name="a") != User(userid=2, name="a")
    assert repr(User) == "User<userid, name>"
    assert repr(User(userid=1, name="a")) == "User(userid=1, name='a')"


def test_model_as_schema_in_compiler():
    validate = Compiler().compile(T.model(User))
    m = validate({"userid": 3, "name": "z"})
    assert isinstance(m, User) and m.userid == 3


def test_fields_helpers():
    assert fields(User) == {"userid", "name"}
    assert fields(T.dict(a=T.int)) == {"a"}
    with pytest.raises(TypeError):
        fields(T.int)


def test_spark_compiler_accepts_model(spark):
    from validr_spark.compiler import SparkCompiler

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(3, "ok"), (42, "too big id"), (5, "x" * 20)],
        "userid int, name string").withColumn("_id", F.col("userid"))
    plan = SparkCompiler().compile(User)
    viols = plan.apply(df, id_cols=["_id"]).violations()
    rows = {(r["rule_id"], r["_id"]) for r in viols.collect()}
    assert ("userid.max", 42) in rows
    assert ("name.maxlen", 5) in rows
    assert len(rows) == 2
