"""Property-based robustness: random JSON documents and schemas through the
parser/validator (hypothesis). The Spark paths reuse pyvalidate inside the
UDF, so the pure-Python agreement here transfers."""

import json

from hypothesis import given, settings, strategies as st

from jsschema_spark import parse_schema, read_string
from jsschema_spark.pyvalidate import Validator, json_type_of
from jsschema_spark.schema import draft04_metaschema

json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(max_size=10), children, max_size=6),
    ),
    max_leaves=20,
)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_validator_never_crashes_on_any_value(v):
    meta = draft04_metaschema()
    Validator(meta).validate(v)  # must not raise
    # trivial schema accepts everything
    assert Validator(parse_schema({})).validate(v) == []
    # typed schema: pass iff type matches
    t = json_type_of(v)
    s = Validator(parse_schema({"type": t}))
    assert s.validate(v) == []


@given(json_values)
@settings(max_examples=100, deadline=None)
def test_enum_self_membership(v):
    s = Validator(parse_schema({"enum": [v]}))
    assert s.validate(v) == []


num_schema = st.fixed_dictionaries(
    {},
    optional={
        "minimum": st.integers(-100, 100),
        "maximum": st.integers(-100, 100),
        "exclusiveMinimum": st.booleans(),
        "exclusiveMaximum": st.booleans(),
        "multipleOf": st.integers(1, 9),
        "type": st.sampled_from(["integer", "number"]),
    },
)


@given(num_schema, st.integers(-150, 150))
@settings(max_examples=300, deadline=None)
def test_numeric_keywords_against_model(schema_dict, x):
    violations = Validator(parse_schema(schema_dict)).validate(x)
    expect_ok = True
    if "type" in schema_dict and schema_dict["type"] == "integer":
        pass  # int always matches
    if "minimum" in schema_dict:
        if schema_dict.get("exclusiveMinimum"):
            expect_ok &= x > schema_dict["minimum"]
        else:
            expect_ok &= x >= schema_dict["minimum"]
    if "maximum" in schema_dict:
        if schema_dict.get("exclusiveMaximum"):
            expect_ok &= x < schema_dict["maximum"]
        else:
            expect_ok &= x <= schema_dict["maximum"]
    if "multipleOf" in schema_dict:
        expect_ok &= x % schema_dict["multipleOf"] == 0
    assert (not violations) == expect_ok, (schema_dict, x, violations)


@given(json_values)
@settings(max_examples=100, deadline=None)
def test_schema_roundtrip_stability(v):
    """Any dict parses-or-raises deterministically; parsed schemas round-trip
    through to_dict -> parse -> to_dict as a fixed point."""
    if not isinstance(v, dict):
        return
    try:
        node = parse_schema(v)
    except Exception:
        return
    d1 = node.to_dict()
    d2 = parse_schema(json.loads(json.dumps(d1))).to_dict()
    assert d1 == d2


def test_find_by_id_and_resolve_url():
    node = read_string(
        '{"id": "http://x.example/root.json", "definitions": '
        '{"a": {"id": "http://x.example/a.json", "properties": {"deep": {"id": "nested#frag"}}}}}'
    )
    assert node.find_by_id("http://x.example/a.json") is node.definitions["a"]
    assert node.find_by_id("nested#frag") is not None
    assert node.find_by_id("nope") is None
    deep = node.definitions["a"].properties["deep"]
    assert node.definitions["a"].resolve_url("other.json") == "http://x.example/other.json"
    assert deep.scope() == "nested#frag"
