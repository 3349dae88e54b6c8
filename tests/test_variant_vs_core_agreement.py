"""Randomized cross-tier agreement: the JVM Variant tier must give the same
verdict as the pure-Python semantic core for randomly generated schemas ×
randomly generated JSON instances (fixed seed) — the Variant analogue of
test_typed_vs_core_agreement, covering the round-2 additions: map-cast
key-set keywords, tuple items, additionalX, schema dependencies, dotted
property names, and compile-time $ref inlining."""

import json
import random

from pyspark.sql import functions as F

from jsschema_spark import parse_schema
from jsschema_spark.pyvalidate import Validator
from jsschema_spark.variant import JsonColumnValidator

SEED = 20260817


def random_schema(rng: random.Random) -> dict:
    prop_names = ["a", "b", "a.b", "with space", "c"]
    scalar_schemas = [
        {"type": "integer"},
        {"type": "string", "minLength": rng.randint(0, 3)},
        {"minimum": rng.randint(-2, 5)},
        {"maximum": rng.randint(0, 9), "exclusiveMaximum": rng.random() < 0.5},
        {"pattern": rng.choice(["^x", "[0-9]$", "zz"])},
        {"enum": ["x", 1, True]},
        {"multipleOf": rng.randint(1, 4)},
        {"not": {"type": "null"}},
    ]
    s: dict = {}
    if rng.random() < 0.7:
        s["properties"] = {
            name: rng.choice(scalar_schemas)
            for name in rng.sample(prop_names, k=rng.randint(1, 3))
        }
    if rng.random() < 0.5:
        s["required"] = rng.sample(prop_names, k=rng.randint(1, 2))
    if rng.random() < 0.3:
        s["patternProperties"] = {"^a": rng.choice(scalar_schemas)}
    if rng.random() < 0.25:
        s["additionalProperties"] = rng.choice([False, rng.choice(scalar_schemas)])
    if rng.random() < 0.3:
        s["maxProperties"] = rng.randint(0, 4)
    if rng.random() < 0.2:
        s["minProperties"] = rng.randint(0, 2)
    if rng.random() < 0.3:
        s["dependencies"] = {
            "a": rng.choice([["b"], {"required": ["b"]}, {"maxProperties": 3}])
        }
    if rng.random() < 0.3:
        s["items"] = rng.choice(
            [
                rng.choice(scalar_schemas),
                [{"type": "integer"}, {"type": "string"}],
            ]
        )
        if isinstance(s["items"], list) and rng.random() < 0.5:
            s["additionalItems"] = rng.choice([False, {"type": "integer"}])
    if rng.random() < 0.2:
        s["uniqueItems"] = True
    if rng.random() < 0.25:
        s["definitions"] = {"leaf": rng.choice(scalar_schemas)}
        s["properties"] = dict(s.get("properties", {}))
        s["properties"]["c"] = {"$ref": "#/definitions/leaf"}
    if rng.random() < 0.25:
        s["anyOf"] = [rng.choice(scalar_schemas), {"type": "array"}, {"type": "object"}]
    if rng.random() < 0.2:
        s["oneOf"] = [{"type": "string"}, {"type": "integer"}, {"type": "object"}]
    return s


def random_value(rng: random.Random, depth: int = 0):
    opts = ["int", "float", "str", "bool", "null"]
    if depth < 2:
        opts += ["obj", "arr", "obj", "arr"]
    kind = rng.choice(opts)
    if kind == "int":
        return rng.choice([0, 1, 3, 4, -2, 9, 10])
    if kind == "float":
        return rng.choice([0.0, 3.0, 2.5, -1.25, 9.5])
    if kind == "str":
        return rng.choice(["", "x", "x9", "abc", "zz", "1"])
    if kind == "bool":
        return rng.random() < 0.5
    if kind == "null":
        return None
    if kind == "arr":
        return [random_value(rng, depth + 1) for _ in range(rng.randint(0, 3))]
    names = ["a", "b", "a.b", "with space", "c", "other"]
    return {
        n: random_value(rng, depth + 1)
        for n in rng.sample(names, k=rng.randint(0, 4))
    }


def test_variant_vs_core_random_agreement(spark):
    rng = random.Random(SEED)
    n_compiled = 0
    for trial in range(30):
        schema_dict = random_schema(rng)
        node = parse_schema(schema_dict)
        core = Validator(node)
        instances = [random_value(rng) for _ in range(25)]
        payloads = [json.dumps(v) for v in instances]

        v = JsonColumnValidator.try_compile(schema_dict)
        if v is None:
            continue  # recursive $ref / non-scalar enum only — rare here
        n_compiled += 1
        df = spark.createDataFrame([(p,) for p in payloads], "payload string")
        got = [
            r.valid
            for r in v.apply(df, "payload").select("validation.valid").collect()
        ]
        for value, payload, jvm_valid in zip(instances, payloads, got):
            expect = core.is_valid(value)
            assert jvm_valid == expect, (
                f"trial {trial}: schema={schema_dict} instance={payload} "
                f"variant={jvm_valid} core={expect}"
            )
    assert n_compiled >= 25, f"only {n_compiled}/30 schemas compiled on the Variant tier"
