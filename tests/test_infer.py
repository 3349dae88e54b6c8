"""Schema inference (jsschema_spark.infer): observed-contract profiling
and its round-trip through the validation core."""

import pytest
from pyspark.sql import functions as F

from jsschema_spark.infer import infer_schema, schema_report

SF = "/root/testdata/sf0.001"


def test_infer_schema_basic(spark):
    df = spark.createDataFrame(
        [
            (1, 2.5, "red", "always", True),
            (2, -1.0, "green", "text", False),
            (3, 7.25, "red", None, True),
        ],
        "k long, x double, color string, note string, flag boolean",
    )
    s = infer_schema(df, enum_max=4)
    p = s["properties"]
    assert p["k"] == {"type": "integer", "minimum": 1, "maximum": 3}
    assert p["x"] == {"type": "number", "minimum": -1.0, "maximum": 7.25}
    assert p["color"]["enum"] == ["green", "red"]
    assert p["color"]["minLength"] == 3 and p["color"]["maxLength"] == 5
    assert p["flag"] == {"type": "boolean"}
    # nullable column is not required; null is excluded from the domain
    assert "note" not in s["required"]
    assert sorted(s["required"]) == ["color", "flag", "k", "x"]
    assert p["note"]["enum"] == ["always", "text"]


def test_infer_schema_high_cardinality_skips_enum(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("s")
    )
    p = infer_schema(df, enum_max=8)["properties"]["s"]
    assert "enum" not in p
    assert p["minLength"] == 2 and p["maxLength"] == 4


def test_infer_schema_empty_and_timestamps(spark):
    empty = spark.createDataFrame([], "a long, t timestamp, s string")
    s = infer_schema(empty)
    assert "required" not in s
    assert s["properties"]["a"] == {"type": "integer"}
    assert s["properties"]["t"] == {"type": "string", "format": "date-time"}
    assert "minLength" not in s["properties"]["s"]


def test_infer_round_trips_through_validator(spark):
    """The inferred schema describes what was observed, so re-validating
    the SAME table yields zero violations — inference and validation are
    mutual inverses on the observed data."""
    from jsschema_spark import parse_schema
    from jsschema_spark.compiler import TableValidator

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # timestamps validate as date-time STRINGS in draft-04; profile the
    # validator-visible projection (same column set both sides)
    view = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    schema = infer_schema(view)
    tv = TableValidator(parse_schema(schema), view.schema)
    out = tv.apply(view, with_violations=False)
    assert out.where(~F.col("valid")).count() == 0
    # and the contract is tight: an out-of-range row violates it
    bad = view.limit(1).select(
        F.lit(-1).cast("long").alias("o_orderkey"), "o_custkey",
        F.lit("ZZ").alias("o_orderstatus"), "o_totalprice", "o_orderpriority",
    )
    assert tv.apply(bad, with_violations=False).where(~F.col("valid")).count() == 1


def test_schema_report_rows(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    rows = {
        (r.path, r.keyword): (r.value_num, r.value_str)
        for r in schema_report(df).collect()
    }
    assert rows[("k", "type")] == (None, "integer")
    assert rows[("k", "minimum")] == (1.0, None)
    assert rows[("k", "maximum")] == (2.0, None)
    assert rows[("s", "enum")] == (None, "a,b")
    assert rows[("k", "required")] == (None, "true")


def test_contract_drift(spark):
    """Drift between two profiling runs: tightened ranges are 'changed',
    vanished enum values change the enum row, constraints present in only
    one run are added/removed."""
    from jsschema_spark.infer import contract_drift

    old = spark.createDataFrame(
        [(1, 2.0, "red"), (2, 8.0, "green"), (3, 5.0, "blue")],
        "k long, x double, c string",
    )
    new = spark.createDataFrame(
        [(1, 2.0, "red"), (2, 4.0, None)], "k long, x double, c string"
    )
    drift = {
        (r.path, r.keyword): (r.old_num, r.new_num, r.old_str, r.new_str, r.change)
        for r in contract_drift(schema_report(old), schema_report(new)).collect()
    }
    assert drift[("k", "maximum")] == (3.0, 2.0, None, None, "changed")
    assert drift[("x", "maximum")] == (8.0, 4.0, None, None, "changed")
    assert drift[("c", "enum")][2:] == ("blue,green,red", "red", "changed")
    # c gained nulls -> its required row vanished
    assert drift[("c", "required")][4] == "removed"
    # unchanged constraints are absent
    assert ("k", "type") not in drift and ("k", "minimum") not in drift


def test_cli_infer_subprocess():
    """`--infer` CLI mode prints the inferred draft-04 schema as JSON.
    Runs in a subprocess because cli.main owns (and stops) its session."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "jsschema_spark.cli", "--infer",
         f"{SF}/nation.parquet", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    schema = json.loads(out.stdout)
    assert schema["properties"]["n_nationkey"] == {
        "type": "integer", "minimum": 0, "maximum": 24
    }
    assert "n_name" in schema["required"]


def test_inferred_schema_marshal_round_trip(spark):
    """The inferred dict survives the reference's marshal semantics:
    parse_schema -> to_json -> read_string reproduces the same schema."""
    import json

    from jsschema_spark import parse_schema, read_string

    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    inferred = infer_schema(df)
    node = parse_schema(inferred)
    again = read_string(node.to_json())
    assert json.loads(again.to_json()) == json.loads(node.to_json())
    # and the marshalled form still contains the inferred facts
    out = json.loads(node.to_json())
    assert out["properties"]["o_orderkey"]["type"] == "integer"
    assert "enum" in out["properties"]["o_orderstatus"]


def test_json_key_profile(spark):
    import pytest

    from jsschema_spark.infer import json_key_profile

    rows = [
        ('{"k": 1, "device": "ios"}',),
        ('{"k": 2.5, "beta": true}',),
        ('{"device": "web", "note": null}',),
        (None,),  # unparseable/missing rows contribute no keys
    ]
    df = spark.createDataFrame(rows, "props string")
    out = {(r["key"], r["value_type"]): r for r in
           json_key_profile(df, "props").collect()}
    assert out[("k", "number")]["n"] == 2
    assert out[("k", "number")]["frac_of_rows"] == pytest.approx(0.5)
    assert out[("device", "string")]["n"] == 2
    assert out[("beta", "boolean")]["n"] == 1
    assert out[("note", "null")]["n"] == 1
