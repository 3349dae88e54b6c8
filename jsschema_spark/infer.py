"""Schema INFERENCE — the inverse of the validation core: derive a
draft-04 JSON Schema from a table's data in one distributed pass.

The reference (lestrrat-go/jsschema) only consumes schemas; a table
engine also needs to produce them — "profile this landed dataset and pin
its contract" is the first step of onboarding a feed into validation.
The inferred schema deliberately describes WHAT WAS OBSERVED:

* ``type``  — from the Spark column type (integral → ``integer``,
  fractional → ``number``, boolean, string; timestamps → ``string`` +
  ``format: date-time``, draft-04's representation for instants).
* ``required`` — columns observed with zero nulls.
* ``minimum`` / ``maximum`` — observed numeric range.
* ``minLength`` / ``maxLength`` — observed string length range.
* ``enum`` — string columns with ≤ ``enum_max`` distinct values
  (sorted, so the schema is deterministic).

Scale shape: one ``df.agg`` over map-side-combined aggregates computes
min/max/null-counts and an HLL ``approx_count_distinct`` per string
column; only columns whose sketch says the domain is plausibly small
(≤ 3×``enum_max`` — HLL's default error is ~5%, 3× is a generous guard)
get a ``collect_set`` in a SECOND, column-pruned aggregate. A
high-cardinality string column therefore never ships its domain
anywhere — the enum pass touches only near-categorical columns. The
driver then assembles a dict of literals — no per-row Python.

Inference is observational: re-validating the SAME data against the
inferred schema yields zero violations by construction (round-trip
pytest), and new data drifting outside the observed contract surfaces as
ordinary violations.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_schema(df: DataFrame, enum_max: int = 8) -> dict[str, Any]:
    """Infer a draft-04 schema dict from ``df`` (see module docstring).
    Returns a plain dict ``parse_schema`` accepts; empty tables yield a
    types-only schema (no bounds, nothing required — zero rows observed
    means zero constraints evidenced)."""
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"))
        if isinstance(f.dataType, (T.IntegralType, T.FractionalType)):
            aggs.append(F.min(c).alias(f"{f.name}__min"))
            aggs.append(F.max(c).alias(f"{f.name}__max"))
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.min(F.length(c)).alias(f"{f.name}__minlen"))
            aggs.append(F.max(F.length(c)).alias(f"{f.name}__maxlen"))
            aggs.append(F.approx_count_distinct(c).alias(f"{f.name}__adist"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n"]

    # second, column-pruned pass: exact domains ONLY for near-categorical
    # string columns (HLL sketch ≤ 3×enum_max — generous vs its ~5% error)
    enum_candidates = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
        and (row.get(f"{f.name}__adist") or 0) <= 3 * enum_max
    ]
    if n > 0 and enum_candidates:
        dom_row = df.agg(
            *[
                F.sort_array(F.collect_set(F.col(name))).alias(f"{name}__dom")
                for name in enum_candidates
            ]
        ).collect()[0].asDict()
        row.update(dom_row)

    props: dict[str, Any] = {}
    required: list[str] = []
    for f in df.schema.fields:
        p: dict[str, Any] = {}
        dt = f.dataType
        if isinstance(dt, T.BooleanType):
            p["type"] = "boolean"
        elif isinstance(dt, T.IntegralType):
            p["type"] = "integer"
        elif isinstance(dt, T.FractionalType):
            p["type"] = "number"
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            p["type"] = "string"
            p["format"] = "date-time"
        elif isinstance(dt, T.StringType):
            p["type"] = "string"
        else:
            # arrays/structs/maps/binary: observed only as presence
            p = {}
        nulls = row.get(f"{f.name}__nulls")
        if n > 0 and nulls == 0:
            required.append(f.name)
        if isinstance(dt, (T.IntegralType, T.FractionalType)):
            lo, hi = row.get(f"{f.name}__min"), row.get(f"{f.name}__max")
            if lo is not None:
                p["minimum"] = lo if isinstance(dt, T.FractionalType) else int(lo)
                p["maximum"] = hi if isinstance(dt, T.FractionalType) else int(hi)
        elif isinstance(dt, T.StringType):
            lo, hi = row.get(f"{f.name}__minlen"), row.get(f"{f.name}__maxlen")
            if lo is not None:
                p["minLength"] = int(lo)
                p["maxLength"] = int(hi)
            dom = row.get(f"{f.name}__dom") or []
            if 0 < len(dom) <= enum_max:
                p["enum"] = sorted(dom)
        props[f.name] = p

    out: dict[str, Any] = {"type": "object", "properties": props}
    if required:
        out["required"] = sorted(required)
    return out


def schema_report(df: DataFrame, enum_max: int = 8) -> DataFrame:
    """The inferred schema flattened to engine-portable rows
    ``(path, keyword, value_num, value_str)`` — one row per inferred
    constraint, numeric facts in ``value_num``, type/format/enum facts in
    ``value_str`` (enum as a comma-joined sorted list). This is the
    hashable/diffable surface for oracles and for schema-drift
    monitoring between profiling runs."""
    spark = df.sparkSession
    schema = infer_schema(df, enum_max)
    rows: list[tuple[str, str, Any, Any]] = []
    for name, p in schema["properties"].items():
        for kw, v in p.items():
            if kw in ("minimum", "maximum", "minLength", "maxLength"):
                rows.append((name, kw, float(v), None))
            elif kw == "enum":
                rows.append((name, kw, None, ",".join(v)))
            else:
                rows.append((name, kw, None, str(v)))
    for name in schema.get("required", []):
        rows.append((name, "required", None, "true"))
    from jsschema_spark.localdf import local_df

    return local_df(
        spark, rows, "path string, keyword string, value_num double, value_str string"
    )


def contract_drift(old_report: DataFrame, new_report: DataFrame) -> DataFrame:
    """Diff two ``schema_report`` runs — the contract-drift monitor: what
    did the observed schema gain, lose, or change between two profiling
    passes (yesterday's landing vs today's)? Output: one row per drifted
    constraint ``(path, keyword, old_num, new_num, old_str, new_str,
    change ∈ added|removed|changed)``; unchanged constraints are dropped.

    A full-outer join on (path, keyword) over two report tables whose
    size is #columns × #keywords — driver-scale inputs, so the join is
    trivially broadcast; the heavy work already happened inside the two
    ``infer_schema`` passes."""
    o = old_report.select(
        "path", "keyword",
        F.col("value_num").alias("old_num"), F.col("value_str").alias("old_str"),
        F.lit(True).alias("__in_old"),
    )
    nw = new_report.select(
        "path", "keyword",
        F.col("value_num").alias("new_num"), F.col("value_str").alias("new_str"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(nw, ["path", "keyword"], "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(
            ~F.col("old_num").eqNullSafe(F.col("new_num"))
            | ~F.col("old_str").eqNullSafe(F.col("new_str")),
            "changed",
        )
        .otherwise("same")
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change") != "same")
        .select("path", "keyword", "old_num", "new_num", "old_str", "new_str", "change")
    )


def json_key_profile(
    df: "DataFrame",
    col: str,
) -> "DataFrame":
    """Schema discovery for a semi-structured JSON column: which keys
    appear, how often, and with what scalar type — the contract a
    free-form ``props`` column actually follows, before anyone writes
    the draft-04 schema for it (``infer_schema``'s sibling for the
    column the table schema calls "just a string"). A key whose
    presence-rate or type mix shifts between snapshots is an upstream
    producer change.

    Output: ``(key, value_type, n, frac_of_rows)`` where ``value_type``
    ∈ {number, boolean, null, string} classified from the scalar's
    lexical form.

    Scale shape: ONE pass — ``from_json`` to ``map<string,string>``
    evaluated JVM-side, map explode, hash agg on (key, type) with
    map-side combine (shuffle width = #distinct keys × types, bounded by
    producer vocabulary, not rows); the row count for the rate joins in
    as a broadcast scalar (second, column-pruned scan)."""
    kv = df.select(
        F.explode(
            F.from_json(F.col(col), "map<string,string>")
        ).alias("key", "__v")
    )
    vtype = (
        F.when(F.col("__v").isNull(), F.lit("null"))
        .when(F.col("__v").rlike(r"^(true|false)$"), F.lit("boolean"))
        .when(
            F.col("__v").rlike(r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"),
            F.lit("number"),
        )
        .otherwise(F.lit("string"))
    )
    counts = kv.groupBy("key", vtype.alias("value_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "key",
        "value_type",
        "n",
        (F.col("n") / F.col("__total")).alias("frac_of_rows"),
    )
