"""CLI driver — the engine's analogue of the reference's cmd/jsschema
(cmd/jsschema/jsschema.go:15-91): parse a schema, pretty-dump it, optionally
validate a data file against it.

Usage:
    python -m jsschema_spark.cli SCHEMA.json                 # parse + dump
    python -m jsschema_spark.cli SCHEMA.json DATA.json       # validate one JSON doc
    python -m jsschema_spark.cli SCHEMA.json DATA.parquet    # Spark-validate a table
        [--summary] [--details] [--master local[*]]
    python -m jsschema_spark.cli --infer DATA.parquet        # profile a table into
        [--enum-max 8]                                       # the draft-04 contract
                                                             # it evidences (stdout)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="jsschema_spark")
    ap.add_argument("schema")
    ap.add_argument("data", nargs="?")
    ap.add_argument("--summary", action="store_true", help="per-keyword violation counts")
    ap.add_argument("--details", action="store_true", help="exploded violation rows")
    ap.add_argument("--master", default=None)
    ap.add_argument("--infer", action="store_true",
                    help="treat the first argument as a parquet table and print its inferred draft-04 schema")
    ap.add_argument("--enum-max", type=int, default=8)
    args = ap.parse_args(argv)

    if args.infer:
        from jsschema_spark.infer import infer_schema
        from jsschema_spark.session import build_session

        spark = build_session(app_name="jsschema-infer", master=args.master)
        try:
            schema = infer_schema(spark.read.parquet(args.schema), args.enum_max)
            print(json.dumps(schema, indent=2, sort_keys=True))
            return 0
        finally:
            spark.stop()

    from jsschema_spark import read_file
    from jsschema_spark.errors import SchemaParseError

    try:
        node = read_file(args.schema)
    except (SchemaParseError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    if args.data is None:
        print(node.to_json(indent=2))
        return 0

    if args.data.endswith(".json"):
        from jsschema_spark.pyvalidate import Validator

        with open(args.data, encoding="utf-8") as f:
            value = json.load(f)
        violations = Validator(node).validate(value)
        if violations:
            for v in violations:
                print(f"INVALID {v.path} [{v.keyword}] {v.message}")
            return 2
        print("VALID")
        return 0

    # table path
    from jsschema_spark.compiler import TableValidator
    from jsschema_spark.session import build_session

    spark = build_session(app_name="jsschema-cli", master=args.master)
    try:
        df = spark.read.parquet(args.data)
        tv = TableValidator(node, df.schema)
        if args.details:
            tv.violation_details(df).show(100, truncate=False)
        summary = tv.summary(df).collect()
        bad = 0
        for r in summary:
            print(f"{r.path}\t{r.keyword}\t{r.n_violations}/{r.n_rows}")
            bad += r.n_violations or 0
        return 2 if bad else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
