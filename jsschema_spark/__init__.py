"""jsschema_spark — a PySpark-native JSON-Schema (draft-04) constraint
validation engine.

From-scratch re-expression of the semantics of lestrrat-go/jsschema
(reference at /root/reference, cited as file:line in docstrings) on top of
Spark DataFrames: schemas compile once on the driver into Catalyst ``Column``
predicate DAGs (whole-stage codegen, no per-row Python on the typed path),
with an Arrow-batched pandas-UDF path for arbitrary dynamically-typed JSON
instances, plus the table-level checks a 10^12-row validation job needs:
single-pass column stats, salted uniqueness, broadcast/SMJ referential
anti-joins, distribution drift, and a resumable per-partition manifest.
"""

from jsschema_spark.errors import SchemaParseError, ResolutionError
from jsschema_spark.schema import SchemaNode, parse_schema, read_file, read_string, FORBIDDEN
from jsschema_spark.pyvalidate import validate_value, Violation

__all__ = [
    "SchemaNode",
    "parse_schema",
    "read_file",
    "read_string",
    "FORBIDDEN",
    "validate_value",
    "Violation",
    "SchemaParseError",
    "ResolutionError",
]

__version__ = "0.1.0"
