"""Small driver-side literal tables, built through the Arrow path.

``spark.createDataFrame(<python list>)`` constructs an RDD of pickled
Python rows; EVERY action that evaluates it launches a Python-worker
round-trip — measured ~3.3s per evaluation at local[32] even for a
16-row table (thread-dump: the write task parked in
``BasePythonRunner$ReaderInputStream.read``). Converting through pandas
instead uses the Arrow conversion (``spark.sql.execution.arrow.pyspark
.enabled``), which lands as a JVM-local relation: the same 16-row write
drops to 0.2s and later evaluations never touch Python.

Only used for plain literal rows (str/int/float/bool/None and flat
lists) — exactly what the engine's sidecars, file lists and report
tables are made of.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: Iterable[Sequence], schema) -> DataFrame:
    """``createDataFrame`` for small literal row lists via pandas/Arrow.

    ``schema`` is a DDL string ("a int, b string") or a StructType; rows
    are tuples/lists in field order (or an empty list).
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    names = st.names
    data = list(rows)
    if data and isinstance(data[0], dict):
        data = [tuple(r.get(n) for n in names) for r in data]
    else:
        data = [tuple(r) for r in data]
    pdf = pd.DataFrame(data, columns=names, dtype=object if not data else None)
    return spark.createDataFrame(pdf, st)
