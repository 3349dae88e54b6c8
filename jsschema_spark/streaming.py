"""Structured Streaming validation.

The reference is batch-only and the north_rule asks for batch + resumable
manifest rather than streaming (SURVEY.md §2.5) — but the same compiled
predicate DAG applies unchanged to a streaming DataFrame, so the engine
exposes it: ``readStream`` source → ``TableValidator`` columns → per-batch
violation sink via ``foreachBatch``, written idempotently per batch
(``batch_id=``-partitioned overwrite) so at-least-once batch replays still
yield exactly-once file output.

At scale: the predicate columns add no state and no shuffle to the stream;
watermark/windowed violation-rate aggregation is plain Spark on top of the
``valid`` column.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from jsschema_spark.compiler import TableValidator
from jsschema_spark.schema import SchemaNode


def validate_stream(stream_df: DataFrame, schema: SchemaNode, with_violations: bool = True) -> DataFrame:
    """Attach valid/violations columns to a streaming DataFrame (stateless)."""
    tv = TableValidator(schema, stream_df.schema)
    return tv.apply(stream_df, with_violations=with_violations)


def violation_rate_stream(
    stream_df: DataFrame, schema: SchemaNode, ts_col: str,
    window: str = "1 minute", watermark: str = "5 minutes",
) -> DataFrame:
    """Windowed violation-rate aggregation with late-data watermarking."""
    validated = validate_stream(stream_df, schema, with_violations=False)
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_rows", "n_invalid",
        )
    )


def start_violation_sink(
    stream_df: DataFrame,
    schema: SchemaNode,
    output_dir: str,
    checkpoint_dir: str,
    id_cols: Optional[list[str]] = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """foreachBatch sink: per micro-batch, write exploded violation detail
    rows as parquet.

    Effectively exactly-once: ``foreachBatch`` itself is at-least-once (a
    task/driver retry replays a batch after a partial write), so each batch
    writes to its own ``batch_id=<n>`` partition directory with
    ``mode("overwrite")`` — a replay overwrites the same directory instead
    of appending duplicates, making the sink idempotent per batch. Readers
    see ``batch_id`` as a normal partition column when reading
    ``output_dir``."""
    tv_holder: dict = {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        tv = tv_holder.get("tv")
        if tv is None:
            tv = TableValidator(schema, batch_df.schema)
            tv_holder["tv"] = tv
        details = tv.violation_details(batch_df, id_cols=id_cols or [])
        # overwrite ONLY this batch's partition dir: idempotent on replay
        details.write.mode("overwrite").parquet(f"{output_dir}/batch_id={int(batch_id)}")

    writer = stream_df.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
