"""Source pruning, sinks, and streaming validation."""

import json
import os

from pyspark.sql import functions as F

from jsschema_spark import parse_schema
from jsschema_spark.sources import (
    constrained_columns,
    read_for_validation,
    validate_table,
)
from jsschema_spark.streaming import start_violation_sink, validate_stream
from jsschema_spark.synth import CLIPS_DRAFT04_SCHEMA, clips_table

SCHEMA = parse_schema(CLIPS_DRAFT04_SCHEMA)


def test_constrained_columns():
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "extra_col"]
    got = constrained_columns(SCHEMA, cols)
    assert "extra_col" not in got
    assert set(got) == {"clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"}


def test_read_for_validation_prunes_scan(spark, tmp_path):
    src = str(tmp_path / "clips")
    clips_table(spark, 500, with_audio=False).withColumn(
        "unconstrained_payload", F.lit("x" * 100)
    ).write.parquet(src)
    df = read_for_validation(spark, src, SCHEMA)
    assert "unconstrained_payload" not in df.columns
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "unconstrained_payload" not in plan.split("ReadSchema")[-1]


def test_validate_table_end_to_end(spark, tmp_path):
    src = str(tmp_path / "clips2")
    clips_table(spark, 2000, with_audio=False).write.parquet(src)
    vdir = str(tmp_path / "viol")
    mdir = str(tmp_path / "metrics")
    summary = validate_table(spark, src, SCHEMA, violations_path=vdir, metrics_path=mdir)
    rows = {(r.path, r.keyword): r.n_violations for r in summary.collect()}
    assert sum(rows.values()) > 0
    viol = spark.read.parquet(vdir)
    assert viol.count() == sum(rows.values())
    assert "keyword" in viol.columns and "clip_id" in viol.columns
    # keyword partitioning happened
    assert any(p.startswith("keyword=") for p in os.listdir(vdir))
    metrics_files = [f for f in os.listdir(mdir) if f.endswith(".json")]
    assert metrics_files
    recs = [
        json.loads(line)
        for f in metrics_files
        for line in open(os.path.join(mdir, f), encoding="utf-8")
    ]
    assert {r["keyword"] for r in recs} >= {"pattern", "enum", "required"}


def test_streaming_validation(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    clips_table(spark, 1000, with_audio=False).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    validated = validate_stream(stream, SCHEMA)
    assert validated.isStreaming

    out = str(tmp_path / "stream_viol")
    ckpt = str(tmp_path / "ckpt")
    q = start_violation_sink(stream, SCHEMA, out, ckpt, id_cols=["clip_id"])
    q.awaitTermination(120)
    viol = spark.read.parquet(out)
    from jsschema_spark.compiler import TableValidator

    expected = TableValidator(SCHEMA, static.schema).violation_details(static).count()
    assert viol.count() == expected
    assert "batch_id" in viol.columns


def test_streaming_sink_idempotent_on_batch_replay(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a micro-batch (same
    batch_id, e.g. after a partial write + retry) must not duplicate
    detail rows — the sink overwrites the batch's own partition dir."""
    src = str(tmp_path / "replay_src")
    clips_table(spark, 500, with_audio=False).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)

    out = str(tmp_path / "replay_viol")
    ckpt = str(tmp_path / "replay_ckpt")
    q = start_violation_sink(stream, SCHEMA, out, ckpt, id_cols=["clip_id"])
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first > 0

    # simulate the engine replaying batch 0 against the same output dir
    from jsschema_spark.compiler import TableValidator

    tv = TableValidator(SCHEMA, static.schema)
    tv.violation_details(static, id_cols=["clip_id"]).write.mode("overwrite").parquet(
        f"{out}/batch_id=0"
    )
    replayed = spark.read.parquet(out).count()
    assert replayed == first  # no duplicates
