"""Kill-and-resume: a failed run must restart without re-validating
completed buckets (north_rule checkpoint/lineage requirement)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from jsschema_spark import parse_schema
from jsschema_spark.compiler import TableValidator
from jsschema_spark.manifest import Manifest, ResumableValidation
from jsschema_spark.synth import CLIPS_DRAFT04_SCHEMA, clips_table


def test_kill_and_resume(spark, tmp_path):
    # write a real parquet input so lineage has files
    src = str(tmp_path / "clips_src")
    clips_table(spark, 2000, with_audio=False).write.parquet(src)
    df = spark.read.parquet(src)

    tv = TableValidator(parse_schema(CLIPS_DRAFT04_SCHEMA), df.schema)
    mdir = str(tmp_path / "manifest")
    odir = str(tmp_path / "out")

    run1 = ResumableValidation(tv, mdir, odir, n_buckets=8, buckets_per_job=2)
    with pytest.raises(RuntimeError, match="injected failure"):
        run1.run(df, fail_after_chunks=2)

    done_after_crash = Manifest(mdir).completed_buckets()
    assert len(done_after_crash) == 4  # 2 chunks × 2 buckets

    # resume: only the remaining 4 buckets are processed
    run2 = ResumableValidation(tv, mdir, odir, n_buckets=8, buckets_per_job=2)
    pending = run2.pending_buckets()
    assert len(pending) == 4 and set(pending).isdisjoint(done_after_crash)
    results = run2.run(df)
    assert sorted(r.bucket for r in results) == sorted(pending)
    assert Manifest(mdir).completed_buckets() == set(range(8))

    # the union of all bucket outputs covers every input row exactly once
    out = spark.read.parquet(odir)
    assert out.count() == 2000
    assert out.select("clip_id").distinct().count() == df.select("clip_id").distinct().count()

    # manifest carries metrics + lineage
    recs = Manifest(mdir).records()
    assert sum(r["n_rows"] for r in recs) == 2000
    assert all(r["input_files"] for r in recs)
    assert all(r["engine_version"] for r in recs)
    n_valid_manifest = sum(r["n_valid"] for r in recs)
    n_valid_direct = tv.apply(df).where(F.col("valid")).count()
    assert n_valid_manifest == n_valid_direct


def test_rerun_is_noop(spark, tmp_path):
    df = clips_table(spark, 500, with_audio=False)
    tv = TableValidator(parse_schema(CLIPS_DRAFT04_SCHEMA), df.schema)
    mdir = str(tmp_path / "m2")
    run = ResumableValidation(tv, mdir, None, n_buckets=4, buckets_per_job=4)
    first = run.run(df)
    assert len(first) == 4
    again = ResumableValidation(tv, mdir, None, n_buckets=4, buckets_per_job=4)
    assert again.pending_buckets() == []
    assert again.run(df) == []
