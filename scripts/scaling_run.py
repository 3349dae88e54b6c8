#!/usr/bin/env python
"""One scaling-evidence run: validate a deterministic clips table at a given
core count, print one JSON line {cores, rows, wall_s, rows_per_sec, ...}.

The north_rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency between N and 4N executors) is evidenced in this sandbox by
running the SAME job on the SAME input at local[8] vs local[32]
(scripts/scaling_report.py orchestrates and writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--audio-rows", type=int, default=40_000)
    ap.add_argument("--partitions", type=int, default=64,
                    help="fixed partition count — identical input split at every core count")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions; median reported (page-cache / writeback noise)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from jsschema_spark import parse_schema
    from jsschema_spark.audio import audio_invariant_udf
    from jsschema_spark.compiler import TableValidator
    from jsschema_spark.session import build_session
    from jsschema_spark.synth import CLIPS_DRAFT04_SCHEMA, clips_table

    import shutil
    import tempfile

    spark = build_session(
        app_name=f"scaling-{args.cores}", master=f"local[{args.cores}]",
        shuffle_partitions=args.partitions,
        extra_conf={"spark.driver.memory": "24g"},
    )
    tmp = tempfile.mkdtemp(prefix="jsschema-scaling-")
    try:
        # materialize the input once: the measured job is validation over a
        # columnar parquet scan (the real workload shape), not synthesis
        src = os.path.join(tmp, "clips")
        clips_table(spark, args.rows, with_audio=False, partitions=args.partitions).write.parquet(src)
        clips = spark.read.parquet(src)
        tv = TableValidator(parse_schema(CLIPS_DRAFT04_SCHEMA), clips.schema)
        # warm-up (JIT/codegen) on a slice
        tv.apply(clips.limit(10000), with_violations=False).where(F.col("valid")).count()

        import statistics

        pred_walls = []
        for _ in range(args.reps):
            t0 = time.time()
            n_valid = tv.apply(clips, with_violations=False).where(F.col("valid")).count()
            pred_walls.append(time.time() - t0)
        wall_pred = statistics.median(pred_walls)

        # materialize WAV payloads too — the measured job is decode + SNR
        # over stored bytes (the real shape), not payload synthesis
        asrc = os.path.join(tmp, "audio")
        clips_table(spark, args.audio_rows, with_audio=True, partitions=args.partitions).select(
            "clip_id", "bytes"
        ).write.parquet(asrc)
        audio = spark.read.parquet(asrc)
        audio_walls = []
        for _ in range(args.reps):
            t0 = time.time()
            n_ok = (
                audio.withColumn("inv", audio_invariant_udf(F.col("clip_id"), F.col("bytes")))
                .where(F.col("inv.snr_db") >= 30.0)
                .count()
            )
            audio_walls.append(time.time() - t0)
        wall_audio = statistics.median(audio_walls)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "cores": args.cores,
                "rows": args.rows,
                "predicate_wall_s": round(wall_pred, 3),
                "predicate_rows_per_sec": round(args.rows / wall_pred, 1),
                "n_valid": n_valid,
                "audio_rows": args.audio_rows,
                "audio_wall_s": round(wall_audio, 3),
                "audio_rows_per_sec": round(args.audio_rows / wall_audio, 1),
                "audio_n_ok": n_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
