#!/usr/bin/env python
"""Streaming-admission 10× scale-step (VERDICT r5 "Next round" #8).

The MinHash and embedding admission sinks are parity- and idempotency-
tested at fixture scale; this harness measures their per-batch cost
trajectory at corpus scale: the 1× (sf0.1-sized) and 10× synthetic corpora
are each split into ``--batches`` equal micro-batches (one parquet file per
batch, ``maxFilesPerTrigger=1`` + ``availableNow``), streamed through the
real sinks, and per-batch trigger durations are read back from
``query.recentProgress``.

What "scales" means here: each batch pays (a) a constant per-row
signature/bucketing cost, (b) a probe join against the persisted index,
which GROWS as batches are admitted. For the embedding sink (b) reads only
the probed bucket partitions (static partition pruning), so per-batch time
should stay ~flat as the index grows; for the MinHash sink (b) is a band
equi-join against the stored signature table — per-batch time may grow
with admitted-corpus size but must stay LINEAR-bounded (no batch-over-batch
super-linear blowup). Reported per sink × scale: every batch's trigger
time, the late/early ratio (mean of last 3 / mean of first 3 batches), and
the 1×→10× total-time exponent α.

Usage: python scripts/streaming_scale_step.py [--factor 10] [--batches 10]
       [--out /tmp/stream_scale] [--cpus 32]
Writes <out>/streaming_scale_step.json; paste the table into
BENCH/SCALE_STEP.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scale_step import BASE_SIZES, ensure_corpus, log  # noqa: E402


def _split_to_files(spark, src_parquet: str, out_dir: str, id_col: str,
                    n_batches: int, cols: list[str]) -> int:
    """Write n_batches single files, batch i = rows with id % n_batches == i
    (modular split so every batch carries the corpus' dup-injection mix).
    Written via Spark (coalesce(1) + move the part file) so parquet types
    match the source exactly — a pandas round-trip silently widens
    array<float> to array<double> and breaks the declared stream schema."""
    import glob

    from pyspark.sql import functions as F

    df = spark.read.parquet(src_parquet).select(*cols)
    n = df.count()
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    tmp = os.path.join(out_dir, "_tmp")
    for i in range(n_batches):
        part = df.where(F.pmod(F.col(id_col), n_batches) == i)
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        (src,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.replace(src, os.path.join(out_dir, f"batch-{i:03d}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def _run_sink(spark, kind: str, src_dir: str, work: str, schema: str) -> dict:
    from jsschema_spark.streaming import (
        start_embedding_admission_sink,
        start_near_dup_admission_sink,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    idx, out, ckpt = (os.path.join(work, d) for d in ("idx", "out", "ckpt"))
    for d in (idx, out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.time()
    if kind == "minhash":
        q = start_near_dup_admission_sink(
            stream, idx, out, ckpt, "doc_id", "text", threshold=0.8
        )
    else:
        q = start_embedding_admission_sink(
            stream, idx, out, ckpt, "vec_id", "embedding", threshold=0.9, dim=64
        )
    q.awaitTermination(3600)
    total = time.time() - t0
    prog = sorted(q.recentProgress, key=lambda p: p["batchId"])
    per_batch = [
        p["durationMs"].get("triggerExecution", 0) / 1000.0
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    admitted = spark.read.parquet(out).count()
    return {"total_sec": round(total, 2), "admitted": admitted,
            "per_batch_sec": [round(t, 2) for t in per_batch]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--out", default="/tmp/stream_scale")
    ap.add_argument("--corpus-out", default="/tmp/scale_step")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("streaming-scale-step")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    results = []
    try:
        dirs = {
            1: ensure_corpus(spark, args.corpus_out, 1, args.cpus),
            args.factor: ensure_corpus(spark, args.corpus_out, args.factor, args.cpus),
        }
        for mult, cdir in dirs.items():
            docs_src = os.path.join(args.out, f"docs_x{mult}")
            emb_src = os.path.join(args.out, f"emb_x{mult}")
            _split_to_files(spark, f"{cdir}/documents.parquet", docs_src,
                            "doc_id", args.batches, ["doc_id", "text"])
            _split_to_files(spark, f"{cdir}/embeddings.parquet", emb_src,
                            "vec_id", args.batches, ["vec_id", "embedding"])
            for kind, src in (("minhash", docs_src), ("embedding", emb_src)):
                schema = ("doc_id long, text string" if kind == "minhash"
                          else "vec_id long, embedding array<float>")
                work = os.path.join(args.out, f"{kind}_x{mult}")
                log(f"run {kind} x{mult} ...")
                r = _run_sink(spark, kind, src, work, schema)
                r.update({"sink": kind, "mult": mult})
                pb = r["per_batch_sec"]
                if len(pb) >= 6:
                    r["late_early_ratio"] = round(
                        (sum(pb[-3:]) / 3) / max(1e-9, sum(pb[:3]) / 3), 3
                    )
                log(f"  total {r['total_sec']}s admitted {r['admitted']} "
                    f"batches {pb} ratio {r.get('late_early_ratio')}")
                results.append(r)
        for kind in ("minhash", "embedding"):
            t1 = next(r for r in results if r["sink"] == kind and r["mult"] == 1)
            tn = next(r for r in results if r["sink"] == kind and r["mult"] == args.factor)
            alpha = math.log(tn["total_sec"] / t1["total_sec"]) / math.log(args.factor)
            for r in (t1, tn):
                r["alpha_total"] = round(alpha, 3)
            log(f"{kind}: alpha_total = {alpha:.3f}")
        payload = {"factor": args.factor, "batches": args.batches,
                   "cpus": args.cpus, "base_sizes": BASE_SIZES,
                   "results": results}
        with open(os.path.join(args.out, "streaming_scale_step.json"), "w") as f:
            json.dump(payload, f, indent=2)
        print(json.dumps(payload))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
