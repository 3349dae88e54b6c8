#!/usr/bin/env python
"""spark-submit entrypoint for the corpus-curation pipeline:

    zip -r jsschema_spark.zip jsschema_spark
    spark-submit --master <cluster> --py-files jsschema_spark.zip \\
        scripts/submit_curate.py --table /data/documents.parquet \\
        --output /out/curated --min-quality 0.5 \\
        --near-dup-threshold 0.85 [--metadata-schema meta.json] \\
        [--benchmark /data/eval_docs.parquet] [--report /out/report.json]

Runs validity (+ optional metadata JSON-Schema) → quality / repetition /
logprob gates → exact dedup → near-dup canonical → optional PII
redaction, optionally decontaminates against a benchmark table, writes
the kept docs as parquet, and prints the stage report as ONE JSON line. Exit 0 on success; exit 2 when the pipeline
dropped every row (an almost-certain configuration error)."""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--near-dup-threshold", type=float, default=0.85)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--metadata-schema", default=None, help="draft-04 JSON file")
    ap.add_argument("--benchmark", default=None,
                    help="parquet table of held-out docs to decontaminate against")
    ap.add_argument("--contamination-ngram", type=int, default=8)
    ap.add_argument("--report", default=None, help="also write the report JSON here")
    ap.add_argument("--max-rep-ngram", type=float, default=None,
                    help="drop docs whose duplicate-3-gram fraction exceeds this")
    ap.add_argument("--min-logprob", type=float, default=None,
                    help="drop docs below this mean unigram log-probability")
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub email/phone/IPv4 from the kept text (after dedup)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from jsschema_spark.functions.curate import curate_documents
    from jsschema_spark.functions.dedup import decontaminate

    spark = SparkSession.builder.appName("jsschema-curate").getOrCreate()
    try:
        df = spark.read.parquet(args.table)
        meta_schema = None
        if args.metadata_schema:
            with open(args.metadata_schema, encoding="utf-8") as f:
                meta_schema = json.load(f)
        kept, report = curate_documents(
            df,
            id_col=args.id_col,
            text_col=args.text_col,
            min_quality=args.min_quality,
            near_dup_threshold=None if args.no_near_dup else args.near_dup_threshold,
            metadata_schema=meta_schema,
            max_rep_ngram=args.max_rep_ngram,
            min_logprob=args.min_logprob,
            redact=args.redact_pii,
        )
        if args.benchmark:
            bench = spark.read.parquet(args.benchmark)
            kept = decontaminate(
                kept, bench, args.id_col, args.text_col, n=args.contamination_ngram
            )
        kept.write.mode("overwrite").parquet(args.output)
        report["n_written"] = spark.read.parquet(args.output).count()
        line = json.dumps(report)
        print(line)
        if args.report:
            with open(args.report, "w", encoding="utf-8") as f:
                f.write(line + "\n")
        return 0 if report["n_written"] > 0 else 2
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
