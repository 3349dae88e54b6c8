#!/usr/bin/env python
"""Empirical 10× scale-step: does each expensive query scale the way its
plan argument claims?

Every 100-TB claim in COVERAGE/VERDICT is design-argument + sf0.1
evidence; this harness is the test that can falsify it before a real
cluster does. It synthesizes driver-layout corpora at 1× (sf0.1 sizes)
and 10× with the engine's own generators (``jsschema_spark.synth_tables``
— same distributions, constant dup RATES, so both scales are the same
workload), runs the most expensive suite queries UNMODIFIED at both
sizes, and reports the per-query scaling exponent

    α = log10(t_10x / t_1x)        (t = min over interleaved rounds)

α ≈ 1 is linear, α < 1 means fixed overhead still dominates at 1×, and
α beyond ~1.15 (n log n at these sizes is ≈ 1.03) flags super-linear
growth that needs a plan diagnosis.

Methodology per BENCH/BASELINE.md: the box must be otherwise idle; rounds
interleave the two scales so a host I/O window cannot bias one side;
min-of-rounds estimator.

Usage: python scripts/scale_step.py [--factor 10] [--rounds 2]
       [--out /tmp/scale_step] [--cpus 32]
Writes <out>/scale_step.json and prints the table; paste into
BENCH/SCALE_STEP.md via --md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# sf0.1 driver sizes = the 1× baseline
BASE_SIZES = {"docs": 5_000, "emb": 2_000, "events": 100_000, "lineitem": 600_000}

# the expensive / scale-critical suite queries (BENCH_r04 ranking), all
# runnable from a generated corpus dir
QUERIES = [
    "incremental_minhash", "near_dup_groups", "minhash_near_dups",
    "ivf_index_search", "curated_documents", "stratified_sample_documents",
    "simhash_near_dup_pairs", "stats_lineitem", "contamination_documents",
    "top_quality_per_lang", "exact_dup_documents", "simhash_documents",
    "weighted_sample_documents", "token_budget_documents", "ivf_topk",
    "embedding_lsh_near_dups", "embedding_multiseed_near_dups",
    "session_stats_events", "asof_clicks_errors",
    # round-5 additions
    "lsh_index_search", "label_centroids", "repetition_documents",
    "unigram_logprob_documents", "pii_documents", "inferred_schema_orders",
    "contract_drift_orders", "funnel_events", "retention_events",
    "referential_orders_customer", "masked_spans_documents",
    "lang_confusion_documents", "skew_events_user", "embedding_dup_groups",
    # round-6 additions (codec path: per-clip-linear Python + pure-Catalyst)
    "flac_invariant_clips", "codec_metadata_clips",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_corpus(
    spark, out_dir: str, mult: int, cpus: int, layout: str = "closed"
) -> str:
    from jsschema_spark.synth_tables import write_corpus_dir

    suffix = f"x{mult}" if layout == "closed" else f"x{mult}-{layout}"
    path = os.path.join(out_dir, suffix)
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        log(f"corpus {path}: reusing")
        return path
    log(f"corpus {path}: generating ({ {k: v * mult for k, v in BASE_SIZES.items()} }, layout={layout})")
    write_corpus_dir(
        spark, path,
        docs=BASE_SIZES["docs"] * mult, emb=BASE_SIZES["emb"] * mult,
        events=BASE_SIZES["events"] * mult, lineitem=BASE_SIZES["lineitem"] * mult,
        partitions=cpus, vocab_layout=layout,
    )
    with open(marker, "w") as f:
        f.write("ok")
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default="/tmp/scale_step")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default=None, help="comma list override")
    ap.add_argument(
        "--layout", default="closed", choices=("closed", "open"),
        help="documents text distribution (see synth_tables.documents_table)",
    )
    args = ap.parse_args()

    import __spark_entry__ as E
    from jsschema_spark.session import build_session

    spark = build_session(
        app_name="scale-step", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g")},
    )
    names = args.queries.split(",") if args.queries else QUERIES
    qs = E.queries()
    try:
        dirs = {
            1: ensure_corpus(spark, args.out, 1, args.cpus, args.layout),
            args.factor: ensure_corpus(
                spark, args.out, args.factor, args.cpus, args.layout
            ),
        }

        # warm the page cache on both corpora so round 1 isn't a cold-read
        # measurement of the host, and warm the Python workers
        for d in dirs.values():
            for t in ("documents", "embeddings", "events", "lineitem"):
                spark.read.parquet(f"{d}/{t}.parquet").count()

        # untimed warmup: first-ever execution of each query pays codegen,
        # JIT and Python-worker spawn — running the full list once at 1×
        # keeps that out of the timed rounds (the smoke run showed it
        # inflating t_1x enough to produce negative exponents)
        for n in names:
            qs[n](spark, dirs[1]).count()

        times: dict[str, dict[int, float]] = {n: {} for n in names}
        for rnd in range(args.rounds):
            for mult, d in dirs.items():
                for n in names:
                    # the entry module memoizes the shared group-formation
                    # pipeline per (session, sf_dir) — legitimate for the
                    # driver suite (compute once, derive many), but a
                    # scale-step must time the real pipeline every round
                    getattr(E, "_ND_GROUPS_MEMO", {}).clear()
                    t0 = time.time()
                    cnt = qs[n](spark, d).count()
                    dt = time.time() - t0
                    cur = times[n].get(mult)
                    times[n][mult] = dt if cur is None else min(cur, dt)
                    log(f"r{rnd} x{mult} {n}: {dt:.2f}s ({cnt} rows)")

        lf = math.log10(args.factor)
        report = []
        for n in names:
            t1, t10 = times[n][1], times[n][args.factor]
            alpha = math.log10(t10 / t1) / lf
            report.append({"query": n, "t_1x": round(t1, 3),
                           f"t_{args.factor}x": round(t10, 3),
                           "alpha": round(alpha, 3)})
        report.sort(key=lambda r: -r["alpha"])
        out = {
            "factor": args.factor, "rounds": args.rounds, "cpus": args.cpus,
            "layout": args.layout,
            "base_sizes": BASE_SIZES, "results": report,
        }
        out_name = (
            "scale_step.json" if args.layout == "closed"
            else f"scale_step_{args.layout}.json"
        )
        with open(os.path.join(args.out, out_name), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
        print("\n| query | t(1x) s | t(%dx) s | alpha |" % args.factor)
        print("|---|---|---|---|")
        for r in report:
            flag = " ⚠" if r["alpha"] > 1.15 else ""
            print(f"| {r['query']} | {r['t_1x']} | {r[f't_{args.factor}x']} | {r['alpha']}{flag} |")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
