#!/usr/bin/env python
"""Interleaved N-vs-4N scaling measurement, robust to host noise.

This sandbox VM shows large time-varying performance noise (identical runs
vary several-fold minutes apart), so sequential one-shot legs are not
credible. This harness materializes ONE deterministic input, then alternates
local[N] / local[4N] sessions over it for R rounds and reports per-config
medians — time-varying noise hits both configs equally.

Prints one JSON line with medians, spreads, and the efficiency numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--audio-rows", type=int, default=4_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cores-lo", type=int, default=8)
    ap.add_argument("--cores-hi", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--keep-input", type=str, default=None,
                    help="reuse/materialize input at this path instead of a temp dir")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from jsschema_spark import parse_schema
    from jsschema_spark.audio import audio_invariant_scan
    from jsschema_spark.compiler import TableValidator
    from jsschema_spark.session import build_session
    from jsschema_spark.synth import CLIPS_DRAFT04_SCHEMA, clips_audio_to_parquet, clips_table

    base = args.keep_input or tempfile.mkdtemp(prefix="jsschema-scale-")
    pred_src = os.path.join(base, f"clips-{args.rows}")
    audio_src = os.path.join(base, f"audio-{args.audio_rows}")

    if not os.path.exists(pred_src) or not os.path.exists(audio_src):
        s0 = build_session(app_name="scale-setup", master="local[32]",
                           shuffle_partitions=args.partitions,
                           extra_conf={"spark.driver.memory": "24g"})
        if not os.path.exists(pred_src):
            clips_table(s0, args.rows, with_audio=False, partitions=args.partitions).write.mode(
                "overwrite").parquet(pred_src)
        if not os.path.exists(audio_src):
            # file-granular write: payload bytes never cross JVM↔Python IPC
            clips_audio_to_parquet(s0, args.audio_rows, audio_src, n_files=args.partitions)
        s0.stop()
        time.sleep(3)

    # warm the page cache: this VM's virtio disk reads at ~80MB/s and the
    # host drops cache unpredictably — cold reads would dominate the timing
    # and poison both legs randomly (measured 5× swings on identical runs)
    def warm(path: str) -> None:
        import concurrent.futures
        import glob as _g

        def read_all(p):
            with open(p, "rb", buffering=0) as f:
                while f.read(1 << 23):
                    pass

        files = _g.glob(os.path.join(path, "*.parquet"))
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            list(ex.map(read_all, files))

    t0 = time.time()
    warm(pred_src)
    warm(audio_src)
    print(f"cache warm: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    results: dict[int, dict[str, list[float]]] = {
        args.cores_lo: {"pred": [], "audio": []},
        args.cores_hi: {"pred": [], "audio": []},
    }
    n_valid_seen = set()

    for rnd in range(args.rounds):
        for cores in (args.cores_lo, args.cores_hi):
            sp = build_session(app_name=f"scale-{cores}-r{rnd}", master=f"local[{cores}]",
                               shuffle_partitions=args.partitions,
                               extra_conf={"spark.driver.memory": "24g"})
            try:
                clips = sp.read.parquet(pred_src)
                tv = TableValidator(parse_schema(CLIPS_DRAFT04_SCHEMA), clips.schema)
                tv.apply(clips.limit(10000), with_violations=False).where(F.col("valid")).count()
                t0 = time.time()
                n_valid = tv.apply(clips, with_violations=False).where(F.col("valid")).count()
                results[cores]["pred"].append(time.time() - t0)
                n_valid_seen.add(n_valid)

                t0 = time.time()
                audio_invariant_scan(sp, audio_src).where(F.col("snr_db") >= 30.0).count()
                results[cores]["audio"].append(time.time() - t0)
            finally:
                sp.stop()
            print(
                f"round {rnd} cores {cores}: pred {results[cores]['pred'][-1]:.2f}s "
                f"audio {results[cores]['audio'][-1]:.2f}s",
                file=sys.stderr, flush=True,
            )

    def summarize(cores: int, kind: str, n_items: int) -> dict:
        # host noise on this sandbox is one-sided (tenant contention / cache
        # drops only ADD time), so min-of-rounds estimates the true cost;
        # median and max are reported for transparency
        walls = results[cores][kind]
        best = min(walls)
        return {
            "min_wall_s": round(best, 3),
            "median_wall_s": round(statistics.median(walls), 3),
            "max_wall_s": round(max(walls), 3),
            "rows_per_sec": round(n_items / best, 1),
        }

    lo_p = summarize(args.cores_lo, "pred", args.rows)
    hi_p = summarize(args.cores_hi, "pred", args.rows)
    lo_a = summarize(args.cores_lo, "audio", args.audio_rows)
    hi_a = summarize(args.cores_hi, "audio", args.audio_rows)
    ratio = args.cores_hi / args.cores_lo
    out = {
        "rows": args.rows,
        "audio_rows": args.audio_rows,
        "rounds": args.rounds,
        "cores_lo": args.cores_lo,
        "cores_hi": args.cores_hi,
        "predicate": {"lo": lo_p, "hi": hi_p},
        "audio": {"lo": lo_a, "hi": hi_a},
        "efficiency_predicate": round(hi_p["rows_per_sec"] / lo_p["rows_per_sec"] / ratio, 3),
        "efficiency_audio": round(hi_a["rows_per_sec"] / lo_a["rows_per_sec"] / ratio, 3),
        "n_valid_core_invariant": len(n_valid_seen) == 1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
