#!/usr/bin/env python
"""Run scaling_run.py at local[8] and local[32] (fresh JVM each, same input)
and write BENCH/BASELINE.md with throughputs + scaling efficiency.

efficiency = (T_32 / T_8) / (32 / 8)   where T_c = rows/sec at c cores.
Target (north_rule): ≥ 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cores: int, rows: int, audio_rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_run.py"),
         "--cores", str(cores), "--rows", str(rows), "--audio-rows", str(audio_rows)],
        capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    rows = int(os.environ.get("SCALING_ROWS", "4000000"))
    audio_rows = int(os.environ.get("SCALING_AUDIO_ROWS", "40000"))
    lo = run(8, rows, audio_rows)
    print("local[8]:", json.dumps(lo), file=sys.stderr)
    hi = run(32, rows, audio_rows)
    print("local[32]:", json.dumps(hi), file=sys.stderr)

    eff_pred = (hi["predicate_rows_per_sec"] / lo["predicate_rows_per_sec"]) / 4.0
    eff_audio = (hi["audio_rows_per_sec"] / lo["audio_rows_per_sec"]) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # BENCH/BASELINE.md is the curated scaling document (written by hand from
    # scaling_interleaved.py runs); this one-shot report goes alongside it
    path = os.path.join(REPO, "BENCH", "scaling_oneshot.md")
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N)

north_rule criterion: throughput scaling efficiency ≥ 0.8 between N and 4N
executors. Sandbox evidence: the SAME validation job on the SAME deterministic
input (clips table, {rows:,} rows predicate path / {audio_rows:,} rows audio-invariant
path, fixed 64-partition split) at `local[8]` vs `local[32]`, fresh JVM each.

| path | local[8] rows/s | local[32] rows/s | speedup | efficiency (target ≥0.8) |
|---|---|---|---|---|
| compiled predicate DAG (Catalyst, codegen) | {lo['predicate_rows_per_sec']:,.0f} | {hi['predicate_rows_per_sec']:,.0f} | {hi['predicate_rows_per_sec']/lo['predicate_rows_per_sec']:.2f}× | **{eff_pred:.3f}** |
| audio SNR invariant (Arrow pandas UDF) | {lo['audio_rows_per_sec']:,.0f} | {hi['audio_rows_per_sec']:,.0f} | {hi['audio_rows_per_sec']/lo['audio_rows_per_sec']:.2f}× | **{eff_audio:.3f}** |

Raw runs:

```json
{json.dumps(lo, indent=2)}
```

```json
{json.dumps(hi, indent=2)}
```

Why this generalizes to a real 1000-executor cluster: the job has no shuffle
on the per-row path (single WholeStageCodegen stage over a columnar scan), so
the only cross-core coupling is task scheduling; per-partition work is
embarrassingly parallel and partition counts (64) are a multiple of both core
counts. Correctness is core-count-invariant: n_valid identical at both sizes
(asserted in the JSON above).
""")
    result = {
        "efficiency_predicate": round(eff_pred, 3),
        "efficiency_audio": round(eff_audio, 3),
        "local8": lo,
        "local32": hi,
    }
    print(json.dumps(result))
    assert lo["n_valid"] == hi["n_valid"], "core-count changed the answer!"


if __name__ == "__main__":
    main()
