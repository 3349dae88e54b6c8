#!/usr/bin/env python
"""Per-query isolation harness for optimization work (bench.py is FROZEN for
measurement; this file exists so optimization evidence can be gathered without
touching it — guide §1.4).

Usage:
  python bench_extra.py q1 q2 ...            # time named queries (min-of-N)
  python bench_extra.py --plans q1 q2 ...    # also write plans/<tag>/<q>.txt
  env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
       BENCH_EXTRA_REPEATS (default 2), BENCH_EXTRA_TAG (plan dir suffix)

Timing methodology matches bench.py exactly: `q(spark, sf_dir).count()`,
min-of-N.  Use --noop to time a full-column noop sink instead of count().
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    tag = os.environ.get("BENCH_EXTRA_TAG", "r07")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from jsschema_spark.session import build_session

    spark = build_session(
        app_name="jsschema-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "spark.executorEnv.PYTHONPATH": os.pathsep.join(
                p for p in [os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("PYTHONPATH", "")] if p
            ),
        },
    )
    qs = entry_mod.queries()
    times = {}
    for name in args:
        q = qs[name]
        if "--plans" in flags:
            os.makedirs(f"plans/{tag}", exist_ok=True)
            df = q(spark, sf_dir)
            with open(f"plans/{tag}/{name}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        runs = []
        for i in range(repeats):
            if name == "near_dup_groups":
                entry_mod._ND_GROUPS_MEMO.clear()
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            if "--noop" in flags:
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                q(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        times[name] = min(runs)
        print(f"{name}: min={min(runs)} runs={runs}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": sf_dir, "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
