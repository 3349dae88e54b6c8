"""SparkSession builder tuned for the validation engine.

Defaults follow the scale guidance in SURVEY.md §4: AQE on (runtime
re-planning + skew-join handling), Arrow on (the pandas-UDF stages), and
shuffle partitions sized by the caller (tests: small; 100 TB cluster: ~2-3×
total cores, or let AQE coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "jsschema_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    executor_cores: int | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    # keep large (payload-sized) mallocs on the heap instead of per-alloc
    # mmap/munmap — measured >60% system-time at 32 workers without this
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "134217728")
    # ParallelGC: G1 collapses under many threads allocating large binary
    # cells (measured 8× scan slowdown at 32 threads / 24g heap reading a
    # WAV-payload column; ParallelGC restores linear scaling)
    exec_opts = "-XX:+UseParallelGC"
    if executor_cores:
        # with several executors per node, each JVM must be told its true
        # core allotment or it sizes GC/JIT/ForkJoin pools to the WHOLE node
        # (measured 7× slower at 4 executors × 4 cores on a 32-core box);
        # containerized clusters get this from cgroup cpu limits — set it
        # explicitly everywhere else
        exec_opts += (
            f" -XX:ActiveProcessorCount={executor_cores}"
            f" -XX:ParallelGCThreads={executor_cores} -XX:CICompilerCount=2"
        )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # InferFiltersFromConstraints rewrites inferred join-key IsNotNull
        # constraints THROUGH projections: a join keyed on a derived column
        # (lang_id, a hash, a scored bucket) gets `isnotnull(<whole derived
        # expression>)` pushed below the exchange into the scan stage, where
        # higher-order-function expressions evaluate INTERPRETED, per row,
        # per consumer branch (thread-dump verified: ArrayFilter.eval inside
        # the 2-task scan stage; stratified_sample 24.8s -> 4.3s at sf1.0
        # with the rule off). Our derived join keys are never null by
        # construction, so the inferred filters only burn CPU — scale-
        # independent, not a local[32] artifact.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # Same failure mode, different rule: InferFiltersFromGenerate turns
        # explode(derived_array) into a `size(expr)>0 AND isnotnull(expr)`
        # predicate that PushDownPredicates then drags through the
        # projection and the exchange into the scan stage — the shingle
        # HOF tree evaluated twice more per row, interpreted, at scan
        # parallelism (event-log verified on minhash_near_dups: 2-task map
        # stages burning 4-5s CPU each in StringSplit/ZipWith.eval).
        # explode of an empty/null array already emits nothing, so the
        # inferred filter only pays off when it prunes BEFORE an expensive
        # downstream op — never the case in this engine, where the array
        # itself is the expensive thing.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # AQE coalesces post-shuffle partitions by BYTES; candidate-pair
        # streams here are byte-tiny but CPU-heavy (array_intersect over
        # shingle sets: 11.8MB / 516k rows / 17s CPU coalesced onto 5
        # tasks at sf1.0 — containment 16.8s -> 13.2s with the floor
        # lowered). 64k only changes byte-tiny shuffles; production-sized
        # exchanges still coalesce to the advisory target.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # sized for binary-heavy rows (a 10k-row batch of ~240KB WAV payloads
        # is ~2.4GB per core — 1024 keeps Arrow transfer well under 256MB)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", exec_opts)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "134217728")
        # python workers must be able to import jsschema_spark (pandas-UDF
        # closures pickle by module reference) even when the driver script
        # runs from outside the repo; prepend, never clobber. On a real
        # cluster spark-submit --py-files supersedes this.
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p
                for p in [
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                ]
                if p
            ),
        )
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
