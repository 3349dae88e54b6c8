"""Approximate-nearest-neighbor similarity search over an embedding column.

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query set,
  one pass over the corpus, per-query top-k via window. The baseline and the
  oracle for the approximate paths. Corpus-side work is embarrassingly
  parallel; the only shuffle is the final per-query top-k (tiny: k rows per
  partition per query after partial filtering).
* ``lsh_topk`` — the scale path: random-hyperplane buckets (deterministic
  literal planes) with multi-probe (flip each bit once ⇒ dim+1 probes),
  so queries only score vectors in matching buckets. Equi-join on bucket id
  → Catalyst picks broadcast/SMJ; at 10^12 vectors the corpus side is
  bucket-partitioned once and reused across query batches.
* ``ivf_topk`` — IVF variant: corpus assigned to the nearest of C seeded
  centroids (centroids sampled deterministically from the corpus itself),
  queries probe the nprobe nearest centroids.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsschema_spark.functions.dedup import _dot, cosine, hyperplane_bucket


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    corpus_id: str = "vec_id", query_id: str = "query_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cos, rank). Queries are
    broadcast — keep the query batch ≤ a few MB; corpus scan stays fully
    parallel with no corpus-side shuffle before the top-k."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(q).select(
        "query_id", "vec_id", cosine(F.col("cv"), F.col("qv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _multi_probe_buckets(vec, dim: int, n_planes: int, seed: int):
    """Bucket id + single-bit-flip probes (n_planes+1 bucket candidates)."""
    base = hyperplane_bucket(vec, dim, n_planes, seed)
    return F.array(base, *[base.bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)])


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, dim: int = 64,
    n_planes: int = 8, seed: int = 42,
    corpus_id: str = "vec_id", query_id: str = "query_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose hyperplane bucket
    matches the query's bucket or any 1-bit probe of it."""
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(_multi_probe_buckets(F.col(vec_col), dim, n_planes, seed)).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id", cosine(F.col("cv"), F.col("qv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_train(
    corpus: DataFrame, n_centroids: int = 16, iters: int = 2, seed: int = 42,
    corpus_id: str = "vec_id", vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means centroids for the IVF index: deterministic
    hash-ordered corpus sample as init, then ``iters`` Lloyd rounds —
    assign each vector to its max-dot centroid (one scan, codegen), new
    centroid = per-dimension mean of the cell (posexplode → groupBy(cell,
    dim).avg — map-side combined, n_centroids×dim tiny rows cross the
    shuffle), L2-normalized so max-dot ordering == cosine ordering.

    Driver holds only the centroid matrix (n_centroids × dim floats);
    every heavy step is a distributed scan/aggregate. Refined cells cut
    the probe fan-out a query needs for a given recall versus sampled
    centroids."""
    import math

    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(corpus_id), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_train: empty corpus")
    # a corpus smaller than n_centroids can only seed len(rows) clusters
    n_centroids = min(n_centroids, len(rows))

    def normalize(v: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    cents = [normalize([float(x) for x in r[0]]) for r in rows]
    v = F.col(vec_col)
    for _ in range(max(0, iters)):
        scored = F.array(
            *[
                F.struct(
                    (-_dot(v, F.array(*[F.lit(x) for x in c]))).alias("neg"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(cents)
            ]
        )
        # cell assignment and posexplode in SEPARATE selects: a generator in
        # the same projection rewrites sibling struct literals' field names
        # to col1/col2 (Spark generator-output normalization), breaking the
        # ["cid"] access
        assigned = corpus.select(
            F.array_sort(scored)[0]["cid"].alias("cell"), v.alias("__v")
        ).select("cell", F.posexplode("__v").alias("dim", "val"))
        means = (
            assigned.groupBy("cell", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["dim"]] = float(r["m"])
        dim = len(cents[0])
        cents = [
            normalize([by_cell[i].get(d, 0.0) for d in range(dim)]) if i in by_cell else cents[i]
            for i in range(n_centroids)
        ]
    return cents


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, n_centroids: int = 16,
    nprobe: int = 4, seed: int = 42,
    corpus_id: str = "vec_id", query_id: str = "query_id", vec_col: str = "embedding",
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF: deterministic sample of the corpus as centroids (or pass the
    ``ivf_train`` spherical-k-means refinement via ``centroids``); corpus
    rows assigned to the nearest centroid (one scan); queries probe the
    nprobe nearest centroid cells. At 10^12 rows the assignment is written
    once (bucketed table) and reused."""
    if centroids is not None:
        cents = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    else:
        cents = [
            (i, [float(x) for x in r[0]])
            for i, r in enumerate(
                corpus.select(vec_col).orderBy(F.xxhash64(F.col(corpus_id), F.lit(seed))).limit(n_centroids).collect()
            )
        ]

    def nearest(vec, n: int):
        scored = F.array(
            *[
                F.struct(
                    (-_dot(vec, F.array(*[F.lit(x) for x in cvec]))).alias("neg"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cvec in cents
            ]
        )
        return F.slice(F.array_sort(scored), 1, n)

    c = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(vec_col).alias("cv"),
        nearest(F.col(vec_col), 1)[0]["cid"].alias("cell"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(F.transform(nearest(F.col(vec_col), nprobe), lambda s: s["cid"])).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").select(
        "query_id", "vec_id", cosine(F.col("cv"), F.col("qv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.dropDuplicates(["query_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
