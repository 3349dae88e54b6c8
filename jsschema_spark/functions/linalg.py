"""Vectorized (Arrow-batched) dense linear algebra for the ANN paths.

Catalyst does not codegen higher-order functions, so a per-row
``F.aggregate(zip_with(...))`` dot product against C centroids costs C
interpreted 64-dim folds per row — the measured cost center of the round-3
IVF path (14.5s of a 71.7s suite). These helpers replace that with one
numpy matmul per Arrow batch inside an iterator pandas UDF: the projection
matrix (centroids / hyperplanes — at most a few thousand floats) is
captured as a closure literal, serialized once per executor, and every
batch of B vectors costs a single ``(B, dim) @ (dim, C)`` BLAS call.

This is the blessed vectorized-UDF shape (Arrow batch transfer, no per-row
Python) — NOT a contradiction of the documented HOF-vs-unrolled experiment
(BENCH/BASELINE.md), which compared two *expression* forms; this is
expression vs batched kernel.

Determinism note: numpy's matmul sums in a different order than the
sequential HOF fold, so near-tie argmax decisions can differ between the
two formulations. Consumers must therefore use the SAME formulation on
both sides of an index (corpus assignment and query probing) — identical
vectors then provably land in identical cells/buckets, which is the
invariant the oracles and the self-match tests rely on.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType


def _stack(s: pd.Series) -> "tuple[np.ndarray, np.ndarray]":
    """(mask of non-null rows, dense (n_valid, dim) float64 matrix)."""
    mask = s.notna().to_numpy()
    if mask.all():
        return mask, np.array(s.tolist(), dtype=np.float64)
    valid = s[mask]
    if len(valid) == 0:
        return mask, np.empty((0, 0), dtype=np.float64)
    return mask, np.array(valid.tolist(), dtype=np.float64)


def nearest_cells(vec: Column, centroids: "list[list[float]]", nprobe: int = 1) -> Column:
    """``array<int>`` of the ``nprobe`` nearest centroid ids by dot product
    (desc), ties broken by centroid id (asc — stable argsort). One matmul
    per Arrow batch; null vectors yield null."""
    C = np.asarray(centroids, dtype=np.float64)
    n = min(nprobe, C.shape[0])

    @F.pandas_udf(ArrayType(IntegerType()))
    def _nearest(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mask, M = _stack(s)
            if M.size:
                order = np.argsort(-(M @ C.T), axis=1, kind="stable")[:, :n].astype("int32")
                if mask.all():
                    yield pd.Series(list(order))
                    continue
                out = np.empty(len(s), dtype=object)
                out[:] = None
                for j, i in enumerate(np.flatnonzero(mask)):
                    out[i] = order[j]
                yield pd.Series(out)
            else:
                yield pd.Series([None] * len(s), dtype=object)

    return _nearest(vec)


def nearest_cell(vec: Column, centroids: "list[list[float]]") -> Column:
    """Single nearest centroid id (int) — corpus-side assignment."""
    return nearest_cells(vec, centroids, nprobe=1)[0]


def hyperplane_bucket_v(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id (long) against literal hyperplanes — the
    Arrow-batched hyperplane-LSH signature (bit i set iff
    ``vec·plane_i > 0``). Null vectors yield null."""
    P = np.asarray(planes, dtype=np.float64)
    weights = (np.int64(1) << np.arange(P.shape[0], dtype=np.int64))

    @F.pandas_udf(LongType())
    def _bucket(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mask, M = _stack(s)
            # Nullable Int64 built straight from the int64 matmul result —
            # never routed through a float64 buffer, which holds only 53
            # significant bits and silently corrupts wider packed
            # signatures (e.g. multi-seed 60-bit packs).
            vals = np.zeros(len(s), dtype=np.int64)
            if M.size:
                vals[mask] = ((M @ P.T) > 0).astype(np.int64) @ weights
            yield pd.Series(pd.arrays.IntegerArray(vals, ~mask))

    return _bucket(vec)


def hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic hyperplane matrix — same planes on every executor."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def anisotropy_report(df, vec_col: str = "embedding") -> "DataFrame":
    """Embedding-space collapse screen: the anisotropy score
    ``||E[v]||² / E[||v||²]`` ∈ [0, 1]. A healthy encoder spreads
    vectors around the origin (score near 0); a collapsed or
    mis-normalized one points everything the same way (score → 1) — the
    embedding-space analogue of a constant column, invisible to per-
    component marginals (each coordinate's histogram can look fine while
    every vector is the same). Complements ``vector_violations`` (NaN /
    dim / norm rules) and ``centroid drift`` (shift BETWEEN snapshots):
    this one judges the space's internal geometry in a single snapshot.

    One row: ``dim, n_vecs, mean_norm, rms_norm, anisotropy``.

    Scale shape: posexplode → ONE hash agg keyed by coordinate position
    (shuffle width = dim, map-side combine absorbs the n·dim value
    stream), then the fold runs over dim rows. JVM-only — no Python in
    the plan."""
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "val")).select(
        "pos", F.col("val").cast("double").alias("val")
    )
    per_pos = ex.groupBy("pos").agg(
        F.sum("val").alias("__s"),
        F.sum(F.col("val") * F.col("val")).alias("__s2"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    agg = per_pos.agg(
        F.count(F.lit(1)).cast("long").alias("dim"),
        F.max("__n").alias("n_vecs"),
        F.sum(F.pow(F.col("__s") / F.col("__n"), 2)).alias("__mean_sq"),
        (F.sum("__s2") / F.max("__n")).alias("__rms_sq"),
    )
    return agg.select(
        "dim",
        "n_vecs",
        F.sqrt("__mean_sq").alias("mean_norm"),
        F.sqrt("__rms_sq").alias("rms_norm"),
        F.try_divide(F.col("__mean_sq"), F.col("__rms_sq")).alias("anisotropy"),
    )
