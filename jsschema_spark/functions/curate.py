"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, built from the engine's own operators.

Stages (each one a documented engine primitive, all lazily composed —
shuffle inventory: one hash-agg for exact dedup, the LSH band equi-join +
verification for near-dups, one anti-join for canonical filtering):

1. **validity** — drop null/empty text, optionally enforce a JSON-Schema
   on metadata columns (compiled Catalyst predicates, no Python).
2. **quality** — ``text.quality_score`` threshold (single projection).
3. **exact dedup** — 64-bit fingerprint ``min_by`` keep-first.
4. **near-dup canonical** — MinHash-LSH pairs → true-Jaccard verify →
   connected components → keep the minimum-id doc per group.

``curate_documents`` returns ``(kept_df, report)`` where ``report`` counts
the rows surviving each stage. Counting costs one action per stage —
acceptable for a batch curation job whose stages each scan anyway; pass
``with_report=False`` for a single fully-lazy plan.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsschema_spark.functions.dedup import (
    connected_components,
    exact_dedup,
    keep_canonical,
    near_duplicates_minhash,
)
from jsschema_spark.functions.text import quality_score


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    near_dup_threshold: Optional[float] = 0.85,
    num_hashes: int = 64,
    bands: int = 16,
    with_report: bool = True,
) -> "tuple[DataFrame, dict]":
    """Run the full curation pipeline; see module docstring.

    ``min_quality``: 0 disables the quality gate (validity still applies).
    ``near_dup_threshold``: ``None`` skips the near-dup stage (exact dedup
    only)."""
    report: dict = {}
    if with_report:
        report["n_input"] = df.count()

    valid = df.where(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    if min_quality > 0.0:
        valid = valid.where(quality_score(F.col(text_col)) >= min_quality)
    if with_report:
        report["n_valid"] = valid.count()

    exact = exact_dedup(valid, text_col, id_col)
    if with_report:
        report["n_after_exact"] = exact.count()

    kept = exact
    if near_dup_threshold is not None:
        pairs = near_duplicates_minhash(
            exact, id_col, text_col, num_hashes, bands, threshold=near_dup_threshold
        )
        groups = connected_components(pairs)
        kept = keep_canonical(exact, groups, id_col)
    if with_report:
        report["n_kept"] = kept.count()
        report["n_dropped"] = report["n_input"] - report["n_kept"]
    return kept, report
