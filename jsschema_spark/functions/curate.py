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

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
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
    metadata_schema: "Optional[dict]" = None,
    groups: "Optional[DataFrame]" = None,
    max_rep_ngram: "Optional[float]" = None,
    min_logprob: "Optional[float]" = None,
    redact: bool = False,
) -> "tuple[DataFrame, dict]":
    """Run the full curation pipeline; see module docstring.

    ``min_quality``: 0 disables the quality gate (validity still applies).
    ``near_dup_threshold``: ``None`` skips the near-dup stage (exact dedup
    only). ``metadata_schema``: a JSON-Schema dict compiled once into the
    validity stage's Catalyst predicate (rows failing it are dropped with
    the blanks — no Python in the plan). ``groups``: a precomputed
    near-dup group table (``doc_id, group_id`` — e.g. from
    ``connected_components`` over pairs produced against a persisted
    ``write_minhash_index``); when given, the pipeline skips the full
    MinHash-LSH pass and goes straight to the canonical anti-join, so a
    production run that already maintains a signature index doesn't pay
    the signature+band join again. Groups covering docs the earlier
    stages dropped are harmless — ``keep_canonical`` joins on the
    surviving ids only.

    Round-5 gates, all still inside the single validity projection:
    ``max_rep_ngram`` drops docs whose duplicate-3-gram fraction exceeds
    it (Gopher-style repetition filter); ``min_logprob`` drops docs below
    the corpus-statistical perplexity-proxy floor (scored against the
    VALIDITY-surviving corpus' own unigram distribution — one extra vocab
    aggregate + token join, only when enabled); ``redact=True`` scrubs
    PII (email/phone/IPv4) from the surviving text as a final codegen
    projection — dedup runs on the ORIGINAL text, so two docs differing
    only in their PII are not silently merged."""
    report: dict = {}
    if with_report:
        report["n_input"] = df.count()

    valid = df.where(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    if metadata_schema is not None:
        from jsschema_spark import parse_schema
        from jsschema_spark.compiler import TableValidator

        tv = TableValidator(parse_schema(metadata_schema), df.schema)
        valid = valid.where(tv.valid_column())
    if min_quality > 0.0:
        valid = valid.where(quality_score(F.col(text_col)) >= min_quality)
    if max_rep_ngram is not None:
        from jsschema_spark.functions.text import ngram_repetition

        valid = valid.where(
            ngram_repetition(F.col(text_col), 3) <= float(max_rep_ngram)
        )
    if min_logprob is not None:
        from jsschema_spark.functions.text import unigram_logprob

        valid = unigram_logprob(valid, text_col, id_col, out_col="__lp").where(
            F.col("__lp") >= float(min_logprob)
        ).drop("__lp")
    if with_report:
        report["n_valid"] = valid.count()

    exact = exact_dedup(valid, text_col, id_col)
    if with_report:
        report["n_after_exact"] = exact.count()

    kept = exact
    if groups is not None:
        kept = keep_canonical(exact, groups, id_col)
    elif near_dup_threshold is not None:
        # the exact-dedup output feeds BOTH the signature pipeline and the
        # canonical anti-join (and the report count): checkpoint the
        # deduped table once instead of re-running the min_by aggregation
        # per consumer (lazy — materializes on first action)
        exact = exact.localCheckpoint(eager=False)
        pairs = near_duplicates_minhash(
            exact, id_col, text_col, num_hashes, bands, threshold=near_dup_threshold
        )
        groups = connected_components(pairs)
        kept = keep_canonical(exact, groups, id_col)
    if redact:
        from jsschema_spark.functions.text import redact_pii

        kept = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    if with_report:
        report["n_kept"] = kept.count()
        report["n_dropped"] = report["n_input"] - report["n_kept"]
    return kept, report


# --------------------------------------------------------------------------
# deterministic sampling — training-data mixes under per-stratum quotas


def _stable_order(id_col: str):
    """Content-independent, engine-portable ordering key: md5 of the id's
    string form (DuckDB's md5 of the same string is identical, so external
    SQL oracles can reproduce the exact sample)."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_cols: "Sequence[str]",
    n_per_stratum: int,
    id_col: str = "doc_id",
    prefilter: bool = True,
    over_factor: float = 4.0,
    fallback: str = "lazy",
) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum,
    deterministically: rows rank by md5(id) within their stratum and the
    first n survive. Same input ⇒ same sample, on any cluster size.

    Scale shape: a bare ``row_number`` window ships EVERY row to its
    stratum's reducer and sorts there — a hot stratum (half the corpus in
    one language) becomes one giant task. ``prefilter=True`` (default)
    first computes per-stratum counts (map-side-combined agg, output rows
    = #strata), joins them back (AQE picks broadcast when small — not
    forced, so a million-stratum key table cannot OOM the driver), and
    keeps only rows whose hash-fraction ≤ ``over_factor·n/count`` before
    the exact window — the sort input is ~``over_factor·n`` rows per
    stratum regardless of corpus size. The md5-order top-n is a uniform
    sample, so the n-th hash fraction concentrates at n/count and the
    prefilter keeps every window survivor except with exponentially small
    probability; a per-stratum shortfall check (aggregate-sized) re-runs
    the rare failing strata without the prefilter, making the result
    EXACT, not approximate.

    ``fallback`` picks how that guard composes:

    * ``"lazy"`` (default) — pure-plan: the redo branch is part of the
      returned DataFrame and evaluates over zero rows when nothing fell
      short. Side-effect-free, but its semi-join probe side scans the
      input once more EVERY run.
    * ``"driver"`` — a stratum-level count action checks for shortfall at
      call time and only builds the redo branch when one exists. One
      tiny action in the common case instead of an extra full scan — the
      right trade at 100 TB; prefer it for very large inputs."""
    if fallback not in ("lazy", "driver"):
        raise ValueError("fallback must be 'lazy' or 'driver'")
    n = int(n_per_stratum)
    if n <= 0:
        raise ValueError("n_per_stratum must be positive")
    strata = list(strata_cols)
    base = df.withColumn("__ord", _stable_order(id_col))
    w = Window.partitionBy(*strata).orderBy(F.col("__ord").asc(), F.col(id_col).asc())

    if not prefilter:
        return (
            base.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n)
            .drop("__ord", "__rk")
        )

    counts = base.groupBy(*strata).agg(F.count(F.lit(1)).alias("__cnt"))
    joined = base.join(counts, strata, "inner")
    frac = F.conv(F.substring("__ord", 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(over_factor)) * F.lit(float(n)) / F.col("__cnt")
    )
    sampled = (
        joined.where(frac <= rate)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
    )
    # materialized once for its two consumers (yield check + output)
    sampled = sampled.localCheckpoint(eager=False)

    # exactness guard, composed LAZILY — no driver-side action, no API
    # side effect: every stratum must yield min(n, count) rows. The
    # shortfall set joins the per-stratum yield back onto the COUNTS
    # table — a stratum whose every row the prefilter dropped is absent
    # from the yield aggregate entirely, and only the counts side still
    # knows it exists. When nothing fell short (the overwhelmingly common
    # case) `short` is empty, the redo branch evaluates over zero rows,
    # and the anti-join passes `sampled` through unchanged.
    got = sampled.groupBy(*strata).agg(F.count(F.lit(1)).alias("__got"))
    short = (
        counts.join(got, strata, "left")
        .where(
            F.coalesce(F.col("__got"), F.lit(0)) < F.least(F.lit(n), F.col("__cnt"))
        )
        .select(*strata)
    )
    if fallback == "driver":
        if short.limit(1).count() == 0:  # stratum-level rows: tiny action
            return sampled.drop("__rk", "__cnt", "__ord")
        short = short.localCheckpoint(eager=False)
    redo = base.join(short, strata, "left_semi")
    fixed = (
        redo.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__rk", "__ord")
    )
    kept_ok = sampled.join(short, strata, "left_anti").drop(
        "__rk", "__cnt", "__ord"
    )
    return kept_ok.unionByName(fixed)


def top_per_stratum(
    df: DataFrame,
    strata_cols: "Sequence[str]",
    order_col: str,
    n: int,
    id_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """Top-``n`` rows per stratum by ``order_col`` (default: highest
    first) — e.g. the n highest-quality documents per language.
    Deterministic: ties break on ``id_col`` ascending.

    Scale shape — two-phase, NOT a bare window: a ``row_number`` window
    ships every row of a stratum to one reducer and sorts there. Phase 1
    aggregates a local top-n per (input partition, stratum) —
    ``collect_list`` is bounded by the partition's own rows, and only
    ``n`` survivors per partition-stratum cross the shuffle (≤ n·P rows
    per stratum, P = #partitions). Phase 2 re-aggregates those candidates
    to the global top-n. Every row that belongs in the global top-n is in
    some partition's local top-n, so the result is exact.

    Rows with a null ``order_col`` are dropped (a null score cannot rank)."""
    if n <= 0:
        raise ValueError("n must be positive")
    strata = list(strata_cols)
    df = df.where(F.col(order_col).isNotNull())
    sign = F.col(order_col) if ascending else -F.col(order_col)
    item = F.struct(
        sign.alias("__o"),
        F.col(id_col).alias("__id"),
        F.struct(*df.columns).alias("__row"),
    )

    def local_topn(frame: DataFrame, keys: list) -> DataFrame:
        return frame.groupBy(*keys).agg(
            F.slice(F.array_sort(F.collect_list(F.col("__item"))), 1, n).alias("__top")
        )

    with_item = df.withColumn("__item", item)
    phase1 = local_topn(
        with_item.withColumn("__pid", F.spark_partition_id()), ["__pid", *strata]
    )
    candidates = phase1.select(
        *strata, F.explode("__top").alias("__item")
    )
    phase2 = local_topn(candidates, strata)
    return (
        phase2.select(F.explode("__top").alias("__item"))
        .select("__item.__row.*")
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token-window chunks of ≤ ``max_tokens``
    whitespace tokens with ``overlap`` tokens of context carried between
    consecutive chunks — the upstream companion of ``pack_sequences``
    (which drops over-long docs). Short docs come through as their own
    single chunk (chunk 0); null/empty text yields no rows.

    Pure Catalyst: tokenize once, ``sequence`` over chunk starts,
    ``posexplode``, ``slice`` + ``array_join`` per chunk — whole-stage
    codegen, no shuffle, no Python. Output: ``id_col, chunk_idx,
    chunk_text, n_tokens``."""
    from jsschema_spark.functions.text import tokens

    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not (0 <= overlap < max_tokens):
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = tokens(F.col(text_col))
    base = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("__toks"))
        .where(F.size("__toks") > 0)
    )
    # chunk starts: 1, 1+stride, ... — up to the last index that begins a
    # NEW chunk (any start past len - overlap would only repeat context)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__toks") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    exploded = base.select(
        id_col,
        F.size("__toks").alias("__len"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        F.col("__toks"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start"), max_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.least(
            F.lit(max_tokens), F.col("__len") - F.col("__start") + 1
        ).cast("long").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_col: "Optional[str]" = None,
    text_col: str = "text",
    docs_per_partition: int = 200_000,
) -> DataFrame:
    """Greedy sequence packing for pretraining: assign docs to fixed-
    capacity packs of ``seq_len`` tokens (first-fit-decreasing inside
    each partition). Docs longer than ``seq_len`` are dropped (they get
    chunked upstream, not packed). Output: input rows + ``n_tokens``,
    ``pack_id`` (globally unique string ``<partition>-<local id>``).

    Exact bin packing is NP-hard and inherently sequential, so the
    distributed shape is partition-local packing: docs spread over
    partitions by md5(id) (deterministic, so re-runs pack identically),
    each partition best-fit-packs its own docs in an Arrow-batched pandas
    loop, and pack ids are namespaced by partition. Packing waste is
    ≤ ~22% worst-case and a few % in practice at partition sizes of
    ~10^5 docs; cross-partition packing could only merge the few open
    bins per partition, so the lost utilization is O(P/N) — negligible
    at scale.

    Two shape guarantees inside the UDF:

    * **Bin state persists across Arrow batches.** A partition larger
      than ``spark.sql.execution.arrow.maxRecordsPerBatch`` arrives as
      multiple pandas batches; open-bin capacities and the pack-id
      counter are hoisted OUTSIDE the per-batch loop, so pack ids never
      collide across batches and no pack exceeds ``seq_len`` (docs are
      size-sorted within each batch — best-fit keeps later batches
      correct even though the global descending order is per-batch).
    * **Best-fit via a capacity-bucketed index, not a linear bin scan.**
      Each doc placement is O(log #distinct-capacities): a sorted list
      of distinct remaining capacities (≤ ``seq_len`` entries) plus a
      min-heap of bin ids per capacity — smallest fitting capacity,
      ties to the lowest bin id, so assignment is a pure deterministic
      function of the sorted doc stream. The round-4 first-fit list
      scan was O(docs × open-bins) Python — quadratic-ish at real
      partition sizes."""
    import pandas as pd

    from jsschema_spark.functions.text import token_count

    tok = F.col(token_col) if token_col else token_count(F.col(text_col))
    base = (
        df.withColumn("__n_tok", tok.cast("long"))
        .where(F.col("__n_tok").isNotNull() & (F.col("__n_tok") > 0)
               & (F.col("__n_tok") <= seq_len))
    )
    n_parts = max(1, int(base.count() // docs_per_partition) or 1)
    spread = base.repartition(
        n_parts, F.md5(F.col(id_col).cast("string"))
    )

    out_fields = [f"{f.name}" for f in spread.schema.fields]

    def pack(batches):
        import bisect
        import heapq

        # per-PARTITION state, shared by every Arrow batch of the stream
        caps: list = []   # sorted distinct remaining capacities of open bins
        bins_at: dict = {}  # capacity -> min-heap of bin ids at that capacity
        next_bin = 0

        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(pack_id=pd.Series(dtype="string"))
                continue
            part = int(pdf["__part_id"].iloc[0]) if "__part_id" in pdf else 0
            pdf = pdf.sort_values(
                ["__n_tok", id_col], ascending=[False, True], kind="mergesort"
            )
            assign = []
            for n in pdf["__n_tok"].to_numpy():
                n = int(n)
                i = bisect.bisect_left(caps, n)
                if i < len(caps):  # smallest capacity that fits
                    c = caps[i]
                    heap = bins_at[c]
                    b = heapq.heappop(heap)
                    if not heap:
                        del bins_at[c]
                        caps.pop(i)
                    rem = c - n
                else:  # no open bin fits: open a new one
                    b = next_bin
                    next_bin += 1
                    rem = seq_len - n
                if rem > 0:
                    if rem in bins_at:
                        heapq.heappush(bins_at[rem], b)
                    else:
                        bins_at[rem] = [b]
                        bisect.insort(caps, rem)
                assign.append(f"{part}-{b}")
            yield pdf.assign(pack_id=assign)

    with_part = spread.withColumn("__part_id", F.spark_partition_id())
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in with_part.schema.fields
    ) + ", pack_id string"
    packed = with_part.mapInPandas(pack, schema)
    return packed.select(
        *[c for c in out_fields if c != "__n_tok"],
        F.col("__n_tok").alias("n_tokens"),
        "pack_id",
    )


def leakage_free_split(
    df: DataFrame,
    groups: DataFrame,
    train_frac: float = 0.8,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Train/eval split with NO near-dup leakage: every member of a
    near-dup group (``connected_components`` output: ``doc_id,
    group_id``) lands on the same side, because the split decision hashes
    the GROUP id — ungrouped docs hash their own id. Deterministic
    (md5-fraction < ``train_frac`` ⇒ 'train'), cluster-size invariant,
    and engine-portable for SQL oracles.

    One left join against the group table (violations-sized relative to
    the corpus — AQE broadcasts it) plus a codegen projection."""
    if not (0.0 <= train_frac <= 1.0):
        raise ValueError("train_frac must be in [0, 1]")
    g = groups.select(
        F.col("doc_id").alias(id_col), F.col("group_id").alias("__grp")
    )
    joined = df.join(g, id_col, "left")
    key = F.coalesce(F.col("__grp"), F.col(id_col))
    frac = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("double") / F.lit(float(1 << 32))
    return joined.withColumn(
        split_col, F.when(frac < train_frac, F.lit("train")).otherwise(F.lit("eval"))
    ).drop("__grp")


def weighted_sample(
    df: DataFrame,
    strata_cols: "Sequence[str]",
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, n per stratum
    (Efraimidis–Spirakis): each row gets key ``ln(u)/w`` with ``u`` a
    uniform hash-fraction of its id, and the n LARGEST keys win — row
    inclusion probability is proportional to weight, yet the same input
    always yields the same sample (no RNG state, cluster-size invariant).

    Rows with null or non-positive weight are dropped. Built on
    ``top_per_stratum``, so it inherits the two-phase no-window scale
    shape (≤ n·P candidate rows per stratum cross the shuffle)."""
    if n <= 0:
        raise ValueError("n must be positive")
    w = F.col(weight_col)
    df = df.where(w.isNotNull() & (w > 0))
    # u strictly inside (0,1): 60-bit md5 fraction, shifted off both ends
    frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float((1 << 60) + 2))
    scored = df.withColumn("__es_key", F.log(frac) / w)
    return top_per_stratum(
        scored, strata_cols, "__es_key", n, id_col=id_col
    ).drop("__es_key")


def token_budget_sample(
    df: DataFrame,
    strata_cols: "Sequence[str]",
    token_budget: int,
    id_col: str = "doc_id",
    token_col: "Optional[str]" = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum token-budget cap for building training mixes: take docs
    in the same stable md5(id) order and keep each doc iff the running
    token total INCLUDING it stays ≤ ``token_budget``. Deterministic and
    engine-portable (a SQL cumulative-sum window reproduces it exactly).

    Scale shape — two-phase prefix scan, NOT a bare per-stratum window.
    ``Window.partitionBy(stratum)`` over the raw stream ships EVERY row
    of a stratum to one reducer and sorts there — a hot stratum (half the
    corpus in one language) becomes one giant single-task sort. Instead,
    each stratum is split into ``16^seg_chars`` LOGICAL segments by the
    leading hex chars of the md5 ordering key — segments are contiguous
    ranges of the sort order (hex prefix order == string order), uniform
    in size (md5 is uniform), and pure functions of the row, so no
    physical-partition identity, range-sampling pass, or checkpoint is
    involved:

    1. **Segment-local cumsum**: one window partitioned by
       ``(strata…, __seg)`` — every window group holds ~``1/16^k`` of its
       stratum, so a hot stratum spreads over many reducers.
    2. **Prefix offsets**: per-(stratum, seg) token totals aggregate to
       ``#strata × 16^k`` rows (map-side combined); a cumulative window
       over THAT tiny table yields each segment's exclusive prefix,
       joined back (AQE broadcasts it).

    The global cumulative sum per row is ``local_cum + segment_offset``
    — exact long arithmetic, identical to the single-window formulation,
    so results are bit-stable across cluster sizes and the SQL oracle
    still reproduces them. ``seg_chars=2`` (256 segments) suits up to
    ~10^9-row strata; raise it when a single stratum segment would still
    overwhelm one reducer."""
    from jsschema_spark.functions.text import token_count

    tok = F.col(token_col) if token_col else token_count(F.col(text_col))
    strata = list(strata_cols)
    seg_chars = 2
    base = (
        df.withColumn("__ord", _stable_order(id_col))
        .withColumn("__tok", tok.cast("long"))
        .withColumn("__seg", F.substring(F.col("__ord"), 1, seg_chars))
    )
    w_local = (
        Window.partitionBy(*strata, "__seg")
        .orderBy(F.col("__ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__cum_local", F.sum("__tok").over(w_local))
    # totals from ``base``, not from the windowed stream: the partial agg
    # collapses each task's rows to ≤ #strata×16^k rows BEFORE its shuffle,
    # so the totals branch costs a column-pruned second scan and a tiny
    # exchange — whereas aggregating ``local`` would recompute the window
    # (full-width shuffle + sort) because differing pruned projections
    # keep ReusedExchange from firing (measured, not assumed).
    totals = base.groupBy(*strata, "__seg").agg(F.sum("__tok").alias("__seg_tok"))
    w_prefix = (
        Window.partitionBy(*strata)
        .orderBy(F.col("__seg").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        *strata,
        "__seg",
        (F.sum("__seg_tok").over(w_prefix) - F.col("__seg_tok")).alias("__offset"),
    )
    return (
        local.join(offsets, [*strata, "__seg"], "inner")
        .where(F.col("__cum_local") + F.col("__offset") <= int(token_budget))
        .drop("__ord", "__tok", "__seg", "__cum_local", "__offset")
    )
