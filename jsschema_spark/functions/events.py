"""Event-stream operators: gap sessionization and a distributed as-of
join — the time-ordered companions to the validation/curation operators.

Both are single-shuffle designs: every computation is a per-key ordered
window, so the only movement is one hash partition on the key. No
cross joins, no per-row Python, no driver-side loops.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    order_cols: Optional[Sequence[str]] = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign gap-based session indices per user: a new session starts at
    the first event and whenever the time since the previous event exceeds
    ``gap`` (an interval literal). Adds ``session_col`` (0-based, per
    user) — ``(user_col, session_col)`` is the session key.

    Deterministic: events order by ``(ts, *order_cols)`` within the user —
    pass an id column in ``order_cols`` when timestamps can tie.

    Scale shape: one shuffle (hash on ``user_col``), one sort per
    partition; the lag and cumsum windows share partitioning and
    ordering, so the second Window operator reuses the first's exchange
    and sort. Skew is bounded by the busiest single user, not by corpus
    size."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}"))
    ).cast("long")
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("__new_session", new_session)
        .withColumn(session_col, F.sum("__new_session").over(cum) - 1)
        .drop("__new_session")
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    order_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-session aggregates after ``sessionize``: event count, start/end
    timestamps and duration in seconds. One additional map-side-combined
    aggregation on the session key (already co-partitioned by the
    sessionize shuffle, so AQE can plan it exchange-free)."""
    s = sessionize(df, user_col, ts_col, gap, order_cols)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        # timestamp_diff works on both TIMESTAMP and TIMESTAMP_NTZ
        # (unix_micros rejects NTZ, the type parquet event-time usually is)
        F.timestamp_diff("MICROSECOND", F.min(ts_col), F.max(ts_col)).alias(
            "duration_us"
        ),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Optional[Sequence[str]] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the LATEST right row
    with ``right_ts <= left_ts`` for the same ``on`` key (inclusive at
    equality); left rows with no prior right row get nulls. The classic
    point-in-time lookup (event → latest snapshot/state before it).

    NOT implemented as a join: a range-join explodes (every left row
    matches every earlier right row before the aggregate). Instead both
    streams are tagged and unioned, and ONE per-key ordered window carries
    the last-seen right payload forward (``last(ignorenulls)``) — right
    rows sort before left rows at equal timestamps, which is what makes
    the match inclusive. One shuffle on the key; window state is O(1).

    Output: every left column plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each of ``value_cols`` (default: all right columns
    except the key and timestamp)."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
    )
    # SQL equality never matches NULL keys, but a window PARTITION BY
    # groups nulls together — drop null-key/null-ts right rows so a
    # null-key left row gets a null match, exactly like an ASOF LEFT JOIN
    right = right.where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left.columns,
    )
    # __payload as the final ordering key makes duplicate-(key, ts) right
    # rows resolve deterministically (largest payload tuple wins) instead
    # of by partition-internal arrival order
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc(), F.col("__payload").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__match.__ts").alias(f"{prefix}{right_ts}"))
    out_cols += [F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return carried.where(F.col("__tag") == 1).select(*out_cols)


def funnel_counts(
    df: DataFrame,
    steps: "Sequence[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    users completed it IN ORDER — a user counts for step i iff they have
    an event of type ``steps[i]`` STRICTLY AFTER their earliest
    qualifying time for step i-1 (earliest-completion semantics: each
    level keeps the user's minimal completion time, which maximizes the
    chance of completing later steps, so the count is the true "can this
    prefix be completed in order" answer). Output: one row per step —
    ``(step, step_idx, n_users)``.

    Scale shape: level 0 is one map-side-combined min-aggregate keyed by
    user; each later level is a filtered join against the (shrinking)
    previous level keyed by user plus another min-aggregate — K-1 joins
    for K steps, no windows, no collect_list of event histories (a hot
    user costs nothing beyond their event count). Each level is lazily
    localCheckpoint'd so level k's plan doesn't re-run levels 0..k-1 per
    downstream count."""
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    u, e, t = F.col(user_col), F.col(type_col), F.col(ts_col)
    cur = (
        df.where(e == steps[0])
        .groupBy(user_col)
        .agg(F.min(t).alias("__t"))
        .localCheckpoint(eager=False)
    )
    levels = [cur]
    for s in steps[1:]:
        nxt = df.where(e == s).select(u.alias("__u2"), t.alias("__ts2"))
        cur = (
            nxt.join(cur, nxt["__u2"] == cur[user_col])
            .where(F.col("__ts2") > F.col("__t"))
            .groupBy("__u2")
            .agg(F.min("__ts2").alias("__t"))
            .withColumnRenamed("__u2", user_col)
            .localCheckpoint(eager=False)
        )
        levels.append(cur)
    spark = df.sparkSession
    out = None
    for i, (s, lv) in enumerate(zip(steps, levels)):
        row = lv.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(s).alias("step"),
            F.lit(i).cast("int").alias("step_idx"),
            F.col("n_users").cast("long"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: users are cohorted by the week of their
    FIRST event; for every (cohort, weeks-since-cohort) cell, how many of
    that cohort's users were active — the standard retention triangle.
    Output: ``(cohort_week, week_idx, n_users)``; ``week_idx=0`` row is
    the cohort size. Weeks are ``date_trunc('week')`` (Monday-start, the
    same convention SQL engines use, so oracles align).

    Scale shape: one map-side-combined min per user (cohort assignment),
    one distinct over (user, week) — shuffle width = active user-weeks,
    already far smaller than events — a user-keyed join, and a final
    (cohort, idx) count-agg. No windows; a hot user contributes one row
    per active week regardless of event volume."""
    u, t = F.col(user_col), F.col(ts_col)
    cohorts = (
        df.groupBy(user_col)
        .agg(F.date_trunc("week", F.min(t)).alias("__cohort"))
    )
    active = (
        df.select(u, F.date_trunc("week", t).alias("__wk"))
        .distinct()
    )
    return (
        active.join(cohorts, user_col)
        .select(
            F.col("__cohort").cast("date").alias("cohort_week"),
            (F.datediff(F.col("__wk").cast("date"), F.col("__cohort").cast("date"))
             / 7).cast("int").alias("week_idx"),
        )
        .groupBy("cohort_week", "week_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def transition_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    order_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """First-order Markov transition counts over per-user event streams:
    for every consecutive pair of events within a user, count
    ``(src_state, dst_state)``. Each user's first event has no
    predecessor and contributes nothing. Output: ``(src, dst, n)`` —
    the empirical transition matrix behaviour models and anomaly
    screens start from.

    Deterministic: events order by ``(ts, *order_cols)`` within the
    user — pass an id column when timestamps can tie.

    Scale shape: ONE shuffle (hash on the user key) feeding one lag
    window, then a map-side-combined count on ``(src, dst)`` whose
    shuffle width is #distinct state pairs — vocabulary-sized, never
    event-sized. Skew is bounded by the busiest single user."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    return (
        df.select(
            F.col(user_col),
            F.col(state_col).alias("dst"),
            F.lag(F.col(state_col)).over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    keys: Optional[Sequence[str]] = None,
    granularity_s: int = 3600,
    max_buckets_per_interval: int = 10_000,
    anchor: str = "1970-01-01 00:00:00",
) -> DataFrame:
    """Distributed point-in-interval join: each point row pairs with every
    interval row whose half-open window ``[start, end)`` contains its
    timestamp (optionally also matching on equi-``keys``). The classic
    "events × validity windows" join Spark has no native operator for —
    expressed as an equi-join so it never degenerates into the
    BroadcastNestedLoop/cartesian plan a raw range predicate produces.

    Mechanics: time is cut into ``granularity_s``-second buckets anchored
    at ``anchor`` (cast to each side's own timestamp type, so TIMESTAMP
    and TIMESTAMP_NTZ inputs both work and never mix). A point belongs to
    exactly ONE bucket; an interval explodes to every bucket it overlaps
    (``sequence`` + ``explode``). The join is then a pure equi-join on
    ``(*keys, bucket)`` with the exact containment predicate as a cheap
    post-filter — no duplicate pairs are ever produced, because the point
    side is never exploded.

    Scale shape: one shuffle on ``(*keys, bucket)`` — AQE broadcasts the
    exploded interval side when it is small (the usual case: dimension
    validity windows, incident/maintenance windows). Explode factor is
    ``len/granularity + 1`` per interval; a driver-side precheck (one
    map-side-combined MAX over the interval table) raises if any interval
    would explode past ``max_buckets_per_interval``, telling the caller to
    coarsen ``granularity_s`` instead of silently materializing a
    timeline-sized blow-up. Empty and inverted intervals (end <= start)
    match nothing and are dropped up front."""
    if granularity_s <= 0:
        raise ValueError("granularity_s must be positive")
    keys = list(keys or [])

    def bucket_of(df: DataFrame, col: Column) -> Column:
        a = F.lit(anchor).cast(df.schema[ts_col if df is points else start_col].dataType)
        return F.floor(
            F.timestamp_diff("SECOND", a, col) / F.lit(int(granularity_s))
        ).cast("long")

    ivl = intervals.where(F.col(end_col) > F.col(start_col))
    b_start = bucket_of(ivl, F.col(start_col))
    # end is exclusive: an interval ending exactly on a bucket boundary
    # does not reach into that bucket
    b_end = bucket_of(ivl, F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"))
    n_buckets = (b_end - b_start + 1).alias("__nb")

    worst = ivl.select(F.max(n_buckets).alias("m")).first()
    if worst and worst.m is not None and worst.m > max_buckets_per_interval:
        raise ValueError(
            f"an interval spans {worst.m} buckets at granularity_s="
            f"{granularity_s} (cap {max_buckets_per_interval}); coarsen "
            "granularity_s or raise max_buckets_per_interval"
        )

    exploded = ivl.withColumn("__bkt", F.explode(F.sequence(b_start, b_end)))
    pts = points.withColumn("__bkt", bucket_of(points, F.col(ts_col)))
    joined = pts.alias("p").join(
        exploded.alias("i"),
        [F.col(f"p.{k}") == F.col(f"i.{k}") for k in keys]
        + [F.col("p.__bkt") == F.col("i.__bkt")],
    )
    dup = [F.col(f"i.{k}") for k in keys]  # matched keys live on the point side
    return (
        joined.where(
            (F.col(f"p.{ts_col}") >= F.col(f"i.{start_col}"))
            & (F.col(f"p.{ts_col}") < F.col(f"i.{end_col}"))
        )
        .drop(*dup)
        .drop("__bkt")
    )


def cooccurrence_counts(
    df: DataFrame,
    entity_cols: Sequence[str],
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Market-basket co-occurrence: for every unordered pair of distinct
    ``item_col`` values, the number of entities (user, user×day, session)
    whose event set contains BOTH — the support counts an association /
    next-step-suggestion analysis starts from, and a feed-mixup screen
    (two event types that should never share a user suddenly co-occurring
    is an instrumentation bug).

    Output: ``(item_a, item_b, n_entities)`` with ``item_a < item_b``,
    support ≥ ``min_support``.

    Scale shape: ONE distinct-collapse aggregation keyed by entity
    (map-side combined, shuffle width = #entities × #distinct items per
    entity), then a per-entity ``collect_set`` whose size is bounded by
    the ITEM VOCABULARY (event types — tens, not millions), exploded to
    pairs entity-locally (≤ |vocab|²/2 rows per entity, no join), and a
    final vocabulary²-width count. No self-join ever touches the event
    table; the quadratic step runs on the collapsed per-entity sets."""
    keys = [F.col(c) for c in entity_cols]
    per_entity = (
        df.where(F.col(item_col).isNotNull())
        .select(*keys, F.col(item_col).alias("__item"))
        .distinct()
        .groupBy(*entity_cols)
        .agg(F.sort_array(F.collect_set("__item")).alias("__items"))
        .where(F.size("__items") >= 2)
    )
    pairs = per_entity.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__items"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("__items"), i + 2, F.size("__items")
                        ),
                        lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
        .where(F.col("n_entities") >= F.lit(min_support))
    )


def time_to_conversion(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_event: str = "view",
    conversion_event: str = "purchase",
) -> DataFrame:
    """Per-user latency from the FIRST ``start_event`` to the first
    ``conversion_event`` AT OR AFTER it — the funnel-timing metric
    (time-to-purchase, time-to-error, time-to-first-response). Users who
    never start are absent; users who start and never convert carry null
    conversion fields (an unconverted user is signal, not a dropped row).

    Scale shape: two map-side-combined per-user min aggregates and one
    user-keyed join — no windows, no event-history collection; the
    conversion side pre-filters to conversion events before the join so
    the join input is conversion-sized, not feed-sized."""
    starts = (
        df.where(F.col(type_col) == start_event)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("first_start"))
    )
    convs = df.where(F.col(type_col) == conversion_event).select(
        F.col(user_col).alias("user"), F.col(ts_col).alias("__ct")
    )
    first_conv = (
        starts.join(convs, "user")
        .where(F.col("__ct") >= F.col("first_start"))
        .groupBy("user", "first_start")
        .agg(F.min("__ct").alias("first_conversion"))
    )
    return (
        starts.join(first_conv.select("user", "first_conversion"), "user", "left")
        .select(
            F.col("user").alias(user_col),
            "first_start",
            "first_conversion",
            F.timestamp_diff("SECOND", F.col("first_start"), F.col("first_conversion"))
            .cast("long")
            .alias("secs_to_convert"),
        )
    )


def rolling_distinct_actives(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    window_periods: int = 7,
    period: str = "day",
    exact: bool = False,
    lg_k: int = 14,
) -> DataFrame:
    """Rolling distinct actives (7-day active users and kin): for every
    period with data, the distinct ``id_col`` count over the trailing
    ``window_periods`` periods. COUNT(DISTINCT) OVER a range window
    doesn't exist in SQL engines for a reason — naively it re-scans the
    window per row; this is the scalable decomposition.

    Default path (the 100-TB one): ONE agg reduces the raw stream to a
    per-period DataSketches HLL sketch (``hll_sketch_agg`` — fixed size,
    mergeable, map-side-combined), then the trailing window is a
    broadcast self-join over the #periods-row sketch table +
    ``hll_union_agg`` — the windowing never touches row-scale data, so
    the estimate costs one scan regardless of window width.

    ``exact=True`` (oracle parity / test scale): dedupe to
    (period, id) pairs, broadcast-join the #periods anchor list with a
    range predicate (each pair expands to ≤ ``window_periods`` anchors),
    and COUNT(DISTINCT) per anchor — exact, at the price of a
    window-width row multiplication.

    Output: ``(period, n_active)`` — estimate rounded to a long on the
    sketch path (relative error ~1.6% at the default lg_k=14/16 KiB)."""
    p = F.date_trunc(period, F.col(ts_col))
    anchors_alias = "__anchor"
    lo = F.col(anchors_alias) - F.expr(
        f"INTERVAL {window_periods - 1} {period}"
    )
    in_window = F.col("__p").between(lo, F.col(anchors_alias))
    if exact:
        daily = df.select(p.alias("__p"), F.col(id_col).alias("__id")).distinct()
        anchors = daily.select(F.col("__p").alias(anchors_alias)).distinct()
        return (
            daily.join(F.broadcast(anchors), in_window)
            .groupBy(anchors_alias)
            .agg(F.count_distinct("__id").cast("long").alias("n_active"))
            .select(F.col(anchors_alias).alias("period"), "n_active")
        )
    sketches = df.groupBy(p.alias("__p")).agg(
        F.hll_sketch_agg(F.col(id_col).cast("string"), F.lit(lg_k)).alias("__sk")
    )
    anchors = sketches.select(F.col("__p").alias(anchors_alias))
    return (
        sketches.join(F.broadcast(anchors), in_window)
        .groupBy(anchors_alias)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"), F.lit(True)))
            .cast("long")
            .alias("n_active")
        )
        .select(F.col(anchors_alias).alias("period"), "n_active")
    )


def heartbeat_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    max_gap_s: float = 3600.0,
) -> DataFrame:
    """Dead-sensor / silent-source screen: per entity, the inter-event
    gap structure — ``n_events``, ``max_gap_s``, ``n_gaps_over`` (gaps
    exceeding the SLA), ``last_ts`` and ``trailing_gap_s`` (distance
    from the entity's last event to the STREAM's latest event — the
    "currently dead" signal; an entity whose history looks healthy but
    whose trailing gap is huge stopped reporting). Complements
    ``freshness_report`` (whole-table recency) and
    ``completeness_by_period`` (volume): this one is per-entity and
    gap-shaped.

    Scale shape: one lag window partitioned by entity (shuffle on the
    entity key — partition-local sort, the same shape as sessionize),
    one map-side-combined agg to #entities rows, and a scalar max
    broadcast via a window-free cross join of ONE row. The 100-TB
    caveat is the usual one: a pathologically hot entity serializes its
    own sort; salt the ENTITY ID upstream only if a single entity
    exceeds an executor's sort budget."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    # timestamp_diff keeps this working for TIMESTAMP and TIMESTAMP_NTZ
    # alike (a double cast is illegal on NTZ); µs precision, so fractional
    # seconds survive
    gap = (
        F.timestamp_diff("MICROSECOND", F.col("__prev"), F.col(ts_col)).cast("double")
        / F.lit(1e6)
    )
    per_entity = (
        df.select(entity_col, F.col(ts_col), F.lag(F.col(ts_col)).over(w).alias("__prev"))
        .withColumn("__gap", gap)
        .groupBy(entity_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("__gap").alias("max_gap_s"),
            F.coalesce(
                F.sum((F.col("__gap") > F.lit(max_gap_s)).cast("long")), F.lit(0)
            ).cast("long").alias("n_gaps_over"),
            F.max(ts_col).alias("last_ts"),
        )
    )
    stream_max = df.agg(F.max(ts_col).alias("__stream_max"))
    return per_entity.crossJoin(F.broadcast(stream_max)).withColumn(
        "trailing_gap_s",
        F.timestamp_diff(
            "MICROSECOND", F.col("last_ts"), F.col("__stream_max")
        ).cast("double")
        / F.lit(1e6),
    ).drop("__stream_max")


def ab_test_report(
    df: DataFrame,
    id_col: str,
    converted: Column,
    hash_fn=None,
    salt: str = "ab1",
) -> DataFrame:
    """Experiment-analysis primitive: deterministically hash-split
    entities 50/50 (same entity → same arm on every run and every
    engine), compute per-arm conversion, and the two-proportion pooled
    z-statistic — the end-to-end shape of an A/B readout, also the
    A/A-test harness for the pipeline itself (splitting on a hash and
    seeing |z| ≫ 2 with NO treatment means the metric computation, not
    the product, is broken).

    ``converted`` is any boolean Column evaluated per event row; an
    entity converts if ANY of its rows does. One row: ``n_a, n_b,
    conv_a, conv_b, rate_a, rate_b, lift, z`` (z null when a pooled
    variance degenerates).

    Scale shape: one hash agg to entities (map-side combine), one
    single-row agg folding both arms via conditional sums — no joins, no
    windows. Default hash is the portable md5 (oracle-reproducible);
    pass ``hash_fn=F.xxhash64`` on the 100-TB path."""
    from .dedup import portable_hash64

    h = hash_fn or (lambda c: portable_hash64(c))
    per_entity = df.groupBy(F.col(id_col).alias("__id")).agg(
        F.max(converted.cast("int")).alias("__conv")
    )
    arm = F.pmod(h(F.concat(F.col("__id").cast("string"), F.lit(salt))), F.lit(2))
    tagged = per_entity.withColumn("__arm", arm)
    agg = tagged.agg(
        F.sum(F.when(F.col("__arm") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("__arm") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(F.col("__arm") == 0, F.col("__conv"))), F.lit(0)).cast("long").alias("conv_a"),
        F.coalesce(F.sum(F.when(F.col("__arm") == 1, F.col("__conv"))), F.lit(0)).cast("long").alias("conv_b"),
    )
    ra = F.col("conv_a") / F.col("n_a")
    rb = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (rb - ra).alias("lift"),
        F.try_divide(rb - ra, se).alias("z"),
    )


def time_weighted_avg(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average per entity for irregularly-sampled values
    (sensor readings, account balances, queue depths): each observation
    counts for the TIME it was in force (until the next observation),
    not once per row — the arithmetic mean over-weights chatty periods
    exactly when something interesting (hence frequently-sampled) was
    happening. Step-function/last-observation-carried-forward semantics;
    the final observation has no successor and gets zero weight.

    Output: ``entity, n_obs, span_s, twa, plain_avg`` (``twa`` null for
    single-observation entities — no span to weight over; ``plain_avg``
    included so the bias the TWA corrects is visible in the output).

    Scale shape: one lead window partitioned by entity (sessionize's
    shuffle), one map-side-combined agg to #entities rows."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    nxt = F.lead(F.col(ts_col)).over(w)
    dt = (
        F.timestamp_diff("MICROSECOND", F.col(ts_col), nxt).cast("double")
        / F.lit(1e6)
    )
    obs = df.select(
        entity_col,
        F.col(value_col).alias("__v"),
        dt.alias("__dt"),
    )
    return obs.groupBy(entity_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.coalesce(F.sum("__dt"), F.lit(0.0)).alias("span_s"),
        F.try_divide(
            F.sum(F.col("__v") * F.col("__dt")), F.sum("__dt")
        ).alias("twa"),
        F.avg("__v").alias("plain_avg"),
    )


def burstiness_report(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Bot/automation signal from inter-arrival statistics: the
    burstiness parameter B = (σ − μ)/(σ + μ) of an entity's gaps
    (Goh & Barabási) — B → −1 is a metronome (cron jobs, scripted
    scrapers: near-constant gaps no human produces), B ≈ 0 is Poisson
    (organic arrivals), B → 1 is extreme bursts. A volume screen misses
    a bot that politely rate-limits itself; the REGULARITY of its gaps
    is what gives it away.

    Output: ``entity, n_events, mean_gap_s, std_gap_s, burstiness``
    (null with fewer than 3 events — no meaningful gap variance).

    Scale shape: one lag window partitioned by entity + one map-side-
    combined agg to #entities rows (heartbeat_gaps' plan with a second
    moment added)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    gap = (
        F.timestamp_diff(
            "MICROSECOND", F.lag(F.col(ts_col)).over(w), F.col(ts_col)
        ).cast("double")
        / F.lit(1e6)
    )
    per = df.select(entity_col, gap.alias("__gap")).groupBy(entity_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.avg("__gap").alias("mean_gap_s"),
        F.stddev_samp("__gap").alias("std_gap_s"),
    )
    b = F.try_divide(
        F.col("std_gap_s") - F.col("mean_gap_s"),
        F.col("std_gap_s") + F.col("mean_gap_s"),
    )
    return per.withColumn(
        "burstiness", F.when(F.col("n_events") >= 3, b)
    )


def circadian_profile(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: "Optional[str]" = None,
) -> DataFrame:
    """Circadian structure per group: the circular mean hour and the
    mean resultant length R of the hour-of-day angles (von Mises
    concentration) — R ≈ 1 means activity concentrates at one time of
    day (single-timezone humans), R ≈ 0 means activity is uniform
    around the clock (a bot farm, or a timezone-mangled ingest that
    smeared local times). A source whose peak hour sits 8h from the
    fleet's is a timezone bug wearing a usage pattern.

    Output: ``[group,] n_events, peak_hour, r_concentration`` —
    ``peak_hour`` is the circular mean in [0, 24).

    Scale shape: one map-side-combined agg of cos/sin sums keyed by the
    group (shuffle width = #groups); the angle math is pure codegen."""
    theta = (
        F.hour(F.col(ts_col)).cast("double")
        + F.minute(F.col(ts_col)).cast("double") / 60.0
    ) * (2.0 * math.pi / 24.0)
    gcols = [group_col] if group_col else []
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.avg(F.cos(theta)).alias("__c"),
        F.avg(F.sin(theta)).alias("__s"),
    )
    r = F.sqrt(F.col("__c") * F.col("__c") + F.col("__s") * F.col("__s"))
    mean_angle = F.atan2(F.col("__s"), F.col("__c"))
    peak = (mean_angle * (24.0 / (2.0 * math.pi)) + 24.0) % 24.0
    return agg.select(
        *gcols,
        "n_events",
        peak.alias("peak_hour"),
        r.alias("r_concentration"),
    )


def new_entity_rate(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    period: str = "day",
) -> DataFrame:
    """New-vs-returning decomposition per period: of the entities active
    in each period, how many had never been seen before — the two
    failure modes it pins are a REPLAY (0% new: every "arrival" already
    exists) and an ID-ROTATION bug (≈100% new: the join key changed
    under you and every returning user looks like a stranger). Between
    those poles it is the growth metric everybody hand-rolls wrong by
    double-counting periods.

    Output: ``(period, n_active, n_new, new_frac)``.

    Scale shape: dedupe to (period, entity) pairs (one agg), per-entity
    first period from that SAME reduced table (one more agg over pairs,
    not raw rows), broadcast-join the #entities first-seen table back,
    final per-period count — the raw stream is scanned once."""
    p = F.date_trunc(period, F.col(ts_col))
    pairs = df.select(p.alias("__p"), F.col(id_col).alias("__id")).distinct()
    first_seen = pairs.groupBy("__id").agg(F.min("__p").alias("__first"))
    joined = pairs.join(first_seen, "__id")
    return (
        joined.groupBy(F.col("__p").alias("period"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.coalesce(
                F.sum((F.col("__p") == F.col("__first")).cast("long")), F.lit(0)
            ).cast("long").alias("n_new"),
        )
        .withColumn("new_frac", F.col("n_new") / F.col("n_active"))
    )
