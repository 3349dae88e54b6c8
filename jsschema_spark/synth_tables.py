"""Deterministic synthetic tables mirroring the driver corpus schemas.

The driver ships fixed-size parquet at sf{0.001,0.01,0.1} (read-only);
measuring how the ENGINE scales needs the same distributions at sizes the
driver doesn't provide. These generators reproduce the driver tables'
schemas and shape — word-salad documents with constant exact/near-dup
rates, unit-norm float32 embeddings with a constant rotated-near-dup
rate, a 30-day event stream, TPC-H-ish lineitem — as pure functions of
``(n, seed)``: the SAME id always gets the SAME row at any table size or
cluster size, and duplicate/near-duplicate RATES are constant in n, so
runtimes at two sizes are comparable workloads, not different problems.

Scale shape: documents/events/lineitem are single ``spark.range``
projections (codegen; zero shuffle, zero Python); embeddings use one
iterator pandas UDF whose per-row values derive from a vectorized
splitmix64 hash of ``(id, component)`` — partition-layout-independent,
no RNG state shared across rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the driver documents' visible vocabulary (engine/SQL words)
_VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge", "data",
]

# constant-rate duplicate injection periods (driver sf0.1: 8 exact-dup rows
# in 50k ⇒ ~1/6000; near-dup rate chosen to keep LSH pair counts growing
# linearly with n)
_EXACT_DUP_PERIOD = 6000
_NEAR_DUP_PERIOD = 433
_EMB_NEAR_DUP_PERIOD = 200


def _h(*cols) -> F.Column:
    """Non-negative 63-bit deterministic hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def documents_table(
    spark: SparkSession, n: int, seed: int = 42,
    partitions: Optional[int] = None,
    vocab_layout: str = "closed",
) -> DataFrame:
    """``(doc_id, text, lang, source, n_chars)`` word-salad documents:
    10-100 words drawn from the driver vocabulary, lang skewed like the
    driver corpus (~41% en), 20 sources. Ids where
    ``id % 6000 == 1`` repeat the previous id's text exactly; ids where
    ``id % 433 == 2`` repeat ``id-2``'s text plus a trailing token —
    constant exact/near-dup rates at any n.

    ``vocab_layout`` is the scale-step harness's text-distribution axis
    (the round-5 lesson: this one generator choice changed two operators'
    measured scaling exponents by 20×):

    * ``"closed"`` (default, the driver corpus's visible shape): the fixed
      26-word vocabulary. At 10× base size the 26³ trigram space SATURATES
      (every shingle df ~150) — the adversarial regime for raw-shingle
      candidate generation, where candidate density is inherently
      quadratic at full recall (the brute-force oracle is too).
    * ``"open"``: vocabulary of ``max(100, n // 25)`` synthetic words, so
      per-shingle document frequency stays roughly CONSTANT as n grows —
      the Zipf-bounded shape of a real growing web corpus, and the layout
      under which prefix-filtered candidate generation must measure
      near-linear. Dup-injection rates are identical in both layouts."""
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    sd = F.lit(seed)
    # text derives from a KEY, not the id: dup rows point their key at the
    # anchor row, so identical/near-identical text needs no self-join
    is_exact = (F.col("id") % _EXACT_DUP_PERIOD == 1) & (F.col("id") >= 1)
    is_near = (
        (F.col("id") % _NEAR_DUP_PERIOD == 2) & (F.col("id") >= 2) & ~is_exact
    )
    key = (
        F.when(is_exact, F.col("id") - 1)
        .when(is_near, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    nwords = (_h(key, sd, F.lit("nw")) % 91 + 10).cast("int")
    if vocab_layout == "closed":
        vocab = F.array(*[F.lit(w) for w in _VOCAB])
        word_at = lambda i: F.element_at(  # noqa: E731
            vocab, (_h(key, sd, i) % len(_VOCAB) + 1).cast("int")
        )
    elif vocab_layout == "open":
        v_size = max(100, n // 25)
        word_at = lambda i: F.concat(  # noqa: E731
            F.lit("w"), (_h(key, sd, i, F.lit("ov")) % v_size).cast("string")
        )
    else:
        raise ValueError(f"unknown vocab_layout: {vocab_layout!r}")
    words = F.transform(F.sequence(F.lit(1), nwords), word_at)
    text = F.concat(
        F.array_join(words, " "),
        F.when(is_near, F.lit(" extra trailing token")).otherwise(F.lit("")),
    )
    lang_h = _h(key, sd, F.lit("lang")) % 100
    lang = (
        F.when(lang_h < 41, "en")
        .when(lang_h < 56, "zh")
        .when(lang_h < 71, "es")
        .when(lang_h < 86, "fr")
        .otherwise("de")
    )
    source = F.concat(F.lit("src"), (_h(F.col("id"), sd, F.lit("src")) % 20))
    return base.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def embeddings_table(
    spark: SparkSession, n: int, dim: int = 64, seed: int = 42,
    partitions: Optional[int] = None,
) -> DataFrame:
    """``(vec_id, embedding float32[dim], label)`` unit-norm vectors whose
    components are pure functions of ``(vec_id, component, seed)`` via a
    vectorized splitmix64 → Box-Muller pipeline (no RNG state — identical
    output under any partitioning). Ids where ``id % 200 == 1`` are the
    previous id's vector rotated by an exact angle with
    cosθ ∈ [0.9955, 0.9995] — the near-identical-pair rate is constant in
    n (the same construction the recall tests use)."""
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)

    def _splitmix(z: np.ndarray) -> np.ndarray:
        z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return z ^ (z >> np.uint64(31))

    def _uniform(ids: np.ndarray, salt: int, k: int) -> np.ndarray:
        """(len(ids), k) uniforms in (0,1) from hash(id, component, salt)."""
        z = (
            ids[:, None].astype(np.uint64) * np.uint64(0x100000001B3)
            + np.arange(k, dtype=np.uint64)[None, :]
            + np.uint64(salt * 0x9E3779B1 + seed)
        )
        u = _splitmix(z).astype(np.float64) / float(2**64)
        return np.clip(u, 1e-12, 1 - 1e-12)

    def _normal(ids: np.ndarray, salt: int, k: int) -> np.ndarray:
        u1 = _uniform(ids, salt, k)
        u2 = _uniform(ids, salt + 7919, k)
        return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)

    def _unit_rows(ids: np.ndarray, salt: int) -> np.ndarray:
        m = _normal(ids, salt, dim)
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            v = _unit_rows(ids, 1)
            near = (ids % _EMB_NEAR_DUP_PERIOD == 1) & (ids >= 1)
            if near.any():
                anchor = _unit_rows(ids[near] - 1, 1)
                g = _normal(ids[near], 104729, dim)
                g -= np.sum(g * anchor, axis=1, keepdims=True) * anchor
                g /= np.linalg.norm(g, axis=1, keepdims=True)
                ct = 0.9955 + 0.004 * _uniform(ids[near], 15485863, 1)[:, 0]
                st = np.sqrt(1.0 - ct * ct)
                v[near] = ct[:, None] * anchor + st[:, None] * g
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [r.astype(np.float32) for r in v],
                    "label": (ids % 10).astype(np.int32),
                }
            )

    return base.mapInPandas(gen, "vec_id long, embedding array<float>, label int")


def events_table(
    spark: SparkSession, n: int, seed: int = 42,
    n_users: Optional[int] = None, partitions: Optional[int] = None,
) -> DataFrame:
    """``(event_id, ts, user_id, event_type, value, props)`` — 30 days of
    events from 2024-01-01, ~66 events/user (driver ratio), five event
    types, JSON props. Pure codegen projection of ``spark.range``."""
    users = n_users or max(1, n // 66)
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    sd = F.lit(seed)
    secs = (_h(F.col("id"), sd, F.lit("ts")) % (30 * 86400)).cast("double") + (
        _h(F.col("id"), sd, F.lit("us")) % 1000000
    ).cast("double") / 1e6
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), secs
    )
    etype = F.element_at(
        F.array(
            F.lit("click"), F.lit("view"), F.lit("signup"),
            F.lit("error"), F.lit("purchase"),
        ),
        (_h(F.col("id"), sd, F.lit("et")) % 5 + 1).cast("int"),
    )
    return base.select(
        F.col("id").alias("event_id"),
        ts.alias("ts"),
        (_h(F.col("id"), sd, F.lit("u")) % users).alias("user_id"),
        etype.alias("event_type"),
        ((_h(F.col("id"), sd, F.lit("v")) % 10000).cast("double") / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), (_h(F.col("id"), sd, F.lit("k")) % 100), F.lit("}")
        ).alias("props"),
    )


def lineitem_table(
    spark: SparkSession, n: int, seed: int = 42,
    partitions: Optional[int] = None,
) -> DataFrame:
    """TPC-H-ish lineitem with the driver's column set: ~4 lines/order,
    uniform quantity 1-50, price/discount/tax in TPC-H ranges, returnflag
    A/N/R with N dominant, shipdates over 1992-1998. Pure codegen."""
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    sd = F.lit(seed)
    rf_h = _h(F.col("id"), sd, F.lit("rf")) % 100
    ship_days = _h(F.col("id"), sd, F.lit("sd")) % (7 * 365)
    return base.select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (_h(F.col("id"), sd, F.lit("pk")) % 20000).alias("l_partkey"),
        (_h(F.col("id"), sd, F.lit("sk")) % 1000).alias("l_suppkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        (_h(F.col("id"), sd, F.lit("q")) % 50 + 1).cast("double").alias("l_quantity"),
        ((_h(F.col("id"), sd, F.lit("ep")) % 10400000).cast("double") / 100.0 + 900.0
         ).alias("l_extendedprice"),
        ((_h(F.col("id"), sd, F.lit("d")) % 11).cast("double") / 100.0).alias("l_discount"),
        ((_h(F.col("id"), sd, F.lit("t")) % 9).cast("double") / 100.0).alias("l_tax"),
        F.when(rf_h < 25, "A").when(rf_h < 50, "R").otherwise("N").alias("l_returnflag"),
        F.when(rf_h < 50, "F").otherwise("O").alias("l_linestatus"),
        (F.to_timestamp(F.lit("1992-01-01 00:00:00"))
         + F.make_dt_interval(ship_days.cast("int"), F.lit(0), F.lit(0), F.lit(0.0))
         ).alias("l_shipdate"),
    )


def orders_table(
    spark: SparkSession, n: int, seed: int = 42,
    n_customers: Optional[int] = None, partitions: Optional[int] = None,
) -> DataFrame:
    """TPC-H-ish orders with the driver's column set: ~10 orders/customer,
    status O/F/P with P rare, totalprice in TPC-H range, dates over
    1992-1998, five priorities. Pure codegen."""
    customers = n_customers or max(1, n // 10)
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    sd = F.lit(seed)
    st_h = _h(F.col("id"), sd, F.lit("st")) % 100
    o_days = _h(F.col("id"), sd, F.lit("od")) % (7 * 365)
    prio = F.element_at(
        F.array(
            F.lit("1-URGENT"), F.lit("2-HIGH"), F.lit("3-MEDIUM"),
            F.lit("4-NOT SPECIFIED"), F.lit("5-LOW"),
        ),
        (_h(F.col("id"), sd, F.lit("pr")) % 5 + 1).cast("int"),
    )
    return base.select(
        F.col("id").alias("o_orderkey"),
        (_h(F.col("id"), sd, F.lit("ck")) % customers).alias("o_custkey"),
        F.when(st_h < 49, "O").when(st_h < 98, "F").otherwise("P").alias("o_orderstatus"),
        ((_h(F.col("id"), sd, F.lit("tp")) % 45000000).cast("double") / 100.0 + 900.0
         ).alias("o_totalprice"),
        (F.to_timestamp(F.lit("1992-01-01 00:00:00"))
         + F.make_dt_interval(o_days.cast("int"), F.lit(0), F.lit(0), F.lit(0.0))
         ).alias("o_orderdate"),
        prio.alias("o_orderpriority"),
    )


def customer_table(
    spark: SparkSession, n: int, seed: int = 42,
    partitions: Optional[int] = None,
) -> DataFrame:
    """TPC-H-ish customer: name from the key, 25 nations, acctbal in
    TPC-H range, five market segments. Pure codegen."""
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    sd = F.lit(seed)
    seg = F.element_at(
        F.array(
            F.lit("AUTOMOBILE"), F.lit("BUILDING"), F.lit("FURNITURE"),
            F.lit("HOUSEHOLD"), F.lit("MACHINERY"),
        ),
        (_h(F.col("id"), sd, F.lit("seg")) % 5 + 1).cast("int"),
    )
    return base.select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")
                 ).alias("c_name"),
        (_h(F.col("id"), sd, F.lit("nk")) % 25).cast("int").alias("c_nationkey"),
        ((_h(F.col("id"), sd, F.lit("ab")) % 1109951).cast("double") / 100.0 - 999.99
         ).alias("c_acctbal"),
        seg.alias("c_mktsegment"),
    )


def write_corpus_dir(
    spark: SparkSession, out_dir: str, *,
    docs: int, emb: int, events: int, lineitem: int,
    seed: int = 42, partitions: Optional[int] = None,
    vocab_layout: str = "closed",
) -> None:
    """Materialize a driver-layout corpus directory (one parquet per
    table) at the given sizes — the input the scale-step harness feeds to
    the unmodified ``__spark_entry__.queries()`` callables.
    ``vocab_layout`` selects the documents text distribution (see
    ``documents_table``); all other tables are layout-independent."""
    documents_table(
        spark, docs, seed, partitions, vocab_layout=vocab_layout
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    embeddings_table(spark, emb, 64, seed, partitions).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    events_table(spark, events, seed, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/events.parquet")
    lineitem_table(spark, lineitem, seed, partitions).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )
    n_orders = max(1, lineitem // 4)
    orders_table(spark, n_orders, seed, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/orders.parquet")
    customer_table(spark, max(1, n_orders // 10), seed, partitions).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/customer.parquet")
