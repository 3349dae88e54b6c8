"""Generators for driver-layout corpora at arbitrary scale (synth_tables):
determinism, partition-invariance, schema parity, and constant dup rates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsschema_spark import synth_tables as ST


def test_documents_schema_and_rates(spark):
    d = ST.documents_table(spark, 12000).cache()
    try:
        assert d.columns == ["doc_id", "text", "lang", "source", "n_chars"]
        assert d.count() == 12000
        # exact dups: ids 1 and 6001 repeat their predecessor's text
        n_dup = d.count() - d.select("text").distinct().count()
        assert n_dup == 2
        pairs = {(0, 1), (6000, 6001)}
        for a, b in pairs:
            ta, tb = [
                r.text
                for r in d.where(F.col("doc_id").isin(a, b)).orderBy("doc_id").collect()
            ]
            assert ta == tb
        # near dups: id%433==2 repeats id-2 plus a trailing token
        ta, tb = [
            r.text
            for r in d.where(F.col("doc_id").isin(433 * 3, 433 * 3 + 2))
            .orderBy("doc_id")
            .collect()
        ]
        assert tb == ta + " extra trailing token"
        # language mix close to the driver's (~41% en)
        langs = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
        assert set(langs) == {"en", "zh", "es", "fr", "de"}
        assert 0.35 < langs["en"] / 12000 < 0.47
        # n_chars consistent with text
        bad = d.where(F.length("text") != F.col("n_chars")).count()
        assert bad == 0
    finally:
        d.unpersist()


def test_documents_prefix_stable(spark):
    """Row i is identical at any table size — scale steps compare the same
    workload, just more of it."""
    small = {r.doc_id: r.text for r in ST.documents_table(spark, 300).collect()}
    big = {
        r.doc_id: r.text
        for r in ST.documents_table(spark, 900)
        .where(F.col("doc_id") < 300)
        .collect()
    }
    assert small == big


def test_embeddings_unit_norm_and_near_dups(spark):
    e = ST.embeddings_table(spark, 1000).cache()
    try:
        assert e.schema.simpleString() == (
            "struct<vec_id:bigint,embedding:array<float>,label:int>"
        )
        rows = e.where(F.col("vec_id").isin(0, 1, 2, 200, 201, 400, 401)).collect()
        v = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
        for x in v.values():
            assert abs(np.linalg.norm(x) - 1.0) < 1e-5
        # ids ≡ 1 (mod 200) are rotated copies of their predecessor with
        # cosine in the construction band
        for nid in (1, 201, 401):
            c = float(v[nid] @ v[nid - 1])
            assert 0.9955 - 1e-6 <= c <= 0.9995 + 1e-6, (nid, c)
        # organic neighbors are nowhere near that band
        assert float(v[1] @ v[2]) < 0.9
    finally:
        e.unpersist()


def test_embeddings_partition_invariant(spark):
    a = {
        r.vec_id: np.array(r.embedding)
        for r in ST.embeddings_table(spark, 400).collect()
    }
    b = {
        r.vec_id: np.array(r.embedding)
        for r in ST.embeddings_table(spark, 400, partitions=7).collect()
    }
    assert a.keys() == b.keys()
    assert all(np.array_equal(a[k], b[k]) for k in a)


def test_events_and_lineitem_shapes(spark):
    ev = ST.events_table(spark, 20000).cache()
    li = ST.lineitem_table(spark, 20000).cache()
    try:
        assert ev.columns == ["event_id", "ts", "user_id", "event_type", "value", "props"]
        types = {r.event_type for r in ev.select("event_type").distinct().collect()}
        assert types == {"click", "view", "signup", "error", "purchase"}
        span = ev.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi"),
            F.countDistinct("user_id").alias("u"),
        ).collect()[0]
        assert span.lo.year == 2024 and (span.hi - span.lo).days <= 30
        assert 200 < span.u <= 20000 // 50
        # props parse as JSON with an integer k
        parsed = ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        ).where(F.col("k").isNull())
        assert parsed.count() == 0

        assert li.columns == [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ]
        agg = li.agg(
            F.min("l_quantity"), F.max("l_quantity"),
            F.min("l_discount"), F.max("l_discount"),
        ).collect()[0]
        assert agg[0] >= 1.0 and agg[1] <= 50.0 and agg[2] >= 0.0 and agg[3] <= 0.10
        flags = {r.l_returnflag for r in li.select("l_returnflag").distinct().collect()}
        assert flags == {"A", "N", "R"}
    finally:
        ev.unpersist()
        li.unpersist()


def test_write_corpus_dir_feeds_entry_queries(spark, tmp_path):
    """A generated corpus dir is a drop-in for the driver layout: the
    unmodified entry queries run over it."""
    import __spark_entry__ as E

    out = str(tmp_path / "corpus")
    ST.write_corpus_dir(spark, out, docs=600, emb=300, events=2000, lineitem=4000)
    qs = E.queries()
    assert qs["exact_dup_documents"](spark, out).count() >= 0
    assert qs["stats_lineitem"](spark, out).count() == 3
    assert qs["session_stats_events"](spark, out).count() > 0
    assert qs["ivf_topk"](spark, out).count() > 0


def test_orders_customer_shapes(spark, tmp_path):
    ot = ST.orders_table(spark, 8000).cache()
    ct = ST.customer_table(spark, 800).cache()
    try:
        assert ot.columns == [
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ]
        st = {r.o_orderstatus for r in ot.select("o_orderstatus").distinct().collect()}
        assert st == {"O", "F", "P"}
        agg = ot.agg(F.min("o_totalprice"), F.max("o_totalprice"),
                     F.countDistinct("o_custkey")).collect()[0]
        assert agg[0] >= 900.0 and agg[1] <= 451000.0 and 400 <= agg[2] <= 800
        assert ct.columns == [
            "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ]
        assert ct.where(~F.col("c_name").rlike("^Customer#[0-9]{9}$")).count() == 0
        assert ct.agg(F.max("c_nationkey")).collect()[0][0] <= 24
    finally:
        ot.unpersist()
        ct.unpersist()
