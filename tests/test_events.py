"""Event-stream operators: gap sessionization and the distributed as-of
join, pinned against plain-Python reimplementations."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ev(uid, minutes, eid):
    return (eid, uid, T0 + dt.timedelta(minutes=minutes))


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: two sessions split by a 90-minute gap
        _ev(1, 0, 0), _ev(1, 10, 1), _ev(1, 25, 2),
        _ev(1, 115, 3), _ev(1, 120, 4),
        # user 2: one event
        _ev(2, 5, 5),
        # user 3: every event exactly 30 minutes apart — gap is EXCLUSIVE
        # (> gap starts a session), so this stays ONE session
        _ev(3, 0, 6), _ev(3, 30, 7), _ev(3, 60, 8),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_gap_semantics(spark, events):
    from jsschema_spark.functions.events import sessionize

    out = sessionize(events, "user_id", "ts", gap="30 minutes", order_cols=["event_id"])
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0, 7: 0, 8: 0}


def test_session_stats(spark, events):
    from jsschema_spark.functions.events import session_stats

    out = session_stats(events, "user_id", "ts", gap="30 minutes", order_cols=["event_id"])
    rows = {(r.user_id, r.session_idx): r for r in out.collect()}
    assert len(rows) == 4
    s = rows[(1, 0)]
    assert s.n_events == 3 and s.duration_us == 25 * 60 * 1_000_000
    assert rows[(1, 1)].n_events == 2
    assert rows[(2, 0)].n_events == 1 and rows[(2, 0)].duration_us == 0
    assert rows[(3, 0)].n_events == 3


def test_asof_join_backward_inclusive(spark):
    from jsschema_spark.functions.events import asof_join

    clicks = spark.createDataFrame(
        [
            (100, 1, T0 + dt.timedelta(minutes=10)),
            (101, 1, T0 + dt.timedelta(minutes=20)),
            (102, 1, T0 + dt.timedelta(minutes=5)),   # before any error -> null
            (103, 2, T0 + dt.timedelta(minutes=15)),  # equal-ts match (inclusive)
            (104, 3, T0 + dt.timedelta(minutes=9)),   # user with no errors at all
        ],
        "click_id long, user_id long, ts timestamp",
    )
    errors = spark.createDataFrame(
        [
            (1, T0 + dt.timedelta(minutes=8), 1.5),
            (1, T0 + dt.timedelta(minutes=18), 2.5),
            (1, T0 + dt.timedelta(minutes=30), 9.9),  # after every click
            (2, T0 + dt.timedelta(minutes=15), 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(clicks, errors, on="user_id", left_ts="ts", right_ts="ts")
    got = {r.click_id: (r.asof_ts, r.asof_value) for r in out.collect()}
    assert len(got) == 5
    assert got[100] == (T0 + dt.timedelta(minutes=8), 1.5)
    assert got[101] == (T0 + dt.timedelta(minutes=18), 2.5)
    assert got[102] == (None, None)
    assert got[103] == (T0 + dt.timedelta(minutes=15), 7.0)  # ts tie matches
    assert got[104] == (None, None)


def test_asof_join_matches_python_reference(spark):
    """Randomized (deterministic-seed) corpus vs a brute-force Python
    as-of: every left row, every key, both match and no-match cases."""
    import random

    from jsschema_spark.functions.events import asof_join

    rng = random.Random(7)
    lrows = [
        (i, rng.randrange(6), T0 + dt.timedelta(seconds=rng.randrange(10_000)))
        for i in range(300)
    ]
    rrows = [
        (rng.randrange(6), T0 + dt.timedelta(seconds=rng.randrange(10_000)), float(i))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, v double")

    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    got = {r.lid: (r.asof_ts, r.asof_v) for r in out.collect()}

    by_key = {}
    for k, ts, v in rrows:
        by_key.setdefault(k, []).append((ts, v))
    for k in by_key:
        by_key[k].sort()
    for lid, k, ts in lrows:
        best = None
        for rts, v in by_key.get(k, []):
            if rts <= ts:
                best = (rts, v)
        assert got[lid] == (best or (None, None)), lid

def test_asof_join_duplicate_ts_deterministic(spark):
    """Two right rows at the same (key, ts): the largest payload tuple
    wins, on every run."""
    from jsschema_spark.functions.events import asof_join

    left = spark.createDataFrame(
        [(1, 1, T0 + dt.timedelta(minutes=10))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, T0 + dt.timedelta(minutes=5), 3.0),
         (1, T0 + dt.timedelta(minutes=5), 8.0)],
        "k long, ts timestamp, v double",
    )
    for _ in range(3):
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
        assert out[0].asof_v == 8.0


def test_asof_join_plan_single_exchange(spark):
    """The as-of join must stay a tagged-union + ONE per-key window — a
    range join or a second shuffle here is a scale regression."""
    from jsschema_spark.functions.events import asof_join

    left = spark.createDataFrame([(1, 1, T0)], "lid long, k long, ts timestamp")
    right = spark.createDataFrame([(1, T0, 1.0)], "k long, ts timestamp, v double")
    plan = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # no join operator of any kind
    assert plan.count("Window") == 1


def test_asof_join_null_keys_never_match(spark):
    """SQL equality semantics: a NULL-key left row matches nothing, and
    NULL-key or NULL-ts right rows match no one (a window partition would
    otherwise group the nulls together)."""
    from jsschema_spark.functions.events import asof_join

    left = spark.createDataFrame(
        [(1, None, T0), (2, 7, T0)], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(None, T0, 1.0), (7, None, 2.0), (7, T0, 3.0)],
        "k long, ts timestamp, v double",
    )
    got = {r.lid: r.asof_v for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert got == {1: None, 2: 3.0}


def test_asof_and_sessionize_property_based(spark):
    """Property-based check over many random event layouts: asof_join and
    sessionize agree with brute-force Python models. One Spark job per
    example is too slow for hypothesis' engine, so examples are drawn
    up-front from seeded RNGs and run as a batch."""
    import random

    from jsschema_spark.functions.events import asof_join, sessionize

    for seed in range(5):
        rng = random.Random(100 + seed)
        n_keys = rng.randrange(1, 5)
        lrows = [
            (i, rng.randrange(n_keys), T0 + dt.timedelta(seconds=rng.randrange(300)))
            for i in range(rng.randrange(1, 60))
        ]
        rrows = [
            (rng.randrange(n_keys + 1), T0 + dt.timedelta(seconds=rng.randrange(300)),
             float(i))
            for i in range(rng.randrange(0, 40))
        ]
        left = spark.createDataFrame(lrows, "lid long, k long, ts timestamp")
        right = spark.createDataFrame(rrows, "k long, ts timestamp, v double")

        got = {
            r.lid: r.asof_v
            for r in asof_join(left, right, "k", "ts", "ts").collect()
        }
        by_key: dict = {}
        for k, ts, v in rrows:
            by_key.setdefault(k, []).append((ts, v))
        for lid, k, ts in lrows:
            cands = [(rts, v) for rts, v in by_key.get(k, []) if rts <= ts]
            # operator tiebreak: max (ts, payload) among candidates
            want = max(cands)[1] if cands else None
            assert got[lid] == want, (seed, lid)

        # sessionize against a Python gap model (1-minute gap)
        sess = sessionize(left, "k", "ts", gap="1 minute", order_cols=["lid"])
        got_s = {r.lid: r.session_idx for r in sess.collect()}
        for k in {k for _, k, _ in lrows}:
            evs = sorted(
                ((ts, lid) for lid, kk, ts in lrows if kk == k)
            )
            idx = -1
            prev = None
            for ts, lid in evs:
                if prev is None or (ts - prev).total_seconds() > 60:
                    idx += 1
                assert got_s[lid] == idx, (seed, lid)
                prev = ts
        assert max(got_s.values()) >= 0


def test_funnel_counts(spark):
    """Ordered funnel: users count only when steps happen strictly in
    order; earliest-completion semantics verified against a Python
    model, including a user whose purchase precedes their click."""
    import datetime as dt

    from jsschema_spark.functions.events import funnel_counts

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, ty, minutes):
        return (u, ty, t0 + dt.timedelta(minutes=minutes))

    rows = [
        # u1: full funnel in order
        ev(1, "signup", 0), ev(1, "click", 5), ev(1, "purchase", 10),
        # u2: signup then click only
        ev(2, "signup", 0), ev(2, "click", 3),
        # u3: purchase BEFORE click -> stops after signup+click? purchase
        # at 2 < click at 4 -> no purchase after click
        ev(3, "signup", 0), ev(3, "purchase", 2), ev(3, "click", 4),
        # u4: click without signup -> counts nowhere
        ev(4, "click", 1), ev(4, "purchase", 2),
        # u5: two signups; earliest-completion uses the FIRST, so the
        # click between them still counts
        ev(5, "signup", 0), ev(5, "click", 1), ev(5, "signup", 2),
        ev(5, "purchase", 3),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r.step_idx: (r.step, r.n_users)
        for r in funnel_counts(df, ["signup", "click", "purchase"]).collect()
    }
    assert out[0] == ("signup", 4)   # u1 u2 u3 u5
    assert out[1] == ("click", 4)    # all four clicked after first signup
    assert out[2] == ("purchase", 2) # u1, u5 only


def test_retention_cohorts(spark):
    """Retention triangle: cohort by first-event week, count active users
    per later week — verified against a Python model."""
    import datetime as dt

    from jsschema_spark.functions.events import retention_cohorts

    mon = dt.datetime(2026, 1, 5)  # a Monday

    def ev(u, days):
        return (u, mon + dt.timedelta(days=days))

    rows = [
        ev(1, 0), ev(1, 8), ev(1, 15),   # cohort w0, active w0 w1 w2
        ev(2, 1), ev(2, 16),             # cohort w0, active w0 w2
        ev(3, 7), ev(3, 9),              # cohort w1 (two events same week)
        ev(4, 20),                       # cohort w2 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_week), r.week_idx): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got[("2026-01-05", 0)] == 2
    assert got[("2026-01-05", 1)] == 1   # only u1 came back in week 1
    assert got[("2026-01-05", 2)] == 2   # u1 and u2
    assert got[("2026-01-12", 0)] == 1   # u3
    assert got[("2026-01-19", 0)] == 1   # u4
    assert len(got) == 5


def test_transition_counts(spark):
    """Per-user consecutive pairs only; first events contribute nothing;
    ties break on the order column."""
    import datetime as dt

    from jsschema_spark.functions.events import transition_counts

    t0 = dt.datetime(2026, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0, 1, "a"), (1, t0 + s, 2, "b"), (1, t0 + 2 * s, 3, "a"),
        (2, t0, 4, "a"),                      # lone event: no transition
        (3, t0, 5, "x"), (3, t0, 6, "y"),     # tie → event_id order: x->y
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int, event_type string")
    out = {
        (r.src, r.dst): r.n
        for r in transition_counts(
            df, "user_id", "ts", "event_type", order_cols=["event_id"]
        ).collect()
    }
    assert out == {("a", "b"): 1, ("b", "a"): 1, ("x", "y"): 1}


def test_interval_join_semantics(spark):
    """Half-open [start, end): boundary start included, boundary end
    excluded; inverted intervals match nothing; keys scope the match;
    oversized intervals raise instead of exploding."""
    import datetime as dt

    import pytest as _pytest

    from jsschema_spark.functions.events import interval_join

    t0 = dt.datetime(2026, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    pts = spark.createDataFrame(
        [(1, "k1", ts(0)), (2, "k1", ts(90)), (3, "k2", ts(30)), (4, "k1", ts(120))],
        "pid int, k string, ts timestamp",
    )
    ivl = spark.createDataFrame(
        [
            (10, "k1", ts(0), ts(120)),    # catches pid 1 (start incl), 2; NOT 4 (end excl)
            (20, "k2", ts(0), ts(60)),     # catches pid 3 only (key scoped)
            (30, "k1", ts(60), ts(30)),    # inverted → nothing
        ],
        "wid int, k string, s timestamp, e timestamp",
    )
    out = sorted(
        (r.pid, r.wid)
        for r in interval_join(
            pts, ivl, "ts", "s", "e", keys=["k"], granularity_s=600
        ).collect()
    )
    assert out == [(1, 10), (2, 10), (3, 20)]
    with _pytest.raises(ValueError, match="coarsen"):
        interval_join(pts, ivl, "ts", "s", "e", keys=["k"], granularity_s=1,
                      max_buckets_per_interval=10)


def test_interval_join_no_keys_and_bucket_spans(spark):
    """Keyless join pairs every containing window; a point on a bucket
    boundary still matches an interval that only reaches it mid-bucket."""
    import datetime as dt

    from jsschema_spark.functions.events import interval_join

    t0 = dt.datetime(2026, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    pts = spark.createDataFrame([(1, ts(61))], "pid int, ts timestamp")
    ivl = spark.createDataFrame(
        [(10, ts(0), ts(62)), (20, ts(61), ts(90)), (30, ts(0), ts(61))],
        "wid int, s timestamp, e timestamp",
    )
    out = sorted(
        r.wid for r in interval_join(pts, ivl, "ts", "s", "e", granularity_s=3600).collect()
    )
    assert out == [10, 20]  # 30 ends exactly at the point → excluded


def test_time_to_conversion_semantics(spark):
    from jsschema_spark.functions.events import time_to_conversion

    df = spark.createDataFrame(
        [
            # u1: purchase BEFORE first view must not count; next one does
            (1, "2024-01-01 09:00:00", "purchase"),
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:00:30", "purchase"),
            (1, "2024-01-01 11:00:00", "purchase"),
            # u2: views but never converts -> null latency row
            (2, "2024-01-02 08:00:00", "view"),
            # u3: no view at all -> absent
            (3, "2024-01-03 08:00:00", "purchase"),
        ],
        "user_id long, ts string, event_type string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = {r["user_id"]: r for r in time_to_conversion(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["secs_to_convert"] == 30
    assert out[2]["first_conversion"] is None and out[2]["secs_to_convert"] is None


def test_rolling_distinct_actives_exact_and_sketch(spark):
    from jsschema_spark.functions.events import rolling_distinct_actives

    # user u repeats daily; extra users appear on specific days
    rows = []
    for d in range(1, 11):  # Jan 1..10
        rows.append((f"2024-01-{d:02d} 08:00:00", "u"))
    rows += [("2024-01-01 09:00:00", "a"), ("2024-01-05 09:00:00", "b"),
             ("2024-01-05 10:00:00", "b"), ("2024-01-09 23:00:00", "c")]
    df = spark.createDataFrame(rows, "ts_s string, user_id string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
    )
    exact = {r["period"].day: r["n_active"] for r in
             rolling_distinct_actives(df, "ts", "user_id", 3, exact=True).collect()}
    # day 1: {u,a}; day 3: window 1-3 -> {u,a}; day 5: 3-5 {u,b};
    # day 7: 5-7 {u,b}; day 8: 6-8 {u}; day 10: 8-10 {u,c}
    assert exact[1] == 2 and exact[3] == 2 and exact[5] == 2
    assert exact[7] == 2 and exact[8] == 1 and exact[10] == 2

    est = {r["period"].day: r["n_active"] for r in
           rolling_distinct_actives(df, "ts", "user_id", 3).collect()}
    assert est == exact  # HLL is exact at tiny cardinalities


def test_heartbeat_gaps(spark):
    from jsschema_spark.functions.events import heartbeat_gaps

    rows = [
        ("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:30:00"),
        ("a", "2024-01-01 03:30:00"),  # 3h gap
        ("b", "2024-01-01 00:00:00"),  # then silent to stream end
        ("c", "2024-01-01 04:00:00"),  # stream max
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {r["user_id"]: r for r in heartbeat_gaps(df, "ts", "user_id", 3600).collect()}
    assert out["a"]["n_events"] == 3 and out["a"]["max_gap_s"] == 10800.0
    assert out["a"]["n_gaps_over"] == 1
    assert out["a"]["trailing_gap_s"] == 1800.0
    assert out["b"]["max_gap_s"] is None and out["b"]["n_gaps_over"] == 0
    assert out["b"]["trailing_gap_s"] == 4 * 3600.0  # dead sensor
    assert out["c"]["trailing_gap_s"] == 0.0


def test_ab_test_report_aa_split_is_null_effect(spark):
    import pytest

    from jsschema_spark.functions.events import ab_test_report

    # 2000 users, deterministic conversion INDEPENDENT of the hash arm:
    # an A/A test — |z| must be small and the split near 50/50
    rows = [(f"u{i}", "buy" if i % 10 < 3 else "view") for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    r = ab_test_report(df, "user_id", F.col("event_type") == "buy").collect()[0]
    assert r["n_a"] + r["n_b"] == 2000
    assert abs(r["n_a"] - 1000) < 100  # hash split is balanced
    assert r["conv_a"] + r["conv_b"] == 600
    assert abs(r["z"]) < 3.0

    # deterministic: same input -> bit-identical report
    r2 = ab_test_report(df, "user_id", F.col("event_type") == "buy").collect()[0]
    assert r == r2


def test_time_weighted_avg_vs_plain_mean(spark):
    import pytest

    from jsschema_spark.functions.events import time_weighted_avg

    # value 10 held for 9s, then three rapid samples of 100 in the last 1s:
    # plain mean is dragged to 77.5, TWA stays near 10
    rows = [
        ("s", "2024-01-01 00:00:00", 10.0),
        ("s", "2024-01-01 00:00:09", 100.0),
        ("s", "2024-01-01 00:00:09.5", 100.0),
        ("s", "2024-01-01 00:00:10", 100.0),
        ("lone", "2024-01-01 00:00:00", 42.0),
    ]
    df = spark.createDataFrame(rows, "sensor string, ts_s string, v double").select(
        "sensor", F.col("ts_s").cast("timestamp").alias("ts"), "v"
    )
    out = {r["sensor"]: r for r in time_weighted_avg(df, "sensor", "ts", "v").collect()}
    s = out["s"]
    assert s["plain_avg"] == pytest.approx(77.5)
    assert s["twa"] == pytest.approx((10 * 9 + 100 * 1) / 10.0)  # = 19
    assert s["span_s"] == pytest.approx(10.0)
    assert out["lone"]["twa"] is None and out["lone"]["n_obs"] == 1


def test_burstiness_separates_bot_from_organic(spark):
    import pytest

    rows = []
    # metronome bot: exactly every 60s
    for i in range(20):
        rows.append(("bot", i * 60.0))
    # bursty: tight clusters separated by long silences
    t = 0.0
    for c in range(4):
        for j in range(5):
            rows.append(("bursty", t + j * 1.0))
        t += 3600.0
    rows.append(("lone", 0.0))
    df = spark.createDataFrame(rows, "user_id string, off double").select(
        "user_id",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_dt_interval(secs=F.col("off"))).alias("ts"),
    )
    from jsschema_spark.functions.events import burstiness_report

    out = {r["user_id"]: r for r in burstiness_report(df, "user_id", "ts").collect()}
    assert out["bot"]["burstiness"] == pytest.approx(-1.0, abs=1e-9)
    # 4 clusters bound the attainable B well below 1; 0.4 at this shape
    assert out["bursty"]["burstiness"] > 0.35
    assert out["lone"]["burstiness"] is None and out["lone"]["n_events"] == 1


def test_circadian_profile_concentration(spark):
    import pytest

    from jsschema_spark.functions.events import circadian_profile

    rows = []
    # human: all events 9-10am
    for i in range(48):
        rows.append(("human", f"2024-01-01 09:{i % 60:02d}:00"))
    # bot: uniform around the clock
    for h in range(24):
        rows.append(("bot", f"2024-01-01 {h:02d}:30:00"))
    df = spark.createDataFrame(rows, "src string, ts_s string").select(
        "src", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = {r["src"]: r for r in circadian_profile(df, "ts", "src").collect()}
    assert out["human"]["r_concentration"] > 0.99
    assert 9.0 <= out["human"]["peak_hour"] <= 10.0
    assert out["bot"]["r_concentration"] < 0.01  # uniform -> R ~ 0


def test_new_entity_rate(spark):
    import pytest

    rows = [
        ("u1", "2024-01-01 08:00:00"), ("u2", "2024-01-01 09:00:00"),
        ("u1", "2024-01-02 08:00:00"),  # returning
        ("u3", "2024-01-02 09:00:00"),  # new
        ("u1", "2024-01-02 10:00:00"),  # same user same day: no double count
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    from jsschema_spark.functions.events import new_entity_rate

    out = {r["period"].day: r for r in new_entity_rate(df, "ts", "user_id").collect()}
    assert out[1]["n_active"] == 2 and out[1]["n_new"] == 2
    assert out[2]["n_active"] == 2 and out[2]["n_new"] == 1
    assert out[2]["new_frac"] == pytest.approx(0.5)
