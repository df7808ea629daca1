"""Unit tests for ES transforms (transform.py) and EQL sequences (eql.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.eql import EqlError, eql_sequence
from elasticsearch_hadoop_spark.transform import (
    TransformError,
    run_transform,
    transform_latest,
    transform_pivot,
)


def test_pivot_terms_histogram(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 14.0)], "k string, v double"
    )
    out = transform_pivot(
        df,
        {
            "group_by": {
                "k": {"terms": {"field": "k"}},
                "bucket": {"histogram": {"field": "v", "interval": 10.0}},
            },
            "aggregations": {"total": {"sum": {"field": "v"}}},
        },
    )
    got = {(r["k"], r["bucket"]): r["total"] for r in out.collect()}
    assert got == {("a", 0.0): 4.0, ("b", 10.0): 24.0}


def test_pivot_rejects_bad_shapes(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(TransformError):
        transform_pivot(df, {"group_by": {}, "aggregations": {"s": {"sum": {"field": "v"}}}})
    with pytest.raises(TransformError):
        transform_pivot(df, {"group_by": {"k": {"terms": {"field": "k"}}}, "aggregations": {}})
    with pytest.raises(TransformError):
        # range is a bucket agg but NOT a legal pivot source
        transform_pivot(
            df,
            {
                "group_by": {"k": {"range": {"field": "v", "ranges": [{"to": 1}]}}},
                "aggregations": {"s": {"sum": {"field": "v"}}},
            },
        )


def test_latest_tiebreaker(spark):
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, t, 10, "old"), (1, t, 11, "new"), (2, t, 5, "only")],
        "uid int, ts timestamp, eid int, tag string",
    )
    out = transform_latest(df, "uid", "ts", tiebreaker="eid")
    got = {r["uid"]: r["tag"] for r in out.collect()}
    assert got == {1: "new", 2: "only"}


def test_run_transform_dispatch(spark):
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    assert run_transform(
        df,
        {
            "pivot": {
                "group_by": {"k": {"terms": {"field": "k"}}},
                "aggregations": {"s": {"sum": {"field": "v"}}},
            }
        },
    ).count() == 1
    with pytest.raises(TransformError):
        run_transform(df, {"settings": {}})


def _events(spark):
    rows = [
        # uid 1: view -> click -> purchase inside 1h (match)
        (1, dt.datetime(2024, 1, 1, 10, 0), "view"),
        (1, dt.datetime(2024, 1, 1, 10, 10), "click"),
        (1, dt.datetime(2024, 1, 1, 10, 20), "purchase"),
        # uid 2: click precedes view, purchase never follows (no match)
        (2, dt.datetime(2024, 1, 1, 9, 0), "click"),
        (2, dt.datetime(2024, 1, 1, 9, 30), "view"),
        # uid 3: full funnel but the purchase is 3 days later (maxspan kills)
        (3, dt.datetime(2024, 1, 1, 8, 0), "view"),
        (3, dt.datetime(2024, 1, 1, 8, 5), "click"),
        (3, dt.datetime(2024, 1, 4, 8, 0), "purchase"),
        # uid 4: equal-ts click must NOT satisfy strictly-after
        (4, dt.datetime(2024, 1, 1, 7, 0), "view"),
        (4, dt.datetime(2024, 1, 1, 7, 0), "click"),
        (4, dt.datetime(2024, 1, 1, 7, 30), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")


def test_eql_sequence_semantics(spark):
    df = _events(spark)
    steps = [
        {"term": {"event_type": "view"}},
        {"term": {"event_type": "click"}},
        {"term": {"event_type": "purchase"}},
    ]
    got = eql_sequence(df, by="user_id", ts="ts", steps=steps, maxspan="1 hour").collect()
    assert [r["user_id"] for r in got] == [1]
    r = got[0]
    assert r["step2_ts"] == dt.datetime(2024, 1, 1, 10, 10)
    assert r["step3_ts"] == dt.datetime(2024, 1, 1, 10, 20)
    # without maxspan, uid 3 also completes; uid 4 still blocked (equal ts)
    no_span = eql_sequence(df, by="user_id", ts="ts", steps=steps)
    assert sorted(r["user_id"] for r in no_span.collect()) == [1, 3]


def test_eql_earliest_match_binds_first_candidate(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), "view"),
        (1, dt.datetime(2024, 1, 1, 10, 5), "click"),
        (1, dt.datetime(2024, 1, 1, 10, 9), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    out = eql_sequence(
        df,
        by="user_id",
        ts="ts",
        steps=[{"term": {"event_type": "view"}}, {"term": {"event_type": "click"}}],
    ).collect()
    assert len(out) == 1
    assert out[0]["step2_ts"] == dt.datetime(2024, 1, 1, 10, 5)


def test_eql_needs_two_steps(spark):
    df = _events(spark)
    with pytest.raises(EqlError):
        eql_sequence(df, by="user_id", ts="ts", steps=[{"term": {"event_type": "view"}}])


def test_eql_sequence_until_expires_pending(spark):
    """until [error]: an error BETWEEN two steps kills the pending
    sequence; after the last step (or absent) it does not; an error AT
    the next step's exact timestamp survives (documented tie rule)."""
    rows = [
        # uid 1: view, error, click  -> expired (error between steps)
        (1, dt.datetime(2024, 1, 1, 9, 0), "view"),
        (1, dt.datetime(2024, 1, 1, 9, 10), "error"),
        (1, dt.datetime(2024, 1, 1, 9, 20), "click"),
        # uid 2: view, click, error  -> survives (error after completion)
        (2, dt.datetime(2024, 1, 1, 9, 0), "view"),
        (2, dt.datetime(2024, 1, 1, 9, 10), "click"),
        (2, dt.datetime(2024, 1, 1, 9, 20), "error"),
        # uid 3: view, click (no error) -> survives
        (3, dt.datetime(2024, 1, 1, 9, 0), "view"),
        (3, dt.datetime(2024, 1, 1, 9, 5), "click"),
        # uid 4: error at the click's exact ts -> survives (tie rule)
        (4, dt.datetime(2024, 1, 1, 9, 0), "view"),
        (4, dt.datetime(2024, 1, 1, 9, 10), "error"),
        (4, dt.datetime(2024, 1, 1, 9, 10), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    steps = [
        {"term": {"event_type": "view"}},
        {"term": {"event_type": "click"}},
    ]
    got = eql_sequence(
        df, by="user_id", ts="ts", steps=steps,
        until={"term": {"event_type": "error"}},
    )
    assert sorted(r["user_id"] for r in got.collect()) == [2, 3, 4]
    # without until, everyone completes
    assert sorted(
        r["user_id"]
        for r in eql_sequence(df, by="user_id", ts="ts", steps=steps).collect()
    ) == [1, 2, 3, 4]


def test_eql_sample_basic(spark):
    """sample by key: one row per key matching EVERY filter, slot =
    min (ts, payload) tuple; unordered (slots need not be chronological)."""
    from elasticsearch_hadoop_spark.eql import EqlError, eql_sample

    rows = [
        # u1: has both a and b — b happens BEFORE a (a sequence would drop it)
        (1, "u1", "b", "2024-01-01 00:00:00"),
        (2, "u1", "a", "2024-01-01 01:00:00"),
        (3, "u1", "a", "2024-01-01 02:00:00"),  # later a: not the slot pick
        # u2: only a — no sample
        (4, "u2", "a", "2024-01-01 00:00:00"),
        # u3: both, with an ts tie on a broken by event_id
        (5, "u3", "a", "2024-01-01 03:00:00"),
        (6, "u3", "a", "2024-01-01 03:00:00"),
        (7, "u3", "b", "2024-01-01 04:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user string, typ string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        r["user"]: r
        for r in eql_sample(
            df, by="user", ts="ts",
            filters=[{"term": {"typ": "a"}}, {"term": {"typ": "b"}}],
            payload=["event_id"],
        ).collect()
    }
    assert set(out) == {"u1", "u3"}
    assert out["u1"]["step1_event_id"] == 2 and out["u1"]["step2_event_id"] == 1
    assert out["u3"]["step1_event_id"] == 5  # ts tie -> smaller event_id
    with pytest.raises(EqlError, match="at least one"):
        eql_sample(df, by="user", ts="ts", filters=[])


def test_eql_sample_single_agg_plan(spark):
    """Scale posture: ONE partial+final aggregation pair over the join
    key (SortAggregate — struct buffers aren't Tungsten-mutable, the
    documented fallback), ONE shuffle, no join, no window."""
    from elasticsearch_hadoop_spark.eql import eql_sample
    from elasticsearch_hadoop_spark.plans import count_nodes, formatted_plan

    df = spark.createDataFrame(
        [(1, "u", "a", "2024-01-01 00:00:00")],
        "event_id long, user string, typ string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    plan = formatted_plan(
        eql_sample(df, by="user", ts="ts",
                   filters=[{"term": {"typ": "a"}}, {"term": {"typ": "b"}}],
                   payload=["event_id"])
    )
    assert count_nodes(plan, "SortAggregate") + count_nodes(plan, "HashAggregate") == 2
    assert count_nodes(plan, "Exchange") <= 1
    for absent in ("SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert count_nodes(plan, absent) == 0


def test_eql_sample_null_ts_event_cannot_take_slot(spark):
    """Review r9b-2: struct ordering sorts NULL fields first — a NULL-ts
    matching event must not win the slot over real timestamps."""
    from elasticsearch_hadoop_spark.eql import eql_sample

    rows = [
        (1, "u1", "a", "2024-01-01 01:00:00"),
        (2, "u1", "a", None),  # NULL ts: must not be the pick
        (3, "u1", "b", "2024-01-01 02:00:00"),
        (4, "u2", "a", None),  # only a NULL-ts match: no sample for u2
        (5, "u2", "b", "2024-01-01 02:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user string, typ string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        r["user"]: r
        for r in eql_sample(
            df, by="user", ts="ts",
            filters=[{"term": {"typ": "a"}}, {"term": {"typ": "b"}}],
            payload=["event_id"],
        ).collect()
    }
    assert set(out) == {"u1"}
    assert out["u1"]["step1_event_id"] == 1
    assert out["u1"]["step1_ts"] is not None


def test_eql_sample_size_n_pairs_jth_smallest(spark):
    """size>1: sample j pairs each slot's j-th smallest (ts, payload)
    tuple; a key yields min(size, fewest slot matches) samples."""
    from elasticsearch_hadoop_spark.eql import EqlError, eql_sample

    rows = [
        (1, "u1", "a", "2024-01-01 01:00:00"),
        (2, "u1", "a", "2024-01-01 02:00:00"),
        (3, "u1", "a", "2024-01-01 03:00:00"),
        (4, "u1", "b", "2024-01-01 00:30:00"),
        (5, "u1", "b", "2024-01-01 00:40:00"),
        # u2: only one b — one sample max regardless of size
        (6, "u2", "a", "2024-01-01 01:00:00"),
        (7, "u2", "a", "2024-01-01 02:00:00"),
        (8, "u2", "b", "2024-01-01 03:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user string, typ string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = eql_sample(
        df, by="user", ts="ts",
        filters=[{"term": {"typ": "a"}}, {"term": {"typ": "b"}}],
        payload=["event_id"], size=3,
    ).collect()
    got = {(r["user"], r["sample_seq"]): (r["step1_event_id"], r["step2_event_id"])
           for r in out}
    # u1: min(3, min(3 a-matches, 2 b-matches)) = 2 samples
    assert got == {
        ("u1", 1): (1, 4),
        ("u1", 2): (2, 5),
        ("u2", 1): (6, 8),
    }
    # size=1 carries sample_seq too (stable schema across sizes)
    one = eql_sample(
        df, by="user", ts="ts",
        filters=[{"term": {"typ": "a"}}], payload=["event_id"],
    )
    assert "sample_seq" in one.columns
    with pytest.raises(EqlError, match="1..10"):
        eql_sample(df, by="user", ts="ts",
                   filters=[{"term": {"typ": "a"}}], size=11)


def test_eql_sample_size_n_bounded_carry_plan(spark):
    """r9 verdict item 1: size>1 pre-bounds the per-(key x slot) carry
    BEFORE the groupBy — the plan must show the row_number cap as
    WindowGroupLimit Partial+Final (map tasks drop past-size rows before
    the exchange; a hot key's events never shuffle), the __rn filter
    upstream of the collect aggregation, and still no join."""
    from elasticsearch_hadoop_spark.eql import eql_sample
    from elasticsearch_hadoop_spark.plans import count_nodes, formatted_plan

    df = spark.createDataFrame(
        [(1, "u", "a", "2024-01-01 00:00:00")],
        "event_id long, user string, typ string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    plan = formatted_plan(
        eql_sample(df, by="user", ts="ts",
                   filters=[{"term": {"typ": "a"}}, {"term": {"typ": "b"}}],
                   payload=["event_id"], size=2)
    )
    # map-side Partial + reduce-side Final cap at size=2
    assert count_nodes(plan, "WindowGroupLimit") == 2
    assert "row_number()" in plan and ", 2, Partial" in plan
    assert "__rn" in plan  # the <= size filter survives into the plan
    for absent in ("SortMergeJoin", "BroadcastHashJoin"):
        assert count_nodes(plan, absent) == 0
    # the collect aggregation pair still runs (over <= size rows/slot)
    aggs = (count_nodes(plan, "ObjectHashAggregate")
            + count_nodes(plan, "SortAggregate")
            + count_nodes(plan, "HashAggregate"))
    assert aggs == 2
