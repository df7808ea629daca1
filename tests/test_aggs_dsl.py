"""aggs_dsl unit tests: fixed_interval bucketing, metrics-only global row,
approximate variants, and error paths (sibling buckets, bad metric)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs


@pytest.fixture(scope="module")
def ev(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(ts=base + datetime.timedelta(minutes=37 * i), kind="ab"[i % 2], v=float(i))
        for i in range(20)
    ]
    return spark.createDataFrame(rows)


def test_fixed_interval_2h(ev):
    out = compile_aggs(ev, {"two_h": {"date_histogram": {"field": "ts", "fixed_interval": "2h"}}})
    rows = out.collect()
    assert [r.two_h.minute for r in rows] == [0] * len(rows)
    assert all(r.two_h.hour % 2 == 0 for r in rows)
    assert sum(r.doc_count for r in rows) == 20


def test_metrics_only_global_row(ev):
    out = compile_aggs(
        ev,
        {"n": {"value_count": {"field": "v"}}, "hi": {"max": {"field": "v"}}},
    ).collect()
    assert len(out) == 1
    assert out[0].doc_count == 20 and out[0].n == 20 and out[0].hi == 19.0


def test_approximate_cardinality_and_percentiles(ev):
    out = compile_aggs(
        ev,
        {
            "kinds": {"cardinality": {"field": "kind", "approximate": True}},
            "p": {"percentiles": {"field": "v", "percents": [50], "approximate": True}},
        },
    ).collect()[0]
    assert out.kinds == 2
    assert 8.0 <= out.p_50 <= 11.0


def test_sibling_buckets_rejected(ev):
    with pytest.raises(AggsDslError, match="one bucket agg per level"):
        compile_aggs(
            ev,
            {
                "a": {"terms": {"field": "kind"}},
                "b": {"histogram": {"field": "v", "interval": 5}},
            },
        )


def test_unknown_metric_rejected(ev):
    with pytest.raises(AggsDslError, match="unsupported metric"):
        compile_aggs(ev, {"x": {"median_absolute_deviation": {"field": "v"}}})


def test_json_string_and_wrapped_body(ev):
    out = compile_aggs(ev, '{"aggs": {"kinds": {"terms": {"field": "kind"}}}}')
    assert {r.kinds: r.doc_count for r in out.collect()} == {"a": 10, "b": 10}


def test_top_hits_requires_sort(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.range(3).withColumnRenamed("id", "x")
    with pytest.raises(AggsDslError, match="sort"):
        compile_aggs(df, {"aggs": {"h": {"top_hits": {"size": 1}}}})


def test_top_hits_must_be_only_metric(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.range(3).withColumnRenamed("id", "x")
    spec = {
        "aggs": {
            "h": {"top_hits": {"size": 1, "sort": [{"x": {"order": "asc"}}]}},
            "m": {"avg": {"field": "x"}},
        }
    }
    with pytest.raises(AggsDslError, match="only metric"):
        compile_aggs(df, spec)


def test_global_top_hits_is_order_limit(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame([(i, i % 3) for i in range(9)], "x int, g int")
    out = compile_aggs(
        df,
        {"aggs": {"h": {"top_hits": {"size": 2, "sort": [{"x": {"order": "desc"}}],
                                     "_source": ["x"]}}}},
    )
    assert [r["x"] for r in out.collect()] == [8, 7]


def test_overlapping_filters_count_doc_twice(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame([(1, "a"), (5, "a"), (10, "b")], "v int, s string")
    out = compile_aggs(
        df,
        {
            "aggs": {
                "b": {
                    "filters": {
                        "filters": {
                            "all_a": {"term": {"s": "a"}},
                            "big": {"range": {"v": {"gte": 5}}},
                        }
                    }
                }
            }
        },
    )
    got = {r["b"]: r["doc_count"] for r in out.collect()}
    assert got == {"all_a": 2, "big": 2}  # v=5,s=a doc is in BOTH buckets
