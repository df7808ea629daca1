"""Edge semantics of the round-4 late aggs-DSL additions: top_metrics,
t_test, matrix_stats, geo_bounds/geo_centroid, ip_range, nested, global."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.aggs_dsl import (
    AggsDslError,
    _cidr_bounds,
    compile_aggs,
)


def test_cidr_bounds_alignment():
    lo, hi = _cidr_bounds("10.2.0.0/15")
    assert (lo, hi) == ((10 << 24) + (2 << 16), (10 << 24) + (4 << 16))
    # unaligned base is floored to the network address
    lo2, hi2 = _cidr_bounds("10.3.7.9/15")
    assert (lo2, hi2) == (lo, hi)
    with pytest.raises(AggsDslError):
        _cidr_bounds("10.0.0.0/40")
    with pytest.raises(AggsDslError):
        _cidr_bounds("10.0.0.0")


def test_ip_range_overlap_multibucket(spark):
    df = spark.createDataFrame(
        [("10.0.0.5",), ("10.1.2.3",), ("10.2.0.1",), ("11.0.0.0",)], "ip string"
    )
    out = compile_aggs(
        df,
        {
            "b": {
                "ip_range": {
                    "field": "ip",
                    "ranges": [
                        {"key": "lo", "to": "10.2.0.0"},
                        {"mask": "10.0.0.0/23"},  # 10.0.0.0 - 10.0.2.0
                    ],
                }
            }
        },
    )
    rows = {r["b"]: r["doc_count"] for r in out.collect()}
    # 10.0.0.5 is in BOTH buckets; 10.2.0.1 misses `lo` (to is EXCLUSIVE);
    # 11.0.0.0 lands nowhere
    assert rows == {"lo": 2, "10.0.0.0/23": 1}


def test_top_metrics_tie_and_size(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (1, 10.0, 7.0), (1, 9.0, 100.0)], "g int, s double, m double"
    )
    out = compile_aggs(
        df,
        {
            "g": {
                "terms": {"field": "g"},
                "aggs": {
                    "top": {
                        "top_metrics": {
                            "metrics": [{"field": "m"}],
                            "sort": {"s": "desc"},
                        }
                    }
                },
            }
        },
    ).collect()
    # ties on s=10.0 break by max metric (desc) -> 7.0, never 5.0 or 100.0
    assert out[0]["top_m"] == 7.0
    assert out[0]["top_sort"] == 10.0
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {
                "t": {
                    "top_metrics": {
                        "metrics": [{"field": "m"}],
                        "sort": {"s": "desc"},
                        "size": 3,
                    }
                }
            },
        )


def test_t_test_types_against_closed_form(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0, 8.0]
    df = spark.createDataFrame(list(zip(a, b)), "a double, b double")
    out = compile_aggs(
        df,
        {
            "welch": {"t_test": {"a": {"field": "a"}, "b": {"field": "b"}}},
            "paired": {
                "t_test": {"a": {"field": "a"}, "b": {"field": "b"}, "type": "paired"}
            },
        },
    ).collect()[0]
    ma, mb = 2.5, 5.0
    va, vb = 5.0 / 3, 20.0 / 3
    welch = (ma - mb) / math.sqrt(va / 4 + vb / 4)
    d = [x - y for x, y in zip(a, b)]
    md = sum(d) / 4
    sd = math.sqrt(sum((x - md) ** 2 for x in d) / 3)
    paired = md / (sd / 2)
    assert out["welch"] == pytest.approx(welch)
    assert out["paired"] == pytest.approx(paired)


def test_matrix_stats_complete_observations(spark):
    # the row with a null in ANY field is dropped from EVERY statistic
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, None)], "x double, y double"
    )
    out = compile_aggs(
        df, {"ms": {"matrix_stats": {"fields": ["x", "y"]}}}
    ).collect()[0]
    assert out["ms_count"] == 2
    assert out["ms_x_mean"] == pytest.approx(1.5)
    assert out["ms_x_y_correlation"] == pytest.approx(1.0)


def test_nested_doc_count_is_element_count(spark):
    df = spark.createDataFrame(
        [(1, [(1.0,), (2.0,)]), (2, [(3.0,)])],
        "id int, items array<struct<v double>>",
    )
    out = compile_aggs(
        df,
        {
            "n": {
                "nested": {"path": "items"},
                "aggs": {"avg_v": {"avg": {"field": "items.v"}}},
            }
        },
    ).collect()[0]
    assert out["doc_count"] == 3  # nested docs, not parent docs
    assert out["avg_v"] == pytest.approx(2.0)


def test_global_requires_base_df(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(AggsDslError, match="base_df"):
        compile_aggs(df, {"g": {"global": {}, "aggs": {"m": {"max": {"field": "x"}}}}})


def test_geo_centroid_skips_partial_points(spark):
    df = spark.createDataFrame(
        [((1.0, 2.0),), ((3.0, 4.0),), ((None, 9.0),)],
        "loc struct<lat double, lon double>",
    )
    out = compile_aggs(df, {"c": {"geo_centroid": {"field": "loc"}}}).collect()[0]
    assert out["c_count"] == 2
    assert out["c_lat"] == pytest.approx(2.0)
    assert out["c_lon"] == pytest.approx(3.0)


def test_normalize_methods(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 1.0), (2, 2.0), (3, 3.0)], "g int, v double"
    )
    out = compile_aggs(
        df,
        {
            "g": {
                "terms": {"field": "g"},
                "aggs": {
                    "s": {"sum": {"field": "v"}},
                    "pct": {
                        "normalize": {"buckets_path": "s", "method": "percent_of_sum"}
                    },
                    "r01": {
                        "normalize": {"buckets_path": "s", "method": "rescale_0_1"}
                    },
                    "soft": {"normalize": {"buckets_path": "s", "method": "softmax"}},
                },
            }
        },
    )
    rows = {r["g"]: r for r in out.collect()}
    assert rows[1]["pct"] == pytest.approx(2 / 7)
    assert rows[2]["r01"] == pytest.approx(0.0)  # min bucket (s=2) -> 0
    assert rows[3]["r01"] == pytest.approx(1.0)
    total = sum(math.exp(s) for s in (2.0, 2.0, 3.0))
    assert rows[3]["soft"] == pytest.approx(math.exp(3.0) / total)
    with pytest.raises(AggsDslError, match="unknown method"):
        compile_aggs(
            df,
            {
                "g": {
                    "terms": {"field": "g"},
                    "aggs": {
                        "s": {"sum": {"field": "v"}},
                        "n": {"normalize": {"buckets_path": "s", "method": "nope"}},
                    },
                }
            },
        )


def test_rate_requires_fixed_interval_parent(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, h), 10.0) for h in range(4)],
        "ts timestamp, v double",
    )
    out = compile_aggs(
        df,
        {
            "b": {
                "date_histogram": {"field": "ts", "fixed_interval": "2h"},
                "aggs": {"per_hour": {"rate": {"field": "v", "unit": "hour"}}},
            }
        },
    ).collect()
    # 2 docs x 10.0 per 2h bucket -> 10.0 per hour
    assert all(r["per_hour"] == pytest.approx(10.0) for r in out)
    with pytest.raises(AggsDslError, match="fixed_interval"):
        compile_aggs(df, {"r": {"rate": {"field": "v", "unit": "hour"}}})


class TestSignificantTextVwhCumCard:
    def test_significant_text_terminal_only(self, spark):
        import pytest
        from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

        df = spark.createDataFrame([("a b", "x")], "text string, k string")
        with pytest.raises(AggsDslError):
            compile_aggs(
                df,
                {"aggs": {"k": {"terms": {"field": "k"},
                                "aggs": {"t": {"significant_text": {"field": "text"}}}}}},
            )

    def test_variable_width_histogram_buckets(self, spark):
        from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

        df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        out = compile_aggs(
            df, {"aggs": {"b": {"variable_width_histogram": {"field": "v", "buckets": 4}}}}
        ).collect()
        assert len(out) == 4
        assert [r["doc_count"] for r in out] == [25, 25, 25, 25]
        assert out[0]["b_min"] == 0.0 and out[3]["b_max"] == 99.0
        # buckets tile the domain without overlap
        for lo, hi in zip(out, out[1:]):
            assert lo["b_max"] < hi["b_min"]

    def test_cumulative_cardinality_first_occurrence(self, spark):
        import datetime as dt

        from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

        rows = [
            (dt.datetime(2024, 1, 1, 5), "u1"),
            (dt.datetime(2024, 1, 1, 6), "u2"),
            (dt.datetime(2024, 1, 2, 5), "u1"),  # returning user: no growth
            (dt.datetime(2024, 1, 3, 5), "u3"),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, uid string")
        out = compile_aggs(
            df,
            {"aggs": {"d": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"u": {"cardinality": {"field": "uid"}},
                         "cum": {"cumulative_cardinality": {"buckets_path": "u"}}}}}},
        ).collect()
        assert [(r["u"], r["cum"]) for r in out] == [(2, 2), (1, 2), (1, 3)]

    def test_cumulative_cardinality_needs_sibling_cardinality(self, spark):
        import pytest
        from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

        df = spark.createDataFrame([(1.0, "u")], "v double, uid string")
        with pytest.raises(AggsDslError):
            compile_aggs(
                df,
                {"aggs": {"h": {
                    "histogram": {"field": "v", "interval": 1.0},
                    "aggs": {"s": {"sum": {"field": "v"}},
                             "cum": {"cumulative_cardinality": {"buckets_path": "s"}}}}}},
            )


class TestFiltersOtherBucketAndOffset:
    def test_other_bucket(self, spark):
        from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), ("c",)], "k string"
        )
        out = compile_aggs(
            df,
            {"aggs": {"f": {"filters": {
                "filters": {"as": {"term": {"k": "a"}}},
                "other_bucket": True}}}},
        ).collect()
        got = {r["f"]: r["doc_count"] for r in out}
        assert got == {"as": 2, "_other_": 2}

    def test_histogram_offset(self, spark):
        from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

        df = spark.createDataFrame([(4.0,), (5.0,), (14.0,), (15.0,)], "v double")
        out = compile_aggs(
            df,
            {"aggs": {"h": {"histogram": {"field": "v", "interval": 10.0,
                                          "offset": 5.0}}}},
        ).collect()
        assert {r["h"]: r["doc_count"] for r in out} == {-5.0: 1, 5.0: 2, 15.0: 1}

    def test_date_histogram_offset_rejects_calendar(self, spark):
        import pytest
        from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

        df = spark.createDataFrame([("2024-01-01 00:00:00",)], "s string")
        with pytest.raises(AggsDslError):
            compile_aggs(
                df.selectExpr("CAST(s AS TIMESTAMP) AS ts"),
                {"aggs": {"d": {"date_histogram": {
                    "field": "ts", "calendar_interval": "day", "offset": "+3h"}}}},
            )


def test_ip_prefix_masks_and_appends(spark):
    df = spark.createDataFrame(
        [("10.0.1.5",), ("10.0.2.200",), ("10.0.130.9",), ("192.168.1.1",)],
        ["ip"],
    )
    out = compile_aggs(
        df,
        {"aggs": {"net": {"ip_prefix": {
            "field": "ip", "prefix_length": 25, "append_prefix_length": True,
        }}}},
    ).collect()
    got = {r["net"]: r["doc_count"] for r in out}
    assert got == {
        "10.0.1.0/25": 1,
        "10.0.2.128/25": 1,
        "10.0.130.0/25": 1,
        "192.168.1.0/25": 1,
    }
    # /0 collapses everything into one bucket
    one = compile_aggs(
        df, {"aggs": {"net": {"ip_prefix": {"field": "ip", "prefix_length": 0}}}}
    ).collect()
    assert len(one) == 1 and one[0]["net"] == "0.0.0.0"


def test_ip_prefix_rejects_ipv6_and_bad_length(spark):
    df = spark.createDataFrame([("10.0.0.1",)], ["ip"])
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {"aggs": {"n": {"ip_prefix": {
                "field": "ip", "prefix_length": 64, "is_ipv6": True,
            }}}},
        )
    with pytest.raises(AggsDslError):
        compile_aggs(
            df, {"aggs": {"n": {"ip_prefix": {"field": "ip", "prefix_length": 33}}}}
        )


def test_moving_percentiles_trailing_window(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 60.0), (4, 40.0)], ["k", "v"]
    )
    out = compile_aggs(
        df,
        {"aggs": {"b": {
            "histogram": {"field": "k", "interval": 1.0},
            "aggs": {
                "total": {"sum": {"field": "v"}},
                "mp": {"moving_percentiles": {
                    "buckets_path": "total", "window": 3, "percents": [50],
                }},
            },
        }}},
    ).orderBy("b").collect()
    # trailing 3-bucket window INCLUDING current (documented convention)
    assert [r["mp_50"] for r in out] == [10.0, 15.0, 20.0, 40.0]


def test_geo_line_sorts_and_truncates(spark):
    df = spark.createDataFrame(
        [
            ("a", 3, {"lat": 3.5, "lon": 30.5}),
            ("a", 1, {"lat": 1.5, "lon": 10.5}),
            ("a", 2, {"lat": 2.5, "lon": 20.5}),
            ("b", 1, {"lat": 9.5, "lon": 90.5}),
        ],
        "g string, t int, p struct<lat:double,lon:double>",
    )
    out = compile_aggs(
        df,
        {"aggs": {"g": {
            "terms": {"field": "g"},
            "aggs": {"line": {"geo_line": {
                "point": {"field": "p"}, "sort": {"field": "t"}, "size": 2,
            }}},
        }}},
    ).orderBy("g").collect()
    assert out[0]["line"] == [[10.5, 1.5], [20.5, 2.5]]  # sorted by t, size=2
    assert out[1]["line"] == [[90.5, 9.5]]


def test_geo_line_desc_and_skips_null_points(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, {"lat": 1.5, "lon": 10.5}),
            ("a", 2, None),
            ("a", 3, {"lat": 3.5, "lon": 30.5}),
        ],
        "g string, t int, p struct<lat:double,lon:double>",
    )
    out = compile_aggs(
        df,
        {"aggs": {"g": {
            "terms": {"field": "g"},
            "aggs": {"line": {"geo_line": {
                "point": {"field": "p"}, "sort": {"field": "t"},
                "sort_order": "desc",
            }}},
        }}},
    ).collect()
    assert out[0]["line"] == [[30.5, 3.5], [10.5, 1.5]]


def test_scripted_metric_sum_subset(spark):
    df = spark.createDataFrame([("x", 2.0), ("x", 3.0), ("y", 5.0)], ["g", "v"])
    out = compile_aggs(
        df,
        {"aggs": {"g": {
            "terms": {"field": "g"},
            "aggs": {"t": {"scripted_metric": {
                "init_script": "state.t = 0",
                "map_script": "state.t += doc['v'].value * 2",
                "combine_script": "return state.t",
                "reduce_script": "return states.stream().mapToDouble(d -> d).sum()",
            }}},
        }}},
    ).orderBy("g").collect()
    assert [(r["g"], r["t"]) for r in out] == [("x", 10.0), ("y", 10.0)]


def test_scripted_metric_rejects_non_sum_shapes(spark):
    df = spark.createDataFrame([("x", 1.0)], ["g", "v"])
    for bad in (
        {"init_script": "state.t = []", "map_script": "state.t += doc['v'].value"},
        {"init_script": "state.t = 0", "map_script": "state.t = doc['v'].value"},
        {"init_script": "state.a = 0", "map_script": "state.b += doc['v'].value"},
        {
            "init_script": "state.t = 0",
            "map_script": "state.t += doc['v'].value",
            "reduce_script": "return states.stream().max()",
        },
    ):
        with pytest.raises(AggsDslError):
            compile_aggs(df, {"aggs": {"m": {"scripted_metric": bad}}})


def test_frequent_item_sets_pairs_and_support(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"],), (["a", "b"],), (["b", "a"],), (["c"],), (None,)],
        "items array<string>",
    )
    out = compile_aggs(
        df,
        {"aggs": {"sets": {"frequent_item_sets": {
            "fields": [{"field": "items"}],
            "minimum_support": 0.4,
            "size": 10,
        }}}},
    ).collect()
    got = {tuple(r["sets"]): (r["set_size"], r["doc_count"], round(r["support"], 3))
           for r in out}
    # 5 docs total (the null-array doc counts toward support's denominator)
    assert got == {
        ("a",): (1, 3, 0.6),
        ("b",): (1, 3, 0.6),
        ("a", "b"): (2, 3, 0.6),
        ("c",): (1, 2, 0.4),
    }


def test_frequent_item_sets_min_set_size_and_rejects(spark):
    df = spark.createDataFrame([(["a", "b"],)], "items array<string>")
    out = compile_aggs(
        df,
        {"aggs": {"s": {"frequent_item_sets": {
            "fields": [{"field": "items"}],
            "minimum_set_size": 2, "minimum_support": 0.5,
        }}}},
    ).collect()
    assert [tuple(r["s"]) for r in out] == [("a", "b")]
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {"aggs": {"s": {"frequent_item_sets": {
                "fields": [{"field": "items"}], "maximum_set_size": 3,
            }}}},
        )
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {"aggs": {"s": {"frequent_item_sets": {"fields": []}}}},
        )


def test_frequent_item_sets_multi_field(spark):
    df = spark.createDataFrame(
        [(["a", "b"], "us"), (["a"], "us"), (["b"], "de"), (None, "us")],
        "items array<string>, geo string",
    )
    out = compile_aggs(
        df,
        {"aggs": {"s": {"frequent_item_sets": {
            "fields": [{"field": "items"}, {"field": "geo"}],
            "minimum_support": 0.5, "size": 10,
        }}}},
    ).collect()
    got = {tuple(r["s"]): (r["doc_count"], round(r["support"], 3)) for r in out}
    # 4 docs; items=a appears in 2, geo=us in 3, the (items=a, geo=us)
    # pair in 2 — cross-field itemsets are the point of multi-field mode
    assert got == {
        ("geo=us",): (3, 0.75),
        ("items=a",): (2, 0.5),
        ("items=b",): (2, 0.5),
        ("geo=us", "items=a"): (2, 0.5),
    }


def test_bucket_correlation_pearson(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (2, 20.0), (2, 20.0), (2, 20.0), (3, 30.0)],
        ["k", "v"],
    )
    out = compile_aggs(
        df,
        {"aggs": {
            "b": {
                "histogram": {"field": "k", "interval": 1.0},
                "aggs": {"total": {"sum": {"field": "v"}}},
            },
            "corr": {"bucket_correlation": {
                "buckets_path": "b>total",
                "function": {"count_correlation": {"indicator": {
                    "expectations": [20.0, 60.0, 30.0],
                    "doc_count": 6,
                }}},
            }},
        }},
    ).orderBy("b").collect()
    # totals are [20, 60, 30] -> perfect correlation with expectations
    assert all(abs(r["corr"] - 1.0) < 1e-9 for r in out)
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {"aggs": {
                "b": {"histogram": {"field": "k", "interval": 1.0}},
                "c": {"bucket_correlation": {"buckets_path": "b>_count"}},
            }},
        )


def test_change_point_step_detector(spark):
    # flat at 10 for k=1..4, jumps to 50 at k=5..8 -> change point key 5
    rows = [(float(k), 10.0 + (40.0 if k >= 5 else 0.0) + (k % 2) * 0.5)
            for k in range(1, 9)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = compile_aggs(
        df,
        {"aggs": {
            "b": {
                "histogram": {"field": "k", "interval": 1.0},
                "aggs": {"m": {"avg": {"field": "v"}}},
            },
            "cp": {"change_point": {"buckets_path": "b>m"}},
        }},
    ).collect()
    assert all(r["cp_key"] == 5.0 for r in out)
    assert all(r["cp_score"] > 5 for r in out)


def test_moving_fn_weighted_variants(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"]
    )
    out = compile_aggs(
        df,
        {"aggs": {"b": {
            "histogram": {"field": "k", "interval": 1.0},
            "aggs": {
                "t": {"sum": {"field": "v"}},
                "lw": {"moving_fn": {
                    "buckets_path": "t", "window": 3,
                    "script": "MovingFunctions.linearWeightedAvg(values)",
                }},
                "ew": {"moving_fn": {
                    "buckets_path": "t", "window": 3,
                    "script": "MovingFunctions.ewma(values)",
                }},
            },
        }}},
    ).orderBy("b").collect()
    # bucket 3 window = [10, 20, 30]:
    # linear weighted = (10*1 + 20*2 + 30*3) / 6 = 23.333...
    assert out[2]["lw"] == pytest.approx(140.0 / 6.0)
    # ewma fold (alpha=.3): s=10 -> .3*20+.7*10=13 -> .3*30+.7*13=18.1
    assert out[2]["ew"] == pytest.approx(18.1)
    assert out[0]["lw"] == pytest.approx(10.0)
    assert out[0]["ew"] == pytest.approx(10.0)


def test_reverse_nested_counts_parents(spark):
    df = spark.createDataFrame(
        [
            (1, "us", [("red",), ("red",), ("blue",)]),
            (2, "us", [("red",)]),
            (3, "de", [("blue",), ("blue",)]),
        ],
        "id int, country string, items array<struct<color string>>",
    )
    # nested -> terms on the element field -> reverse_nested: how many
    # PARENT docs carry each color (ES's classic comments-per-tag shape)
    out = compile_aggs(
        df,
        {"aggs": {"n": {
            "nested": {"path": "items"},
            "aggs": {"color": {
                "terms": {"field": "items.color"},
                "aggs": {"parents": {
                    "reverse_nested": {},
                    "aggs": {},
                }},
            }},
        }}},
        parent_id_col="id",
    ).orderBy("color").collect()
    got = {r["color"]: r["doc_count"] for r in out}
    # red appears in docs 1 (twice) and 2 -> 2 parents; blue in 1 and 3
    assert got == {"blue": 2, "red": 2}
    with pytest.raises(AggsDslError, match="parent_id_col"):
        compile_aggs(
            df,
            {"aggs": {"n": {
                "nested": {"path": "items"},
                "aggs": {"p": {"reverse_nested": {}}},
            }}},
        )


def test_categorize_text(spark):
    df = spark.createDataFrame(
        [("Node node-1 stopped",), ("Node node-2 stopped",),
         ("Node node-7 stopped",), ("User bob logged in",),
         ("User alice logged in",), (None,)],
        "message string",
    )
    out = compile_aggs(
        df, {"aggs": {"cats": {"categorize_text": {"field": "message"}}}}
    ).collect()
    got = [(r["cats"], r["doc_count"]) for r in out]
    # node-1/node-2/node-7 are single variable tokens (digit-bearing)
    # and drop whole; bob/alice are stable tokens so those two messages
    # stay separate categories (the documented exact-key deviation from
    # ES's similarity merging)
    assert got == [("node stopped", 3), ("user alice logged in", 1),
                   ("user bob logged in", 1)]
    # max_matched_tokens caps the category key
    out2 = compile_aggs(
        df, {"aggs": {"c": {"categorize_text": {
            "field": "message", "max_matched_tokens": 1}}}}
    ).collect()
    assert [(r["c"], r["doc_count"]) for r in out2] == [("node", 3), ("user", 2)]
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {"aggs": {"g": {"terms": {"field": "message"}, "aggs": {
                "c": {"categorize_text": {"field": "message"}}}}}},
        )


def test_frequent_item_sets_single_scalar_field_and_nulls(spark):
    # a scalar (non-array) single field works like the multi-field path
    df = spark.createDataFrame([("us",), ("us",), ("de",), (None,)],
                               "geo string")
    out = compile_aggs(
        df, {"aggs": {"s": {"frequent_item_sets": {
            "fields": [{"field": "geo"}], "minimum_support": 0.4}}}}
    ).collect()
    assert [(tuple(r["s"]), r["doc_count"]) for r in out] == [(("us",), 2)]
    # null ELEMENTS in arrays are not items
    df2 = spark.createDataFrame([(["a", None],), (["a"],), (None,)],
                                "items array<string>")
    out2 = compile_aggs(
        df2, {"aggs": {"s": {"frequent_item_sets": {
            "fields": [{"field": "items"}], "minimum_support": 0.5}}}}
    ).collect()
    assert [(tuple(r["s"]), r["doc_count"]) for r in out2] == [(("a",), 2)]


class TestChildrenParentAggs:
    @pytest.fixture(scope="class")
    def join_df(self, spark):
        rows = [
            ("q1", ("question", None), "how", None),
            ("q2", ("question", None), "why", None),
            ("a1", ("answer", "q1"), None, 5.0),
            ("a2", ("answer", "q1"), None, 7.0),
            ("a3", ("answer", "q2"), None, 1.0),
            ("a4", ("answer", "q2"), None, 3.0),
        ]
        return spark.createDataFrame(
            rows,
            "_id string, join_field struct<name string, parent string>, "
            "title string, score double",
        )

    def test_children_switches_to_child_docs(self, spark, join_df):
        parents = join_df.filter(
            (F.col("join_field.name") == "question") & (F.col("title") == "how")
        )
        out = compile_aggs(
            parents,
            {"answers": {"children": {"type": "answer"},
                         "aggs": {"avg_score": {"avg": {"field": "score"}}}}},
            base_df=join_df,
        ).collect()
        assert len(out) == 1
        assert out[0]["doc_count"] == 2 and out[0]["avg_score"] == 6.0

    def test_parent_dedups_to_one_parent_each(self, spark, join_df):
        kids = join_df.filter(
            (F.col("join_field.name") == "answer") & (F.col("score") >= 3.0)
        )
        # a1, a2 (q1) and a4 (q2) qualify -> 2 distinct parents
        out = compile_aggs(
            kids,
            {"qs": {"parent": {"type": "question"},
                    "aggs": {"n": {"value_count": {"field": "_id"}}}}},
            base_df=join_df,
        ).collect()
        assert out[0]["doc_count"] == 2 and out[0]["n"] == 2

    def test_requires_base_df(self, spark, join_df):
        with pytest.raises(AggsDslError, match="base_df"):
            compile_aggs(
                join_df, {"x": {"children": {"type": "answer"}, "aggs": {}}}
            )

    def test_children_under_terms_buckets_per_key(self, spark, join_df):
        """ES supports terms -> children; the context switch must carry
        the enclosing bucket keys (review r7 finding: they used to
        collapse into one NULL-keyed bucket)."""
        parents = join_df.filter(F.col("join_field.name") == "question")
        out = {
            r["by_title"]: (r["doc_count"], r["avg_score"])
            for r in compile_aggs(
                parents,
                {"by_title": {"terms": {"field": "title"},
                              "aggs": {"answers": {"children": {"type": "answer"},
                                       "aggs": {"avg_score": {"avg": {"field": "score"}}}}}}},
                base_df=join_df,
            ).collect()
        }
        assert out == {"how": (2, 6.0), "why": (2, 2.0)}


def test_geo_distance_rings(spark):
    """geo_distance bucket agg: arc-distance rings from an origin, unit
    scaling, custom keys, range-style default labels, typed errors."""
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    rows = [
        (1, 0.0, 0.0),      # at origin: 0 km
        (2, 0.0, 10.0),     # ~1113 km
        (3, 0.0, 40.0),     # ~4452 km
        (4, 40.0, 80.0),    # far
    ]
    df = spark.createDataFrame(rows, "id int, lat double, lon double").select(
        "id", F.struct("lat", "lon").alias("loc")
    )
    body = {
        "aggs": {
            "rings": {
                "geo_distance": {
                    "field": "loc",
                    "origin": {"lat": 0.0, "lon": 0.0},
                    "unit": "km",
                    "ranges": [
                        {"to": 2000, "key": "near"},
                        {"from": 2000, "to": 5000, "key": "mid"},
                        {"from": 5000, "key": "far"},
                    ],
                }
            }
        }
    }
    got = {r["rings"]: r["doc_count"] for r in compile_aggs(df, body).collect()}
    assert got == {"near": 2, "mid": 1, "far": 1}
    # meters default: same rows land in metre-scaled rings
    body_m = {
        "aggs": {
            "rings": {
                "geo_distance": {
                    "field": "loc",
                    "origin": {"lat": 0.0, "lon": 0.0},
                    "ranges": [{"to": 2000000, "key": "near"}, {"from": 2000000, "key": "rest"}],
                }
            }
        }
    }
    got_m = {r["rings"]: r["doc_count"] for r in compile_aggs(df, body_m).collect()}
    assert got_m == {"near": 2, "rest": 2}
    # default label follows the range agg's "<from>-<to>" convention
    body_lbl = {
        "aggs": {
            "rings": {
                "geo_distance": {
                    "field": "loc", "origin": {"lat": 0.0, "lon": 0.0},
                    "unit": "km", "ranges": [{"to": 2000}, {"from": 2000}],
                }
            }
        }
    }
    keys = {r["rings"] for r in compile_aggs(df, body_lbl).collect()}
    assert keys == {"*-2000", "2000-*"}
    with pytest.raises(AggsDslError, match="origin"):
        compile_aggs(df, {"aggs": {"r": {"geo_distance": {"field": "loc", "ranges": [{"to": 1}]}}}})
    with pytest.raises(AggsDslError, match="unit"):
        compile_aggs(df, {"aggs": {"r": {"geo_distance": {
            "field": "loc", "origin": {"lat": 0, "lon": 0}, "unit": "furlongs",
            "ranges": [{"to": 1}]}}}})


def test_range_family_requires_nonempty_ranges(spark):
    """Review r8: missing or empty ranges is a typed AggsDslError for
    geo_distance, range, and date_range alike."""
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([(1, 1.0)], "id int, v double")
    for body in (
        {"geo_distance": {"field": "loc", "origin": {"lat": 0, "lon": 0}}},
        {"range": {"field": "v"}},
        {"range": {"field": "v", "ranges": []}},
        {"date_range": {"field": "v"}},
    ):
        with pytest.raises(AggsDslError, match="non-empty ranges"):
            compile_aggs(df, {"aggs": {"r": body}})


def test_random_sampler_deterministic_and_scaled(spark):
    """random_sampler (8.2+): seeded hash-threshold sample; doc_count and
    sum/value_count scale by 1/probability, avg/min/max do not."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs
    from elasticsearch_hadoop_spark.operators.sampling import (
        HASH_SPACE,
        split_hash,
    )

    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    body = {"samp": {
        "random_sampler": {"probability": 0.25, "seed": 7, "seed_field": "k"},
        "aggs": {
            "total": {"sum": {"field": "v"}},
            "n": {"value_count": {"field": "v"}},
            "mean": {"avg": {"field": "v"}},
        },
    }}
    out = compile_aggs(df, {"aggs": body}).collect()[0]
    # replay the sample independently
    sampled = df.filter(
        split_hash(F.col("k"), 7) < F.lit(int(0.25 * HASH_SPACE))
    )
    srows = sampled.collect()
    k = len(srows)
    assert out["doc_count"] == round(k * 4.0)          # scaled
    assert out["n"] == round(k * 4.0)                  # scaled
    assert out["total"] == pytest.approx(sum(r["v"] for r in srows) * 4.0)
    assert out["mean"] == pytest.approx(sum(r["v"] for r in srows) / k)
    # determinism: second run identical
    assert compile_aggs(df, {"aggs": body}).collect()[0] == out
    # probability 1 short-circuits: no filter, no scaling
    full = compile_aggs(df, {"aggs": {"samp": {
        "random_sampler": {"probability": 1, "seed_field": "k"},
        "aggs": {"n": {"value_count": {"field": "v"}}},
    }}}).collect()[0]
    assert full["doc_count"] == 2000 and full["n"] == 2000


def test_random_sampler_error_contract(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    with pytest.raises(AggsDslError, match="seed_field"):
        compile_aggs(df, {"aggs": {"s": {"random_sampler": {"probability": 0.5}}}})
    for p in (0, 0.7, -0.1, 2):
        with pytest.raises(AggsDslError, match="probability"):
            compile_aggs(df, {"aggs": {"s": {"random_sampler": {
                "probability": p, "seed_field": "k"}}}})


def test_random_sampler_top_level_only(spark):
    """Review r8-2: sibling metrics would silently evaluate over the
    sampled frame unscaled, and a nested sampler would under-scale —
    both rejected, matching ES's own top-level-only constraint."""
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([(i, 1.0) for i in range(10)], "k int, v double")
    rs = {"random_sampler": {"probability": 0.5, "seed_field": "k"}}
    with pytest.raises(AggsDslError, match="top-level"):
        compile_aggs(df, {"aggs": {
            "samp": {**rs, "aggs": {"n": {"value_count": {"field": "v"}}}},
            "grand_total": {"sum": {"field": "v"}},
        }})
    with pytest.raises(AggsDslError, match="top-level"):
        compile_aggs(df, {"aggs": {"outer": {**rs, "aggs": {"inner": {
            **rs, "aggs": {"n": {"value_count": {"field": "v"}}}}}}}})


def test_random_sampler_extended_stats_scales_like_stats(spark):
    """Review r8-2: extended_stats count/sum/sum_of_squares must agree
    with the stats sibling under the same sampler; variance unscaled."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 10).cast("double").alias("v")
    )
    out = compile_aggs(df, {"aggs": {"samp": {
        "random_sampler": {"probability": 0.25, "seed": 3, "seed_field": "k"},
        "aggs": {
            "st": {"stats": {"field": "v"}},
            "es": {"extended_stats": {"field": "v"}},
        },
    }}}).collect()[0]
    assert out["es_count"] == out["st_count"] == out["doc_count"]
    assert out["es_sum"] == pytest.approx(out["st_sum"])
    assert out["es_variance"] == pytest.approx(
        out["es_sum_of_squares"] / 4.0 / (out["es_count"] / 4.0)
        - (out["es_sum"] / out["es_count"]) ** 2,
        rel=1e-6,
    )


def test_significant_terms_background_filter(spark):
    """background_filter narrows the background set (ES option): the same
    foreground scored against a focused background changes bg_count."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("b", "y")]
    df = spark.createDataFrame(rows, "grp string, term string")

    def run(spec):
        return {
            r["t"]: r["bg_count"]
            for r in compile_aggs(
                df,
                {"aggs": {"flt": {"filter": {"term": {"grp": "a"}},
                                  "aggs": {"t": {"significant_terms": spec}}}}},
            ).collect()
        }

    bg_plain = run({"field": "term"})
    bg_focused = run({
        "field": "term",
        "background_filter": {"term": {"grp": "b"}},
    })
    assert bg_plain.get("x", 0) == 3          # whole frame: 3 x rows
    # focused background (grp=b): x appears once there, so fg x (2/3)
    # vs bg x (1/3) is now over-represented with bg_count 1
    assert bg_focused.get("x", 0) == 1


def test_composite_geotile_source_pages(spark):
    """ES composite with a geotile_grid source: cells page in ES's
    PACKED-NUMERIC tile order ((z<<58)|(x<<29)|y) — '4/2/3' before
    '4/10/3' — and the after-cursor resumes on the packed value, so an
    ES-minted cursor replays bucket-for-bucket (r8 verdict item 8: the
    lexicographic divergence is closed)."""
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame(
        [(i, float((i * 37) % 160) - 80.0, float((i * 91) % 360) - 180.0)
         for i in range(200)],
        "id int, lat double, lon double",
    ).select("id", F.struct("lat", "lon").alias("loc"))

    def packed(c):
        z, x, y = map(int, c.split("/"))
        return (z << 58) | (x << 29) | y

    def page(after=None, size=7):
        body = {"comp": {"composite": {
            "size": size,
            "sources": [{"cell": {"geotile_grid": {"field": "loc", "precision": 4}}}],
        }}}
        if after is not None:
            body["comp"]["composite"]["after"] = {"cell": after}
        return [r["cell"] for r in compile_aggs(df, {"aggs": body}).collect()]

    # exhaustive paging reproduces the full cell set in packed order
    all_cells = page(size=10_000)
    assert all_cells == sorted(all_cells, key=packed)
    # precision 4 makes numeric and string order genuinely differ
    assert all_cells != sorted(all_cells)
    walked, after = [], None
    while True:
        p = page(after)
        if not p:
            break
        walked.extend(p)
        if len(p) < 7:
            break
        after = p[-1]
    assert walked == all_cells
    # the page columns are exactly (cell, doc_count) — no packed helper leaks
    body = {"comp": {"composite": {
        "size": 3,
        "sources": [{"cell": {"geotile_grid": {"field": "loc", "precision": 4}}}],
    }}}
    assert compile_aggs(df, {"aggs": body}).columns == ["cell", "doc_count"]
    with pytest.raises(AggsDslError, match="z/x/y"):
        page(after="not-a-tile")
    with pytest.raises(AggsDslError, match="out of range"):
        page(after="4/99/0")


def test_composite_missing_bucket_semantics(spark):
    """ES composite: null source keys DROP by default; missing_bucket
    keeps them, sorted per missing_order (first default, last)."""
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("b", 3.0)], "k string, v double"
    )

    def run(src):
        return [r["k"] for r in compile_aggs(
            df, {"aggs": {"c": {"composite": {
                "size": 10, "sources": [{"k": src}]}}}}
        ).collect()]

    assert run({"terms": {"field": "k"}}) == ["a", "b"]  # default: dropped
    assert run({"terms": {"field": "k", "missing_bucket": True}}) == [None, "a", "b"]
    assert run({"terms": {"field": "k", "missing_bucket": True,
                          "missing_order": "last"}}) == ["a", "b", None]
    with pytest.raises(AggsDslError, match="missing_order"):
        run({"terms": {"field": "k", "missing_bucket": True,
                       "missing_order": "middle"}})


def test_composite_after_with_missing_bucket_refused(spark):
    """Review r8-3: the lexicographic after-cursor NULL-compares a null
    key — typed refusal instead of silently unreachable null buckets."""
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([("a", 1.0), (None, 2.0)], "k string, v double")
    with pytest.raises(AggsDslError, match="missing_bucket"):
        compile_aggs(df, {"aggs": {"c": {"composite": {
            "size": 2, "after": {"k": "a"},
            "sources": [{"k": {"terms": {"field": "k", "missing_bucket": True}}}],
        }}}})


def test_geo_line_bounded_carry_plan(spark):
    """Round-10: geo_line pre-bounds its collect with a row_number window
    over the bucket keys — the plan must show a Window feeding the
    aggregation (the collect gates on rn <= size, so no bucket buffers
    more than size points) while sibling metrics still see every row."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs
    from elasticsearch_hadoop_spark.plans import count_nodes, formatted_plan

    df = spark.createDataFrame(
        [("a", 1.0, {"lat": 1.0, "lon": 2.0})],
        "g string, t double, p struct<lat: double, lon: double>",
    )
    out = compile_aggs(df, {
        "by_g": {
            "terms": {"field": "g"},
            "aggs": {
                "path": {"geo_line": {
                    "point": {"field": "p"}, "sort": {"field": "t"},
                    "size": 5,
                }},
                "avg_t": {"avg": {"field": "t"}},
            },
        },
    })
    plan = formatted_plan(out)
    assert count_nodes(plan, "Window") >= 1
    assert "row_number" in plan
    # no row filter: the avg over every row lives in the SAME aggregation
    assert count_nodes(plan, "ObjectHashAggregate") + count_nodes(plan, "SortAggregate") + count_nodes(plan, "HashAggregate") >= 2
    row = out.collect()[0]
    assert row["path"] == [[2.0, 1.0]] and row["avg_t"] == 1.0
