"""aggs_dsl unit tests: fixed_interval bucketing, metrics-only global row,
approximate variants, and error paths (sibling buckets, bad metric)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

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
    # (scripted_metric used to be the example here — it gained a real
    # compiler in round 4, so an actually-unknown kind stands in)
    with pytest.raises(AggsDslError, match="unsupported metric"):
        compile_aggs(ev, {"x": {"geo_frobnicate": {"field": "v"}}})


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


def test_pipeline_derivative_and_cumsum(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 40.0), (3, 5.0)], "k int, v double"
    )
    out = compile_aggs(
        df,
        {
            "aggs": {
                "k": {
                    "terms": {"field": "k"},
                    "aggs": {
                        "s": {"sum": {"field": "v"}},
                        "d": {"derivative": {"buckets_path": "s"}},
                        "c": {"cumulative_sum": {"buckets_path": "s"}},
                    },
                }
            }
        },
    ).orderBy("k")
    rows = {r["k"]: (r["d"], r["c"]) for r in out.collect()}
    assert rows[1] == (None, 30.0)  # first bucket: ES omits, we emit NULL
    assert rows[2] == (10.0, 70.0)
    assert rows[3] == (-35.0, 75.0)


def test_pipeline_bucket_selector_filters_buckets(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    out = compile_aggs(
        df,
        {
            "aggs": {
                "k": {
                    "terms": {"field": "k"},
                    "aggs": {
                        "keep": {
                            "bucket_selector": {
                                "buckets_path": {"n": "_count"},
                                "script": "params.n >= 2",
                            }
                        }
                    },
                }
            }
        },
    )
    assert [r["k"] for r in out.collect()] == [1]


def test_pipeline_rejects_quotes_in_script(spark):
    import pytest as _pytest

    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([(1,)], "k int")
    with _pytest.raises(AggsDslError, match="script"):
        compile_aggs(
            df,
            {
                "aggs": {
                    "k": {
                        "terms": {"field": "k"},
                        "aggs": {
                            "x": {
                                "bucket_script": {
                                    "buckets_path": {"n": "_count"},
                                    "script": "params.n; drop'",
                                }
                            }
                        },
                    }
                }
            },
        )


def test_pipeline_rejects_unmapped_params(spark):
    import pytest as _pytest

    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([(1,)], "k int")
    with _pytest.raises(AggsDslError, match="unmapped"):
        compile_aggs(
            df,
            {
                "aggs": {
                    "k": {
                        "terms": {"field": "k"},
                        "aggs": {
                            "x": {
                                "bucket_script": {
                                    "buckets_path": {"n": "_count"},
                                    "script": "params.n + params.missing",
                                }
                            }
                        },
                    }
                }
            },
        )


def test_pipeline_requires_bucket_context(spark):
    import pytest as _pytest

    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([(1,)], "k int")
    with _pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {"aggs": {"d": {"derivative": {"buckets_path": "doc_count"}}}},
        )


def test_sibling_bucket_partitions_by_outer_keys(spark):
    """avg_bucket beside an inner terms agg aggregates within each outer
    bucket, not globally."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 3.0), ("b", 1, 10.0)], "g string, k int, v double"
    )
    out = compile_aggs(
        df,
        {
            "aggs": {
                "g": {
                    "terms": {"field": "g"},
                    "aggs": {
                        "k": {
                            "terms": {"field": "k"},
                            "aggs": {"s": {"sum": {"field": "v"}}},
                        },
                        "avg_s": {"avg_bucket": {"buckets_path": "k>s"}},
                    },
                }
            }
        },
    )
    rows = {(r["g"], r["k"]): r["avg_s"] for r in out.collect()}
    assert rows[("a", 1)] == 2.0 and rows[("a", 2)] == 2.0  # (1+3)/2 within g=a
    assert rows[("b", 1)] == 10.0


def test_composite_pages_are_disjoint_and_ordered(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame(
        [(g, k) for g in "ab" for k in range(4)], "g string, k int"
    )
    spec = {
        "aggs": {
            "p": {
                "composite": {
                    "size": 3,
                    "sources": [
                        {"g": {"terms": {"field": "g"}}},
                        {"k": {"terms": {"field": "k"}}},
                    ],
                }
            }
        }
    }
    page1 = [(r["g"], r["k"]) for r in compile_aggs(df, spec).collect()]
    assert page1 == [("a", 0), ("a", 1), ("a", 2)]
    spec["aggs"]["p"]["composite"]["after"] = {"g": "a", "k": 2}
    page2 = [(r["g"], r["k"]) for r in compile_aggs(df, spec).collect()]
    assert page2 == [("a", 3), ("b", 0), ("b", 1)]


def test_composite_must_be_top_level(spark):
    import pytest as _pytest

    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([("a", 1)], "g string, k int")
    with _pytest.raises(AggsDslError, match="composite"):
        compile_aggs(
            df,
            {
                "aggs": {
                    "g": {
                        "terms": {"field": "g"},
                        "aggs": {
                            "p": {
                                "composite": {
                                    "sources": [{"k": {"terms": {"field": "k"}}}]
                                }
                            }
                        },
                    }
                }
            },
        )


def test_missing_bucket_counts_nulls(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None)], "id int, f string"
    )
    out = compile_aggs(df, {"aggs": {"no_f": {"missing": {"field": "f"}}}})
    assert out.collect()[0]["doc_count"] == 2


def test_significant_terms_jlh_score(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    # foreground (f=1): a-heavy; background: a and b equal
    rows = [("a", 1)] * 3 + [("b", 1)] * 1 + [("a", 0)] * 2 + [("b", 0)] * 4
    df = spark.createDataFrame(rows, "t string, f int")
    out = compile_aggs(
        df,
        {
            "aggs": {
                "fg": {
                    "filter": {"term": {"f": 1}},
                    "aggs": {"t": {"significant_terms": {"field": "t"}}},
                }
            }
        },
    )
    got = {r["t"]: r for r in out.collect()}
    # 'a': fg 3/4 vs bg 5/10 -> over-represented; 'b': fg 1/4 vs bg 5/10 -> under
    assert "a" in got and "b" not in got
    fgp, bgp = 3 / 4, 5 / 10
    assert got["a"]["score"] == pytest.approx((fgp - bgp) * (fgp / bgp))
    assert got["a"]["doc_count"] == 3 and got["a"]["bg_count"] == 5


def test_significant_terms_must_be_terminal(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import AggsDslError, compile_aggs

    df = spark.createDataFrame([("a", 1)], "t string, v int")
    with pytest.raises(AggsDslError):
        compile_aggs(
            df,
            {
                "aggs": {
                    "t": {
                        "significant_terms": {"field": "t"},
                        "aggs": {"m": {"sum": {"field": "v"}}},
                    }
                }
            },
        )


def test_rare_terms_orders_rarest_first(spark):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    rows = [("x",)] * 1 + [("y",)] * 2 + [("z",)] * 5
    df = spark.createDataFrame(rows, "t string")
    out = compile_aggs(
        df, {"aggs": {"t": {"rare_terms": {"field": "t", "max_doc_count": 2}}}}
    )
    assert [(r["t"], r["doc_count"]) for r in out.collect()] == [("x", 1), ("y", 2)]


def test_weighted_avg_skips_docs_missing_value(spark):
    """ES weighted_avg skips a doc when the VALUE field is missing — its
    weight must not inflate the denominator (the fixtures carry no NULLs,
    so the corpus oracle cannot catch this)."""
    df = spark.createDataFrame(
        [(None, 5.0), (10.0, 1.0), (20.0, None), (30.0, 3.0)],
        "v double, w double",
    )
    out = compile_aggs(
        df, {"aggs": {"wa": {"weighted_avg": {"value": {"field": "v"},
                                              "weight": {"field": "w"}}}}}
    ).collect()[0]
    # only (10,1) and (30,3) participate: (10*1 + 30*3) / (1+3) = 25.0
    assert out["wa"] == 25.0


def test_geohash_grid_matches_canonical_vectors(spark):
    """The bit-interleave must reproduce the classic geohash test vectors."""
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (42.6, -5.6)], "lat double, lon double"
    ).select(F.struct("lat", "lon").alias("location"))
    out = compile_aggs(
        df, {"aggs": {"gh": {"geohash_grid": {"field": "location", "precision": 5}}}}
    )
    assert {r["gh"] for r in out.collect()} == {"u4pru", "ezs42"}


def test_terms_missing_and_min_doc_count(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,), (None,), (None,)], "s string"
    )
    out = compile_aggs(
        df, {"aggs": {"s": {"terms": {"field": "s", "missing": "N/A", "size": 10}}}}
    ).collect()
    assert {(r["s"], r["doc_count"]) for r in out} == {("N/A", 3), ("a", 2), ("b", 1)}
    out2 = compile_aggs(
        df,
        {"aggs": {"s": {"terms": {"field": "s", "missing": "N/A",
                                  "min_doc_count": 2, "size": 10}}}},
    ).collect()
    assert {(r["s"], r["doc_count"]) for r in out2} == {("N/A", 3), ("a", 2)}


def test_terms_order_under_filter_wrapper_and_nested_rejection(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 30), ("b", 4), ("c", 100)], "s string, v long"
    )
    # keyless narrowing bucket above terms: order/size/min_doc_count apply
    spec = {
        "aggs": {
            "small": {
                "filter": {"range": {"v": {"lt": 50}}},
                "aggs": {
                    "s": {
                        "terms": {"field": "s", "size": 1, "order": {"total": "desc"}},
                        "aggs": {"total": {"sum": {"field": "v"}}},
                    }
                },
            }
        }
    }
    out = compile_aggs(df, spec).collect()
    assert [(r["s"], r["total"]) for r in out] == [("b", 34)]
    # explicit order/min_doc_count with a nested KEYED bucket: flat rows
    # cannot honor per-terms totals - must refuse, not approximate
    for extra in ({"order": {"_count": "desc"}}, {"min_doc_count": 2}):
        bad = {
            "s": {
                "terms": {"field": "s", **extra},
                "aggs": {"h": {"histogram": {"field": "v", "interval": 10}}},
            }
        }
        with pytest.raises(AggsDslError, match="keyed bucket level"):
            compile_aggs(df, {"aggs": bad})


# ---------------------------------------------------------------- round 4


def test_percentile_ranks_skips_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "v double"
    )
    out = compile_aggs(
        df, {"aggs": {"pr": {"percentile_ranks": {"field": "v", "values": [2]}}}}
    ).collect()[0]
    assert out["pr_2"] == pytest.approx(100 * 2 / 3)  # null excluded from CDF


def test_percentile_ranks_requires_values(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(AggsDslError, match="values"):
        compile_aggs(df, {"aggs": {"p": {"percentile_ranks": {"field": "v"}}}})


def test_multi_terms_requires_two_sources(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    with pytest.raises(AggsDslError, match="multi_terms"):
        compile_aggs(
            df, {"aggs": {"k": {"multi_terms": {"terms": [{"field": "x"}]}}}}
        )


def test_adjacency_matrix_omits_empty_intersections(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "t string, v int"
    )
    out = compile_aggs(
        df,
        {
            "aggs": {
                "k": {
                    "adjacency_matrix": {
                        "filters": {
                            "ta": {"term": {"t": "a"}},
                            "tb": {"term": {"t": "b"}},
                            "big": {"range": {"v": {"gte": 2}}},
                        }
                    }
                }
            }
        },
    )
    got = {r["k"]: r["doc_count"] for r in out.collect()}
    assert got == {"ta": 2, "tb": 1, "big": 2, "big&ta": 1, "big&tb": 1}
    # ta&tb intersection is empty -> omitted, and pair keys sort a<b


def test_bucket_sort_truncates_with_from(spark):
    df = spark.createDataFrame(
        [(k, float(k * 10)) for k in range(1, 7)], "k int, v double"
    )
    out = compile_aggs(
        df,
        {
            "aggs": {
                "k": {
                    "terms": {"field": "k"},
                    "aggs": {
                        "s": {"sum": {"field": "v"}},
                        "cut": {
                            "bucket_sort": {
                                "sort": [{"s": {"order": "desc"}}],
                                "from": 1,
                                "size": 2,
                            }
                        },
                    },
                }
            }
        },
    )
    assert [r["k"] for r in out.collect()] == [4, 5]  # top-3 minus the first


def test_auto_date_histogram_picks_fitting_rung(spark):
    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1, 0, 0, s),) for s in range(0, 50, 2)]
    df = spark.createDataFrame(rows, "ts timestamp")
    # span 48s: 1s rung -> 49 buckets > 12, 5s rung -> 10 buckets <= 12
    out = compile_aggs(
        df, {"aggs": {"b": {"auto_date_histogram": {"field": "ts", "buckets": 12}}}}
    ).collect()
    assert len(out) == 10
    assert all(r["b"].second % 5 == 0 for r in out)
    # tight target falls through to a coarser rung
    out2 = compile_aggs(
        df, {"aggs": {"b": {"auto_date_histogram": {"field": "ts", "buckets": 2}}}}
    ).collect()
    assert len(out2) == 2  # 30s rung: buckets at :00 and :30


def test_auto_date_histogram_empty_input(spark):
    df = spark.createDataFrame([], "ts timestamp")
    out = compile_aggs(
        df, {"aggs": {"b": {"auto_date_histogram": {"field": "ts", "buckets": 5}}}}
    )
    assert out.count() == 0  # no rows, no crash on null min/max


def test_boxplot_exact_quartiles(spark):
    df = spark.createDataFrame([Row(g="a", v=float(x)) for x in range(1, 6)])
    out = compile_aggs(
        df, {"g": {"terms": {"field": "g"}, "aggs": {"b": {"boxplot": {"field": "v"}}}}}
    ).collect()[0]
    assert (out.b_min, out.b_q1, out.b_q2, out.b_q3, out.b_max) == (1.0, 2.0, 3.0, 4.0, 5.0)


def test_median_absolute_deviation_per_bucket(spark):
    # bucket a: values 1..5 -> median 3, deviations [2,1,0,1,2] -> MAD 1
    # bucket b: values [10, 10, 40] -> median 10, deviations [0,0,30] -> MAD 0
    rows = [Row(g="a", v=float(x)) for x in range(1, 6)]
    rows += [Row(g="b", v=10.0), Row(g="b", v=10.0), Row(g="b", v=40.0)]
    out = {
        r.g: r.mad
        for r in compile_aggs(
            spark.createDataFrame(rows),
            {
                "g": {
                    "terms": {"field": "g"},
                    "aggs": {"mad": {"median_absolute_deviation": {"field": "v"}}},
                }
            },
        ).collect()
    }
    assert out == {"a": 1.0, "b": 0.0}


def test_median_absolute_deviation_keyless(spark):
    """Top-level (bucket-less) MAD: the global median must attach via a
    one-row broadcast aggregate, never an unpartitioned window over the
    input (round-5 scale fix) — and the plan must show no Window at all."""
    rows = [Row(v=float(x)) for x in range(1, 6)]  # median 3, MAD 1
    out = compile_aggs(
        spark.createDataFrame(rows),
        {"mad": {"median_absolute_deviation": {"field": "v"}}},
    )
    assert out.collect()[0]["mad"] == 1.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_string_stats_lengths(spark):
    df = spark.createDataFrame([Row(s="ab"), Row(s="abcd"), Row(s=None)])
    out = compile_aggs(df, {"ss": {"string_stats": {"field": "s"}}}).collect()[0]
    assert (out.ss_count, out.ss_min_length, out.ss_max_length) == (2, 2, 4)
    assert out.ss_avg_length == pytest.approx(3.0)


def test_sampler_deterministic_and_bounded(spark):
    df = spark.createDataFrame([Row(i=i, g="ab"[i % 2]) for i in range(50)])
    spec = {
        "s": {
            "sampler": {"shard_size": 10, "seed_field": "i"},
            "aggs": {"n": {"value_count": {"field": "i"}}},
        }
    }
    a = compile_aggs(df, spec).collect()[0]
    b = compile_aggs(df.repartition(7), spec).collect()[0]
    assert a.doc_count == 10 and b.doc_count == 10
    assert a.n == b.n  # partitioning-invariant sample


def test_sampler_requires_seed_field(spark):
    df = spark.createDataFrame([Row(i=1)])
    with pytest.raises(AggsDslError, match="seed_field"):
        compile_aggs(df, {"s": {"sampler": {"shard_size": 5}}})


def test_diversified_sampler_caps_per_value(spark):
    df = spark.createDataFrame(
        [Row(i=i, g="a" if i < 40 else "b") for i in range(50)]
    )
    out = compile_aggs(
        df,
        {
            "s": {
                "diversified_sampler": {
                    "field": "g",
                    "max_docs_per_value": 3,
                    "shard_size": 100,
                    "seed_field": "i",
                },
                "aggs": {"g": {"terms": {"field": "g"}}},
            }
        },
    ).collect()
    assert {r.g: r.doc_count for r in out} == {"a": 3, "b": 3}


def test_histogram_min_doc_count_zero_densifies(spark):
    df = spark.createDataFrame([Row(v=0.5), Row(v=0.7), Row(v=4.2)])
    out = compile_aggs(
        df,
        {
            "h": {
                "histogram": {
                    "field": "v",
                    "interval": 1.0,
                    "min_doc_count": 0,
                    "extended_bounds": {"min": -1.0, "max": 5.0},
                }
            }
        },
    ).collect()
    assert [r.h for r in out] == [-1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert [r.doc_count for r in out] == [0, 2, 0, 0, 0, 1, 0]


def test_date_histogram_min_doc_count_zero_fixed_interval(spark):
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(ts=base), Row(ts=base + datetime.timedelta(hours=3))]
    )
    out = compile_aggs(
        df,
        {"h": {"date_histogram": {"field": "ts", "fixed_interval": "1h",
                                   "min_doc_count": 0}}},
    ).collect()
    assert len(out) == 4  # 00,01,02,03 — gaps filled
    assert [r.doc_count for r in out] == [1, 0, 0, 1]


def test_densify_rejects_nested_and_calendar(spark):
    df = spark.createDataFrame([Row(v=1.0, g="a")])
    with pytest.raises(AggsDslError, match="only.*keyed"):
        compile_aggs(
            df,
            {
                "h": {
                    "histogram": {"field": "v", "interval": 1.0, "min_doc_count": 0},
                    "aggs": {"g": {"terms": {"field": "g"}}},
                }
            },
        )
    with pytest.raises(AggsDslError, match="fixed_interval"):
        compile_aggs(
            df,
            {"h": {"date_histogram": {"field": "v", "calendar_interval": "day",
                                       "min_doc_count": 0}}},
        )


def test_densify_bucket_cap(spark):
    df = spark.createDataFrame([Row(v=0.0), Row(v=1e9)])
    with pytest.raises(AggsDslError, match="cap 100k"):
        compile_aggs(
            df,
            {"h": {"histogram": {"field": "v", "interval": 1.0, "min_doc_count": 0}}},
        ).collect()


def test_stats_bucket_and_percentiles_bucket(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 40.0), (3, 5.0)], "k int, v double"
    )
    out = compile_aggs(
        df,
        {
            "aggs": {
                "k": {
                    "terms": {"field": "k"},
                    "aggs": {"s": {"sum": {"field": "v"}}},
                },
                "st": {"stats_bucket": {"buckets_path": "k>s"}},
                "pb": {"percentiles_bucket": {"buckets_path": "k>s", "percents": [50]}},
            }
        },
    ).collect()
    r = out[0]
    # bucket sums: 30, 40, 5 -> count 3, min 5, max 40, sum 75, median 30
    assert (r.st_count, r.st_min, r.st_max, r.st_sum) == (3, 5.0, 40.0, 75.0)
    assert r.st_avg == pytest.approx(25.0)
    assert r.pb_50 == pytest.approx(30.0)
    assert all((x.st_count, x.pb_50) == (3, 30.0) for x in out)  # repeated per row


def test_terms_include_exclude(spark):
    df = spark.createDataFrame(
        [(x,) for x in ["aa", "ab", "ba", "ab", None]], "s string"
    )
    out = compile_aggs(
        df, {"s": {"terms": {"field": "s", "include": "a.*", "exclude": ["ab"]}}}
    ).collect()
    assert {r.s: r.doc_count for r in out} == {"aa": 1}
    # value-list include keeps exactly the named keys
    out2 = compile_aggs(
        df, {"s": {"terms": {"field": "s", "include": ["ab", "ba"]}}}
    ).collect()
    assert {r.s: r.doc_count for r in out2} == {"ab": 2, "ba": 1}


def test_pipeline_degenerate_series(spark):
    """Degenerate bucket series must stay deterministic, never crash:
    a single bucket nulls derivative/serial_diff (no predecessor) while
    moving_fn still averages its own window; an all-null metric carries
    null through cumulative_sum; a constant series has no change point
    (null score — cp_key is meaningless when the score is null) and a
    single-bucket series nulls both."""
    one = spark.createDataFrame([Row(g=1.0, v=2.0)])
    row = compile_aggs(one, {
        "g": {"histogram": {"field": "g", "interval": 1.0},
              "aggs": {"s": {"sum": {"field": "v"}},
                       "d": {"derivative": {"buckets_path": "s"}},
                       "sd": {"serial_diff": {"buckets_path": "s", "lag": 2}},
                       "mf": {"moving_fn": {
                           "buckets_path": "s", "window": 3,
                           "script": "MovingFunctions.unweightedAvg(values)"}}}},
    }).collect()[0]
    assert (row.s, row.d, row.sd, row.mf) == (2.0, None, None, 2.0)

    nulls = spark.createDataFrame(
        [Row(g=1.0, v=None), Row(g=2.0, v=None)], "g double, v double"
    )
    out = compile_aggs(nulls, {
        "g": {"histogram": {"field": "g", "interval": 1.0},
              "aggs": {"a": {"avg": {"field": "v"}},
                       "c": {"cumulative_sum": {"buckets_path": "a"}}}},
    }).collect()
    assert all(r.a is None and r.c is None for r in out)

    const = spark.createDataFrame([Row(g=float(i), v=5.0) for i in range(6)])
    out = compile_aggs(const, {
        "g": {"histogram": {"field": "g", "interval": 1.0},
              "aggs": {"s": {"sum": {"field": "v"}}}},
        "cp": {"change_point": {"buckets_path": "g>s"}},
    }).collect()
    assert all(r.cp_score is None for r in out)

    single = compile_aggs(one, {
        "g": {"histogram": {"field": "g", "interval": 1.0},
              "aggs": {"s": {"sum": {"field": "v"}}}},
        "cp": {"change_point": {"buckets_path": "g>s"}},
    }).collect()[0]
    assert single.cp_key is None and single.cp_score is None
