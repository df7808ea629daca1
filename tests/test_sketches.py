"""Mergeable-sketch error gates: HLL rollup-merge estimates and KLL merged
quantiles vs exact answers on the events fixture.  The property that makes
sketches a scale feature — merge of fine-grain sketches == sketch of the
union — is asserted directly (merged estimate equals the single-pass
estimate, not just "close to exact")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.sketches import (
    hll_merge,
    hll_rollup,
    kll_merge_quantiles,
    kll_rollup,
)


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return tbl(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))


def test_hll_merge_matches_exact_within_bounds(ev):
    per_day = hll_rollup(ev, ["day"], "user_id")
    est = hll_merge(per_day, []).collect()[0]["distinct_est"]
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    # lgK=12 -> rsd ~1.6%; allow 3 sigma
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)


def test_hll_merge_equals_single_pass_sketch(ev):
    """Mergeability: union of per-day sketches == one global sketch."""
    merged = hll_merge(hll_rollup(ev, ["day"], "user_id"), []).collect()[0]["distinct_est"]
    single = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e"))
        .collect()[0]["e"]
    )
    assert merged == single


def test_hll_rollup_to_intermediate_grain(ev):
    """day-sketches -> per-event_type estimate without rescanning raw rows."""
    per = hll_rollup(ev, ["event_type", "day"], "user_id")
    coarse = {r["event_type"]: r["distinct_est"] for r in hll_merge(per, ["event_type"]).collect()}
    exact = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("e")).collect()
    }
    assert set(coarse) == set(exact)
    for k in exact:
        assert abs(coarse[k] - exact[k]) <= max(2, 0.05 * exact[k])


def test_kll_merged_quantiles_close_to_exact(ev):
    per_day = kll_rollup(ev, ["day"], "value")
    got = kll_merge_quantiles(per_day, [], [0.5, 0.9]).collect()[0]
    exact = ev.agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    spread = exact["hi"] - exact["lo"]
    # KLL k=200 normalized rank error ~0.6%; translate loosely via spread
    assert abs(got["q_0_5"] - exact["p50"]) <= 0.05 * spread
    assert abs(got["q_0_9"] - exact["p90"]) <= 0.05 * spread
