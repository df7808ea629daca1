"""Approximate-aggregate error gates (SURVEY.md §5): HLL++ distinct counts
and percentile_approx sketches vs their exact counterparts on the fixtures.
The exact variants are oracle-hash-checked by the driver; these pin the
approximation error the corpus docstrings promise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus._util import tbl


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return tbl(spark, sf_dir, "lineitem")


@pytest.mark.parametrize("col", ["l_orderkey", "l_partkey", "l_suppkey"])
def test_approx_count_distinct_within_rsd(li, col):
    rsd = 0.02
    exact, approx = li.agg(
        F.countDistinct(col).alias("e"),
        F.approx_count_distinct(col, rsd=rsd).alias("a"),
    ).collect()[0]
    # HLL++ standard error is rsd; allow 3 sigma
    assert abs(approx - exact) <= max(1, 3 * rsd * exact), (exact, approx)


def test_percentile_approx_within_accuracy(li):
    accuracy = 10_000
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.9)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(accuracy)).alias("approx"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    ).collect()[0]
    # percentile_approx guarantees rank error <= n/accuracy; translate to a
    # loose value tolerance via the data range
    assert row["lo"] <= row["approx"] <= row["hi"]
    assert row["approx"] == pytest.approx(row["exact"], rel=0.02)
