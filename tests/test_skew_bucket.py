"""Scale-path operators: salted skew join (result equality with the plain
join) and bucketed co-located join (plan-level proof that the shuffle is
gone)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.catalog import Catalog
from elasticsearch_hadoop_spark.operators.skew import explain_skew, salted_join
from elasticsearch_hadoop_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on key 1 — the hot-key shape salting exists for
    rows = [Row(k=1 if i % 10 else i, v=i) for i in range(10_000)]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([Row(k=i, label=f"L{i}") for i in range(0, 10_000, 10)])


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain(skewed, dim):
    plain = skewed.join(dim, on=["k"], how="inner")
    salted = salted_join(skewed, dim, on=["k"], how="inner", num_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert canon(salted.select(*plain.columns)) == canon(plain)


def test_salted_left_keeps_unmatched(skewed, dim):
    plain = skewed.join(dim, on=["k"], how="left")
    salted = salted_join(skewed, dim, on=["k"], how="left", num_salts=8)
    assert canon(salted.select(*plain.columns)) == canon(plain)


def test_salted_join_rejects_outer(skewed, dim):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, on=["k"], how="full_outer")


def test_explain_skew_surfaces_hot_key(skewed):
    top = explain_skew(skewed, ["k"], top=3).collect()
    assert top[0].k == 1 and top[0].share == pytest.approx(0.9, abs=0.01)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "idx"))
    orders = spark.createDataFrame([Row(o=i, c=i % 50) for i in range(2_000)])
    lines = spark.createDataFrame([Row(o=i % 2_000, qty=float(i)) for i in range(6_000)])
    try:
        cat.write_bucketed(orders, "b_orders", ["o"], 4, sort_cols=["o"])
        cat.write_bucketed(lines, "b_lines", ["o"], 4, sort_cols=["o"])
        a, b = cat.read_bucketed("b_orders"), cat.read_bucketed("b_lines")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, on=["o"]).groupBy("c").agg(F.sum("qty").alias("s"))
            plan = formatted_plan(joined)
            # the join itself must not shuffle: the only Exchange allowed is
            # the groupBy on c AFTER the join
            join_part = plan.split("SortMergeJoin")[0]
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert len(re.findall(r"^\(\d+\) Exchange", join_part, flags=re.M)) == 0, plan
            # and the result is right
            expect = (
                orders.join(lines, on=["o"]).groupBy("c").agg(F.sum("qty").alias("s"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        for t in ("esidx_b_orders", "esidx_b_lines"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
