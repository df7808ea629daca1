"""spread() must be a small-file correction, not an unconditional shuffle:
on input already split at-or-above the session parallelism it must return
the plan untouched (no Exchange), and on a single-split file it must still
fan out to the session's parallelism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus._util import spread


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_spread_noop_on_well_split_input(spark, tmp_path):
    path = str(tmp_path / "many_splits.parquet")
    n = spark.sparkContext.defaultParallelism
    (
        spark.range(0, 10_000)
        .withColumn("text", F.concat(F.lit("doc "), F.col("id")))
        .repartition(n * 2)
        .write.parquet(path)
    )
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() >= n
    out = spread(spark, df)
    assert out is df, "spread() must not touch a well-split input"
    assert "Exchange" not in _physical(out.select("text"))


def test_spread_fans_out_single_split_input(spark, tmp_path):
    path = str(tmp_path / "one_split.parquet")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread(spark, df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


@pytest.mark.parametrize("qname", ["dedup_minhash_lsh", "text_quality"])
def test_corpus_spread_users_have_no_exchange_before_compute_on_split_input(
    spark, tmp_path, monkeypatch, qname
):
    """Rewrite the documents fixture as a multi-split directory and check
    the spread()-using corpus queries plan no round-robin Exchange."""
    from elasticsearch_hadoop_spark.corpus import load_all

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = spark.sparkContext.defaultParallelism
    split_dir = str(tmp_path / "documents.parquet")
    src.repartition(n).write.parquet(split_dir)

    plan = _physical(load_all()[qname].fn(spark, str(tmp_path)))
    assert "REPARTITION_BY_NUM" not in plan
    assert "RoundRobinPartitioning" not in plan
