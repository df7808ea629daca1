"""Repetition-signal text helpers: n-gram arrays, consecutive-run and
multiplicity folds (Gopher-style quality filters)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_ngram_array_and_edges(spark):
    from elasticsearch_hadoop_spark.functions.text import ngram_array, standard_analyze

    df = spark.createDataFrame([Row(t="a b c d"), Row(t="a"), Row(t="")])
    out = df.select(
        ngram_array(standard_analyze(F.col("t")), 2).alias("bi"),
        ngram_array(standard_analyze(F.col("t")), 3).alias("tri"),
    ).collect()
    assert out[0]["bi"] == ["a b", "b c", "c d"]
    assert out[0]["tri"] == ["a b c", "b c d"]
    assert out[1]["bi"] == [] and out[2]["bi"] == []


def test_max_consecutive_run_and_multiplicity(spark):
    from elasticsearch_hadoop_spark.functions.text import (
        max_consecutive_run,
        max_multiplicity,
        standard_analyze,
    )

    df = spark.createDataFrame(
        [Row(t="x x x y y x"), Row(t="a b a b a"), Row(t="")]
    )
    out = df.select(
        max_consecutive_run(standard_analyze(F.col("t"))).alias("run"),
        max_multiplicity(standard_analyze(F.col("t"))).alias("mult"),
    ).collect()
    assert (out[0]["run"], out[0]["mult"]) == (3, 4)  # x appears 4 times total
    assert (out[1]["run"], out[1]["mult"]) == (1, 3)
    assert (out[2]["run"], out[2]["mult"]) == (0, 0)
