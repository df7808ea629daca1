"""Sampling/split operator gates: determinism, partition coverage,
fraction accuracy, per-stratum caps, and the plan properties (split is
scan-stage Column math with no shuffle; top-n-per-stratum plans as
WindowGroupLimit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.sampling import (
    hash_sample,
    hash_split,
    topn_per_stratum,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = tbl(spark, sf_dir, "documents")
    df.cache().count()
    return df


def test_split_covers_all_rows_disjointly(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()


def test_split_fractions_approximately_hold(docs):
    total = docs.count()
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # binomial 3-sigma bounds at n=500: train 400±27, val/test 50±20
    assert abs(counts["train"] / total - 0.8) < 0.06, counts
    assert abs(counts["val"] / total - 0.1) < 0.05, counts
    assert abs(counts["test"] / total - 0.1) < 0.05, counts


def test_split_is_deterministic_and_seed_sensitive(docs):
    a1 = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=1).select("doc_id", "split").collect()}
    a2 = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=1).select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5}, seed=2).select("doc_id", "split").collect()}
    assert a1 == a2
    assert a1 != b  # a different seed reshuffles assignments


def test_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"train": 0.8, "test": 0.1})


def test_sample_subset_semantics(docs):
    """A smaller fraction's sample is a SUBSET of a larger one (threshold
    monotonicity) — lets a pipeline grow its sample without resampling."""
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, seed=3).select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.4, seed=3).select("doc_id").collect()}
    assert small <= big
    assert len(small) < len(big)


def test_stratified_sample_only_listed_strata(docs):
    out = hash_sample(
        docs, "doc_id", {"src0": 1.0, "src1": 0.2}, strata_col="source", seed=3
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got <= {"src0", "src1"}
    n_src0 = out.filter(F.col("source") == "src0").count()
    assert n_src0 == docs.filter(F.col("source") == "src0").count()  # frac 1.0 keeps all


def test_topn_caps_every_stratum(docs):
    out = topn_per_stratum(docs, "lang", 3, "doc_id")
    per = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert per and all(r["n"] <= 3 for r in per)
    # strata with >= 3 members must yield exactly 3
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in per}
    for lang, size in sizes.items():
        assert got.get(lang, 0) == min(3, size)


def test_split_plan_has_no_exchange(docs):
    out = hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1}).select("doc_id", "split")
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, "split must be scan-stage Column math"


def test_topn_plans_as_window_group_limit(docs):
    out = topn_per_stratum(docs, "lang", 3, "doc_id")
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "WindowGroupLimit" in plan


class TestMixture:
    def test_thresholds_exact(self):
        from elasticsearch_hadoop_spark.operators.sampling import (
            HASH_SPACE,
            mixture_thresholds,
        )

        # en is limiting: 100/0.5=200 < 900/0.3=3000 < 800/0.2=4000
        th = mixture_thresholds(
            {"en": 100, "fr": 900, "zh": 800},
            {"en": 500_000, "fr": 300_000, "zh": 200_000},
        )
        assert th["en"] == HASH_SPACE  # limiting domain kept whole
        # fr keeps 300000*200/ (1e6*900) = 60/900 of its rows
        assert abs(th["fr"] / HASH_SPACE - 60 / 900) < 1e-9
        assert abs(th["zh"] / HASH_SPACE - 40 / 800) < 1e-9

    def test_mixture_proportions(self, spark):
        from elasticsearch_hadoop_spark.operators.sampling import sample_to_mixture

        rows = [(i, "a" if i % 10 < 8 else "b") for i in range(5000)]
        df = spark.createDataFrame(rows, "id int, d string")
        out = sample_to_mixture(df, "d", {"a": 0.5, "b": 0.5}, id_col="id")
        got = {r["d"]: r["count"] for r in out.groupBy("d").count().collect()}
        # b (1000 rows) limits: expect ~1000 of each
        assert got["b"] == 1000
        assert abs(got["a"] - 1000) < 100

    def test_mixture_missing_domain_raises(self, spark):
        import pytest
        from elasticsearch_hadoop_spark.operators.sampling import sample_to_mixture

        df = spark.createDataFrame([(1, "a")], "id int, d string")
        with pytest.raises(ValueError):
            sample_to_mixture(df, "d", {"a": 0.5, "zz": 0.5}, id_col="id")

    def test_mixture_high_cardinality_broadcast_path(self, spark):
        """Above _WHEN_CHAIN_MAX domains the threshold comes from a
        broadcast join, not a literal CASE-WHEN chain; results must be
        identical to the literal path's semantics (same hash, same
        integer thresholds) and the plan must show a BroadcastHashJoin
        with no full-cardinality collect."""
        from elasticsearch_hadoop_spark.operators.sampling import (
            _WHEN_CHAIN_MAX,
            sample_to_mixture,
        )

        n_dom = _WHEN_CHAIN_MAX + 36
        rows = [(i, f"dom{i % n_dom}") for i in range(4 * n_dom * 10)]
        df = spark.createDataFrame(rows, "id int, d string")
        weights = {f"dom{k}": 1.0 / n_dom for k in range(n_dom)}
        out = sample_to_mixture(df, "d", weights, id_col="id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "__mix_threshold" not in out.columns
        # uniform weights over uniform data: every domain survives ~whole
        got = {r["d"]: r["count"] for r in out.groupBy("d").count().collect()}
        assert len(got) == n_dom
        assert all(c > 0 for c in got.values())
        # determinism across the two invocations (pure hash threshold)
        again = sample_to_mixture(df, "d", weights, id_col="id")
        assert sorted(r["id"] for r in out.collect()) == sorted(
            r["id"] for r in again.collect()
        )

    def test_mixture_both_paths_agree(self, spark):
        """Force the join path onto a small domain set by monkeypatching
        the cutover and check row-for-row agreement with the when-chain."""
        import elasticsearch_hadoop_spark.operators.sampling as s

        rows = [(i, "a" if i % 10 < 8 else "b") for i in range(3000)]
        df = spark.createDataFrame(rows, "id int, d string")
        lit_ids = sorted(
            r["id"]
            for r in s.sample_to_mixture(df, "d", {"a": 0.6, "b": 0.4}, id_col="id").collect()
        )
        lit_schema = s.sample_to_mixture(df, "d", {"a": 0.6, "b": 0.4}, id_col="id").columns
        orig = s._WHEN_CHAIN_MAX
        s._WHEN_CHAIN_MAX = 1
        try:
            join_df = s.sample_to_mixture(df, "d", {"a": 0.6, "b": 0.4}, id_col="id")
            join_ids = sorted(r["id"] for r in join_df.collect())
        finally:
            s._WHEN_CHAIN_MAX = orig
        assert lit_ids == join_ids
        # drop-in equivalence includes SCHEMA ORDER (join moves the key
        # to position 0 unless restored)
        assert join_df.columns == lit_schema == df.columns

    def test_mixture_domain_cap(self, spark):
        import pytest

        import elasticsearch_hadoop_spark.operators.sampling as s

        df = spark.createDataFrame([(1, "a")], "id int, d string")
        too_many = {f"d{i}": 1 for i in range(s.MAX_MIXTURE_DOMAINS + 1)}
        with pytest.raises(ValueError, match="driver-resident"):
            s.sample_to_mixture(df, "d", too_many, id_col="id")
