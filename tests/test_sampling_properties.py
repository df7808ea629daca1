"""Property pins for the deterministic sampling operators — the
guarantees a 100 TB training-data pipeline leans on:

- threshold MONOTONICITY: growing a sample fraction only ever ADDS rows
  (a 1% sample is a strict subset of the same-seed 2% sample), so
  resampling at a larger rate never invalidates work done on the smaller
  sample;
- split STABILITY: a row's split label depends only on (seed, id), never
  on the rest of the dataset — adding data cannot move existing rows
  between train/val/test;
- split PARTITION: every row lands in exactly one split;
- seed INDEPENDENCE: different seeds produce different (not correlated
  via threshold) samples."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.operators.sampling import hash_sample, hash_split

N = 400


@pytest.fixture(scope="module")
def ids(spark):
    df = spark.range(N).withColumnRenamed("id", "doc_id")
    df.cache().count()
    return df


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    f1=st.floats(min_value=0.05, max_value=0.5),
    f2=st.floats(min_value=0.5, max_value=0.95),
    seed=st.integers(min_value=0, max_value=5),
)
def test_sample_fraction_monotone(ids, f1, f2, seed):
    small = {r["doc_id"] for r in hash_sample(ids, "doc_id", f1, seed=seed).collect()}
    big = {r["doc_id"] for r in hash_sample(ids, "doc_id", f2, seed=seed).collect()}
    assert small <= big, f"f1={f1} f2={f2} seed={seed}: {sorted(small - big)[:5]}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    cut=st.floats(min_value=0.1, max_value=0.9),
    seed=st.integers(min_value=0, max_value=5),
)
def test_split_stable_under_dataset_growth(spark, ids, cut, seed):
    fracs = {"train": round(cut, 6), "test": round(1 - round(cut, 6), 6)}
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids, "doc_id", fracs, seed=seed).collect()
    }
    half = ids.filter("doc_id % 2 = 0")
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(half, "doc_id", fracs, seed=seed).collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    # partition: every row labeled, exactly one label each (dict implies it)
    assert len(full) == N
