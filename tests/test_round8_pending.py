"""The 4 round-7-built surfaces registered in round 8 (they sat in
corpus/round8_pending.py through the round-7 graded-window freeze).
Now that the module is wired into load_all, these tests keep the
pre-registration guarantee alive: every one must hash-match its DuckDB
oracle through the driver-equivalent harness, and every float its
oracle emits must be round(_, 6)-stable."""

import math

import pytest

import tests.oracle_harness as oh
from elasticsearch_hadoop_spark.corpus import load_all

PENDING = ["ingest_circle_geogrid", "writepath_pit_search_after",
           "ingest_geohash_decode", "esql_match_colon"]


def test_all_still_registered():
    """These four were graded green in round 8 (CORRECTNESS_r08) and left
    the window; the oracle-parity tests below keep guarding the queries
    themselves.  Window placement policy lives in
    tests/test_registration_order.py."""
    ordered = load_all()
    missing = [n for n in PENDING if n not in ordered]
    assert not missing, f"round-8 registrations dropped from the registry: {missing}"


@pytest.mark.parametrize("name", PENDING)
def test_pending_query_matches_oracle(name, spark, sf_dir, duck):
    ok, msg = oh.compare(load_all()[name], spark, sf_dir, duck)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", PENDING)
def test_pending_oracle_floats_rounded(name, duck):
    res = duck.execute(load_all()[name].oracle)
    for row in res.fetchall()[:2000]:
        for v in row:
            if isinstance(v, float) and math.isfinite(v):
                assert round(v, 6) == v, (name, v)
