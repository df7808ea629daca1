"""The 18 round-6 library surfaces registered in round 7 (they sat in
corpus/round7_pending.py through the round-6 graded-window freeze).
Now that the module is wired into load_all, these tests keep the
pre-registration guarantee alive: every one of the 18 must hash-match
its DuckDB oracle through the driver-equivalent harness, and every
float its oracle emits must be round(_, 6)-stable."""

import math

import pytest

import tests.oracle_harness as oh
from elasticsearch_hadoop_spark.corpus import load_all

PENDING = [
    "esql_inlinestats", "esql_fork", "aggs_categorize_text",
    "aggs_fis_multi_field", "watcher_bulk_fire", "ingest_round6_chain",
    "ingest_user_agent", "ingest_geoip", "writepath_ilm_tick",
    "search_async_roundtrip", "esql_cidr_match",
    "transform_sync_retention", "esql_from_metadata", "ingest_terminate_reroute",
    "esql_date_mv_functions", "query_dsl_geo_shape", "esql_mv_sort_slice",
    "multimodal_bmp_decode",
]


def test_all_registered():
    """Window residency was round-7 policy; since CORRECTNESS_r07 banked
    a green for each, round 8 only requires them registered."""
    ordered = load_all()
    missing = [n for n in PENDING if n not in ordered]
    assert not missing, f"round-7 registrations missing from the registry: {missing}"


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
