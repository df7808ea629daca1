"""Property-based differential tests for the round-9 surfaces, each
against a pure-Python reference:

- sql_page keyset paging (NULL keys included, asc and desc, every
  fetch_size): the concatenated pages must equal the reference's full
  Spark-default sort (asc nulls-first / desc nulls-last), no row lost,
  duplicated, or reordered, cursor exhaustion exact.
- ngram / edge_ngram token streams vs a Python sliding-window reference
  (pins the offset-major length-minor order and short-string edges).
- SLM retention vs a Python model of ES's precedence (min_count over
  expire_after; max_count trims oldest).
- ES|QL BUCKET numeric nice-span ladder vs a Python reference.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ------------------------------------------------------------ sql_page


_ROWS = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(-5, 5)), st.integers(0, 99)),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[1],
)


@settings(**_SETTINGS)
@given(rows=_ROWS, fetch=st.integers(1, 7), desc=st.booleans())
def test_sql_page_pages_equal_reference_sort(spark, tmp_path_factory, rows, fetch, desc):
    from elasticsearch_hadoop_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("pg")))
    df = spark.createDataFrame(rows or [(None, -1)], "n int, k int")
    if not rows:
        df = df.filter(F.col("k") >= 0)  # empty frame path
    cat.write_index(df, "t", mode="overwrite")
    stmt = f"SELECT n, k FROM t ORDER BY n {'DESC' if desc else 'ASC'}, k"
    got, resp = [], cat.sql_page(stmt, fetch_size=fetch)
    pages = 0
    while True:
        got.extend((r[0], r[1]) for r in resp["rows"])
        pages += 1
        assert len(resp["rows"]) <= fetch
        if resp["cursor"] is None:
            break
        resp = cat.sql_page(cursor=resp["cursor"])
        assert pages <= len(rows) + 2, "cursor failed to terminate"
    if desc:
        # Spark desc: NULLs last
        ref = sorted(rows, key=lambda t: (t[0] is None, -(t[0] or 0), t[1]))
    else:
        # Spark asc: NULLs first
        ref = sorted(rows, key=lambda t: (t[0] is not None, t[0] or 0, t[1]))
    assert got == ref


# ------------------------------------------------------ ngram streams


def _ref_ngrams(s: str, mn: int, mx: int, edge: bool) -> list[str]:
    if edge:
        return [s[:g] for g in range(mn, mx + 1) if len(s) >= g]
    out = []
    for start in range(len(s)):
        for g in range(mn, mx + 1):
            if start + g <= len(s):
                out.append(s[start : start + g])
    return out


@settings(**_SETTINGS)
@given(
    s=st.text(alphabet="ab X.é", min_size=0, max_size=12),
    mn=st.integers(1, 3),
    width=st.integers(0, 2),
    edge=st.booleans(),
)
def test_ngram_streams_match_reference(spark, s, mn, width, edge):
    from elasticsearch_hadoop_spark.functions.text import analyze_api

    mx = mn + width
    df = spark.createDataFrame([(s,)], "text string")
    got = [
        r["token"]
        for r in analyze_api(
            df, "text", "edge_ngram" if edge else "ngram", min_gram=mn, max_gram=mx
        ).collect()
    ]
    assert got == _ref_ngrams(s, mn, mx, edge)


# ------------------------------------------------------ SLM retention


def _ref_retention(taken, now, expire, mn, mx):
    keep = sorted(taken)
    drop = []
    if expire is not None:
        aged = [t for t in keep if now - t > expire]
        can = max(0, len(keep) - mn)
        drop.extend(aged[:can])
        keep = [t for t in keep if t not in drop]
    if mx is not None and len(keep) > mx:
        extra = len(keep) - mx
        drop.extend(keep[:extra])
        keep = keep[extra:]
    return drop, keep


@settings(**_SETTINGS)
@given(
    taken=st.lists(st.integers(0, 40), min_size=0, max_size=8, unique=True),
    age=st.integers(41, 60),
    expire=st.one_of(st.none(), st.integers(1, 50)),
    mn=st.integers(0, 4),
    extra_cap=st.one_of(st.none(), st.integers(0, 6)),
)
def test_slm_retention_matches_reference(
    spark, tmp_path_factory, taken, age, expire, mn, extra_cap
):
    from elasticsearch_hadoop_spark.catalog import Catalog
    from elasticsearch_hadoop_spark.slm import (
        put_slm_policy,
        execute_slm_policy,
        get_slm_policy,
        slm_retention_tick,
    )

    mx = None if extra_cap is None else max(mn, 1) + extra_cap
    base = tmp_path_factory.mktemp("slm")
    cat = Catalog(spark, str(base / "idx"))
    cat.write_index(spark.range(3).select(F.col("id").alias("k")), "t")
    retention = {"min_count": mn}
    if expire is not None:
        retention["expire_after"] = f"{expire}s"
    if mx is not None:
        retention["max_count"] = mx
    put_slm_policy(cat, "p", {
        "name": "<s-{now/d}>", "repository": str(base / "repo"),
        "config": {"indices": "t"}, "retention": retention,
    })
    name_of = {}
    for t in sorted(taken):
        name_of[t] = execute_slm_policy(cat, "p", now=float(t))["snapshot_name"]
    dropped = slm_retention_tick(cat, "p", now=float(age))
    ref_drop, ref_keep = _ref_retention(taken, age, expire, mn, mx)
    assert dropped == [name_of[t] for t in ref_drop]
    kept = [s["snapshot"] for s in get_slm_policy(cat, "p")["snapshots"]]
    assert kept == [name_of[t] for t in ref_keep]


# ----------------------------------------------- BUCKET numeric spans


def _ref_span(count, frm, to):
    # upstream ES|QL Bucket.pickRounding: only {5, 10} x 10^k candidates
    precise = (to - frm) / count
    next_p10 = 10.0 ** math.ceil(math.log10(precise))
    half = next_p10 / 2.0
    return half if precise < half else next_p10


@settings(**_SETTINGS)
@given(
    count=st.integers(1, 100),
    frm=st.integers(-1000, 1000),
    width=st.integers(1, 100000),
)
def test_bucket_numeric_span_matches_reference(count, frm, width):
    from elasticsearch_hadoop_spark.esql import _bucket_pick_numeric_span

    to = frm + width
    assert _bucket_pick_numeric_span(count, float(frm), float(to)) == pytest.approx(
        _ref_span(count, frm, to)
    )
    # the chosen span always covers the precise width and is never more
    # than 10x it (the ladder's guarantee)
    span = _bucket_pick_numeric_span(count, float(frm), float(to))
    precise = (to - frm) / count
    assert span >= precise and span <= 10 * precise + 1e-9
