"""Property-based differential tests for the round-10 rewrites, each
against a pure-Python reference:

- eql_sample size>1 bounded-carry rewrite vs a brute-force Python model
  (per key x slot: sort matching events by (ts, id), sample j pairs the
  j-th smallest of each slot; keys missing any slot yield nothing) —
  random event streams with NULL timestamps, multi-slot overlap, and
  hot keys.
- the MV rank functions after the bind-once rewrite (MV_MEDIAN,
  MV_PERCENTILE, MV_MAD, MV_PSERIES_WEIGHTED_SUM) vs numpy-free Python
  references, over arrays with NULLs, empties, and duplicates.
- sql_page columnar mode vs row mode: same statement, same pages, the
  transpose is exact and the cursor carries the mode.
- ES|QL TOP after the per-frame bounded-carry rewrite vs a Python
  sorted-slice reference, mixed with an unfiltered COUNT(*), over
  groups with hot keys and NULL-only values.
- geo_line after the bounded-carry window pre-pass vs a Python
  sort-truncate reference (NULL sorts/points, asc+desc, hot buckets,
  sibling doc_count unfiltered).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ------------------------------------------------- eql_sample size > 1


_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 2),                      # key (few keys -> hot keys)
        st.sampled_from(["a", "b", "c"]),       # type -> slot membership
        st.one_of(st.none(), st.integers(0, 20)),  # ts (NULL possible)
    ),
    min_size=0,
    max_size=40,
)


def _ref_sample(rows, size):
    """Python model: slot i takes events matching filter i (a-slot: typ
    in {a, c}; b-slot: typ in {b, c} — overlapping on purpose), NULL ts
    excluded; per key, sample j pairs each slot's j-th smallest
    (ts, event_id); a key yields min(size, fewest slot matches)."""
    out = {}
    for key in {r[0] for r in rows}:
        slots = []
        for member in ({"a", "c"}, {"b", "c"}):
            evs = sorted(
                (r[2], r[3]) for r in rows
                if r[0] == key and r[1] in member and r[2] is not None
            )
            slots.append(evs)
        n = min(size, *[len(s) for s in slots])
        for j in range(n):
            out[(key, j + 1)] = (slots[0][j][1], slots[1][j][1])
    return out


@settings(**_SETTINGS)
@given(rows=_EVENTS, size=st.integers(2, 4))
def test_eql_sample_bounded_carry_matches_reference(spark, rows, size):
    from elasticsearch_hadoop_spark.eql import eql_sample

    rows = [(k, t, ts, i) for i, (k, t, ts) in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "k int, typ string, ts_i int, event_id int"
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_i") + F.lit(1700000000)))
    got = {
        (r["k"], r["sample_seq"]): (r["step1_event_id"], r["step2_event_id"])
        for r in eql_sample(
            df, by="k", ts="ts",
            filters=[
                {"terms": {"typ": ["a", "c"]}},
                {"terms": {"typ": ["b", "c"]}},
            ],
            payload=["event_id"], size=size,
        ).collect()
    }
    ref_rows = [(k, t, ts, i) for (k, t, ts, i) in rows]
    assert got == _ref_sample(ref_rows, size)


# ------------------------------------------------- MV rank functions


_ARR = st.lists(
    st.one_of(st.none(), st.integers(-50, 50).map(float)),
    min_size=0,
    max_size=12,
)


def _ref_median(xs):
    xs = sorted(x for x in xs if x is not None)
    n = len(xs)
    if n == 0:
        return None
    if n % 2 == 1:
        return float(xs[n // 2])
    return (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def _ref_percentile(xs, p):
    xs = sorted(x for x in xs if x is not None)
    n = len(xs)
    if n == 0 or p < 0 or p > 100:
        return None
    idx = (n - 1) * p / 100.0
    lo = int(idx)
    frac = idx - lo
    hi = xs[lo + 1] if lo + 1 < n else xs[lo]
    return xs[lo] + (hi - xs[lo]) * frac


def _ref_mad(xs):
    med = _ref_median(xs)
    if med is None:
        return None
    return _ref_median([abs(x - med) for x in xs if x is not None])


def _ref_pseries(xs, p):
    xs = [x for x in xs if x is not None]
    if not xs:
        return None
    return sum(v / (i ** p) for i, v in enumerate(xs, start=1))


@settings(**_SETTINGS)
@given(arr=_ARR, p=st.integers(0, 100))
def test_mv_rank_functions_match_reference(spark, arr, p):
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame([(1, arr)], "id int, xs array<double>")
    row = esql(
        f"FROM t | EVAL med = MV_MEDIAN(xs), pct = MV_PERCENTILE(xs, {p}),"
        " mad = MV_MEDIAN_ABSOLUTE_DEVIATION(xs),"
        " ps = MV_PSERIES_WEIGHTED_SUM(xs, 1.5),"
        " n = MV_COUNT(xs)"
        " | KEEP med, pct, mad, ps, n",
        tables={"t": df},
    ).collect()[0]
    def check(got, ref):
        if ref is None:
            assert got is None
        else:
            assert got == pytest.approx(ref)

    check(row["med"], _ref_median(arr))
    check(row["pct"], _ref_percentile(arr, p))
    check(row["mad"], _ref_mad(arr))
    check(row["ps"], _ref_pseries(arr, 1.5))
    assert row["n"] == sum(1 for x in arr if x is not None)


# ------------------------------------------------- sql_page columnar


@settings(**_SETTINGS)
@given(
    n=st.integers(0, 12),
    fetch=st.integers(1, 5),
    desc=st.booleans(),
)
def test_sql_page_columnar_transposes_row_mode(spark, tmp_path_factory, n, fetch, desc):
    """Columnar pages are the exact column-major transpose of the row-mode
    pages for the same statement + fetch_size, page by page, and the
    cursor carries the mode to every continuation."""
    from elasticsearch_hadoop_spark.catalog import Catalog

    root = str(tmp_path_factory.mktemp("colprop"))
    cat = Catalog(spark, root)
    df = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 3).cast("int").alias("v"),
    )
    cat.write_index(df, "t", mode="overwrite")
    order = "k DESC" if desc else "k"
    stmt = f"SELECT k, v FROM t ORDER BY {order}"

    def pages(columnar):
        resp = cat.sql_page(stmt, fetch_size=fetch, columnar=columnar)
        out = []
        while True:
            if columnar:
                assert "rows" not in resp
                out.append([list(r) for r in zip(*resp["values"])]
                           if resp["values"] and any(resp["values"]) else [])
            else:
                out.append([list(r) for r in resp["rows"]])
            if resp["cursor"] is None:
                return out
            resp = cat.sql_page(cursor=resp["cursor"])

    assert pages(True) == pages(False)


# ------------------------------------------------- ES|QL bounded TOP


_TOP_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),                        # group (few -> hot groups)
        st.one_of(st.none(), st.integers(-9, 9).map(float)),  # value
    ),
    min_size=0,
    max_size=30,
)


@settings(**_SETTINGS)
@given(rows=_TOP_ROWS, k=st.integers(1, 4))
def test_esql_top_matches_reference(spark, rows, k):
    """The per-TOP bounded-frame compile returns exactly the k smallest /
    largest non-NULL values per group, next to an unfiltered COUNT(*),
    for every group — including groups with only NULL values (empty
    array, count intact)."""
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame(
        [(g, v) for g, v in rows] or [(None, None)], "g int, v double"
    )
    out = {r["g"]: r for r in esql(
        f'FROM t | STATS n = COUNT(*), hi = TOP(v, {k}, "desc"),'
        f' lo = TOP(v, {k}, "asc") BY g',
        tables={"t": df},
    ).collect()}
    src = rows or [(None, None)]
    for g in {r[0] for r in src}:
        vals = sorted(v for gg, v in src if gg == g and v is not None)
        assert out[g]["n"] == sum(1 for gg, _ in src if gg == g)
        assert out[g]["lo"] == vals[:k]
        assert out[g]["hi"] == sorted(vals, reverse=True)[:k]


# ------------------------------------------------- bounded geo_line


_GL_ROWS = st.lists(
    st.tuples(
        st.integers(0, 1),                           # bucket (hot)
        st.one_of(st.none(), st.integers(0, 30)),    # sort value
        st.booleans(),                               # point present?
    ),
    min_size=0,
    max_size=30,
)


@settings(**_SETTINGS)
@given(rows=_GL_ROWS, size=st.integers(1, 4), desc=st.booleans())
def test_geo_line_bounded_matches_reference(spark, rows, size, desc):
    """geo_line after the bounded-carry window pre-pass: per bucket, the
    size-truncated sort-ordered [lon, lat] path, NULL sort values and
    NULL points skipped, sibling doc_count seeing EVERY row."""
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    data = [
        (g, t, {"lat": float(i), "lon": float(10 * i)} if has_p else None)
        for i, (g, t, has_p) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data or [(0, None, None)],
        "g int, t int, p struct<lat: double, lon: double>",
    )
    out = {
        r["by"]: r
        for r in compile_aggs(df, {"by": {
            "terms": {"field": "g", "size": 10, "order": {"_key": "asc"}},
            "aggs": {"line": {"geo_line": {
                "point": {"field": "p"}, "sort": {"field": "t"},
                "size": size,
                "sort_order": "desc" if desc else "asc",
            }}},
        }}).collect()
    }
    src = data or [(0, None, None)]
    for g in {r[0] for r in src}:
        pts = sorted(
            (t, p["lon"], p["lat"])
            for gg, t, p in src
            if gg == g and t is not None and p is not None
        )
        if desc:
            pts = pts[::-1]
        assert out[g]["line"] == [[x, y] for _, x, y in pts[:size]]
        assert out[g]["doc_count"] == sum(1 for gg, _, _ in src if gg == g)
