"""Property-based differential test of the ES|QL TS two-stage
aggregation (esql._stats_ts): hypothesis generates small multi-series
event sets (dimension, timestamp-offset, value) and a pure-Python
reference computes the per-series per-bucket counter rate (consecutive
increases with reset handling over observed fractional seconds) and the
*_over_time aggregates; the Spark result must match exactly.  This pins
the lag-window ordering (ts, value), the reset branch, the NULL rules
(single sample / zero span), and the series-then-group shape."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.esql import esql

_BASE = dt.datetime(2024, 1, 1)

# (host 0-2, second-offset 0..7199 => 1-2 hourly buckets, value)
_EVENT = st.tuples(
    st.integers(0, 2),
    st.integers(0, 7199),
    st.integers(-5, 5).map(float),
)
_EVENTS = st.lists(_EVENT, min_size=1, max_size=18)


def _ref(rows):
    """Python reference: {bucket: (max_rate, sum_count)} with ES rules."""
    series = defaultdict(list)
    for h, off, v in rows:
        bucket = off // 3600
        series[(h, bucket)].append((off, v))
    rates = defaultdict(list)
    counts = defaultdict(int)
    for (h, bucket), samples in series.items():
        # lag order: (ts, value) — duplicates of ts break by value
        samples.sort()
        counts[bucket] += len(samples)
        if len(samples) < 2:
            continue
        span = samples[-1][0] - samples[0][0]
        if span <= 0:
            continue
        inc = 0.0
        for (_, prev), (_, cur) in zip(samples, samples[1:]):
            inc += (cur - prev) if cur >= prev else cur
        rates[bucket].append(inc / span)
    return {
        b: (max(rates[b]) if rates.get(b) else None, counts[b])
        for b in counts
    }


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=_EVENTS)
def test_ts_rate_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(h, _BASE + dt.timedelta(seconds=off), v) for h, off, v in rows],
        "host int, ts timestamp, v double",
    )
    out = esql(
        'TS m | STATS mx = MAX(RATE(v)), n = SUM(COUNT_OVER_TIME(v))'
        ' BY tb = BUCKET(ts, "1 hour")',
        tables={"m": df},
        time_series={"m": {"dimensions": ["host"], "timestamp": "ts"}},
    ).collect()
    got = {
        int((r["tb"] - _BASE).total_seconds() // 3600): (r["mx"], r["n"])
        for r in out
    }
    exp = _ref(rows)
    assert set(got) == set(exp)
    for b, (mx, n) in exp.items():
        gmx, gn = got[b]
        assert gn == n, (b, rows)
        if mx is None:
            assert gmx is None, (b, rows)
        else:
            assert gmx == pytest.approx(mx, rel=1e-12), (b, rows)
