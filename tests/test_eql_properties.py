"""Property-based differential test of the EQL sequence compiler
(`eql.eql_sequence`): hypothesis generates random event streams and the
documented forward-earliest-match semantics are replayed by a direct
Python reference — every (entity, step timestamps) tuple must agree.
Timestamps are kept distinct per entity: equal-ts step candidates are
documented tie territory (strictly-after anchors are deterministic, the
choice among equal-ts *candidates* is not)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.eql import eql_sequence

BASE = datetime(2024, 1, 1)


# one entity's stream: a permutation of distinct minute-offsets with a
# random event type each
def _stream():
    return st.lists(
        st.sampled_from(["A", "B", "C", "X"]),
        min_size=0,
        max_size=10,
    ).map(lambda kinds: [(i * 7, k) for i, k in enumerate(kinds)])


streams = st.fixed_dictionaries({"u1": _stream(), "u2": _stream()})
nsteps = st.sampled_from([2, 3])
spans = st.sampled_from([None, "15 minutes", "40 minutes"])


def _reference(stream, step_types, span_minutes):
    """Forward earliest-match per anchor; sequence must fit in span."""
    out = []
    evs = sorted(stream)
    for t0, k0 in evs:
        if k0 != step_types[0]:
            continue
        chain = [t0]
        cur = t0
        ok = True
        for want in step_types[1:]:
            nxt = next(
                (t for t, k in evs if k == want and t > cur), None
            )
            if nxt is None:
                ok = False
                break
            chain.append(nxt)
            cur = nxt
        if ok and (
            span_minutes is None or chain[-1] - chain[0] <= span_minutes
        ):
            out.append(tuple(chain))
    return out


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=streams, n=nsteps, span=spans)
def test_sequence_matches_reference(spark, data, n, span):
    rows = [
        (u, BASE + timedelta(minutes=m), k)
        for u, stream in data.items()
        for m, k in stream
    ]
    if not rows:
        rows = [("u1", BASE, "X")]
    df = spark.createDataFrame(rows, "user string, ts timestamp, kind string")
    step_types = ["A", "B", "C"][:n]
    got = eql_sequence(
        df,
        by="user",
        ts="ts",
        steps=[{"term": {"kind": t}} for t in step_types],
        maxspan=span,
    ).collect()
    got_set = {
        (r["user"],)
        + tuple(
            int((r[f"step{i}_ts"] - BASE).total_seconds() // 60)
            for i in range(1, n + 1)
        )
        for r in got
    }
    span_minutes = int(span.split()[0]) if span else None
    want_set = {
        (u,) + chain
        for u, stream in data.items()
        for chain in _reference(stream, step_types, span_minutes)
    }
    assert got_set == want_set, f"steps={step_types} span={span} data={data}"
