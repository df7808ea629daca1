"""Corpus oracle lint (VERDICT r5 item 1): the driver's comparator
stringifies whatever the oracle returns, so every float-producing oracle
column must (a) be DOUBLE, never DECIMAL — a DECIMAL stringifies with its
own scale ("-89.5" vs Spark's "%.6f") and the hash cannot match — and
(b) carry an explicit round(..., 6), so both engines emit the double
nearest a 6-decimal value and any reasonable float canonicalization
(%.6f, repr, str) agrees bit-for-bit.

The check is empirical, not regex: run each oracle in duckdb at the test
SF and inspect the returned Python values.  ``round(v, 6) == v`` holds
exactly when v is the nearest double to a 6-decimal number — i.e. when
the oracle rounded (or the value is inherently short) — and fails for
raw unrounded quotients like 1/3, the class that produced the r5
``ingest_pipeline_docs`` red.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from elasticsearch_hadoop_spark.corpus import load_all

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)

# Rows inspected per query: enough to hit every code path (CASE arms,
# group keys) without turning the lint into a second benchmark.
_SAMPLE = 2000


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_floats_rounded_and_double(name, duck):
    res = duck.execute(REGISTRY[name].oracle)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    flagged: dict[str, str] = {}
    for row in rows[:_SAMPLE]:
        for c, v in zip(cols, row):
            if c in flagged:
                continue
            if isinstance(v, Decimal):
                flagged[c] = f"DECIMAL {v!r} — CAST(... AS DOUBLE) in the oracle"
            elif isinstance(v, float) and math.isfinite(v) and round(v, 6) != v:
                flagged[c] = (
                    f"unrounded double {v!r} — wrap in round(..., 6) in BOTH "
                    "the oracle SQL and the Spark projection"
                )
    assert not flagged, f"{name}: {flagged}"
