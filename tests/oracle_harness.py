"""Local replica of the driver's duckdb-oracle comparison: run the Spark
query and the oracle SQL on the same fixtures, canonicalize (sort columns
by name, round floats, stringify), and diff."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def canon_value(v, float_dp: int = 6):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, float_dp):.{float_dp}f}"
    if isinstance(v, (datetime, date)):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x, float_dp) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(v[k], float_dp)}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(columns, rows, float_dp: int = 6):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = list(row)
        out.append(tuple(canon_value(vals[i], float_dp) for i in order))
    return sorted(out), [columns[i] for i in order]


def run_spark_query(spec, spark, sf_dir):
    from elasticsearch_hadoop_spark.plans import complex_output_cols

    df = spec.fn(spark, sf_dir)
    bad = complex_output_cols(df.schema)
    assert not bad, (
        f"{spec.name}: complex-typed output columns {bad} — serialize "
        "(array_join/to_json) before returning, the driver hash is "
        "scalar-only"
    )
    cols, rows = df.columns, df.collect()
    # Corpus convention (made enforced after the r5 ingest_pipeline_docs
    # red): every double output column carries an explicit F.round(_, 6),
    # so the emitted double is the nearest one to a 6-decimal value and
    # the driver's float canonicalization cannot diverge from the
    # oracle's.  round(v, 6) == v iff that holds.
    for row in rows[:2000]:
        for c, v in zip(cols, row):
            if not isinstance(v, float) or not math.isfinite(v):
                continue
            assert round(v, 6) == v, (
                f"{spec.name}: column {c!r} emits unrounded double {v!r} — "
                "wrap in F.round(_, 6) (and round(..., 6) in the oracle)"
            )
    return cols, rows


def run_oracle(spec, duck):
    res = duck.execute(spec.oracle)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    # The driver's canonicalizer float-formats Python floats but STRINGIFIES
    # everything else — a DuckDB DECIMAL (e.g. BIGINT - 89.5) prints "-89.5"
    # vs Spark's "-89.500000" and hash-mismatches even though canon_value
    # here would mask it by converting to float.  Fail loudly instead:
    # CAST(... AS DOUBLE) in the oracle (found the hard way by
    # writepath_geo_ingest in round 4).
    for row in rows[:50]:
        for c, v in zip(cols, row):
            assert not isinstance(v, Decimal), (
                f"{spec.name}: oracle column {c!r} yields DECIMAL {v!r} — "
                "the driver stringifies it as-is and the hash cannot match; "
                "CAST(... AS DOUBLE) in the oracle SQL"
            )
    return cols, rows


def compare(spec, spark, sf_dir, duck, float_dp: int = 6):
    """Returns (ok, message)."""
    s_cols, s_rows = run_spark_query(spec, spark, sf_dir)
    d_cols, d_rows = run_oracle(spec, duck)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    s_canon, _ = canon_rows(s_cols, [tuple(r) for r in s_rows], float_dp)
    d_canon, _ = canon_rows(d_cols, d_rows, float_dp)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        return False, f"value mismatch; first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
