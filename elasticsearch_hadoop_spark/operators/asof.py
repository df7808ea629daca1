"""As-of join — a time-series primitive Spark SQL lacks natively
(SURVEY.md §2.C "Joins": range/as-of is CUSTOM).

For each left row, attach the most recent right row with right.ts <=
left.ts (optionally within a tolerance), matching on equi-keys.

Implementation: the union-tag trick, NOT a pairwise range join:
  1. tag left rows (is_left=1) and right rows (is_left=0), union them;
  2. window partitioned by the equi-keys ordered by (ts, is_left) —
     right rows sort before left rows at equal ts;
  3. last(right_payload, ignoreNulls=True) over rows UNBOUNDED PRECEDING
     .. CURRENT ROW carries the latest right payload forward;
  4. keep left rows.

Cost: one shuffle on the equi-keys + a per-partition sort — O(n log n),
no candidate-pair blowup, so it survives 100 TB (the naive
left⋈right-on-range alternative is quadratic per key).  Skewed keys are
handled by AQE; for a known-hot key, salt the key and de-salt after.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    tolerance: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per `on` key.

    strict=True uses right_ts < left_ts.
    tolerance: SQL interval string (e.g. "1 hour") — matches older than
    left_ts - tolerance are nulled out.
    """
    on = list(on)
    right_payload = list(right_payload or [c for c in right.columns if c not in (*on, right_ts)])

    lhs = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = (
        right.select(
            *on,
            F.col(right_ts).alias("__rts"),
            F.struct(F.col(right_ts).alias("__matched_ts"), *right_payload).alias("__payload"),
        )
        .withColumn("__is_left", F.lit(0))
        .withColumn("__ts", F.col("__rts"))
    )

    # align schemas for the union
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    lhs = lhs.withColumn("__payload", F.lit(None).cast(rhs.schema["__payload"].dataType))
    rhs = rhs.select(*[c for c in lhs.columns])

    unioned = lhs.unionByName(rhs)
    # at equal ts: right first (is_left ASC) unless strict, then right's
    # payload must NOT be visible to a left row at the same instant.
    order = [F.col("__ts").asc(), F.col("__is_left").asc() if not strict else F.col("__is_left").desc()]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = unioned.withColumn("__carried", F.last("__payload", ignorenulls=True).over(w))

    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        too_old = F.col("__carried.__matched_ts") < F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn(
            "__carried", F.when(too_old, F.lit(None)).otherwise(F.col("__carried"))
        )
    matched_ts = F.col("__carried.__matched_ts").alias(f"matched_{right_ts}")
    payload_cols = [F.col(f"__carried.{c}").alias(c) for c in right_payload]
    return out.select(*left.columns, matched_ts, *payload_cols)
