"""Skew-mitigation operators (SURVEY.md §4.2 "Backpressure/retry" target
column and the 100 TB design rules: "skewed keys → salting or AQE
skew-join").

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew by splitting oversized partitions at runtime,
but only for sort-merge joins and only per shuffle block — a single key
whose rows exceed one executor's memory still needs *salting*: spread the
hot key's rows over N sub-keys, replicate the other side N ways.

``salted_join`` implements the standard recipe declaratively:

- the LARGE (skewed) side gets a uniform random salt in [0, N);
- the SMALL-BUT-NOT-BROADCASTABLE side is exploded N ways (row count ×N —
  choose N so that right ×N stays far below the large side);
- the join key becomes (key, salt), so one hot key now hashes to N
  different reducers.

Result equality with the plain join holds for inner/left joins because
every (key, salt) pair on the left finds exactly the original right rows
for that key. ``F.rand(seed)`` is seeded per-partition, so task retries
regenerate the same salts (deterministic re-execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``left`` (large, skewed) with ``right`` (too big to
    broadcast, small enough to replicate ``num_salts``×) on ``on``.

    Supported ``how``: inner, left — flavors where replicating the right
    side cannot duplicate or fabricate unmatched-row handling. For right /
    full outer, swap sides or fall back to AQE."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if _SALT in left.columns or _SALT in right.columns:
        raise ValueError(f"column {_SALT} already present")
    salted_left = left.withColumn(_SALT, (F.rand(seed) * num_salts).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = salted_left.join(salted_right, on=[*on, _SALT], how=how)
    return joined.drop(_SALT)


def explain_skew(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts with share-of-total — run on a sample
    before deciding between broadcast / AQE / salting. Returns a small
    DataFrame (top-N keys by count), never collects the fact table."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(float(total)), 6))
        .orderBy(F.col("rows").desc())
        .limit(top)
    )
