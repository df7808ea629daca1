"""Deterministic sampling / dataset-split operators for training-data
pipelines (driver-mandated extension class, alongside dedup/similarity):
hash-based train/val/test split, (stratified) hash sampling, and
deterministic top-n-per-stratum subsampling.

Design for 100 TB:
- Assignment is a pure Column expression over md5 of the row key — no
  shuffle, no RNG state, no driver pass; the split/sample decision rides
  the scan stage and is reproducible run-over-run and engine-over-engine
  (the DuckDB oracle computes the identical 60-bit hash, and thresholds
  are INTEGER literals precomputed in Python — no float parity risk).
- Top-n-per-stratum uses the row_number window idiom, which Spark plans
  as WindowGroupLimit: each map partition prunes to its local top-n
  before the shuffle.
- Rows never move for a split: downstream consumers filter on the label
  (or the table is written partitionBy(split) once, making each split read
  partition pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.functions.text import md5_token_hash

# md5_token_hash yields 60 bits (15 hex chars)
HASH_SPACE = 1 << 60


def split_hash(key: Column, seed: int = 0) -> Column:
    """Uniform 60-bit hash of (seed, key) — the sampling randomness.
    DuckDB twin: CAST(concat('0x', substr(md5(concat('<seed>:',
    CAST(key AS VARCHAR))), 1, 15)) AS BIGINT)."""
    return md5_token_hash(F.concat(F.lit(f"{seed}:"), key.cast("string")))


def split_hash_sql(key_sql: str, seed: int = 0) -> str:
    """The DuckDB expression computing the identical hash."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', "
        f"CAST({key_sql} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) by
    deterministic hash bucketing.  Fractions must sum to 1.  Integer
    threshold comparison — bit-reproducible anywhere md5 exists."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = split_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        thresh = int(acc * HASH_SPACE)
        cond = h < F.lit(thresh)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # floating accumulation can leave the last threshold a hair under
    # HASH_SPACE; the otherwise() closes the gap with the last label
    return df.withColumn(split_col, expr.otherwise(name))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float | dict[str, float],
    strata_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash falls
    under fraction (uniform), or under a per-stratum fraction when
    ``fraction`` is a dict keyed by strata value (stratified sampling —
    e.g. downweight an over-represented source in a training mix)."""
    h = split_hash(F.col(id_col), seed)
    if strata_col is None:
        if not isinstance(fraction, (int, float)):
            raise ValueError("scalar fraction required without strata_col")
        return df.filter(h < F.lit(int(fraction * HASH_SPACE)))
    if not isinstance(fraction, dict):
        return df.filter(h < F.lit(int(fraction * HASH_SPACE)))
    thresh = None
    for value, frac in fraction.items():
        t = F.lit(int(frac * HASH_SPACE))
        cond = F.col(strata_col) == value
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    return df.filter(h < thresh.otherwise(F.lit(0)))


def topn_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic n rows per stratum: rank by hash within the stratum
    and keep the first n.  A fixed-size per-group subsample (the 'cap
    every source at N docs' training-mix operation).  Plans as
    WindowGroupLimit — map-side pruned before the one shuffle on
    strata_col."""
    h = split_hash(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
