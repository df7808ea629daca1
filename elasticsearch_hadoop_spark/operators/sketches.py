"""Mergeable-sketch rollups (Spark 4 DataSketches built-ins): the 100 TB
pre-aggregation pattern ES solves with mergeable cardinality/percentile
aggs across shards.

The scale idea: aggregate raw data ONCE into per-fine-grain sketch rows
(e.g. distinct users per day), persist the binary sketches, then answer
any coarser-grain question (distinct users per month / overall) by merging
sketches — no second scan of the raw 100 TB.  HLL sketches are unions
(hll_union_agg), KLL quantile sketches merge losslessly
(kll_sketch_merge_*).  Error bounds are the library's published ones
(HLL lgK=12 ≈ 1.6% rsd); tests/test_sketches.py gates both against exact.

All functions return DataFrames with BINARY sketch columns — they compose
with write_index/read_index like any other column (ES analogue: a stored
`cardinality` agg precomputation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12, sketch_col: str = "hll"
) -> DataFrame:
    """Per-key HLL sketch of distinct ``col`` values.  One shuffle on
    ``keys``; the output is tiny (one 2^lgk-register sketch per key) and
    persistable."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lgk)).alias(sketch_col))


def hll_merge(
    sketches: DataFrame, keys: list[str], sketch_col: str = "hll", out_col: str = "distinct_est"
) -> DataFrame:
    """Merge fine-grain sketches to coarser ``keys`` (e.g. day → month)
    and estimate.  Runs on the SKETCH table — the raw data is never
    rescanned."""
    grouped = (
        sketches.groupBy(*keys) if keys else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    )


def kll_rollup(
    df: DataFrame, keys: list[str], col: str, k: int = 200, sketch_col: str = "kll"
) -> DataFrame:
    """Per-key KLL quantile sketch over a DOUBLE column (mergeable
    percentiles — the ES `percentiles` t-digest analogue, but losslessly
    unionable across partitions/time-grains)."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(k)).alias(sketch_col)
    )


def kll_merge_quantiles(
    sketches: DataFrame,
    keys: list[str],
    quantiles: list[float],
    sketch_col: str = "kll",
) -> DataFrame:
    """Merge KLL sketches to coarser ``keys`` and extract quantiles as
    columns ``q_<pct>``."""
    grouped = sketches.groupBy(*keys) if keys else sketches.groupBy()
    # no kll_union_agg built-in: collect the (tiny) per-group sketch list
    # and fold with the binary merge — sketch count per group == fine-grain
    # bucket count, a few hundred rows, not raw data
    arr = grouped.agg(F.collect_list(sketch_col).alias("__arr"))
    rest = F.slice(F.col("__arr"), 2, F.greatest(F.size("__arr") - 1, F.lit(0)))
    merged = arr.withColumn(
        "__merged",
        F.reduce(
            rest,
            F.element_at(F.col("__arr"), 1),
            lambda acc, s: F.kll_sketch_merge_double(acc, s),
        ),
    )
    cols = [
        F.kll_sketch_get_quantile_double(F.col("__merged"), F.lit(q)).alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return merged.select(*keys, *cols)
