"""Z-order (Morton) clustering for multi-dimensional data skipping.

``sort_by`` on one column gives tight parquet row-group min/max stats on
that column only; queries filtering a SECOND column still scan everything.
Z-ordering interleaves the bits of k rank-normalized columns into one
Morton value and range-partitions + sorts by it, so every file covers a
small hyper-rectangle — filters on ANY of the clustered columns prune
files/row-groups (the Delta OPTIMIZE ZORDER BY idea, built from the same
bit-interleave Column math as the geohash_grid agg).

Mechanics:
- per column: linear rank-normalization to ``bits``-bit integers using the
  column's (min, max) — ONE tiny driver-side aggregate (k scalars), the
  same "train once, pure Column math after" shape as the IVF quantizer;
- Morton interleave: bit i of column j lands at position i*k + j — pure
  shiftleft/bitwiseAND codegen, no UDF;
- layout: ``repartitionByRange(z)`` then ``sortWithinPartitions(z)`` —
  one range shuffle, files tile the z-curve.

Caveat (documented, like every linear quantizer): heavy skew compresses
most rows into few z-cells; quantile-based normalization is the upgrade
path and slots into ``column_bounds`` without touching the interleave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per clustering column — one aggregate, 2k scalars."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def default_bits(k: int) -> int:
    """Per-column resolution that keeps k columns inside a signed 64-bit
    z-value (16 for 1-3 columns, degrading gracefully beyond)."""
    return min(16, 63 // max(k, 1))


def zvalue(
    cols: list[str], bounds: dict[str, tuple[float, float]], bits: int | None = None
) -> Column:
    """The Morton code Column for ``cols`` under ``bounds``.  NULLs map to
    cell 0 (they cluster together at the curve's origin); a column whose
    bounds are unknown (empty frame / all-null column) contributes a
    constant 0 cell rather than crashing."""
    k = len(cols)
    if bits is None:
        bits = default_bits(k)
    if not 1 <= k * bits <= 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed 64-bit z-value")
    cells = []
    n = (1 << bits) - 1
    for c in cols:
        mn, mx = bounds[c]
        if mn is None or mx is None:
            cells.append(F.lit(0).cast("long"))
            continue
        span = (mx - mn) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * n
        cell = F.least(F.greatest(F.round(scaled, 0), F.lit(0.0)), F.lit(float(n)))
        cells.append(F.coalesce(cell.cast("long"), F.lit(0)))

    # NOTE: the per-column cell expression is textually inlined once per
    # bit below (16x), but this whole tree is plain integer/bit math —
    # fully codegen'd, where subexpression elimination computes each cell
    # once.  A let_bind (transform/array) variant was tried and REVERTED:
    # higher-order functions are CodegenFallback (interpreted), which
    # cost ~3x on the clustering shuffle despite the smaller tree.
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            bit = (cell.bitwiseAND(F.lit(1 << i)) > 0).cast("long")
            z = z + F.shiftleft(bit, i * k + j)
    return z


def zorder(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    num_partitions: int | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Cluster ``df`` on the z-curve of ``cols``: one range shuffle +
    in-partition sort; the helper column is dropped before return.
    ``bounds`` lets a caller that already knows (or also needs) the
    per-column (min, max) pass them in, skipping the bounds scan — at
    scale the rank-normalization only needs *covering* bounds, so table
    statistics or a previous pass's values are fine."""
    b = bounds if bounds is not None else column_bounds(df, cols)
    out = df.withColumn("__z", zvalue(cols, b, bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z").drop("__z")
