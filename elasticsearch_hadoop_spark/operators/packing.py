"""Sequence packing for training-data pipelines: assign documents to
fixed-budget training sequences by deterministic concat-and-chunk
(the GPT-style pretraining layout — documents are concatenated in a
stable order and sliced into ``budget``-sized sequences; a document's
pack is the one containing its first token).

Pure window prefix-sum math — no UDF, no driver pass:

    pack_id     = floor(exclusive_prefix_sum(cost) / budget)
    pack_offset = exclusive_prefix_sum(cost) % budget

Scale: the window partitions by ``partition_col`` (shard/language/source in
a real pipeline), so each partition's prefix sum is an independent
single-shuffle window — no global ordering bottleneck.  A packer that
needs global sequence ids composes this with a per-partition base offset
(one tiny aggregate), same shape as the distributed scan counter.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    cost_col: str,
    budget: int,
    order_col: str,
    partition_col: str | None = None,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Attach (pack_id, pack_offset) per row.  ``cost_col`` is the row's
    token/char cost; ``order_col`` fixes the concatenation order (must be
    unique within a partition for determinism)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if partition_col is None:
        # a global window funnels every row through ONE task's sort — fine
        # for a demo, a stall at 100 TB.  Loud, not fatal: small inputs and
        # oracle twins legitimately pack globally.
        warnings.warn(
            "pack_sequences(partition_col=None) uses a single global window "
            "partition — pass partition_col (shard/lang/source) so each "
            "partition packs independently at scale",
            stacklevel=2,
        )
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum(cost_col).over(w), F.lit(0))
    return df.withColumn(pack_col, F.floor(prefix / budget)).withColumn(
        offset_col, prefix % budget
    )
