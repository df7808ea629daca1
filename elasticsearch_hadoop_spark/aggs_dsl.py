"""ES aggregations-DSL veneer: compile an `"aggs"` request body to a
DataFrame `groupBy().agg()` pipeline.

Scope note (SURVEY.md §2.9): the reference connector itself never invokes
ES aggregations — every aggregation its users run happens in Spark over
scanned rows. This module closes the *user-visible* gap for people whose
mental model is the ES aggs DSL: the same JSON now drives a Catalyst
aggregation over the engine's tables. The result is the flat relational
equivalent of ES's nested bucket response — one row per innermost bucket,
bucket keys as columns, metric values as columns named `<agg_name>` (or
`<agg_name>_<stat>` for multi-value metrics).

Supported:

- bucket aggs (one per nesting level, arbitrarily chained through
  ``"aggs"``): ``terms`` (with ``size``, ``order`` — ``_count``/``_key``/sub-metric,
  doc_count desc by default, size truncating under the requested order —
  plus ``missing`` default-key bucketing and ``min_doc_count``), ``histogram`` (``interval``), ``date_histogram``
  (``calendar_interval``: minute/hour/day/week/month/quarter/year, or
  ``fixed_interval``: "<n>s/m/h/d"), ``range`` (``ranges`` with ES
  "from inclusive, to exclusive" semantics and auto "a-b" keys),
  ``filter`` (query-DSL clause narrowing the subtree — compiled by
  query_dsl.compile_query, so it inherits pushdown), ``filters``
  (named query-DSL buckets; overlapping buckets are exact — a doc lands
  in EVERY matching bucket via a names-array explode, still one shuffle),
  ``missing`` (docs where the field is null — a narrowing bucket in flat
  form), ``composite`` (multi-source paginated buckets: sources
  terms/histogram/date_histogram, key-ascending order, ``after`` resume
  cursor compiled to a lexicographic tuple filter, ``size`` page limit —
  a TakeOrderedAndProject, never a full sort; must be the top-level
  bucket agg, like ES requires), ``significant_terms`` (JLH-scored
  over-representation of foreground — the frame after preceding
  filter/missing buckets — vs the background frame; terminal bucket),
  ``rare_terms`` (long-tail terms with doc_count <= max_doc_count,
  rarest first; terminal bucket), ``categorize_text`` (log-pattern
  buckets keyed by the message's digit-free token sequence — the
  deterministic subset of ES's Drain-style category merging; terminal
  bucket), ``date_range`` (``range`` with
  timestamp-literal bounds; no date-math), ``geotile_grid``
  (Web-Mercator z/x/y slippy-tile keys at ``precision`` zoom over a
  struct(lat, lon) geo_point column — pure codegen tile math),
  ``geohash_grid`` (classic base32 geohash cells at ``precision`` chars,
  integer bit-interleave as Column math), ``multi_terms`` (one bucket per
  field-value tuple, "|"-joined key_as_string, terms-style size/order),
  ``adjacency_matrix`` (named filters plus pairwise "a&b" intersections in
  ONE scan via a label-array explode; empty cells omitted like ES),
  ``sampler`` / ``diversified_sampler`` (narrowing buckets bounding the
  doc set sub-aggs see; scoreless engine, so the documented deterministic
  semantics are a hash-ordered sample on a required ``seed_field``, with
  diversified's ``max_docs_per_value`` per-``field`` dedupe as a
  WindowGroupLimit), ``random_sampler`` (8.2+ probability sampling: the
  seeded 60-bit md5 threshold shared with operators/sampling over a
  required ``seed_field``; doc_count and sum/value_count scale back up
  by 1/probability, location metrics stay unscaled — ES's model; the
  (0, 0.5] ∪ {1} probability constraint is ES's own),
  ``ip_range`` (IPv4 from/to + CIDR masks; overlapping
  ranges land a doc in every matching bucket via the filters-style label
  explode; addresses parse to 32-bit ints in codegen; IPv6 unsupported),
  ``ip_prefix`` (bucket by the /n network address — shiftright/shiftleft
  mask in codegen, IPv4 only, ``append_prefix_length`` supported),
  ``nested`` (sub-aggs over the array elements of ``path`` — explode
  rebinds the path to the element, doc_count = nested-doc count),
  ``reverse_nested`` (re-widen to PARENT docs: dedupe on
  (parent_id_col, keys-so-far), so element-level buckets count each
  parent once — requires compile_aggs(..., parent_id_col=...);
  top-level re-widening only), ``global`` (escapes the search query to
  the ``base_df`` frame the caller passes to compile_aggs; an error
  without it)
- metric aggs: ``avg sum min max value_count cardinality stats
  extended_stats weighted_avg percentiles percentile_ranks boxplot
  median_absolute_deviation string_stats top_metrics t_test matrix_stats
  geo_bounds geo_centroid rate`` —
  ``top_metrics`` (size=1) is a max_by/min_by over a (sort, metric)
  struct with the metric as deterministic tie-break; ``t_test`` emits the
  t statistic for paired/heteroscedastic/homoscedastic (ES's p-value
  needs the Student-t CDF — documented deviation); ``matrix_stats`` is
  row-wise-complete mean/variance/covariance/correlation;
  ``geo_bounds``/``geo_centroid`` read struct(lat, lon) geo_points;
  ``geo_line`` renders the bucket's points as a sort-ordered GeoJSON-style
  [lon, lat] path (array_sort over collected structs — deterministic);
  ``scripted_metric`` supports the distributable accumulate subset (one
  state var, ``state.v += <painless-lite expr>`` map, summing reduce —
  compiles to a plain partial-aggregatable SUM);
  ``rate`` scales a fixed_interval date_histogram bucket total to a
  per-unit rate —
  ``cardinality`` compiles to
  exact ``countDistinct`` by
  default (``"approximate": true`` opts into HLL++ ``approx_count_distinct``,
  which is what ES itself does); ``percentiles`` uses exact interpolated
  ``percentile`` (ES uses t-digest — same caveat, ``"approximate": true``
  switches to ``percentile_approx``); ``extended_stats`` adds the one-pass
  moments (sum_of_squares, population variance/std_deviation);
  ``weighted_avg`` takes ES's ``{"value": {...}, "weight": {...}}`` shape;
  ``boxplot`` emits min/q1/q2/q3/max under the same exact-vs-approximate
  convention; ``median_absolute_deviation`` is two-phase (bucket median
  attached by a window over the SAME key chain the aggregation shuffles
  on, so the exchange is reused); ``string_stats`` emits count + length
  min/max/avg (entropy needs a per-bucket char distribution — documented
  out of scope)
- ``doc_count`` is always emitted per bucket, like ES
- ``top_hits`` (must be the only metric at its level): per-bucket top-N
  rows — compiles to a row_number window over the bucket-key chain
  (WindowGroupLimit prunes map-side), emitting ``hit_rank`` + the
  requested ``_source`` columns instead of aggregate columns
- pipeline aggregations over the finished buckets (window functions over
  the flat bucket rows — partitioned by the outer bucket keys, ordered by
  the key at the pipeline's level):
  ``derivative`` (metric - lag; NULL for the first bucket, which ES
  omits), ``cumulative_sum``, ``serial_diff`` (``lag`` param),
  ``moving_fn``/``moving_avg`` (``window`` trailing buckets INCLUDING the
  current one; scripts ``MovingFunctions.unweightedAvg/sum/min/max/
  stdDev``), ``moving_percentiles`` (same trailing window, exact
  interpolated percentiles, ``<name>_<p>`` columns),
  ``bucket_script`` (arithmetic over ``params``-mapped sibling
  metrics), ``bucket_selector`` (same expression language, filters
  buckets); sibling ``avg_bucket``/``sum_bucket``/``min_bucket``/
  ``max_bucket`` emit the cross-bucket value as a column repeated on every
  row of their scope (the flat-relational rendering of ES's sibling
  output).  ``buckets_path`` accepts a sibling metric name, ``_count``
  (doc_count), multi-value paths like ``s.avg`` (-> ``s_avg`` column),
  and ``bucket>metric`` (the final path segment resolves the column).

Scale: everything compiles to a single hash aggregation over the bucket-key
chain (partial+final, one shuffle); ``terms`` ``size`` becomes a
TakeOrderedAndProject. No collect, no per-bucket queries.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CALENDAR = {
    "minute": "minute", "1m": "minute",
    "hour": "hour", "1h": "hour",
    "day": "day", "1d": "day",
    "week": "week", "1w": "week",
    "month": "month", "1M": "month",
    "quarter": "quarter", "1q": "quarter",
    "year": "year", "1y": "year",
}
_FIXED_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}
_RATE_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}
# auto_date_histogram rounding ladder (fixed-interval rungs of ES's table;
# the calendar rungs — months/years — are out of scope, documented).  The
# chosen rung is the smallest whose bucket count fits the target.
AUTO_DH_LADDER = (1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800, 43200, 86400, 604800)

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


class AggsDslError(ValueError):
    pass


def compile_aggs(
    df: DataFrame,
    spec: str | dict[str, Any],
    base_df: DataFrame | None = None,
    parent_id_col: str | None = None,
) -> DataFrame:
    """Compile an ES aggs body (dict or JSON string) against ``df``.

    Accepts ``{"aggs": {...}}``, ``{"aggregations": {...}}`` or the bare
    agg map. Returns one row per innermost bucket (a single global row if
    only metrics are given), ordered by doc_count desc then keys for a
    top-level ``terms`` (ES default order), else by bucket keys.

    ``base_df``: the pre-query frame a ``global`` bucket escapes to (ES
    semantics: global ignores the search query).  Callers that filtered
    ``df`` with a query pass the unfiltered frame here; a ``global``
    bucket without it is an error, never a silent no-op."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    spec = spec.get("aggs", spec.get("aggregations", spec))

    keys: list[tuple[str, Column]] = []  # (output name, key expr)
    metrics: list[Column] = []
    terms_size: int | None = None
    terms_order: tuple[dict | None, str] | None = None  # (order spec, key name)
    terms_min_doc_count = 1
    composite: tuple[int, dict | None] | None = None  # (size, after)
    top_hits: tuple[str, dict] | None = None
    # (name, kind, spec, level_index): applied over the finished buckets
    pipelines: list[tuple[str, str, dict, int]] = []
    # (name, field): median_absolute_deviation metrics — need the bucket
    # median BEFORE the aggregation pass (window over the key chain)
    mads: list[tuple[str, str]] = []
    # (name, spec): geo_line metrics — need a bounded-carry row_number
    # BEFORE the aggregation pass (window over the key chain), so the
    # collect buffer never exceeds `size` points per bucket
    geo_lines: list[tuple[str, dict]] = []
    # (name, field): cumulative_cardinality pipelines — need the raw frame
    # (first-occurrence trick), not just the finished buckets
    ccs: list[tuple[str, str]] = []
    # histogram/date_histogram with min_doc_count=0: emit empty buckets
    # across [data range ∪ extended_bounds] after the aggregation
    densify: tuple[str, dict, str] | None = None
    # seconds-per-bucket of the innermost fixed_interval date_histogram —
    # the denominator a `rate` metric scales by
    dh_secs: int | None = None

    # significant_terms background: the frame as handed in, BEFORE any
    # filter/missing bucket narrows the foreground
    df_background = df

    level = spec
    depth = 0
    sample_scale: float | None = None  # set by random_sampler for deeper levels
    comp_null_orders: dict[str, str] = {}  # composite missing_bucket sort rules
    comp_geotile: set[str] = set()  # geotile sources page in packed-numeric order
    while level:
        bucket_items = [(n, b) for n, b in level.items() if _bucket_kind(b)]
        metric_items = [(n, b) for n, b in level.items() if not _bucket_kind(b)]
        for name, body in metric_items:
            if "top_hits" in body:
                if top_hits is not None or len(metric_items) > 1:
                    raise AggsDslError("top_hits must be the only metric at its level")
                top_hits = (name, body["top_hits"])
                continue
            if "median_absolute_deviation" in body:
                mads.append((name, body["median_absolute_deviation"]["field"]))
                continue
            if "geo_line" in body:
                geo_lines.append((name, body["geo_line"]))
                continue
            if "rate" in body:
                # ES rate metric: sum(field) (or doc_count) per `unit` of
                # time, inside a fixed_interval date_histogram — the
                # bucket total scaled by unit_seconds / interval_seconds.
                # Calendar intervals have no constant width; rejected.
                rspec = body["rate"]
                if dh_secs is None:
                    raise AggsDslError(
                        f"rate {name!r} needs an enclosing fixed_interval "
                        "date_histogram"
                    )
                unit_secs = _RATE_UNIT_SECONDS.get(rspec.get("unit", "second"))
                if unit_secs is None:
                    raise AggsDslError(f"rate {name!r}: unknown unit {rspec.get('unit')!r}")
                base = (
                    F.sum(F.col(rspec["field"]))
                    if "field" in rspec
                    else F.count(F.lit(1))
                )
                if sample_scale not in (None, 1.0):
                    # rate is a count-like per-time total — scales like sum
                    base = base * sample_scale
                metrics.append((base * (unit_secs / dh_secs)).alias(name))
                continue
            if "cumulative_cardinality" in body:
                # needs the raw rows (not re-aggregable from bucket
                # cardinalities) — resolved against the sibling
                # cardinality agg's field, applied after the bucket pass
                path = body["cumulative_cardinality"].get("buckets_path", "")
                sib = level.get(path)
                if not isinstance(sib, dict) or "cardinality" not in sib:
                    raise AggsDslError(
                        f"cumulative_cardinality {name!r}: buckets_path must "
                        "name a sibling cardinality agg"
                    )
                ccs.append((name, sib["cardinality"]["field"]))
                continue
            pkind = _pipeline_kind(body)
            if pkind:
                # record how many bucket keys are OUTER to this declaration:
                # a parent pipeline (inside a bucket's aggs) orders by
                # keys[k-1]; a sibling *_bucket (next to a bucket agg)
                # aggregates the buckets keyed at index k
                pipelines.append((name, pkind, body[pkind], len(keys)))
                continue
            metrics.extend(_metric(name, body, sample_scale))
        if not bucket_items:
            break
        if len(bucket_items) > 1:
            raise AggsDslError(
                "one bucket agg per level is supported (ES sibling buckets "
                f"need separate queries): {[n for n, _ in bucket_items]}"
            )
        name, body = bucket_items[0]
        kind = _bucket_kind(body)
        if kind in ("terms", "multi_terms") and (
            "order" in body[kind] or "min_doc_count" in body[kind]
        ):
            # Flat rendering groups by the FULL key chain, so doc_count and
            # sub-metrics are per innermost cell — a custom order or a
            # doc-count floor applied to those rows would diverge from
            # ES's per-terms-bucket semantics whenever another keyed
            # bucket exists above or below.  Refuse instead of silently
            # approximating (filter/missing wrappers are fine: they narrow
            # the frame without adding keys).
            nested_buckets = any(
                _bucket_kind(b)
                for b in (body.get("aggs") or body.get("aggregations") or {}).values()
                if isinstance(b, dict)
            )
            if keys or nested_buckets:
                raise AggsDslError(
                    "terms order/min_doc_count require terms to be the only "
                    "keyed bucket level (per-terms totals are not re-aggregable "
                    "from the flat innermost-cell rendering)"
                )
        if not keys and kind in ("terms", "multi_terms"):
            # captures top-level terms AND terms under keyless narrowing
            # buckets (filter/missing) — both see the whole terms bucket set
            if "size" in body[kind]:
                terms_size = int(body[kind]["size"])
            terms_order = (body[kind].get("order"), name)
            terms_min_doc_count = int(body[kind].get("min_doc_count", 1))
        if kind == "significant_terms":
            if keys or metrics or body.get("aggs") or body.get("aggregations"):
                raise AggsDslError(
                    "significant_terms must be the only, terminal bucket agg"
                )
            return _significant_terms(df, df_background, name, body[kind])
        if kind == "significant_text":
            if keys or metrics or body.get("aggs") or body.get("aggregations"):
                raise AggsDslError(
                    "significant_text must be the only, terminal bucket agg"
                )
            return _significant_text(df, df_background, name, body[kind])
        if kind == "rare_terms":
            if keys or metrics or body.get("aggs") or body.get("aggregations"):
                raise AggsDslError("rare_terms must be the only, terminal bucket agg")
            return _rare_terms(df, name, body[kind])
        if kind == "variable_width_histogram":
            if keys or metrics or body.get("aggs") or body.get("aggregations"):
                raise AggsDslError(
                    "variable_width_histogram must be the only, terminal bucket agg"
                )
            return _variable_width_histogram(df, name, body[kind])
        if kind == "frequent_item_sets":
            if keys or metrics or body.get("aggs") or body.get("aggregations"):
                raise AggsDslError(
                    "frequent_item_sets must be the only, terminal bucket agg"
                )
            return _frequent_item_sets(df, name, body[kind])
        if kind == "categorize_text":
            if keys or metrics or body.get("aggs") or body.get("aggregations"):
                raise AggsDslError(
                    "categorize_text must be the only, terminal bucket agg"
                )
            return _categorize_text(df, name, body[kind])
        if kind == "composite":
            if keys or composite is not None:
                raise AggsDslError("composite must be the only/top-level bucket agg")
            comp = body["composite"]
            for src in comp.get("sources", []):
                ((sname, sbody),) = src.items()
                skind = _bucket_kind(sbody)
                # geotile_grid is a valid ES composite source (geo
                # paging).  Its "z/x/y" keys page in ES's PACKED-NUMERIC
                # tile order ((z<<58)|(x<<29)|y — "4/2/3" before
                # "4/10/3"), not string order: the cursor sorts and
                # resumes on a derived packed column (and the after value
                # packs the same way), so an ES cluster's after-cursor
                # replays here bucket-for-bucket.
                if skind not in (
                    "terms", "histogram", "date_histogram", "geotile_grid"
                ):
                    raise AggsDslError(f"composite source {sname!r}: {skind}")
                b = sbody[skind]
                kexpr = _bucket_key(skind, b)
                keys.append((sname, kexpr))
                if skind == "geotile_grid":
                    comp_geotile.add(sname)
                # ES: docs with a null source key are DROPPED unless the
                # source declares missing_bucket: true; the null bucket
                # then sorts per missing_order ("first" default, "last")
                if b.get("missing_bucket", False):
                    order = b.get("missing_order", "first")
                    if order not in ("first", "last"):
                        raise AggsDslError(
                            f"composite {sname!r}: missing_order must be "
                            f"first|last, got {order!r}"
                        )
                    comp_null_orders[sname] = order
                else:
                    df = df.filter(kexpr.isNotNull())
            composite = (int(comp.get("size", 10)), comp.get("after"))
        elif kind == "filter":
            # narrowing bucket: no key, just a predicate over the subtree
            df = df.filter(_compile_dsl(body["filter"]))
        elif kind == "missing":
            # ES `missing` bucket: docs where the field is null — a
            # narrowing bucket in flat form
            df = df.filter(F.col(body["missing"]["field"]).isNull())
        elif kind == "filters":
            fbody = body["filters"]
            specs = fbody["filters"]
            if not isinstance(specs, dict):
                raise AggsDslError("filters.filters must map bucket name -> query")
            preds = {n: _compile_dsl(q) for n, q in specs.items()}
            whens = [F.when(p, F.lit(n)) for n, p in preds.items()]
            if fbody.get("other_bucket") or fbody.get("other_bucket_key"):
                # ES other_bucket: docs matching NONE of the filters land
                # in a catch-all bucket (default key "_other_")
                other_key = str(fbody.get("other_bucket_key", "_other_"))
                none_match = F.lit(True)
                for p in preds.values():
                    none_match = none_match & ~F.coalesce(p, F.lit(False))
                whens.append(F.when(none_match, F.lit(other_key)))
            names_arr = F.array(*whens)
            tmp = f"__bucket_{name}"
            df = df.withColumn(
                tmp, F.explode(F.filter(names_arr, lambda x: x.isNotNull()))
            )
            keys.append((name, F.col(tmp)))
        elif kind == "sampler":
            # ES sampler: bound the doc set sub-aggs run over.  ES keeps
            # the shard-local top-`shard_size` by score; this engine has no
            # scores (README non-goal), so the documented deterministic
            # semantics are: the `shard_size` docs with the smallest
            # (md5(seed_field), seed_field) — a stable pseudo-random sample
            # (same discipline as operators/sampling.py) and a single
            # TakeOrderedAndProject, never a full sort.
            b = body["sampler"]
            seed = b.get("seed_field")
            if not seed:
                raise AggsDslError(
                    "sampler needs seed_field (deterministic engine: no _score)"
                )
            n = int(b.get("shard_size", 100))
            df = df.orderBy(F.md5(F.col(seed).cast("string")), F.col(seed)).limit(n)
        elif kind == "diversified_sampler":
            # ES diversified_sampler: like sampler but at most
            # `max_docs_per_value` docs per distinct `field` value (dedupe
            # the sample).  Per-value truncation is a row_number window
            # (WindowGroupLimit prunes map-side); the final cap is the same
            # hash-ordered TakeOrderedAndProject as sampler.
            b = body["diversified_sampler"]
            seed = b.get("seed_field")
            if not seed:
                raise AggsDslError(
                    "diversified_sampler needs seed_field (deterministic "
                    "engine: no _score)"
                )
            n = int(b.get("shard_size", 100))
            per_val = int(b.get("max_docs_per_value", 1))
            fld = b["field"]
            from pyspark.sql import Window

            h = F.md5(F.col(seed).cast("string"))
            wv = Window.partitionBy(fld).orderBy(h, F.col(seed))
            tmp = f"__ds_rn_{name}"
            df = (
                df.withColumn(tmp, F.row_number().over(wv))
                .filter(F.col(tmp) <= per_val)
                .drop(tmp)
                .orderBy(h, F.col(seed))
                .limit(n)
            )
        elif kind == "random_sampler":
            # ES random_sampler (8.2+): probability-sampled sub-aggs with
            # count-like values scaled back up by 1/probability.  ES
            # hashes internal doc ids with the seed; this schema-less
            # engine takes the key column as `seed_field` (documented
            # spec-hint convention, like children's id_field) and
            # thresholds the SAME 60-bit md5 hash operators/sampling
            # uses, so a DuckDB oracle replays the sample exactly and
            # the sample is stable run-over-run.  Scaled: doc_count, the
            # rate metric, and sum/value_count (+ stats/extended_stats
            # count/sum/sum_of_squares) at deeper levels;
            # avg/min/max/percentiles/variance are returned unscaled
            # (they estimate the population directly — ES's model too;
            # cardinality is unscaled with the same caveat ES documents;
            # scripted_metric is unscaled — arbitrary scripts have no
            # auto-scaling semantics).
            # ES's probability constraint is enforced: (0, 0.5] or 1.
            if depth != 0 or metric_items:
                # ES's own top-level-only constraint — and structurally
                # necessary here: sibling/ancestor metric Columns evaluate
                # against the FINAL (sampled) frame, so a non-top-level
                # sampler would silently sample them without scale-up
                raise AggsDslError(
                    "random_sampler must be the top-level and only "
                    "aggregation at its level (ES constraint)"
                )
            b = body["random_sampler"]
            seed_field = b.get("seed_field")
            if not seed_field:
                raise AggsDslError(
                    "random_sampler needs seed_field (deterministic "
                    "engine: ES hashes internal doc ids)"
                )
            p = float(b.get("probability", 0))
            if not (0 < p <= 0.5 or p == 1):
                raise AggsDslError(
                    f"random_sampler probability must be in (0, 0.5] or "
                    f"exactly 1, got {p}"
                )
            from elasticsearch_hadoop_spark.operators.sampling import (
                HASH_SPACE,
                split_hash,
            )

            seed = int(b.get("seed", 0))
            if p < 1:
                df = df.filter(
                    split_hash(F.col(seed_field), seed)
                    < F.lit(int(p * HASH_SPACE))
                )
            sample_scale = 1.0 / p
        elif kind == "ip_range":
            # ES ip_range: from-inclusive / to-exclusive IPv4 ranges or
            # CIDR masks.  Ranges may OVERLAP — a doc lands in every
            # matching bucket, so the key is a matching-labels array
            # exploded like `filters` (one scan, one shuffle).  The
            # address becomes a 32-bit integer with split/cast Column
            # math (codegen; the DuckDB oracle replays the same
            # arithmetic).  IPv6 is unsupported (documented).
            b = body["ip_range"]
            ranges = b.get("ranges", [])
            if not ranges:
                raise AggsDslError("ip_range needs a non-empty ranges list")

            # let-bind the parsed address: each range's CASE references the
            # 4-split/cast parse, and CollapseProject would otherwise inline
            # it into EVERY range bound (2 bounds x N ranges -> up to 2N
            # full parses per row; see functions/text.py let_bind)
            def _bucket_labels(ipnum: Column) -> Column:
                labels = []
                for r in ranges:
                    if "mask" in r:
                        lo_i, hi_i = _cidr_bounds(str(r["mask"]))
                        label = r.get("key", str(r["mask"]))
                        cond = (ipnum >= F.lit(lo_i)) & (ipnum < F.lit(hi_i))
                    else:
                        lo, hi = r.get("from"), r.get("to")
                        label = r.get("key") or (
                            f"{lo if lo is not None else '*'}-"
                            f"{hi if hi is not None else '*'}"
                        )
                        cond = F.lit(True)
                        if lo is not None:
                            cond = cond & (ipnum >= F.lit(_ipv4_str_to_int(str(lo))))
                        if hi is not None:
                            cond = cond & (ipnum < F.lit(_ipv4_str_to_int(str(hi))))
                    labels.append(F.when(cond, F.lit(label)))
                return F.filter(F.array(*labels), lambda x: x.isNotNull())

            from elasticsearch_hadoop_spark.functions.text import let_bind

            tmp = f"__bucket_{name}"
            df = df.withColumn(
                tmp,
                F.explode(
                    let_bind(_ipv4_to_long(F.col(b["field"])), _bucket_labels)
                ),
            )
            keys.append((name, F.col(tmp)))
        elif kind == "nested":
            # ES `nested` agg: sub-aggs run over the nested docs — one row
            # per ARRAY ELEMENT, so doc_count is the nested-doc count,
            # exactly like ES.  The explode rebinds the path column to the
            # element; `path.subfield` references below resolve naturally.
            path = body["nested"]["path"]
            df = df.withColumn(path, F.explode(F.col(path)))
        elif kind == "reverse_nested":
            # ES `reverse_nested` (the re-widening the flat rendering CAN
            # express, given a parent identity): sub-aggs count PARENT
            # docs again — dedupe the exploded frame back to one row per
            # (parent, keys-so-far).  Keys above may be ELEMENT-level
            # (a terms on the nested field), so they materialize as
            # columns first and join the dedup key — a parent stays in
            # every element bucket it belongs to, counted once per
            # bucket, exactly ES's reverse_nested doc_count.  Requires
            # compile_aggs(..., parent_id_col=<unique doc id>) — without
            # an identity there is nothing to widen back to (error, never
            # a silent approximation).
            if parent_id_col is None:
                raise AggsDslError(
                    "reverse_nested requires compile_aggs(..., "
                    "parent_id_col=<unique parent id column>)"
                )
            if body["reverse_nested"]:
                raise AggsDslError(
                    "reverse_nested to an intermediate path is unsupported "
                    "(top-level re-widening only)"
                )
            mat = []
            for i, (kname, kexpr) in enumerate(keys):
                col = f"__rn_key_{i}"
                df = df.withColumn(col, kexpr)
                mat.append((kname, col))
            df = df.dropDuplicates([parent_id_col] + [c for _, c in mat])
            keys = [(kname, F.col(col)) for kname, col in mat]
        elif kind in ("children", "parent"):
            # ES join-field context switches: `children` moves from the
            # current (parent-doc) context to the child docs of the given
            # type; `parent` moves from child docs to their parents.  ES
            # resolves both through the join field's global ordinals over
            # the whole index, so the far side comes from base_df (the
            # pre-query frame — same requirement as `global`), keyed by a
            # single semi-join: the bucket side is the small side after a
            # real query, so AQE broadcasts it.  The join/id columns come
            # from the ES MAPPING; this schema-less compiler takes them as
            # documented spec hints, defaulting to the engine's join-frame
            # convention (operators/parent_child.py: join_field/_id).
            if base_df is None:
                raise AggsDslError(
                    f"{kind} bucket requires compile_aggs(..., "
                    "base_df=<pre-query join-field frame>)"
                )
            b = body[kind]
            if "type" not in b:
                raise AggsDslError(f"{kind} bucket requires a 'type' key")
            typ = b["type"]
            jcol = b.get("join_field", "join_field")
            idc = b.get("id_field", "_id")
            side = base_df.filter(F.col(f"{jcol}.name") == F.lit(typ))
            own_key = (
                F.col(idc) if kind == "children" else F.col(f"{jcol}.parent")
            )
            if not keys:
                # no enclosing bucket keys: a semi-join suffices
                cur = df.select(own_key.alias("__pc_key"))
                if kind == "children":
                    cond = F.col(f"{jcol}.parent") == cur["__pc_key"]
                else:
                    cond = side[idc] == cur["__pc_key"]
                df = side.join(cur, on=cond, how="left_semi")
            else:
                # nested under keyed buckets (ES: terms -> children):
                # materialize the outer keys BEFORE the context switch
                # (they reference columns of the CURRENT side, gone after
                # the join) and carry them across — same discipline as
                # reverse_nested.  distinct() bounds the carried frame to
                # one row per (bucket keys, join key): a doc lands once
                # per far-side key it relates to, which is exactly ES's
                # per-bucket ordinal behavior.
                mat = []
                cur_src = df
                for i, (kname, kexpr) in enumerate(keys):
                    col = f"__pc_key_{i}"
                    cur_src = cur_src.withColumn(col, kexpr)
                    mat.append((kname, col))
                cur = cur_src.select(
                    *[c for _, c in mat], own_key.alias("__pc_key")
                ).distinct()
                if kind == "children":
                    cond = F.col(f"{jcol}.parent") == cur["__pc_key"]
                else:
                    cond = side[idc] == cur["__pc_key"]
                df = side.join(cur, on=cond, how="inner").drop("__pc_key")
                keys = [(kname, F.col(col)) for kname, col in mat]
        elif kind == "global":
            # ES `global`: escape the search query — sub-aggs see the
            # whole index.  Needs the caller to hand the pre-query frame
            # in (base_df); without it this is an error, never a silent
            # no-op over the filtered frame.
            if base_df is None:
                raise AggsDslError(
                    "global bucket requires compile_aggs(..., base_df=<pre-query frame>)"
                )
            df = base_df
            df_background = base_df
        elif kind == "auto_date_histogram":
            # ES auto_date_histogram: choose the smallest ladder rung whose
            # bucket count fits the target, then bucket like a
            # fixed_interval date_histogram.  Needs the field's min/max —
            # ONE two-scalar aggregate reaches the driver (the zorder-bounds
            # pattern), nothing else leaves the cluster; an oracle replays
            # the rung choice with the same epoch-floor arithmetic.
            b = body["auto_date_histogram"]
            fld, target = b["field"], int(b.get("buckets", 10))
            row = df.agg(
                F.min(F.unix_timestamp(F.col(fld))).alias("lo"),
                F.max(F.unix_timestamp(F.col(fld))).alias("hi"),
            ).first()
            lo, hi = row["lo"], row["hi"]
            secs = AUTO_DH_LADDER[-1]
            if lo is not None:
                for rung in AUTO_DH_LADDER:
                    if hi // rung - lo // rung + 1 <= target:
                        secs = rung
                        break
            keys.append(
                (
                    name,
                    F.timestamp_seconds(
                        F.floor(F.unix_timestamp(F.col(fld)) / secs) * secs
                    ),
                )
            )
        elif kind == "adjacency_matrix":
            # one bucket per filter plus one per pairwise intersection
            # ("a&b", ES's separator) — a single scan: each row contributes
            # a label array (singles + matching pairs), exploded and
            # grouped.  Empty intersections simply never appear, matching
            # ES (it omits zero-doc cells).
            specs = body["adjacency_matrix"]["filters"]
            if not isinstance(specs, dict):
                raise AggsDslError("adjacency_matrix.filters must map name -> query")
            preds = {n: _compile_dsl(q) for n, q in specs.items()}
            fnames = sorted(preds)
            labels = [F.when(preds[n], F.lit(n)) for n in fnames]
            labels += [
                F.when(preds[a] & preds[b], F.lit(f"{a}&{b}"))
                for i, a in enumerate(fnames)
                for b in fnames[i + 1 :]
            ]
            tmp = f"__bucket_{name}"
            df = df.withColumn(
                tmp, F.explode(F.filter(F.array(*labels), lambda x: x.isNotNull()))
            )
            keys.append((name, F.col(tmp)))
        else:
            b = body[kind]
            if kind == "terms" and ("include" in b or "exclude" in b):
                # ES terms include/exclude: a fully-anchored regex string
                # or an exact-value array, applied to the bucket key BEFORE
                # counting.  Compiles to a plain filter on the key
                # expression — it pushes down with everything else.
                key_for_filter = _bucket_key(kind, b).cast("string")
                inc, exc = b.get("include"), b.get("exclude")
                if inc is not None:
                    df = df.filter(_terms_key_match(key_for_filter, inc))
                if exc is not None:
                    df = df.filter(
                        ~F.coalesce(
                            _terms_key_match(key_for_filter, exc), F.lit(False)
                        )
                    )
            if (
                kind in ("histogram", "date_histogram")
                and int(b.get("min_doc_count", 1)) == 0
            ):
                # ES min_doc_count=0: zero-doc buckets appear across the
                # observed key range, widened by extended_bounds.  The flat
                # rendering supports it for a single keyed level (same
                # restriction as terms order — per-parent ladders are not
                # re-aggregable from innermost cells) and, for
                # date_histogram, fixed_interval only (a calendar ladder
                # has no integer index space).
                nested_buckets = any(
                    _bucket_kind(x)
                    for x in (body.get("aggs") or body.get("aggregations") or {}).values()
                    if isinstance(x, dict)
                )
                if keys or nested_buckets:
                    raise AggsDslError(
                        "min_doc_count=0 needs the histogram to be the only "
                        "keyed bucket level"
                    )
                if kind == "date_histogram" and "fixed_interval" not in b:
                    raise AggsDslError(
                        "min_doc_count=0 date_histogram supports fixed_interval only"
                    )
                densify = (kind, b, name)
            if kind == "date_histogram" and "fixed_interval" in b:
                iv = str(b["fixed_interval"]).strip()
                dh_secs = int(iv[:-1]) * _FIXED_SECONDS[iv[-1]]
            keys.append((name, _bucket_key(kind, b)))
        level = body.get("aggs", body.get("aggregations"))
        depth += 1

    if top_hits is not None:
        if metrics:
            raise AggsDslError("top_hits must be the only metric at its level")
        return _top_hits(df, keys, *top_hits)

    if mads:
        # ES median_absolute_deviation = median(|x - median_bucket(x)|):
        # inherently two-phase.  Keyed: phase 1 attaches the bucket median
        # via a window over the SAME key chain the aggregation shuffles
        # on, so the exchange is reused (one physical shuffle, window +
        # agg back to back).  Keyless: a global window would funnel the
        # whole corpus through one partition — the global median is ONE
        # row, so compute it with a plain aggregate and broadcast it back
        # instead.  (Exact median still merges per-partition buffers at
        # the final reducer — the documented oracle-twin trade; the scale
        # path is percentile_approx/KLL, same as agg_percentiles.)
        if keys:
            from pyspark.sql import Window

            wkeys = Window.partitionBy(*[expr for _, expr in keys])
            for mname, mfield in mads:
                med_col = f"__mad_med_{mname}"
                df = df.withColumn(med_col, F.median(F.col(mfield)).over(wkeys))
                metrics.append(
                    F.median(F.abs(F.col(mfield) - F.col(med_col))).alias(mname)
                )
        else:
            meds = df.agg(
                *[
                    F.median(F.col(mfield)).alias(f"__mad_med_{mname}")
                    for mname, mfield in mads
                ]
            )
            df = df.crossJoin(F.broadcast(meds))
            for mname, mfield in mads:
                metrics.append(
                    F.median(
                        F.abs(F.col(mfield) - F.col(f"__mad_med_{mname}"))
                    ).alias(mname)
                )

    if geo_lines:
        # ES geo_line: the bucket's points as a path ordered by `sort`,
        # truncated to `size` — the GeoJSON LineString coordinates array
        # as array<array<double>> ([lon, lat] pairs).  The carry is
        # pre-bounded (round 10): a row_number window over the SAME key
        # chain the aggregation shuffles on (exchange reused, like the
        # MAD pre-pass) ranks points in the line's own (s, x, y) order,
        # and the collect gates on rn <= size — so the aggregation
        # buffer never holds more than `size` structs per bucket (ES's
        # own geo_line streams a bounded buffer; collect-then-slice
        # would OOM a hot bucket).  Rows are NOT filtered — sibling
        # metrics and doc_count still see every row.  array_sort after
        # the bounded collect keeps the result deterministic across
        # partitionings ((s, x, y) structs order totally).  Keyless:
        # a single global window partition — bounded buffer either way.
        from pyspark.sql import Window

        for gi, (gname, gspec) in enumerate(geo_lines):
            try:
                point_f = gspec["point"]["field"]
                sort_f = gspec["sort"]["field"]
            except (KeyError, TypeError):
                raise AggsDslError(
                    f"geo_line {gname!r}: expected point.field + sort.field"
                ) from None
            size = int(gspec.get("size", 10000))
            order = str(gspec.get("sort_order", "ASC")).upper()
            if order not in ("ASC", "DESC"):
                raise AggsDslError(f"geo_line {gname!r}: sort_order {order!r}")
            lat, lon = F.col(f"{point_f}.lat"), F.col(f"{point_f}.lon")
            ok = F.col(sort_f).isNotNull() & lat.isNotNull() & lon.isNotNull()
            item = F.when(
                ok,
                F.struct(F.col(sort_f).alias("s"), lon.alias("x"), lat.alias("y")),
            )
            # index-based helper name (NOT the user-chosen agg name): a
            # dotted gname would make F.col(rn_col) parse as struct-field
            # access — same discipline as the TOP path's __tv{j}/__tr{j}
            rn_col = f"__gl_rn_{gi}"
            ordc = item.asc_nulls_last() if order == "ASC" else item.desc_nulls_last()
            w = Window.partitionBy(*[expr for _, expr in keys]).orderBy(ordc)
            df = df.withColumn(rn_col, F.row_number().over(w))
            arr = F.array_sort(
                F.collect_list(F.when(F.col(rn_col) <= size, item))
            )
            if order == "DESC":
                arr = F.reverse(arr)
            line = F.slice(
                F.transform(arr, lambda e: F.array(e["x"], e["y"])), 1, size
            )
            metrics.append(line.alias(gname))

    doc_count = F.count(F.lit(1))
    if sample_scale is not None and sample_scale != 1.0:
        # ES rounds the scaled estimate to a long doc count
        doc_count = F.round(doc_count * sample_scale, 0).cast("long")
    metrics = [doc_count.alias("doc_count")] + metrics
    if keys:
        out = df.groupBy(*[expr.alias(name) for name, expr in keys]).agg(*metrics)
        key_names = [name for name, _ in keys]
        if terms_min_doc_count > 1:
            # ES terms min_doc_count: buckets below the floor vanish
            # BEFORE size truncation and pipelines see them
            out = out.filter(F.col("doc_count") >= terms_min_doc_count)
        if composite is not None:
            # composite pagination: key-ascending order, resume strictly
            # after the `after` key tuple (lexicographic), one page of
            # `size` buckets — a TakeOrderedAndProject, never a full sort
            if ccs:
                raise AggsDslError(
                    "cumulative_cardinality needs a plain histogram/"
                    "date_histogram bucket (no composite paging)"
                )
            size, after = composite
            if after and comp_null_orders:
                # the lexicographic cursor NULL-compares a null key —
                # the null bucket would silently vanish from (or empty
                # out) later pages.  Typed refusal over silent wrongness;
                # page such sources without missing_bucket or with a
                # size that covers the whole key set.
                raise AggsDslError(
                    "composite: after-cursor paging over missing_bucket "
                    "sources is not supported (null keys break the "
                    "lexicographic cursor)"
                )
            # geotile sources sort and cursor-resume on the PACKED tile
            # value, not the rendered "z/x/y" string (ES's order): derive
            # a packed column per geotile key, page on it, drop it after
            # the cut.  Pure codegen — the TakeOrderedAndProject shape is
            # unchanged.
            ord_of = {
                k: f"__comp_ord_{k}" if k in comp_geotile else k
                for k in key_names
            }
            for k in key_names:
                if k in comp_geotile:
                    parts = F.split(F.col(k), "/")
                    out = out.withColumn(
                        ord_of[k],
                        F.shiftleft(F.get(parts, 0).cast("long"), 58)
                        + F.shiftleft(F.get(parts, 1).cast("long"), 29)
                        + F.get(parts, 2).cast("long"),
                    )
            if after:
                conv = {
                    k: (_pack_geotile_after(k, after[k])
                        if k in comp_geotile and k in after else after.get(k))
                    for k in key_names
                }
                out = out.filter(
                    _after_key_gt(
                        [ord_of[k] for k in key_names],
                        {ord_of[k]: conv[k] for k in key_names if k in after},
                    )
                )
            sort_cols = [
                F.col(ord_of[k]).asc_nulls_last()
                if comp_null_orders.get(k) == "last"
                else F.col(ord_of[k]).asc_nulls_first()
                for k in key_names
            ]
            out = out.orderBy(*sort_cols).limit(size)
            return out.drop(*[c for c in ord_of.values() if c not in key_names])
        if (terms_size is not None or terms_order is not None) and ccs:
            raise AggsDslError(
                "cumulative_cardinality needs a plain histogram/date_histogram "
                "bucket (no composite paging or terms ordering)"
            )
        if terms_size is not None or terms_order is not None:
            order_cols = _terms_order_cols(terms_order)
            if terms_size is not None:
                # the ES semantics: size truncates UNDER the bucket order
                out = out.orderBy(*order_cols, *key_names).limit(terms_size)
            out = _apply_pipelines(out, key_names, pipelines)
            return out.orderBy(*order_cols, *key_names)
        if densify is not None:
            out = _densify(df, out, densify)
        if ccs:
            out = _apply_cumulative_cardinality(df, out, keys, ccs)
        out = _apply_pipelines(out, key_names, pipelines)
        return out.orderBy(*key_names)
    if pipelines or ccs:
        raise AggsDslError("pipeline aggs need a bucket agg to run over")
    return df.agg(*metrics)


def _compile_dsl(clause: dict) -> Column:
    from elasticsearch_hadoop_spark.query_dsl import compile_query

    return compile_query(clause)


def _top_hits(df: DataFrame, keys: list[tuple[str, Column]], name: str, spec: dict) -> DataFrame:
    """Per-bucket top-N rows: row_number window over the bucket keys (no
    keys -> global orderBy+limit, a TakeOrderedAndProject)."""
    from pyspark.sql import Window

    size = int(spec.get("size", 3))
    sort_cols = []
    for s in spec.get("sort", []):
        ((f, o),) = s.items() if isinstance(s, dict) else ((s, "asc"),)
        order = o.get("order", "asc") if isinstance(o, dict) else o
        c = F.col(f)
        sort_cols.append(c.desc() if str(order).lower() == "desc" else c.asc())
    if not sort_cols:
        raise AggsDslError("top_hits requires a sort")
    source = spec.get("_source")

    key_names = [n for n, _ in keys]
    out = df
    for n, expr in keys:
        out = out.withColumn(n, expr)
    if keys:
        w = Window.partitionBy(*key_names).orderBy(*sort_cols)
        out = out.withColumn("hit_rank", F.row_number().over(w)).filter(
            F.col("hit_rank") <= size
        )
    else:
        out = out.orderBy(*sort_cols).limit(size).withColumn(
            "hit_rank", F.lit(None).cast("int")
        )
    cols = key_names + (list(source) if source else [c for c in df.columns]) + ["hit_rank"]
    return out.select(*dict.fromkeys(cols))


_PARENT_PIPELINES = (
    "derivative", "cumulative_sum", "serial_diff", "moving_fn", "moving_avg",
    "moving_percentiles", "bucket_script", "bucket_selector", "bucket_sort",
    "normalize",
)
# (pipeline docs: `normalize` rescales a metric across its level's buckets
# — percent_of_sum / rescale_0_1 / rescale_0_100 / mean / z-score (population
# stddev) / softmax — as an unordered window over the bucket frame)
_SIBLING_PIPELINES = (
    "avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
    "stats_bucket", "percentiles_bucket", "bucket_correlation",
    "change_point", "bucket_count_ks_test",
)
_MOVING_FNS = {
    "unweightedAvg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
    "stdDev": F.stddev_samp,
}
# position-weighted MovingFunctions: need the in-window VALUE SEQUENCE,
# not a plain aggregate — collect_list over the frame (a handful of
# bucket values), then a fold.  linearWeightedAvg weights oldest..newest
# 1..n; ewma is the ES default alpha=0.3 exponential decay.


def _moving_weighted(kind: str, v, wf):
    arr = F.collect_list(v).over(wf)
    n = F.size(arr)
    if kind == "linearWeightedAvg":
        num = F.aggregate(
            F.zip_with(
                arr,
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda x, i: x * i.cast("double"),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        den = (n * (n + 1) / 2).cast("double")
        return F.when(n > 0, num / den)
    if kind == "ewma":
        alpha = 0.3
        # fold oldest -> newest: s = alpha*x + (1-alpha)*s
        return F.when(
            n > 0,
            F.aggregate(
                F.slice(arr, 2, F.greatest(n, F.lit(1))),
                F.get(arr, 0).cast("double"),
                lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
            ),
        )
    raise AggsDslError(kind)
# arithmetic + comparisons/boolean connectives (bucket_selector); no
# quotes/semicolons/backticks — the expression can only reference the
# params-substituted bucket columns and literals
_SCRIPT_OK = re.compile(r"^[\w\s.+\-*/()%,<>=!&|]+$")


def _pipeline_kind(body: dict) -> str | None:
    for kind in _PARENT_PIPELINES + _SIBLING_PIPELINES:
        if kind in body:
            return kind
    return None


def _path_col(path: str) -> Column:
    """Resolve a buckets_path to a bucket-frame column: '_count' ->
    doc_count; 'bucket>metric' keeps the last segment; multi-value paths
    like 's.avg' map to the flattened 's_avg' column."""
    leaf = str(path).split(">")[-1].strip()
    if leaf == "_count":
        return F.col("doc_count")
    return F.col(leaf.replace(".", "_"))


def _script_expr(spec: dict) -> Column:
    """ES bucket_script/bucket_selector arithmetic: substitute
    params.<name> with the mapped bucket columns, then hand the (checked,
    arithmetic-only) expression to F.expr."""
    script = str(spec.get("script", "")).strip()
    params = spec.get("buckets_path")
    if not script or not isinstance(params, dict):
        raise AggsDslError("bucket_script/selector need script + buckets_path map")
    if not _SCRIPT_OK.match(script.replace("params.", "")):
        raise AggsDslError(f"unsupported script syntax: {script!r}")
    for pname, path in params.items():
        leaf = str(path).split(">")[-1].strip()
        col = "doc_count" if leaf == "_count" else leaf.replace(".", "_")
        script = script.replace(f"params.{pname}", f"`{col}`")
    if "params." in script:
        raise AggsDslError(f"unmapped params in script: {script!r}")
    return F.expr(script)


def _apply_pipelines(
    out: DataFrame, key_names: list[str], pipelines: list[tuple[str, str, dict, int]]
) -> DataFrame:
    """Run pipeline aggs as window functions over the finished bucket rows.

    A parent pipeline at level d partitions by the outer keys
    (key_names[:d]) and orders by its own level's key (key_names[d]); a
    sibling *_bucket at level d aggregates the level-d buckets within the
    same partition and repeats the value on every row (flat-relational
    rendering of ES's sibling output).  The frame this runs over is
    post-aggregation — bucket counts, not fact rows — so these windows
    never touch the raw table."""
    from pyspark.sql import Window

    for name, kind, spec, k in pipelines:
        if kind in _SIBLING_PIPELINES:
            if k != len(key_names) - 1:
                raise AggsDslError(
                    f"sibling pipeline {name!r} must sit beside the innermost bucket agg"
                )
            part = key_names[:k]
            v = _path_col(spec["buckets_path"])
            ws = Window.partitionBy(*part) if part else Window.partitionBy()
            if kind == "stats_bucket":
                # multi-value sibling: count/min/max/avg/sum of the metric
                # across the sibling buckets, flattened to <name>_<stat>
                # columns repeated on every row of the scope
                for stat, fn in (
                    ("count", F.count), ("min", F.min), ("max", F.max),
                    ("avg", F.avg), ("sum", F.sum),
                ):
                    out = out.withColumn(f"{name}_{stat}", fn(v).over(ws))
                continue
            if kind == "percentiles_bucket":
                # exact interpolated percentiles of the metric across the
                # sibling buckets (ES interpolates over the bucket values
                # too); <name>_<p> columns, percents like the percentiles
                # metric
                pcts = [float(p) for p in spec.get("percents", (1, 5, 25, 50, 75, 95, 99))]
                for p in pcts:
                    out = out.withColumn(
                        f"{name}_{_pname(p)}",
                        F.percentile(v, F.lit(p / 100.0)).over(ws),
                    )
                continue
            if kind == "change_point":
                # ES change_point, the step_change detector subset: every
                # split of the ordered bucket series is scored by the
                # two-sample t-statistic between before/after means
                # (Welch, population variances); the winning split's key
                # and |t| repeat on every row (<name>_key /
                # <name>_score, the sibling flat rendering).  ES's ML
                # change_point also classifies dip/spike/trend_change
                # with real p-values — the deterministic step detector is
                # the reproducible core, documented.  All window math
                # over the finished bucket frame: prefix sums give every
                # split in ONE pass, no per-split rescan.
                v = _path_col(spec["buckets_path"]).cast("double")
                worder = (
                    Window.partitionBy(*part).orderBy(key_names[k])
                    if part
                    else Window.orderBy(key_names[k])
                )
                run = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                whole = (
                    Window.partitionBy(*part) if part else Window.partitionBy()
                )
                rn = F.row_number().over(worder)
                n = F.count(F.lit(1)).over(whole)
                ps = F.sum(v).over(run)
                pss = F.sum(v * v).over(run)
                ts_ = F.sum(v).over(whole)
                tss = F.sum(v * v).over(whole)
                n1 = rn.cast("double")
                n2 = (n - rn).cast("double")
                m1 = ps / n1
                m2 = (ts_ - ps) / n2
                var1 = F.greatest(pss / n1 - m1 * m1, F.lit(0.0))
                var2 = F.greatest((tss - pss) / n2 - m2 * m2, F.lit(0.0))
                denom = F.sqrt(var1 / n1 + var2 / n2)
                t = F.when(
                    (rn < n) & (denom > 0), F.abs(m1 - m2) / denom
                ).otherwise(F.lit(None))
                out = out.withColumn("__cp_t", t)
                # winner = argmax |t|; the change point is the FIRST
                # bucket of the after-segment (key at rn_winner + 1),
                # which lead() reads without a second pass
                nxt_key = F.lead(F.col(key_names[k])).over(worder)
                wbest = (
                    Window.partitionBy(*part).orderBy(
                        F.col("__cp_t").desc_nulls_last(), F.col(key_names[k])
                    )
                    if part
                    else Window.orderBy(
                        F.col("__cp_t").desc_nulls_last(), F.col(key_names[k])
                    )
                ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
                out = out.withColumn("__cp_next", nxt_key)
                out = (
                    out.withColumn(
                        f"{name}_key", F.first("__cp_next").over(wbest)
                    )
                    .withColumn(f"{name}_score", F.first("__cp_t").over(wbest))
                    .drop("__cp_t", "__cp_next")
                )
                continue
            if kind == "bucket_count_ks_test":
                # ES bucket_count_ks_test (ML sibling pipeline): a
                # Kolmogorov–Smirnov test of the sibling buckets' doc
                # counts against expected `fractions` (default uniform) —
                # the drift detector for "do these buckets still follow
                # the expected distribution".  Deterministic semantics,
                # documented (ES's ML implementation is sampling-based;
                # this engine computes the classical statistics exactly):
                #   ECDF(i)   = cumsum(counts) / total   (bucket-KEY order
                #               — documented deviation: ES evaluates the
                #               sibling agg's RESPONSE order, count-desc
                #               for a default terms level, so D can
                #               differ there; key order is the only
                #               deterministic choice over a columnar
                #               frame and is what the oracle replays)
                #   F0(i)     = cumsum(fractions, normalized)
                #   less      = sup(ECDF - F0)   (actual mass sits at
                #               SMALLER bucket keys than expected)
                #   greater   = sup(F0 - ECDF)
                #   two_sided = sup|ECDF - F0|
                # p-values: one-sided exp(-2·n·d²); two-sided the
                # Kolmogorov asymptotic 2·Σ(-1)^{j-1}·exp(-2·j²·n·d²)
                # (100 terms, clamped to [0,1]); n = total doc count.
                # sampling_method restricts WHICH CDF points enter the
                # sup: uniform = all (the default here — documented
                # deviation from ES's upper_tail), upper_tail = points
                # with F0 > 0.5, lower_tail = F0 <= 0.5.  All window math
                # over the finished bucket frame — prefix sums give every
                # CDF point in one pass, no fact rows, no collect.
                # ES's default runs ALL hypotheses; a bare string is the
                # one-alternative shorthand (iterating it character-wise
                # produced a garbage "unknown alternative" error)
                alts = spec.get("alternative", ["less", "greater", "two_sided"])
                if isinstance(alts, str):
                    alts = [alts]
                if not isinstance(alts, (list, tuple)):
                    raise AggsDslError(
                        f"bucket_count_ks_test {name!r}: alternative must be "
                        f"a string or list, got {type(alts).__name__}"
                    )
                alts = list(alts)
                if not alts:
                    # an empty list would silently emit NO output columns
                    # — the silent-no-op class this validation exists for
                    raise AggsDslError(
                        f"bucket_count_ks_test {name!r}: alternative must "
                        "name at least one hypothesis"
                    )
                bad = [a for a in alts if a not in ("less", "greater", "two_sided")]
                if bad:
                    raise AggsDslError(
                        f"bucket_count_ks_test {name!r}: unknown alternative {bad}"
                    )
                sampling = spec.get("sampling_method", "uniform")
                if sampling not in ("uniform", "upper_tail", "lower_tail"):
                    raise AggsDslError(
                        f"bucket_count_ks_test {name!r}: unknown "
                        f"sampling_method {sampling!r}"
                    )
                v = _path_col(spec["buckets_path"]).cast("double")
                worder = (
                    Window.partitionBy(*part).orderBy(key_names[k])
                    if part
                    else Window.orderBy(key_names[k])
                )
                run = worder.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
                total = F.sum(v).over(ws)
                nb = F.count(F.lit(1)).over(ws)
                rn = F.row_number().over(worder)
                # all-zero counts (densified empty buckets, a filtered
                # metric): no data -> every CDF point drops out, d = 0,
                # p = 1 — and no ANSI /0 (same guard family as BM25)
                ecdf = F.when(total > 0, F.sum(v).over(run) / total)
                fracs = spec.get("fractions")
                if fracs is not None:
                    if any(float(x) < 0 for x in fracs):
                        # a negative entry silently builds a non-monotone
                        # reference CDF — garbage statistics (ES rejects)
                        raise AggsDslError(
                            f"bucket_count_ks_test {name!r}: fractions must "
                            "be non-negative"
                        )
                    fsum = float(sum(fracs))
                    if fsum <= 0:
                        raise AggsDslError(
                            f"bucket_count_ks_test {name!r}: fractions must "
                            "sum to a positive value"
                        )
                    cum, acc = [], 0.0
                    for x in fracs:
                        acc += float(x) / fsum
                        cum.append(acc)
                    # the fractions list must cover the buckets exactly —
                    # a silent mismatch drops CDF points from the sup and
                    # understates D (ES rejects the request); the bucket
                    # count is runtime information, so this asserts in
                    # the plan (bucket rows are few)
                    f0 = F.when(
                        F.assert_true(
                            nb == len(cum),
                            F.concat(
                                F.lit(
                                    "bucket_count_ks_test: fractions has "
                                    f"{len(cum)} entries but the level has "
                                ),
                                nb.cast("string"),
                                F.lit(" buckets"),
                            ),
                        ).isNull(),
                        F.get(F.lit(cum), rn - 1),
                    )
                else:
                    f0 = rn.cast("double") / nb.cast("double")
                mask = {
                    "uniform": F.lit(True),
                    "upper_tail": f0 > 0.5,
                    "lower_tail": f0 <= 0.5,
                }[sampling]
                # materialize the per-bucket CDF difference before taking
                # the partition-wide sup: a window aggregate over another
                # window expression is a nested-window AnalysisException
                out = out.withColumn(
                    "__ks_diff", F.when(mask, ecdf - f0)
                ).withColumn("__ks_n", total)
                d_less = F.greatest(
                    F.max(F.col("__ks_diff")).over(ws), F.lit(0.0)
                )
                d_greater = F.greatest(
                    F.max(-F.col("__ks_diff")).over(ws), F.lit(0.0)
                )
                for alt in alts:
                    d = {
                        "less": d_less,
                        "greater": d_greater,
                        "two_sided": F.greatest(d_less, d_greater),
                    }[alt]
                    out = out.withColumn("__ks_nd2", F.col("__ks_n") * d * d)
                    nd2 = F.col("__ks_nd2")
                    if alt == "two_sided":
                        series = F.aggregate(
                            F.sequence(F.lit(1), F.lit(100)),
                            F.lit(0.0),
                            lambda acc, j: acc
                            + F.pow(F.lit(-1.0), (j - 1).cast("double"))
                            * F.exp(F.lit(-2.0) * (j * j).cast("double") * nd2),
                        )
                        # the alternating series needs ~sqrt(10/n·d²)
                        # terms to converge; below n·d² = 1e-3 the 100
                        # terms are too few — and the true p there is 1
                        # to double precision (Kolmogorov CDF ~ 0 below
                        # λ ≈ 0.3), so return it exactly
                        p = F.when(nd2 <= 1e-3, F.lit(1.0)).otherwise(
                            F.least(
                                F.greatest(2.0 * series, F.lit(0.0)),
                                F.lit(1.0),
                            )
                        )
                    else:
                        p = F.exp(F.lit(-2.0) * nd2)
                    out = out.withColumn(f"{name}_{alt}", p).drop("__ks_nd2")
                out = out.drop("__ks_n", "__ks_diff")
                continue
            if kind == "bucket_correlation":
                # ES bucket_correlation (count_correlation function):
                # Pearson correlation between the sibling buckets' metric
                # series and the caller's indicator expectations, zipped
                # by the level's bucket order.  The join with the literal
                # expectations array is element_at by row_number — still a
                # window over the finished bucket frame, no fact rows.
                fn = spec.get("function", {})
                ind = (fn.get("count_correlation") or {}).get("indicator", {})
                exps = [float(x) for x in ind.get("expectations", [])]
                if not exps:
                    raise AggsDslError(
                        f"bucket_correlation {name!r} needs "
                        "function.count_correlation.indicator.expectations"
                    )
                worder = (
                    Window.partitionBy(*part).orderBy(key_names[k])
                    if part
                    else Window.orderBy(key_names[k])
                )
                rn = F.row_number().over(worder)
                # F.get (not element_at): a bucket count exceeding the
                # expectations list yields NULL (corr skips the pair)
                # instead of an ANSI out-of-bounds error
                exp_v = F.get(F.lit(exps), rn - 1)
                out = out.withColumn("__bc_exp", exp_v).withColumn(
                    name, F.corr(v, F.col("__bc_exp")).over(ws)
                ).drop("__bc_exp")
                continue
            agg = {"avg_bucket": F.avg, "sum_bucket": F.sum,
                   "min_bucket": F.min, "max_bucket": F.max}[kind]
            out = out.withColumn(name, agg(v).over(ws))
            continue
        if k == 0 or k != len(key_names):
            raise AggsDslError(
                f"parent pipeline {name!r} must live inside the innermost bucket's aggs"
            )
        part, order = key_names[: k - 1], key_names[k - 1]
        w = (
            Window.partitionBy(*part).orderBy(order)
            if part
            else Window.orderBy(order)
        )
        if kind == "derivative":
            v = _path_col(spec["buckets_path"])
            out = out.withColumn(name, v - F.lag(v, 1).over(w))
        elif kind == "serial_diff":
            v = _path_col(spec["buckets_path"])
            out = out.withColumn(name, v - F.lag(v, int(spec.get("lag", 1))).over(w))
        elif kind == "cumulative_sum":
            v = _path_col(spec["buckets_path"])
            wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            out = out.withColumn(name, F.sum(v).over(wf))
        elif kind in ("moving_fn", "moving_avg"):
            v = _path_col(spec["buckets_path"])
            n = int(spec.get("window", 5))
            script = str(spec.get("script", "MovingFunctions.unweightedAvg(values)"))
            m = re.search(r"MovingFunctions\.(\w+)", script)
            fn_name = m.group(1) if m else "unweightedAvg"
            wf = w.rowsBetween(-(n - 1), Window.currentRow)
            if fn_name in ("linearWeightedAvg", "ewma"):
                out = out.withColumn(name, _moving_weighted(fn_name, v, wf))
            else:
                fn = _MOVING_FNS.get(fn_name)
                if fn is None:
                    raise AggsDslError(f"unsupported moving function {fn_name!r}")
                out = out.withColumn(name, fn(v).over(wf))
        elif kind == "moving_percentiles":
            # ES moving_percentiles: percentiles of a sibling metric over a
            # sliding window of buckets.  Same trailing-window convention
            # as moving_fn above (window buckets INCLUDING the current
            # one); exact interpolated percentiles over the handful of
            # in-window bucket values (ES uses t-digest, which is exact at
            # these cardinalities anyway).  <name>_<p> columns like the
            # percentiles metric.
            v = _path_col(spec["buckets_path"])
            n = int(spec.get("window", 5))
            wf = w.rowsBetween(-(n - 1), Window.currentRow)
            for p in [float(x) for x in spec.get("percents", (1, 5, 25, 50, 75, 95, 99))]:
                out = out.withColumn(
                    f"{name}_{_pname(p)}",
                    F.percentile(v, F.lit(p / 100.0)).over(wf),
                )
        elif kind == "normalize":
            # ES normalize pipeline: rescale the metric across the sibling
            # buckets of its level (unordered full-partition window — the
            # same bucket frame, no fact rows touched).  z-score uses the
            # POPULATION stddev of the bucket values (the bucket set is
            # the whole population, not a sample).
            v = _path_col(spec["buckets_path"])
            method = str(spec.get("method", ""))
            wp = Window.partitionBy(*part) if part else Window.partitionBy()
            if method == "percent_of_sum":
                expr = v / F.sum(v).over(wp)
            elif method == "rescale_0_1":
                lo, hi = F.min(v).over(wp), F.max(v).over(wp)
                expr = (v - lo) / (hi - lo)
            elif method == "rescale_0_100":
                lo, hi = F.min(v).over(wp), F.max(v).over(wp)
                expr = (v - lo) / (hi - lo) * 100
            elif method == "mean":
                lo, hi = F.min(v).over(wp), F.max(v).over(wp)
                expr = (v - F.avg(v).over(wp)) / (hi - lo)
            elif method == "z-score":
                expr = (v - F.avg(v).over(wp)) / F.stddev_pop(v).over(wp)
            elif method == "softmax":
                expr = F.exp(v) / F.sum(F.exp(v)).over(wp)
            else:
                raise AggsDslError(f"normalize {name!r}: unknown method {method!r}")
            out = out.withColumn(name, expr)
        elif kind == "bucket_script":
            out = out.withColumn(name, _script_expr(spec))
        elif kind == "bucket_selector":
            out = out.filter(_script_expr(spec).cast("boolean"))
        elif kind == "bucket_sort":
            # truncate the bucket frame per parent partition under the
            # given sort (row_number, a WindowGroupLimit — never a global
            # sort of fact rows; this frame is already buckets).  The
            # final presentation order stays the flat rendering's
            # key-ascending, as with every other bucket output.
            cols = []
            for s in spec.get("sort", []):
                if isinstance(s, str):
                    cols.append(_path_col(s).asc())
                else:
                    ((cname, cbody),) = s.items()
                    o = cbody.get("order", "asc") if isinstance(cbody, dict) else cbody
                    col = _path_col(cname)
                    cols.append(col.desc() if str(o) == "desc" else col.asc())
            if not cols:
                cols = [F.col(order).asc()]  # size-only: deterministic key order
            wn = (
                Window.partitionBy(*part).orderBy(*cols)
                if part
                else Window.orderBy(*cols)
            )
            out = out.withColumn("__bs_rn", F.row_number().over(wn))
            size = spec.get("size")
            frm = int(spec.get("from", 0))
            if size is not None:
                out = out.filter(F.col("__bs_rn") <= frm + int(size))
            if frm:
                out = out.filter(F.col("__bs_rn") > frm)
            out = out.drop("__bs_rn")
        else:
            raise AggsDslError(kind)
    return out


def change_point_stats(
    df: DataFrame,
    value_col: str,
    key_col: str,
    out_key: str = "cp_key",
    out_score: str = "cp_score",
) -> DataFrame:
    """The step_change detector as a standalone frame transform (shared
    with ES|QL's CHANGE_POINT command): order rows by ``key_col``, score
    every split with the Welch t-statistic via prefix sums (ONE window
    pass), and repeat the winning split's first-after key + |t| on every
    row.  Same documented subset as the change_point sibling pipeline."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    worder = Window.orderBy(key_col)
    run = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy()
    rn = F.row_number().over(worder)
    n = F.count(F.lit(1)).over(whole)
    ps = F.sum(v).over(run)
    pss = F.sum(v * v).over(run)
    ts_ = F.sum(v).over(whole)
    tss = F.sum(v * v).over(whole)
    n1, n2 = rn.cast("double"), (n - rn).cast("double")
    m1, m2 = ps / n1, (ts_ - ps) / n2
    var1 = F.greatest(pss / n1 - m1 * m1, F.lit(0.0))
    var2 = F.greatest((tss - pss) / n2 - m2 * m2, F.lit(0.0))
    denom = F.sqrt(var1 / n1 + var2 / n2)
    t = F.when((rn < n) & (denom > 0), F.abs(m1 - m2) / denom)
    out = df.withColumn("__cp_t", t).withColumn(
        "__cp_next", F.lead(F.col(key_col)).over(worder)
    )
    wbest = Window.orderBy(
        F.col("__cp_t").desc_nulls_last(), F.col(key_col)
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        out.withColumn(out_key, F.first("__cp_next").over(wbest))
        .withColumn(out_score, F.first("__cp_t").over(wbest))
        .drop("__cp_t", "__cp_next")
    )


def _densify(df: DataFrame, out: DataFrame, densify) -> DataFrame:
    """Emit zero-doc buckets (ES min_doc_count=0): a spark.range ladder
    over the integer bucket-index space, LEFT-joined with the aggregated
    buckets.  The ladder key is `index * interval` — the SAME arithmetic
    the bucket key uses (floor(v/interval) * interval with floor yielding
    a long), so the join equality is bit-exact on doubles.  Bounds =
    observed data range ∪ extended_bounds (ES semantics: extended_bounds
    only widens); ONE two-scalar aggregate reaches the driver (the
    auto_date_histogram pattern).  Empty buckets carry doc_count 0 and
    null metrics (ES renders most empty-bucket metrics null too);
    pipelines run AFTER densification — the point of min_doc_count=0 for
    derivatives."""
    kind, b, name = densify
    field = b["field"]
    eb = b.get("extended_bounds") or {}
    spark = df.sparkSession
    if kind == "histogram":
        interval = float(b["interval"])
        row = df.agg(
            F.min(F.col(field)).alias("lo"), F.max(F.col(field)).alias("hi")
        ).first()
        cand_lo = [float(row["lo"])] if row["lo"] is not None else []
        cand_hi = [float(row["hi"])] if row["hi"] is not None else []
        if "min" in eb:
            cand_lo.append(float(eb["min"]))
        if "max" in eb:
            cand_hi.append(float(eb["max"]))
        if not cand_lo or not cand_hi:
            return out
        lo_idx = min(math.floor(v / interval) for v in cand_lo)
        hi_idx = max(math.floor(v / interval) for v in cand_hi)
        key = (F.col("id") * F.lit(interval)).cast("double")
    else:  # date_histogram, fixed_interval (validated at parse time)
        iv = str(b["fixed_interval"]).strip()
        secs = int(iv[:-1]) * _FIXED_SECONDS[iv[-1]]
        row = df.agg(
            F.min(F.unix_timestamp(F.col(field))).alias("lo"),
            F.max(F.unix_timestamp(F.col(field))).alias("hi"),
        ).first()
        cand_lo = [int(row["lo"])] if row["lo"] is not None else []
        cand_hi = [int(row["hi"])] if row["hi"] is not None else []
        for k, cand in (("min", cand_lo), ("max", cand_hi)):
            if k in eb:
                cand.append(_epoch_seconds(eb[k]))
        if not cand_lo or not cand_hi:
            return out
        lo_idx = min(v // secs for v in cand_lo)
        hi_idx = max(v // secs for v in cand_hi)
        key = F.timestamp_seconds(F.col("id") * F.lit(secs))
    n_buckets = hi_idx - lo_idx + 1
    if n_buckets > 100_000:
        raise AggsDslError(
            f"min_doc_count=0 would densify {n_buckets} buckets (cap 100k); "
            "widen the interval or drop extended_bounds"
        )
    ladder = spark.range(lo_idx, hi_idx + 1).select(key.alias(name))
    dense = ladder.join(out, on=name, how="left")
    return dense.withColumn(
        "doc_count", F.coalesce(F.col("doc_count"), F.lit(0).cast("long"))
    )


def _epoch_seconds(v) -> int:
    """extended_bounds date literal -> epoch seconds: int/float epoch
    seconds, or an ISO 'yyyy-MM-dd[ HH:MM:SS]' string read as UTC (the
    engine pins session tz UTC — corpus/_util.tbl)."""
    if isinstance(v, (int, float)):
        return int(v)
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(str(v))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _terms_order_cols(terms_order: tuple[dict | None, str] | None) -> list[Column]:
    """ES terms ``order``: ``{"_count": "desc"}`` (the default),
    ``{"_key": "asc"}``, or ``{"<metric name>": ...}`` (sub-metric order —
    multi-value paths like ``s.avg`` resolve to the flattened column)."""
    if terms_order is None or terms_order[0] is None:
        return [F.col("doc_count").desc()]
    spec, key_name = terms_order
    if not isinstance(spec, dict) or len(spec) != 1:
        raise AggsDslError(f"terms order must be a single-entry map, got {spec!r}")
    ((path, direction),) = spec.items()
    if path == "_count":
        col = F.col("doc_count")
    elif path == "_key":
        col = F.col(key_name)
    else:
        col = _path_col(path)
    return [col.desc() if str(direction).lower() == "desc" else col.asc()]


def _terms_key_match(key: Column, spec) -> Column:
    """terms include/exclude matcher: regex string (fully anchored, like
    ES) or exact-value list."""
    if isinstance(spec, str):
        return key.rlike(f"^(?:{spec})$")
    return key.isin([str(v) for v in spec])


def _ipv4_to_long(c: Column) -> Column:
    """Dotted-quad string -> 32-bit integer, pure Column math (codegen)."""
    p = F.split(c, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def _ipv4_str_to_int(s: str) -> int:
    parts = s.split(".")
    if len(parts) != 4:
        raise AggsDslError(f"not an IPv4 address: {s!r}")
    return sum(int(p) << (8 * (3 - i)) for i, p in enumerate(parts))


def _cidr_bounds(mask: str) -> tuple[int, int]:
    """CIDR "a.b.c.d/n" -> [lo, hi) integer bounds (network-aligned)."""
    try:
        base, bits_s = mask.split("/")
        bits = int(bits_s)
    except ValueError:
        raise AggsDslError(f"not a CIDR mask: {mask!r}") from None
    if not 0 <= bits <= 32:
        raise AggsDslError(f"CIDR prefix out of range: {mask!r}")
    span = 1 << (32 - bits)
    lo = (_ipv4_str_to_int(base) // span) * span
    return lo, lo + span


def _bucket_kind(body: dict) -> str | None:
    for kind in (
        "terms", "multi_terms", "histogram", "date_histogram",
        "auto_date_histogram", "range", "date_range", "geo_distance",
        "geotile_grid",
        "geohash_grid", "filter", "filters", "adjacency_matrix",
        "sampler", "diversified_sampler", "random_sampler",
        "ip_range", "ip_prefix",
        "nested", "reverse_nested", "global", "children", "parent",
        "composite", "missing", "significant_terms", "significant_text",
        "rare_terms", "variable_width_histogram", "frequent_item_sets",
        "categorize_text",
    ):
        if kind in body:
            return kind
    return None


def _significant_terms(
    fg: DataFrame, bg: DataFrame, name: str, spec: dict
) -> DataFrame:
    """ES significant_terms: terms over-represented in the foreground
    (the frame after preceding filter/missing buckets) vs the background
    (the frame as given).  JLH score: (fg% - bg%) * (fg% / bg%), ES's
    default heuristic.  Two aggregations + a join of per-term stats —
    the term-stat frames are tiny, so the join broadcasts; totals come
    from window sums over the stat rows, never a second pass over data.
    ``background_filter`` narrows the background set to its own query-DSL
    clause (ES's option for comparing against a focused context instead
    of the whole index) — a predicate on the background scan, no extra
    pass."""
    from pyspark.sql import Window

    field, size = spec["field"], int(spec.get("size", 10))
    if "background_filter" in spec:
        bg = bg.filter(_compile_dsl(spec["background_filter"]))
    wall = Window.partitionBy()
    fgs = (
        fg.groupBy(F.col(field).alias(name))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .withColumn("__fg_total", F.sum("doc_count").over(wall))
    )
    bgs = (
        bg.groupBy(F.col(field).alias(name))
        .agg(F.count(F.lit(1)).alias("bg_count"))
        .withColumn("__bg_total", F.sum("bg_count").over(wall))
    )
    fgp = F.col("doc_count") / F.col("__fg_total")
    bgp = F.col("bg_count") / F.col("__bg_total")
    return (
        fgs.join(bgs, name)
        .withColumn("score", (fgp - bgp) * (fgp / bgp))
        .filter(F.col("score") > 0)  # ES only reports over-represented terms
        .select(name, "doc_count", "bg_count", "score")
        .orderBy(F.col("score").desc(), name)
        .limit(size)
    )


def _apply_cumulative_cardinality(
    df: DataFrame,
    out: DataFrame,
    keys: list[tuple[str, Column]],
    ccs: list[tuple[str, str]],
) -> DataFrame:
    """ES cumulative_cardinality: distinct values of the field seen in
    this bucket OR ANY EARLIER one.  Not re-aggregable from per-bucket
    cardinalities, so it runs on the raw frame via the first-occurrence
    trick: each value's first bucket (one shuffle on the value), count of
    first-appearances per bucket (one tiny shuffle on the bucket key),
    then a cumulative sum over the finished bucket rows.  Exact, and two
    map-combined shuffles — never N distinct-counts over growing
    prefixes.  (ES's own is approximate HLL-merge; this is the exact
    twin, same shape `operators/sketches.py` covers approximately.)"""
    from pyspark.sql import Window

    if len(keys) != 1:
        raise AggsDslError(
            "cumulative_cardinality needs the histogram/date_histogram to be "
            "the only keyed bucket level"
        )
    key_name, key_expr = keys[0]
    for name, field in ccs:
        firsts = (
            df.filter(F.col(field).isNotNull())
            .groupBy(F.col(field).alias("__ccv"))
            .agg(F.min(key_expr).alias(key_name))
        )
        news = firsts.groupBy(key_name).agg(F.count(F.lit(1)).alias("__new"))
        w = Window.orderBy(key_name).rowsBetween(Window.unboundedPreceding, 0)
        out = (
            out.join(news, key_name, "left")
            .withColumn(
                name, F.sum(F.coalesce(F.col("__new"), F.lit(0))).over(w)
            )
            .drop("__new")
        )
    return out


def _significant_text(
    fg: DataFrame, bg: DataFrame, name: str, spec: dict
) -> DataFrame:
    """ES significant_text: significant_terms over the ANALYZED tokens of
    a text field.  Per ES, a document counts once per distinct term it
    contains (``filter_duplicate_text``-adjacent: array_distinct per doc),
    and the totals are DOCUMENT counts, not token counts — so the totals
    come from two scalar aggregates broadcast-cross-joined onto the tiny
    per-term stat frames, never a window over token rows.  JLH score like
    significant_terms.  ``background_filter`` narrows the background set
    like significant_terms' option."""
    from elasticsearch_hadoop_spark.functions.text import standard_analyze

    field, size = spec["field"], int(spec.get("size", 10))
    if "background_filter" in spec:
        bg = bg.filter(_compile_dsl(spec["background_filter"]))

    def per_term(d: DataFrame, cnt: str) -> DataFrame:
        toks = d.select(
            F.explode(F.array_distinct(standard_analyze(F.col(field)))).alias(name)
        )
        return toks.groupBy(name).agg(F.count(F.lit(1)).alias(cnt))

    fgs = per_term(fg, "doc_count").crossJoin(
        F.broadcast(fg.agg(F.count(F.lit(1)).alias("__fg_total")))
    )
    bgs = per_term(bg, "bg_count").crossJoin(
        F.broadcast(bg.agg(F.count(F.lit(1)).alias("__bg_total")))
    )
    fgp = F.col("doc_count") / F.col("__fg_total")
    bgp = F.col("bg_count") / F.col("__bg_total")
    return (
        fgs.join(bgs, name)
        .withColumn("score", (fgp - bgp) * (fgp / bgp))
        .filter(F.col("score") > 0)
        .select(name, "doc_count", "bg_count", "score")
        .orderBy(F.col("score").desc(), name)
        .limit(size)
    )


def _variable_width_histogram(df: DataFrame, name: str, spec: dict) -> DataFrame:
    """ES variable_width_histogram: ``buckets`` data-adaptive clusters of a
    numeric field, each reported as min/max/centroid + doc_count.

    Documented deviation: ES streams approximate 1D clusters whose
    boundaries depend on shard/collection order; this engine substitutes
    the deterministic twin — equal-frequency clustering at exact
    interpolated quantile boundaries.  Same output shape, stable under
    any partitioning.

    Scale shape: one distributed percentile aggregate (a 1-row frame,
    broadcast), then bucket assignment is a fold over the boundary array
    in codegen and one hash aggregation — never a global sort (an NTILE
    window would single-partition the data; boundaries + assignment keep
    it shuffle-light)."""
    field = spec["field"]
    n = int(spec.get("buckets", 10))
    if n < 2:
        raise AggsDslError("variable_width_histogram needs buckets >= 2")
    c = F.col(field).cast("double")
    qs = [i / n for i in range(1, n)]
    bounds = df.filter(c.isNotNull()).agg(
        F.percentile(c, F.array(*[F.lit(q) for q in qs])).alias("__bounds")
    )
    assigned = (
        df.filter(c.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "__bucket",
            F.aggregate(
                F.col("__bounds"),
                F.lit(0),
                lambda acc, b: acc + F.when(c > b, 1).otherwise(0),
            ),
        )
    )
    return (
        assigned.groupBy(F.col("__bucket").alias(f"{name}_bucket"))
        .agg(
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_centroid"),
            F.count(F.lit(1)).alias("doc_count"),
        )
        .orderBy(f"{name}_bucket")
    )


def _frequent_item_sets(df: DataFrame, name: str, spec: dict) -> DataFrame:
    """ES frequent_item_sets, the size-<=2 subset: itemsets of one array
    field with doc_count and support (doc_count / total docs), ranked
    support desc.  Singles come from one explode + hash agg; pairs are
    generated PER DOCUMENT in Column math (nested transform over the
    sorted distinct item array — C(k,2) arrays, no self-join on doc id)
    and share the same single exploded aggregation.  ES's Eclat miner
    handles arbitrary set sizes and multiple fields; sizes beyond 2 are
    rejected, not approximated (at 100 TB per-doc combination blowup is
    the thing to refuse — cap the field's cardinality upstream like ES's
    field_value limit).  One driver-side scalar (the doc count) computes
    support, the significant_terms/auto_date_histogram pattern.

    Documented deviation: ES reports only CLOSED itemsets (a subset
    sharing its superset's doc_count is omitted); this emits every
    frequent itemset — deterministic and oracle-replayable, and the
    closed subset is recoverable by post-filtering rows whose doc_count
    equals a superset's."""
    fields = spec.get("fields")
    if not isinstance(fields, list) or not fields:
        raise AggsDslError(
            "frequent_item_sets: needs a non-empty fields list"
        )
    min_set = int(spec.get("minimum_set_size", 1))
    min_support = float(spec.get("minimum_support", 0.1))
    size = int(spec.get("size", 10))
    max_set = int(spec.get("maximum_set_size", 2))
    if max_set > 2 or min_set > max_set or min_set < 1:
        raise AggsDslError(
            "frequent_item_sets: set sizes 1..2 are supported "
            f"(got {min_set}..{max_set})"
        )
    total = df.count()
    if total == 0:
        raise AggsDslError("frequent_item_sets over an empty frame")
    if len(fields) == 1:
        fname = fields[0]["field"]
        col = F.col(fname)
        dt = df.schema[fname].dataType
        as_arr = col if isinstance(dt, T.ArrayType) else F.array(col)
        # null elements are not items (the multi-field path already
        # filters them); a null ARRAY contributes no itemsets either
        items = F.array_sort(
            F.array_distinct(
                F.coalesce(
                    F.filter(as_arr, lambda x: x.isNotNull()),
                    F.array().cast(
                        "array<string>"
                        if not isinstance(dt, T.ArrayType)
                        or isinstance(dt.elementType, T.StringType)
                        else f"array<{dt.elementType.simpleString()}>"
                    ),
                )
            )
        )
    else:
        # multiple fields: an item is the (field, value) pair — ES's
        # multi-field Eclat domain — rendered "field=value" so itemsets
        # stay one sortable array<string>; scalar fields contribute one
        # item, array fields each element.  Still per-document Column
        # math, same single exploded aggregation as the one-field path.
        def _tagger(fname: str):
            # closure factory, NOT a default-arg lambda: F.transform
            # dispatches on callable arity, so a 2-param lambda would be
            # called as (element, index)
            return lambda x: F.concat(F.lit(fname + "="), x.cast("string"))

        per_field = []
        for fs in fields:
            fname = fs["field"]
            col = F.col(fname)
            dt = df.schema[fname].dataType
            as_arr = col if isinstance(dt, T.ArrayType) else F.array(col)
            tagged = F.transform(
                F.filter(as_arr, lambda x: x.isNotNull()), _tagger(fname)
            )
            # a NULL array column must contribute no items, not null the
            # whole concat
            per_field.append(
                F.coalesce(tagged, F.array().cast("array<string>"))
            )
        combined = per_field[0]
        for p in per_field[1:]:
            combined = F.concat(combined, p)
        items = F.array_sort(F.array_distinct(combined))
    sets = []
    if min_set <= 1:
        sets.append(F.transform(items, lambda x: F.array(x)))
    if max_set >= 2:
        sets.append(
            F.flatten(
                F.transform(
                    items,
                    lambda x, i: F.transform(
                        F.slice(items, i + 2, F.greatest(F.size(items), F.lit(1))),
                        lambda y: F.array(x, y),
                    ),
                )
            )
        )
    exploded = df.select(
        F.explode(F.concat(*sets) if len(sets) > 1 else sets[0]).alias("__set")
    )
    out = (
        exploded.groupBy(F.col("__set").alias(name))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .withColumn("support", F.col("doc_count") / F.lit(float(total)))
        .filter(F.col("support") >= min_support)
        .withColumn("set_size", F.size(F.col(name)))
    )
    return (
        out.select(name, "set_size", "doc_count", "support")
        .orderBy(F.col("doc_count").desc(), F.col(name).asc())
        .limit(size)
    )


def categorize_key(col: Column, max_tokens: int | None = None) -> Column:
    """THE category-key expression — a message's sequence of
    variable-free tokens (tokens carrying a digit drop whole, the
    ml_standard tokenizer's "discard variable parts" heuristic),
    space-joined; NULL in -> NULL out.  Shared by the categorize_text
    agg and ES|QL's ``STATS .. BY CATEGORIZE(field)`` so a category key
    means the same thing on both surfaces.  Pure codegen."""
    tokens = F.filter(
        F.split(F.lower(col), r"[^a-z0-9_.\-]+"),
        lambda t: (t != "") & ~t.rlike(r"\d"),
    )
    if max_tokens is not None:
        tokens = F.slice(tokens, 1, int(max_tokens))
    # concat_ws never returns NULL — gate explicitly so a NULL message
    # stays a NULL category (ES groups them under null, not "")
    return F.when(col.isNotNull(), F.concat_ws(" ", tokens))


def _categorize_text(df: DataFrame, name: str, spec: dict) -> DataFrame:
    """ES categorize_text — the deterministic subset: a message's
    category is its sequence of variable-free tokens (tokens carrying a
    digit are dropped, exactly the ml_standard tokenizer's "discard
    variable parts" heuristic), space-joined; buckets count docs per
    category, most-frequent first.  ES's full implementation merges
    near-identical categories with a Drain-style similarity tree — a
    heuristic, non-deterministic-across-shards step this engine replaces
    with the exact token-sequence key (documented deviation: categories
    that differ only in a rare stable token stay separate here).  One
    codegen projection + one hash aggregation; no Python in the row
    path.  ``max_matched_tokens`` caps the key's token count like ES
    (default unlimited); ``size`` bounds the response."""
    field = spec["field"]
    size = int(spec.get("size", 10))
    max_tokens = spec.get("max_matched_tokens")
    # hyphens/dots stay inside tokens so "node-1"/"10.0.0.1" are single
    # variable tokens that drop whole, like the ml_standard tokenizer
    # (categorize_key, shared with ES|QL CATEGORIZE)
    key = categorize_key(
        F.col(field), int(max_tokens) if max_tokens is not None else None
    )
    return (
        df.filter(F.col(field).isNotNull())
        .groupBy(key.alias(name))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col(name) != "")
        .orderBy(F.col("doc_count").desc(), F.col(name).asc())
        .limit(size)
    )


def _rare_terms(df: DataFrame, name: str, spec: dict) -> DataFrame:
    """ES rare_terms: the long tail — terms with doc_count <=
    max_doc_count, ascending count (rarest first).  One hash aggregation
    + TakeOrderedAndProject."""
    field = spec["field"]
    max_dc = int(spec.get("max_doc_count", 1))
    size = int(spec.get("size", 100))
    return (
        df.groupBy(F.col(field).alias(name))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") <= max_dc)
        .orderBy(F.col("doc_count").asc(), name)
        .limit(size)
    )


def _pack_geotile_after(name: str, value) -> int:
    """A geotile composite after-value "z/x/y" -> ES's packed long
    ((z<<58)|(x<<29)|y) — the numeric the cursor actually resumes on.
    Loud on malformed keys: a silently mis-parsed cursor would skip or
    repeat buckets."""
    try:
        z, x, y = (int(p) for p in str(value).split("/"))
    except ValueError:
        raise AggsDslError(
            f"composite {name!r}: geotile after value must be 'z/x/y', "
            f"got {value!r}"
        ) from None
    if not (0 <= z <= 29 and 0 <= x < (1 << z) and 0 <= y < (1 << z)):
        raise AggsDslError(
            f"composite {name!r}: geotile after value {value!r} out of range"
        )
    return (z << 58) | (x << 29) | y


def _after_key_gt(key_names: list[str], after: dict) -> Column:
    """Lexicographic (k1..kn) > (a1..an): the composite `after` cursor —
    the ascending special case of search.lexicographic_after (one shared
    implementation of the OR/AND-prefix construction).  Null after-values
    are not supported (ES encodes them specially)."""
    from elasticsearch_hadoop_spark.search import lexicographic_after

    missing = [kn for kn in key_names if kn not in after]
    if missing:
        raise AggsDslError(f"composite after-key missing source {missing[0]!r}")
    return lexicographic_after(
        [(kn, True) for kn in key_names], [after[kn] for kn in key_names]
    )


def _range_whens(value: Column, ranges: list, lit) -> Column:
    """Shared range-family bucketing: half-open [from, to) rings with
    ES's "<from>-<to>" default labels ('*' for an open end) or explicit
    ``key``s, rendered as one when-chain (first matching range wins —
    ES ranges are disjoint by construction)."""
    whens = None
    for r in ranges:
        lo, hi = r.get("from"), r.get("to")
        label = r.get("key") or (
            f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        )
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (value >= lit(lo))
        if hi is not None:
            cond = cond & (value < lit(hi))
        whens = (
            F.when(cond, F.lit(label)) if whens is None else whens.when(cond, F.lit(label))
        )
    return whens


def _bucket_key(kind: str, b: dict) -> Column:
    if kind == "multi_terms":
        # ES multi_terms: one bucket per distinct field-value TUPLE; the
        # flat rendering uses the "|"-joined key_as_string ES itself emits.
        fields = [t["field"] for t in b.get("terms", [])]
        if len(fields) < 2:
            raise AggsDslError("multi_terms needs >= 2 terms sources")
        return F.concat_ws("|", *[F.col(f).cast("string") for f in fields])
    field = F.col(b["field"])
    if kind == "terms":
        # ES `missing`: docs without the field bucket under a default key
        # instead of dropping into a NULL bucket
        if "missing" in b:
            return F.coalesce(field, F.lit(b["missing"]))
        return field
    if kind == "histogram":
        interval = float(b["interval"])
        # ES `offset`: shift bucket boundaries by a constant before
        # flooring (floor((v - offset)/i)*i + offset)
        off = float(b.get("offset", 0.0))
        return (
            F.floor((field - F.lit(off)) / F.lit(interval)) * F.lit(interval)
            + F.lit(off)
        ).cast("double")
    if kind == "date_histogram":
        if "calendar_interval" in b:
            if "offset" in b:
                raise AggsDslError(
                    "date_histogram offset supports fixed_interval only"
                )
            unit = _CALENDAR.get(b["calendar_interval"])
            if unit is None:
                raise AggsDslError(f"calendar_interval {b['calendar_interval']!r}")
            return F.date_trunc(unit, field)
        iv = str(b["fixed_interval"]).strip()
        secs = int(iv[:-1]) * _FIXED_SECONDS[iv[-1]]
        off_secs = 0
        if "offset" in b:
            ov = str(b["offset"]).strip()
            sign = -1 if ov.startswith("-") else 1
            ov = ov.lstrip("+-")
            off_secs = sign * int(ov[:-1]) * _FIXED_SECONDS[ov[-1]]
        epoch = F.unix_timestamp(field) - off_secs
        return F.timestamp_seconds(F.floor(epoch / secs) * secs + off_secs)
    if kind in ("geo_distance", "range", "date_range") and not b.get("ranges"):
        raise AggsDslError(f"{kind} needs a non-empty ranges: [...] list")
    if kind == "geo_distance":
        # ES geo_distance agg: distance-ring buckets from an origin point
        # over a struct(lat, lon) geo_point field.  Arc (haversine)
        # distance like ES's default; `unit` scales the ring bounds
        # (default meters, ES's default).  The key label follows the
        # range agg's "<from>-<to>" convention with the same '*' ends.
        # Pure Column math — the distance expression is shared with the
        # geo_distance query filter, and the ring key can double as a
        # partition column at scale.
        from elasticsearch_hadoop_spark.functions.geo import haversine_km

        origin = b.get("origin")
        if not isinstance(origin, dict) or "lat" not in origin or "lon" not in origin:
            raise AggsDslError("geo_distance needs origin: {lat, lon}")
        unit_km = {"m": 0.001, "km": 1.0, "mi": 1.609344}.get(b.get("unit", "m"))
        if unit_km is None:
            raise AggsDslError(f"geo_distance unit {b['unit']!r} (want m/km/mi)")
        # the when-chain reads `dist` up to 2x per ring, but the trig is
        # pure codegen where subexpression elimination computes it once; a
        # let_bind would demote it to an interpreted HOF (CodegenFallback)
        dist = haversine_km(
            F.col(f"{b['field']}.lat"),
            F.col(f"{b['field']}.lon"),
            F.lit(float(origin["lat"])),
            F.lit(float(origin["lon"])),
        ) / F.lit(unit_km)
        return _range_whens(dist, b["ranges"], lambda v: F.lit(float(v)))
    if kind in ("range", "date_range"):
        # date_range is range with from/to parsed as timestamps (ES also
        # allows date-math like "now-1d" — not supported, literals only)
        lit = (lambda v: F.to_timestamp(F.lit(v))) if kind == "date_range" else F.lit
        # docs outside every range -> NULL bucket, filtered by ES; we keep NULL
        return _range_whens(field, b["ranges"], lit)
    if kind == "ip_prefix":
        # ES ip_prefix: bucket by the network address at `prefix_length`
        # bits.  IPv4 only (same limit as ip_range); the address parses to
        # a 32-bit int and masks with shiftright/shiftleft — all codegen,
        # and the network key doubles as a partition column at scale.
        # `append_prefix_length` suffixes "/n" like ES.
        if b.get("is_ipv6"):
            raise AggsDslError("ip_prefix: IPv6 unsupported")
        n_bits = int(b["prefix_length"])
        if not 0 <= n_bits <= 32:
            raise AggsDslError(f"ip_prefix prefix_length {n_bits} out of range 0..32")
        # `net` is textually inlined once per octet, but this expression is
        # pure codegen where subexpression elimination computes it once; a
        # let_bind would demote it to an interpreted HOF (CodegenFallback)
        net = F.shiftleft(F.shiftright(_ipv4_to_long(field), 32 - n_bits), 32 - n_bits)
        quad = F.concat_ws(
            ".",
            *[
                F.shiftright(net, s).bitwiseAND(F.lit(255)).cast("string")
                for s in (24, 16, 8, 0)
            ],
        )
        if b.get("append_prefix_length"):
            quad = F.concat(quad, F.lit(f"/{n_bits}"))
        return quad
    if kind == "geotile_grid":
        # Web-Mercator slippy tile "z/x/y" at `precision` zoom (ES
        # geotile_grid keys).  asinh(tan φ) written as ln(tan φ + sec φ)
        # so Spark and the DuckDB oracle share the exact expression; lat
        # clamped to the Mercator domain like ES.  `field` names a
        # struct(lat, lon) geo_point column.  Pure codegen — at scale the
        # tile key doubles as a partition/bucket column for geo locality.
        from elasticsearch_hadoop_spark.functions.geo import geotile_cell_xy

        z = int(b.get("precision", 7))
        # shared single-source tile arithmetic (edge clamps included) —
        # keeps these buckets bit-identical to the _mvt grid layer
        x, y = geotile_cell_xy(
            F.col(f"{b['field']}.lat"), F.col(f"{b['field']}.lon"), z
        )
        return F.concat_ws("/", F.lit(str(z)), x.cast("string"), y.cast("string"))
    if kind == "geohash_grid":
        # classic base32 geohash at `precision` chars: equirectangular
        # lat/lon quantization, bit-interleaved lon-first, 5 bits per
        # char.  All integer Column math (shiftleft/bitwiseAND), so the
        # DuckDB oracle reproduces it exactly; same partition-column
        # scale story as geotile_grid.
        p = int(b.get("precision", 5))
        if not 1 <= p <= 12:
            raise AggsDslError(f"geohash precision {p} out of range 1..12")
        total_bits = 5 * p
        lon_bits = (total_bits + 1) // 2
        lat_bits = total_bits // 2
        lat = F.col(f"{b['field']}.lat")
        lon = F.col(f"{b['field']}.lon")
        # clamp BOTH ends: out-of-domain coords (bad data) must land in an
        # edge cell, not interleave a negative index's two's-complement bits
        x = F.greatest(
            F.least(
                F.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)),
                F.lit((1 << lon_bits) - 1),
            ),
            F.lit(0),
        ).cast("long")
        y = F.greatest(
            F.least(
                F.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)),
                F.lit((1 << lat_bits) - 1),
            ),
            F.lit(0),
        ).cast("long")
        v = F.lit(0).cast("long")
        for i in range(lon_bits):  # lon bit i (MSB first) -> even position
            bit = (x.bitwiseAND(F.lit(1 << (lon_bits - 1 - i))) > 0).cast("long")
            v = v + F.shiftleft(bit, total_bits - 1 - 2 * i)
        for i in range(lat_bits):  # lat bit i -> odd position
            bit = (y.bitwiseAND(F.lit(1 << (lat_bits - 1 - i))) > 0).cast("long")
            v = v + F.shiftleft(bit, total_bits - 2 - 2 * i)
        alphabet = F.lit(list(GEOHASH_BASE32))
        chars = [
            F.get(alphabet, F.shiftright(v, 5 * (p - 1 - k)).bitwiseAND(F.lit(31)).cast("int"))
            for k in range(p)
        ]
        return F.concat(*chars)
    raise AggsDslError(kind)


def _metric(
    name: str, body: dict, sample_scale: float | None = None
) -> list[Column]:
    """One metric agg -> its output Column(s).  ``sample_scale`` is set
    when an enclosing random_sampler sampled the frame: count-like values
    (sum / value_count, stats count+sum) scale back up by 1/probability;
    location metrics (avg/min/max/percentiles/cardinality) estimate the
    population directly and stay unscaled — ES's scaling model."""
    (kind, spec), = body.items()
    if kind == "weighted_avg":
        # ES spells this {"value": {"field": v}, "weight": {"field": w}} —
        # no top-level field.  A doc missing EITHER field is skipped
        # entirely (ES's default missing behavior): both sums must gate on
        # the pair, else a null-value doc's weight still inflates the
        # denominator.
        try:
            v = F.col(spec["value"]["field"])
            w = F.col(spec["weight"]["field"])
        except (KeyError, TypeError):
            raise AggsDslError(
                f"weighted_avg {name!r}: expected value.field + weight.field"
            ) from None
        both = v.isNotNull() & w.isNotNull()
        num = F.sum(F.when(both, v * w))
        den = F.sum(F.when(both, w))
        return [(num / den).alias(name)]
    if kind == "top_metrics":
        # ES top_metrics: metric values read off the single doc ranked
        # first by `sort`.  size=1 only (the flat rendering has one row
        # per bucket).  Ties on the sort field break by the metric value
        # itself (max for desc, min for asc) — deterministic, where ES's
        # tie is shard-order.  Compiles to max_by/min_by over a
        # (sort, metric) struct: single-pass, partial-aggregatable.
        sort = spec.get("sort")
        if not isinstance(sort, dict) or len(sort) != 1:
            raise AggsDslError(f"top_metrics {name!r}: sort must be {{field: dir}}")
        if int(spec.get("size", 1)) != 1:
            raise AggsDslError(f"top_metrics {name!r}: only size=1 is supported")
        (sfield, sdir), = sort.items()
        desc = str(sdir).lower() == "desc"
        s = F.col(sfield)
        mlist = spec.get("metrics")
        if isinstance(mlist, dict):
            mlist = [mlist]
        if not mlist:
            raise AggsDslError(f"top_metrics {name!r}: needs metrics: [{{field}}]")
        pick = F.max_by if desc else F.min_by
        cols = [
            pick(F.col(m["field"]), F.struct(s, F.col(m["field"]))).alias(
                f"{name}_{m['field']}"
            )
            for m in mlist
        ]
        cols.append((F.max(s) if desc else F.min(s)).alias(f"{name}_sort"))
        return cols
    if kind == "t_test":
        # ES t_test in its three types.  Deviation (documented): emits the
        # t STATISTIC, not ES's p-value — the Student-t CDF is not Column
        # math; the statistic is the deterministic, partially-aggregatable
        # part and converts to a p-value client-side with n_a/n_b in hand.
        try:
            a = F.col(spec["a"]["field"])
            b = F.col(spec["b"]["field"])
        except (KeyError, TypeError):
            raise AggsDslError(
                f"t_test {name!r}: expected a.field + b.field"
            ) from None
        ttype = spec.get("type", "heteroscedastic")
        if ttype == "paired":
            both = a.isNotNull() & b.isNotNull()
            d = F.when(both, a - b)
            t = F.avg(d) / (F.stddev_samp(d) / F.sqrt(F.count(d)))
            return [t.alias(name)]
        na, nb = F.count(a), F.count(b)
        ma, mb = F.avg(a), F.avg(b)
        va, vb = F.var_samp(a), F.var_samp(b)
        if ttype == "heteroscedastic":  # Welch, the ES default
            t = (ma - mb) / F.sqrt(va / na + vb / nb)
        elif ttype == "homoscedastic":  # pooled variance
            sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
            t = (ma - mb) / F.sqrt(sp2 * (F.lit(1.0) / na + F.lit(1.0) / nb))
        else:
            raise AggsDslError(f"t_test {name!r}: unknown type {ttype!r}")
        return [t.alias(name)]
    if kind == "matrix_stats":
        # ES matrix_stats over >= 2 numeric fields: doc count, per-field
        # mean/variance, pairwise covariance/correlation.  ES drops docs
        # missing ANY of the fields (row-wise complete observations) — the
        # `complete` gate mirrors that exactly.  Skewness/kurtosis omitted
        # (sample-correction conventions differ per engine; documented).
        fields = spec.get("fields")
        if not isinstance(fields, list) or len(fields) < 2:
            raise AggsDslError(f"matrix_stats {name!r}: needs fields: [f1, f2, ...]")
        complete = F.lit(True)
        for f in fields:
            complete = complete & F.col(f).isNotNull()
        gated = {f: F.when(complete, F.col(f)) for f in fields}
        cols = [F.count(F.when(complete, F.lit(1))).alias(f"{name}_count")]
        for f in fields:
            cols.append(F.avg(gated[f]).alias(f"{name}_{f}_mean"))
            cols.append(F.var_samp(gated[f]).alias(f"{name}_{f}_variance"))
        for i, fa in enumerate(fields):
            for fb in fields[i + 1 :]:
                cols.append(
                    F.covar_samp(gated[fa], gated[fb]).alias(
                        f"{name}_{fa}_{fb}_covariance"
                    )
                )
                cols.append(
                    F.corr(gated[fa], gated[fb]).alias(f"{name}_{fa}_{fb}_correlation")
                )
        return cols
    # (geo_line is intercepted in compile_aggs' level walk — it needs the
    # bounded-carry window pre-pass over the key chain, not a plain
    # metric column; see the geo_lines block there)
    if kind == "scripted_metric":
        # ES scripted_metric, the distributable accumulate subset: ONE
        # state variable, `init` sets it to 0, `map` does
        # `state.<v> += <expr>` (expr in the painless-lite expression
        # language runtime_fields.compile_script accepts), `combine`
        # returns the state, `reduce` sums the per-shard states.  That
        # contract IS a partial-aggregatable SUM, so it compiles to
        # F.sum(expr) — map-side combine, one shuffle, like every other
        # metric.  Scripts outside the subset raise (no silent
        # approximation of arbitrary painless state machines — ES itself
        # warns scripted_metric does not scale; the subset is the part
        # that does).
        from .runtime_fields import compile_script

        init = str(spec.get("init_script", "")).strip()
        map_s = str(spec.get("map_script", "")).strip()
        combine = str(spec.get("combine_script", "")).strip()
        reduce_s = str(spec.get("reduce_script", "")).strip()
        mi = re.match(r"^state\.(\w+)\s*=\s*0(?:\.0)?\s*;?$", init)
        mm = re.match(r"^state\.(\w+)\s*\+=\s*(.+?)\s*;?$", map_s, flags=re.S)
        if not mi or not mm or mi.group(1) != mm.group(1):
            raise AggsDslError(
                f"scripted_metric {name!r}: supported form is init "
                "'state.v = 0' + map 'state.v += <expr>'"
            )
        var = mi.group(1)
        if combine and not re.match(
            rf"^(?:return\s+)?state\.{var}\s*;?$", combine
        ):
            raise AggsDslError(
                f"scripted_metric {name!r}: combine must return state.{var}"
            )
        if reduce_s and "sum" not in reduce_s and "+=" not in reduce_s:
            raise AggsDslError(
                f"scripted_metric {name!r}: reduce must sum the states "
                "(states.stream()...sum() or an accumulation loop)"
            )
        expr = compile_script(f"emit({mm.group(2)})")
        return [F.sum(expr).alias(name)]
    if not isinstance(spec, dict) or "field" not in spec:
        raise AggsDslError(f"metric {name!r}: expected {{'field': ...}}, got {spec!r}")
    field = spec["field"]
    approx = bool(spec.get("approximate", False))
    c = F.col(field)
    scale = sample_scale if sample_scale not in (None, 1.0) else None
    if kind == "avg":
        return [F.avg(c).alias(name)]
    if kind == "sum":
        s = F.sum(c)
        return [(s * scale if scale else s).alias(name)]
    if kind == "min":
        return [F.min(c).alias(name)]
    if kind == "max":
        return [F.max(c).alias(name)]
    if kind == "value_count":
        n = F.count(c)
        if scale:
            n = F.round(n * scale, 0).cast("long")
        return [n.alias(name)]
    if kind == "cardinality":
        agg = F.approx_count_distinct(c) if approx else F.countDistinct(c)
        return [agg.alias(name)]
    if kind == "stats":
        cnt, total = F.count(c), F.sum(c)
        if scale:
            cnt = F.round(cnt * scale, 0).cast("long")
            total = total * scale
        return [
            cnt.alias(f"{name}_count"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            total.alias(f"{name}_sum"),
        ]
    if kind == "extended_stats":
        # stats + sum_of_squares / variance / std_deviation (population,
        # ES's default); all single-pass partial-aggregatable.  Under
        # random_sampler the count-like values (count/sum/sum_of_squares)
        # scale like the stats sibling; variance/std are dispersion
        # estimates and stay unscaled.
        cnt, total, sq = F.count(c), F.sum(c), F.sum(c * c)
        if scale:
            cnt = F.round(cnt * scale, 0).cast("long")
            total, sq = total * scale, sq * scale
        return [
            cnt.alias(f"{name}_count"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            total.alias(f"{name}_sum"),
            sq.alias(f"{name}_sum_of_squares"),
            F.var_pop(c).alias(f"{name}_variance"),
            F.stddev_pop(c).alias(f"{name}_std_deviation"),
        ]
    if kind == "percentiles":
        pcts = [float(p) for p in spec.get("percents", (1, 5, 25, 50, 75, 95, 99))]
        if approx:
            arr = F.percentile_approx(c, [p / 100.0 for p in pcts], 10000)
        else:
            arr = F.percentile(c, F.array(*[F.lit(p / 100.0) for p in pcts]))
        return [arr[i].alias(f"{name}_{_pname(p)}") for i, p in enumerate(pcts)]
    if kind == "boxplot":
        # ES boxplot: min/q1/q2/q3/max.  Exact interpolated percentile by
        # default (one sort per group for all three quartiles — a single
        # array-argument percentile); "approximate": true -> TDigest-like
        # percentile_approx, matching the percentiles metric's convention.
        if approx:
            qs = F.percentile_approx(c, [0.25, 0.5, 0.75], 10000)
        else:
            qs = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        return [
            F.min(c).alias(f"{name}_min"),
            qs[0].alias(f"{name}_q1"),
            qs[1].alias(f"{name}_q2"),
            qs[2].alias(f"{name}_q3"),
            F.max(c).alias(f"{name}_max"),
        ]
    if kind == "string_stats":
        # ES string_stats: count + length min/max/avg.  (ES also returns a
        # Shannon entropy; that needs a per-bucket character distribution —
        # out of scope for the flat single-pass rendering, documented.)
        ln = F.length(c)
        return [
            F.count(c).alias(f"{name}_count"),
            F.min(ln).alias(f"{name}_min_length"),
            F.max(ln).alias(f"{name}_max_length"),
            F.avg(ln).alias(f"{name}_avg_length"),
        ]
    if kind == "geo_bounds":
        # ES geo_bounds over a struct(lat, lon) geo_point column: the
        # tightest box containing all points.  wrap_longitude (antimeridian
        # crossing) is unsupported — bounds are plain min/max (documented).
        lat, lon = F.col(f"{field}.lat"), F.col(f"{field}.lon")
        return [
            F.max(lat).alias(f"{name}_top"),
            F.min(lat).alias(f"{name}_bottom"),
            F.min(lon).alias(f"{name}_left"),
            F.max(lon).alias(f"{name}_right"),
        ]
    if kind == "geo_centroid":
        # ES geo_centroid: arithmetic mean of coordinates + point count,
        # skipping docs missing either coordinate.
        lat, lon = F.col(f"{field}.lat"), F.col(f"{field}.lon")
        both = lat.isNotNull() & lon.isNotNull()
        return [
            F.avg(F.when(both, lat)).alias(f"{name}_lat"),
            F.avg(F.when(both, lon)).alias(f"{name}_lon"),
            F.count(F.when(both, F.lit(1))).alias(f"{name}_count"),
        ]
    if kind == "percentile_ranks":
        # inverse percentiles: % of non-null docs with value <= v (the
        # exact CDF — ES's TDigest approximates the same quantity).  The
        # two-armed when leaves nulls null so avg() skips them, exactly
        # like every other metric's missing handling.
        vals = [float(v) for v in spec.get("values", [])]
        if not vals:
            raise AggsDslError(f"percentile_ranks {name!r} needs values: [...]")
        return [
            (
                F.avg(F.when(c <= F.lit(v), 1.0).when(c > F.lit(v), 0.0)) * 100
            ).alias(f"{name}_{_pname(v)}")
            for v in vals
        ]
    raise AggsDslError(f"unsupported metric agg: {kind}")


def _pname(p: float) -> str:
    return str(int(p)) if float(p).is_integer() else str(p).replace(".", "_")
