"""The t2 query corpus: every operator from SURVEY.md §2.C, as a named
(spark_query, duckdb_oracle_sql) pair.

``REGISTRY`` maps name -> QuerySpec.  ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over it.  Keeping the Spark code and the
oracle SQL adjacent is the point: the driver's harness hashes both sides
column-name-sorted, so aliases must agree exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The correctness driver grades a bounded prefix of the registration order
# (50 queries in round 1).  This list pins the first N slots so that every
# operator family from SURVEY.md §2.C — TPC-H, aggregates, sketches,
# aggs-DSL, dedup, geo, every join type, lateral, set ops, pivot,
# multimodal, pushdown, query-DSL, scalar fns, windows, subqueries,
# streaming (batch-checked + live), text analysis, similarity, UDF surface
# — has at least one representative inside the graded window.  Redundant
# same-family variants stay registered but sort after the cutoff.
PRIORITY: tuple[str, ...] = (
    # TPC-H headliners incl. the correlated-subquery quartet
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q20_potential_promotion",
    # aggregate surface (incl. bounds-asserted sketch twins)
    "agg_distinct_counts",
    "agg_approx_distinct",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_percentile_approx",
    "agg_stats",
    "agg_filtered_case",
    "agg_collect_set",
    "topk_global",
    "order_nulls_explicit",
    "sketch_hll_rollup_merge",
    "aggs_date_histogram_nested",
    # dedup battery (one per algorithm)
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "geo_distance_search",
    # one per join type (§2 items 15-21)
    "join_full_outer",
    "join_semi_anti",
    "join_cross",
    "join_theta",
    "join_range_bucketed",
    "join_asof",
    "skew_salted_join",
    "lateral_posexplode",
    "set_ops",
    "pivot_returnflag",
    "multimodal_resize",
    "pushdown_predicates",
    "pushdown_string_predicates",
    "query_dsl_bool",
    "fn_array",
    "fn_json",
    "window_topk_per_group",
    "window_ranking",
    "subq_correlated_scalar",
    "stream_session_window",
    "stream_live_dedup",
    "text_quality",
    "similarity_topk_brute",
    "similarity_ivf_topk",
    "udf_pandas_scalar",
    "udtf_bigrams",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every corpus module (side-effect: fills REGISTRY), then
    return it reordered: PRIORITY names first, the rest in module import
    order."""
    from elasticsearch_hadoop_spark.corpus import (  # noqa: F401
        aggregates,
        aggs_dsl_queries,
        dedup,
        geo,
        joins,
        lateral_ops,
        multimodal,
        pushdown,
        sampling,
        scalar_functions,
        similarity,
        streaming_batch,
        streaming_live,
        subqueries,
        text_analysis,
        tpch_full,
        tpch_more,
        udf_surface,
        windows,
    )

    ordered = {name: REGISTRY[name] for name in PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
