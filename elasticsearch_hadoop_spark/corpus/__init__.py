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
# (the first 50 queries, observed every round).  Rounds 1-4 banked a green
# verdict for 167 queries; the graded window is the scarce resource.
# Round-5 policy (VERDICT.md round-4 item 1): 85 never-graded queries
# exceed the window for the first time, so ALL 50 slots go to
# never-graded surfaces, highest-risk families first in the verdict's
# stated order — the 10 multi-commit write-path catalog surfaces, the
# ES|QL compiler (zero hard signal), parent-child joins, ingest/enrich
# pipelines, transforms/EQL, the span family + query-string parser (the
# let-binding rewrite changed their evaluation paths), the
# suggest/fusion/rank_eval search surfaces, the text/LLM quality family
# (unigram_logprob's total-attachment was rewritten this round — these
# four double as drift insurance for that change), and one late aggs-DSL
# representative (that compiler already holds 13 greens from r4).
# Overflow to round 6 (35): 27 late aggs_* compilers, decay_score,
# phrase_slop, mget, msearch, template_page, analyze_api, termvectors,
# sample_to_mixture — all re-validated against their oracles every run
# by tests/test_oracle_parity.py in the meantime.  No banked-green
# re-grades this round: VERDICT r4 item 7 allots them "leftover slots"
# only, and there are none.
PRIORITY: tuple[str, ...] = (
    # write-path catalog surfaces: multi-commit paths, most moving parts
    "writepath_data_stream",
    "writepath_ccs",
    "writepath_index_template",
    "writepath_component_template",
    "writepath_percolate",
    "writepath_snapshot_restore",
    "writepath_rollover",
    "writepath_filtered_alias",
    "writepath_terms_lookup",
    "writepath_es_sql",
    # ES|QL compiler (a whole compiler with zero hard signal)
    "esql_stats_by",
    "esql_eval_pipeline",
    "esql_bucket_filtered_stats",
    "esql_grok_dissect",
    # parent-child joins
    "join_has_child",
    "join_has_parent_parent_id",
    # ingest pipelines + enrich
    "ingest_pipeline_docs",
    "ingest_pipeline_dissect",
    "ingest_pipeline_events",
    "ingest_enrich_events",
    # transforms + EQL
    "transform_pivot_monthly",
    "transform_latest_events",
    "eql_funnel_sequence",
    # query DSL: span family first (let-binding rewrite), then the
    # full-text parser surfaces
    "query_dsl_span_near",
    "query_dsl_span_first_not_or",
    "query_dsl_query_string",
    "query_dsl_intervals",
    "query_dsl_combined_fields",
    "query_dsl_multi_match",
    "query_dsl_dis_max_boosting",
    "query_dsl_terms_set",
    "query_dsl_sqs_phrase_prefix",
    "query_dsl_pinned_wrapper",
    "query_dsl_script_filter",
    "query_dsl_distance_feature",
    "query_dsl_more_like_this",
    # search surfaces: suggesters, fusion, rank_eval, knn, paging
    "search_suggest_completion",
    "search_suggest_phrase",
    "search_rank_eval",
    "search_sparse_vector",
    "search_rrf_hybrid",
    "search_linear_fuse",
    "search_knn_filtered",
    "search_rescore_window",
    "search_scroll_sliced",
    # text/LLM quality family (unigram_logprob path changed this round)
    "text_unigram_logprob",
    "text_quality_funnel",
    "text_c4_filters",
    "dedup_segments_global",
    # late aggs-DSL representative
    "aggs_change_point",
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
        ingest_queries,
        joins,
        knn_search_queries,
        lateral_ops,
        multimodal,
        packing,
        pushdown,
        sampling,
        scalar_functions,
        search_surface,
        similarity,
        streaming_batch,
        streaming_live,
        subqueries,
        text_analysis,
        tpch_full,
        transform_eql,
        tpch_more,
        udf_surface,
        windows,
        write_path,
    )

    ordered = {name: REGISTRY[name] for name in PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
