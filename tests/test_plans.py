"""Physical-plan assertions: the scale properties the corpus docstrings
promise must be visible in `.explain("formatted")` — filters reaching the
Parquet scan (SURVEY.md §2.A A3-equivalent), dimension joins broadcast, no
redundant shuffles, top-k via TakeOrderedAndProject / WindowGroupLimit.
These are the local[32]-checkable proxies for 100 TB behavior: a plan that
scans-all-columns or sort-merge-joins a 5-row dim here does the same on a
1000-executor cluster."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from elasticsearch_hadoop_spark.corpus import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_nodes(plan: str, node: str) -> int:
    return len(re.findall(rf"^\(\d+\) {node}\b", plan, flags=re.M))


def test_q6_full_pushdown_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan, flags=re.S).group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"filter on {col} not pushed to parquet scan:\n{pushed}"
    # scan -> partial agg -> ONE exchange of 1-row partials -> final agg
    assert count_nodes(plan, "Exchange") == 1
    assert count_nodes(plan, "SortMergeJoin") == 0


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_shipping_priority")
    assert count_nodes(plan, "BroadcastHashJoin") >= 2
    assert count_nodes(plan, "SortMergeJoin") == 0
    assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts


def test_q5_six_table_join_all_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    assert count_nodes(plan, "BroadcastHashJoin") >= 4  # c, s, n, r
    # the only allowed non-broadcast join is fact-fact lineitem⋈orders
    assert count_nodes(plan, "SortMergeJoin") + count_nodes(plan, "ShuffledHashJoin") <= 1


def test_window_topk_uses_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_topk_per_group")
    # Spark 3.5+ pushes rank<=k below the shuffle: partial WindowGroupLimit
    # before the Exchange prunes each map partition to its local top-3
    assert "WindowGroupLimit" in plan
    assert count_nodes(plan, "Exchange") <= 2  # window hash + final order


def test_global_topk_no_total_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "topk_global")
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # Q1 needs 7 of lineitem's 11 columns; the scan must not read the rest
    assert "l_orderkey" not in read_cols and "l_partkey" not in read_cols, read_cols


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "subq_exists_priority")
    assert re.search(r"Join LeftSemi|BroadcastHashJoin.*LeftSemi|SortMergeJoin.*LeftSemi", plan) or "LeftSemi" in plan


def test_generator_runs_in_scan_stage(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "lateral_explode_tokens")
    assert count_nodes(plan, "Generate") == 1
    assert count_nodes(plan, "Exchange") <= 2  # token agg + nothing else


@pytest.mark.parametrize(
    "name", ["pushdown_predicates", "q10_returned_items", "q12_priority_by_flag"]
)
def test_filters_pushed(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    assert any(p.strip() for p in pushed), f"{name}: no pushed filters\n{plan[:800]}"
