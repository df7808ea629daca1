"""The driver grades a bounded prefix of the registration order (the
first 50 queries, every round).  These tests pin the PRIORITY reorder in
corpus/__init__.py under the round-13 window policy: the round-13
net-new surfaces lead, the changed-implementation re-grades follow (the
eight CHANGED_IMPL names below — their graded code was rewritten this
round, so the banked verdicts grade dead code), then the FIRST 40 of
the 47 r6-era stale verdicts fill the window (2 + 8 + 40 = 50); the 7
spilled r6 names (R6_SPILL) sit directly below the boundary and head
round 14's queue — the honest CHANGED_IMPL set outgrew the 3 slots the
round-12 plan budgeted (see corpus/__init__.py).  Every windowed query
carries a DuckDB oracle (no rows-only slots), and the union of banked
green verdicts with the current window still covers every §2.C
operator family.

ROUND-ROBUSTNESS (the r8 verdict's "What's wrong" #1): both the banked
set and the staleness scan derive from the SAME pinned round list —
the rounds that existed when this window was BUILT (r01-r12).  The
driver dropping the current round's CORRECTNESS artifact mid-round must
never change what these tests compute, so `itertools.count` scans over
"whatever files exist" are banned here."""

from __future__ import annotations

import json
import os
import re

from elasticsearch_hadoop_spark.corpus import PRIORITY, REGISTRY, load_all

GRADED_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# the verdict rounds that existed when the round-13 window was built;
# round 14 appends "13" when it rebuilds PRIORITY
BANKED_ROUNDS = (
    "01", "02", "03", "04", "05", "06", "07", "08", "09", "10", "11",
    "12",
)

# banked-green names whose IMPLEMENTATION changed since their latest
# verdict — they hold early re-grade slots ahead of staler names because
# the banked verdict graded code that no longer exists
CHANGED_IMPL = {
    # r13: _stats_ts dedupes identical (ts_fn, inner) aggregates through
    # the canon map (review r12g / VERDICT r12 item 2) — every TS query
    # routes through the rewritten series_aggs loop, INCLUDING
    # esql_ts_rate_subday whose verdict is only one round old
    "esql_ts_rate",
    "esql_ts_over_time",
    "esql_ts_stats_top",
    "esql_ts_rate_subday",
    # r13: the `?q=` grammar widening (VERDICT r12 item 4) rewrote
    # uri_query_parts (raw values) / uri_pair_clause (uri_leaf_kind
    # dispatch) — the filter veneer both these compile through
    "query_dsl_uri",
    "esql_fulltext_where",
    # r13: _qstr_score_leaves classifies leaf kinds and emits
    # constant-score (None-query) leaves; _where_scored turns them into
    # gated 1.0 contributions
    "esql_qstr_score",
    "esql_match_score_topk",
}

# the 7 r6-era names the round-13 window could NOT hold (2 net-new +
# 8 CHANGED_IMPL + 40 = 50): they sit directly below the boundary, in
# queue order, and head round 14's window
R6_SPILL = (
    "query_dsl_phrase_slop",
    "sample_to_mixture",
    "search_mget",
    "search_msearch",
    "search_template_page",
    "search_analyze_api",
    "search_termvectors",
)

# family -> regex over query names; each must match >=1 query with a driver
# verdict banked OR in the current graded window
FAMILIES = {
    "tpch": r"^q\d+_",
    "agg": r"^agg_",
    "topk": r"^topk_global$",
    "null_ordering": r"^order_nulls_explicit$",
    "sketch": r"^sketch_",
    "aggs_dsl": r"^aggs_",
    "dedup": r"^dedup_",
    "geo": r"^geo_",
    "join_outer": r"^join_full_outer$",
    "join_semi_anti": r"^join_semi_anti$",
    "join_cross": r"^join_cross$",
    "join_theta": r"^join_theta$",
    "join_range": r"^join_range_bucketed$",
    "join_asof": r"^join_asof$",
    "join_skew": r"^skew_salted_join$",
    "lateral": r"^(lateral_|map_entries)",
    "set_ops": r"^set_",
    "pivot": r"^(pivot_|unpivot_)",
    "multimodal": r"^multimodal_",
    "pushdown": r"^pushdown_",
    "query_dsl": r"^query_dsl_",
    "scalar_fn": r"^fn_",
    "window": r"^window_",
    "subquery": r"^subq_",
    "stream_batch": r"^stream_(tumbling|sliding|session|event)",
    "stream_live": r"^stream_live_",
    "text": r"^text_",
    "similarity": r"^similarity_",
    "udf": r"^(udf_|udaf_|udtf_)",
    "sampling": r"^sample_",
    "write_path": r"^writepath_",
    "relevance": r"^search_bm25_",
}


def _verdicts() -> dict[str, int]:
    """query -> latest green round, over the PINNED round list only."""
    last: dict[str, int] = {}
    for r in BANKED_ROUNDS:
        path = os.path.join(REPO, f"CORRECTNESS_r{r}.json")
        if not os.path.exists(path):
            continue
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                last[name] = int(r)
    return last


def _banked_green() -> set[str]:
    return set(_verdicts())


def test_priority_names_all_registered():
    reg = load_all()
    missing = [n for n in PRIORITY if n not in reg]
    assert not missing, f"PRIORITY names not in registry: {missing}"


def test_reorder_is_a_permutation():
    ordered = load_all()
    assert len(ordered) == len(REGISTRY)
    assert set(ordered) == set(REGISTRY)
    assert list(ordered)[: len(PRIORITY)] == list(PRIORITY)


def test_window_has_no_rows_only_slots():
    """Every graded slot must carry an oracle — a rows-only query in the
    window wastes a verdict (round-2's one non-green row)."""
    reg = load_all()
    first = list(reg)[:GRADED_WINDOW]
    missing = [n for n in first if not reg[n].oracle]
    assert not missing, f"rows-only queries inside the graded window: {missing}"


def test_never_graded_overflow_only_when_window_saturated():
    """Round-4 policy (amended late in the round): never-graded queries
    fill the window first.  When they OUTNUMBER the slots, overflow to
    the next round is allowed — but only once banked-green slots are
    trimmed to the drift-insurance minimum (3, VERDICT r3 item 2).  A
    never-graded query outside the window while a 4th banked green holds
    a slot wastes the scarce verdict."""
    banked = _banked_green()
    reg = load_all()
    window = list(reg)[:GRADED_WINDOW]
    left_out = [n for n in reg if n not in banked and n not in set(window)]
    banked_in_window = [n for n in window if n in banked]
    if left_out:
        assert len(banked_in_window) <= 3, (
            f"never-graded {left_out} outside the window while "
            f"{len(banked_in_window)} banked greens occupy slots"
        )


def test_never_graded_sort_before_regrades():
    """Inside the window, never-graded queries come first: if the driver
    ever grades fewer than 50, the fresh surfaces win over re-grades."""
    banked = _banked_green()
    first = list(load_all())[:GRADED_WINDOW]
    seen_banked = False
    for n in first:
        if n in banked:
            seen_banked = True
        else:
            assert not seen_banked, (
                f"never-graded {n!r} sorts after a banked-green re-grade"
            )


def test_every_family_covered_by_union():
    """Union coverage: each §2.C family has >=1 query that is either
    banked green or inside the current graded window."""
    covered = _banked_green() | set(list(load_all())[:GRADED_WINDOW])
    uncovered = [
        fam for fam, pat in FAMILIES.items() if not any(re.search(pat, n) for n in covered)
    ]
    assert not uncovered, f"families with no driver signal past or pending: {uncovered}"


def test_round13_window_policy():
    """Round-13 policy (VERDICT r12 'Next round' items 1/2/4): the
    net-new surfaces lead, the changed-implementation re-grades follow,
    every never-graded query holds a slot, the r6-era stale verdicts
    fill every remaining slot with EXACTLY the R6_SPILL names left over
    (sitting first below the boundary, heading round 14's queue), and
    the final fill takes only the oldest vintage (no fresher verdict
    holds a re-grade slot while an older one waits — CHANGED_IMPL names
    exempt, their banked verdicts grade dead code).  Everything derives
    from the PINNED BANKED_ROUNDS list, so the driver landing
    CORRECTNESS_r13.json cannot change the outcome."""
    reg = load_all()
    names = list(reg)
    first = names[:GRADED_WINDOW]
    last = _verdicts()
    banked = set(last)

    # 1. no never-graded query left outside the window
    ungraded_outside = [n for n in reg if n not in banked and n not in set(first)]
    assert not ungraded_outside, (
        f"queries that would still lack a driver verdict after round 13: "
        f"{ungraded_outside}"
    )
    # 2. the changed-implementation re-grades hold slots
    missing_changed = sorted(CHANGED_IMPL - set(first))
    assert not missing_changed, (
        f"changed-implementation queries not being re-graded: {missing_changed}"
    )
    # 3. the r6-era stale verdicts fill the window up to exactly the
    # documented spill — no eighth name silently drops, no spilled name
    # silently holds a slot a staler one needed
    stale_r6 = {n for n, r in last.items() if r == 6 and n in reg}
    left_out = sorted(stale_r6 - set(first))
    assert left_out == sorted(R6_SPILL), (
        f"r6-era names outside the window != the documented spill: "
        f"{left_out} vs {sorted(R6_SPILL)}"
    )
    # 3b. the spill heads round 14's queue: directly below the boundary,
    # in queue order
    assert tuple(names[GRADED_WINDOW : GRADED_WINDOW + len(R6_SPILL)]) == R6_SPILL
    # 4. the banked re-grade slots target the stale end: no in-window
    # re-grade (changed-implementation names exempt) is FRESHER than a
    # banked name left outside the window
    in_window_banked = [n for n in first if n in banked and n not in CHANGED_IMPL]
    outside_banked = [n for n in reg if n in banked and n not in set(first)]
    if in_window_banked and outside_banked:
        assert max(last[n] for n in in_window_banked) <= min(
            last[n] for n in outside_banked
        ), (
            "a fresher verdict holds a re-grade slot while a staler one "
            "waits outside the window"
        )
