"""The driver grades a bounded prefix of the registration order (the
first 50 queries, every round).  These tests pin the PRIORITY reorder in
corpus/__init__.py under the round-12 window policy: the round-12
net-new surfaces lead, the changed-implementation re-grades follow (the
five CHANGED_IMPL names below — their graded code was rewritten this
round, so the banked verdicts grade dead code), then ALL 43 remaining
r5-era stale verdicts fill the window exactly (2 + 5 + 43 = 50; the r5
tail drains to zero, the r6-era queue starts below the boundary); every
windowed
query carries a DuckDB oracle (no rows-only slots), and the union of
banked green verdicts with the current window still covers every §2.C
operator family.

ROUND-ROBUSTNESS (the r8 verdict's "What's wrong" #1): both the banked
set and the staleness scan derive from the SAME pinned round list —
the rounds that existed when this window was BUILT (r01-r11).  The
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
# the verdict rounds that existed when the round-12 window was built;
# round 13 appends "12" when it rebuilds PRIORITY
BANKED_ROUNDS = (
    "01", "02", "03", "04", "05", "06", "07", "08", "09", "10", "11",
)

# banked-green names whose IMPLEMENTATION changed since their latest
# verdict — they hold early re-grade slots ahead of staler names because
# the banked verdict graded code that no longer exists
CHANGED_IMPL = {
    # r12: scored-WHERE keys on the parsed METADATA _score flag, _score
    # re-initializes unconditionally (ADVICE r11 medium), and leaf stats
    # passes aggregate over the pristine WHERE input (review r12a)
    "esql_match_score_topk",
    # r12: _where_pred's QSTR branch gained the scored-leaf decomposition
    "esql_fulltext_where",
    # r12: `alternative` default/validation rewrite (ADVICE r11)
    "aggs_bucket_count_ks_test",
    # r12: bm25_score grew the stats_over branch (review r12a)
    "search_bm25_topk",
    # r12: _compile_uri_query rebuilt over the shared uri_query_parts
    # grammar iterator (review r12c)
    "query_dsl_uri",
}

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


def test_round12_window_policy():
    """Round-12 policy (VERDICT r11 'Next round' items 1/4/5): the net-new
    surfaces lead, the changed-implementation re-grades follow, every
    never-graded query holds a slot, ALL 43 r5-era stale verdicts are in
    the window (draining the r5 tail to zero), and the final fill takes
    only the oldest vintage (no fresher verdict holds a re-grade slot
    while an older one waits — CHANGED_IMPL names exempt, their banked
    verdicts grade dead code).  Everything derives from the PINNED
    BANKED_ROUNDS list, so the driver landing CORRECTNESS_r12.json
    cannot change the outcome."""
    reg = load_all()
    first = list(reg)[:GRADED_WINDOW]
    last = _verdicts()
    banked = set(last)

    # 1. no never-graded query left outside the window
    ungraded_outside = [n for n in reg if n not in banked and n not in set(first)]
    assert not ungraded_outside, (
        f"queries that would still lack a driver verdict after round 12: "
        f"{ungraded_outside}"
    )
    # 2. the changed-implementation re-grades hold slots
    missing_changed = sorted(CHANGED_IMPL - set(first))
    assert not missing_changed, (
        f"changed-implementation queries not being re-graded: {missing_changed}"
    )
    # 3. every r5-era stale verdict is being re-graded — the r5 tail
    # drains to zero this round
    stale_r5 = {n for n, r in last.items() if r == 5 and n in reg}
    left_out = sorted(stale_r5 - set(first))
    assert not left_out, f"r5-era stale verdicts left outside the window: {left_out}"
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
