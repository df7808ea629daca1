"""Shared pure-Python references for the round-11 surfaces — ONE copy,
imported by both the unit tests and the property tests so the documented
semantics cannot drift between two replicas (review r11d)."""

from __future__ import annotations

import math


def bm25_ref(doc_toks, query_terms, k1=1.2, b=0.75):
    """search.bm25_score's documented semantics: Lucene's formula with
    docCount = docs holding at least one analyzed term (empty/NULL fields
    sit outside N and avgdl), tf=0 terms contributing exactly 0, and the
    avgdl=0 corpus matching nothing."""
    with_field = [d for d in doc_toks if d]
    n = len(with_field)
    sdl = sum(len(d) for d in with_field)
    uniq = list(dict.fromkeys(query_terms))
    out = {}
    for i, toks in enumerate(doc_toks):
        s = 0.0
        for t in uniq:
            dfc = float(sum(1 for d in doc_toks if t in d))
            tf = float(toks.count(t))
            if tf == 0:
                continue  # contributes exactly 0 (the engine's guard)
            idf = math.log(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
            rel = (b * float(len(toks))) / (float(sdl) / n) if sdl > 0 else 0.0
            norm = k1 * ((1.0 - b) + rel)
            s += float(query_terms.count(t)) * idf * ((tf * (k1 + 1.0)) / (tf + norm))
        if s > 0:
            out[i] = s
    return out


def ks_test_ref(counts, fractions=None, sampling="uniform"):
    """aggs_dsl bucket_count_ks_test's documented semantics, replayed."""
    total = float(sum(counts))
    nb = len(counts)
    if fractions is None:
        f0s = [(i + 1) / nb for i in range(nb)]
    else:
        fs = float(sum(fractions))
        acc, f0s = 0.0, []
        for x in fractions:
            acc += x / fs
            f0s.append(acc)
    cum, diffs = 0.0, []
    for c, f0 in zip(counts, f0s):
        cum += c
        keep = (
            sampling == "uniform"
            or (sampling == "upper_tail" and f0 > 0.5)
            or (sampling == "lower_tail" and f0 <= 0.5)
        )
        if keep and total > 0:
            diffs.append(cum / total - f0)
    d_less = max(max(diffs, default=0.0), 0.0)
    d_greater = max(max((-d for d in diffs), default=0.0), 0.0)
    d_two = max(d_less, d_greater)
    nd2 = total * d_two * d_two
    if nd2 <= 1e-3:
        p_two = 1.0  # small-lambda guard, same as the engine
    else:
        p_two = min(
            max(
                2
                * sum(
                    (-1) ** (j - 1) * math.exp(-2 * j * j * nd2)
                    for j in range(1, 101)
                ),
                0.0,
            ),
            1.0,
        )
    return {
        "less": math.exp(-2 * total * d_less * d_less),
        "greater": math.exp(-2 * total * d_greater * d_greater),
        "two_sided": p_two,
    }
