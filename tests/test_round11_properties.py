"""Property-based differential tests for the round-11 surfaces, each
against a pure-Python reference:

- BM25 (search.bm25_score) vs the formula replayed in Python, over
  random tiny corpora (hot terms, absent terms, duplicate query terms,
  empty docs) — exact to 1e-9 because every input is an integer.
- bucket_count_ks_test vs the documented CDF/series math, over random
  bucket counts, random fractions (or uniform), all three sampling
  methods and alternatives.
- TOP inside TS STATS vs a brute-force per-series-then-top-k model,
  over random (series, group, value) streams with NULLs and hot groups.
- collapse_inner_hits vs a Python group/sort/slice model, over random
  groups including a NULL group.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# ------------------------------------------------------------------ BM25


_WORDS = ["hash", "join", "scan", "sort", "spark"]

_DOCS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
    min_size=1,
    max_size=8,
)
_QUERY = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3)


from tests.refs_round11 import bm25_ref as _bm25_ref  # noqa: E402
from tests.refs_round11 import ks_test_ref as _shared_ks_ref  # noqa: E402


@given(docs=_DOCS, query=_QUERY)
@settings(**_SETTINGS)
def test_bm25_property(spark, docs, query):
    from elasticsearch_hadoop_spark.search import bm25_score

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "id int, text string"
    )
    got = {
        r["id"]: r["_score"]
        for r in bm25_score(df, "text", " ".join(query)).collect()
    }
    ref = _bm25_ref(docs, query)
    assert set(got) == set(ref)
    for i in ref:
        assert abs(got[i] - ref[i]) < 1e-9, (i, got[i], ref[i])


# ------------------------------------------------- bucket_count_ks_test


_COUNTS = st.lists(st.integers(1, 50), min_size=2, max_size=8)


_ks_ref = _shared_ks_ref


@given(
    counts=_COUNTS,
    use_fracs=st.booleans(),
    fracs_seed=st.lists(st.integers(1, 9), min_size=2, max_size=8),
    sampling=st.sampled_from(["uniform", "upper_tail", "lower_tail"]),
)
@settings(**_SETTINGS)
def test_ks_test_property(spark, counts, use_fracs, fracs_seed, sampling):
    from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs

    # fractions list padded/cut to the bucket count so the reference and
    # the engine see the same alignment
    fractions = None
    if use_fracs:
        fractions = [
            float(fracs_seed[i % len(fracs_seed)]) for i in range(len(counts))
        ]
    rows = [(f"k{i:02d}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "k string")
    body = {"buckets_path": "b>_count",
            "alternative": ["less", "greater", "two_sided"],
            "sampling_method": sampling}
    if fractions is not None:
        body["fractions"] = fractions
    out = compile_aggs(
        df,
        {
            "b": {"terms": {"field": "k", "size": 100, "order": {"_key": "asc"}}},
            "ks": {"bucket_count_ks_test": body},
        },
    ).collect()[0]
    ref = _ks_ref(counts, fractions, sampling)
    for alt in ("less", "greater", "two_sided"):
        assert abs(out[f"ks_{alt}"] - ref[alt]) < 1e-9, (alt, counts, fractions)


# ------------------------------------------------------ TOP in TS STATS


_TS_ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),                          # series dim
        st.integers(0, 1),                          # group key
        st.one_of(st.none(), st.integers(0, 30)),   # value (NULL possible)
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_TS_ROWS, asc=st.booleans(), limit=st.integers(1, 3))
@settings(**_SETTINGS)
def test_ts_stats_top_property(spark, rows, asc, limit):
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame(
        [(f"h{h}", f"g{g}", v) for h, g, v in rows],
        "host string, grp string, value int",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")))
    order = "asc" if asc else "desc"
    out = esql(
        f'TS t | STATS tc = TOP(SUM_OVER_TIME(value), {limit}, "{order}") BY grp',
        tables={"t": df},
        time_series={"t": {"dimensions": ["host"], "timestamp": "ts"}},
    )
    got = {r["grp"]: list(r["tc"]) for r in out.collect()}

    # reference: per (series, group) the sum over non-null values (NULL
    # when the series has no non-null sample), then per group the sorted
    # top-`limit` of the non-null sums
    sums: dict[tuple[str, str], int | None] = {}
    for h, g, v in rows:
        key = (f"h{h}", f"g{g}")
        if v is not None:
            sums[key] = (sums.get(key) or 0) + v
        else:
            sums.setdefault(key, None)
    ref: dict[str, list[int]] = {}
    for (_h, g), s in sums.items():
        if s is not None:
            ref.setdefault(g, []).append(s)
    ref = {g: sorted(v, reverse=not asc)[:limit] for g, v in ref.items()}
    groups = {f"g{g}" for _h, g, _v in rows}
    assert set(got) == groups
    for g in groups:
        assert got[g] == ref.get(g, []), (g, got[g], ref.get(g))


# ------------------------------------- scored WHERE over boolean trees


_LEAF = st.tuples(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=2),  # query terms
    st.sampled_from(["or", "and"]),                             # operator
)
_TREE = st.recursive(
    st.one_of(
        st.tuples(st.just("match"), _LEAF),
        st.tuples(st.just("filter"), st.integers(0, 7)),  # doc_id <= k
    ),
    lambda kids: st.one_of(
        st.tuples(st.just("and"), kids, kids),
        st.tuples(st.just("or"), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=4,
)


def _tree_to_esql(t) -> str:
    kind = t[0]
    if kind == "match":
        terms, op = t[1]
        q = " ".join(terms)
        if op == "and":
            return f'MATCH(text, "{q}", {{"operator": "and"}})'
        return f'MATCH(text, "{q}")'
    if kind == "filter":
        return f"(doc_id <= {t[1]})"
    if kind == "not":
        return f"(NOT {_tree_to_esql(t[1])})"
    return f"({_tree_to_esql(t[1])} {kind.upper()} {_tree_to_esql(t[2])})"


def _tree_eval(t, doc_id, toks) -> bool:
    kind = t[0]
    if kind == "match":
        terms, op = t[1]
        hits = [w in toks for w in dict.fromkeys(terms)]
        return all(hits) if op == "and" else any(hits)
    if kind == "filter":
        return doc_id <= t[1]
    if kind == "not":
        return not _tree_eval(t[1], doc_id, toks)
    a, b = _tree_eval(t[1], doc_id, toks), _tree_eval(t[2], doc_id, toks)
    return (a and b) if kind == "and" else (a or b)


def _tree_leaves(t):
    """Scoring leaves only: anything under a NOT is must_not — filter
    context, never scored (the engine's rule, review r11d)."""
    if t[0] == "match":
        yield t[1]
    elif t[0] == "not":
        return  # filter context: the whole negated subtree scores 0
    elif t[0] in ("and", "or"):
        yield from _tree_leaves(t[1])
        yield from _tree_leaves(t[2])


@given(docs=_DOCS, tree=_TREE)
@settings(**_SETTINGS)
def test_scored_where_boolean_trees(spark, docs, tree):
    """METADATA _score over random AND/OR/NOT trees of MATCH leaves
    (plain and operator=and) and plain filters: surviving docs carry
    exactly the sum of the BM25 of the leaves THEY match — the
    leaf-gating invariant (review r11c) under arbitrary structure."""
    from elasticsearch_hadoop_spark.esql import esql

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id int, text string",
    )
    q = (
        f"FROM d METADATA _score | WHERE {_tree_to_esql(tree)}"
        " | KEEP doc_id, _score"
    )
    got = {r["doc_id"]: r["_score"] for r in esql(q, tables={"d": df}).collect()}

    # per-leaf corpus-wide BM25 maps, computed once per distinct leaf
    leaf_scores = [
        (terms, op, _bm25_ref(docs, terms)) for terms, op in _tree_leaves(tree)
    ]
    expect = {}
    for i, toks in enumerate(docs):
        if not _tree_eval(tree, i, toks):
            continue
        s = 0.0
        for terms, op, per_doc in leaf_scores:
            hits = [w in toks for w in dict.fromkeys(terms)]
            matched = all(hits) if op == "and" else any(hits)
            if matched:
                s += per_doc.get(i, 0.0)
        expect[i] = s
    assert set(got) == set(expect), (tree, got, expect)
    for i in expect:
        assert abs(got[i] - expect[i]) < 1e-9, (tree, i, got[i], expect[i])


# ------------------------------------------------- collapse inner_hits


_CIH_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),  # group (NULL group too)
        st.integers(0, 30),                       # ts
        st.integers(0, 9),                        # score
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_CIH_ROWS, size=st.integers(1, 3))
@settings(**_SETTINGS)
def test_collapse_inner_hits_property(spark, rows, size):
    from elasticsearch_hadoop_spark.search import collapse_inner_hits

    data = [(g, i, ts, sc) for i, (g, ts, sc) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp int, id int, ts int, score int")
    out = collapse_inner_hits(
        df,
        "grp",
        sort=[{"ts": "desc"}, {"id": "asc"}],
        inner_hits={"name": "ih", "size": size,
                    "sort": [{"score": "desc"}, {"id": "asc"}]},
        inner_cols=["id"],
    ).collect()

    groups: dict[object, list[tuple]] = {}
    for g, i, ts, sc in data:
        groups.setdefault(g, []).append((g, i, ts, sc))
    assert len(out) == len(groups)
    for r in out:
        members = groups[r["grp"]]
        rep = min(members, key=lambda m: (-m[2], m[1]))
        assert r["id"] == rep[1]
        inner = sorted(members, key=lambda m: (-m[3], m[1]))[:size]
        assert [x["id"] for x in r["ih"]] == [m[1] for m in inner]
