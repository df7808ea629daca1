"""Edge semantics of the round-4 late query-DSL clauses: multi_match,
dis_max, boosting, terms_set, match_phrase_prefix, match_none,
simple_query_string.  The oracle-parity suite covers the fixture-scale
behavior; these pin the corners (short docs, missing fields, thresholds)."""

from __future__ import annotations

import pytest

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox", "news", 1),
        (2, "quick foxtrot", "blog", 2),
        (3, None, "quick", 1),
        (4, "fox", "news", 3),
        (5, "slow brown foxhound dances", None, 0),
    ]
    return spark.createDataFrame(rows, "id int, text string, src string, k int")


def ids(df, pred):
    return sorted(r.id for r in df.filter(pred).select("id").collect())


def test_multi_match_best_fields_or(docs):
    p = compile_query({"multi_match": {"query": "quick", "fields": ["text", "src"]}})
    assert ids(docs, p) == [1, 2, 3]  # src carries 'quick' for id=3


def test_multi_match_cross_fields_and(docs):
    p = compile_query(
        {
            "multi_match": {
                "query": "quick news",
                "fields": ["text", "src"],
                "type": "cross_fields",
                "operator": "and",
            }
        }
    )
    # every token in at least one field: id=1 (quick@text, news@src)
    assert ids(docs, p) == [1]


def test_multi_match_phrase(docs):
    p = compile_query(
        {"multi_match": {"query": "brown fox", "fields": ["text"], "type": "phrase"}}
    )
    assert ids(docs, p) == [1]  # 'foxhound' (id=5) is not token 'fox'


def test_dis_max_is_disjunction(docs):
    p = compile_query(
        {
            "dis_max": {
                "queries": [{"term": {"src": "blog"}}, {"term": {"k": 3}}],
                "tie_breaker": 0.7,
            }
        }
    )
    assert ids(docs, p) == [2, 4]


def test_boosting_matches_positive_only(docs):
    p = compile_query(
        {
            "boosting": {
                "positive": {"range": {"k": {"gte": 1}}},
                "negative": {"term": {"src": "news"}},
                "negative_boost": 0.1,
            }
        }
    )
    # negative demotes, never excludes: news rows stay in
    assert ids(docs, p) == [1, 2, 3, 4]


def test_terms_set_per_doc_threshold(spark):
    rows = [
        (1, ["a", "b", "c"], 2),
        (2, ["a"], 2),
        (3, ["b", "c"], 1),
        (4, ["x"], 1),
        (5, ["a", "a", "b"], 2),  # duplicate field values count once
    ]
    df = spark.createDataFrame(rows, "id int, tags array<string>, req int")
    p = compile_query(
        {
            "terms_set": {
                "tags": {"terms": ["a", "b"], "minimum_should_match_field": "req"}
            }
        }
    )
    assert sorted(r.id for r in df.filter(p).collect()) == [1, 3, 5]
    p2 = compile_query(
        {"terms_set": {"tags": {"terms": ["a", "b"], "minimum_should_match": 1}}}
    )
    assert sorted(r.id for r in df.filter(p2).collect()) == [1, 2, 3, 5]


def test_match_phrase_prefix(docs):
    p = compile_query({"match_phrase_prefix": {"text": "brown fox"}})
    # 'brown fox' and 'brown foxhound' both match (last term is a prefix);
    # 'quick foxtrot' lacks 'brown'; doc shorter than the phrase never errors
    assert ids(docs, p) == [1, 5]
    single = compile_query({"match_phrase_prefix": {"text": "foxt"}})
    assert ids(docs, single) == [2]


def test_match_none(docs):
    assert ids(docs, compile_query({"match_none": {}})) == []


def test_simple_query_string_operators(docs):
    p = compile_query(
        {
            "simple_query_string": {
                "query": '"brown fox" | foxt* -slow',
                "fields": ["text"],
                "default_operator": "and",
            }
        }
    )
    # (phrase OR foxt-prefix) AND NOT slow -> ids 1, 2 (5 has 'slow')
    assert ids(docs, p) == [1, 2]


def test_simple_query_string_rejects_unspaced_ops(docs):
    with pytest.raises(QueryDslError):
        compile_query(
            {"simple_query_string": {"query": "a|b", "fields": ["text"]}}
        )


def test_multi_match_requires_fields():
    with pytest.raises(QueryDslError):
        compile_query({"multi_match": {"query": "x", "fields": []}})


class TestQueryString:
    @staticmethod
    def _df(spark):
        return spark.createDataFrame(
            [(1, "the quick brown fox", 5.0, "2024-01-05"),
             (2, "lazy dog sleeps", 12.0, "2024-02-01"),
             (3, "quick dog runs fast", 7.5, "2024-03-01")],
            "id int, text string, v double, d string",
        )

    def _ids(self, spark, q, **extra):
        from elasticsearch_hadoop_spark.query_dsl import compile_query

        dsl = {"query_string": {"query": q, **extra}}
        return sorted(r["id"] for r in self._df(spark).filter(compile_query(dsl)).collect())

    def test_boolean_and_groups(self, spark):
        assert self._ids(spark, "text:quick AND text:dog") == [3]
        assert self._ids(spark, "(text:lazy OR text:fast) AND v:>7") == [2, 3]
        assert self._ids(spark, "NOT text:dog AND v:<10") == [1]

    def test_default_fields_and_operator(self, spark):
        assert self._ids(spark, "quick dog", default_field="text") == [1, 2, 3]
        assert self._ids(spark, "quick dog", default_field="text",
                         default_operator="and") == [3]
        assert self._ids(spark, "quick -fast", fields=["text"],
                         default_operator="and") == [1]

    def test_ranges_comparisons_exists(self, spark):
        assert self._ids(spark, "v:[5 TO 10]") == [1, 3]
        assert self._ids(spark, "v:{5 TO 10]") == [3]
        assert self._ids(spark, "v:[6 TO *]") == [2, 3]
        assert self._ids(spark, "v:>=12") == [2]
        assert self._ids(spark, "_exists_:text AND id:2") == [2]
        assert self._ids(spark, "d:[2024-01-01 TO 2024-01-31]") == [1]

    def test_wildcard_regex_phrase_fuzzy_boost(self, spark):
        assert self._ids(spark, "text:*quick*") == [1, 3]
        assert self._ids(spark, "text:/.*q[a-z]+ck.*/") == [1, 3]
        assert self._ids(spark, 'text:"quick brown"') == [1]
        assert self._ids(spark, "d:2024-01-06~1") == [1]
        assert self._ids(spark, "text:quick^2 OR id:2") == [1, 2, 3]

    def test_field_scoped_group(self, spark):
        assert self._ids(spark, "text:(lazy OR fast)") == [2, 3]

    def test_errors(self, spark):
        import pytest
        from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

        with pytest.raises(QueryDslError):
            compile_query({"query_string": {"query": "bare terms"}})  # no default_field
        with pytest.raises(QueryDslError):
            compile_query({"query_string": {"query": "(a OR b", "default_field": "text"}})
        with pytest.raises(QueryDslError):
            compile_query({"query_string": {"query": ""}})


class TestIntervals:
    @staticmethod
    def _df(spark):
        return spark.createDataFrame(
            [(1, "the quick brown fox jumps"),
             (2, "fox then later quick"),
             (3, "quick fox runs"),
             (4, "nothing here")],
            "id int, text string",
        )

    def _ids(self, spark, rule):
        from elasticsearch_hadoop_spark.query_dsl import compile_query

        dsl = {"intervals": {"text": rule}}
        return sorted(r["id"] for r in self._df(spark).filter(compile_query(dsl)).collect())

    def test_match_ordered_gaps(self, spark):
        assert self._ids(spark, {"match": {"query": "quick fox", "ordered": True,
                                           "max_gaps": 1}}) == [1, 3]
        assert self._ids(spark, {"match": {"query": "quick fox",
                                           "ordered": True}}) == [1, 3]
        assert self._ids(spark, {"match": {"query": "quick fox"}}) == [1, 2, 3]

    def test_all_of_any_of(self, spark):
        assert self._ids(spark, {"all_of": {"ordered": True, "max_gaps": 0,
            "intervals": [{"match": {"query": "quick"}},
                          {"match": {"query": "fox"}}]}}) == [3]
        assert self._ids(spark, {"any_of": {"intervals": [
            {"match": {"query": "nothing"}}, {"match": {"query": "jumps"}}]}}) == [1, 4]

    def test_unordered_multiplicity(self, spark):
        # "fox fox" needs TWO fox positions — no doc has them
        assert self._ids(spark, {"match": {"query": "fox fox"}}) == []

    def test_rejects_unordered_gap_budget(self, spark):
        import pytest
        from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

        with pytest.raises(QueryDslError):
            compile_query({"intervals": {"text": {"match": {"query": "a b", "max_gaps": 1}}}})


class TestZeroTermsQuery:
    """Lucene rewrites a query that analyzes to ZERO tokens to
    MatchNoDocsQuery (or MatchAllDocsQuery under zero_terms_query=all) —
    it never errors, and critically operator=and must NOT vacuously
    match everything on an empty token set (the round-6 fix)."""

    def _df(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame([
            Row(id=1, text="alpha beta"),
            Row(id=2, text="gamma delta"),
        ])

    def _ids(self, spark, dsl):
        from elasticsearch_hadoop_spark.query_dsl import compile_query

        return sorted(r["id"] for r in self._df(spark).filter(compile_query(dsl)).collect())

    def test_match_zero_tokens_matches_nothing(self, spark):
        assert self._ids(spark, {"match": {"text": "!!! ---"}}) == []
        # the regression: operator=and used to match EVERY doc
        assert self._ids(
            spark, {"match": {"text": {"query": "...", "operator": "and"}}}
        ) == []

    def test_match_zero_terms_query_all(self, spark):
        assert self._ids(
            spark,
            {"match": {"text": {"query": "???", "zero_terms_query": "all"}}},
        ) == [1, 2]

    def test_match_phrase_and_prefix_zero_tokens(self, spark):
        assert self._ids(spark, {"match_phrase": {"text": {"query": "!!"}}}) == []
        assert self._ids(
            spark,
            {"match_phrase": {"text": {"query": "!!", "zero_terms_query": "all"}}},
        ) == [1, 2]
        assert self._ids(
            spark, {"match_phrase_prefix": {"text": {"query": "~~"}}}
        ) == []

    def test_multi_match_zero_tokens(self, spark):
        assert self._ids(
            spark,
            {"multi_match": {"query": "...", "fields": ["text"],
                             "type": "cross_fields", "operator": "and"}},
        ) == []
        assert self._ids(
            spark,
            {"multi_match": {"query": "...", "fields": ["text"],
                             "zero_terms_query": "all"}},
        ) == [1, 2]

    def test_match_doc_agrees(self):
        from elasticsearch_hadoop_spark.sources.es_datasource import match_doc

        doc = {"text": "alpha beta"}
        assert not match_doc(doc, {"match": {"text": "!!!"}})
        assert not match_doc(
            doc, {"match": {"text": {"query": "...", "operator": "and"}}}
        )
        assert match_doc(
            doc, {"match": {"text": {"query": "...", "zero_terms_query": "all"}}}
        )
        assert not match_doc(doc, {"match_phrase": {"text": {"query": "!!"}}})
        assert match_doc(
            doc,
            {"match_phrase": {"text": {"query": "!!", "zero_terms_query": "all"}}},
        )


def test_fuzzy_short_form_defaults_to_auto(spark):
    """ES's fuzziness default is AUTO in BOTH forms: the short form
    {"fuzzy": {"f": "term"}} used to hardcode 2 edits, admitting matches
    AUTO rejects for terms shorter than 6 chars (round-6 fix)."""
    from pyspark.sql import Row

    from elasticsearch_hadoop_spark.query_dsl import compile_query

    df = spark.createDataFrame([Row(id=1, w="cat"), Row(id=2, w="cta"),
                                Row(id=3, w="dog")])
    # query "cat": len 3 -> AUTO allows 1 edit; "cta" is 2 edits away
    short = sorted(r["id"] for r in df.filter(
        compile_query({"fuzzy": {"w": "cat"}})).collect())
    assert short == [1]
    # long form with explicit fuzziness 2 admits the transposition-as-2-edits
    long2 = sorted(r["id"] for r in df.filter(
        compile_query({"fuzzy": {"w": {"value": "cat", "fuzziness": 2}}})).collect())
    assert long2 == [1, 2]
    # a sibling boost key on `terms` parses and is ignored (score-only)
    tb = sorted(r["id"] for r in df.filter(
        compile_query({"terms": {"w": ["cat", "dog"], "boost": 2.0}})).collect())
    assert tb == [1, 3]


class TestMatchFuzziness:
    """`match` with `fuzziness`: Lucene rewrites each query token to a
    FuzzyQuery (per-token AUTO edit budgets).  Previously the option was
    silently ignored — a typo'd token simply failed to match."""

    def _df(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame([
            Row(id=1, text="the quick brown fox"),
            Row(id=2, text="the quack brown box"),
            Row(id=3, text="completely unrelated words"),
        ])

    def _ids(self, spark, dsl):
        from elasticsearch_hadoop_spark.query_dsl import compile_query

        return sorted(r["id"] for r in self._df(spark).filter(compile_query(dsl)).collect())

    def test_or_fuzzy(self, spark):
        # "quick" (len 5 -> AUTO=1 edit) reaches "quack"; exact match misses it
        assert self._ids(spark, {"match": {"text": {"query": "quick"}}}) == [1]
        assert self._ids(
            spark, {"match": {"text": {"query": "quick", "fuzziness": "AUTO"}}}
        ) == [1, 2]
        # fixed fuzziness 0 is the exact match
        assert self._ids(
            spark, {"match": {"text": {"query": "quick", "fuzziness": 0}}}
        ) == [1]

    def test_and_fuzzy_and_msm(self, spark):
        assert self._ids(
            spark,
            {"match": {"text": {"query": "quick fox", "operator": "and",
                                "fuzziness": 1}}},
        ) == [1, 2]  # quack/box are 1 edit away
        assert self._ids(
            spark,
            {"match": {"text": {"query": "quick fox zebra",
                                "minimum_should_match": 2, "fuzziness": 1}}},
        ) == [1, 2]

    def test_auto_is_per_token(self, spark):
        # "ox" (len 2 -> AUTO=0 edits) must NOT fuzzy-reach "fox"/"box";
        # "brown" (len 5 -> 1 edit) in the same query still matches
        assert self._ids(
            spark, {"match": {"text": {"query": "ox", "fuzziness": "AUTO"}}}
        ) == []
        assert self._ids(
            spark,
            {"match": {"text": {"query": "ox browns", "operator": "or",
                                "fuzziness": "AUTO"}}},
        ) == [1, 2]

    def test_match_doc_agrees(self):
        from elasticsearch_hadoop_spark.sources.es_datasource import match_doc

        docs = [
            {"text": "the quick brown fox"},
            {"text": "the quack brown box"},
            {"text": "completely unrelated words"},
        ]
        for dsl, expect in [
            ({"match": {"text": {"query": "quick", "fuzziness": "AUTO"}}},
             [True, True, False]),
            ({"match": {"text": {"query": "quick fox", "operator": "and",
                                 "fuzziness": 1}}},
             [True, True, False]),
            ({"match": {"text": {"query": "ox", "fuzziness": "AUTO"}}},
             [False, False, False]),
            ({"match": {"text": {"query": "quick", "fuzziness": 0}}},
             [True, False, False]),
        ]:
            assert [match_doc(d, dsl) for d in docs] == expect, dsl


class TestMatchBoolPrefix:
    """`match_bool_prefix` (type-as-you-search): all tokens but the last
    are unpositioned term matches, the last is a prefix of ANY doc token
    — previously an unsupported-clause error."""

    def _df(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame([
            Row(id=1, text="quick brown fox"),
            Row(id=2, text="foxtrot dancing quickly"),
            Row(id=3, text="brown bear"),
        ])

    def _ids(self, spark, dsl):
        from elasticsearch_hadoop_spark.query_dsl import compile_query

        return sorted(r["id"] for r in self._df(spark).filter(compile_query(dsl)).collect())

    def test_last_token_is_prefix(self, spark):
        # "fo" prefixes fox AND foxtrot; "quick bro fo" with or matches all
        assert self._ids(spark, {"match_bool_prefix": {"text": "fo"}}) == [1, 2]
        assert self._ids(
            spark,
            {"match_bool_prefix": {"text": {"query": "brown fo",
                                            "operator": "and"}}},
        ) == [1]  # needs term "brown" AND prefix "fo" in the same doc
        # unlike match_phrase_prefix there is no position constraint
        assert self._ids(
            spark,
            {"match_bool_prefix": {"text": {"query": "dancing fox",
                                            "operator": "and"}}},
        ) == [2]  # "fox" prefixes "foxtrot"; order/adjacency irrelevant

    def test_msm_and_multi_match_types(self, spark):
        # doc1: quick+fox = 2 hits; doc2: only the "fo" prefix ("quickly"
        # is not the term "quick"); doc3: only "bear" — msm=2 keeps doc1
        assert self._ids(
            spark,
            {"match_bool_prefix": {"text": {"query": "quick bear fo",
                                            "minimum_should_match": 2}}},
        ) == [1]
        assert self._ids(
            spark,
            {"match_bool_prefix": {"text": {"query": "quick bear fo",
                                            "minimum_should_match": 1}}},
        ) == [1, 2, 3]
        assert self._ids(
            spark,
            {"multi_match": {"query": "brown fo", "fields": ["text"],
                             "type": "bool_prefix", "operator": "and"}},
        ) == [1]
        # phrase_prefix demands adjacency: "brown fo" must appear in order
        assert self._ids(
            spark,
            {"multi_match": {"query": "brown fo", "fields": ["text"],
                             "type": "phrase_prefix"}},
        ) == [1]
        assert self._ids(
            spark,
            {"multi_match": {"query": "dancing qui", "fields": ["text"],
                             "type": "phrase_prefix"}},
        ) == [2]
