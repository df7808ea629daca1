"""Near-dup dedup quality gates (SURVEY.md §5: sketch ops vs the exact
brute-force oracle): MinHash-LSH recall/precision against all-pairs exact
Jaccard on the documents fixture, and SimHash locality sanity."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.dedup import (
    minhash_lsh_pairs,
    shingles,
    simhash_signature,
    shingle_hashes,
)

THRESHOLD = 0.8


# Two planted near-duplicates (identical but for one trailing word: word
# 3-gram Jaccard ~0.93 >= THRESHOLD) guarantee the recall branch always
# executes — the fixture corpus alone has no J>=0.8 pair at some SFs and
# the test used to skip (VERDICT r5 item 6).
_PLANT_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the rain taps softly on the glass"
)
_PLANTED = [
    (1_000_001, _PLANT_BASE, "en", "planted", len(_PLANT_BASE)),
    (1_000_002, _PLANT_BASE + " outside", "en", "planted", len(_PLANT_BASE) + 8),
]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    fixture = tbl(spark, sf_dir, "documents")
    planted = spark.createDataFrame(_PLANTED, schema=fixture.schema)
    return fixture.unionByName(planted)


@pytest.fixture(scope="module")
def truth_pairs(docs):
    """All-pairs exact Jaccard ground truth, computed in-driver over the
    SAME shingle pipeline the operator uses (500 docs -> 125k pairs, cheap
    here; this is the oracle, not the scale path)."""
    rows = docs.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    sets = {r["doc_id"]: set(r["sh"]) for r in rows}
    truth = set()
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa and not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= THRESHOLD:
            truth.add((a, b))
    return truth


def test_lsh_recall_and_precision(docs, truth_pairs):
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", threshold=THRESHOLD).collect()
    }
    # precision is 1.0 by construction (candidates are verified with exact
    # Jaccard) — every returned pair must be in the ground truth
    assert got <= truth_pairs, got - truth_pairs
    # recall: banding (4x4 over 16 perms) catches >=93% of J>=0.8 pairs in
    # expectation; the planted pair guarantees truth_pairs is never empty
    assert truth_pairs, "planted near-dup pair missing from ground truth"
    assert (1_000_001, 1_000_002) in truth_pairs
    recall = len(got & truth_pairs) / len(truth_pairs)
    assert recall >= 0.9, f"recall {recall}: missed {truth_pairs - got}"


def test_simhash_locality(spark):
    """Near-identical texts collide in most bits; unrelated texts don't."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " now"
    far = "completely different words about database engines and shuffles here"
    df = spark.createDataFrame(
        [Row(i=0, text=base), Row(i=1, text=near), Row(i=2, text=far)]
    )
    sigs = {
        r["i"]: r["sig"]
        for r in df.select(
            "i", simhash_signature(shingle_hashes(shingles(F.col("text")))).alias("sig")
        ).collect()
    }
    ham_near = bin(sigs[0] ^ sigs[1]).count("1")
    ham_far = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8  # near-dups within 8 of 32 bits


def test_dedup_segments_global_keeps_first_occurrence(spark):
    from elasticsearch_hadoop_spark.operators.dedup import dedup_segments_global

    df = spark.createDataFrame(
        [
            (1, ["alpha", "beta", "alpha"]),   # in-doc dup of alpha too
            (2, ["beta", "gamma"]),            # beta already seen in doc 1
            (3, ["gamma", "delta"]),
        ],
        "id int, segs array<string>",
    )
    out = {r["id"]: r for r in dedup_segments_global(df, "segs", "id").collect()}
    assert out[1]["kept_segments"] == ["alpha", "beta"]
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    assert out[2]["kept_segments"] == ["gamma"]
    assert out[3]["kept_segments"] == ["delta"]
    # empty docs survive with zero counts
    df2 = spark.createDataFrame([(9, [])], "id int, segs array<string>")
    row = dedup_segments_global(df2, "segs", "id").collect()[0]
    assert row["kept_segments"] == [] and row["n_kept"] == 0 and row["n_dropped"] == 0


def test_dedup_segments_global_hot_segment_bounded_skew(spark):
    """A boilerplate segment in 30% of docs (the 100 TB skew case): the
    winner pick must be a partial-aggregatable min — map-side combine
    bounds what the hot segment's reduce task receives — and the result
    must still keep exactly the first (id, pos) occurrence."""
    from elasticsearch_hadoop_spark.operators.dedup import dedup_segments_global
    from elasticsearch_hadoop_spark.plans import count_nodes, formatted_plan

    n = 1000
    df = (
        spark.range(1, n + 1)
        .select(
            F.col("id"),
            F.when(F.col("id") % 10 < 3, F.array(F.lit("HOT"), F.concat(F.lit("u"), F.col("id"))))
            .otherwise(F.array(F.concat(F.lit("u"), F.col("id"))))
            .alias("segs"),
        )
    )
    out = dedup_segments_global(df, "segs", "id")
    plan = formatted_plan(out)
    # skew bound: the winner min is partially aggregated BEFORE its exchange
    assert "partial_min(struct(" in plan
    # no corpus-wide window (would ship every HOT row to one task)
    assert count_nodes(plan, "Window") == 0
    rows = {r["id"]: r for r in out.collect()}
    # exactly ONE doc keeps HOT: the minimum id carrying it (id=1 here,
    # since 1 % 10 < 3); every doc keeps its own unique segment
    hot_keepers = [i for i, r in rows.items() if "HOT" in r["kept_segments"]]
    assert hot_keepers == [min(i for i in range(1, n + 1) if i % 10 < 3)]
    assert all(f"u{i}" in rows[i]["kept_segments"] for i in range(1, n + 1))
    # every other hot doc dropped exactly the one duplicate
    for i in range(1, n + 1):
        expect_drop = 1 if (i % 10 < 3 and i not in hot_keepers) else 0
        assert rows[i]["n_dropped"] == expect_drop, i
