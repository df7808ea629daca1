"""Round-14 optimization pins: the internals the optimization round
changed must stay changed — each test pins the measured-better shape so a
future edit can't silently regress it (OPTIMIZATION_r14.md has the
numbers; plans/r14/ the before/after evidence)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import load_all
from elasticsearch_hadoop_spark.plans import count_nodes, formatted_plan

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    return formatted_plan(REGISTRY[name].fn(spark, sf_dir))


def test_minhash_lsh_computes_signatures_once(spark, sf_dir):
    # the (id, shingles, sig) base is localCheckpointed: the self-joins
    # must read the materialized frame, not re-execute the scan subtree
    # (the round-start plan had FOUR parquet scans of documents)
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert count_nodes(plan, "Scan parquet") == 0
    assert "ExistingRDD" in plan


def test_simhash_and_ngram_scan_once(spark, sf_dir):
    for name in ("dedup_simhash_pairs", "dedup_ngram_jaccard"):
        plan = plan_of(spark, sf_dir, name)
        assert count_nodes(plan, "Scan parquet") == 0, name
        assert "ExistingRDD" in plan, name


def test_segments_global_uses_partial_min_not_window(spark, sf_dir):
    # r15: winners come from groupBy(seg).agg(min(struct(id,pos))) — the
    # struct already IS the kept row, so there is no window (r14's window
    # shipped every exploded row of a hot segment to one task) and no
    # join-back; the partial_min pre-combines hot segments map-side
    plan = plan_of(spark, sf_dir, "dedup_segments_global")
    assert count_nodes(plan, "Window") == 0
    assert "partial_min(struct(" in plan  # map-side combine = skew bound
    assert count_nodes(plan, "SortMergeJoin") + count_nodes(
        plan, "ShuffledHashJoin"
    ) + count_nodes(plan, "BroadcastHashJoin") <= 1  # only the totals join


def test_span_near_single_tokenization_per_clause(spark, sf_dir):
    # the explode barrier keeps the two span analyzers out of the pushed
    # filter: exactly one `split(lower(` per clause in the whole plan
    plan = plan_of(spark, sf_dir, "query_dsl_span_near")
    assert plan.count("split(lower") == 2
    assert count_nodes(plan, "Generate") == 1


def test_suggest_phrase_broadcasts_token_winners(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "search_suggest_phrase")
    assert count_nodes(plan, "SortMergeJoin") == 0
    assert "BroadcastHashJoin LeftOuter BuildRight" in plan


def test_fn_json_parses_once(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "fn_json")
    assert plan.count("from_json") >= 1
    assert "get_json_object" not in plan
    # one JsonToStructs, shared by all three outputs
    assert plan.count("from_json(StructField(k,StringType,true)") <= 1


def test_footer_count_matches_scan_count(spark, sf_dir, tmp_path):
    # the driver-side footer count must agree with the scan count across
    # overwrite, blind append, and merge shapes — and refuse (fall back)
    # on filtered aliases
    from elasticsearch_hadoop_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    cat.write_index(cust, "c", mode="overwrite")
    assert cat.count_index("c") == cat.read_index("c").count()
    cat.write_index(cust.limit(7), "c")  # blind append (2nd write job uuid)
    assert cat._footer_count("c") == cat.read_index("c").count()
    cat.write_index(
        cust.limit(5).withColumn("extra", F.lit(1)), "c2",
        mode="overwrite", id_col="c_custkey",
    )
    cat.write_index(
        cust.limit(9).withColumn("extra", F.lit(2)), "c2",
        operation="upsert", id_col="c_custkey",
    )
    assert cat.count_index("c2") == cat.read_index("c2").count() == 9
    # filtered alias → fast path must decline, slow path must filter
    cat.put_alias("small", "c2", filter={"range": {"extra": {"gte": 2}}})
    assert cat._footer_count("small") is None
    assert cat.count_index("small") == cat.read_index("small").count()


def test_rollover_generation_is_metadata_only(spark, sf_dir, tmp_path):
    # a fresh generation must cost no Spark write: bare dir + schema in
    # _meta, and read back as an empty frame with the parent's schema
    from elasticsearch_hadoop_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(20)
    cat.write_index(orders, "g-000001")
    cat.put_alias("g", "g-000001")
    res = cat.rollover("g", max_docs=1)
    assert res["rolled_over"]
    gen2 = os.path.join(str(tmp_path), "g-000002")
    assert os.path.isdir(gen2) and os.listdir(gen2) == []
    df = cat.read_index("g-000002")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [f.name for f in orders.schema.fields]


def test_single_write_job_detector(tmp_path):
    from elasticsearch_hadoop_spark.catalog import Catalog

    d = tmp_path / "idx"
    d.mkdir()
    u1 = "0f0e0d0c-1111-2222-3333-444455556666"
    u2 = "0f0e0d0c-9999-8888-7777-444455556666"
    (d / f"part-00000-{u1}-c000.snappy.parquet").write_bytes(b"")
    (d / f"part-00001-{u1}-c000.snappy.parquet").write_bytes(b"")
    (d / "_SUCCESS").write_bytes(b"")
    assert Catalog._single_write_job([str(d)])
    (d / f"part-00000-{u2}-c000.snappy.parquet").write_bytes(b"")
    assert not Catalog._single_write_job([str(d)])
    (d / "oddly-named.parquet").write_bytes(b"")
    assert not Catalog._single_write_job([str(d)])
