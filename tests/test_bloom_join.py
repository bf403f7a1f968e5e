"""Bloom-filter join pruning: the Bloom guarantee (zero false
negatives), measured false-positive behavior, and the plan shape that
makes it a scale win (bitset broadcasts; probe side never shuffles
before the filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_eng_project_spark.operators.joins import (
    BLOOM_WORDS,
    bloom_build,
    bloom_probe_keys,
)
from data_eng_project_spark.plans import REGISTRY
from data_eng_project_spark.tables import load_table


def test_bloom_never_misses_members(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_orderkey").alias("key")).distinct()
    bloom = bloom_build(keys, "key")
    tagged = bloom_probe_keys(keys, "key", bloom)
    assert tagged.filter(~F.col("bloom_pass")).count() == 0  # no false negatives


def test_bloom_bitset_is_bounded(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_orderkey").alias("key"))
    bloom = bloom_build(keys, "key").collect()
    assert len(bloom) <= BLOOM_WORDS  # ≤ 8 KB regardless of key count
    assert all(0 <= r["word_idx"] < BLOOM_WORDS for r in bloom)


def test_bloom_rejects_most_nonmembers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    members = orders.select(F.col("o_orderkey").alias("key")).limit(500)
    bloom = bloom_build(members, "key")
    strangers = spark.range(10_000_000, 10_005_000).select(
        F.col("id").alias("key")
    )
    tagged = bloom_probe_keys(strangers, "key", bloom)
    fp = tagged.filter(F.col("bloom_pass")).count()
    assert fp < 100  # < 2% at this load factor


def test_bloom_probe_plan_broadcasts_bitset(spark):
    plan = (
        REGISTRY["bloom_join_prune_stats"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
