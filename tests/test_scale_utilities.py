"""Scale utilities: salted joins return identical results to plain
joins; partitioned writes produce prunable layouts; bucketed tables
join without an exchange."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_eng_project_spark.operators.sink import write_bucketed_table, write_partitioned
from data_eng_project_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # one massively hot key (0) plus a uniform tail
    big = spark.range(5000).select(
        (F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 100)).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    plain = plainset = {(r.k, r.payload, r.v) for r in big.join(small, on="k").collect()}
    salted = {(r.k, r.payload, r.v) for r in salted_join(big, small, on="k").collect()}
    assert salted == plainset and len(plainset) > 0


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "facts")
    df = spark.createDataFrame(
        [(1, "2022", "a"), (2, "2022", "b"), (3, "2023", "c")], "id int, y string, v string"
    )
    write_partitioned(df, path, ["y"])
    assert sorted(d for d in os.listdir(path) if d.startswith("y=")) == ["y=2022", "y=2023"]
    read = spark.read.parquet(path).filter(F.col("y") == "2023")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert read.count() == 1
    # partition filter must appear as PartitionFilters, not a post-scan filter
    assert "PartitionFilters: [isnotnull(y" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # dropped at the end and gitignored)
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed_table(a, "bt_a", "k", num_buckets=8)
    write_bucketed_table(b, "bt_b", "k", num_buckets=8)
    joined = spark.table("bt_a").join(spark.table("bt_b"), on="k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 1000
    assert "Exchange hashpartitioning" not in plan  # bucket co-location
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
