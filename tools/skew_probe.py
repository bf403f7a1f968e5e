#!/usr/bin/env python3
"""Skew-join probe: measure what key skew does to a shuffle join and
what each mitigation buys back.

Builds a deliberately pathological fact table (N rows, half of them on
ONE hot key) joined against a small-but-not-broadcastable dim, then
times three posture combinations:

  1. sort-merge join, AQE skew splitting OFF  (the naive baseline)
  2. sort-merge join, AQE skew splitting ON   (the default posture —
     session.py enables it everywhere)
  3. explicit salted_join (operators/skew.py)  (the tool for when even
     split partitions bottleneck one executor)

Run: python tools/skew_probe.py [n_rows] — appends nothing; prints a
table for BASELINE.md. Broadcast is disabled for the probe (a 100 TB
dim side isn't broadcastable; locally the dim easily would be, which
would hide the shuffle entirely and measure nothing).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_eng_project_spark.operators.skew import salted_join  # noqa: E402
from data_eng_project_spark.session import get_session  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = 100_000
    spark = get_session("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )

    # Half the fact rows hit key 7; the rest spread uniformly.
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("grp")
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    fact = spark.read.parquet("/tmp/skew_fact")
    dim = spark.read.parquet("/tmp/skew_dim")

    def run(tag: str, skew_on: bool, salted: bool) -> float:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        t0 = time.perf_counter()
        j = (
            salted_join(fact, dim, on="k")
            if salted
            else fact.join(dim, on="k")
        )
        j.groupBy("grp").agg(F.sum("v")).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(f"{tag:34s} {dt:6.2f}s")
        return dt

    run("warmup", True, False)
    results = {
        "sort-merge, AQE skew OFF": run("sort-merge, AQE skew OFF", False, False),
        "sort-merge, AQE skew ON": run("sort-merge, AQE skew ON", True, False),
    }
    # AQE only splits partitions above skewedPartitionThresholdInBytes
    # (default 256 MB) — a hot partition under that still serializes on
    # one task while officially "not skewed". apply_skew_profile is the
    # code knob encoding this lesson (threshold 2×target, advisory =
    # target); see its docstring for when to pick it vs salted_join.
    from data_eng_project_spark.operators.skew import apply_skew_profile

    apply_skew_profile(spark, target_partition_mb=16)
    results["sort-merge, AQE skew ON, 32m threshold"] = run(
        "sort-merge, AQE skew ON, 32m thr", True, False
    )
    results["salted_join (16 salts)"] = run("salted_join (16 salts)", True, True)
    print({"n_rows": n, "hot_key_share": 0.5, **{k: round(v, 2) for k, v in results.items()}})


if __name__ == "__main__":
    main()
