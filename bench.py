#!/usr/bin/env python3
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink (full computation of
every output column, no write cost, no driver collect) — the honest
"execute the plan" measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

from data_eng_project_spark.plans import REGISTRY
from data_eng_project_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [spec for spec in REGISTRY.values() if spec.headline]
    # Warm-up pass: run every headline query once at the smallest scale
    # factor so JVM JIT + whole-stage codegen compilation are excluded
    # from the timed runs (steady-state measurement, standard bench
    # practice). Falls back to a footer read if sf0.001 is unavailable.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for spec in headline:
            try:
                spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
            spark.catalog.clearCache()
    else:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    times: dict[str, float] = {}
    for spec in headline:
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[spec.name] = round(time.perf_counter() - t0, 3)
        # Drop any operator-internal persists so queries don't interfere.
        spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
