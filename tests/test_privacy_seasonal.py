"""k-anonymity release invariant and seasonal-profile sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_eng_project_spark.plans import REGISTRY
from data_eng_project_spark.plans.privacy import K_ANON


def test_kanon_every_published_group_meets_k(spark, sf_dir):
    rel = REGISTRY["kanonymize_customer_release"].fn(spark, sf_dir)
    rows = rel.collect()
    assert rows
    # The invariant holds for EVERY published row, including the
    # level-2 fully-suppressed residual (a sub-k residual is dropped,
    # never published with n < k).
    for r in rows:
        assert r["n"] >= K_ANON, r
    # Mass accounting: everything is published except at most one
    # dropped sub-k residual (0..k-1 individuals).
    total = sum(r["n"] for r in rows)
    from data_eng_project_spark.tables import load_table

    n_customers = load_table(spark, sf_dir, "customer").count()
    assert 0 <= n_customers - total < K_ANON
    # generalized rows use the suppression marker consistently
    for r in rows:
        if r["anon_level"] == 1:
            assert r["band_q"] == "*" and r["nation_q"] != "*"
        if r["anon_level"] == 2:
            assert (r["nation_q"], r["segment_q"], r["band_q"]) == ("*", "*", "*")


def test_seasonal_profile_covers_all_slots(spark, sf_dir):
    prof = REGISTRY["hour_of_week_profile"].fn(spark, sf_dir)
    rows = prof.collect()
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hod"] <= 23 for r in rows)
    assert len(rows) > 100  # events span enough hours even at sf0.001


def test_seasonal_anomalies_nonempty_and_bounded(spark, sf_dir):
    df = REGISTRY["seasonal_anomaly_events"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 100
    assert all(abs(r["seasonal_z"]) > 2.0 for r in rows)
