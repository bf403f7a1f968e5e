"""Unit tests for operators/datasetops.py — the properties the oracle
parity check can't see: exact-k selection, PPS proportionality, OLS on
known-truth data, probability normalization, diff classification
completeness, normalization monotonicity, one-keep-per-component.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_eng_project_spark.operators.datasetops import (
    cluster_representatives,
    groupwise_ols,
    pps_systematic_sample,
    quantile_normalize,
    snapshot_diff,
    transition_matrix,
)


def test_pps_uniform_weights_picks_exactly_k_evenly(spark):
    # 100 rows, weight 1 each → exactly k picks, every 10th row.
    df = spark.range(100).select(
        F.lit("s").alias("src"), F.col("id"), F.lit(1).alias("w")
    )
    out = pps_systematic_sample(df, "w", "src", "id", k_per_stratum=10).collect()
    assert len(out) == 10
    assert sorted(r["id"] for r in out) == [9, 19, 29, 39, 49, 59, 69, 79, 89, 99]
    assert sorted(r["pick_index"] for r in out) == list(range(1, 11))


def test_pps_heavy_row_always_selected_once(spark):
    # One row holds >2/10 of the mass: PPS must select it (certainty
    # item) but only once, so fewer than k rows come back.
    rows = [("s", i, 1) for i in range(20)] + [("s", 99, 30)]
    df = spark.createDataFrame(rows, "src string, id long, w long")
    out = pps_systematic_sample(df, "w", "src", "id", k_per_stratum=10)
    picked = {r["id"] for r in out.collect()}
    assert 99 in picked
    assert len(picked) < 10 + 1 or len(picked) == len(set(picked))


def test_pps_strata_independent(spark):
    df = spark.createDataFrame(
        [("a", i, i + 1) for i in range(50)] + [("b", i, 1) for i in range(5)],
        "src string, id long, w long",
    )
    out = pps_systematic_sample(df, "w", "src", "id", k_per_stratum=5)
    counts = {r["stratum"]: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert counts["b"] == 5  # uniform small stratum: exactly k
    assert 1 <= counts["a"] <= 5


def test_groupwise_ols_recovers_known_line(spark):
    # y = 3x + 7 exactly → slope 3, intercept 7 (x is the rank index).
    rows = [("u", i, 3.0 * i + 7.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = groupwise_ols(df, "k", ["t"], "v", min_n=3).collect()
    assert len(out) == 1
    assert out[0]["slope"] == pytest.approx(3.0, abs=1e-6)
    assert out[0]["intercept"] == pytest.approx(7.0, abs=1e-6)


def test_groupwise_ols_min_n_filter(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 1.0)], "k string, t long, v double"
    )
    out = groupwise_ols(df, "k", ["t"], "v", min_n=3)
    assert out.count() == 0


def test_transition_matrix_probs_normalize(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, s string")
    out = transition_matrix(df, "k", ["t"], "s")
    sums = out.groupBy("from_state").agg(F.sum("prob").alias("p")).collect()
    for r in sums:
        assert r["p"] == pytest.approx(1.0, abs=1e-5)
    got = {(r["from_state"], r["to_state"]): r["n_transitions"] for r in out.collect()}
    assert got[("a", "b")] == 2  # both keys a→b
    assert got[("b", "a")] == 1  # only key 1 (key 2 history ends at b)


def test_snapshot_diff_classifies_all_cases(spark):
    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)],
        "k long, s string, p double",
    )
    b = spark.createDataFrame(
        [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0), (5, "n", 5.0)],
        "k long, s string, p double",
    )
    out = {
        r["change_type"]: r
        for r in snapshot_diff(a, b, "k", ["s", "p"]).collect()
    }
    assert out["removed"]["n_rows"] == 1       # key 1
    assert out["added"]["n_rows"] == 1         # key 5
    assert out["changed"]["n_rows"] == 2       # key 3 (p), key 4 (NULL→w)
    assert out["unchanged"]["n_rows"] == 1     # key 2
    assert out["changed"]["n_changed_p"] == 1
    assert out["changed"]["n_changed_s"] == 1  # null-safe: NULL→'w' counts


def test_quantile_normalize_single_stratum_is_identity(spark):
    # One stratum: within-stratum rank IS the global rank → identity map.
    df = spark.createDataFrame(
        [(i, "s", (i * 37) % 100) for i in range(50)], "id long, src string, sc long"
    )
    out = quantile_normalize(df, "sc", "src", "id")
    assert out.filter(F.col("norm_score") != F.col("score")).count() == 0


def test_quantile_normalize_monotone_within_stratum(spark):
    df = spark.createDataFrame(
        [(i, "a", i) for i in range(30)] + [(100 + i, "b", i * 1000) for i in range(10)],
        "id long, src string, sc long",
    )
    out = quantile_normalize(df, "sc", "src", "id").collect()
    for stratum in ("a", "b"):
        rows = sorted(
            (r for r in out if r["stratum"] == stratum), key=lambda r: r["src_rank"]
        )
        norms = [r["norm_score"] for r in rows]
        assert norms == sorted(norms)  # rank-monotone mapping


def test_cluster_representatives_one_keep_per_component(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 30), (4, 99), (5, 7)], "doc_id long, q long"
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, comp long"  # docs 4,5 singleton
    )
    out = cluster_representatives(docs, comps, "doc_id", "q")
    keeps = out.filter("keep").groupBy("component").count().collect()
    assert all(r["count"] == 1 for r in keeps)
    kept = {r["component"]: r["id"] for r in out.filter("keep").collect()}
    assert kept[1] == 2  # highest quality in the component, not lowest id
    assert kept[4] == 4 and kept[5] == 5  # singletons survive


def test_fuzzy_pairs_no_cartesian_and_symmetric_contract(spark):
    from data_eng_project_spark.operators.datasetops import fuzzy_name_pairs

    df = spark.createDataFrame(
        [("red widget",), ("red gadget",), ("blue bolt",), ("red widget",)],
        "n string",
    )
    out = fuzzy_name_pairs(df, "n", max_distance=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    rows = out.collect()
    got = {(r["name_a"], r["name_b"]): r["distance"] for r in rows}
    assert got == {("red gadget", "red widget"): 2}  # blue bolt shares no token


def test_chunker_tiles_documents_exactly(spark):
    from data_eng_project_spark.operators.datasetops import chunk_documents

    # 130 tokens, window 50, stride 40 → n_chunks = (130-50+39)//40+1 = 3;
    # the last window [80,130) lands exactly on the end — no short tail.
    text = " ".join(f"t{i}" for i in range(130))
    df = spark.createDataFrame([(1, text), (2, "a b c")], "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", window=50, stride=40).collect()
    d1 = sorted((r for r in out if r["id"] == 1), key=lambda r: r["chunk_idx"])
    assert [(r["start_tok"], r["end_tok"]) for r in d1] == [
        (0, 50), (40, 90), (80, 130)
    ]
    # coverage: union of [start,end) spans [0,130) with no gap
    covered = set()
    for r in d1:
        covered.update(range(r["start_tok"], r["end_tok"]))
    assert covered == set(range(130))
    d2 = [r for r in out if r["id"] == 2]
    assert len(d2) == 1 and d2[0]["n_chunk_tokens"] == 3


def test_incremental_join_view_merge_equals_recompute(spark):
    from data_eng_project_spark.operators.datasetops import (
        incremental_join_view_merge,
    )

    fact = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)], "k long, fk long, v double"
    )
    dim = spark.createDataFrame([(i, i % 2) for i in range(5)], "fk long, g long")
    old = fact.filter("k < 70")
    delta = fact.filter("k >= 70")
    old_state = (
        old.join(dim, "fk").groupBy("g").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("total"),
        )
    )
    merged = incremental_join_view_merge(old_state, delta, dim, "fk", "g", "v")
    full = (
        fact.join(dim, "fk").groupBy("g").agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("total"),
        )
    )
    got = {r["g"]: (r["n_rows"], r["total"]) for r in merged.collect()}
    want = {r["g"]: (r["n_rows"], r["total"]) for r in full.collect()}
    assert got == want


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from data_eng_project_spark.operators.clusters import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]  # triangle + pendant
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}

    # numpy twin: identical symmetrized graph, damping, iterations
    sym = set()
    for a, b in edges:
        sym.add((a, b)); sym.add((b, a))
    nodes = sorted({x for e in sym for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    out_deg = {a: sum(1 for x, _ in sym if x == a) for a in nodes}
    for a, b in sym:
        M[idx[b], idx[a]] = 1.0 / out_deg[a]
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1 - 0.85) / n + 0.85 * (M @ r)
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
