"""Similarity search over embedding columns (array<float>).

- ``cosine(a, b)``        : JVM-side cosine via zip_with + aggregate
                            (double accumulation, left-to-right — matches
                            the DuckDB oracle's evaluation order).
- ``brute_force_topk``    : exact top-k neighbors of one query vector —
                            a single scan + top-k sort; the correctness
                            baseline.
- ``all_pairs_above``     : all vector pairs with cosine ≥ τ (the
                            embedding near-dup detector). Quadratic —
                            kept for oracle checks and small dims.
- ``lsh_bucketed_topk``   : the scale path — random-hyperplane LSH:
                            sign-bit bucket per vector, candidates from
                            same-bucket (multi-probe: Hamming-adjacent)
                            join, exact cosine re-rank. Hyperplanes are
                            minted deterministically from a seed so runs
                            are reproducible.

At 100 TB the LSH variant is the only viable one: bucket join instead of
cross join, with the number of planes trading recall for bucket size.
An IVF variant (k-means coarse quantizer) would slot in the same way —
assign → equi-join on centroid id → re-rank.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double, sequential accumulation (codegen'd, no UDF)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    v = _c(a)
    return F.sqrt(F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: Column | str, b: Column | str) -> Column:
    # The norm product is nullif-guarded (the quantizer-scale idiom):
    # an all-zero vector yields NULL — explicitly, in ANSI and non-ANSI
    # sessions alike, instead of relying on non-ANSI 0/0→NULL (a vanilla
    # ANSI Spark 4 session would throw DIVIDE_BY_ZERO). Rankings over
    # this column must order NULLS LAST; threshold filters drop NULL
    # for free. NB: DuckDB's list_cosine_similarity returns -1.0 for a
    # zero vector — ranking oracles replay this guarded form instead
    # (plans/curation.py quantized_topk_agreement) so both engines
    # agree by construction.
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a single query vector (rounded 6 dp for
    cross-engine determinism; ties broken by id)."""
    scored = vectors.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), query_vec), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def all_pairs_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a, b) pairs, a < b, with cosine ≥ threshold. O(n²) — the
    exact form; use lsh variants at scale."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine("_va", "_vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def all_pairs_above_blocked(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via block-matrix multiplication
    in a vectorized Arrow/numpy stage — the dense-math scale path.

    ``all_pairs_above`` (zip_with/aggregate) evaluates one pair at a time
    in the JVM's higher-order-function interpreter: fine as the
    bit-exact oracle baseline, hopeless for dense corpora (>6 min for
    20k×20k pairs on 32 cores). Here vectors are hash-partitioned into
    ``n_blocks`` blocks; every block *pair* becomes one applyInPandas
    group whose cosine sub-matrix is a single BLAS GEMM — same exact
    semantics (same pairs; cosines agree to float ulps, and rounding is
    half-up like Spark/DuckDB), ~100× the throughput. Data replication
    is ~n_blocks× (each row joins every block-pair touching its block),
    traded against block-pair parallelism: n_blocks ≈ 2×cores/… is a
    good local default; at cluster scale size blocks so a sub-matrix
    fits an executor's memory.
    """
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    # No double-cast before the block replication: the replicated frame
    # is shuffled ~(n_blocks+1)/2× per row, so it ships the source dtype
    # (array<float> for raw embeddings — half the bytes of the widened
    # form) and the exact float64 widening happens in numpy after the
    # stack instead. float32→float64 is value-exact, so cosines are
    # bit-identical either way (A/B-verified row-identical at sf0.1).
    blk = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    bp = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    a_side = blk.join(F.broadcast(bp), blk["_blk"] == bp["bi"]).select(
        "bi", "bj", "id", "vec", F.lit("a").alias("side")
    )
    b_side = (
        blk.join(F.broadcast(bp), blk["_blk"] == bp["bj"])
        .filter(F.col("bi") != F.col("bj"))
        .select("bi", "bj", "id", "vec", F.lit("b").alias("side"))
    )
    rep = a_side.unionByName(b_side)

    def gemm(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # `same` comes from the GROUP KEY, never from the data: inferring
        # it as "all rows are side a" misfires when block j is EMPTY —
        # the (i, j) group then re-emitted block i's internal pairs once
        # per empty partner block (duplicate pairs on small/skewed
        # corpora — r5 review).
        same = key[0] == key[1]
        a = pdf[pdf["side"] == "a"]
        b = a if same else pdf[pdf["side"] == "b"]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        A = np.stack(a["vec"].to_numpy()).astype(np.float64, copy=False)
        B = A if same else np.stack(b["vec"].to_numpy()).astype(np.float64, copy=False)
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B if same else B / np.linalg.norm(B, axis=1, keepdims=True)
        C = An @ (An if same else Bn).T
        # Sign-aware half-up round to 6 dp (HALF_UP = away from zero,
        # matching Spark/DuckDB for negative cosines too — the
        # floor(x+0.5) shortcut rounded -0.0000005 the wrong way and
        # silently relied on threshold > 0).
        C = np.where(C >= 0, np.floor(C * 1e6 + 0.5), np.ceil(C * 1e6 - 0.5)) / 1e6
        ia, ib = np.nonzero(C >= threshold)
        ids_a = a["id"].to_numpy()[ia]
        ids_b = (a if same else b)["id"].to_numpy()[ib]
        keep = ids_a < ids_b  # dedup within-block mirror pairs & self-pairs
        lo = np.minimum(ids_a, ids_b)[keep if same else slice(None)]
        hi = np.maximum(ids_a, ids_b)[keep if same else slice(None)]
        cs = C[ia, ib][keep if same else slice(None)]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cs})

    return (
        rep.groupBy("bi", "bj")
        .applyInPandas(gemm, schema="id_a long, id_b long, cosine double")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG-based; no
    numpy dependency needed, reproducible across runs/machines)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            # Box-Muller-free symmetric value in [-1, 1)
            row.append(state / float(1 << 30) - 1.0)
        planes.append(row)
    return planes


def signature_bits(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as a long (bit i = sign of v·plane_i)."""
    sig = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(_c(vec_col), lit_plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(d >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sig


def lsh_bucketed_pairs(
    vectors: DataFrame,
    threshold: float,
    n_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_hamming: int = 2,
) -> DataFrame:
    """Approximate near-neighbor pairs: same/adjacent LSH bucket, exact
    cosine re-rank. Multi-probe via banding: split the n_planes-bit
    signature into (max_hamming+1) bands — pairs within Hamming
    max_hamming share ≥1 exact band (pigeonhole).

    ``dim`` defaults to the data's actual vector length (one-row probe).
    A stale explicit dim smaller than the real length used to NULL the
    zip_with dot products, zero every signature, and silently degrade
    the bucketed join into a full cross join (r5 review)."""
    if dim is None:
        first = vectors.select(F.size(F.col(vec_col)).alias("_d")).first()
        if first is None or first["_d"] is None:
            raise ValueError("lsh_bucketed_pairs: empty vectors input")
        dim = int(first["_d"])
    planes = _hyperplanes(dim, n_planes, seed)
    sig = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        signature_bits(vec_col, planes).alias("sig"),
    )
    bands = max_hamming + 1
    width = max(1, n_planes // bands)
    banded = sig.select(
        "id",
        "vec",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("s"),
    ).select("id", "vec", "sig", "s.band", "s.bv")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bv"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.vec").alias("_va"),
            F.col("y.id").alias("id_b"),
            F.col("y.vec").alias("_vb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("cosine", F.round(cosine("_va", "_vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_assign(
    vectors: DataFrame,
    n_clusters: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
):
    """IVF coarse quantizer: k-means fit on a seeded SAMPLE of the corpus
    (pyspark.ml — the fit is distributed), then one narrow map assigns
    every vector to its nearest centroid. Fitting on a sample is the
    100 TB design: the quantizer only needs the coarse density shape, so
    the fit pass shrinks ~1/fraction while the full-corpus assignment —
    the part that must see every row — stays a single projection. The
    assignment column is what you'd persist as the index.

    ``fit_fraction=None`` auto-sizes: aim at ~200 sample points per
    centroid, floored at 10% so tiny test corpora still converge.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    if fit_fraction is None:
        n = feat.count()
        target = 200 * n_clusters
        fit_fraction = 1.0 if n <= target else max(0.1, target / n)
    fit_set = (
        feat if fit_fraction >= 1.0 else feat.sample(fraction=fit_fraction, seed=seed)
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="_features", predictionCol="_cluster"
    ).fit(fit_set)
    assigned = model.transform(feat).select(id_col, vec_col, "_cluster")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def _driver_cos(a: list[float], b: list[float]) -> float:
    """Driver-side cosine for centroid ranking (centroid lists are
    n_clusters×dim floats — dimension-sized, never corpus data)."""
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return d / (na * nb)


def _probe_clusters(
    centroids: list[list[float]], query: list[float], n_probe: int
) -> list[int]:
    """The ``n_probe`` cluster ids whose centroids are most cosine-
    similar to the query — shared by ivf_topk and ivf_pq_topk so the
    probe-selection rule cannot drift between the two IVF entry points."""
    ranked = sorted(
        range(len(centroids)), key=lambda i: -_driver_cos(query, centroids[i])
    )
    return ranked[:n_probe]


def ivf_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``n_probe`` clusters whose
    centroids are most cosine-similar to the query, brute-force only
    inside them. Scan cost drops by ~n_probe/n_clusters vs exact; recall
    is tested against brute_force_topk in tests/test_operators.py."""
    assigned, centroids = ivf_assign(vectors, n_clusters, seed, id_col, vec_col)
    probe = _probe_clusters(centroids, query, n_probe)
    cands = assigned.filter(F.col("_cluster").isin(probe))
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return brute_force_topk(cands, qcol, k=k, id_col=id_col, vec_col=vec_col)


def semdedup(
    vectors: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.45,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    with a coarse k-means, compare pairs ONLY within a cluster, and mark
    every vector whose cosine to a lower-id cluster-mate exceeds the
    threshold as a semantic duplicate (keep = the lowest id of each
    near-duplicate group, matching the paper's keep-one policy).

    Scale design: the quadratic term is bounded per cluster — k-means
    with k ∝ corpus_size/target_cluster_size keeps expected cluster
    sizes constant, so total pair work is linear in the corpus. The
    within-cluster pair join is an equi-join on the cluster id (one
    shuffle); the per-pair cosine is a codegen'd zip_with fold, no
    Python. Returns (id, cluster, is_dup) for every vector — the keep
    set is the is_dup=false slice.
    """
    assigned, _ = ivf_assign(
        vectors, n_clusters=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    xs = assigned.select(
        F.col(id_col).alias("_id"),
        F.col("_cluster"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    a = xs.select(F.col("_cluster"), F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = xs.select(F.col("_cluster"), F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    dup_ids = (
        a.join(b, on="_cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine("_va", "_vb"), 6) >= F.lit(threshold))
        .select(F.col("id_b").alias("_dup"))
        .distinct()
    )
    return xs.join(
        dup_ids, xs["_id"] == dup_ids["_dup"], how="left"
    ).select(
        F.col("_id").alias(id_col),
        F.col("_cluster").alias("cluster"),
        F.col("_dup").isNotNull().alias("is_dup"),
    )


def pq_train_encode(
    vectors: DataFrame,
    m: int = 4,
    nbits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
):
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split each (L2-normalized) vector
    into ``m`` subvectors and vector-quantize each subspace with its own
    2^nbits-centroid codebook. A vector becomes m small codes —
    m·nbits bits instead of 4·dim bytes (768-dim float32 ≈ 3 KB → 8
    bytes at m=16/nbits=4), which is what makes billion-vector ANN fit
    in memory at 100 TB corpus scale.

    Codebooks fit on a seeded sample (the IVF design, ivf_assign);
    encoding chains the m KMeans transforms over one DataFrame — one
    pass, no joins. Returns (encoded_df with a ``_codes`` array<int>
    column alongside the original columns, codebooks[m][2^nbits][dsub]).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = vectors.select(vec_col).head()
    if first is None or first[0] is None:
        raise ValueError("pq_train_encode: empty vectors input")
    dim = len(first[0])  # 1-row driver peek: schema-level metadata
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    k = 1 << nbits

    # Zero-norm guard: x / 0 is NULL element-wise and array_to_vector
    # raises on NULLs deep inside the KMeans job (r5 review) — a
    # zero-norm vector stays the zero vector instead.
    nrm = norm(vec_col)
    df = vectors.withColumn(
        "_nv",
        F.when(
            nrm > 0,
            F.transform(F.col(vec_col).cast("array<double>"), lambda x: x / nrm),
        ).otherwise(
            F.transform(
                F.col(vec_col).cast("array<double>"), lambda x: x * F.lit(0.0)
            )
        ),
    )
    for j in range(m):
        df = df.withColumn(
            f"_f{j}", array_to_vector(F.slice("_nv", j * dsub + 1, dsub))
        )
    if fit_fraction is None:
        n = df.count()
        target = 200 * k
        fit_fraction = 1.0 if n <= target else max(0.1, target / n)
    fit_set = df if fit_fraction >= 1.0 else df.sample(fraction=fit_fraction, seed=seed)
    fit_set = fit_set.cache()
    codebooks = []
    for j in range(m):
        model = KMeans(
            k=k, seed=seed + j, featuresCol=f"_f{j}", predictionCol=f"_c{j}"
        ).fit(fit_set)
        codebooks.append([list(map(float, c)) for c in model.clusterCenters()])
        df = model.transform(df)
    fit_set.unpersist()
    encoded = df.withColumn(
        "_codes", F.array(*[F.col(f"_c{j}") for j in range(m)])
    ).drop("_nv", *[f"_f{j}" for j in range(m)], *[f"_c{j}" for j in range(m)])
    return encoded, codebooks


def _adc_shortlist_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    m: int,
    nbits: int,
    rerank_factor: int,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ADC serving path (pq_topk and pq_load_topk): normalize the
    query, build the m·2^nbits lookup table of per-subspace dot products
    on the driver, score codes with zip_with/element_at, take the
    rerank_factor·k shortlist deterministically, and exact-rerank. ONE
    copy of the j·2^nbits+c+1 index arithmetic, so a fix to the scoring
    or tie-break cannot reach only one of the two entry points
    (r5 review)."""
    import math as _m

    kk = 1 << nbits
    qn = _m.sqrt(sum(x * x for x in query)) or 1.0
    q = [x / qn for x in query]
    dsub = len(query) // m
    flat: list[float] = []
    for j, book in enumerate(codebooks):
        qs = q[j * dsub : (j + 1) * dsub]
        for cent in book:
            flat.append(sum(a * b for a, b in zip(qs, cent)))
    table = F.array(*[F.lit(float(x)) for x in flat])
    idx = F.zip_with(
        "_codes",
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, j: F.element_at(table, (j * kk + c + 1).cast("int")),
    )
    adc = F.aggregate(idx, F.lit(0.0), lambda acc, x: acc + x)
    cands = (
        encoded.withColumn("_adc", adc)
        .orderBy(F.col("_adc").desc(), F.col(id_col).asc())
        .limit(rerank_factor * k)
        .drop("_adc", "_codes")
    )
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return brute_force_topk(cands, qcol, k=k, id_col=id_col, vec_col=vec_col)


def pq_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    m: int = 4,
    nbits: int = 4,
    rerank_factor: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation over PQ
    codes: the query is NOT quantized — per subspace, a 2^nbits-entry
    lookup table of ⟨query_sub, centroid⟩ dot products is built on the
    driver (m·2^nbits floats — broadcast as a literal array into
    codegen), and a vector's approximate cosine is m array lookups + a
    fold, never touching the stored floats. The top rerank_factor·k by
    ADC score are re-ranked with exact cosine.

    Scan cost per vector: m element_at + adds (vs dim multiplies);
    memory: codes only. The exact re-rank bounds the approximation —
    recall vs brute_force_topk is asserted in tests.
    """
    encoded, codebooks = pq_train_encode(
        vectors, m=m, nbits=nbits, seed=seed, id_col=id_col, vec_col=vec_col
    )
    return _adc_shortlist_topk(
        encoded, codebooks, query, m, nbits, rerank_factor, k, id_col, vec_col
    )


def ivf_pq_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 4,
    nbits: int = 4,
    rerank_factor: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN composite — IVF's coarse
    quantizer prunes the corpus to ``n_probe``/``n_clusters`` of its
    rows, PQ's ADC scores the survivors from codes alone, and exact
    cosine re-ranks the shortlist. Scan cost ≈ (n_probe/n_clusters) ×
    (m lookups per row); memory ≈ codes + cluster ids. (Production
    IVF-PQ trains PQ on residuals from the coarse centroid; scoring
    normalized vectors directly keeps this composition exact-twin
    testable while preserving the cost shape.)"""
    assigned, centroids = ivf_assign(
        vectors, n_clusters, seed, id_col, vec_col
    )
    probe = _probe_clusters(centroids, query, n_probe)
    cands = assigned.filter(F.col("_cluster").isin(probe)).drop("_cluster")
    return pq_topk(
        cands,
        query,
        k=k,
        m=m,
        nbits=nbits,
        rerank_factor=rerank_factor,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )


def pq_save_index(
    vectors: DataFrame,
    index_dir: str,
    m: int = 4,
    nbits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist a PQ index: codes as parquet (id + codes + the original
    vector for exact re-rank) and the codebooks as a tiny JSON sidecar.
    Build once, serve many — training the codebooks is the expensive
    sampled k-means pass; queries against a saved index never refit, so
    serving latency is scan+ADC only (pq_load_topk)."""
    import json
    import os

    encoded, codebooks = pq_train_encode(
        vectors, m=m, nbits=nbits, seed=seed, id_col=id_col, vec_col=vec_col
    )
    encoded.select(id_col, vec_col, "_codes").write.mode("overwrite").parquet(
        os.path.join(index_dir, "codes")
    )
    with open(os.path.join(index_dir, "codebooks.json"), "w") as f:
        json.dump({"m": m, "nbits": nbits, "codebooks": codebooks}, f)


def pq_load_topk(
    spark,
    index_dir: str,
    query: list[float],
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from a saved PQ index: ADC lookup table from the
    sidecar codebooks, scan the codes parquet, exact re-rank the
    shortlist — no k-means, no training data needed at query time."""
    import json
    import os

    with open(os.path.join(index_dir, "codebooks.json")) as f:
        meta = json.load(f)
    encoded = spark.read.parquet(os.path.join(index_dir, "codes"))
    return _adc_shortlist_topk(
        encoded, meta["codebooks"], query, meta["m"], meta["nbits"],
        rerank_factor, k, id_col, vec_col,
    )


def knn_join_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_query_blocks: int = 4,
    n_corpus_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_match_col: str | None = None,
) -> DataFrame:
    """Exact bipartite k-NN join via block-matrix multiplication: every
    (query-block, corpus-block) pair is one applyInPandas group whose
    cosine sub-matrix is a single BLAS GEMM, emitting that block's
    per-query top-k; a final window over the n_corpus_blocks·k
    candidates per query selects the global top-k. The two-stage top-k
    is what makes this scale: the shuffle after the GEMM stage carries
    k rows per (query, corpus-block), never the full similarity matrix.

    Same exactness contract as all_pairs_above_blocked: cosines agree
    with the sequential JVM fold to float ulps and are half-up rounded
    to 6 dp; ties break on corpus id, so results are deterministic.
    At cluster scale, size blocks so one sub-matrix (|q-block|×|c-block|
    doubles) fits an executor; corpus replication is n_query_blocks×.

    Returns (qid, cid, cosine, rank) with rank 1..k per query.
    """
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    tag = (
        F.col(exclude_match_col).cast("string")
        if exclude_match_col is not None
        else F.lit(None).cast("string")
    )
    # Source dtype rides the replication shuffle (array<float> is half
    # the widened form's bytes; mixed float/double sides still widen in
    # the union, exactly as before); the value-exact float64 widening
    # happens in numpy after the stack — see all_pairs_above_blocked.
    qb = queries.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_query_blocks)).alias("_qb"),
        F.lit("q").alias("side"),
        tag.alias("tag"),
    )
    cb = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_corpus_blocks)).alias("_cb"),
        F.lit("c").alias("side"),
        tag.alias("tag"),
    )
    grid = spark.createDataFrame(
        [(i, j) for i in range(n_query_blocks) for j in range(n_corpus_blocks)],
        "bq int, bc int",
    )
    q_rep = qb.join(F.broadcast(grid), qb["_qb"] == grid["bq"]).select(
        "bq", "bc", "id", "vec", "side", "tag"
    )
    c_rep = cb.join(F.broadcast(grid), cb["_cb"] == grid["bc"]).select(
        "bq", "bc", "id", "vec", "side", "tag"
    )
    rep = q_rep.unionByName(c_rep)
    kk = int(k)

    def gemm_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["side"] == "q"]
        c = pdf[pdf["side"] == "c"]
        if len(q) == 0 or len(c) == 0:
            return pd.DataFrame({"qid": [], "cid": [], "cosine": []})
        Q = np.stack(q["vec"].to_numpy()).astype(np.float64, copy=False)
        C = np.stack(c["vec"].to_numpy()).astype(np.float64, copy=False)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        S = Qn @ Cn.T
        S = np.where(S >= 0, np.floor(S * 1e6 + 0.5), np.ceil(S * 1e6 - 0.5)) / 1e6
        # A zero-norm vector (failed/padded embedding) yields NaN
        # cosines; left in place, a NaN reaching the k-th slot made
        # `tied = S >= kth` all-False and silently dropped EVERY
        # candidate for that query/block (r5 review). Park NaNs at the
        # -2.0 sentinel — below any real cosine — and filter them after
        # the window, matching the exact twin where a NULL cosine pair
        # simply never ranks.
        S = np.where(np.isnan(S), -2.0, S)
        if exclude_match_col is not None:
            # mask same-tag pairs (e.g. same label for hard-negative
            # mining) below any real cosine so they never reach top-k.
            # NULL tags follow SQL semantics (tag_q <> tag_c is NULL →
            # pair dropped), matching the exact hard_negative_topk twin:
            # a null-tag row on either side contributes no pairs.
            qt = q["tag"].to_numpy()
            ct = c["tag"].to_numpy()
            q_null = pd.isna(qt)
            c_null = pd.isna(ct)
            masked = (
                (qt[:, None] == ct[None, :])
                | q_null[:, None]
                | c_null[None, :]
            )
            S = np.where(masked, -2.0, S)
        top = min(kk, S.shape[1])
        # Block-local top-k per query row under the SAME total order the
        # global window uses: (cosine DESC, cid ASC). argpartition alone
        # breaks k-th-place ties by array position — if two candidates
        # tie on the rounded cosine at the block-local boundary, it may
        # keep the larger cid and silently drop the candidate the global
        # contract selects. So: argpartition for the O(m) cut, then
        # widen to EVERY candidate tied with the k-th value, then a
        # deterministic lexsort of that small set.
        part = np.argpartition(-S, top - 1, axis=1)[:, :top]
        qids, cids, coss = [], [], []
        c_ids = c["id"].to_numpy()
        q_ids = q["id"].to_numpy()
        for r in range(S.shape[0]):
            kth = S[r, part[r]].min()
            tied = np.flatnonzero(S[r] >= kth)
            order = np.lexsort((c_ids[tied], -S[r, tied]))[:top]
            cols = tied[order]
            qids.extend([q_ids[r]] * len(cols))
            cids.extend(c_ids[cols])
            coss.extend(S[r, cols])
        return pd.DataFrame({"qid": qids, "cid": cids, "cosine": coss})

    cand = rep.groupBy("bq", "bc").applyInPandas(
        gemm_topk, schema="qid long, cid long, cosine double"
    )
    # Drop sentinel cells (masked same-tag pairs AND NaN zero-norm
    # cosines) — real cosines are ≥ -1.0, the sentinel is -2.0.
    cand = cand.filter(F.col("cosine") > -1.5)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("qid", "cid", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def hard_negative_topk(
    vectors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every vector,
    the k most-cosine-similar vectors carrying a DIFFERENT label — the
    near-miss negatives that make a contrastive/metric-learning batch
    informative (easy random negatives teach nothing).

    Exact O(n²) formulation with the sequential JVM cosine fold, the
    oracle-checkable baseline twin of ``all_pairs_above``: ranking is on
    the 6-dp-rounded cosine with id tie-break, so the order is
    bit-stable across engines. At corpus scale swap the cross join for
    ``knn_join_blocked`` (GEMM blocks) with an over-fetch + label
    filter, or restrict queries to the current training batch — the
    mining pattern is per-batch, so the query side is small by
    construction and the corpus side broadcasts per block.

    Returns (qid, cid, label_q, label_c, cosine, rank), rank 1..k.
    """
    from pyspark.sql import Window

    a = vectors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("_va"),
        F.col(label_col).alias("label_q"),
    )
    b = vectors.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("_vb"),
        F.col(label_col).alias("label_c"),
    )
    scored = (
        a.crossJoin(b)
        .filter(F.col("label_q") != F.col("label_c"))
        .withColumn("cosine", F.round(cosine("_va", "_vb"), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.select(
            "qid",
            "cid",
            "label_q",
            "label_c",
            "cosine",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def ann_recall_report(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 4,
    nbits: int = 4,
    rerank_factor: int = 4,
    seed: int = 42,
    contracts: dict[str, float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_recall: bool = False,
    n_planes: int = 16,
    max_hamming: int = 2,
) -> DataFrame:
    """Measured recall@k of the four ANN serving paths (IVF, PQ,
    IVF-PQ, hyperplane-LSH) against the exact blocked-GEMM k-NN, as one
    auditable row per method — the evidence that justifies serving from
    a sampled quantizer / signature index at 100 TB, in the shape a
    driver can grade (the minhash_accuracy_report pattern: exact-side
    facts a SQL oracle recomputes independently, plus the
    measured-recall contract as a boolean; the sketch side itself is
    not SQL-reproducible and stays observable through the boolean's
    inputs).

    Index semantics, not per-query refits: IVF is fitted ONCE
    (ivf_assign) and PQ is fitted ONCE on the full corpus
    (pq_train_encode), then every query is served from the fitted
    structures — the report deliberately deviates from ivf_pq_topk's
    per-call candidate-set PQ fit because a production index is built
    once and serves many queries; fitting per query would grade a
    configuration nobody ships. Per-query driver state is bounded:
    |query_ids| vectors (the serving-path shape — queries arrive
    driver-side by construction), n_clusters centroids, m·2^nbits
    codebook entries.

    Plan shape: ONE distributed plan per method, no per-query loops —
    probe/ADC tables become |queries|-row broadcast frames joined on
    qid/cluster, per-query top-k is a qid-partitioned rank (scale-with-
    data key; the rank<=k filter compiles to WindowGroupLimit), and the
    final report joins ≤ 3·|queries|·k candidate rows against the
    |queries|·k exact rows.

    Returns (method, n_queries, k, exact_rows, recall_ok), one row per
    method in {'ivf', 'pq', 'ivfpq', 'lsh'}."""
    spark = vectors.sparkSession
    # Validate the caller's value BEFORE defaulting: an explicitly
    # passed empty dict is a caller error, not a request for the full
    # default method set (r10 advice — `contracts or {...}` silently
    # converted {} into all four methods).
    if contracts is not None and not contracts:
        raise ValueError("ann_recall_report: contracts must not be empty")
    if contracts is None:
        contracts = {"ivf": 0.5, "pq": 0.5, "ivfpq": 0.3, "lsh": 0.3}
    unknown = set(contracts) - {"ivf", "pq", "ivfpq", "lsh"}
    if unknown:
        raise ValueError(f"ann_recall_report: unknown methods: {sorted(unknown)}")
    kk = 1 << nbits

    qrows = (
        vectors.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    if len(qrows) != len(set(query_ids)):
        missing = set(map(int, query_ids)) - {int(r["qid"]) for r in qrows}
        raise ValueError(f"ann_recall_report: query ids not found: {sorted(missing)}")
    qvecs = {int(r["qid"]): [float(x) for x in r["qv"]] for r in qrows}
    qdf = F.broadcast(
        spark.createDataFrame(
            [(q, v) for q, v in sorted(qvecs.items())], "qid long, _q array<double>"
        )
    )

    # Exact side: bipartite blocked-GEMM k-NN of the query set against
    # the full corpus (rounded-cosine DESC, cid ASC — the contract every
    # approximate method is graded against).
    exact = knn_join_blocked(
        vectors.filter(F.col(id_col).isin(list(qvecs))),
        vectors,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    ).select("qid", "cid")

    def _topk_per_qid(scored: DataFrame, limit: int) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(
            F.col("_score").desc(), F.col(id_col).asc()
        )
        return scored.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= limit
        )

    def _exact_rerank(cands: DataFrame) -> DataFrame:
        scored = cands.join(qdf, "qid").select(
            "qid",
            F.col(id_col),
            F.round(cosine(vec_col, "_q"), 6).alias("_score"),
        )
        return _topk_per_qid(scored, k).select("qid", F.col(id_col).alias("cid"))

    # Each method computes only when its contract is requested: the
    # quantizer fits (ivf_assign's k-means, pq_train_encode) are EAGER
    # pyspark.ml actions, so an uncontracted method would still pay its
    # fit if built unconditionally. IVF structures serve 'ivf'+'ivfpq';
    # PQ codebooks serve 'pq'+'ivfpq'.
    results: dict[str, DataFrame] = {}
    need_ivf = "ivf" in contracts or "ivfpq" in contracts
    need_pq = "pq" in contracts or "ivfpq" in contracts

    # --- IVF: one fit, one probe table for all queries. ---
    if need_ivf:
        assigned, centroids = ivf_assign(
            vectors, n_clusters=n_clusters, seed=seed, id_col=id_col, vec_col=vec_col
        )
        probe_df = F.broadcast(
            spark.createDataFrame(
                [
                    (q, int(c))
                    for q, v in sorted(qvecs.items())
                    for c in _probe_clusters(centroids, v, n_probe)
                ],
                "qid long, _cluster int",
            )
        )
    if "ivf" in contracts:
        ivf_cands = assigned.join(probe_df, "_cluster").select("qid", id_col, vec_col)
        results["ivf"] = _exact_rerank(ivf_cands)

    # --- PQ: one codebook fit; per-query ADC lookup tables as a
    # broadcast frame (m·2^nbits doubles per query). ---
    if need_pq:
        encoded, codebooks = pq_train_encode(
            vectors, m=m, nbits=nbits, seed=seed, id_col=id_col, vec_col=vec_col
        )

        def _adc_table(query: list[float]) -> list[float]:
            qn = math.sqrt(sum(x * x for x in query)) or 1.0
            q = [x / qn for x in query]
            dsub = len(query) // m
            flat: list[float] = []
            for j, book in enumerate(codebooks):
                qs = q[j * dsub : (j + 1) * dsub]
                for cent in book:
                    flat.append(sum(a * b for a, b in zip(qs, cent)))
            return flat

        tables_df = F.broadcast(
            spark.createDataFrame(
                [(q, _adc_table(v)) for q, v in sorted(qvecs.items())],
                "qid long, _tbl array<double>",
            )
        )
        adc = F.aggregate(
            F.zip_with(
                "_codes",
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda c, j: F.element_at(F.col("_tbl"), (j * kk + c + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

        def _adc_shortlist(cands: DataFrame) -> DataFrame:
            scored = cands.join(tables_df, "qid").select(
                "qid", id_col, vec_col, adc.alias("_score")
            )
            return _topk_per_qid(scored, rerank_factor * k).select(
                "qid", id_col, vec_col
            )

    if "pq" in contracts:
        pq_all = encoded.crossJoin(tables_df.select("qid")).select(
            "qid", id_col, vec_col, "_codes"
        )
        results["pq"] = _exact_rerank(_adc_shortlist(pq_all))

    # --- IVF-PQ: probe the IVF clusters, ADC-score only the survivors
    # from the SAME fitted codebooks, exact-rerank the shortlist. ---
    if "ivfpq" in contracts:
        ivfpq_cands = (
            assigned.join(probe_df, "_cluster")
            .select("qid", id_col)
            .join(encoded.select(id_col, vec_col, "_codes"), id_col)
        )
        results["ivfpq"] = _exact_rerank(_adc_shortlist(ivfpq_cands))

    # --- LSH: hyperplane signatures banded exactly like
    # lsh_bucketed_pairs (bands = max_hamming+1 of n_planes/bands bits;
    # candidates within Hamming max_hamming share ≥1 exact band), but
    # BIPARTITE: the |queries| signatures are computed driver-side with
    # the same left-to-right dot accumulation as signature_bits (bit-
    # identical double sums) and broadcast as (qid, band, bv) rows, so
    # the corpus side is one banded equi-join — no per-query loop, no
    # corpus cross join. Candidates get the same exact cosine rerank
    # as every other method. ---
    if "lsh" in contracts:
        dim = len(next(iter(qvecs.values())))
        planes = _hyperplanes(dim, n_planes, seed)
        bands_n = max_hamming + 1
        # Integer division drops the trailing n_planes % bands_n bits
        # from every band — intentional, matching lsh_bucketed_pairs'
        # banding exactly (the two must agree for the contract to grade
        # the serving path). The unbanded top bits are computed but
        # never steer candidate generation; they slightly RAISE band
        # collision rates vs a full partition, i.e. more candidates,
        # never fewer — recall can only gain, and the exact rerank
        # discards the extras.
        width = max(1, n_planes // bands_n)
        corpus_banded = (
            vectors.select(
                id_col, vec_col, signature_bits(vec_col, planes).alias("_sig")
            )
            .select(
                id_col,
                vec_col,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.shiftright(F.col("_sig"), b * width)
                                .bitwiseAND(F.lit((1 << width) - 1))
                                .alias("bv"),
                            )
                            for b in range(bands_n)
                        ]
                    )
                ).alias("s"),
            )
            .select(id_col, vec_col, "s.band", "s.bv")
        )

        def _py_sig(v: list[float]) -> int:
            sig = 0
            for i, plane in enumerate(planes):
                d = 0.0
                for x, p in zip(v, plane):
                    d += x * p
                if d >= 0:
                    sig |= 1 << i
            return sig

        qband_rows = [
            (q, b, (_py_sig(v) >> (b * width)) & ((1 << width) - 1))
            for q, v in sorted(qvecs.items())
            for b in range(bands_n)
        ]
        qbands = F.broadcast(
            spark.createDataFrame(qband_rows, "qid long, band int, bv long")
        )
        lsh_cands = (
            corpus_banded.join(qbands, ["band", "bv"])
            .select("qid", id_col, vec_col)
            .distinct()
        )
        results["lsh"] = _exact_rerank(lsh_cands)

    parts = [
        res.select(F.lit(name).alias("method"), "qid", "cid")
        for name, res in sorted(results.items())
    ]
    ann = parts[0]
    for p_ in parts[1:]:
        ann = ann.unionByName(p_)
    ex_stats = exact.agg(
        F.count_distinct(F.col("qid")).cast("bigint").alias("n_queries"),
        F.count(F.lit(1)).cast("bigint").alias("exact_rows"),
    )
    hits = ann.join(exact, ["qid", "cid"]).groupBy("method").agg(
        F.count(F.lit(1)).alias("_n_hit")
    )
    methods = spark.createDataFrame(
        sorted(contracts.items()), "method string, _contract double"
    )
    recall = F.coalesce(F.col("_n_hit"), F.lit(0)).cast("double") / F.col(
        "exact_rows"
    )
    out = [
        F.col("method"),
        F.col("n_queries"),
        F.lit(int(k)).cast("bigint").alias("k"),
        F.col("exact_rows"),
        (recall >= F.col("_contract")).alias("recall_ok"),
    ]
    if include_recall:
        # Measured recall as a raw double — for tests and scale probes
        # only; data-dependent, so NOT part of the oracle-compared
        # report shape.
        out.append(F.round(recall, 6).alias("recall"))
    return (
        methods.join(hits, "method", "left")
        .crossJoin(F.broadcast(ex_stats))
        .select(*out)
    )


def all_pairs_above_collapsed(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs with EXACT-DUPLICATE VECTOR
    CLASSES COLLAPSED FIRST — the embedding-modality twin of
    dedup.ngram_jaccard_pairs_collapsed. Re-ingested shards, mirrored
    pages, and default/failed-encoder vectors produce byte-identical
    embeddings at corpus scale, and the all-pairs contract is then the
    problem itself: a class of k identical vectors contributes
    k·(k−1)/2 pairs AND k copies of every cross-class near-dup pair —
    no blocking can save a quadratic OUTPUT (measured on the replica
    lakes: embeddings replicate byte-identically in BOTH probe
    regimes, BASELINE.md round 8).

    Stage 1 groups by the raw vector value (exact float equality —
    byte-identical duplicates; near-identical vectors are exactly what
    stage 2 measures) keeping min(id) as the representative and the
    class size; the vector IS the grouping key, so one hash aggregate
    does representative + size with no struct trick needed. Stage 2
    runs the blocked-GEMM all-pairs over REPRESENTATIVES only. Output
    is one row per near-dup CLASS pair with both class sizes and the
    implied member-pair count; intra-class exact pairs are exact
    dedup's business, not similarity's.

    Returns (id_a, id_b, cosine, n_vecs_a, n_vecs_b, n_vec_pairs),
    id_a < id_b (representative ids)."""
    reps = vectors.groupBy(F.col(vec_col)).agg(
        F.min(F.col(id_col)).alias(id_col),
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
    )
    pairs = all_pairs_above_blocked(
        reps, threshold, n_blocks=n_blocks, id_col=id_col, vec_col=vec_col
    )
    sz = reps.select(id_col, "n_vecs")
    return (
        pairs.join(
            sz.withColumnsRenamed({id_col: "id_a", "n_vecs": "n_vecs_a"}), "id_a"
        )
        .join(sz.withColumnsRenamed({id_col: "id_b", "n_vecs": "n_vecs_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            "cosine",
            "n_vecs_a",
            "n_vecs_b",
            (F.col("n_vecs_a") * F.col("n_vecs_b")).cast("bigint").alias("n_vec_pairs"),
        )
    )


def semdedup_accuracy_report(
    vectors: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.45,
    seed: int = 42,
    recall_contract: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_metrics: bool = False,
) -> DataFrame:
    """Measured precision/recall of SemDeDup's cluster-restricted dup
    set against the EXACT global near-dup set at the same threshold —
    the evidence that cluster-bounding the quadratic term (the whole
    reason semdedup scales to 100 TB) loses only the cross-cluster
    borderline pairs, in the driver-gradable shape of
    ann_recall_report: facts a SQL oracle recomputes independently
    (corpus size, the exact dup-id count) plus contract booleans whose
    Spark-side inputs are measured, not asserted.

    Ground truth: an id is an exact dup iff SOME lower-id vector's
    rounded cosine ≥ threshold (the keep-lowest-id policy applied with
    no cluster restriction), computed by the blocked-GEMM all-pairs —
    exact math, not a sketch. SemDeDup's flagged set is by construction
    a SUBSET of it (a within-cluster pair IS a global pair), so
    precision is provably 1.0 and ``precision_exact`` grades that the
    implementation preserves the invariant; ``recall_ok`` grades the
    measured recall against a contract pinned far below the measured
    floor (recall is data-dependent; the sharp values stay pinned in
    tests). An empty exact dup set grades recall_ok vacuously true.

    One distributed plan: the semdedup flags and the exact dup ids are
    two single-shuffle aggregates joined on id; the three counts are
    1-row frames crossJoined broadcast-style, the ann_recall_report
    shape. Scale posture: the exact side is the quadratic baseline you
    run on an AUDIT SAMPLE at 100 TB, not the corpus — the report's
    job is to certify the cheap path, so it is sized for the sample
    tier (sf-scale corpora here), while the semdedup side itself stays
    linear-total-work at any scale.

    Returns one row: (n_vectors, n_exact_dups, precision_exact,
    recall_ok) [+ n_sem_dups, n_hits, recall with include_metrics]."""
    sem = semdedup(
        vectors,
        n_clusters=n_clusters,
        threshold=threshold,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
    exact_dup_ids = (
        all_pairs_above_blocked(
            vectors, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
        .select(F.col("id_b").alias("_eid"))
        .distinct()
    )
    joined = sem.join(
        exact_dup_ids, sem[id_col] == exact_dup_ids["_eid"], how="left"
    ).select(
        F.col("is_dup"), F.col("_eid").isNotNull().alias("_is_exact")
    )
    # coalesce(sum, 0): an empty corpus must report zeros and vacuous
    # truth, not NULL-valued booleans.
    counts = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.coalesce(F.sum(F.col("_is_exact").cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("n_exact_dups"),
        F.coalesce(F.sum(F.col("is_dup").cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("n_sem_dups"),
        F.coalesce(
            F.sum((F.col("is_dup") & F.col("_is_exact")).cast("bigint")), F.lit(0)
        )
        .cast("bigint")
        .alias("n_hits"),
    )
    recall = F.col("n_hits").cast("double") / F.col("n_exact_dups")
    out = [
        F.col("n_vectors"),
        F.col("n_exact_dups"),
        (F.col("n_hits") == F.col("n_sem_dups")).alias("precision_exact"),
        (
            (F.col("n_exact_dups") == 0) | (recall >= F.lit(float(recall_contract)))
        ).alias("recall_ok"),
    ]
    if include_metrics:
        # Raw measured values — for tests and scale probes only;
        # data-dependent, so NOT part of the oracle-compared shape.
        out += [
            F.col("n_sem_dups"),
            F.col("n_hits"),
            F.round(recall, 6).alias("recall"),
        ]
    return counts.select(*out)
