"""Embedding linear-algebra plans: PCA scree and projection over the
embeddings table (operators/linalg.py). Rows-only at the driver — the
eigendecomposition has no SQL twin — with exact numpy-twin parity and
moment/variance invariants pytest-checked (tests/test_linalg.py); the
covariance statistic they consume IS oracle-certified separately
(plans/textdata.embedding_covariance)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_project_spark.operators.linalg import fit_pca, pca_variance_report, project
from data_eng_project_spark.plans.registry import register
from data_eng_project_spark.session import prepare
from data_eng_project_spark.tables import load_table


@register(
    "embedding_pca_scree",
    oracle=None,  # driver-side eigh; covariance input is oracle-checked
    tags=("embedding", "linalg", "pca"),
)
def embedding_pca_scree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 eigenvalues of the embedding covariance with explained /
    cumulative variance — the scree table a curation pipeline reads
    before choosing a reduced dimension."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_variance_report(emb, k=8)


@register(
    "pca_trace_report",
    # The eigendecomposition itself has no SQL twin (why the scree/
    # projection queries are rows-only), but its defining invariant
    # does: tr(C) = Σλ. The oracle recomputes the trace via the
    # certified exact-decimal moment route (embedding_covariance /
    # embedding_health_report arithmetic, folded in dimension order on
    # both engines) and asserts the eigensum/orthonormality contract
    # booleans — the minhash_accuracy_report / ann_recall_report
    # pattern applied to the linalg family.
    oracle="""
        WITH x AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   unnest(CAST(embedding AS DOUBLE[])) AS v
            FROM embeddings
        ), s AS (
            SELECT i, count(*) AS n,
                   sum(CAST(v AS DECIMAL(28,12))) AS sd,
                   sum(CAST(v * v AS DECIMAL(38,18))) AS ss
            FROM x GROUP BY i
        ), pv AS (
            SELECT i, CAST(ss AS DOUBLE) / n
                      - (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n)
                          AS var
            FROM s
        ), tr AS (
            SELECT list_aggregate(list(var ORDER BY i), 'sum') AS trace
            FROM pv
        ), meta AS (
            SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(max(len(embedding)) AS BIGINT) AS dim
            FROM embeddings
        )
        SELECT meta.n_vecs, meta.dim,
               round(tr.trace, 6) + 0.0 AS total_variance,
               TRUE AS eigensum_matches_trace,
               TRUE AS components_orthonormal
        FROM meta CROSS JOIN tr
    """,
    tags=("linalg", "embedding", "pca", "evaluation"),
)
def pca_trace_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible PCA quality evidence: the covariance trace
    (oracle-recomputed, exact-decimal route) vs the eigenvalue sum of
    the fitted decomposition, plus top-8 component orthonormality —
    converting the rows-only PCA family's numpy-twin trust into a
    graded accuracy contract (see operators/linalg.pca_trace_report)."""
    prepare(spark)
    from data_eng_project_spark.operators.linalg import pca_trace_report

    return pca_trace_report(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_pca_project",
    oracle=None,  # projection of a driver-fit basis; numpy-twin pytest
    tags=("embedding", "linalg", "pca"),
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-4 principal components
    (centered GEMM per Arrow batch, zero shuffle): (vec_id, pc1..pc4),
    rounded 6 dp under the canonical component signs so repeated runs
    are bit-stable."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, _ = fit_pca(emb, k=4)
    proj = project(emb, mean, comps)
    return proj.select(
        "vec_id",
        *[
            F.round(F.element_at("pc", i + 1), 6).alias(f"pc{i + 1}")
            for i in range(4)
        ],
    ).orderBy("vec_id")


@register(
    "embedding_health_report",
    # The exact decimal sums are aggregated ONCE in `s` and the derived
    # mean/variance doubles computed ONCE in `m` — previously the same
    # sum/mean expression was spelled out four times (and sum-of-squares
    # twice), inviting a precision tweak to reach only some copies
    # (r5 review). The double op order is unchanged, so results are
    # bit-identical.
    oracle="""
        WITH x AS (
            SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        ), s AS (
            SELECT dim, count(*) AS n,
                   sum(CAST(val AS DECIMAL(28,12))) AS sd,
                   sum(CAST(val * val AS DECIMAL(38,18))) AS ss,
                   min(val) AS mn, max(val) AS mx,
                   sum(CASE WHEN val = 0.0 THEN 1 ELSE 0 END) AS nz
            FROM x GROUP BY dim
        ), m AS (
            SELECT *, CAST(sd AS DOUBLE) / n AS mean_d,
                   sqrt(greatest(
                       CAST(ss AS DOUBLE) / n
                       - (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n),
                       0.0)) AS std_d
            FROM s
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(n AS BIGINT) AS n_vecs,
               round(mean_d, 6) + 0.0 AS mean,
               round(std_d, 6) + 0.0 AS std,
               round(mn, 6) + 0.0 AS min_val,
               round(mx, 6) + 0.0 AS max_val,
               round(CAST(nz AS DOUBLE) / n, 6) AS zero_frac,
               std_d < 1e-6 AS near_constant
        FROM m
    """,
    tags=("linalg", "embedding", "quality"),
)
def embedding_health_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QA (collapsed/dead/un-normalized
    coordinate screen) — exact decimal-accumulated moments, one
    map-side-combinable aggregate over the posexploded coordinates."""
    prepare(spark)
    from data_eng_project_spark.operators.linalg import embedding_health_report

    return embedding_health_report(load_table(spark, sf_dir, "embeddings"))


_KM_SEED_H = (
    "CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)

# One Lloyd iteration as a SQL fragment pair: distances from centroid
# table c{t}, argmin assignment a{t+1}, then (except the last round)
# per-component means m{t+1} and the COALESCE-patched centroid c{t+1}.
# The decimal accumulation / round(·,9) expression trees are the same
# ones operators/clusters.kmeans_lloyd runs — see its docstring.


def _km_iter_sql(t: int, last: bool) -> str:
    s = f"""
        d{t + 1} AS (
            SELECT x.vec_id, c.cluster,
                   SUM(CAST((x.vi - c.ci) * (x.vi - c.ci) AS DECIMAL(38,12))) AS d2
            FROM xl x JOIN c{t} c ON x.i = c.i
            GROUP BY x.vec_id, c.cluster
        ),
        a{t + 1} AS (
            SELECT vec_id, cluster, d2
            FROM d{t + 1}
            QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) = 1
        )"""
    if not last:
        s += f""",
        m{t + 1} AS (
            SELECT a.cluster, x.i,
                   round(CAST(SUM(CAST(x.vi AS DECIMAL(38,12))) AS DOUBLE)
                         / COUNT(*), 9) AS ci
            FROM a{t + 1} a JOIN xl x ON x.vec_id = a.vec_id
            GROUP BY a.cluster, x.i
        ),
        c{t + 1} AS (
            SELECT c.cluster, c.i, COALESCE(m.ci, c.ci) AS ci
            FROM c{t} c LEFT JOIN m{t + 1} m
              ON m.cluster = c.cluster AND m.i = c.i
        )"""
    return s


_KM_ITERS = 3

_KMEANS_ORACLE = (
    f"""
    WITH xl AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS vi
        FROM embeddings
    ),
    seeds AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY {_KM_SEED_H} ASC, vec_id ASC) AS cluster
        FROM embeddings
        QUALIFY cluster <= 8
    ),
    c0 AS (
        SELECT s.cluster, x.i, x.vi AS ci
        FROM seeds s JOIN xl x ON x.vec_id = s.vec_id
    ),"""
    + ",".join(
        _km_iter_sql(t, last=(t == _KM_ITERS - 1)) for t in range(_KM_ITERS)
    )
    + f"""
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           round(CAST(d2 AS DOUBLE), 6) + 0.0 AS dist2
    FROM a{_KM_ITERS}
    """
)


@register(
    "kmeans_embedding_clusters",
    oracle=_KMEANS_ORACLE,
    tags=("embedding", "clustering", "kmeans", "similarity"),
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means (k=8, 3 iterations, md5-rank seed
    draw) over the embeddings table: (vec_id, cluster, dist2) for every
    vector — the coarse quantizer / semantic-bucketing fit, graded
    bit-for-bit against a DuckDB oracle that unrolls the identical
    three iterations as CTEs (the pagerank-oracle technique applied to
    an iterative ML fit). Exactness discipline and 100 TB shape:
    operators/clusters.kmeans_lloyd docstring."""
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    from data_eng_project_spark.operators.clusters import kmeans_lloyd

    out = kmeans_lloyd(emb, id_col="vec_id", vec_col="embedding", k=8, iters=_KM_ITERS)
    return out.select(F.col("id").alias("vec_id"), "cluster", "dist2")


@register(
    "pca_projection_agreement_report",
    # Graded contract for the rows-only PCA PROJECTION pair (VERDICT
    # r10 task 8): pca_trace_report grades the moments/eigensum; this
    # row grades the basis and the projection itself via a fixed-seed
    # power-iteration twin (an independent algorithm — see
    # operators/linalg.pca_projection_agreement_report). The oracle
    # recomputes n_vecs/dim exactly and asserts the agreement booleans.
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(max(len(embedding)) AS BIGINT) AS dim,
               CAST(4 AS BIGINT) AS k,
               TRUE AS basis_agreement_ok,
               TRUE AS eigenvalue_agreement_ok,
               TRUE AS projection_agreement_ok
        FROM embeddings
    """,
    tags=("linalg", "embedding", "pca", "evaluation"),
)
def pca_projection_agreement_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible PCA projection evidence: eigh basis vs fixed-seed
    power-iteration twin — basis cosine + eigenvalue spectrum (Rayleigh
    quotients, the r12 scree-dimension extension) + distributed
    worst-coordinate projection agreement (one centered GEMM with the
    difference matrix), completing the graded-contract coverage of the
    rows-only PCA family (embedding_pca_scree / embedding_pca_project)."""
    prepare(spark)
    from data_eng_project_spark.operators.linalg import (
        pca_projection_agreement_report,
    )

    return pca_projection_agreement_report(
        load_table(spark, sf_dir, "embeddings"), k=4
    )
