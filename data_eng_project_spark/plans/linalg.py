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
