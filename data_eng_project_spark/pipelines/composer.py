"""Declarative pipeline composition — the engine's user-facing surface
for building curation flows without writing DataFrame code.

A pipeline is a list of ``{"stage": name, **params}`` dicts (exactly
what a YAML/JSON config deserializes to). ``compose`` folds the stages
over a documents DataFrame into ONE lazy plan — no materialization
between stages, so Catalyst sees the whole program: filters collapse
into the scan, shared subtrees stay shared, and a 10-stage pipeline
still compiles to the same handful of shuffles the handwritten
composition gets (pipelines/corpus.py is the handwritten twin; the
registered query asserts the two agree through one oracle).

The reference's equivalent is the Airflow DAG wiring of
``dags/global_dag.py:343-347,463-468`` — tasks passing files through
disk between every stage. Here the "DAG" is the logical plan itself.

Stages operate on the canonical documents schema (doc_id, source, text,
lang, n_chars, ...) and must return a DataFrame with the same identity
column; filter stages shrink rows, transform stages may rewrite
columns. Register new stages with @stage — the registry is the
extension point.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGES: dict[str, Callable[..., DataFrame]] = {}


def stage(name: str):
    def deco(fn: Callable[..., DataFrame]):
        STAGES[name] = fn
        return fn

    return deco


@stage("lang_filter")
def _lang_filter(df: DataFrame, lang: str = "en") -> DataFrame:
    """Keep documents the heuristic language ID predicts as ``lang``."""
    from data_eng_project_spark.operators.textops import language_id

    keep = language_id(df).filter(F.col("lang_pred") == lang).select("doc_id")
    return df.join(keep, on="doc_id")


@stage("min_words")
def _min_words(df: DataFrame, n: int = 20) -> DataFrame:
    """Keep documents with at least ``n`` whitespace tokens."""
    return df.filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= n)


@stage("dedup_exact")
def _dedup_exact(df: DataFrame) -> DataFrame:
    """Keep the canonical (minimum-id) copy of each exact-content group."""
    from data_eng_project_spark.operators.dedup import exact_dedup

    canon = exact_dedup(df, "text", "doc_id").select(
        F.col("canonical_id").alias("doc_id")
    )
    return df.join(canon, on="doc_id")


@stage("pii_redact")
def _pii_redact(df: DataFrame) -> DataFrame:
    """Rewrite text with emails/phones/IPv4s replaced by category tags
    (transform stage — imports the SAME regex constants as
    operators/curation.pii_scan so the scan's hit counts and this
    redaction can never drift apart)."""
    from data_eng_project_spark.operators.curation import PII_EMAIL, PII_IPV4, PII_PHONE

    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
        PII_IPV4,
        "[IP]",
    )
    return df.withColumn("text", redacted)


@stage("mixture_sample")
def _mixture_sample(df: DataFrame, modulus: int = 100, keep_lt: int = 50) -> DataFrame:
    """Deterministic hash-mod downsampling (see operators/curation.
    mixture_sample): keep doc when md5_bucket(doc_id, modulus) <
    keep_lt — reproducible on any cluster, pushdown-able."""
    from data_eng_project_spark.functions.hashing import md5_bucket

    return df.filter(md5_bucket("doc_id", modulus) < keep_lt)


def compose(docs: DataFrame, spec: list[dict]) -> DataFrame:
    """Fold a stage spec over ``docs`` into one lazy plan."""
    out = docs
    for step in spec:
        params = {k: v for k, v in step.items() if k != "stage"}
        name = step["stage"]
        if name not in STAGES:
            raise KeyError(f"unknown stage {name!r}; known: {sorted(STAGES)}")
        out = STAGES[name](out, **params)
    return out


@stage("near_dedup")
def _near_dedup(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    staged_corpus_dir: str | None = None,
) -> DataFrame:
    """Drop non-canonical members of near-dup clusters: exact
    n-gram-Jaccard pairs (PPJoin-pruned) → connected components → keep
    each component's minimum id. Runs on whatever rows reach this
    stage, so place it after the cheap filters.

    ``staged_corpus_dir``: when the stage's input is a SUBSET of that
    corpus's documents table, the pair list is taken from the staged
    corpus pair graph (pipelines/staging.py) restricted to pairs whose
    BOTH endpoints survive to this stage — exactly equal to recomputing
    on the subset, because Jaccard is a pairwise property. Components
    are still computed on the restricted pair list (subset components
    can split relative to full-corpus components, so the restriction
    must happen first). At 100 TB this removes the one corpus-scale
    similarity join from every release pipeline run."""
    from data_eng_project_spark.operators.clusters import connected_components
    from data_eng_project_spark.operators.dedup import ngram_jaccard_pairs

    if staged_corpus_dir is not None:
        from data_eng_project_spark.pipelines.staging import near_dup_pairs

        ids = df.select("doc_id")
        staged = near_dup_pairs(
            df.sparkSession, staged_corpus_dir, n=n, threshold=threshold
        )
        pairs = staged.join(
            ids.withColumnRenamed("doc_id", "id_a"), on="id_a", how="left_semi"
        ).join(ids.withColumnRenamed("doc_id", "id_b"), on="id_b", how="left_semi")
    else:
        pairs = ngram_jaccard_pairs(df, "text", "doc_id", n=n, threshold=threshold)
    comps = connected_components(pairs)
    drop = comps.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    return df.join(drop, on="doc_id", how="left_anti")


@stage("split_tag")
def _split_tag(df: DataFrame, train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Tag every row with its deterministic train/val/test split
    (transform stage — adds a ``split`` column, drops nothing)."""
    from data_eng_project_spark.operators.curation import split_column

    return df.withColumn("split", split_column("doc_id", train_pct, val_pct))
