"""Materialized shared stages — compute an expensive artifact ONCE,
persist it as parquet (the engine's own S10 staging-sink pattern), and
let every downstream consumer read the staged copy.

Why this exists: at 100 TB the near-duplicate PAIR GRAPH is the single
most expensive artifact in the system — an inverted-index set-similarity
self-join over the whole corpus (operators/dedup.ngram_jaccard_pairs).
Five heavy consumers (canonical-keep selection, PageRank, triangle
stats, soft-dedup weights, the split-leakage audit) plus the cluster
assignment all need exactly that graph; recomputing it per consumer
multiplies the dominant cost by the consumer count. Staging it turns
five O(corpus) similarity joins into one join + four parquet scans of a
pair list that is orders of magnitude smaller than the corpus.

Mechanics
- Stage files are keyed by (artifact kind, absolute source dir,
  parameters, stage version): a different corpus or threshold is a
  different artifact; bumping _STAGE_VERSION invalidates everything
  after a semantic change to the underlying operator.
- Writes are atomic: the job lands in a pid-suffixed temp dir which is
  then rename(2)d into place — a concurrent builder loses the race
  harmlessly and reads the winner's output.
- The staging root defaults to a per-host temp dir and can be pointed
  at durable storage with $SPARK_GRAFT_STAGE_DIR (on a cluster: a lake
  path, where the rename becomes the store's atomic commit).
- Source tables here are immutable benchmark snapshots, so staleness
  is governed by the key alone. For mutable corpora a consumer should
  key by snapshot/ledger version — see sources/ledger.py.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_STAGE_VERSION = 1


def stage_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_STAGE_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_stage"),
    )


def stage_path(kind: str, source_dir: str, **params) -> str:
    key = hashlib.md5(
        repr(
            (kind, os.path.abspath(source_dir), _STAGE_VERSION, sorted(params.items()))
        ).encode()
    ).hexdigest()[:16]
    return os.path.join(stage_root(), f"{kind}-{key}.parquet")


def _is_staged(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def materialize_once(df: DataFrame, path: str) -> None:
    """Write ``df`` to ``path`` unless a complete copy already exists.
    Atomic: write to a pid-suffixed temp dir, rename into place; on a
    lost race the temp copy is discarded and the winner's stands."""
    if _is_staged(path):
        return
    os.makedirs(stage_root(), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    df.write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The staged near-dup pair graph of ``sf_dir``'s documents table:
    (id_a, id_b, jaccard) from the exact PPJoin-pruned n-gram-Jaccard
    self-join. First caller materializes; everyone else scans parquet
    (doubles round-trip bit-exactly, so staged and direct results are
    identical to the oracle hash)."""
    from data_eng_project_spark.operators import dedup as D
    from data_eng_project_spark.tables import load_table

    path = stage_path("near_dup_pairs", sf_dir, n=n, threshold=threshold)
    if not _is_staged(path):
        docs = load_table(spark, sf_dir, "documents")
        pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=n, threshold=threshold)
        materialize_once(pairs, path)
    return spark.read.parquet(path).select("id_a", "id_b", "jaccard")


def dup_components(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The staged connected components (id, comp) of the near-dup pair
    graph — derived from the staged pair list, so the iterative
    min-label propagation also runs at most once per corpus."""
    from data_eng_project_spark.operators.clusters import connected_components

    path = stage_path("dup_components", sf_dir, n=n, threshold=threshold)
    if not _is_staged(path):
        pairs = near_dup_pairs(spark, sf_dir, n=n, threshold=threshold)
        materialize_once(connected_components(pairs), path)
    return spark.read.parquet(path).select("id", "comp")
