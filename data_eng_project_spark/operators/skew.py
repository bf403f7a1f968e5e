"""Skew mitigation for large joins: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one key dominates so
heavily that even split partitions bottleneck a single executor —
classic in proximity joins (dense cities) and token joins (stopwords).

``salted_join`` replicates the *small* side N ways and scatters the big
side's hot keys across N salt buckets, turning one monster partition
into N even ones. Results are identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on a skewed key, salted ``num_salts`` ways.

    big gets a random-but-deterministic salt per row (hash of the full
    row modulo N — no rand(), so retries/speculative tasks agree);
    small is exploded across all N salts. The join key becomes
    (key, salt), distributing a hot key over N partitions.

    Only ``inner`` and ``left`` preserve the unsalted join's semantics:
    the big side keeps one salt per row (so its unmatched rows emit
    exactly once under 'left'), but each SMALL row exists in N salted
    copies — a 'right'/'full' join would null-extend every unmatched
    copy and multiply the small side's unmatched output N×. Those modes
    are rejected rather than silently wrong; put the preserved side on
    the big (salted-once) side instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            f"small side is replicated {num_salts}x, so right/full would "
            "emit each unmatched small row once per salt copy"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, on=[on, "_salt"], how=how).drop("_salt")


def apply_skew_profile(spark, target_partition_mb: int = 32) -> None:
    """Tune AQE's skew-join splitting for MODERATE skew — the measured
    lesson from tools/skew_probe.py (BASELINE.md, round-3 skew probe):
    AQE only splits a join partition larger than
    ``skewedPartitionThresholdInBytes`` (default 256 MB) AND larger
    than ``skewedPartitionFactor`` × the median partition — so a
    160 MB hot partition serializes on one task while officially "not
    skewed". On the probe fixture, lowering the threshold recovered
    −53% wall time; salting recovered −34% with no threshold at all.

    This sets the threshold to ``2 × target_partition_mb`` and the
    advisory split size to ``target_partition_mb`` (AQE requires
    advisory < threshold for a split to trigger). Size
    ``target_partition_mb`` to what one executor core should chew —
    32 MB is right when partitions must fit comfortably in task memory
    alongside the build side.

    Selection guidance (which tool, when):

    - **default AQE** — unknown or mild skew; zero cost, splits only
      catastrophic (>256 MB) partitions.
    - **apply_skew_profile** — moderate, *data-dependent* skew you've
      observed (one partition ≫ median but under 256 MB). Runtime
      re-planning, no query rewrite, works for every join in the
      session.
    - **salted_join** — a *known-hot* key (stopword tokens, a dense
      city, a null-heavy FK) so extreme that even split partitions
      bottleneck, or when AQE is unavailable (non-last-stage shuffles,
      some streaming joins). Deterministic, threshold-free, but costs
      a num_salts× replication of the small side — keep that side
      genuinely small.
    """
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        f"{2 * target_partition_mb}m",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        f"{target_partition_mb}m",
    )
