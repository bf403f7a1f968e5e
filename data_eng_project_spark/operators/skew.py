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
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, on=[on, "_salt"], how=how).drop("_salt")
