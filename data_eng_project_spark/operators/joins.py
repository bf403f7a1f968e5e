"""Core join operators (reference J1-J4, SURVEY.md §2.3).

Each is a thin, intention-revealing composition of DataFrame joins; the
physical strategy (broadcast vs sort-merge vs shuffled-hash) is left to
Catalyst/AQE, with an explicit ``broadcast()`` hint where the reference's
own semantics guarantee a small build side (the ~35k-row geo dimension,
reference ``dags/global_dag.py:129,133-134`` — a hand-rolled driver-side
dict lookup that is literally a broadcast hash join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Map-side equi-join against a small dimension (reference J1).

    ``how='inner'`` reproduces the reference's drop-on-miss semantics
    ("Missing codes would lead to the death data being dropped",
    reference ``docs/Report.md:72``).
    """
    return facts.join(F.broadcast(dim), on=on, how=how)


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """left MINUS-by-key right (reference J2 — incremental-file ledger)."""
    return left.join(right, on=on, how="left_anti")


def union_with_discriminator(
    frames: Sequence[tuple[DataFrame, str]], discriminator_col: str
) -> DataFrame:
    """Union heterogeneous-source frames, tagging provenance (reference J3:
    nuclear ∪ thermal with a literal 'NUCLEAR'/'THERMAL' tag, reference
    ``dags/global_dag.py:199-213``). Uses unionByName so column order per
    source is irrelevant."""
    tagged = [df.withColumn(discriminator_col, F.lit(tag)) for df, tag in frames]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out


def upsert_anti_join(
    new: DataFrame,
    existing: DataFrame,
    keys: str | list[str],
    order_by: str | list[str] | None = None,
) -> DataFrame:
    """INSERT ... ON CONFLICT DO NOTHING as a dataflow (reference J4/S14):
    dedup new rows on the key, then keep only keys absent from existing.

    The within-key dedup is DETERMINISTIC (same discipline as
    plans/parity.dedup_first_wins): ``dropDuplicates`` keeps a
    partition-order-dependent survivor, so two runs over identically
    keyed rows with different payloads could upsert different payloads.
    Survivor = first row by ``order_by`` (ascending, nulls first), or by
    all non-key columns when omitted — exact duplicates then tie
    harmlessly. Non-orderable payload types (maps) need an explicit
    ``order_by``."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return deterministic_dedup(new, key_list, order_by).join(
        existing, on=key_list, how="left_anti"
    )


def deterministic_dedup(
    df: DataFrame, keys: list[str], order_by: str | list[str] | None = None
) -> DataFrame:
    """One survivor per key with a DETERMINISTIC choice (first by
    ``order_by`` asc-nulls-first, default all non-key columns) — the
    replacement for ``dropDuplicates`` wherever the surviving payload is
    observable output (upserts, idempotent sinks): dropDuplicates keeps
    whichever row a partition happens to deliver first."""
    from pyspark.sql import Window

    if order_by is None:
        order_cols = [c for c in df.columns if c not in keys]
    else:
        order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(
        *([F.col(c).asc_nulls_first() for c in order_cols] or [F.lit(1)])
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Bloom-filter pre-join pruning (Bloom 1970; the DataFrame-algebra form of
# Spark's own runtime row-level filtering). Spark injects these filters
# automatically only under narrow plan shapes; building one explicitly in
# the dataflow makes the pruning portable, oracle-checkable, and tunable.
# Cross-engine-reproducible hashing (md5 prefix → integer, the same bridge
# operators/textops.feature_hash_doc_vectors uses), 32-bit words in BIGINT
# so shifts never touch the sign bit on either engine.

BLOOM_BITS = 1 << 16  # 65,536 bits — ~8 KB; scale with build-side NDV
BLOOM_WORDS = BLOOM_BITS // 32
BLOOM_SEEDS = 3


def _bloom_hash(key: Column, seed: int) -> Column:
    """Seeded 32-bit hash of a key column: md5 of 'key#seed', first 8 hex
    digits, mod the filter width. Identical strings hash identically on
    any engine with md5."""
    s = F.concat_ws("#", key.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint") % BLOOM_BITS


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """(word_idx int, word bigint): the Bloom bitset over the build-side
    key set, as ≤``BLOOM_WORDS`` rows — one distinct + one explode + one
    bit_or aggregate. At any scale this output is ~8 KB and broadcasts."""
    k = F.col(key_col)
    bits = keys.select(k).distinct().select(
        F.explode(
            F.array(*[_bloom_hash(k, j).alias(f"h{j}") for j in range(BLOOM_SEEDS)])
        ).alias("idx")
    )
    return (
        bits.select(
            (F.col("idx") / 32).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe_keys(probe: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Tag each distinct probe key with ``bloom_pass``: true iff every
    seeded bit is set. The bitset joins by word index with an explicit
    broadcast — the big side never shuffles, which is the entire point
    of the operator at 100 TB: the filter rides to the data."""
    k = F.col(key_col)
    exploded = probe.select(k).distinct().select(
        key_col,
        F.explode(
            F.array(*[_bloom_hash(k, j).alias(f"h{j}") for j in range(BLOOM_SEEDS)])
        ).alias("idx"),
    ).select(
        key_col,
        (F.col("idx") / 32).cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))").alias(
            "mask"
        ),
    )
    hit = (
        exploded.join(F.broadcast(bloom), on="word_idx", how="left")
        .withColumn(
            "bit_set",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))) != 0,
        )
        .groupBy(key_col)
        .agg(F.bool_and("bit_set").alias("bloom_pass"))
    )
    return hit
