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
    new: DataFrame, existing: DataFrame, keys: str | list[str]
) -> DataFrame:
    """INSERT ... ON CONFLICT DO NOTHING as a dataflow (reference J4/S14):
    dedup new rows on the key, then keep only keys absent from existing."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return new.dropDuplicates(key_list).join(existing, on=key_list, how="left_anti")
