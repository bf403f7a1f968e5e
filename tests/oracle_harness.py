"""Local mirror of the driver's DuckDB-oracle comparison: run a registry
query on Spark and its oracle SQL on DuckDB over the same parquet tables,
then compare column sets, row counts, and exact (order-insensitive)
values. Stricter than a hash: on mismatch it reports the first differing
rows for debugging.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

import duckdb

from data_eng_project_spark.tables import TABLE_NAMES, table_path


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    # Round-2 forensics (tools/driver_audit.py): an oracle whose DuckDB
    # result carries HUGEINT (sum(BIGINT) -> INT128) or DECIMAL hashes
    # differently at the driver's Arrow layer while fetchall() hides it.
    # Fail fast here so CI catches the class at sf0.001.
    bad = [
        (c, t)
        for c, t, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
        if t in ("HUGEINT", "UHUGEINT", "UBIGINT") or t.startswith("DECIMAL")
    ]
    assert not bad, f"oracle emits driver-hash-unsafe types (cast to BIGINT/DOUBLE): {bad}"
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    """Normalize a scalar for exact cross-engine comparison. Every
    return value is a (tag, payload) tuple so mixed None/value columns
    stay totally ordered under sort (None sorts first via the empty
    tag)."""
    if v is None:
        return ("", "")
    if isinstance(v, _dec.Decimal):
        # Compare by exact numeric value, not scale representation.
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return ("o", repr(v))


def compare(spark_df, sf_dir: str, oracle: str) -> None:
    o_cols, o_rows = run_oracle(sf_dir, oracle)
    s_cols = spark_df.columns
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert len(s_rows) == len(o_rows), f"row counts differ: {len(s_rows)} vs {len(o_rows)}"
    # Align column order by name.
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted(tuple(_norm(r[i]) for i in s_idx) for r in s_rows)
    o_set = sorted(tuple(_norm(r[i]) for i in o_idx) for r in o_rows)
    if s_set != o_set:
        diffs = [(a, b) for a, b in zip(s_set, o_set) if a != b][:5]
        only_s = [r for r in s_set if r not in set(o_set)][:3]
        only_o = [r for r in o_set if r not in set(s_set)][:3]
        raise AssertionError(
            f"values differ (cols sorted={sorted(s_cols)}):\n"
            f"first aligned diffs: {diffs}\n"
            f"spark-only: {only_s}\noracle-only: {only_o}"
        )
