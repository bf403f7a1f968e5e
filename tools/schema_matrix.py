"""Feature matrix: Spark output dtypes vs DuckDB oracle dtypes vs driver verdict.

Round-2 forensics: 6 in-window queries fail the driver's hash_match with
rows/schema green and a bit-identical strict-mirror compare. The remaining
hypothesis space is *type representation* divergence between the two engines
(e.g. Spark INT vs DuckDB BIGINT/HUGEINT, BOOLEAN encodings) that the driver's
hash sees but our collect()-level canonicalization does not.

This tool prints, for every graded-window query, the exact Spark simpleString
dtype and the DuckDB result dtype per column, flagged with the driver verdict
from CORRECTNESS_r02.json — so the discriminating feature pops out.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    from data_eng_project_spark.plans import REGISTRY
    from data_eng_project_spark.session import get_session
    from data_eng_project_spark.tables import TABLE_NAMES, table_path

    with open(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r02.json")) as f:
        verdicts = json.load(f)

    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(SF_DIR, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    spark = get_session()
    rows = []
    for name, spec in list(REGISTRY.items())[:50]:
        if spec.oracle is None:
            continue
        v = verdicts.get(name, {})
        tag = (
            "RED"
            if v.get("hash_match") is False
            else ("green" if v.get("hash_match") else "unseen")
        )
        try:
            sschema = {f.name: f.dataType.simpleString() for f in spec.fn(spark, SF_DIR).schema.fields}
        except Exception as e:  # noqa: BLE001
            sschema = {"<error>": str(e)}
        try:
            cur = con.execute(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
            dschema = {d[0]: str(d[1]) for d in cur.description}
        except Exception as e:  # noqa: BLE001
            dschema = {"<error>": str(e)}
        rows.append((tag, name, sschema, dschema))

    for tag, name, sschema, dschema in rows:
        print(f"[{tag}] {name}")
        for col in sorted(set(sschema) | set(dschema)):
            s, d = sschema.get(col, "-"), dschema.get(col, "-")
            mark = "" if _compat(s, d) else "   <-- MISMATCH"
            print(f"    {col:32s} spark={s:20s} duck={d}{mark}")
    con.close()
    return 0


def _compat(s: str, d: str) -> bool:
    d = d.lower()
    pairs = {
        "bigint": {"bigint", "number"},
        "int": {"integer", "int", "number"},
        "smallint": {"smallint", "number"},
        "tinyint": {"tinyint", "number"},
        "double": {"double", "float", "number"},
        "float": {"float", "real", "number"},
        "string": {"varchar", "string"},
        "boolean": {"bool", "boolean"},
        "date": {"date"},
        "timestamp": {"timestamp", "datetime"},
    }
    return d in pairs.get(s, {s})


if __name__ == "__main__":
    sys.exit(main())
