"""The verified query surface.

Each entry pairs a Spark DataFrame program with (where SQL-expressible)
an equivalent ANSI-SQL oracle for DuckDB. The driver (and our own
tests/test_oracle_parity.py) runs both and compares row counts, schemas,
and order-insensitive value hashes — so every query here is written for
*bit-identical* cross-engine results:

- monetary/quantity sums go through decimal casts (exact, order-free);
- double-valued outputs are rounded (haversine 3 dp, ratios/cosines 6 dp);
- every ordering used with LIMIT has a total deterministic tie-break;
- timestamps rely on session.prepare pinning the session TZ to UTC.
"""

from __future__ import annotations

from data_eng_project_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401

# Importing the modules populates REGISTRY.
from data_eng_project_spark.plans import analytics  # noqa: E402,F401
from data_eng_project_spark.plans import analytics2  # noqa: E402,F401
from data_eng_project_spark.plans import analytics3  # noqa: E402,F401
from data_eng_project_spark.plans import analytics4  # noqa: E402,F401
from data_eng_project_spark.plans import analytics5  # noqa: E402,F401
from data_eng_project_spark.plans import extensions  # noqa: E402,F401
from data_eng_project_spark.plans import flagship  # noqa: E402,F401
from data_eng_project_spark.plans import parity  # noqa: E402,F401
from data_eng_project_spark.plans import temporal  # noqa: E402,F401
from data_eng_project_spark.plans import textdata  # noqa: E402,F401
