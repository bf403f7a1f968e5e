"""Every oracle-backed registry query must match its DuckDB oracle
exactly at sf0.001 — the local mirror of the driver's correctness gate.
Rows-only queries must at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from data_eng_project_spark.plans import REGISTRY
from tests.oracle_harness import compare

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    compare(df, sf_dir, spec.oracle)


def test_corpus_has_no_vertical_tab(spark, sf_dir):
    """Documented corpus assumption behind every \\s-tokenized oracle
    twin (functions/text.tokens): Java's \\s includes vertical tab
    \\x0B, DuckDB's RE2 \\s does not, so a document containing one
    would tokenize differently on the two engines. Pin the assumption
    to the data the oracles actually run on."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.filter(F.col("text").contains("\x0b")).count() == 0


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0
