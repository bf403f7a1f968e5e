"""Incremental-file ledger (reference S13/I1): exactly-once batch ingest.

The reference tracks imported files in a Redis list and loads only new
ones (``dags/global_dag.py:75-109``). Here the ledger is a small parquet
table of processed file paths; discovery is a driver-side listing (file
*names* are metadata, not data) and the "new files only" step is a
``left_anti`` join — reference J2 — executed by Spark.

The Structured Streaming twin (streaming/incremental.py) gets the same
semantics from the file-source checkpoint instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ledger_exists(path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") or f.startswith("part-") for f in os.listdir(path)
    )


def discover_files(spark: SparkSession, directory: str, suffix: str = "") -> DataFrame:
    names = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(suffix) and os.path.isfile(os.path.join(directory, f))
    )
    return spark.createDataFrame([(n,) for n in names], "file_path string")


def new_files(spark: SparkSession, directory: str, ledger_path: str, suffix: str = "") -> DataFrame:
    """Files present on disk but absent from the ledger (left_anti)."""
    discovered = discover_files(spark, directory, suffix)
    if not _ledger_exists(ledger_path):
        return discovered
    ledger = spark.read.parquet(ledger_path)
    return discovered.join(ledger, on="file_path", how="left_anti")


def mark_processed(spark: SparkSession, files: DataFrame, ledger_path: str) -> None:
    """Append the given file_path rows to the ledger."""
    files.select("file_path").write.mode("append").parquet(ledger_path)
