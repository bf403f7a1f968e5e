"""data_eng_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference ETL pipeline (M4TTRX/data-eng-project — an
Airflow/pandas/Redis/Postgres batch pipeline, see SURVEY.md), re-expressed
as declarative DataFrame programs that Catalyst/Tungsten can optimize,
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB lakehouse pipeline needs.

Layout:
    session.py    — SparkSession builder with scale-appropriate defaults
    tables.py     — loaders for the benchmark parquet tables
    functions/    — scalar expression helpers (dates, geo, hashing, text)
    sources/      — readers: CSV, fixed-width, JSON, incremental ledger
    operators/    — joins, spatial proximity join, dedup family,
                    similarity search, text analysis, idempotent sink
    pipelines/    — reference-parity end-to-end pipelines (deaths, plants)
    plans/        — the verified query surface (queries + DuckDB oracles)
    streaming/    — Structured Streaming incremental ingest + windowed aggs
"""

__version__ = "0.1.0"
