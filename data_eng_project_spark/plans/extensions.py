"""Streaming + multimodal queries.

``streaming_hourly_counts`` actually executes a Structured Streaming job
(AvailableNow trigger, memory sink) and is checked against the *batch*
SQL oracle — the strongest parity statement we can make for streaming:
the stream's final state equals the batch answer.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from data_eng_project_spark.operators.multimodal import attach_fake_media, extract_media_meta
from data_eng_project_spark.plans.registry import register
from data_eng_project_spark.session import prepare
from data_eng_project_spark.streaming.incremental import read_events_stream
from data_eng_project_spark.streaming.windows import hourly_counts_stream, run_available_now
from data_eng_project_spark.tables import load_table, table_path


@register(
    "streaming_hourly_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("streaming", "window"),
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation run to completion
    with Trigger.AvailableNow; final state must equal the batch oracle."""
    prepare(spark)
    stream = read_events_stream(spark, table_path(sf_dir, "events"))
    agg = hourly_counts_stream(stream)
    return run_available_now(agg, f"mem_hourly_{uuid.uuid4().hex[:8]}")


@register(
    "multimodal_media_meta",
    oracle=None,  # binary + mapInPandas plumbing; deterministic fake decode
    tags=("multimodal",),
)
def multimodal_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media columns → typed metadata via Arrow-batched
    mapInPandas (decode is a deterministic stub — no codecs in this
    container; the Spark plumbing is real)."""
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_meta(attach_fake_media(docs))
