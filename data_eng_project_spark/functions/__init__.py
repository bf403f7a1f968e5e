"""Scalar expression helpers — all built on pyspark.sql.functions so every
expression stays JVM-side inside whole-stage codegen (no Python UDFs in the
hot path)."""

from data_eng_project_spark.functions.dates import parse_date_multi  # noqa: F401
from data_eng_project_spark.functions.geo import (  # noqa: F401
    derive_lat,
    derive_lon,
    haversine_km,
)
from data_eng_project_spark.functions.hashing import canonical_row_id, record_id  # noqa: F401
