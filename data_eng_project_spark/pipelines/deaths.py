"""The deaths pipeline (reference EP2): fixed-width death records →
geo-enriched, validated, anonymized ``deaths`` table.

Reference flow (``dags/global_dag.py:75-149``): readlines loop → slice
byte offsets → Redis buffer → pandas dict-lookup join vs the INSEE
city-geo CSV → NaN/date validity filter → generated INSERT script.

Spark flow (this module): one declarative plan —
fixed-width scan → substring/trim projections (F2) → sha1 id over the
name bytes (F3, anonymization) → multi-format date parse (F1) →
broadcast inner join vs geo dimension (J1, drop-on-miss) → validity
filter (P4) → idempotent keyed sink (S14/J4).

Output schema matches the reference's serving DDL
(``dags/sql/create_death_table.sql:4-10``):
(id, date_of_birth, date_of_death, latitude, longitude).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_eng_project_spark.functions.dates import parse_date_multi
from data_eng_project_spark.functions.hashing import record_id
from data_eng_project_spark.operators.joins import broadcast_lookup_join
from data_eng_project_spark.sources.readers import read_csv, read_fixed_width

# Death-record layout (FIXTURES.md §3; reference dags/global_dag.py:98-103).
DEATH_COLSPECS = [
    ("name_field", 0, 80, "string"),
    ("birth_date_raw", 81, 8, "string"),
    ("death_date_raw", 154, 8, "string"),
    ("insee_code", 162, 5, "string"),
]

GEO_SCHEMA = "code_commune_INSEE string, latitude double, longitude double"


def load_geo_dimension(spark: SparkSession, geo_csv_path: str) -> DataFrame:
    """INSEE commune → GPS dimension (~35k rows in production — always
    broadcastable)."""
    return read_csv(spark, geo_csv_path, schema=GEO_SCHEMA)


def parse_death_records(spark: SparkSession, path: str) -> DataFrame:
    """Fixed-width scan + projections + id minting + date parse."""
    raw = read_fixed_width(spark, path, DEATH_COLSPECS)
    return raw.select(
        # Anonymizing content-hash id over the name bytes (first 80 chars
        # of the record — reference dags/global_dag.py:97-99).
        record_id(F.col("_raw"), prefix_len=80).alias("id"),
        parse_date_multi("birth_date_raw").alias("date_of_birth"),
        parse_date_multi("death_date_raw").alias("date_of_death"),
        F.col("insee_code"),
    )


def cleanse_deaths(deaths: DataFrame, geo: DataFrame) -> DataFrame:
    """Geo-enrich (inner ⇒ drop-on-miss), then validity-filter.

    Reference semantics reproduced exactly: unknown INSEE code → row
    dropped (docs/Report.md:72); NaN coordinates → dropped
    (dags/global_dag.py:141-143); unparseable dates → dropped (:140).
    """
    enriched = broadcast_lookup_join(
        deaths, geo, on=deaths["insee_code"] == geo["code_commune_INSEE"]
    )
    return enriched.filter(
        F.col("date_of_birth").isNotNull()
        & F.col("date_of_death").isNotNull()
        & F.col("latitude").isNotNull()
        & ~F.isnan("latitude")
        & F.col("longitude").isNotNull()
        & ~F.isnan("longitude")
    ).select("id", "date_of_birth", "date_of_death", "latitude", "longitude")


def run(spark: SparkSession, death_txt_path: str, geo_csv_path: str) -> DataFrame:
    return cleanse_deaths(
        parse_death_records(spark, death_txt_path),
        load_geo_dimension(spark, geo_csv_path),
    )
