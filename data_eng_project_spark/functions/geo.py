"""Geospatial expression helpers.

``haversine_km`` is the exact great-circle distance used by the flagship
proximity join (reference J5 — the lost ``Production.ipynb`` analysis,
reference ``README.md:11``, ``docs/Report.md:9-10``). All trig is Spark
built-ins, so the whole predicate runs in whole-stage codegen.

``derive_lat``/``derive_lon`` mint deterministic synthetic coordinates
from an integer key (pure integer arithmetic → bit-identical between
Spark and the DuckDB oracle). Latitudes stay within ±60° so that a
±1-cell neighbor expansion in the grid join is provably sufficient
(see operators/spatial.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.0
MAX_ABS_LAT_DEG = 60.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def derive_lat(key: Column | str) -> Column:
    """Deterministic latitude in [-60, 59.9] from an integer key."""
    return ((_c(key) * F.lit(37) % F.lit(1200)) / F.lit(10.0) - F.lit(60.0)).alias("lat")


def derive_lon(key: Column | str) -> Column:
    """Deterministic longitude in [-180, 179.9] from an integer key."""
    return ((_c(key) * F.lit(91) % F.lit(3600)) / F.lit(10.0) - F.lit(180.0)).alias("lon")


# The same derivations as ANSI SQL, for DuckDB oracles.
def derive_lat_sql(key: str) -> str:
    return f"((({key}) * 37) % 1200) / 10.0 - 60.0"


def derive_lon_sql(key: str) -> str:
    return f"((({key}) * 91) % 3600) / 10.0 - 180.0"


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Exact haversine great-circle distance in km (double precision)."""
    rlat1, rlat2 = F.radians(_c(lat1)), F.radians(_c(lat2))
    dlat = F.radians(_c(lat2) - _c(lat1)) / 2
    dlon = F.radians(_c(lon2) - _c(lon1)) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as SQL text (DuckDB oracle); mirrors haversine_km
    operation-for-operation so double rounding behaves identically."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) * sin(radians(({lon2}) - ({lon1})) / 2)"
        f"))"
    )
