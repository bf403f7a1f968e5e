"""Spatial proximity join — the flagship operator (reference J5).

The reference's end goal was "see if there is more deaths around power
plants in France" (reference ``README.md:11``, ``docs/Report.md:9-10``);
the notebook that ran it is a stripped blob, so this operator is the
reconstruction, designed Spark-first:

Naive form: ``points.crossJoin(sites).filter(haversine < r)`` — O(n·m),
unusable at scale. Scale form (this module): grid-cell bucketing.

1. Assign every point to a (lat_cell, lon_cell) grid cell whose size is
   chosen so any two points within ``radius_km`` are at most one cell
   apart on each axis.  Cell sizes: ``radius/111km`` degrees in latitude;
   longitude cells are widened by 1/cos(max|lat|) so the guarantee holds
   at the highest latitude in the data (points are constrained to
   |lat| ≤ 60° by functions.geo.derive_lat; pass ``max_abs_lat_deg`` for
   other data).
2. Explode each *site* into its 3×3 neighborhood of cells.
3. Equi-join points to exploded sites on the cell key — a plain shuffle
   (or broadcast, when the site side is small — Catalyst/AQE decides)
   hash join that scales linearly instead of quadratically.
4. Apply the *exact* haversine predicate to the candidates.

Candidate generation is a superset of the true result (cell geometry
guarantees no within-radius pair lands more than one cell apart), so
step 4 makes the result exactly equal to the naive cross-join — which is
what the DuckDB oracle computes.

At 100 TB: both sides shuffle-partition on the cell key, so the join is
shuffle-once and skew is bounded by cell occupancy; AQE skew-join splits
oversized cells (dense cities). The 9× explode happens on the *smaller*
(site) side only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_eng_project_spark.functions.geo import KM_PER_DEG_LAT, MAX_ABS_LAT_DEG, haversine_km


def cell_sizes_deg(radius_km: float, max_abs_lat_deg: float = MAX_ABS_LAT_DEG) -> tuple[float, float]:
    lat_cell = radius_km / KM_PER_DEG_LAT
    lon_cell = radius_km / (KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat_deg)))
    return lat_cell, lon_cell


def near_join(
    points: DataFrame,
    sites: DataFrame,
    radius_km: float,
    point_coords: tuple[str, str] = ("lat", "lon"),
    site_coords: tuple[str, str] = ("site_lat", "site_lon"),
    max_abs_lat_deg: float = MAX_ABS_LAT_DEG,
    distance_col: str = "dist_km",
) -> DataFrame:
    """All (point, site) pairs with haversine distance ≤ radius_km.

    Returns points' columns + sites' columns + ``distance_col`` (double).
    Coordinate column names must not collide between the two inputs.
    """
    plat, plon = point_coords
    slat, slon = site_coords
    lat_cell, lon_cell = cell_sizes_deg(radius_km, max_abs_lat_deg)

    p = points.withColumn("_cell_lat", F.floor(F.col(plat) / lat_cell)).withColumn(
        "_cell_lon", F.floor(F.col(plon) / lon_cell)
    )
    offsets = F.array([F.lit(d) for d in (-1, 0, 1)])
    s = (
        sites.withColumn("_s_cell_lat", F.floor(F.col(slat) / lat_cell))
        .withColumn("_s_cell_lon", F.floor(F.col(slon) / lon_cell))
        .withColumn("_dlat", F.explode(offsets))
        .withColumn("_dlon", F.explode(offsets))
        .withColumn("_cell_lat", F.col("_s_cell_lat") + F.col("_dlat"))
        .withColumn("_cell_lon", F.col("_s_cell_lon") + F.col("_dlon"))
        .drop("_s_cell_lat", "_s_cell_lon", "_dlat", "_dlon")
    )
    joined = p.join(s, on=["_cell_lat", "_cell_lon"], how="inner")
    dist = haversine_km(plat, plon, slat, slon)
    return (
        joined.withColumn(distance_col, dist)
        .filter(F.col(distance_col) <= F.lit(float(radius_km)))
        .drop("_cell_lat", "_cell_lon")
    )
