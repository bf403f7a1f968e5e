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
2. Explode each *site* into its 3×3 neighborhood of cells; longitude
   cells live on a ring (uniform width ≥ the required cell size) so
   neighborhoods wrap correctly across the ±180° antimeridian.
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

from data_eng_project_spark.functions.geo import (
    EARTH_RADIUS_KM,
    KM_PER_DEG_LAT,
    MAX_ABS_LAT_DEG,
    haversine_km,
)


def cell_sizes_deg(radius_km: float, max_abs_lat_deg: float = MAX_ABS_LAT_DEG) -> tuple[float, float]:
    """Grid cell sizes guaranteeing that any within-radius pair lands at
    most one cell apart per axis.

    Latitude: r/111 deg (111.0 < the true 111.195 km/deg, so the cell is
    strictly wider than the max latitude separation — safe).

    Longitude uses the EXACT spherical bound, not the linear
    r/(111·cos L) approximation: for two points within great-circle
    distance r in the |lat| ≤ L band, hav(Δλ)·cos φ₁·cos φ₂ ≤ hav(r/R)
    and cos φ ≥ cos L inside the band, so
    Δλ_max = 2·asin(sin(r/2R)/cos L). The linear form undershoots this
    (asin convexity) once r ≳ 755 km at L = 60°, silently dropping
    within-radius pairs whose cells end up two apart (r5 review); the
    exact bound holds for every radius. When the argument exceeds 1 the
    radius out-spans the band entirely — every longitude is reachable,
    one ring cell."""
    lat_cell = radius_km / KM_PER_DEG_LAT
    s = math.sin(radius_km / (2.0 * EARTH_RADIUS_KM)) / math.cos(
        math.radians(max_abs_lat_deg)
    )
    if s >= 1.0:
        lon_cell = 360.0
    else:
        # Tiny relative slack absorbs the float rounding of asin/degrees.
        lon_cell = math.degrees(2.0 * math.asin(s)) * (1.0 + 1e-9)
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

    # Longitude wraps at ±180°, so lon cells are laid out on a RING:
    # N uniform cells of width 360/N ≥ lon_cell (N = floor(360/cell) —
    # rounding the count DOWN keeps every cell at least lon_cell wide,
    # preserving the one-cell-apart guarantee across the seam; a
    # non-uniform last cell would let within-radius pairs near the seam
    # land two cells apart). Unwrapped floor() indexing put
    # lon=179.9 and lon=−179.9 ~67 cells apart and silently dropped
    # antimeridian-straddling pairs that the exact haversine (and the
    # brute-force oracle) include. Latitude does not wrap.
    n_lon = max(1, int(360.0 // lon_cell))
    lon_width = 360.0 / n_lon

    def _lon_cell(c: str) -> F.Column:
        # +180 shifts the domain to [0, 360]; pmod folds the lon=180
        # edge (cell N) back onto cell 0 ≡ −180.
        return F.pmod(F.floor((F.col(c) + 180.0) / lon_width), F.lit(n_lon))

    p = points.withColumn("_cell_lat", F.floor(F.col(plat) / lat_cell)).withColumn(
        "_cell_lon", _lon_cell(plon)
    )
    offsets = F.array([F.lit(d) for d in (-1, 0, 1)])
    s = (
        sites.withColumn("_s_cell_lat", F.floor(F.col(slat) / lat_cell))
        .withColumn("_s_cell_lon", _lon_cell(slon))
        .withColumn("_dlat", F.explode(offsets))
        # distinct: on a ring with ≤3 cells the ±1 neighbors coincide,
        # and duplicate candidate cells would duplicate output rows.
        .withColumn(
            "_cell_lon",
            F.explode(
                F.array_distinct(
                    F.transform(
                        offsets,
                        lambda d: F.pmod(F.col("_s_cell_lon") + d, F.lit(n_lon)),
                    )
                )
            ),
        )
        .withColumn("_cell_lat", F.col("_s_cell_lat") + F.col("_dlat"))
        .drop("_s_cell_lat", "_s_cell_lon", "_dlat")
    )
    joined = p.join(s, on=["_cell_lat", "_cell_lon"], how="inner")
    dist = haversine_km(plat, plon, slat, slon)
    return (
        joined.withColumn(distance_col, dist)
        .filter(F.col(distance_col) <= F.lit(float(radius_km)))
        .drop("_cell_lat", "_cell_lon")
    )
