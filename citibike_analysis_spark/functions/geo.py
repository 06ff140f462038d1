"""Geospatial column expressions (SURVEY.md §2.8 F17, §2.3 J5).

The reference computes pairwise station distances with geopy's geodesic
(Karney) in a pure-Python nested loop (notebooks/CitiBike-1.ipynb:222-240,
~606K distance calls per run). Haversine as pure column math differs from
geodesic by <0.5% at city scale (documented tolerance, SURVEY.md J5) and
runs entirely inside whole-stage codegen — no UDF, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: IUGG mean Earth radius in km — the constant geopy uses for great-circle.
EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) points in degrees.

    Pure built-in math (sin/cos/asin/radians) — stays JVM-side and
    vectorized; safe to use as a join predicate.
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_feet(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Distance in feet (reference ``calculate_distance_in_feet``,
    notebooks/citibike_ck.ipynb:127-140)."""
    return haversine_km(lat1, lon1, lat2, lon2) * F.lit(3280.839895013123)
