"""Spatial self-join: all pairs within a distance threshold (SURVEY.md J5).

The reference computes this with a pure-Python O(n²) nested loop over
pandas rows (notebooks/CitiBike-1.ipynb:222-240: 779 stations → ~606K
geodesic calls). A cross-join + filter reproduces the semantics but is
still O(n²) shuffle-side — unusable at 100 TB.

Scale design — **grid-bucketed band join**: hash every point into a
square grid cell whose side ≥ the search radius, replicate each left-side
point into its 3×3 neighborhood of cells, then equi-join on the cell key
and apply the exact haversine predicate. Every qualifying pair shares at
least one of the 9 cells (cell side ≥ radius ⇒ a point's neighbors lie in
the 3×3 block), each pair is produced exactly once per (a,b) ordering
(the replication is on one side only), and the join is a plain shuffled
equi-join that AQE can coalesce/skew-split. Work drops from O(n²) to
O(n · local-density).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citibike_analysis_spark.functions.geo import geodesic_km, haversine_km

#: km per degree of latitude (spherical approximation).
KM_PER_DEG_LAT = 111.19492664455873  # pi/180 * 6371.0088


#: Grid-cell slack: cells are sized (radius × slack) so the 3×3 cover
#: property holds under BOTH metrics — ellipsoidal (geodesic) degree
#: lengths differ from the spherical constant by up to ~0.6%, so an
#: exactly-radius-sized spherical cell could be a hair too small for a
#: pair at the geodesic threshold boundary. 2% costs nothing (the exact
#: predicate prunes) and removes the edge case.
CELL_SLACK = 1.02


def with_grid_cell(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat_deg: float = 60.0,
) -> DataFrame:
    """Add integer grid-cell coordinates sized so cell side ≥ radius_km
    under either distance metric (see ``CELL_SLACK``).

    The longitude cell width is sized for ``max_abs_lat_deg``; a point
    BEYOND that latitude would get cells narrower than the radius and
    the 3×3 replication join would silently miss qualifying pairs (r04
    review) — so the latitude domain is ENFORCED per row via
    ``assert_true`` (a codegen column check, no extra pass): data at
    higher latitudes fails loudly with instructions to raise the bound.
    NULL coordinates are NOT an error (r04 ADVICE): ``abs(NULL) <=
    bound`` is NULL, which ``assert_true`` would treat as a failure, so
    the guard admits NULL explicitly — a NULL lat/lon row keeps NULL
    cells and simply never matches the equi-join, the same NULL
    propagation convention as asof_join and geodesic_km; the loud
    failure is reserved for genuinely out-of-range latitudes.
    Longitude ±180° wraparound pairs are likewise not covered — this
    grid targets city/continent extents, not antimeridian-spanning
    corpora.
    """
    cell_lat_deg = radius_km * CELL_SLACK / KM_PER_DEG_LAT
    # Longitude degrees shrink with latitude; size cells for the worst
    # (highest) latitude in the domain so the 3x3 cover property holds.
    cell_lon_deg = (
        radius_km
        * CELL_SLACK
        / (KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat_deg)))
    )
    lat_ok = F.assert_true(
        F.col(lat_col).isNull()
        | (F.abs(F.col(lat_col)) <= F.lit(max_abs_lat_deg)),
        F.lit(
            f"latitude outside ±{max_abs_lat_deg}°: longitude cells are "
            "sized for that bound and would silently miss pairs — pass a "
            "larger max_abs_lat_deg"
        ),
    )
    return df.withColumns(
        {
            "_cell_x": F.when(
                lat_ok.isNull(),
                F.floor(F.col(lon_col) / F.lit(cell_lon_deg)),
            ).cast("long"),
            "_cell_y": F.floor(F.col(lat_col) / F.lit(cell_lat_deg)).cast("long"),
        }
    )


def within_distance_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat_deg: float = 60.0,
    metric: str = "haversine",
) -> DataFrame:
    """All ordered pairs (a, b), a ≠ b, with dist(a, b) < radius_km.

    Output columns: ``a_<id>, b_<id>, dist_km`` (both orderings present,
    matching the reference's nested-loop semantics).

    ``metric``: ``"haversine"`` (default — pure JVM column math) or
    ``"geodesic"`` (exact WGS-84 parity with the reference's geopy loop,
    notebooks/CitiBike-1.ipynb:222-240; a pandas UDF, but applied only to
    band-join survivors — the candidate generation stays identical, so
    the Python boundary sees O(n · local-density) rows, not O(n²)).
    """
    if metric not in ("haversine", "geodesic"):
        raise ValueError(f"unknown metric {metric!r}")
    cells = with_grid_cell(df, lat_col, lon_col, radius_km, max_abs_lat_deg)

    offsets = F.expr(
        "flatten(transform(sequence(-1, 1),"
        " dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    left = (
        cells.select(
            F.col(id_col).alias("_a_id"),
            F.col(lat_col).alias("_a_lat"),
            F.col(lon_col).alias("_a_lon"),
            "_cell_x",
            "_cell_y",
        )
        .withColumn("_off", F.explode(offsets))
        .select(
            "_a_id",
            "_a_lat",
            "_a_lon",
            (F.col("_cell_x") + F.col("_off.dx")).alias("_cell_x"),
            (F.col("_cell_y") + F.col("_off.dy")).alias("_cell_y"),
        )
    )
    right = cells.select(
        F.col(id_col).alias("_b_id"),
        F.col(lat_col).alias("_b_lat"),
        F.col(lon_col).alias("_b_lon"),
        "_cell_x",
        "_cell_y",
    )
    dist_fn = haversine_km if metric == "haversine" else geodesic_km
    dist = dist_fn(
        F.col("_a_lat"), F.col("_a_lon"), F.col("_b_lat"), F.col("_b_lon")
    )
    return (
        left.join(right, ["_cell_x", "_cell_y"])
        .filter(F.col("_a_id") != F.col("_b_id"))
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") < F.lit(radius_km))
        .select(
            F.col("_a_id").alias(f"a_{id_col}"),
            F.col("_b_id").alias(f"b_{id_col}"),
            "dist_km",
        )
    )


def nearby_map(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Reference output shape: station → sorted list of {neighbor, distance}.

    Replaces the dict-accumulation loop + append-mode JSON writer
    (notebooks/CitiBike-1.ipynb:225-245); write with
    ``df.write.mode("overwrite").json(path)`` — we deliberately do not
    reproduce the reference's concatenated-JSON append bug
    (output/nearby_stations.json holds 3 concatenated documents).
    """
    return pairs.groupBy(F.col(a_col).alias("station_id")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(b_col).alias("station_id"), F.col("dist_km").alias("distance")))
        ).alias("neighbors")
    )
