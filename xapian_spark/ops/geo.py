"""Geospatial: great-circle distance + nearest-neighbour ordering.

Re-expression of the reference's geospatial module
(`xapian-core/geospatial/latlong_distance_keymaker.cc`,
`latlong_posting_source.cc`, `latlong_metrics.cc`): LatLongCoord values in
a slot, a GreatCircleMetric (haversine over a spherical Earth,
radius 6371008.8 m), a KeyMaker to sort by distance and a PostingSource
to weight by closeness.  Spark-first: coordinates are typed double
columns; distance is one closed-form column expression (whole-stage
codegen), ordering is orderBy, and the "posting source" weighting is a
derived weight column — no UDF, no index structure needed because
parquet/Iceberg min/max stats on (lat, lon) already give bounding-box
pruning when a filter is pushed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_METRES = 6371008.8  # mean radius, as the reference uses


def haversine_metres(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance (GreatCircleMetric, latlong_metrics.cc)."""
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad / 2.0
    dlon = (lon2 - lon1) * rad / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_METRES) * F.asin(F.sqrt(a))


def nearest(
    df: DataFrame,
    lat: float,
    lon: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    k: int = 10,
    id_col: str = "docid",
) -> DataFrame:
    """k nearest rows to (lat, lon): (id, distance_m) —
    LatLongDistanceKeyMaker ordering."""
    d = haversine_metres(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon))
    )
    return (
        df.select(F.col(id_col), d.alias("distance_m"))
        .orderBy(F.asc("distance_m"), F.asc(id_col))
        .limit(k)
    )


def distance_weight(
    distance_m: Column, k1: float = 1000.0, k2: float = 1.0
) -> Column:
    """LatLongDistancePostingSource weight: k1 * (distance + k1)^-k2
    (latlong_posting_source.cc defaults)."""
    return F.lit(k1) * F.pow(distance_m + F.lit(k1), F.lit(-k2))
