"""Curated scalar-function surface (SURVEY.md §2.8 F1-F18).

Thin, documented wrappers over ``pyspark.sql.functions`` — everything here
is a JVM-side column expression that stays inside whole-stage codegen; no
Python UDFs in the hot path.
"""

from citibike_analysis_spark.functions.temporal import (
    trunc_hour,
    trunc_day,
    hour_of_day,
    day_name,
    day_type,
    time_of_day,
    round_to_hour,
    epoch_to_local,
)
from citibike_analysis_spark.functions.geo import haversine_km
from citibike_analysis_spark.functions.text import (
    tokens,
    token_count,
    shingles,
    stopword_hits,
    punct_ratio,
    bag_fingerprint,
)

__all__ = [
    "trunc_hour",
    "trunc_day",
    "hour_of_day",
    "day_name",
    "day_type",
    "time_of_day",
    "round_to_hour",
    "epoch_to_local",
    "haversine_km",
    "tokens",
    "token_count",
    "shingles",
    "stopword_hits",
    "punct_ratio",
    "bag_fingerprint",
]
