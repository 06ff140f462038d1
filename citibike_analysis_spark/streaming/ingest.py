"""Streaming ingest: raw feed JSON → flattened snake_case records (S4).

The reference stores raw JSON payloads then flattens the 18 camelCase
keys into ``stations_flat`` rows (reference README.md:99-123). Spark
form: a file/Kafka stream of JSON lines → ``from_json`` with the
declared feed schema → rename map → typed columns. The feed's
``lastCommunicationTime`` arrives as a 12-hour-clock string
("2019-09-12 08:38:21 PM", reference README.md:94) — parsed here with an
explicit format, never inferred.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from citibike_analysis_spark.schemas import FEED_RENAMES, STATION_FEED

FEED_TS_FORMAT = "yyyy-MM-dd hh:mm:ss a"


def flatten_feed(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse + flatten feed payloads (works on batch and streaming DFs)."""
    parsed = raw.select(
        F.from_json(F.col(json_col), STATION_FEED).alias("data")
    ).select("data.*")
    flat = parsed.withColumnsRenamed(FEED_RENAMES)
    return flat.withColumn(
        "last_communication_time",
        F.to_timestamp(F.col("last_communication_time"), FEED_TS_FORMAT),
    ).withColumn("station_id", F.col("id"))


def read_feed_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of JSON-lines feed snapshots.

    ``maxFilesPerTrigger`` throttles replay — the streaming analog of the
    reference's rate-limited resumable backfill (README.md:714-746).
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    return flatten_feed(raw, "value")
