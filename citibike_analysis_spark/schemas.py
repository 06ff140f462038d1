"""Central schema registry (SURVEY.md §1.3).

Fixed StructType declarations for the reference-shaped tables
(FIXTURES.md; transcribed from reference README.md:101-224). Readers
always take a declared schema — never ``inferSchema`` — because schema
inference is the source of the reference's headline data-quality bug
(zip codes inferred as int dropping NJ leading zeros,
reference README.md:294,367-390).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Main 15-minute-grain fact table (reference README.md:202-224).
AVAILABILITY = T.StructType(
    [
        T.StructField("time_interval", T.TimestampNTZType()),
        T.StructField("station_id", T.IntegerType()),
        T.StructField("station_name", T.StringType()),
        T.StructField("station_status", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("zip", T.StringType()),  # NEVER infer: leading zeros
        T.StructField("borough", T.StringType()),
        T.StructField("hood", T.StringType()),
        T.StructField("available_bikes", T.IntegerType()),
        T.StructField("available_docks", T.IntegerType()),
        T.StructField("weather_summary", T.StringType()),
        T.StructField("precip_intensity", T.DoubleType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("wind_speed", T.DoubleType()),
        T.StructField("wind_gust", T.DoubleType()),
        T.StructField("cloud_cover", T.DoubleType()),
        T.StructField("weather_status", T.StringType()),
    ]
)

#: Hourly weather patch table (reference input/df_weather_fix.csv,
#: built by create_weather_df at README.md:695-712).
WEATHER_FIX = T.StructType(
    [
        T.StructField("time_hour", T.TimestampNTZType()),
        T.StructField("precip_intensity", T.DoubleType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.DoubleType()),
        T.StructField("wind_speed", T.DoubleType()),
        T.StructField("wind_gust", T.DoubleType()),
        T.StructField("weather_summary", T.StringType()),
        T.StructField("cloud_cover", T.DoubleType()),
        T.StructField("zip", T.StringType()),
        T.StructField("weather_status", T.StringType()),
    ]
)

#: Re-fetch key list (reference input/df_weather_na.csv; README.md:493-553).
WEATHER_NA = T.StructType(
    [
        T.StructField("zip", T.StringType()),
        T.StructField("time_day", T.DateType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

#: Raw 3-minute samples — the streaming source (reference README.md:115-123).
#: Matches what ``streaming.ingest.flatten_feed`` actually EMITS (the
#: writer of any landed copy): ``status_value`` per FEED_RENAMES (a
#: ``station_status`` column never existed) and IntegerType ids (the
#: feed schema's id type; a LongType declaration made the vectorized
#: parquet reader reject int32-written files — review finding).
STATIONS_FLAT = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("station_id", T.IntegerType()),
        T.StructField("available_bikes", T.IntegerType()),
        T.StructField("available_docks", T.IntegerType()),
        T.StructField("status_value", T.StringType()),
        T.StructField("last_communication_time", T.TimestampType()),
    ]
)

#: Station dimension, upsert target (reference README.md:129-145).
STATIONS_STATIC = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("status_key", T.IntegerType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("st_address_1", T.StringType()),
        T.StructField("st_address_2", T.StringType()),
        T.StructField("total_docks", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("is_test_station", T.IntegerType()),
    ]
)

#: The raw station-feed JSON payload: 18 camelCase keys
#: (reference README.md:76-95). lastCommunicationTime arrives as a
#: 12-hour-clock string ("2019-09-12 08:38:21 PM").
STATION_FEED = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("stationName", T.StringType()),
        T.StructField("availableDocks", T.IntegerType()),
        T.StructField("totalDocks", T.IntegerType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("statusValue", T.StringType()),
        T.StructField("statusKey", T.IntegerType()),
        T.StructField("availableBikes", T.IntegerType()),
        T.StructField("stAddress1", T.StringType()),
        T.StructField("stAddress2", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("altitude", T.StringType()),
        T.StructField("testStation", T.BooleanType()),
        T.StructField("lastCommunicationTime", T.StringType()),
        T.StructField("landMark", T.StringType()),
    ]
)

#: Feed camelCase → engine snake_case (reference README.md:698-704 style).
FEED_RENAMES: dict[str, str] = {
    "stationName": "station_name",
    "availableDocks": "available_docks",
    "totalDocks": "total_docks",
    "statusValue": "status_value",
    "statusKey": "status_key",
    "availableBikes": "available_bikes",
    "stAddress1": "st_address_1",
    "stAddress2": "st_address_2",
    "postalCode": "postal_code",
    "testStation": "is_test_station",
    "lastCommunicationTime": "last_communication_time",
    "landMark": "land_mark",
}
