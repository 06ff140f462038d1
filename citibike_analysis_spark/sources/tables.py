"""Readers for the synthetic star-schema testdata (TESTDATA.md).

Design rules (SURVEY.md §1.3): explicit, centralized schema knowledge; no
``inferSchema`` surprises; timestamp semantics pinned to wall-clock
(TIMESTAMP_NTZ) so results are independent of the session timezone and
bit-compatible with the DuckDB oracle.

The one real wrinkle: ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS,false), which Spark's vectorized reader rejects
([PARQUET_TYPE_ILLEGAL]). With ``spark.sql.legacy.parquet.nanosAsLong``
we read the raw int64 nanoseconds and convert to TIMESTAMP_NTZ with exact
integer arithmetic (no double round-trips: a double cannot represent
~1.7e18 exactly, so ``floor(ns/1e9)`` computed in doubles can mis-bucket).
DuckDB truncates ns → µs on read; ``ns div 1000`` truncates identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def ns_long_to_ntz(colname: str) -> F.Column:
    """Exact int64-nanoseconds → TIMESTAMP_NTZ (truncated to microseconds).

    Pure integer arithmetic: seconds and the microsecond remainder are
    split with integer ``div``/``%`` and re-assembled as day-time-interval
    offsets from the epoch, so every value is exact (no double rounding).
    """
    secs = F.expr(f"`{colname}` div 1000000000").cast("long")
    micros = (F.expr(f"`{colname}` div 1000") % F.lit(1000000)).cast("long")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return (
        epoch
        + secs * F.expr("INTERVAL 1 SECOND")
        + micros * F.expr("INTERVAL 1 MICROSECOND")
    )


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet with ``ts`` materialized as TIMESTAMP_NTZ + raw ns.

    Keeps ``ts_ns`` (int64 nanoseconds since epoch) alongside the converted
    ``ts``: bucket arithmetic (15-min rollups etc.) on the integer column
    is exact and shuffles 8 bytes instead of a timestamp.
    """
    try:
        spark.conf.set(_NANOS_CONF, "true")
    except Exception:
        pass
    try:
        raw = spark.read.parquet(path)
        raw.schema  # force schema resolution to surface PARQUET_TYPE_ILLEGAL
        return raw.select(
            "event_id",
            F.col("ts").alias("ts_ns"),
            ns_long_to_ntz("ts").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    except Exception:
        # Fallback when the conf is static on this build: decode via Arrow
        # on the driver. Only viable at test scale; the native path above is
        # the production one.
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        pdf = tbl.to_pandas()
        pdf["ts_ns"] = pdf["ts"].astype("int64")
        pdf["ts"] = pdf["ts"].dt.floor("us")
        df = spark.createDataFrame(pdf)
        return df.select(
            "event_id", "ts_ns", F.col("ts").cast("timestamp_ntz").alias("ts"),
            "user_id", "event_type", "value", "props",
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table by name from an sf directory."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        return _read_events(spark, path)
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    except Exception:
        pass
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for spark.sql() entry points."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
