"""SparkSession factory with scale-oriented defaults.

The reference runs single-process pandas/PostgreSQL; our engine targets a
multi-executor cluster. Everything here is stock Spark configuration chosen
so the same code runs on ``local[N]`` for tests and on a 1000-executor
cluster unchanged:

- AQE on: runtime partition coalescing, dynamic broadcast, skew-join
  splitting (skew is real in the domain — Manhattan hoods dominate;
  cf. SURVEY.md §4).
- Arrow on: every Python boundary (``toPandas``, ``pandas_udf``,
  ``applyInPandas``) moves columnar batches, never rows.
- Shuffle partitions default to a small number locally; AQE coalesces
  further. On a real cluster this should be ~2-3x total cores — callers
  override via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (non-static) confs applied to sessions we create AND safe to
#: apply to sessions handed to us (e.g. the verify driver's).
RUNTIME_CONF: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects by default; read the raw int64 and convert exactly (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet timestamps written without UTC adjustment (pandas-style naive)
    # become TIMESTAMP_NTZ — wall-clock semantics identical to DuckDB/pandas.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # epoch_to_local produces LTZ timestamps whose field extraction and
    # rendering depend on the SESSION timezone; get_spark always pinned
    # UTC but tune() (externally-owned sessions — the driver's) did not,
    # so a non-UTC host would double-shift every hourly weather key
    # (r04 review). Runtime-settable, so tune() can pin it too.
    "spark.sql.session.timeZone": "UTC",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent, best-effort).

    Used when the caller (test harness, verify driver) owns the session.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — loader falls back (sources/tables.py)
    return spark


def get_spark(
    app_name: str = "citibike-analysis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's defaults."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    return tune(spark)
