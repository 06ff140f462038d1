"""Bucketed-table layout for co-located joins (SURVEY.md §4
"Partitioning & shuffle: bucketing for co-located joins").

A fact-fact equi-join (availability ⋈ weather by zip+hour, lineitem ⋈
orders by orderkey) shuffles BOTH sides every query. Writing each table
``bucketBy(N, key)`` pre-partitions the data by ``hash(key) % N`` at
write time: every later join or aggregation on the bucket key reads the
matching buckets directly and the Exchange disappears from the plan —
the shuffle is paid once at layout time instead of per query. At 100 TB
this converts the dominant per-query cost into a one-time ETL cost.

Rules the helpers enforce/encode:

- both join sides must use the same bucket count (or multiples, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` the bucket key too, so sort-merge joins also skip their
  per-task sort;
- bucket counts should target ~100-200 MB per bucket file at production
  scale; at 100 TB / 128 MB that is O(10⁵) buckets — set per table.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _clear_table_and_orphaned_location(spark: SparkSession, table: str) -> None:
    """Make ``saveAsTable(table)`` safe to run from ANY starting state.

    ``mode("overwrite")`` only helps when the catalog knows the table.
    With a session-scoped catalog (in-memory derby — the default here),
    an interrupted or externally-killed build leaves the managed
    LOCATION on disk with no catalog entry, and every subsequent
    fresh-session build fails with ``LOCATION_ALREADY_EXISTS`` until a
    human deletes the directory — for a build-once/probe-many index
    (:func:`~citibike_analysis_spark.operators.similarity.build_lsh_index`)
    that bricks the table name on any crashed build (r07 verdict #1).

    Order matters: DROP first (removes the location when the catalog
    entry exists), THEN rm the residual directory (the orphaned case).
    Non-local warehouses (hdfs/s3) are left alone — orphan cleanup there
    is an ETL-tooling concern, not a silent rmtree from a library.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return
    parts = table.lower().split(".")
    loc = os.path.join(wh.path, *[f"{p}.db" for p in parts[:-1]], parts[-1])
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table."""
    _clear_table_and_orphaned_location(df.sparkSession, table)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def append_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Append into an EXISTING bucketed table.

    The bucket spec must match the table's (same columns, same count) —
    Spark rejects a mismatch at write time, which is the desired
    failure: silently appending differently-bucketed files would break
    the exchange-free join guarantee for every later reader. Appends
    add new files per bucket id (multiple files per bucket are fine —
    readers merge them); the per-bucket sort holds within each appended
    file set, which preserves the sort-based merge optimization.

    This is the incremental leg of the layout story: the initial
    :func:`write_bucketed` pays the full shuffle once, then each ingest
    batch appends at batch cost instead of rewriting the table.
    """
    writer = (
        df.write.mode("append")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides on the catalog entry,
    which is why this goes through the table name, not the raw path)."""
    return spark.table(table)
