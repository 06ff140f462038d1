"""Streaming 15-minute availability rollup + dimension upsert (§2.9/W4/S6).

- :func:`availability_rollup`: event-time tumbling window min() with a
  watermark — the continuously-maintained ``availability`` table
  (reference README.md:196-224). The watermark bounds state: the feed's
  ``last_communication_time`` lags poll time by up to ~30 min
  (reference README.md:122), so late rows inside the watermark still
  land in their interval and older ones are dropped deterministically.
- :func:`write_rollup`: update-mode sink, checkpointed — restart resumes
  from offsets+state, replacing the reference's iloc[-24] CSV resume
  (README.md:714-727).
- :func:`upsert_station_dimension`: foreachBatch MERGE-style upsert of
  ``stations_static`` (reference README.md:127) implemented engine-side
  as last-writer-wins over a keyed parquet snapshot (no Delta in this
  environment; the foreachBatch seam is where MERGE INTO would go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def availability_rollup(
    samples: DataFrame,
    ts_col: str = "last_communication_time",
    watermark: str = "30 minutes",
    interval: str = "15 minutes",
) -> DataFrame:
    """3-minute samples → per-station 15-minute MINIMUM availability.

    Both measures roll up as min (r04 review — was max on docks): the
    reference documents min for bikes (README.md:200) and its flagship
    counts intervals with ``available_docks = 0`` ("times_replenished"
    — the station was FULL at some sample); only min preserves that
    event at the 15-minute grain (max(docks)=0 would require the
    station full for the entire interval, silently undercounting the
    replenishment signal the reduction query gates on).
    """
    return (
        samples.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), interval).alias("w"),
            F.col("station_id"),
        )
        .agg(
            F.min("available_bikes").alias("available_bikes"),
            F.min("available_docks").alias("available_docks"),
            F.count("*").alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("time_interval"),
            "station_id",
            "available_bikes",
            "available_docks",
            "n_samples",
        )
    )


def write_rollup(
    rolled: DataFrame,
    checkpoint_dir: str,
    output_dir: str,
    query_name: str = "availability_rollup",
) -> StreamingQuery:
    """Start the rollup with a foreachBatch changelog sink.

    Each micro-batch's *updated* (interval, station) rows are appended to
    ``output_dir`` stamped with the batch id; the current table state is
    the last writer per key (:func:`latest_rollup`). foreachBatch is the
    upsert seam — with Delta/JDBC available the body becomes MERGE INTO —
    and, unlike the memory sink, it supports checkpoint recovery, so a
    restarted query resumes from offsets+state instead of replaying
    (replacing the reference's iloc[-24] CSV resume, README.md:714-727).
    """

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.withColumn("_batch_id", F.lit(epoch_id)).write.mode("append").parquet(
            output_dir
        )

    return (
        rolled.writeStream.outputMode("update")
        .foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def latest_rollup(spark, output_dir: str) -> DataFrame:
    """Current rollup state from the changelog: last write per key."""
    from pyspark.sql import Window

    log = spark.read.parquet(output_dir)
    w = Window.partitionBy("time_interval", "station_id").orderBy(
        F.desc("_batch_id")
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch_id")
    )


def upsert_station_dimension(
    batch: DataFrame, snapshot_path: str, key: str = "station_id"
) -> None:
    """foreachBatch body: last-writer-wins upsert into a parquet snapshot.

    Mirrors the reference's insert-or-update-on-duplicate dimension
    maintenance (README.md:127). Idempotent per batch: re-processing a
    batch after restart converges to the same snapshot.
    """
    from pyspark.sql import Window

    if batch.isEmpty():
        # idle micro-batches otherwise rewrite the ENTIRE snapshot
        # (full read + staging write + rename swap) for nothing — same
        # guard as write_rollup's sink (r04 review)
        return
    spark = batch.sparkSession
    # Tiebreak among rows tied on the event time: the feed can repeat a
    # station's stale last_communication_time while poll-time fields
    # (e.g. available_bikes) differ, and `id` equals the partition key
    # (every tied row shares it — a no-op orderer, r04 review). A hash
    # of the FULL row content is a deterministic function of the data,
    # so a crash-replayed batch picks the same winner regardless of row
    # order — the property the idempotence contract below needs.
    row_hash = F.xxhash64(F.struct(*[F.col(c) for c in batch.columns]))
    latest_per_key = (
        batch.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    F.desc("last_communication_time"), F.desc(row_hash)
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    from citibike_analysis_spark.sources.files import (
        hadoop_fs,
        read_parquet_if_exists,
    )

    _recover_snapshot(spark, snapshot_path)
    existing = read_parquet_if_exists(spark, snapshot_path)
    if existing is not None:
        merged = (
            existing.join(latest_per_key.select(key), key, "left_anti")
            .unionByName(latest_per_key)
        )
    else:
        # first batch ever — no snapshot to merge (any OTHER read failure
        # propagates from the helper: swallowing it would silently
        # replace the whole snapshot with just this batch — ADVICE r1)
        merged = latest_per_key
    # Never overwrite the directory being read: a persist() is evictable
    # (not a checkpoint), so cache loss mid-overwrite would recompute the
    # plan against deleted files. Write the merged snapshot to a staging
    # path, then swap with rename-aside: dst -> dst__old, staging -> dst,
    # delete dst__old. At every instant either dst, a complete __staging
    # (with _SUCCESS), or __old holds a full snapshot, and
    # _recover_snapshot() on the next batch promotes whichever survives —
    # the unrecoverable window shrinks to a metadata rename (HDFS renames
    # are atomic; crash between two renames leaves both old and staging,
    # recovery prefers the newer complete staging).
    staging = snapshot_path.rstrip("/") + "__staging"
    old = snapshot_path.rstrip("/") + "__old"
    merged.write.mode("overwrite").parquet(staging)
    fs, dst, hpath = hadoop_fs(spark, snapshot_path)
    if fs.exists(hpath(old)):
        fs.delete(hpath(old), True)
    if fs.exists(dst) and not fs.rename(dst, hpath(old)):
        raise IOError(f"rename {snapshot_path} -> {old} failed")
    if not fs.rename(hpath(staging), dst):
        raise IOError(f"rename {staging} -> {snapshot_path} failed")
    if fs.exists(hpath(old)):
        fs.delete(hpath(old), True)


def _recover_snapshot(spark, snapshot_path: str) -> None:
    """Promote a surviving snapshot if a crash interrupted the swap.

    If the live path is missing, prefer a COMPLETE staging write (its
    parquet ``_SUCCESS`` marker proves the job committed — a partial
    staging from a crash mid-write is never promoted), else fall back to
    the renamed-aside previous snapshot. If the live path exists, any
    leftover ``__old`` is stale and is removed.
    """
    from citibike_analysis_spark.sources.files import hadoop_fs

    fs, dst, hpath = hadoop_fs(spark, snapshot_path)
    staging = hpath(snapshot_path.rstrip("/") + "__staging")
    old = hpath(snapshot_path.rstrip("/") + "__old")
    if fs.exists(dst):
        if fs.exists(old):
            fs.delete(old, True)
        return
    staging_ok = fs.exists(staging) and fs.exists(
        hpath(snapshot_path.rstrip("/") + "__staging/_SUCCESS")
    )
    if staging_ok:
        if not fs.rename(staging, dst):
            raise IOError(f"recovery rename {staging} -> {dst} failed")
        if fs.exists(old):
            fs.delete(old, True)
    elif fs.exists(old):
        if not fs.rename(old, dst):
            raise IOError(f"recovery rename {old} -> {dst} failed")
