"""Partition-pruning rehearsal for the q115 layout claim (r05 VERDICT #8).

q115's SCALE story is "the 3-day range query lists and reads exactly 3
day-directories regardless of table size". This script makes that claim
empirical across three layout decades: synthetic events tables with a
GROWING HISTORY (30 / 300 / 3000 day-partitions — history length is the
axis that grows at 100 TB; per-day volume held constant) are written
date-partitioned, then the q115-shaped 3-day aggregation runs against
each and records

- ``files_read``: distinct ``input_file_name()`` under the filtered
  scan — the actual post-pruning read set (``inputFiles()`` reflects
  the PRE-pruning file index and always lists the whole layout; first
  run of this script mismeasured with it),
- ``files_total``: files in the full layout,
- ``wall_sec``: end-to-end query wall (min of ``reps``; includes the
  driver's file-LISTING pass, which is the component expected to grow
  with layout size when no catalog caches the listing),

expecting files_read CONSTANT while files_total grows 10x per decade.
A pruning regression (predicate not reaching the scan, layout written
unpartitioned, filter dropped by a rewrite) shows up as files_read
tracking files_total.

Usage: python scripts/prune_rehearsal.py [workdir] [reps]
Prints one JSON line per decade plus a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAYS = (30, 300, 3000)
ROWS_PER_DAY = 320  # ~sf0.01 density, held constant across decades
LO, HI = "2024-01-10", "2024-01-12"  # the q115 3-day range


def build_layout(spark, path: str, days: int) -> None:
    from pyspark.sql import functions as F

    from citibike_analysis_spark.sources.files import write_parquet_partitioned

    n = days * ROWS_PER_DAY
    e = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(
                    days=(F.col("id") % days).cast("int"),
                    mins=((F.col("id") * 37) % 1440).cast("int"),
                )
            ).alias("ts"),
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
                "event_type"
            ),
            ((F.col("id") * 13) % 1000 / 10.0).alias("value"),
        )
        .withColumn("event_date", F.to_date("ts"))
    )
    # compaction is opt-in (r07 ADVICE); the rehearsal wants the
    # 1-file/day layout whose LISTING cost it measures
    write_parquet_partitioned(e, path, ["event_date"], files_per_partition=1)


def count_files(path: str) -> int:
    total = 0
    for _root, _dirs, files in os.walk(path):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def run_query(spark, path: str, reps: int) -> tuple[float, int]:
    from pyspark.sql import functions as F

    wall = None
    files_read = None
    for _ in range(reps):
        t0 = time.perf_counter()
        back = spark.read.parquet(path).filter(
            (F.col("event_date") >= F.lit(LO)) & (F.col("event_date") <= F.lit(HI))
        )
        out = back.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        wall = dt if wall is None else min(wall, dt)
        files_read = (
            back.select(F.input_file_name().alias("f")).distinct().count()
        )
    return wall, files_read


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prune_rehearsal"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from citibike_analysis_spark.session import get_spark

    spark = get_spark(app_name="prune_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for days in DAYS:
        path = os.path.join(workdir, f"days{days}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        build_layout(spark, path, days)
        build_sec = round(time.perf_counter() - t0, 2)
        wall, files_read = run_query(spark, path, reps)
        row = {
            "days": days,
            "rows": days * ROWS_PER_DAY,
            "files_total": count_files(path),
            "files_read": files_read,
            "wall_sec": round(wall, 3),
            "build_sec": build_sec,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| layout days | rows | files total | files read (3-day query) | wall (s) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['days']} | {r['rows']:,} | {r['files_total']} "
            f"| {r['files_read']} | {r['wall_sec']} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
