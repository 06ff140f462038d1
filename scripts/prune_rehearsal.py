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

r08 adds the CATALOG route next to the path route (r07 verdict #7):
the same layout registered as an external partitioned table
(``register_partitioned_table``), where partition pruning happens on
catalog metadata BEFORE any directory is listed. The new
``files_listed`` column (the scan's post-planning file-index size) is
the claim: path route lists the whole layout every query (listed ==
files_total, growing 10x/decade); catalog route lists 3 (constant).

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


def _indexed_files(frame) -> int:
    """Files in the scan's post-planning FILE INDEX = what the planner
    LISTED for this query. Path route: the InMemoryFileIndex holds the
    whole layout (listing is paid up front, pruning selects from it at
    execution). Catalog route: PruneFileSourcePartitions shrinks the
    CatalogFileIndex to the selected partitions BEFORE listing, so the
    index holds only the queried days' files."""
    scan = frame._jdf.queryExecution().executedPlan().collectLeaves().head()
    return len(list(scan.relation().location().inputFiles()))


def run_query(spark, path: str, reps: int, table: str | None = None) -> dict:
    """One decade's measurement for one route: ``table=None`` reads the
    path (InMemoryFileIndex — full up-front listing); otherwise reads
    the registered catalog table (metastore partition pruning)."""
    from pyspark.sql import functions as F

    wall = None
    files_read = None
    files_listed = None
    for _ in range(reps):
        # drop the session's cached relation so every rep pays the
        # route's true listing cost (the thing being measured)
        spark.catalog.clearCache()
        spark.sql(f"REFRESH TABLE {table}") if table else None
        t0 = time.perf_counter()
        src = spark.table(table) if table else spark.read.parquet(path)
        back = src.filter(
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
        # probe the bare filtered scan, not the aggregate: under AQE the
        # aggregate's executedPlan leaves are query-stage wrappers, not
        # the FileSourceScan (Method relation([]) does not exist)
        files_listed = _indexed_files(back)
    return {
        "wall_sec": round(wall, 3),
        "files_read": files_read,
        "files_listed": files_listed,
    }


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prune_rehearsal"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from citibike_analysis_spark.session import get_spark

    spark = get_spark(app_name="prune_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from citibike_analysis_spark.sources.files import register_partitioned_table

    rows = []
    for days in DAYS:
        path = os.path.join(workdir, f"days{days}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        build_layout(spark, path, days)
        build_sec = round(time.perf_counter() - t0, 2)
        by_path = run_query(spark, path, reps)
        # catalog route (r07 verdict #7): same layout behind an external
        # partitioned table — files LISTED must now be constant too
        table = f"prune_rehearsal_days{days}"
        t0 = time.perf_counter()
        register_partitioned_table(spark, table, path, ["event_date"])
        register_sec = round(time.perf_counter() - t0, 2)
        by_catalog = run_query(spark, path, reps, table=table)
        spark.sql(f"DROP TABLE IF EXISTS {table}")  # external: metadata-only
        row = {
            "days": days,
            "rows": days * ROWS_PER_DAY,
            "files_total": count_files(path),
            "path": by_path,
            "catalog": by_catalog,
            "build_sec": build_sec,
            "register_sec": register_sec,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(
        "\n| layout days | files total | path: listed / read / wall "
        "| catalog: listed / read / wall |"
    )
    print("|---|---|---|---|")
    for r in rows:
        p, c = r["path"], r["catalog"]
        print(
            f"| {r['days']} | {r['files_total']} "
            f"| {p['files_listed']} / {p['files_read']} / {p['wall_sec']} s "
            f"| {c['files_listed']} / {c['files_read']} / {c['wall_sec']} s |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
