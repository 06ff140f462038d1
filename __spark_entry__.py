"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reduction query (SURVEY.md §3.1 — the
reference's "interesting stations" CTE+window query re-keyed to the
synthetic star schema) at sf0.001. ``queries()`` /``oracle_sql()`` expose
every implemented SURVEY.md §2 + §7 operator with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from citibike_analysis_spark.plans.relational import q20_interesting_suppliers
    from citibike_analysis_spark.session import tune

    tune(spark)
    # sf0.001 has only 10 suppliers — ntile(100) buckets are 1..10, so the
    # sf0.01-scale percentile gates (40/30/30) would select nothing; use
    # proportionally scaled gates for the smoke check.
    return q20_interesting_suppliers(spark, SF0001, gates=(4, 3, 3))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    from citibike_analysis_spark.plans import all_queries
    from citibike_analysis_spark.session import tune

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    from citibike_analysis_spark.plans import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
