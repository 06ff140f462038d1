"""Query-plan registry.

Every implemented operator from SURVEY.md §2 (and the north-star §7
surface) is declared here as a :class:`QuerySpec`: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, the exact
ANSI-SQL oracle that DuckDB runs over the same parquet tables. Column
names and rounding are aligned on both sides so the driver's
order-insensitive value-hash comparison is meaningful.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One verifiable query/operator.

    - ``fn``: the Spark implementation.
    - ``oracle``: DuckDB SQL computing the same result (None → the driver
      falls back to a rows-only check; reserved for genuinely
      non-SQL-expressible operators).
    - ``survey``: SURVEY.md §2 operator ids this query exercises.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey: str


def all_queries() -> dict[str, QuerySpec]:
    from citibike_analysis_spark.plans import llm, relational

    out: dict[str, QuerySpec] = {}
    out.update(relational.QUERIES)
    out.update(llm.QUERIES)
    return out
