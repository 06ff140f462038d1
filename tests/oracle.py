"""DuckDB differential-oracle harness (SURVEY.md §5.2.2).

Mirrors the driver's comparison: run the Spark query and the DuckDB SQL
over the same parquet tables, then compare row count, column names, and
an order-insensitive multiset of normalized row values.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

from citibike_analysis_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and bounded noise; queries pre-round, this is belt+braces
        return round(v, 9) + 0.0
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, oracle_cols: list[str], oracle_rows: list[tuple]) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={s_cols} oracle={oracle_cols}")
        return problems
    s_rows = [tuple(r) for r in spark_df.collect()]
    if len(s_rows) != len(oracle_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(oracle_rows)}")
    # align oracle column order to spark order
    idx = [oracle_cols.index(c) for c in s_cols]
    o_norm = sorted(
        (tuple(_norm(r[i]) for i in idx) for r in oracle_rows), key=repr
    )
    s_norm = sorted((tuple(_norm(v) for v in r) for r in s_rows), key=repr)
    if o_norm != s_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, o_norm) if a != b
        ][:5]
        extra_s = [r for r in s_norm if r not in set(o_norm)][:3]
        extra_o = [r for r in o_norm if r not in set(s_norm)][:3]
        problems.append(
            f"values differ; first aligned diffs={diffs} spark-only={extra_s} oracle-only={extra_o}"
        )
    return problems
