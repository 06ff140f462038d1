"""Skew-mitigation operators (SURVEY.md §4 "skew is real here").

AQE's skew-join splitting handles joins; *aggregation* skew — one hot
group absorbing a whole task — needs plan-shape help when the aggregate
function isn't algebraic or when per-key fan-in must be bounded:

- For algebraic aggregates (sum/count/min/max/avg) Spark's partial
  aggregation already combines map-side, so plain ``groupBy`` does not
  suffer aggregation skew. Use plain ``groupBy`` then.
- For **non-combinable aggregates** — ``collect_list``, exact
  ``count_distinct`` re-aggregation, big string concat — every row of a
  hot key lands in one reducer. :func:`salted_agg` splits each key into
  ``salt_buckets`` sub-keys (stage 1), then merges the per-salt partials
  (stage 2). The hot key's fan-in drops by the salt factor; stage 2
  handles ``salt_buckets`` rows per key, never the raw rows.

The salt is ``pmod(xxhash64(rand-free row fingerprint), buckets)`` —
deterministic from row content, so re-runs and retried tasks salt
identically (a ``rand()`` salt breaks task-retry determinism and
speculative execution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(fingerprint_cols: Sequence[str | Column], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from row-content columns."""
    return F.pmod(F.xxhash64(*fingerprint_cols), F.lit(buckets)).cast("int")


def salted_collect_list(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 32,
    sort_result: bool = True,
) -> DataFrame:
    """collect_list per key with bounded reducer fan-in.

    Stage 1 collects per (key, salt) — at most ~1/buckets of a hot key's
    rows per task; stage 2 flattens the ≤ ``buckets`` partial lists per
    key. With ``sort_result`` the final array is sorted, making the
    result deterministic (plain collect_list order is partition-order
    dependent anyway, so sorting loses nothing).

    The salt mixes a per-row id into the hash (r04 review): a value-only
    salt sends ALL rows of a hot key's low-cardinality value to one
    bucket — a key with 10^8 rows over 3 distinct values would still
    funnel ~n/3 rows through one reducer, the exact skew this operator
    exists to bound. The row-id component is nondeterministic across
    retries, which is safe here because the OUTPUT is salt-assignment
    invariant (a multiset union, sorted or declared unordered); Spark
    marks the expression nondeterministic and re-runs whole stages on
    retry accordingly. Contrast :func:`salted_count_distinct`, whose
    correctness REQUIRES the value-only salt.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.col(value_col), F.monotonically_increasing_id()),
            F.lit(buckets),
        ).cast("int"),
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.collect_list(value_col).alias("__part")
    )
    merged = partial.groupBy(*key_cols).agg(
        F.flatten(F.collect_list("__part")).alias(value_col)
    )
    if sort_result:
        merged = merged.withColumn(value_col, F.array_sort(F.col(value_col)))
    return merged


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 32,
    out: str = "n_distinct",
) -> DataFrame:
    """Exact count(DISTINCT value) per key without a hot-key reducer.

    Stage 1 counts distinct values per (key, salt); the salt derives from
    the VALUE, so equal values always share a salt bucket and the per-salt
    distinct counts are disjoint — stage 2 just sums them. Two narrow
    aggregations replace one skew-prone expand+distinct.
    """
    salted = df.withColumn("__salt", salt_column([value_col], buckets))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count_distinct(F.col(value_col)).alias("__d")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__d").cast("long").alias(out))
