"""Streaming-sketch operators (north-star, SURVEY.md §7 stage 7).

Heavy hitters over a 100 TB token stream cannot group-by every distinct
token when the long tail is unbounded (URLs, hashes, typos): the shuffle
would carry one row per distinct token. The two-pass Misra–Gries plan
bounds state instead:

- **pass 1 (candidates)**: each partition folds its token stream into a
  Misra–Gries summary of ``capacity`` counters (mergeable-summaries
  semantics: Agarwal et al., PODS'12). The union of per-partition
  candidates is a SUPERSET of every token with global frequency
  > N/(capacity+1) — pigeonhole: a token below the local bound in every
  partition is below the global bound. Output is ≤ capacity rows per
  partition, so the "shuffle" is a driver-broadcastable candidate set.
- **pass 2 (exact recount)**: semi-join the token stream to the
  candidate set and count exactly, then gate on ``min_fraction``.

Because pass 1 can only over-admit (never drop a true heavy hitter when
``capacity ≥ 1/min_fraction``) and pass 2 is exact, the composed result
is EXACTLY the set of tokens with frequency ≥ min_fraction — fully
deterministic and oracle-checkable despite the sketch in the middle.

The per-partition fold runs in mapInPandas (Arrow batches): each batch
is counted vectorized (``value_counts``), merged into the running
summary, then pruned with the Misra–Gries merge rule — subtract the
(capacity+1)-th largest count from everything, drop non-positives.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citibike_analysis_spark.functions.text import tokens


def _mg_candidates(capacity: int):
    """mapInPandas fold: batches of (token) → ≤ capacity candidate rows."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for batch in batches:
            for tok, cnt in batch["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > capacity:
                # Misra–Gries merge: subtract the (capacity+1)-th largest
                # count, drop non-positives — total decrement stays within
                # the N/(capacity+1) error budget (mergeable summaries).
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        if counters:
            yield pd.DataFrame({"token": list(counters.keys())})

    return fold


def frequent_tokens(
    df: DataFrame,
    text_col: str,
    min_fraction: float = 0.02,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT heavy-hitter tokens: every token whose occurrence count is
    ≥ ``min_fraction`` of the corpus token stream, with exact counts.

    Output: (token, n_occurrences, frequency) — frequency rounded to 6.

    ``capacity`` defaults to ``ceil(1/min_fraction)``, the smallest
    sketch that guarantees no true heavy hitter is pruned in pass 1;
    raising it only shrinks the pass-2 candidate set's false-positive
    tail. Values below the guarantee threshold raise.
    """
    if not 0.0 < min_fraction <= 1.0:
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    guarantee = math.ceil(1.0 / min_fraction)
    if capacity is None:
        capacity = guarantee
    elif capacity < guarantee:
        raise ValueError(
            f"capacity {capacity} < 1/min_fraction ({guarantee}): "
            "pass 1 could prune a true heavy hitter"
        )
    # NOT spread() (r14): measured 1.7x SLOWER with the corpus
    # repartitioned before tokenize (q72 min 1.91 -> 3.24 s, reversed-
    # order A/B) — the stream is reuse()-persisted below, so the
    # exchange ships full text bytes to save a tokenize pass that the
    # persist already bounds to one evaluation.
    stream = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    # the token stream feeds three branches (MG candidate fold, total
    # count, recount semi-join) — materialize once so tokenize+explode
    # doesn't run three full corpus passes (the same multi-branch rule
    # as the dedup inverted indexes; r04 review)
    from citibike_analysis_spark.cache import reuse

    stream = reuse(stream)
    candidates = (
        stream.mapInPandas(_mg_candidates(capacity), "token string")
        .distinct()
    )
    total = stream.agg(F.count("*").alias("_n"))  # 1 row
    return (
        stream.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        # integer-exact gate at parts-per-million precision: the float
        # form `n >= min_fraction * _n` excluded a token sitting EXACTLY
        # at the threshold whenever the double product rounded up 1 ulp
        # (e.g. 0.07 * 100 = 7.000000000000001 — review finding). decimal
        # cross-multiplication cannot overflow long at corpus scale.
        .filter(
            F.col("n_occurrences").cast("decimal(38,0)") * F.lit(1_000_000)
            >= F.col("_n").cast("decimal(38,0)")
            * F.lit(int(round(min_fraction * 1_000_000)))
        )
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("_n"), 6).alias("frequency"),
        )
    )
