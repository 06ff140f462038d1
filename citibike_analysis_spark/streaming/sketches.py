"""Stateful streaming sketches (SURVEY.md §2.9 custom-stateful × §7).

Continuous heavy hitters over an unbounded document stream: the
streaming dual of ``operators.sketches.frequent_tokens``. Batch MG
answers "what's frequent in this corpus"; a crawler wants "what's
frequent SO FAR, updated per micro-batch, without unbounded state" —
boilerplate detection while the crawl is still running.

Design: tokens are exploded and keyed by ``xxhash64(token) % n_shards``;
each shard holds ONE Misra–Gries summary of ``capacity`` counters in
``applyInPandasWithState`` state. Per micro-batch a shard folds its new
token counts into the summary (the mergeable-summaries merge: add,
subtract the (capacity+1)-th largest, drop non-positives) and emits its
current counters. State per shard is ≤ capacity (token, count) pairs —
memory is O(n_shards × capacity), NEVER O(distinct tokens).

Guarantee (union over shards, same pigeonhole as the batch form): any
token whose true count since stream start exceeds
``N_shard/(capacity+1)`` of its shard's stream is present in that
shard's counters, and MG counts are lower bounds. Sharding by token
hash keeps each token's occurrences in exactly one shard, so per-token
guarantees are exact per shard — no cross-shard merging needed.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from citibike_analysis_spark.functions.text import tokens

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
        # sticky: set forever once the prune branch has EVER fired for
        # this shard. Pruning shrinks the counter set back below
        # capacity, so the final set size cannot tell an exact shard
        # from a pruned one — exactly the hole the r07 ADVICE named in
        # q121's exact-regime guard. The flag is the audit-grade signal:
        # pruned == false  ⇔  every count_lb in this shard is exact.
        T.StructField("pruned", T.BooleanType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("token", T.StringType()),
        T.StructField("count_lb", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("pruned", T.BooleanType()),
    ]
)


def _mg_update(capacity: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            st = state.get
            toks, counts, n_seen = st[0], st[1], st[2]
            # tolerant unpack (r09 ADVICE): a pre-r08 state row has no
            # 'pruned' field. In practice Spark's state-schema
            # compatibility check rejects such a restart before this
            # code runs (see track_frequent_tokens docstring), but if a
            # 3-field row ever does arrive, the conservative reading is
            # pruned=True — "cannot prove every count is exact" — so an
            # exact-regime consumer fails safe instead of trusting
            # counts whose prune history is unknown.
            pruned = bool(st[3]) if len(st) > 3 and st[3] is not None else True
            counters = dict(zip(toks, counts))
        else:
            counters, n_seen, pruned = {}, 0, False
        for pdf in pdfs:
            vc = pdf["token"].value_counts()
            n_seen += int(vc.sum())
            for tok, cnt in vc.items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > capacity:
                pruned = True
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        state.update(
            (list(counters.keys()), list(counters.values()), n_seen, pruned)
        )
        shard = int(key[0])
        yield pd.DataFrame(
            {
                "shard": shard,
                "token": list(counters.keys()),
                "count_lb": list(counters.values()),
                "n_seen": n_seen,
                "pruned": pruned,
            }
        )

    return update


def track_frequent_tokens(
    docs: DataFrame,
    text_col: str = "text",
    capacity: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Continuous Misra–Gries heavy hitters per token-hash shard.

    Emits, every micro-batch, each updated shard's full counter set:
    (shard, token, count_lb, n_seen, pruned) — ``count_lb`` is the MG
    lower bound on the token's count since stream start, ``n_seen`` the
    shard's total token throughput (the denominator for a frequency
    gate), and ``pruned`` is sticky-true once the shard has EVER pruned
    (iff false, every ``count_lb`` in the shard is the exact count —
    the signal exact-regime consumers like q121 must assert on, since
    pruning shrinks the set back below capacity and the final set size
    proves nothing). Use with ``outputMode("update")``; downstream exact recount
    (the batch pass 2) runs over the landed corpus when a candidate
    crosses the gate.

    CHECKPOINT COMPATIBILITY (r09 ADVICE): adding ``pruned`` to the
    state schema in r08 was a checkpoint-BREAKING change. A stream
    restarted from a pre-change checkpoint fails Spark's state-schema
    compatibility check (``StateSchemaNotCompatible`` — new nullable
    field or not, arbitrary-state rows are compared structurally);
    start such a stream from a FRESH checkpoint and let the batch
    recount pass re-establish counts over the landed corpus. Defense
    in depth: if a 3-field state row ever does reach the update
    function, it unpacks tolerantly with ``pruned=True`` — the
    conservative reading, since the old rows carry no prune history —
    so exact-regime consumers (q121's guard) fail safe rather than
    certify unknown counts as exact.
    """
    stream = docs.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    ).withColumn(
        "shard", (F.pmod(F.xxhash64("token"), F.lit(n_shards))).cast("int")
    )
    return stream.groupBy("shard").applyInPandasWithState(
        _mg_update(capacity),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
