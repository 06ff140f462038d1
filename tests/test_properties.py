"""Property-based tests (hypothesis) for as-of join and sessionization.

Each operator is checked against a deliberately naive pure-Python
reference on randomized inputs — the references are O(n²)/sequential,
the operators are distributed plans; the property is exact agreement.
Example counts are small (each example runs Spark jobs), but hypothesis
shrinks failures to minimal cases, which unit examples cannot.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from citibike_analysis_spark.operators.asof import asof_join
from citibike_analysis_spark.operators.windows import sessionize

BASE = dt.datetime(2024, 1, 1)

# (key, seconds-offset) pairs; duplicates and shared timestamps on purpose
events = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 5000)),
    min_size=0,
    max_size=14,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("lid", T.LongType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("rid", T.LongType()),
    ]
)


@given(left=events, right=events)
@settings(**SETTINGS)
def test_asof_matches_naive_scan(spark, left, right):
    left_rows = [
        (k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)
    ]
    right_rows = [
        (k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(right)
    ]
    out = asof_join(
        spark.createDataFrame(left_rows, LEFT_SCHEMA),
        spark.createDataFrame(right_rows, RIGHT_SCHEMA),
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["rid"],
    )
    got = {r["lid"]: r["rid_asof"] for r in out.collect()}

    def naive(k, ts):
        cands = [(rts, rid) for rk, rts, rid in right_rows if rk == k and rts <= ts]
        return max(cands)[1] if cands else None

    assert len(got) == len(left_rows)  # left rows always preserved
    for k, ts, lid in left_rows:
        assert got[lid] == naive(k, ts), (k, ts, lid)


@given(left=events, right=events, width=st.sampled_from([7, 100, 3600]))
@settings(**SETTINGS)
def test_bucketed_asof_equals_plain_asof(spark, left, right, width):
    # the hot-key-safe plan must be result-identical to the plain one for
    # ANY bucket width — including widths smaller than typical gaps
    # (forcing carry-forward across many empty buckets) and wider than
    # the whole span (degenerating to one bucket)
    from citibike_analysis_spark.operators.asof import asof_join_bucketed

    left_rows = [
        (k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)
    ]
    right_rows = [
        (k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(right)
    ]
    args = dict(on=["k"], left_ts="ts", right_ts="ts", value_cols=["rid"])
    ldf = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    rdf = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    plain = {
        r["lid"]: r["rid_asof"] for r in asof_join(ldf, rdf, **args).collect()
    }
    bucketed = {
        r["lid"]: r["rid_asof"]
        for r in asof_join_bucketed(
            ldf, rdf, bucket_seconds=width, **args
        ).collect()
    }
    assert bucketed == plain


skewed_rows = st.lists(
    st.tuples(
        # one hot key on purpose: "hot" drawn 5x as often
        st.sampled_from(["hot", "hot", "hot", "hot", "hot", "a", "b"]),
        st.integers(0, 6),
    ),
    min_size=0,
    max_size=25,
)


@given(rows=skewed_rows, buckets=st.sampled_from([1, 3, 16]))
@settings(**SETTINGS)
def test_salted_aggregates_equal_plain_forms(spark, rows, buckets):
    from pyspark.sql import functions as F

    from citibike_analysis_spark.operators.skew import (
        salted_collect_list,
        salted_count_distinct,
    )

    df = spark.createDataFrame(
        [(k, v) for k, v in rows] or [("empty", 0)], "k string, v long"
    )
    plain_distinct = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    got_distinct = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["k"], "v", buckets=buckets).collect()
    }
    assert got_distinct == plain_distinct

    plain_lists = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    got_lists = {
        r["k"]: r["v"]
        for r in salted_collect_list(df, ["k"], "v", buckets=buckets).collect()
    }
    assert got_lists == plain_lists


@given(rows=events, gap=st.sampled_from([1, 60, 600]))
@settings(**SETTINGS)
def test_sessionize_matches_naive_splitter(spark, rows, gap):
    data = [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data,
        T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("ts", T.TimestampNTZType()),
                T.StructField("eid", T.LongType()),
            ]
        ),
    )
    out = sessionize(df, ["k"], "ts", gap_seconds=gap, tie_break=["eid"])
    got = {r["eid"]: r["session_idx"] for r in out.collect()}

    expected: dict[int, int] = {}
    for key in {k for k, _, _ in data}:
        mine = sorted(
            ((ts, eid) for k, ts, eid in data if k == key)
        )
        idx, last = 0, None
        for ts, eid in mine:
            if last is None or (ts - last).total_seconds() > gap:
                idx += 1
            expected[eid] = idx
            last = ts
    assert got == expected


# --- round_to_hour vs pandas dt.round('h') on arbitrary microsecond
# timestamps (pins the ADVICE r1 sub-millisecond fix for ALL inputs,
# not just curated boundary examples) ---------------------------------

micro_offsets = st.lists(
    st.integers(0, 2 * 3600 * 1_000_000 - 1),  # microseconds across 2 hours
    min_size=1,
    max_size=40,
)


@given(offsets=micro_offsets)
@settings(**SETTINGS)
def test_round_to_hour_matches_pandas_everywhere(spark, offsets):
    import pandas as pd

    from citibike_analysis_spark.functions.temporal import round_to_hour
    from pyspark.sql import functions as F

    ts = pd.Series(
        [pd.Timestamp(BASE) + pd.Timedelta(microseconds=us) for us in offsets]
    )
    expected = ts.dt.round("h").tolist()
    df = spark.createDataFrame(pd.DataFrame({"ts": ts}))
    got = [
        r["r"]
        for r in df.select(round_to_hour(F.col("ts")).alias("r")).collect()
    ]
    assert sorted(got) == sorted(expected)


# --- hash sampling monotonicity: a smaller fraction's sample is a
# subset of a larger fraction's (thresholds are nested) ---------------

@given(
    f1=st.integers(1, 99),
    f2=st.integers(1, 99),
)
@settings(**SETTINGS)
def test_hash_sample_fractions_are_nested(spark, f1, f2):
    from citibike_analysis_spark.operators.sampling import stratified_sample

    lo, hi = sorted((f1, f2))
    df = spark.range(400).withColumnRenamed("id", "doc_id")
    small = {r["doc_id"] for r in stratified_sample(df, "doc_id", lo / 100).collect()}
    big = {r["doc_id"] for r in stratified_sample(df, "doc_id", hi / 100).collect()}
    assert small <= big


# ---------------------------------------------------------------------------
# r2 additions: training shuffle, sequence packing, heavy hitters,
# quantization — each against a naive reference or an algebraic invariant.
# ---------------------------------------------------------------------------

id_sets = st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True)


@given(ids=id_sets, n_shards=st.integers(1, 7))
@settings(**SETTINGS)
def test_shuffle_shards_is_permutation_any_input(spark, ids, n_shards):
    from citibike_analysis_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    out = shuffle_shards(df, "doc_id", n_shards=n_shards).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(ids)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


@given(
    costs=st.lists(st.integers(0, 40), min_size=1, max_size=20),
    window=st.integers(1, 50),
)
@settings(**SETTINGS)
def test_pack_offsets_matches_sequential_fill(spark, costs, window):
    from pyspark.sql import functions as F2

    from citibike_analysis_spark.operators.windows import pack_offsets

    df = spark.createDataFrame(
        [(i, "g", c) for i, c in enumerate(costs)], "doc_id: long, g: string, n: long"
    )
    got = {
        r["doc_id"]: (r["offset"], r["window_idx"], r["window_offset"], r["n_windows"])
        for r in pack_offsets(df, ["g"], [F2.asc("doc_id")], "n", window).collect()
    }
    off = 0
    for i, c in enumerate(costs):
        widx = off // window
        expect_nw = 0 if c == 0 else (off + c - 1) // window - widx + 1
        assert got[i] == (off, widx, off % window, expect_nw), (i, costs, window)
        off += c


@given(
    # skewed stream over a small alphabet; dup-heavy on purpose
    toks=st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=60),
    frac_pct=st.integers(5, 50),
    parts=st.integers(1, 6),
)
@settings(**SETTINGS)
def test_frequent_tokens_exact_vs_counter(spark, toks, frac_pct, parts):
    from collections import Counter

    from citibike_analysis_spark.operators.sketches import frequent_tokens

    frac = frac_pct / 100.0
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "i: long, text: string"
    ).repartition(parts)
    got = {
        r["token"]: r["n_occurrences"]
        for r in frequent_tokens(df, "text", min_fraction=frac).collect()
    }
    counts = Counter(toks)
    n = len(toks)
    want = {t: c for t, c in counts.items() if c >= frac * n}
    assert got == want, (toks, frac)


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=12
    )
)
@settings(**SETTINGS)
def test_quantization_error_bounded_by_half_step(spark, vec):
    from citibike_analysis_spark.operators.similarity import quantization_error

    df = spark.createDataFrame([(0, vec)], "vec_id: long, embedding: array<float>")
    row = quantization_error(df).collect()[0]
    scale, mse = row["scale"], row["mse"]
    assert mse >= 0
    # per-element |error| <= scale/2 ⇒ mse <= (scale/2)^2 (+ rounding slack)
    assert mse <= (scale / 2) ** 2 + 1e-9, (vec, scale, mse)


@given(
    vals=st.lists(
        # 2-decimal grid → deliberate ties at every size
        st.integers(-300, 300).map(lambda i: i / 100.0),
        min_size=1,
        max_size=40,
    ),
    p_pct=st.sampled_from([1, 10, 25, 50, 75, 90, 99]),
    parts=st.sampled_from([1, 3, 7]),
)
@settings(**SETTINGS)
def test_percentile_approx_exact_regime_is_disc(spark, vals, p_pct, parts):
    """Pins the convention the r07 q71/q116 re-registration rests on:
    percentile_approx with n < accuracy (the exact regime — GK rank
    error ⌊n/acc⌋ = 0) returns exactly the order statistic at rank
    ⌈p·n⌉, i.e. Postgres/DuckDB ``quantile_disc`` — independent of the
    partition layout the sketch merges across."""
    import math

    from pyspark.sql import functions as F

    p = p_pct / 100.0
    df = spark.createDataFrame(
        [(v,) for v in vals], "v: double"
    ).repartition(parts)
    got = df.agg(F.expr(f"percentile_approx(v, {p}, 10000)")).first()[0]
    want = sorted(vals)[max(0, math.ceil(p * len(vals)) - 1)]
    assert got == want, (vals, p, got, want)


# ---------------------------------------------------------------------------
# Bloom-gated decontamination == exact (r08): randomized corpora with a
# small shared vocabulary force real n-gram overlap, so the invariant —
# bloom output EXACTLY equals contamination_flags — is exercised with
# genuine hits, misses, short docs (< n tokens), and duplicate texts.
# A naive python reference is unnecessary: the exact operator IS the
# reference (its own parity is pinned against the DuckDB oracle).
# ---------------------------------------------------------------------------

_vocab = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_vocab, min_size=0, max_size=12).map(" ".join)
_docs = st.lists(_doc, min_size=0, max_size=8)


@given(corpus_texts=_docs, bench_texts=_docs, n=st.sampled_from([2, 3]))
@settings(**SETTINGS)
def test_bloom_decontamination_equals_exact(spark, corpus_texts, bench_texts, n):
    from citibike_analysis_spark.operators.dedup import (
        contamination_flags,
        contamination_flags_bloom,
    )

    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], schema
    )
    bench = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench_texts)], schema
    )
    exact = sorted(
        map(tuple, contamination_flags(corpus, bench, "doc_id", "text", n=n).collect())
    )
    bloom = sorted(
        map(
            tuple,
            contamination_flags_bloom(corpus, bench, "doc_id", "text", n=n).collect(),
        )
    )
    assert bloom == exact


@given(
    n_items=st.integers(min_value=-5, max_value=50_000_000),
    bits_per_item=st.sampled_from([8, 16, 32]),
)
@settings(max_examples=200, deadline=None)
def test_bloom_sizing_invariants(n_items, bits_per_item):
    """The gate's public sizing helper (r10 ADVICE hardened it for
    empty inputs): the bitmap is always a power of two, never below
    the 1024 floor, and for positive n never below bits_per_item×n —
    the three facts the FPP instrument and the operator's broadcast
    contract both rest on."""
    from citibike_analysis_spark.operators.dedup import bloom_m_bits

    m = bloom_m_bits(n_items, bits_per_item)
    assert m >= 1024
    assert m & (m - 1) == 0, "not a power of two"
    if n_items > 0:
        assert m >= bits_per_item * n_items
        assert m < 2 * max(1024, bits_per_item * n_items), "oversized"
