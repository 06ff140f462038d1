"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent *per partitioning*: the same row can be
kept or dropped depending on how the input was split, which breaks
reproducibility across cluster sizes and retries. Hash-threshold
sampling decides per ROW from the row's own identity, so the sample is
stable under repartitioning, retries, speculative execution, and engine
changes — the property a 100 TB corpus rebuild actually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_sample_predicate(
    key: Column, fraction: float, salt: str = ""
) -> Column:
    """Keep-predicate: md5(salt|key) first 4 hex chars < threshold.

    Fixed-width lowercase hex compares lexicographically == numerically,
    so the threshold is just a 4-hex-digit string — portable to ANY
    engine with md5 (the DuckDB oracles replay it verbatim). Granularity
    is 1/65536 ≈ 0.0015%; md5 is marginally slower than xxhash64 but the
    cross-engine determinism is the point (xxhash64 exists only in
    Spark). Different ``salt`` values draw independent samples.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    t = int(round(fraction * 0x10000))
    if t >= 0x10000:  # keep-all: 'ffff' < '10000' is lexicographically FALSE
        return F.lit(True)
    threshold = format(t, "04x")
    full_key = key if not salt else F.concat_ws("|", F.lit(salt), key)
    return F.substring(F.md5(full_key), 1, 4) < F.lit(threshold)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    strata_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic ~``fraction`` sample, independently within each
    stratum (the strata columns join the hash key as salt, so strata
    sample disjoint pseudo-random subsets). With ``strata_cols=None``
    this is a plain deterministic corpus sample.

    A pure narrow filter — no shuffle, pushes down to the scan's output,
    scales trivially. The per-stratum keep-rate concentrates around
    ``fraction`` by md5 uniformity (±binomial noise).
    """
    parts = [F.col(c).cast("string") for c in (strata_cols or [])]
    key = F.concat_ws("|", *parts, F.col(id_col).cast("string"))
    return df.filter(hash_sample_predicate(key, fraction, salt))


def stratified_fixed_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    strata_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-k-per-stratum deterministic sample (eval-set construction:
    "hold out 100 documents per source"): rank rows within each stratum
    by md5 of their identity and keep the first ``k``. Fractional
    sampling (:func:`stratified_sample`) drifts with stratum size; this
    form pins the count. Deterministic under repartitioning/retries for
    the same reason (rank order is a pure function of row identity);
    different ``salt`` → independent draw.

    One shuffle on the strata columns + a per-stratum rank window —
    Spark's WindowGroupLimit keeps ≤ k rows per stratum on the map side,
    so the shuffle moves survivors, not strata. A stratum with fewer
    than k rows is kept whole.

    GLOBAL-k CONTRACT (``strata_cols=None``): the window partitions by a
    constant, so the FINAL rank runs in one task. WindowGroupLimit still
    caps that task's input at ≤ k rows per upstream partition, so the
    single task sees ≤ k × num_partitions rows — fine for eval-set k
    (10³–10⁶), but a global k approaching corpus size belongs in the
    per-stratum form (pass real ``strata_cols``, the scale path — see
    q87 for the per-source shape).
    """
    parts = [F.col(c).cast("string") for c in (strata_cols or [])]
    key = F.concat_ws("|", *parts, F.col(id_col).cast("string"))
    full_key = key if not salt else F.concat_ws("|", F.lit(salt), key)
    w = Window.partitionBy(*(strata_cols or [F.lit(1)])).orderBy(
        F.md5(full_key), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    salt: str = "",
) -> DataFrame:
    """Deterministic global training shuffle: assign every row a shard
    and a position within the shard, both derived from ``md5(salt|id)``
    — the "shuffle the corpus before training" step, reproducible across
    cluster sizes, retries, and engines (no seed-per-partition state).

    Output: input columns + (shard, pos). Reading the shards in shard
    order and each shard in pos order replays one fixed pseudo-random
    permutation of the corpus; a different ``salt`` draws an independent
    permutation (epoch reshuffles).

    Plan shape: shard = first 16 bits of the md5 mod ``n_shards`` (a
    narrow projection), pos = row_number within the shard ordered by the
    full hash — one shuffle on ``shard``, one in-partition sort. md5
    uniformity makes shards equal-sized to binomial noise, so the sort is
    per-shard bounded: choose ``n_shards`` ≈ corpus_rows/shard_target
    (at 100 TB, thousands of shards — each a few GB — not 16; each sort
    then fits an executor). The window never sees a global order.
    """
    if n_shards < 1 or n_shards > 0x10000:
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    key = (
        F.col(id_col).cast("string")
        if not salt
        else F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    h = F.md5(key)
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards
    ).alias("shard")
    with_h = df.withColumn("_h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        with_h.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def global_positions(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """GLOBAL dense 0-based position for every row of the deterministic
    shuffle permutation — WITHOUT a global sort. The scalable
    zipWithIndex: global order is (shard, md5, id); each shard sorts
    independently (:func:`shuffle_shards`), shard row-counts (n_shards
    rows — kilobytes) get prefix-summed into offsets, and
    ``global_pos = offset[shard] + pos − 1``. The only single-partition
    window runs over the SHARD-SIZES frame, never the data.

    Output: input columns + (shard, pos, global_pos). Same determinism
    contract as shuffle_shards: stable under repartitioning/retries,
    new permutation per ``salt``.
    """
    sharded = shuffle_shards(df, id_col, n_shards, salt)
    sizes = sharded.groupBy("shard").agg(F.count("*").alias("_cnt"))
    w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w), F.lit(0))
    ).select("shard", "_off")
    return (
        sharded.join(F.broadcast(offsets), "shard")
        .withColumn("global_pos", (F.col("_off") + F.col("pos") - 1).cast("long"))
        .drop("_off")
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    strata_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    stratum (Efraimidis–Spirakis A-ES, Inf. Process. Lett. 2006): each
    row draws a uniform ``u`` from its md5 identity and gets priority
    ``ln(u)/w``; the top-k priorities per stratum are exactly a weighted
    sample without replacement. The standard distributed weighted
    sampler — a single rank window, no sequential pass, no rejection
    loop — here made REPRODUCIBLE by sourcing ``u`` from the row
    identity instead of an RNG (same stability contract as
    :func:`stratified_sample`; new draw per ``salt``).

    Rows with non-positive or NULL weight are excluded (zero-weight
    rows can never be drawn; a NULL would sort nondeterministically).
    One shuffle on the strata + a WindowGroupLimit-capped rank window.

    GLOBAL-k CONTRACT (``strata_cols=None``): the final rank window runs
    in one task over ≤ k × num_partitions rows (WindowGroupLimit caps
    each upstream partition's contribution at k). Sane eval-set k is
    fine; for corpus-scale k use real ``strata_cols`` (per-stratum
    windows parallelize — the q99-per-source shape is the scale path).
    """
    parts = [F.col(c).cast("string") for c in (strata_cols or [])]
    key = F.concat_ws("|", *parts, F.col(id_col).cast("string"))
    full_key = key if not salt else F.concat_ws("|", F.lit(salt), key)
    # u ∈ (0,1): first 8 md5 hex chars → uint32, +0.5 keeps u off 0 and 1
    u = (F.conv(F.substring(F.md5(full_key), 1, 8), 16, 10).cast("double") + 0.5) / F.lit(
        4294967296.0
    )
    priority = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*(strata_cols or [F.lit(1)])).orderBy(
        F.desc(priority), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    alpha: float = 0.5,
    total_fraction: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled source mixture: per-stratum keep-fractions
    computed FROM the data as ``p_s ∝ n_s^alpha`` — the multilingual /
    multi-source sampling scheme (exponent-smoothed multinomial, the
    ``alpha``≈0.3–0.7 rule of mBERT/XLM-R-style pretraining mixes) that
    flattens dominant sources and boosts the tail, totalling
    ~``total_fraction`` of the corpus. Differs from
    :func:`weighted_mixture` in that the weights are a corpus STATISTIC,
    not caller-supplied constants.

    Contract (all integer-derived, so the SQL oracle replays it
    exactly): ``quota_s = least(n_s, ceil(total_sel · p_s))`` with
    ``total_sel = ceil(total_fraction · N)``; per-row selection is the
    same deterministic md5-threshold predicate as
    :func:`weighted_mixture` at ``fraction = quota_s / n_s`` — a pure
    narrow filter, so the expected kept count tracks the quota without
    any per-stratum rank window (no per-group sort, no skew hazard from
    a giant stratum; the binomial deviation from the exact quota is the
    price of the scale-clean plan, and callers needing exact counts
    compose :func:`stratified_fixed_sample` with the quota frame).

    Plan: one tiny per-stratum count aggregation (rows = #strata) +
    1-row total, broadcast back, narrow filter. A NULL stratum is a
    stratum like any other (null-safe join; the md5 key's concat_ws
    simply skips the NULL part).
    """
    if not 0.0 < total_fraction <= 1.0:
        raise ValueError(f"total_fraction must be in (0, 1], got {total_fraction}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    counts = df.groupBy(F.col(strata_col).alias("_s")).agg(
        F.count("*").alias("_n")
    )
    tot = counts.agg(
        F.sum("_n").alias("_total"), F.sum(F.pow("_n", alpha)).alias("_z")
    )
    # threshold guard mirrors weighted_mixture's thr(): both quota >= n
    # AND a rounded integer >= 0x10000 map to the keep-all sentinel 'g'.
    # Without the second clause, round(quota/n * 65536) == 65536 for a
    # nearly-whole stratum formats as the 5-char '10000', and the
    # lexicographic compare keeps only hashes starting '0' — ~6% of a
    # stratum meant to be kept whole (review finding).
    # Floor clamp (review finding): in an extreme-skew stratum where
    # round(quota/n * 65536) rounds to 0 (n > ~131072·quota) the '0000'
    # threshold would keep ZERO rows despite quota >= 1, inverting the
    # tail-boost guarantee instead of deviating binomially — clamp the
    # scaled threshold to at least 1 whenever the quota is at least 1
    # (expected kept ≈ n/65536 rows, the closest the 4-hex-digit grid
    # can get to the quota from above zero). Mirrored in Q117_SQL.
    rounded = F.round(F.col("_quota") / F.col("_n") * 0x10000).cast("int")
    scaled = F.when(
        (F.col("_quota") >= 1) & (rounded < 1), F.lit(1)
    ).otherwise(rounded)
    # ceil-boundary guard (review finding): _z is a double SUM whose
    # value is summation-order dependent (neither engine guarantees a
    # reduction order), so a 1-ulp Spark-vs-DuckDB difference could flip
    # the outer ceil() when the exact quotient lands ON an integer.
    # Shaving 1e-9 RELATIVE before ceil absorbs order drift (≤ ~#strata
    # · 2⁻⁵² ≈ 1e-10 relative for 1e6 strata) on both engines, moving
    # the knife edge to quotients within 1e-9 of k/(1-1e-9) — a residual
    # measure-zero risk, documented rather than eliminable with plain
    # double sums; alpha=0.5 keeps pow() itself IEEE-exact (sqrt).
    raw_quota = (
        F.ceil(F.lit(total_fraction) * F.col("_total"))
        * F.pow("_n", alpha)
        / F.col("_z")
    )
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "_quota",
            F.least(
                F.col("_n"),
                F.ceil(raw_quota * F.lit(1.0 - 1e-9)),
            ),
        )
        .withColumn(
            "_thr",
            F.when(
                (F.col("_quota") >= F.col("_n")) | (scaled >= F.lit(0x10000)),
                F.lit("g"),
            ).otherwise(F.format_string("%04x", scaled)),
        )
        .select("_s", "_quota", "_thr")
    )
    key = F.concat_ws(
        "|", F.col(strata_col).cast("string"), F.col(id_col).cast("string")
    )
    full_key = key if not salt else F.concat_ws("|", F.lit(salt), key)
    return (
        # eqNullSafe: a plain equi-join drops NULL-stratum rows while
        # their count still inflates _total/_z, deflating every other
        # stratum's realized fraction (review finding)
        df.join(
            F.broadcast(quotas), F.col(strata_col).eqNullSafe(F.col("_s")), "inner"
        )
        .filter(F.substring(F.md5(full_key), 1, 4) < F.col("_thr"))
        .drop("_s", "_quota", "_thr")
    )


def weighted_mixture(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Corpus mixing: keep each stratum at its OWN fraction — the
    source-reweighting step of training-corpus construction (e.g. keep
    50% of wiki, 5% of crawl). Same deterministic md5 threshold as
    :func:`stratified_sample`, but the threshold is a per-row CASE on
    ``strata_col``; still a pure narrow filter, no shuffle.
    """
    for v, f in weights.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")

    def thr(fraction: float) -> str:
        # 'g' sorts after every hex digit → keep-all sentinel
        t = int(round(fraction * 0x10000))
        return "g" if t >= 0x10000 else format(t, "04x")

    threshold = F.lit(thr(default_fraction))
    for v, f in weights.items():
        threshold = F.when(F.col(strata_col) == v, F.lit(thr(f))).otherwise(
            threshold
        )
    key = F.concat_ws(
        "|", F.col(strata_col).cast("string"), F.col(id_col).cast("string")
    )
    full_key = key if not salt else F.concat_ws("|", F.lit(salt), key)
    return df.filter(F.substring(F.md5(full_key), 1, 4) < threshold)
