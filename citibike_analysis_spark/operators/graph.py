"""Connected components for dedup clustering (SURVEY.md §7 north-star).

Near-dup detection (MinHash/SimHash/Jaccard — operators/dedup.py) emits
*pairs*; an actual dedup pipeline must transitively close them into
clusters and elect one canonical document per cluster (A~B, B~C ⇒ keep
one of {A,B,C}). The reference's adjacency output
(notebooks/CitiBike-1.ipynb:222-245) stops at 1-hop neighbor lists; this
operator is the closure step a 100 TB corpus needs.

Algorithm: iterative min-label propagation, fully declarative per round —

1. every vertex starts labeled with its own id;
2. each round, every edge pushes its endpoint's current label to the
   other endpoint; a vertex keeps the minimum label seen
   (join + groupBy-min = the whole round);
3. converged when no label changed.

Rounds needed = component diameter. Dedup graphs are dense blobs with
tiny diameters (near-dup similarity is nearly transitive), so 2-4 rounds
is typical; ``max_iter`` guards adversarial chains. Each round is 2
shuffles on the edge/vertex keys; ``localCheckpoint`` truncates the
lineage so round N's plan doesn't embed rounds 1..N-1 (without it the
plan doubles per round and the driver OOMs long before the data does).
For graphs with huge diameters (not the dedup shape), the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log n) rounds — same
declarative building blocks, implemented below as
:func:`connected_components_star`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) undirected edge list → (id, component) with component =
    min vertex id in the connected component. Deterministic.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Symmetrize with ONE reference to the edge plan, not a self-union
    # (r14, guide §2.4): ``e ∪ e.swap`` embeds the upstream pair
    # pipeline TWICE, and both copies execute — for q46 that meant the
    # whole shingle-intersection join ran once per union side (the
    # profiled execution scanned documents 8×: 2 union sides × 4 index
    # references). Exploding a 2-element struct array doubles the rows
    # in one pass over a single copy of the plan; the inferred
    # size(array(..))>0 filter is constant-foldable, so the
    # explode-of-lambda trap (_kgram_positions docstring) does not
    # apply.
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(
                        F.col("b").alias("a"), F.col("a").alias("b")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
    )
    sym = sym.localCheckpoint(eager=False)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
    )
    # Convergence detector: one cheap aggregate on the freshly
    # checkpointed result — (count, xor of per-row hashes) is a set
    # signature of the (id → component) map, equal iff no label changed
    # (labels only ever decrease, so no ABA). NOT sum(component): under
    # ANSI mode (the default) sum overflows long for hash-derived vertex
    # ids (xxhash64 values ~9e18 — the natural id scheme for the dedup
    # pairs this operator closes) and throws on the second vertex; the
    # star variant always used the xor form for this reason (r04 review).
    # Block hygiene: once round N's checkpoint is materialized (by that
    # same aggregate), round N-1's blocks are garbage — free them NOW so
    # peak storage is one label table, not one per round (at corpus
    # scale, rounds × vertex-table blocks is real memory). The FINAL
    # round's checkpoint backs the returned plan: registered with
    # cache.track for scope-level release, like the operator persists.
    from citibike_analysis_spark.cache import free_checkpoint, track

    prev_sig = None
    prev_frame = None
    converged = False
    # max_iter + 1: labels stabilizing on round max_iter can only be
    # CONFIRMED by the signature check one round later, so without the
    # extra round a component whose propagation depth equals max_iter
    # raised "diameter > max_iter" despite fully correct labels (review
    # finding — the budget bounds propagation rounds; the confirmation
    # round is bookkeeping)
    for _ in range(max_iter + 1):
        msgs = sym.join(
            labels, sym["a"] == labels["id"]
        ).select(F.col("b").alias("id"), "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)  # the agg below materializes it —
            # one job per round instead of checkpoint-job + agg-job
        )
        sig = tuple(
            new_labels.agg(
                F.count("*"), F.bit_xor(F.xxhash64("id", "component"))
            ).collect()[0]
        )
        if prev_frame is not None:
            free_checkpoint(prev_frame)
        labels, prev_frame = new_labels, new_labels
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    # the fixpoint no longer references the edge list — free it too
    free_checkpoint(sym)
    track(labels)
    if not converged:
        # Partially-propagated labels are silently WRONG (a chain longer
        # than max_iter+1 keeps distinct labels inside one component), and
        # callers like dedup_clusters would canonicalize against them.
        # Message states the ACTUAL budget (review finding): the loop ran
        # max_iter+1 propagation rounds (the confirmation round also
        # propagates), so labels here are unconfirmed — complete only in
        # the knife-edge case diameter == max_iter+1, where the last
        # round finished propagation but no round remained to confirm it.
        raise RuntimeError(
            "connected_components could not confirm convergence within "
            f"{max_iter + 1} propagation rounds (max_iter={max_iter} + 1 "
            "confirmation round, which also propagates); labels are "
            "guaranteed complete only for diameter <= max_iter — raise "
            "max_iter or use connected_components_star (O(log n) rounds)"
        )
    return labels


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over a SYMMETRIC edge list (a, b).

    Per vertex u: m = min(N(u) ∪ {u}); every strictly-larger neighbor
    v > u re-attaches to m. Emitted edges are (v, m) with m < v.
    """
    mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
    return (
        sym.join(mins, "a")
        .withColumn("_m", F.least(F.col("_mn"), F.col("a")))
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient every edge toward its larger endpoint,
    then per vertex u attach all smaller neighbors (and u itself) to
    m = min(N(u) ∪ {u}). Output edges are (v, m) with m < v."""
    oriented = (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("_mn"))
    joined = oriented.join(mins, "a")
    return (
        joined.filter(F.col("b") != F.col("_mn"))
        .select(F.col("b").alias("a"), F.col("_mn").alias("b"))
        .unionByName(mins.select("a", F.col("_mn").alias("b")))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(src, dst) edge list → (id, component): alternating large-star /
    small-star connected components (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14 — public algorithm).

    Converges in O(log n) full rounds regardless of component diameter —
    the escalation path from :func:`connected_components` (min-label
    propagation, O(diameter) rounds) for chain-shaped graphs. Same
    declarative building blocks: each half-round is a groupBy-min plus an
    equi-join on the vertex key; ``localCheckpoint`` truncates per-round
    lineage. Convergence detector: the edge-set signature
    (count + XOR of per-edge hashes — NOT sum, which overflows long
    under ANSI mode for xxhash64-scale ids) is compared across rounds —
    one cheap aggregate, no join-against-previous.

    Output matches :func:`connected_components` exactly (component = min
    vertex id; vertices = every endpoint of the input edge list);
    property-tested equal on random graphs.
    """
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # vertex universe from the RAW list (a pure self-loop still registers
    # its vertex, as in connected_components); stars only need real edges
    verts = (
        raw.select("a").unionByName(raw.select(F.col("b").alias("a")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    # same per-round block hygiene as connected_components: freeing
    # round N-1's checkpoint once round N materializes keeps peak
    # storage at one edge table; the final round's checkpoint (and the
    # vertex universe, which the returned plan left-joins) stay live,
    # registered for scope-level release.
    from citibike_analysis_spark.cache import free_checkpoint, track

    prev_sig = None
    prev_frame = e  # the input checkpoint: garbage once round 0 lands
    converged = False
    # max_iter + 1 for the same reason as connected_components: the
    # signature can only confirm round-max_iter stabilization one round
    # later (review finding)
    for _ in range(max_iter + 1):
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        e = _small_star(_large_star(sym)).localCheckpoint(eager=False)
        # xor of per-edge hashes: order-insensitive and overflow-free
        # under ANSI mode (edges are distinct, so xor is a set signature)
        sig = tuple(
            e.agg(F.count("*"), F.bit_xor(F.xxhash64("a", "b"))).collect()[0]
        )
        if prev_frame is not None:
            free_checkpoint(prev_frame)
        prev_frame = e
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    track(e)
    track(verts)
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds (expected O(log n)); raise max_iter"
        )
    # at the fixpoint the edge set is a union of stars (v, center):
    # attach every non-center vertex to its center, centers to themselves
    comp = e.groupBy("a").agg(F.min("b").alias("component"))
    return (
        verts.join(comp, verts["a"] == comp["a"], "left")
        .select(
            verts["a"].alias("id"),
            F.coalesce("component", verts["a"]).alias("component"),
        )
    )


def dedup_clusters(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    algorithm: str = "label_prop",
) -> DataFrame:
    """Assign every document its canonical id (min id in its near-dup
    cluster; singletons are their own canonical) and the cluster size.

    This is the "keep one copy" step of corpus dedup: filter
    ``id == canonical_id`` downstream to retain canonicals only.

    ``algorithm``: ``"label_prop"`` (default — O(diameter) rounds, ideal
    for the dense tiny-diameter blobs near-dup graphs form) or ``"star"``
    (:func:`connected_components_star`, O(log n) rounds — the safe choice
    when the pair graph might contain long chains).
    """
    if algorithm == "label_prop":
        cc = connected_components(pairs, pair_a, pair_b)
    elif algorithm == "star":
        cc = connected_components_star(pairs, pair_a, pair_b)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # alias the CC output before joining: a caller whose id_col is
    # literally "id" would otherwise hit AMBIGUOUS_REFERENCE on the
    # post-join select (r04 review)
    cc = cc.select(
        F.col("id").alias("__cc_id"), F.col("component").alias("__cc_comp")
    )
    labeled = (
        docs.select(F.col(id_col))
        .join(cc, F.col(id_col) == F.col("__cc_id"), "left")
        .select(
            F.col(id_col),
            F.coalesce("__cc_comp", F.col(id_col)).alias("canonical_id"),
        )
    )
    # LEFT join + fill, not inner: an inner equi-join on canonical_id
    # silently DROPPED documents whose id is NULL (NULL never equals
    # NULL), violating "assign every document" (review finding). A
    # NULL-id document cannot join any pair, so it rides through as a
    # size-1 row with canonical_id NULL — callers keeping canonicals
    # via ``id == canonical_id`` must de-NULL ids upstream.
    sizes = labeled.filter(F.col("canonical_id").isNotNull()).groupBy(
        "canonical_id"
    ).agg(F.count("*").alias("cluster_size"))
    return labeled.join(sizes, "canonical_id", "left").select(
        id_col,
        "canonical_id",
        F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
    )
