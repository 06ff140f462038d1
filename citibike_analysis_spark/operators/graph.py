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
declarative building blocks, documented here as the escalation path.
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
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=False)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
    )
    # Convergence detector: labels only ever decrease, so the label sum is
    # strictly monotone until fixpoint — one cheap aggregate on the freshly
    # checkpointed result replaces a join-against-previous + count job.
    prev_sum = None
    for _ in range(max_iter):
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
        label_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


def dedup_clusters(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Assign every document its canonical id (min id in its near-dup
    cluster; singletons are their own canonical) and the cluster size.

    This is the "keep one copy" step of corpus dedup: filter
    ``id == canonical_id`` downstream to retain canonicals only.
    """
    cc = connected_components(pairs, pair_a, pair_b)
    labeled = (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["id"], "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
        )
    )
    sizes = labeled.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return labeled.join(sizes, "canonical_id").select(
        id_col, "canonical_id", "cluster_size"
    )
