"""Duplicate-cluster resolution: connected components over candidate
pair graphs.

Near-dup operators (minhash/simhash/ngram-jaccard/embedding LSH) emit
PAIRS (doc_a, doc_b). A curation pipeline needs CLUSTERS — "keep one
doc per duplicate group" — which is the connected components of the
pair graph: A~B and B~C must land A, B, C in one group even when A~C
was never emitted as a pair.

Algorithm: hash-to-min label propagation. Every node starts with
label = its own id; each round every node takes the min of its label
and its neighbors' labels. The minimum id floods one hop per round,
so rounds = graph diameter. Duplicate clusters are near-cliques
(diameter ≤ ~3 even for chained near-dups), so the loop converges in
a handful of rounds; each round is ONE shuffle (join on node id, both
sides hash-partitioned on the same key, map-side partial min).

Scale notes (100 TB): the edge frame is persisted across rounds so the
candidate-generation pipeline (LSH joins) runs once, not once per
round. State per round is one (node, label) row per node — O(V), not
O(E). For adversarial graphs with large diameter (long chains —
not a dedup-pair shape) the O(log n)-round large-star/small-star
alternation of Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14), bounds rounds independent of diameter; hash-to-min
is chosen here because dedup clusters are shallow and each of its
rounds is strictly cheaper (one join vs two).

Convergence is detected exactly: a round that changes no label ends
the loop.

Lineage is TRUNCATED every round with ``localCheckpoint(eager=True)``:
``labels`` feeds both the union and the propagation join, so without
truncation the round-k logical plan contains TWO copies of round
k-1's plan — exponential tree growth that OOMs the driver around ten
rounds even on a ten-row graph (caching truncates physical recompute
but not the logical tree). The checkpoint makes each round's plan
constant-size; its eager materialization replaces the persist+count
dance. On a multi-executor cluster prefer reliable
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for the
same truncation with executor-loss tolerance; local checkpoint blocks
are reclaimed by the ContextCleaner once a round's frame is
unreferenced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(id_a, id_b) pair frame -> (node, cluster_id) with cluster_id =
    the minimum node id in the node's connected component.

    Only nodes that appear in at least one edge are returned
    (singletons carry no dedup decision). Deterministic for any
    partitioning: min is associative/commutative and the loop runs to
    exact convergence.
    """
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round; static plan
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_rounds):
        prop = sym.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)  # constant-size plan per round
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "prev"), "node")
            .filter(F.col("label") != F.col("prev"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Exact convergence is the contract; returning partial labels
        # would silently split clusters. Rounds needed = graph diameter,
        # so only a degenerate chain-shaped graph gets here.
        raise ValueError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); raise max_rounds for "
            "long-chain graphs (rounds needed = graph diameter)"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def dup_clusters(
    pairs: DataFrame,
    *,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Pair frame -> (doc_id, cluster_id, n_members): every paired doc
    with its duplicate-group id (min doc id in the component) and the
    group's size. ``filter(doc_id != cluster_id)`` is then exactly the
    "drop all but one per group" curation rule."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    return comp.select(F.col("node").alias("doc_id"), "cluster_id").join(
        sizes, "cluster_id"
    ).select("doc_id", "cluster_id", "n_members")
