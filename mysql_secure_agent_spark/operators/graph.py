"""Distributed connected components — duplicate-pair clusters → keep-sets.

Pairwise dedup (n-gram Jaccard, LSH-verified, embedding cosine) emits EDGES;
production dedup needs the transitive closure: if A~B and B~C, keep exactly
one of {A,B,C} even though A~C was never scored. That closure is connected
components over the duplicate graph.

Algorithm: iterative min-label propagation. Every vertex starts labeled with
its own id; each round every vertex takes the min of its label and its
neighbors' labels; converged when a round changes nothing. Rounds needed =
graph diameter — and duplicate graphs are near-cliques (every member of a
dup cluster matches most others), so 2-3 rounds close real corpora. Each
round is one join + one groupBy on the edge list (O(E) shuffle); no
all-pairs blowup, no driver materialization beyond a per-round changed
count. Lineage is truncated per round with ``localCheckpoint`` — iterative
DataFrame algorithms otherwise stack analysis-time plans until the driver
chokes (the classic Spark iterative-algorithm trap).

For adversarial long-chain graphs (diameter ≫ rounds) the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond") converges in O(log n) rounds; duplicate clusters do
not have that shape, so the simple propagation is the right default and
``max_iter`` guards the pathological case loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_keep_canonical"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = min vertex
    id reachable through the undirected edge set. Raises after ``max_iter``
    non-converged rounds rather than silently returning partial clusters."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce("nmin", F.col("label")) < F.col("label")).alias("_chg"),
            )
            .localCheckpoint()  # truncate lineage BEFORE both uses below
        )
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pathological chain graph? use a larger max_iter or large-star/small-star)"
    )


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop all but the min-id document of every duplicate cluster.

    ``pairs`` is any duplicate-pair DataFrame (the output shape of
    ``ngram_jaccard_pairs`` / ``minhash_lsh_verified`` / LSH banding).
    Documents in no pair survive untouched. The components side is tiny
    relative to the corpus (only docs that matched something), so the final
    join broadcasts in practice; at 10^9 docs it is an equi-join on the id.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
