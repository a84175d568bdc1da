"""Connected components over candidate-duplicate edges (dedup clustering).

The missing last step of a web-scale dedup pipeline: pair detectors
(minhash-LSH, simhash, embedding-LSH) emit EDGES (id_a, id_b), but the
decision "keep one document per duplicate group" needs the transitive
closure — A~B, B~C puts A and C in one cluster even if the detector
never compared them. The reference has no dedup at all (SURVEY §2.2);
this is part of the training-data-pipeline surface our engine adds.

Algorithm: iterative min-label propagation, pure DataFrame ops —
every node starts labeled with its own id; each round every node takes
the min of its own and its neighbors' labels; converged when no label
changes. Rounds = O(cluster diameter), and duplicate clusters are
near-cliques (diameter ≤ 2-3 in practice), so 3-5 rounds settle real
workloads; ``max_iters`` bounds adversarial chains.

Scale shape (100 TB): each round is ONE shuffle join (edges ⋈ labels,
both keyed by id) + ONE groupBy-min whose partial aggregation collapses
map-side. The label frame is ``localCheckpoint``ed every round — without
it the iterated plan grows exponentially and Catalyst re-executes the
whole chain each action. Convergence is detected from a label-set
fingerprint (bit_xor of per-row (id, label) hashes): labels only ever
decrease, so an unchanged fingerprint means a fixpoint — one tiny agg
per round, no extra join, and it works for string ids too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """(id, cluster) for every node appearing in ``edges``; ``cluster``
    is the MIN node id of the component (deterministic representative).

    Nodes with no edges are callers' business (a singleton is its own
    cluster by definition — joining them in would just burn a shuffle).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    converged = False
    for _ in range(max_iters):
        nbr = sym.join(
            labels.withColumnRenamed("id", "b"), "b"
        ).select(F.col("a").alias("id"), "label")
        labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.expr("bit_xor(xxhash64(id, label))").alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # the last round still changed labels: a component with diameter
        # > max_iters (adversarial duplicate chain) is only PARTIALLY
        # merged — callers must not silently keep extra near-duplicates
        import logging

        logging.getLogger(__name__).warning(
            "connected_components did not converge within max_iters=%d; "
            "clusters may be partially merged — raise max_iters",
            max_iters,
        )
    return labels.select("id", F.col("label").alias("cluster"))
