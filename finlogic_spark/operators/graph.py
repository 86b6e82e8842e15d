"""Connected components over near-duplicate candidate pairs
(engine-scope addition): the clustering step of web-scale dedup —
LSH/Jaccard emit PAIRS, but keeping one representative per duplicate
CLASS needs the transitive closure (a~b, b~c ⇒ keep one of {a,b,c}).

Algorithm: iterative min-label propagation. Every vertex starts
labelled with its own id; each round every vertex takes the minimum
label among itself and its neighbours; at fixpoint each component is
labelled with its smallest member id (the canonical representative).

Scale notes:
- Each round is one shuffle join (labels ⋈ edges on src) plus one
  partial-aggregated groupBy min — the minimal per-round plan. Rounds
  needed = graph diameter; near-dup graphs are overwhelmingly tiny
  cliques and short chains, so a handful of rounds closes sf-scale and
  web-scale corpora alike. (For adversarial long-chain graphs the
  large-star/small-star alternating algorithm [Kiveris et al., "CC in
  MapReduce and Beyond"] converges in O(log² n) rounds — same building
  blocks, swap the propagation rule.)
- ``localCheckpoint`` truncates the per-iteration lineage — without it
  the plan doubles every round and analysis cost explodes by round ~10.
- Labels are monotonically non-increasing, so the sum of labels is a
  convergence certificate: one cheap agg per round, no expensive
  changed-row join.
- ONE Spark job per round: the checkpoint is lazy (``eager=False``) and
  the convergence agg is the action that materializes it — round 4
  ran an eager checkpoint job AND a separate sum job, doubling driver
  round-trip latency per iteration at web-scale graph sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iters: int = 25,
) -> DataFrame:
    """Label each vertex with the smallest vertex id reachable from it
    (= its connected component's canonical representative).

    ``vertices`` must carry every id (isolated vertices label
    themselves). Returns (id_col, label). Deterministic.
    """
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .cache()
    )
    # Only vertices that touch an edge can change label — iterate on
    # that (typically tiny) subgraph and union the untouched majority
    # back at the end. In a dedup corpus most documents are in NO
    # candidate pair; excluding them shrinks every per-round shuffle
    # from |corpus| to |edge endpoints|.
    labels = (
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iters):
        prop = (
            und.join(labels, und.s == labels.id)
            .select(F.col("d").alias("id"), "label")
        )
        # Lazy checkpoint + the convergence agg as the materializing
        # action: one job computes the new labels, persists them (so
        # the next round's join reads checkpointed blocks, lineage
        # truncated), and returns the sum certificate.
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    und.unpersist()
    isolated = (
        vertices.select(F.col(id_col).alias("id"))
        .join(labels.select("id"), "id", "left_anti")
        .withColumn("label", F.col("id"))
    )
    return labels.unionByName(isolated)
