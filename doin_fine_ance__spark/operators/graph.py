"""Connected components — duplicate-cluster resolution.

Near-dup detection (MinHash/SimHash/n-gram, llm/dedup.py) emits PAIRS;
a training pipeline needs CLUSTERS: one keeper per group of mutually
similar documents. Pairs→clusters is connected components, the
canonical iterative Spark algorithm.

Implementation: minimum-label propagation. Every node starts labeled
with itself; each iteration every node takes the min of its own and
its neighbors' labels; fixpoint = every node carries the smallest id
in its component. Each iteration is one shuffle join + one groupBy —
O(diameter) iterations, and near-dup graphs are clique-ish (diameter
2-3), so 3-5 iterations in practice. Lineage is truncated with
localCheckpoint each round (without it the plan doubles per iteration
and the driver OOMs planning by ~iter 20). For adversarial
long-chain graphs at 100 TB, swap in the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce") — same
join primitives, O(log n) rounds.

The fixpoint is deterministic (min is order-insensitive), so results
hash-match a DuckDB recursive-CTE transitive closure — see
queries/llm_ops.py::d_dup_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    Nodes are those appearing in at least one edge; add self-edges for
    isolated nodes you want carried through.
    """
    sym = (
        edges.select(col(src).alias("node"), col(dst).alias("nbr"))
        .unionByName(edges.select(col(dst).alias("node"), col(src).alias("nbr")))
        .distinct()
    )
    # Materialize the symmetric edge list ONCE: it is joined every
    # iteration (plus the convergence agg), and without this the whole
    # upstream edge-generation plan (e.g. a blocked-Jaccard pair join)
    # re-executes per round.
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("node").distinct().withColumn("component", col("node"))
    labels = labels.localCheckpoint(eager=True)
    # labels only ever DECREASE (least of own + neighbor minima), so the
    # label sum is a strictly decreasing convergence witness — one cheap
    # agg per iteration instead of a join-and-count diff.
    prev_sum = labels.agg(F.sum("component")).first()[0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(col("node").alias("nbr"), col("component").alias("nbr_comp")),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nbr_comp").alias("min_nbr_comp"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    col("component"), F.coalesce(col("min_nbr_comp"), col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("component")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def dedup_keepers(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Collapse near-dup pairs into (doc_id, keeper_id) assignments.

    keeper_id = smallest doc id in the duplicate cluster; rows with
    doc_id == keeper_id are the documents to retain.
    """
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(col("node").alias("doc_id"), col("component").alias("keeper_id"))
