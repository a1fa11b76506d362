"""Graph operators for dedup canonicalization: connected components.

Near-duplicate PAIRS aren't actionable until they're CLUSTERS — keeping
"one doc per near-dup group" needs the transitive closure (a~b, b~c ⇒
{a,b,c} one group). This is iterative min-label propagation on the
DataFrame API (the same algorithm GraphX/GraphFrames runs): each round,
every node takes the min label among itself and its neighbors; stable
when a full round changes nothing.

Scale notes: each iteration is one join + one aggregate (two shuffles)
over the EDGE list, which for near-dup workloads is tiny relative to
the corpus (only candidate pairs). Convergence takes O(diameter)
rounds — near-dup clusters are shallow (usually 2-5 nodes), so 3-5
rounds in practice; ``max_iter`` bounds pathological chains.
``localCheckpoint`` truncates the growing lineage each round (otherwise
the plan doubles per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Deterministic. Isolated nodes absent from the
    edge list are absent from the output (join them back if needed).

    Contract: raises ``RuntimeError`` if labels are still changing when
    ``max_iter`` is exhausted — partially-propagated labels are WRONG
    answers, not approximations, so non-convergence is an explicit
    error (callers can retry with a larger ``max_iter``; rounds needed
    ≈ graph diameter, so 20 covers chains up to ~20 hops).
    """
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    n_changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, labels.id == nbr_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label"))
                    < F.col("label")
                ).alias("changed"),
            )
        ).localCheckpoint()
        n_changed = updated.filter(F.col("changed")).limit(1).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(labels still changing); increase max_iter — rounds needed is "
            "about the graph diameter"
        )
    return labels.select(F.col("id").alias("node"), F.col("label").alias("component"))


def cluster_canonical(
    df: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Keep one row per near-dup cluster: the min-id member. Rows whose
    id never appears in the edge list are singletons and survive."""
    losers = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__loser")
    )
    return df.join(
        losers, df[id_col] == losers.__loser, "left_anti"
    )
