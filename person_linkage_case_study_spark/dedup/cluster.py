"""Near-duplicate cluster resolution: candidate pairs → connected
components → canonical (survivor) document per cluster.

The last stage of a dedup pipeline: pair generators (exact, MinHash LSH,
SimHash, n-gram Jaccard — this package) emit EDGES; keeping one document
per transitive cluster requires the components. Survivor = min id in the
component, which is a property of the edge set alone — any correct
algorithm produces identical labels, which is what lets an iterative
distributed computation be value-hash checked against a recursive-CTE
transitive closure (the ``dedup_cluster_canonical`` oracle).

Spark shape — iterative min-label propagation:

- state: (id, label), label initialized to id; edges held symmetric;
- each round: label ← min(label, min over neighbors' labels) — one join
  edges⋈labels + one groupBy min + one outer merge, all key-partitioned
  shuffles on bounded-size tables (nodes = docs IN pairs, not the corpus);
- rounds until no label changes — O(cluster diameter) iterations, and
  near-dup clusters are shallow (a 20-round cap covers diameter 2²⁰ via
  min-propagation's doubling behavior in practice; real dedup clusters
  are diameter ≤ ~6);
- per-round ``localCheckpoint`` truncates lineage exactly like the
  cascade does (plans/cascade.py K12) — without it the iteration re-plans
  the whole history each round.

At 100 TB: the edge table is tiny next to the corpus (pairs above a high
threshold), so the iteration runs on a small fraction of the data; the
final survivor join back to the corpus is one broadcast or shuffled join
on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_col_l: str = "doc_id_l",
    id_col_r: str = "doc_id_r",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every id appearing in ``edges``; ``component``
    is the minimum id in the transitive cluster."""
    sym = edges.select(
        F.col(id_col_l).alias("src"), F.col(id_col_r).alias("dst")
    ).unionByName(
        edges.select(F.col(id_col_r).alias("src"), F.col(id_col_l).alias("dst"))
    )
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "dst"), on="dst")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_documents(
    edges: DataFrame,
    id_col_l: str = "doc_id_l",
    id_col_r: str = "doc_id_r",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, canonical_id) for every document in a near-dup pair —
    canonical_id = the cluster's minimum doc id (its survivor). Documents
    in no pair are their own canonicals by definition and are simply
    absent here; a left join + coalesce attaches survivors corpus-wide.
    """
    comps = connected_components(edges, id_col_l, id_col_r)
    return comps.select(
        F.col("id").alias(id_col), F.col("component").alias("canonical_id")
    )
