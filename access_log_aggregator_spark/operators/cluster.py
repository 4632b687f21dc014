"""Distributed connected components -> duplicate-cluster assignment.

Near-duplicate detection (MinHash LSH, SimHash, embedding LSH — see
operators/dedup.py) emits candidate PAIRS, but a curation pipeline keeps
one document per duplicate CLUSTER: the transitive closure of the pair
graph. The reference has no analog (it deduplicates nothing —
internal/accesslog/summaries.go folds every record); this is part of the
mandated training-data surface.

Algorithm: iterative min-label propagation with per-round path
compression (pointer jumping), the DataFrame rendition of the classic
MapReduce connected-components family (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — hash-to-min shape):

- every node starts labeled with its own id;
- each round, a node takes the minimum label over itself and its
  neighbors (one equi-join edges->labels + one groupBy min);
- then labels are compressed one hop (label := label(label)), which is
  what turns O(diameter) rounds into O(log diameter) on path-shaped
  components — near-dup graphs are mostly dense cliques (diameter 1-2)
  with occasional long chains of pairwise-similar revisions, and the
  compression step is insurance against exactly those chains;
- convergence is detected by counting changed labels (a driver-side
  scalar per round — NOT a collect of the data; the label frames are
  pinned each round via the materializer seam (operators/materialize.py;
  localCheckpoint by default, durable SnapshotTable write on clusters)
  so lineage stays flat and the loop's cost per round is 2 narrow
  shuffles over (id, label) rows).

At 100 TB the shape holds: edges and labels are both narrow two-column
frames partitioned by id; every round is equi-join + partial/final min
aggregate (AQE splits skewed label buckets — a giant boilerplate cluster
concentrates on one label key only at the final merge, and the partial
aggregate has already collapsed each partition's contribution). The
round count is bounded by log(max component diameter), not data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import Materializer, pin


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_rounds: int = 25,
                         materializer: Materializer | None = None) -> DataFrame:
    """(id, label) for every node in ``edges``; label = min node id in the
    node's connected component. Deterministic for any edge order.

    ``edges`` may be directed/deduplicated (e.g. the doc_a < doc_b pair
    frames from operators/dedup.py) — it is symmetrized here.
    """
    sym = pin(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        "cc_edges", materializer,
    )
    labels = pin(
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("label", F.col("id")),
        "cc_labels_0", materializer,
    )
    for rnd in range(max_rounds):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a").agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("a", "id")
        )
        prop = labels.join(nbr_min, "id", "left").select(
            "id", F.least("label", F.coalesce("nbr_label", "label")).alias("label")
        )
        # pointer jumping: label := label(label). Labels are always node
        # ids (min over node ids), so the self-join lookup always resolves;
        # left+coalesce keeps the frame total even if a label were foreign.
        jump = prop.select(F.col("id").alias("_lid"), F.col("label").alias("_llabel"))
        new_labels = pin(
            prop.join(jump, prop["label"] == jump["_lid"], "left")
            .select("id", F.coalesce("_llabel", "label").alias("label")),
            f"cc_labels_{rnd + 1}", materializer,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(component diameter > 2^rounds is not a realistic dedup graph)"
    )


def duplicate_clusters(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       materializer: Materializer | None = None) -> DataFrame:
    """Cluster assignment for every document that has at least one MinHash
    LSH candidate partner: (doc_id, cluster_id, cluster_size), where
    cluster_id = min doc_id in the document's connected component of the
    candidate-pair graph. ``where cluster_size > 1`` is always true here
    (singletons never enter the pair graph); "keep one per cluster" is
    ``where doc_id = cluster_id`` plus the never-paired remainder.
    """
    from .dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(df, id_col=id_col, text_col=text_col,
                                   materializer=materializer)
    labels = connected_components(pairs, "doc_a", "doc_b",
                                  materializer=materializer)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(F.col("id").alias(id_col),
                F.col("label").alias("cluster_id"),
                "cluster_size")
        .orderBy(id_col)
    )
