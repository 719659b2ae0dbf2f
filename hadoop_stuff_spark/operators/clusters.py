"""Near-duplicate clustering: connected components over candidate pairs.

Pair generation (MinHash/SimHash/cosine LSH, operators/dedup.py) yields
EDGES; a dedup pipeline must then group edges into components and pick one
canonical document per component. This is iterative min-label propagation
expressed entirely in DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Components have small diameter in dedup graphs
(near-dup clusters are dense), so convergence is a handful of rounds;
the bound is O(log n) rounds for any graph with doubling (pointer-jumping
through the label graph — the standard large-star/small-star argument).

Scale design: each round is one self-join on the edge list + one groupBy
min — two shuffles over O(E) rows, no driver data movement. The only
driver-side value per round is a single convergence scalar (count of
changed labels). Checkpointing truncates the lineage every round so plans
stay O(1) deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``pairs`` →
    DataFrame[doc_id, cluster_id] for every vertex that appears in an edge
    (cluster_id = min vertex id of the component — the canonical doc).

    Deterministic; raises if ``max_iters`` rounds don't converge (dedup
    graphs converge in ~log(diameter); 25 covers any realistic corpus).
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)  # pair-gen lineage ends here
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    for _ in range(max_iters):
        # step 1 — neighbor propagation: candidate for v is the min label
        # among its neighbors
        neighbor_min = (
            edges.join(labels, edges.u == labels.doc_id)
            .groupBy(F.col("v").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        cand = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("cluster_id").alias("old_label"),
            F.least(
                F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
            ).alias("cand"),
        )
        # step 2 — pointer jumping: follow the candidate label's own label
        # (cand is always a vertex id, so the join hits); this is what
        # collapses long chains in O(log diameter) rounds
        parents = labels.select(
            F.col("doc_id").alias("_pid"), F.col("cluster_id").alias("_plabel")
        )
        new_labels = (
            cand.join(parents, cand.cand == parents._pid, "left")
            .select(
                "doc_id",
                "old_label",
                F.least(F.col("cand"), F.coalesce("_plabel", F.col("cand"))).alias(
                    "cluster_id"
                ),
            )
            .withColumn(
                "_changed", (F.col("cluster_id") < F.col("old_label")).cast("long")
            )
            .drop("old_label")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum("_changed")).collect()[0][0] or 0
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Cluster assignment + per-cluster size for near-dup pairs. The
    canonical document of each cluster is its min doc_id (== cluster_id)."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")


# --------------------------------------------------------------------------
# certification query (EXTRA_QUERIES): cluster the EXACT n-gram Jaccard
# pairs (themselves oracle-certified) and let DuckDB recompute the
# transitive closure with a recursive CTE.


def n1_dedup_clusters(spark, sf_dir: str) -> DataFrame:
    from hadoop_stuff_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    return dedup_clusters(pairs)


def _clusters_sql() -> str:
    from hadoop_stuff_spark.operators.dedup import NGRAM_JACCARD_SQL

    return f"""
WITH pairs AS ({NGRAM_JACCARD_SQL}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT u AS src, v AS dst FROM edges
  UNION SELECT u, u FROM edges
),
closure AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT src, dst FROM reach
    UNION
    SELECT r.src, e.v FROM r JOIN edges e ON r.dst = e.u
  )
  SELECT src, dst FROM r
),
comp AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM closure GROUP BY src
)
SELECT c.doc_id, c.cluster_id, s.cluster_size
FROM comp c
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) s
  USING (cluster_id)
"""


CLUSTERS_SQL = _clusters_sql()
