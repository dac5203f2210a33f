"""K-means Lloyd iteration (round 8).

The reference has no clustering surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this closes the
k-means loop the corpus family opened: ``q_embedding_centroids`` is the
quantized-mean aggregate, ``q_kmeans_assign`` the E-step —
``q_kmeans_lloyd_step`` runs one FULL Lloyd iteration (E-step, M-step
over the new assignment, second E-step) and reports, per resulting
cluster, its size, how many members arrived from a different cluster,
and the exact-integer inertia. This is the convergence telemetry a
clustering job emits per iteration.

Determinism: both E-steps ride ``nearest_centroid_assignment``'s pinned
double contract (hash-proven by ``q_kmeans_assign``); the M-step is the
same quantize -> decimal-sum -> one-double-division recipe as
``label_centroids``; inertia quantizes each pinned dist2 to micros
BEFORE summing, so the sum is order-free integer arithmetic.

Scale notes (100 TB): two broadcast-centroid scans (k rows broadcast,
argmin windows keyed by vec_id with k-bounded partitions), one
(label, pos)-keyed M-step aggregate — the identical plan family as the
E-step operators it composes; output is k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .corpus2 import label_centroids, nearest_centroid_assignment


def q_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration over the embeddings table (module doc).

    Output per post-step cluster: member count, movers-in (members whose
    previous assignment differed), and inertia (sum of per-member
    floor-micro squared distances to the new centroid).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    asg1 = nearest_centroid_assignment(emb).select(
        "vec_id", F.col("assigned_label").alias("prev_label")
    )
    # M-step: the label_centroids recipe, grouped by the NEW assignment.
    cent2 = label_centroids(
        emb.join(asg1, "vec_id").select(
            F.col("prev_label").alias("label"), "embedding"
        )
    )
    asg2 = nearest_centroid_assignment(emb, cent=cent2).select(
        "vec_id",
        F.col("assigned_label").alias("cluster"),
        F.floor(F.col("dist2") * F.lit(1000000.0))
        .cast("bigint")
        .alias("d2_micro"),
    )
    return (
        asg1.join(asg2, "vec_id")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum(
                F.when(F.col("prev_label") != F.col("cluster"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_moved_in"),
            F.sum("d2_micro").cast("bigint").alias("inertia_micro"),
        )
        .orderBy("cluster")
    )


QUERIES = {"q_kmeans_lloyd_step": q_kmeans_lloyd_step}

# The assignment/centroid SQL mirrors corpus2's q_kmeans_assign oracle,
# chained twice with the M-step between (embedding dim 64).
_ASSIGN1_SQL = """
        e1 AS (
            SELECT label, i - 1 AS pos,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                              * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS q
            FROM embeddings, generate_series(1, 64) AS g(i)),
        cp1 AS (
            SELECT label, pos,
                   CAST(SUM(CAST(q AS DECIMAL(28,0))) AS DOUBLE)
                       / (COUNT(*) * CAST(1000000.0 AS DOUBLE)) AS c
            FROM e1 GROUP BY label, pos),
        cent1 AS (
            SELECT label AS c_label, list(c ORDER BY pos) AS cvec
            FROM cp1 GROUP BY label),
        scored1 AS (
            SELECT vec_id, c_label,
                   (list_dot_product(ae, ae) - 2.0 * list_dot_product(ae, cvec))
                       + list_dot_product(cvec, cvec) AS dist2
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae
                  FROM embeddings), cent1),
        asg1 AS (
            SELECT vec_id, c_label AS prev_label
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                               ORDER BY dist2, c_label) AS rn
                  FROM scored1)
            WHERE rn = 1)
"""

ORACLES = {
    "q_kmeans_lloyd_step": f"""
        WITH {_ASSIGN1_SQL},
        e2 AS (
            SELECT a.prev_label AS label, i - 1 AS pos,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                              * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS q
            FROM embeddings m
            JOIN asg1 a ON a.vec_id = m.vec_id,
                 generate_series(1, 64) AS g(i)),
        cp2 AS (
            SELECT label, pos,
                   CAST(SUM(CAST(q AS DECIMAL(28,0))) AS DOUBLE)
                       / (COUNT(*) * CAST(1000000.0 AS DOUBLE)) AS c
            FROM e2 GROUP BY label, pos),
        cent2 AS (
            SELECT label AS c_label, list(c ORDER BY pos) AS cvec
            FROM cp2 GROUP BY label),
        scored2 AS (
            SELECT vec_id, c_label,
                   (list_dot_product(ae, ae) - 2.0 * list_dot_product(ae, cvec))
                       + list_dot_product(cvec, cvec) AS dist2
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae
                  FROM embeddings), cent2),
        asg2 AS (
            SELECT vec_id, c_label AS cluster,
                   CAST(FLOOR(dist2 * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
                       AS d2_micro
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                               ORDER BY dist2, c_label) AS rn
                  FROM scored2)
            WHERE rn = 1)
        SELECT a2.cluster,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(COUNT(*) FILTER (a1.prev_label != a2.cluster) AS BIGINT)
                   AS n_moved_in,
               CAST(SUM(a2.d2_micro) AS BIGINT) AS inertia_micro
        FROM asg1 a1 JOIN asg2 a2 ON a2.vec_id = a1.vec_id
        GROUP BY a2.cluster
        ORDER BY a2.cluster
    """,
}
