"""Exact power-iteration PCA over the embedding table (round 8c).

The reference has no vector surface (scope:
/root/reference/src/migrate/table_migrator.rs:43-114); this adds the
ML primitive the embedding family (centroids, quantize, IVF/PQ/LSH,
kNN, JL projection, Lloyd step) still lacked: a PRINCIPAL-DIRECTION
power iteration, computed end-to-end in exact integer arithmetic so
the cross-engine hash match is bit-for-bit.

Pipeline (every stage deterministic at any parallelism):

1. Quantize: q = floor(x * 1e6) per component — IEEE-exact on both
   engines (the q_embedding_centroids contract).
2. Scaled covariance, no centering subtraction per row:
   C[i][j] = N * sum(q_i q_j) - sum(q_i) * sum(q_j) — the covariance
   times N^2, an exact DECIMAL(38,0) integer (3.6e21 at sf1; bound
   documented below). ONE shuffle: posexplode then a vec_id-keyed
   self-join fans out to dim^2 rows per vector, map-side-combined
   into the 64x64 = 4096-cell matrix.
3. Power iteration, POWER_ITERS unrolled rounds IN-PLAN on the
   matrix-sized relation: v <- C.v (join on j, groupBy i), then
   rescale v <- v * 1e6 div max|v| (truncating div, so components
   stay in [-1e6, 1e6] as exact integers). No collect — the "matrix"
   is a 4096-row DataFrame and each round is a broadcast-sized join.
4. Sign canonicalization: flip so the first nonzero component (by
   dim index) is positive — eigenvectors are sign-ambiguous, the
   contract pins one.
5. Rayleigh quotient v'Cv / (v'v) in ppm of the scaled-covariance
   units on the decimal-div contract — the eigenvalue estimate, one
   extra matrix-sized pass.

Convergence: POWER_ITERS = 16 fixed rounds, and the surface is
DEFINED as the exact 16-round iterate (graph_pagerank's fixed-round
contract), NOT the eigenvector limit: convergence rate is the
data-dependent (lambda2/lambda1)^k, and the near-isotropic synthetic
fixture (0.93 at sf0.001, measured) converges slowly — real embedding
covariances with a dominant direction converge in a few rounds. The
Rayleigh output is still a valid lower bound on the top eigenvalue
share for ANY iterate (tested), so the surface is honest at every
convergence state.

Scale notes (100 TB): the only data-sized stage is (2) — dim^2
map-side-combinable products per vector, one shuffle of 4096 cells
per partition, independent of N. Overflow ledger: |q| <= 2^21-ish
(unit-norm-ish floats), q_i*q_j <= 4e12, N * sum <= 4e12 * N^2 —
DECIMAL(38,0) holds to N ~ 5e12 vectors. Iteration products
C * v <= 4e21 * 1e6 * 64 ~ 2.6e29 < 1e38. All BIGINT on the surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

POWER_ITERS = 16
DIM = 64


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-iteration principal-direction estimate (exact 16-round
    iterate, module doc) on the exact integer scaled covariance. Output per dimension: i, the scaled
    covariance diagonal, the eigenvector component in micro units,
    and the Rayleigh eigenvalue estimate (ppm of trace units,
    repeated per row for a flat surface)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1_000_000).cast(
                    "bigint"
                ),
            )
        ).alias("i", "q"),
    )
    qa = q.select("vec_id", F.col("i"), F.col("q").alias("qi"))
    qb = q.select("vec_id", F.col("i").alias("j"), F.col("q").alias("qj"))
    prods = (
        qa.join(qb, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.col("qi").cast("decimal(38,0)") * F.col("qj")
            ).alias("sp"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    sums = q.groupBy("i").agg(
        F.sum(F.col("q").cast("decimal(38,0)")).alias("s")
    )
    si = sums.select(F.col("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    cov = (
        prods.join(si, "i")
        .join(sj, "j")
        .select(
            "i",
            "j",
            F.expr("CAST(n * sp - si * sj AS DECIMAL(38,0))").alias("c"),
        )
        .localCheckpoint()
    )
    # v0 = 1e6 * ones; each round: w = C.v ; v = w * 1e6 div max|w|
    v = cov.select("i").distinct().select(
        "i", F.lit(1_000_000).cast("decimal(38,0)").alias("v")
    )
    for _ in range(POWER_ITERS):
        # localCheckpoint per round: w feeds BOTH the rescale and its
        # own max — without the eager cut each branch re-derives the
        # full previous-round lineage (2^rounds recomputation, the
        # graph_pagerank lesson). 64 rows — the cut is free.
        w = (
            cov.join(
                v.select(F.col("i").alias("j"), "v"), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.expr("c * v")).alias("w"))
            .localCheckpoint()
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = w.crossJoin(F.broadcast(mx)).select(
            "i",
            F.expr(
                "CAST((w * 1000000 - (w * 1000000) % m) / m"
                " AS DECIMAL(38,0))"
            ).alias("v"),
        )
    # sign pin: first nonzero component positive
    first_nz = (
        v.filter(F.col("v") != 0)
        .orderBy("i")
        .limit(1)
        .select(
            F.when(F.col("v") < 0, F.lit(-1))
            .otherwise(F.lit(1))
            .alias("sgn")
        )
    )
    v = v.crossJoin(F.broadcast(first_nz)).select(
        "i", F.expr("CAST(v * sgn AS DECIMAL(38,0))").alias("v")
    )
    # Rayleigh: (v'Cv) * 1e6 div (trace(C) * v'v) — eigenvalue as a
    # share of total variance, in ppm. The quadratic form runs on the
    # MILLI-scaled iterate (v div 1e3): the ratio is invariant to a
    # common rescale, and micro-scale c*vi*vj crossed DECIMAL(38,0)
    # at sf1 (1.2e38 — the ANSI canary fired; milli buys 1e6 headroom).
    vm = v.select(
        "i",
        F.expr("CAST((v - v % 1000) / 1000 AS DECIMAL(38,0))").alias("v"),
    )
    vi = vm.select(F.col("i"), F.col("v").alias("vi"))
    vj = vm.select(F.col("i").alias("j"), F.col("v").alias("vj"))
    num = (
        cov.join(vi, "i")
        .join(vj, "j")
        .agg(F.sum(F.expr("c * vi * vj")).alias("vcv"))
    )
    den = (
        cov.filter(F.col("i") == F.col("j"))
        .crossJoin(
            vm.select(F.sum(F.expr("v * v")).alias("vv"))
        )
        .agg(
            F.sum(F.expr("c * vv")).alias("tr_vv")
        )
    )
    ray = (
        num.crossJoin(den)
        .select(
            F.expr(
                "CAST((vcv * 1000000 - (vcv * 1000000) % tr_vv) / tr_vv"
                " AS BIGINT)"
            ).alias("var_share_ppm")
        )
    )
    diag = cov.filter(F.col("i") == F.col("j")).select(
        "i", F.col("c").alias("cov_diag_scaled")
    )
    return (
        v.join(diag, "i")
        .crossJoin(F.broadcast(ray))
        .select(
            "i",
            "cov_diag_scaled",
            F.col("v").cast("bigint").alias("v_micro"),
            "var_share_ppm",
        )
        .orderBy("i")
    )


QUERIES = {"embedding_pca_power": embedding_pca_power}


def _pca_oracle() -> str:
    # the identical POWER_ITERS unrolled matvec+rescale rounds, staged as temp
    # tables (the graph2 precedent: DuckDB loses stats on deep CTE
    # chains; 4096-cell tables are free to materialize)
    stmts = [
        f"""
        CREATE OR REPLACE TEMP TABLE pca_q AS
            SELECT vec_id, i - 1 AS i,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                              * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS q
            FROM embeddings, generate_series(1, {DIM}) AS g(i);
        """,
        """
        CREATE OR REPLACE TEMP TABLE pca_cov AS
            WITH prods AS (
                SELECT a.i, b.i AS j,
                       SUM(CAST(a.q AS HUGEINT) * b.q) AS sp,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM pca_q a JOIN pca_q b ON b.vec_id = a.vec_id
                GROUP BY 1, 2),
            sums AS (
                SELECT i, SUM(CAST(q AS HUGEINT)) AS s
                FROM pca_q GROUP BY i)
            SELECT p.i, p.j, p.n * p.sp - si.s * sj.s AS c
            FROM prods p
            JOIN sums si ON si.i = p.i
            JOIN sums sj ON sj.i = p.j;
        """,
        """
        CREATE OR REPLACE TEMP TABLE pca_v AS
            SELECT DISTINCT i, CAST(1000000 AS HUGEINT) AS v
            FROM pca_cov;
        """,
    ]
    for _ in range(POWER_ITERS):
        stmts.append(
            """
        CREATE OR REPLACE TEMP TABLE pca_w AS
            SELECT c.i, SUM(c.c * v.v) AS w
            FROM pca_cov c JOIN pca_v v ON v.i = c.j
            GROUP BY c.i;
        CREATE OR REPLACE TEMP TABLE pca_v AS
            SELECT i, w * 1000000 // (SELECT MAX(ABS(w)) FROM pca_w) AS v
            FROM pca_w;
        """
        )
    stmts.append(
        """
        CREATE OR REPLACE TEMP TABLE pca_vs AS
            SELECT i, v * (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END
                           FROM pca_v WHERE v != 0
                           ORDER BY i LIMIT 1) AS v
            FROM pca_v;
        CREATE OR REPLACE TEMP TABLE pca_vm AS
            SELECT i, v // 1000 AS v FROM pca_vs;
        """
    )
    stmts.append(
        """
        WITH num AS (
            SELECT SUM(c.c * vi.v * vj.v) AS vcv
            FROM pca_cov c
            JOIN pca_vm vi ON vi.i = c.i
            JOIN pca_vm vj ON vj.i = c.j),
        den AS (
            SELECT SUM(c.c) * (SELECT SUM(v * v) FROM pca_vm) AS tr_vv
            FROM pca_cov c WHERE c.i = c.j),
        ray AS (
            SELECT CAST(num.vcv * 1000000 // den.tr_vv AS BIGINT)
                       AS var_share_ppm
            FROM num, den)
        SELECT v.i,
               CAST(c.c AS DECIMAL(38,0)) AS cov_diag_scaled,
               CAST(v.v AS BIGINT) AS v_micro,
               ray.var_share_ppm
        FROM pca_vs v
        JOIN pca_cov c ON c.i = v.i AND c.j = v.i, ray
        ORDER BY v.i
        """
    )
    return ";".join(stmts)


ORACLES = {"embedding_pca_power": _pca_oracle()}
