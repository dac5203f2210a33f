"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine is the exactness baseline: the dot product is a
built-in ``zip_with`` + ``aggregate`` fold over the array — JVM-side, no
UDF, accumulated in double (cast from float is exact; the sequential fold
order matches DuckDB's ``list_dot_product``, giving bit-identical oracle
results with ``cos = dot / sqrt(|a|^2 * |b|^2)``).

The scale path is sign-random-projection LSH: 16 fixed hyperplanes hash
every vector into a bucket; only bucket-mates are compared. At 100 TB the
brute-force form is a broadcast of the (small) query set against a scan of
the corpus — linear, embarrassingly parallel — while all-pairs similarity
must go through bucketing to avoid |corpus|^2.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from ..io import fan_out, load_table

EMBEDDING_DIM = 64
# Multi-table sign-LSH (OR-of-ANDs): T tables of r hyperplanes each. A pair
# collides if ALL r sign bits match in AT LEAST ONE table. For a pair at
# angle theta, p = 1 - theta/pi per plane; recall = 1 - (1 - p^r)^T.
# r=6, T=8: cos 0.5 -> ~50% recall, random pair -> ~1.5% per table (keeps
# the candidate set ~linear, not quadratic).
LSH_TABLES = 8
LSH_PLANES_PER_TABLE = 6
# Buckets above this size are dropped from pairwise comparison: a giant
# bucket means near-identical vectors (pairs grow quadratically in bucket
# size — measured 4s -> 102s on a corpus with 10x duplicated vectors), and
# that degenerate case belongs to exact dedup (dedup_exact on content /
# identical bucket keys across ALL tables), not pairwise LSH. Derived from
# a per-bucket pair budget (see operators/dedup.py cap rationale); a cap
# that grew with corpus size would re-open the quadratic blowup.
LSH_PAIR_BUDGET = 2_048
MAX_LSH_BUCKET = int((2 * LSH_PAIR_BUDGET) ** 0.5)  # = 64
_SEED = 42


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    # Kept as a zip_with/aggregate fold: an unrolled 64-term codegen Add
    # chain was A/B'd (round 5) and measured 2x SLOWER on the pair-scoring
    # hot path — wide Add trees defeat whole-stage codegen.
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a, b) -> Column:
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of a single query vector (vec_id = 0).

    Plan: the 1-row query side is broadcast; cosine evaluates inside the
    corpus scan; TakeOrderedAndProject keeps the global top-k without a
    full sort. Linear in corpus size, no shuffle of vectors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("query_vec"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("embedding"), F.col("query_vec")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def similarity_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-3 neighbors for each of the first 5 query vectors.

    The query set broadcasts; per-query top-k is a row_number window on
    the query id — one shuffle keyed by query id, never |corpus|^2.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("query_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _cosine(F.col("embedding"), F.col("query_vec")).alias("cos_sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("q_id", "rn")
    )


# Hard-negative mining: per query, the HARD_NEG_TOPK most similar
# vectors carrying a DIFFERENT label — the contrastive-training batch
# builder (in-batch negatives that are semantically close but wrong).
HARD_NEG_QUERIES = 8
HARD_NEG_TOPK = 3


def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top hard negatives per query: nearest different-label neighbors.

    Same scale shape as the kNN join (broadcast query side, cosine in
    the corpus scan, per-query row_number top-k) with one extra
    predicate — the label inequality — evaluated inside the scan, so
    the shuffle only carries candidate rows. At 100 TB the label filter
    prunes nothing structurally (negatives dominate), but the window's
    per-query state stays top-k-bounded either way.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < HARD_NEG_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("query_vec"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            _cosine(F.col("embedding"), F.col("query_vec")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neg_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARD_NEG_TOPK)
        .orderBy("q_id", "rn")
    )


def _hyperplanes(n: int) -> list[list[float]]:
    rng = random.Random(_SEED)
    return [[rng.gauss(0.0, 1.0) for _ in range(EMBEDDING_DIM)] for _ in range(n)]


def similarity_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similar embeddings via multi-table sign-projection LSH.

    Each vector gets one bucket key per table (r sign bits of fixed seeded
    Gaussian hyperplane projections); candidates are pairs sharing a bucket
    in any table (explode tables -> equi-join on (table, bucket) ->
    distinct pairs); exact cosine is computed only for candidates, then
    thresholded. Approximate by construction (recall math in the constants
    above) -> rows-only driver check; recall vs the exact cross join is
    asserted in tests/test_llm_ops.py. Self-validating output: every row
    carries the exact cosine and the in-query filter guarantees it clears
    the 0.4 threshold, so a verifier can bound-check rows without
    reproducing the hyperplane hashes.

    The 48 projections are ONE Arrow-batched pandas_udf doing a numpy
    matmul per batch (embeddings x planes^T -> packed sign bits). The
    column-expression alternative (48 dot-product folds over 64-element
    literal arrays) costs ~8s of codegen compile alone — the canonical
    "vectorized UDF beats built-ins" case of a dense constant matrix.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    planes = np.array(_hyperplanes(LSH_TABLES * LSH_PLANES_PER_TABLE))  # (T*r, dim)
    n_planes = LSH_PLANES_PER_TABLE
    weights = np.array([1 << j for j in range(n_planes)])  # pack sign bits per table

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_keys(embeddings: pd.Series) -> pd.Series:
        mat = np.stack(embeddings.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (mat @ planes.T) >= 0  # (batch, T*r)
        packed = signs.reshape(len(mat), LSH_TABLES, n_planes) @ weights  # (batch, T)
        return pd.Series(list(packed.astype(np.int64)))

    from .dedup import _cap_buckets

    # Scoring happens INSIDE each (table, bucket) group — "block then
    # score within block". Each vector ships once per bucket membership
    # (T x 64 float32 ≈ 4 KB/vector) instead of once per candidate PAIR
    # (2 x 64 per pair ≈ 126 MB at 247k sf0.1 candidates); the in-group
    # all-pairs similarity is one numpy matmul over ≤MAX_LSH_BUCKET rows
    # (the cap bounds the quadratic). Measured 3.1s -> 1.9s at sf0.1 vs
    # the prior pair-join + einsum shape. A pair colliding in several
    # tables is scored once per collision and deduped AFTER scoring —
    # recompute is cheaper than materializing global candidate pairs
    # before the payload is available. The kept score comes from an
    # arbitrary surviving bucket: matmuls over different group shapes can
    # differ in the last ulp, which the rows-only contract and the recall
    # tests tolerate by construction.
    # Unit vectors ship as float32: norm is computed in double (exact),
    # components round to float for the Arrow transfer, the matmul
    # accumulates back in float64. Worst-case cosine error ~1e-7 against
    # the 0.4 threshold.
    # Unit vectors and bucket keys come out of ONE corpus scan: the
    # normalized payload rides along into the posexplode instead of being
    # joined back on vec_id (round 7 — dropping that join removes two
    # corpus-sized exchanges; A/B at sf0.1: 2.6s -> 1.9s).
    normed = (
        emb.select("vec_id", "embedding", _as_double(F.col("embedding")).alias("d"))
        .select("vec_id", "embedding", "d", F.sqrt(_dot(F.col("d"), F.col("d"))).alias("nrm"))
        # nrm is a materialized column reference here, NOT an expression —
        # an expression inside a transform lambda re-evaluates per element
        .select(
            "vec_id",
            "embedding",
            F.transform("d", lambda x: (x / F.col("nrm")).cast("float")).alias("u"),
        )
    )
    bucketed = normed.select(
        "vec_id", "u", F.posexplode(bucket_keys("embedding"))
    ).withColumnsRenamed({"pos": "t", "col": "bucket"})
    grp = _cap_buckets(bucketed, ["t", "bucket"], MAX_LSH_BUCKET)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["v1", "v2", "cos_sim"])
        m = np.stack(pdf["u"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= 0.4
        return pd.DataFrame(
            {"v1": ids[iu[0][mask]], "v2": ids[iu[1][mask]], "cos_sim": sims[iu][mask]}
        )

    return (
        grp.groupBy("t", "bucket")
        .applyInPandas(score, "v1 long, v2 long, cos_sim double")
        .dropDuplicates(["v1", "v2"])
        .orderBy("v1", "v2")
    )


def embedding_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding preprocessing: L2 norm, unit-normalize, int8-quantize
    (symmetric, per-vector absmax scaling) — all built-in array lambdas
    (transform/aggregate), zero Python in the loop. The quantized payload
    is 4x smaller on the wire, which at 100 TB is the difference between a
    shuffle that fits and one that spills."""
    # fan_out: three interpreted array-lambda passes per row fuse into
    # the scan stage (2 tasks at sf1); spread first (measured r15).
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), "vec_id")
    vec = _as_double(F.col("embedding"))
    norm = F.sqrt(_dot(vec, vec))
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    quant = F.transform(vec, lambda x: F.round(x / absmax * 127).cast("int"))
    # q8 is surfaced as a comma-joined string, not array<int>: the driver's
    # pandas canonicalizer can't hash ndarray cells (same contract reason
    # dedup_clusters joins its members column).
    return emb.select(
        "vec_id",
        norm.alias("l2_norm"),
        absmax.alias("absmax"),
        F.array_join(quant.cast("array<string>"), ",").alias("q8"),
        F.size("embedding").alias("dim"),
    ).orderBy("vec_id")


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (the distributed mean-vector step of
    k-means / class prototypes), dimension-unrolled.

    Cross-engine exactness: a double SUM over float components is
    order-dependent, so components are first quantized to integers —
    floor(x * 1e6) is IEEE-exact in both engines — summed exactly in
    DECIMAL, and divided back at the end. The result is the centroid of
    the 1e-6-quantized vectors (documented, deterministic at any
    parallelism; the sum stays in DECIMAL because a BIGINT sum overflows
    around 1e12 rows x 1e6 scale).

    Plan shape: posexplode (narrow) -> one shuffle on (label, pos) with
    map-side partial aggregation, so the exchange carries |labels| x dim
    rows per partition — independent of corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "x")
    ).select("label", "pos", F.floor(F.col("x") * F.lit(1000000.0)).alias("q"))
    return (
        e.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            (
                F.sum(F.col("q").cast("decimal(28,0)")).cast("double")
                / (F.count(F.lit(1)) * F.lit(1000000.0))
            ).alias("centroid"),
        )
        .orderBy("label", "pos")
    )


# Johnson-Lindenstrauss sign projection (round 8): 64 -> JL_OUT_DIMS
# dims with a +-1 matrix derived from md5 parity (deterministic, no RNG
# state to ship). Components are quantized to bigints at a POWER-OF-TWO
# scale first — x * 2^20 is an exponent shift, IEEE-exact in any
# engine — so every sum is integer and order-free, and the projection
# gets a full value-hash oracle. At 100 TB this is the ANN preprocessing
# that cuts every downstream distance computation 8x (embedding_cosine
# blocking, IVF coarse search) while JL preserves pairwise distances to
# 1 +- eps; the distortion_ppm column MEASURES that guarantee per
# vector (E[ratio] = 1e6 under the sign distribution).
JL_OUT_DIMS = 8
JL_Q_SCALE = 1 << 20


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"jl-{j}-{i}".encode()).digest()[0] % 2 == 0
            else -1
            for i in range(64)
        ]
        for j in range(JL_OUT_DIMS)
    ]


def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector JL sign projection to JL_OUT_DIMS dims (module doc):
    projected components y0..y{D-1} at 2^20 integer scale, the input
    and output squared norms, and the norm-preservation ratio
    distortion_ppm = out_norm2 * 1e6 div (D * in_norm2). Pure codegen
    array lambdas — zero Python, zero shuffle, one projection pass."""
    signs = _jl_signs()
    q = f"CAST(FLOOR(x * {JL_Q_SCALE}) AS BIGINT)"
    cols = [
        F.expr(
            "aggregate(zip_with(CAST(embedding AS array<double>),"
            f" array({', '.join(str(s) for s in row)}),"
            f" (x, s) -> {q} * s),"
            " CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias(f"y{j}")
        for j, row in enumerate(signs)
    ]
    in_norm2 = F.expr(
        "aggregate(transform(CAST(embedding AS array<double>),"
        f" x -> {q} * {q}), CAST(0 AS BIGINT), (a, b) -> a + b)"
    ).alias("in_norm2")
    emb = load_table(spark, sf_dir, "embeddings")
    projected = emb.select("vec_id", *cols, in_norm2)
    out_norm2 = " + ".join(f"y{j} * y{j}" for j in range(JL_OUT_DIMS))
    return projected.select(
        "*",
        F.expr(f"CAST({out_norm2} AS BIGINT)").alias("out_norm2"),
    ).select(
        "*",
        F.expr(
            "CAST(CAST(out_norm2 AS DECIMAL(38,0)) * 1000000"
            f" div (CAST({JL_OUT_DIMS} AS DECIMAL(38,0)) * in_norm2)"
            " AS BIGINT)"
        ).alias("distortion_ppm"),
    ).orderBy("vec_id")


def _jl_oracle() -> str:
    signs = _jl_signs()
    q = f"CAST(FLOOR(x * {JL_Q_SCALE}) AS BIGINT)"
    ys = ",\n                   ".join(
        "CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]),"
        f" (x, i) -> {q} * ([{', '.join(str(s) for s in row)}])[i]))"
        f" AS BIGINT) AS y{j}"
        for j, row in enumerate(signs)
    )
    out_norm2 = " + ".join(f"y{j} * y{j}" for j in range(JL_OUT_DIMS))
    return f"""
        WITH projected AS (
            SELECT vec_id,
                   {ys},
                   CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                        x -> {q} * {q})) AS BIGINT) AS in_norm2
            FROM embeddings),
        normed AS (
            SELECT *, CAST({out_norm2} AS BIGINT) AS out_norm2
            FROM projected)
        SELECT *, CAST(CAST(out_norm2 AS HUGEINT) * 1000000
                       // (CAST({JL_OUT_DIMS} AS HUGEINT) * in_norm2)
                       AS BIGINT) AS distortion_ppm
        FROM normed
        ORDER BY vec_id
    """


# Mutual-kNN graph: an edge (i, j) exists iff j is in i's top-k AND i is
# in j's top-k — the standard denoised similarity graph clustering /
# manifold methods build on (one-way neighbors of a hub are dropped).
# Built over a bounded ANCHOR subset: the graph-construction mechanics
# (directed top-k -> reciprocal self-join) are corpus-size-free, and at
# 100 TB the directed top-k input swaps to the IVF shortlist
# (similarity_hard_negatives_ivf precedent) with identical closing joins.
MUTUAL_KNN_ANCHORS = 256
MUTUAL_KNN_K = 3


def similarity_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual (reciprocal) kNN edges over the anchor subset.

    Directed top-k per anchor (broadcast anchors, per-anchor row_number
    window), then the reciprocity check is a self-join on the swapped
    key pair — output keyed src < dst so each mutual edge surfaces
    once, with both directions' identical cosine carried. Join keys are
    RENAMED before the self-join (same-attribute-resolution trap).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < MUTUAL_KNN_ANCHORS)
    qs = anchors.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    scored = (
        anchors.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("nb_id"),
            _cosine(F.col("embedding"), F.col("qv")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("nb_id"))
    directed = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MUTUAL_KNN_K)
        .select("q_id", "nb_id", "cos_sim")
    )
    fwd = directed.select(
        F.col("q_id").alias("src"),
        F.col("nb_id").alias("dst"),
        "cos_sim",
    )
    rev = directed.select(
        F.col("nb_id").alias("src"), F.col("q_id").alias("dst")
    )
    return (
        fwd.join(rev, ["src", "dst"], "inner")
        .filter(F.col("src") < F.col("dst"))
        .orderBy("src", "dst")
    )


QUERIES = {
    "q_embedding_centroids": q_embedding_centroids,
    "similarity_mutual_knn": similarity_mutual_knn,
    "embedding_jl_projection": embedding_jl_projection,
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_knn_join": similarity_knn_join,
    "similarity_lsh_pairs": similarity_lsh_pairs,
    "embedding_normalize_quantize": embedding_normalize_quantize,
    "similarity_hard_negatives": similarity_hard_negatives,
}

ORACLES = {
    "embedding_jl_projection": _jl_oracle(),
    # generate_series instead of UNNEST WITH ORDINALITY (absent in this
    # DuckDB); all fixture embeddings are 64-dim (pinned in tests).
    "q_embedding_centroids": """
        WITH e AS (
            SELECT label, i - 1 AS pos,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * CAST(1000000.0 AS DOUBLE))
                        AS BIGINT) AS q
            FROM embeddings, generate_series(1, 64) AS g(i))
        SELECT label, pos, COUNT(*) AS n_vectors,
               CAST(SUM(CAST(q AS DECIMAL(28,0))) AS DOUBLE)
                   / (COUNT(*) * CAST(1000000.0 AS DOUBLE)) AS centroid
        FROM e GROUP BY label, pos ORDER BY label, pos
    """,
    "embedding_normalize_quantize": """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                          len(embedding) AS dim
                   FROM embeddings),
             m AS (SELECT vec_id, v, dim,
                          sqrt(list_dot_product(v, v)) AS l2_norm,
                          list_max(list_transform(v, x -> abs(x))) AS absmax
                   FROM e)
        SELECT vec_id, l2_norm, absmax,
               array_to_string(
                   list_transform(v,
                       x -> CAST(CAST(round(x / absmax * 127) AS INT) AS VARCHAR)),
                   ',') AS q8,
               CAST(dim AS INT) AS dim
        FROM m
        ORDER BY vec_id
    """,
    "similarity_topk_bruteforce": """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
             e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae FROM embeddings)
        SELECT vec_id,
               list_dot_product(ae, qe)
                   / sqrt(list_dot_product(ae, ae) * list_dot_product(qe, qe)) AS cos_sim
        FROM e, q
        ORDER BY cos_sim DESC, vec_id
        LIMIT 10
    """,
    "similarity_hard_negatives": """
        WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                          CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 8),
             e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ae
                   FROM embeddings),
             scored AS (
                 SELECT q_id, q_label, vec_id AS neg_id, label AS neg_label,
                        list_dot_product(ae, qe)
                            / sqrt(list_dot_product(ae, ae) * list_dot_product(qe, qe)) AS cos_sim
                 FROM e, q WHERE label != q_label),
             ranked AS (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                              ORDER BY cos_sim DESC, neg_id) AS rn
                 FROM scored)
        SELECT q_id, q_label, neg_id, neg_label, cos_sim, rn
        FROM ranked WHERE rn <= 3
        ORDER BY q_id, rn
    """,
    "similarity_mutual_knn": f"""
        WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < {MUTUAL_KNN_ANCHORS}),
             scored AS (
                 SELECT q.vec_id AS q_id, e.vec_id AS nb_id,
                        list_dot_product(e.v, q.v)
                            / sqrt(list_dot_product(e.v, e.v)
                                   * list_dot_product(q.v, q.v)) AS cos_sim
                 FROM a e, a q WHERE e.vec_id != q.vec_id),
             directed AS (
                 SELECT q_id, nb_id, cos_sim,
                        ROW_NUMBER() OVER (PARTITION BY q_id
                                           ORDER BY cos_sim DESC, nb_id)
                            AS rn
                 FROM scored),
             topk AS (SELECT q_id, nb_id, cos_sim FROM directed
                      WHERE rn <= {MUTUAL_KNN_K})
        SELECT f.q_id AS src, f.nb_id AS dst, f.cos_sim
        FROM topk f JOIN topk r ON r.q_id = f.nb_id AND r.nb_id = f.q_id
        WHERE f.q_id < f.nb_id
        ORDER BY src, dst
    """,
    "similarity_knn_join": """
        WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 5),
             e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae FROM embeddings),
             scored AS (
                 SELECT q_id, vec_id,
                        list_dot_product(ae, qe)
                            / sqrt(list_dot_product(ae, ae) * list_dot_product(qe, qe)) AS cos_sim
                 FROM e, q WHERE vec_id != q_id),
             ranked AS (
                 SELECT q_id, vec_id, cos_sim,
                        ROW_NUMBER() OVER (PARTITION BY q_id
                                           ORDER BY cos_sim DESC, vec_id) AS rn
                 FROM scored)
        SELECT q_id, vec_id, cos_sim, rn FROM ranked WHERE rn <= 3
        ORDER BY q_id, rn
    """,
}


def embedding_sumsq_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector quantized energy via ``mapInArrow`` — the RecordBatch
    -level Python API (one tier below mapInPandas: no pandas
    materialization, pyarrow compute end-to-end). Each component
    quantizes to floor(x * 1e3) (IEEE-exact both engines) and the
    vector's sum of squared milli-components surfaces as an exact
    bigint — so even the Arrow-kernel path is value-hash-checked.

    Scale notes: embarrassingly parallel projection; Arrow batches
    never convert to pandas, so the per-batch overhead is one C++
    kernel pass per column — the cheapest possible Python touchpoint
    for wide numeric payloads.
    """
    import pyarrow as pa

    def batches(it):
        import numpy as np

        for rb in it:
            tbl = pa.table(
                {"vec_id": rb.column(0), "embedding": rb.column(1)}
            )
            vec_id = tbl.column("vec_id").to_numpy(zero_copy_only=False)
            emb = tbl.column("embedding")
            out = []
            for chunk_idx in range(len(emb)):
                v = np.asarray(emb[chunk_idx].as_py(), dtype=np.float64)
                q = np.floor(v * 1_000).astype(np.int64)
                out.append(int((q * q).sum()))
            yield pa.record_batch(
                {
                    "vec_id": pa.array(vec_id, pa.int64()),
                    "sumsq_milli2": pa.array(out, pa.int64()),
                }
            )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return emb.mapInArrow(
        batches, schema="vec_id bigint, sumsq_milli2 bigint"
    ).orderBy("vec_id")


QUERIES["embedding_sumsq_arrow"] = embedding_sumsq_arrow

ORACLES["embedding_sumsq_arrow"] = """
    SELECT vec_id,
           CAST(SUM(q * q) AS BIGINT) AS sumsq_milli2
    FROM (
        SELECT vec_id,
               CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                          * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS q
        FROM embeddings, generate_series(1, 64) AS g(i))
    GROUP BY vec_id
    ORDER BY vec_id
"""
