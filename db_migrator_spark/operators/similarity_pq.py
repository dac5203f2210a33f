"""Product quantization (PQ) ANN: compressed codes + asymmetric distance.

The third leg of the ANN scale path (after IVF cell pruning and LSH
bucketing): compress each vector to M subspace code bytes so the SCAN
side of a similarity query reads codes, not floats — at 100 TB the
difference between shipping 256 B/vector and 8 B/vector. Jégou et al.,
"Product Quantization for Nearest Neighbor Search" (TPAMI 2011) is the
public reference design.

- **offline encode** (``write_pq_index``): the 64-dim space splits into
  ``PQ_M`` 8-dim subspaces; per subspace a seeded KMeans (fit on a
  bounded sample) learns ``PQ_K`` centroids; every vector stores its
  nearest-centroid id per subspace (M small ints). Codebooks persist as
  a tiny sidecar (M x K x 8 floats).
- **online query** (``pq_query_index``): for a query vector, the M x K
  table of subspace distances is computed driver-side (metadata-scale
  numpy), embedded as literal arrays, and the approximate squared L2
  distance is M array lookups + adds per row — whole-stage codegen over
  the 8-byte codes, no float payload touched. Top-k via TakeOrdered.

Approximate by construction -> rows-only driver check; recall@10 vs the
exact scan is pinned in tests/test_pq.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

PQ_M = 8  # subspaces
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_SUB_DIM = 8  # 64 / PQ_M
TRAIN_SAMPLE_MAX = 20_000
_SEED = 7


def _fit_codebooks(vectors: np.ndarray) -> np.ndarray:
    """(M, K, sub_dim) codebooks via seeded per-subspace k-means.

    Plain numpy Lloyd iterations: the training sample is bounded
    (TRAIN_SAMPLE_MAX), so this is driver-scale work by design — the
    cluster-scale path would be pyspark.ml KMeans per subspace, but for
    a bounded sample the driver fit avoids M Spark jobs.
    """
    rng = np.random.RandomState(_SEED)
    books = np.zeros((PQ_M, PQ_K, PQ_SUB_DIM))
    for m in range(PQ_M):
        sub = vectors[:, m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM]
        idx = rng.choice(len(sub), size=min(PQ_K, len(sub)), replace=False)
        cent = sub[idx].copy()
        for _ in range(20):
            d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for k in range(len(cent)):
                mask = assign == k
                if mask.any():
                    cent[k] = sub[mask].mean(axis=0)
        books[m, : len(cent)] = cent
    return books


def write_pq_index(spark: SparkSession, sf_dir: str, index_path: str) -> None:
    """Offline: fit codebooks on a bounded sample, encode every vector
    distributed (one mapInPandas-free pass — the encode is a broadcast
    numpy argmin inside a pandas_udf), persist codes + codebooks."""
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    sample = emb if n <= TRAIN_SAMPLE_MAX else emb.sample(
        TRAIN_SAMPLE_MAX / n, seed=_SEED
    )
    train = np.array(
        [list(r.embedding) for r in sample.select("embedding").collect()],
        dtype=np.float64,
    )
    books = _fit_codebooks(train)
    bc = spark.sparkContext.broadcast(books)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(embeddings: pd.Series) -> pd.Series:
        bb = bc.value
        mat = np.stack(embeddings.to_numpy()).astype(np.float64)
        codes = np.zeros((len(mat), PQ_M), dtype=np.int32)
        for m in range(PQ_M):
            sub = mat[:, m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM]
            d = ((sub[:, None, :] - bb[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d.argmin(axis=1)
        return pd.Series(list(codes))

    emb.select("vec_id", encode("embedding").alias("code")).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_path, "codes"))
    # Arrow path (r15): pandas createDataFrame ships the 128-row codebook
    # sidecar as one Arrow batch instead of a pickled-RDD Python job.
    flat = pd.DataFrame(
        {
            "m": [m for m in range(PQ_M) for _ in range(PQ_K)],
            "k": [k for _ in range(PQ_M) for k in range(PQ_K)],
            "centroid": [
                [float(x) for x in books[m, k]]
                for m in range(PQ_M)
                for k in range(PQ_K)
            ],
        }
    )
    spark.createDataFrame(
        flat, "m int, k int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_path, "codebooks")
    )


SHORTLIST = 100


def pq_query_index(
    spark: SparkSession, index_path: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Online: asymmetric-distance shortlist over the code table.

    The M x K distance table is driver-side numpy (metadata-scale, like
    quantile cut-points); per row the approximate distance is M literal-
    array lookups + adds — pure codegen over 8-byte codes."""
    q = np.asarray(query_vec, dtype=np.float64)
    book_rows = spark.read.parquet(os.path.join(index_path, "codebooks")).collect()
    books = np.zeros((PQ_M, PQ_K, PQ_SUB_DIM))
    for r in book_rows:
        books[r.m, r.k] = r.centroid
    tables = np.zeros((PQ_M, PQ_K))
    for m in range(PQ_M):
        sub_q = q[m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM]
        tables[m] = ((books[m] - sub_q[None, :]) ** 2).sum(axis=1)

    codes = spark.read.parquet(os.path.join(index_path, "codes"))
    dist = None
    for m in range(PQ_M):
        lut = F.array(*[F.lit(float(x)) for x in tables[m]])
        term = F.element_at(lut, F.element_at("code", m + 1) + 1)
        dist = term if dist is None else dist + term
    return (
        codes.select("vec_id", dist.alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id"))
        .limit(k)
    )


def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: PQ ANN top-10 nearest (L2) to vec_id=0.

    ADC + re-rank, the standard PQ deployment: the code scan produces a
    SHORTLIST-sized candidate set (reading 8-byte codes, never floats);
    only those candidates' true embeddings are joined back for the exact
    distance — so float IO is O(shortlist), not O(corpus). The index is
    built per invocation into a scratch dir and removed after the
    (materialized) result — round 14 dropped the cross-run /tmp index
    cache per the no-precomputation rule (every bench/oracle invocation
    computes from the parquet inputs)."""
    import shutil

    from .similarity_ivf import _ephemeral_index_dir

    emb = load_table(spark, sf_dir, "embeddings")
    path = _ephemeral_index_dir("pq")
    try:
        write_pq_index(spark, sf_dir, path)
        query = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        ]
        shortlist = pq_query_index(spark, path, query, k=SHORTLIST).select("vec_id")
        qcol = F.array(*[F.lit(x) for x in query])
        diff = F.zip_with("embedding", qcol, lambda a, b: a.cast("double") - b)
        exact_d2 = F.aggregate(
            F.transform(diff, lambda d: d * d), F.lit(0.0), lambda acc, x: acc + x
        )
        return (
            emb.join(F.broadcast(shortlist), "vec_id")
            .select("vec_id", exact_d2.alias("dist2"))
            .orderBy(F.col("dist2").asc(), F.col("vec_id"))
            .limit(10)
            .localCheckpoint()  # materialize before the index dir goes away
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


QUERIES = {"similarity_pq_topk": similarity_pq_topk}
ORACLES: dict[str, str] = {}  # approximate codes -> rows-only; recall pinned in tests
