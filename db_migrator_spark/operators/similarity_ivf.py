"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The query-time scale path for ANN: partition the corpus into K coarse
cells (KMeans centroids), store each vector under its cell (the "inverted
file"), and at query time score only the ``nprobe`` cells whose centroids
are closest to the query — scanning nprobe/K of the corpus instead of all
of it. Classic IVF-Flat (as in FAISS), built from public Spark parts:

- index build: ``pyspark.ml.clustering.KMeans`` (seeded, deterministic)
  + a cell-id column — at 100 TB the index is a cell-partitioned parquet
  dataset (``write_partitioned(..., ["cell"])``) so a probe prunes cell
  directories before any IO;
- query: centroid ranking is driver-side numpy over K×dim (tiny), then a
  Catalyst in-filter on the cell column + exact cosine + top-k.

Approximate by construction -> rows-only driver check; recall@10 vs the
brute-force oracle is pinned in tests/test_ivf.py.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .similarity import _cosine

IVF_CELLS = 16
NPROBE = 4
_SEED = 42


def build_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, np.ndarray]:
    """(corpus with cell assignments, centroid matrix K x dim)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.withColumn("features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=IVF_CELLS, seed=_SEED, featuresCol="features", predictionCol="cell").fit(vecs)
    indexed = model.transform(vecs).select("vec_id", "embedding", "label", "cell")
    centroids = np.array(
        [c.toArray() if hasattr(c, "toArray") else np.asarray(c) for c in model.clusterCenters()]
    )
    return indexed, centroids


def ivf_query(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = NPROBE,
) -> DataFrame:
    """Top-k cosine neighbors probing only the nprobe nearest cells."""
    q = np.asarray(query_vec, dtype=np.float64)
    # rank cells by centroid cosine (K x dim — driver-side, microseconds)
    sims = centroids @ q / (np.linalg.norm(centroids, axis=1) * np.linalg.norm(q) + 1e-30)
    probe_cells = [int(c) for c in np.argsort(-sims)[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    return (
        indexed.filter(F.col("cell").isin(probe_cells))
        .select("vec_id", "cell", _cosine(F.col("embedding"), qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: IVF ANN top-10 for the vec_id=0 query."""
    indexed, centroids = build_ivf_index(spark, sf_dir)
    query = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    )
    return ivf_query(indexed, centroids, [float(x) for x in query])


QUERIES = {"similarity_ivf_topk": similarity_ivf_topk}
ORACLES = {}  # approximate (probe subset) -> rows-only; recall pinned in tests
