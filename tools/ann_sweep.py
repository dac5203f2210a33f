"""IVF / PQ recall-latency sweep for docs/SCALING.md.

Builds both ANN indexes once on the target corpus, then sweeps
- IVF: nprobe in {1, 2, 4, 8} (of IVF_CELLS=16 cells)
- PQ: ADC shortlist size in {50, 100, 200, 400} (re-ranked to top-10)

measuring recall@10 against the exact (numpy, driver-side) top-10 over
N_QUERIES fixture vectors, and per-query wall latency of the Spark path.

Usage: python tools/ann_sweep.py [sf_dir] [n_queries]
Prints one JSON line; paste-ready markdown rows go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 10
K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else N_QUERIES

    from pyspark.sql import functions as F

    from db_migrator_spark.io import load_table
    from db_migrator_spark.operators import similarity_ivf, similarity_pq
    from db_migrator_spark.session import get_spark

    spark = get_spark("ann-sweep")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)

    # Deterministic query sample: evenly spaced vec_ids.
    q_idx = np.linspace(0, len(ids) - 1, n_queries).astype(int)

    def exact_topk_cos(qi: int) -> set[int]:
        sims = mat @ mat[qi] / (norms * norms[qi] + 1e-30)
        best = np.argsort(-sims)
        best = best[best != qi][:K]
        return set(ids[best])

    def exact_topk_l2(qi: int) -> set[int]:
        d2 = ((mat - mat[qi]) ** 2).sum(axis=1)
        best = np.argsort(d2)
        best = best[best != qi][:K]
        return set(ids[best])

    # --- IVF: sweep (k_cells, nprobe) — nprobe/k_cells is the scanned
    # corpus fraction, and k_cells should grow ~sqrt(N) with the corpus ---
    ivf_results = []
    n_vec = len(ids)
    k_grid = [similarity_ivf.IVF_CELLS]
    sqrt_k = int(round((n_vec**0.5) / 8)) * 8
    if sqrt_k > similarity_ivf.IVF_CELLS * 2:
        k_grid.append(sqrt_k)
    for k_cells in k_grid:
        ivf_path = similarity_ivf._index_cache_path(sf_dir) + f"_k{k_cells}"
        if not os.path.exists(os.path.join(ivf_path, "centroids")):
            t0 = time.perf_counter()
            similarity_ivf.write_ivf_index(spark, sf_dir, ivf_path, k_cells)
            print(
                f"# ivf build k={k_cells}: {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
        for nprobe in (1, 2, 4, 8):
            recalls, times = [], []
            for qi in q_idx:
                truth = exact_topk_cos(qi)
                t0 = time.perf_counter()
                got = similarity_ivf.ivf_query_index(
                    spark, ivf_path, [float(x) for x in mat[qi]], k=K + 1, nprobe=nprobe
                ).collect()
                times.append(time.perf_counter() - t0)
                # fair recall@K: drop self, then truncate to the TOP K of
                # what was retrieved (results arrive cos-desc) — keeping
                # all K+1 when self is absent would overstate recall.
                topk = [r.vec_id for r in got if r.vec_id != ids[qi]][:K]
                recalls.append(len(set(topk) & truth) / K)
            ivf_results.append(
                {
                    "k_cells": k_cells,
                    "nprobe": nprobe,
                    "scan_frac": round(nprobe / k_cells, 3),
                    "recall_at_10": round(float(np.mean(recalls)), 3),
                    "latency_s": round(float(np.median(times)), 3),
                }
            )
            print(f"# ivf {ivf_results[-1]}", file=sys.stderr)

    # --- PQ ----------------------------------------------------------------
    pq_path = similarity_pq._index_cache_path(sf_dir)
    if not os.path.exists(os.path.join(pq_path, "codebooks")):
        t0 = time.perf_counter()
        similarity_pq.write_pq_index(spark, sf_dir, pq_path)
        print(f"# pq build: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    pq_results = []
    for shortlist in (50, 100, 200, 400):
        recalls, times = [], []
        for qi in q_idx:
            truth = exact_topk_l2(qi)
            query = [float(x) for x in mat[qi]]
            t0 = time.perf_counter()
            sl = similarity_pq.pq_query_index(
                spark, pq_path, query, k=shortlist
            ).select("vec_id")
            qcol = F.array(*[F.lit(x) for x in query])
            diff = F.zip_with("embedding", qcol, lambda a, b: a.cast("double") - b)
            exact_d2 = F.aggregate(
                F.transform(diff, lambda d: d * d), F.lit(0.0), lambda acc, x: acc + x
            )
            got = (
                emb.join(F.broadcast(sl), "vec_id")
                .select("vec_id", exact_d2.alias("d2"))
                .filter(F.col("vec_id") != int(ids[qi]))
                .orderBy(F.col("d2").asc(), F.col("vec_id"))
                .limit(K)
                .collect()
            )
            times.append(time.perf_counter() - t0)
            recalls.append(len({r.vec_id for r in got} & truth) / K)
        pq_results.append(
            {
                "shortlist": shortlist,
                "recall_at_10": round(float(np.mean(recalls)), 3),
                "latency_s": round(float(np.median(times)), 3),
            }
        )
        print(f"# pq shortlist={shortlist}: {pq_results[-1]}", file=sys.stderr)

    print("\n# markdown:", file=sys.stderr)
    for r in ivf_results:
        print(
            f"| IVF k={r['k_cells']} nprobe={r['nprobe']} ({r['scan_frac']:.0%} scan) "
            f"| {r['recall_at_10']} | {r['latency_s']}s |",
            file=sys.stderr,
        )
    for r in pq_results:
        print(
            f"| PQ shortlist={r['shortlist']} | {r['recall_at_10']} | {r['latency_s']}s |",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": int(len(ids)),
                "n_queries": int(n_queries),
                "ivf": ivf_results,
                "pq": pq_results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
