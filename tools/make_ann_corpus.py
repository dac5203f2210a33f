"""Clustered ANN benchmark corpus (embeddings table only).

The sf* fixture embeddings are deliberately isotropic — the adversarial
case for any cell-based ANN index (recall on structureless data tracks the
scanned fraction; see docs/SCALING.md). Real embedding corpora are
clustered (documents about one topic embed near each other), and that
structure is precisely what IVF exploits. This tool generates the
realistic case: N vectors around C cluster centers with a controlled
within-cluster cosine, so the IVF/PQ recall-latency curves can be read
for both regimes.

Usage: python tools/make_ann_corpus.py [out_dir] [n] [clusters] [dim]
Writes out_dir/embeddings.parquet with the fixture schema
(vec_id int64, embedding list<float>, label int32).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann_clustered"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    os.makedirs(out, exist_ok=True)

    rng = np.random.RandomState(42)
    centers = rng.standard_normal((c, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = rng.randint(0, c, size=n)
    # sigma sets within-cluster cosine ~ 1/sqrt(1 + sigma^2) ~ 0.85
    sigma = 0.62
    noise = rng.standard_normal((n, dim)) * (sigma / np.sqrt(dim))
    vecs = centers[cluster] + noise
    # match fixture norm scale (~sqrt(dim) per component unit variance)
    vecs *= np.sqrt(dim) / np.linalg.norm(vecs, axis=1, keepdims=True).mean()

    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32())),
            "label": pa.array(cluster % 10, pa.int32()),
        }
    )
    pq.write_table(tab, os.path.join(out, "embeddings.parquet"))
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    s = u[:500] @ u[:500].T
    same = cluster[:500, None] == cluster[None, :500]
    iu = np.triu_indices(500, 1)
    print(
        f"wrote {out}: n={n} c={c} dim={dim} "
        f"within-cos={s[iu][same[iu]].mean():.2f} cross-cos={s[iu][~same[iu]].mean():.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
