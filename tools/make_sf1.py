"""Synthesize an sf1-equivalent dataset (10x sf0.1) for local scale tests.

Replicates every sf0.1 table 10x with FK-consistent key offsets, writing
to the output dir (default /tmp/sf1). Unlike a naive copy, replicas are
made *realistic*, not degenerate:

- ``documents``: replica texts are word-perturbed (a deterministic ~50% of
  words get a replica suffix), so a 3-gram survives with p = 0.5^3 and
  cross-replica Jaccard lands ~0.07 — far below the 0.2 near-dup
  threshold. Each replica carries the SAME planted near-dup structure as
  sf0.1, so dup density stays constant while the corpus grows 10x (the
  adversarial every-doc-has-9-twins case is measured separately in
  docs/SCALING.md "dup-heavy stress").
- ``embeddings``: each replica applies a seeded random ORTHOGONAL rotation
  to every vector. Rotation preserves all norms and within-replica
  pairwise geometry exactly (same planted near-dup pairs, same index
  difficulty per replica), while cross-replica cosines collapse to ~0 —
  the corpus grows 10x with constant similarity density and an unchanged
  per-dimension distribution. (A noise-based perturbation was tried first
  and rejected: it inflates norms ~3x, making the corpus norm-
  inhomogeneous in a way real embedding corpora are not, and cratering
  IVF/PQ recall for reasons that are generator artifacts.)
- ``region``/``nation``: NOT scaled — TPC-H dims are fixed-size at every
  SF, which is what keeps them broadcast-able at 100 TB.
- ``events``: event_id/user_id shift per replica (10x users, same per-user
  activity shape); timestamps keep the source physical type.

Usage: python tools/make_sf1.py [src_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPLICAS = 10


def _read(src: str, table: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{table}.parquet"))


def _write(out: str, table: str, tab: pa.Table) -> None:
    pq.write_table(tab, os.path.join(out, f"{table}.parquet"))
    print(f"  {table}: {tab.num_rows} rows", file=sys.stderr)


def _shift(tab: pa.Table, col: str, off: int) -> pa.Table:
    arr = pa.compute.add(tab[col], pa.scalar(off, tab[col].type))
    return tab.set_column(tab.schema.get_field_index(col), col, arr)


def _offsets(tab: pa.Table, col: str) -> int:
    return int(pa.compute.max(tab[col]).as_py()) + 1


def _perturb_text(text: str, r: int) -> str:
    # Deterministic ~50% word substitution: breaks ~7/8 of 3-gram shingles
    # so replicas are NOT near-dups of each other or of replica 0.
    words = text.split(" ")
    out = []
    for w in words:
        if (zlib.crc32(w.encode()) + r) & 1:
            out.append(f"{w}q{r}")
        else:
            out.append(w)
    return " ".join(out)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS
    os.makedirs(out, exist_ok=True)

    # Fixed-size dims: copy through unchanged.
    for t in ("region", "nation"):
        _write(out, t, _read(src, t))

    customer = _read(src, "customer")
    supplier = _read(src, "supplier")
    part = _read(src, "part")
    orders = _read(src, "orders")
    lineitem = _read(src, "lineitem")
    events = _read(src, "events")
    documents = _read(src, "documents")
    embeddings = _read(src, "embeddings")

    ck = _offsets(customer, "c_custkey")
    sk = _offsets(supplier, "s_suppkey")
    pk = _offsets(part, "p_partkey")
    ok = _offsets(orders, "o_orderkey")
    ek = _offsets(events, "event_id")
    uk = _offsets(events, "user_id")
    dk = _offsets(documents, "doc_id")
    vk = _offsets(embeddings, "vec_id")

    def replicate(tab: pa.Table, shifts: dict[str, int]) -> pa.Table:
        parts = [tab]
        for r in range(1, replicas):
            rep = tab
            for col, off in shifts.items():
                rep = _shift(rep, col, r * off)
            parts.append(rep)
        return pa.concat_tables(parts)

    _write(out, "customer", replicate(customer, {"c_custkey": ck}))
    _write(out, "supplier", replicate(supplier, {"s_suppkey": sk}))
    _write(out, "part", replicate(part, {"p_partkey": pk}))
    _write(out, "orders", replicate(orders, {"o_orderkey": ok, "o_custkey": ck}))
    _write(
        out,
        "lineitem",
        replicate(
            lineitem,
            {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk},
        ),
    )
    _write(out, "events", replicate(events, {"event_id": ek, "user_id": uk}))

    # documents: shift keys AND perturb replica text.
    doc_parts = [documents]
    texts0 = documents["text"].to_pylist()
    for r in range(1, replicas):
        rep = _shift(documents, "doc_id", r * dk)
        texts = [t if t is None else _perturb_text(t, r) for t in texts0]
        n_chars = [None if t is None else len(t) for t in texts]
        rep = rep.set_column(
            rep.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
        )
        rep = rep.set_column(
            rep.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array(n_chars, pa.int64()),
        )
        doc_parts.append(rep)
    _write(out, "documents", pa.concat_tables(doc_parts))

    # embeddings: shift keys AND rotate each replica by a seeded random
    # orthogonal matrix (QR of a Gaussian — Haar-ish, deterministic).
    emb_parts = [embeddings]
    mat0 = np.stack(
        [np.asarray(v, dtype=np.float64) for v in embeddings["embedding"].to_pylist()]
    )
    for r in range(1, replicas):
        rep = _shift(embeddings, "vec_id", r * vk)
        rng = np.random.RandomState(42 + r)
        q, rr = np.linalg.qr(rng.standard_normal((mat0.shape[1], mat0.shape[1])))
        q *= np.sign(np.diag(rr))  # canonical sign -> proper Haar sample
        perturbed = (mat0 @ q.T).astype(np.float32)
        rep = rep.set_column(
            rep.schema.get_field_index("embedding"),
            "embedding",
            pa.array(list(perturbed), pa.list_(pa.float32())),
        )
        emb_parts.append(rep)
    _write(out, "embeddings", pa.concat_tables(emb_parts))
    print(f"wrote {out} ({replicas}x {src})", file=sys.stderr)


if __name__ == "__main__":
    main()
