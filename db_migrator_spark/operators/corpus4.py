"""Round-6 LLM-data-pipeline additions: semantic dedup and published
heuristic quality rules.

The reference is a 1:1 table copier with no corpus operators (cited for
scope: /root/reference/src/migrate/table_migrator.rs:43-114 is its whole
data path); these extend the engine's training-data-pipeline family:

- ``dedup_semantic``: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) —
  k-means-cluster the embedding space, then mark within-cluster pairs
  whose cosine clears a threshold as semantic duplicates, keeping the
  lowest vec_id of each pair. Distinct from ``dedup_embedding_cosine``
  (global sign-band blocking): here the blocking structure IS the k-means
  clustering, exactly as published.
- ``text_gopher_rules``: per-document quality-rule flags from Gopher
  (Rae et al. 2021, arXiv:2112.11446, table A1) and C4 (Raffel et al.
  2020, arXiv:1910.10683): word-count bounds, mean-word-length bounds,
  stop-word presence, alphabetic-word fraction, top-word dominance, and
  the C4 lorem-ipsum / curly-brace blocklist checks.

Scale notes (100 TB):

- SemDeDup's cost driver is the within-cluster all-pairs join — quadratic
  in cluster size, NEVER in corpus size. The published configuration keeps
  per-cluster membership bounded by growing k with the corpus (110k
  clusters for LAION-440M ⇒ ~4k vectors per cluster); the declared query
  ENFORCES that contract in-plan: ``_semdedup_members`` derives a
  power-of-two cell multiplier from COUNT(*) and sign-splits oversized
  label cells through their centroids' coordinate hyperplanes, holding
  mean cell size at ~``SEMDEDUP_TARGET_CELL`` so total pair output grows
  ~linearly with the corpus (measured: docs/SCALING.md round-7 SemDeDup
  section). The self-join shuffles on the refined cell key; AQE
  skew-split handles residual imbalance. Assignment itself is a broadcast
  of k centroid vectors against a linear scan.
- The Gopher rules are a single narrow projection — one pass, no shuffle,
  no UDF; every rule is a codegen'd expression over the split word array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .corpus2 import label_centroids, nearest_centroid_assignment
from .similarity import _as_double, _dot
from .text import ORACLES as _TEXT_ORACLES

# Cosine threshold for "semantically duplicate" within a cluster. Real
# embedding spaces use ~0.95+; the synthetic fixture is isotropic (max
# pair cosine ~0.5), so the threshold sits at the knee that yields a
# non-trivial duplicate set (~100 pairs at sf0.01) while exercising the
# identical plan shape.
SEMDEDUP_TAU = 0.3

# SemDeDup's published scale contract is "k grows with the corpus so
# per-cluster membership stays bounded" (110k clusters for LAION-440M
# ⇒ ~4k/cluster). The declared query enforces that contract
# adaptively: when the mean label-cell size exceeds SEMDEDUP_TARGET_CELL
# the cells are REFINED by sign-splitting each cell through its own
# centroid's coordinate hyperplanes — every refinement bit doubles the
# cell count and halves total pair work (per-cell pairs quarter, cell
# count doubles). The per-cell pair budget is therefore
# ~TARGET_CELL^2/2 = 2048 pairs — the same budget class as
# ``dedup.BUCKET_PAIR_BUDGET`` — and total pair output grows ~linearly
# with the corpus instead of quadratically. The bit count is derived
# IN-PLAN from COUNT(*) (broadcast one-row aggregate, no driver
# action) so any scale factor sizes itself; SEMDEDUP_MAX_SUB_BITS caps
# the refinement at 2^16 sub-cells per label (enough for 4e7 vectors
# per label at the default budget; beyond that, supply a finer base
# clustering via ``semantic_dup_flags``).
SEMDEDUP_TARGET_CELL = 64
SEMDEDUP_MAX_SUB_BITS = 16

# Gopher table-A1 thresholds (kept canonical, not fixture-tuned).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_MIN_STOPWORDS = 2
# Rae et al. 2021 table A1's exact 8-word list; the rule is "contains at
# least two OF these words", i.e. >= 2 DISTINCT members, not occurrences.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
# Top-word dominance (the unigram analog of Gopher's top-n-gram character
# fraction rule).
GOPHER_MAX_TOP_WORD_FRAC = 0.20


def _semdedup_members(
    emb: DataFrame, target_cell: int = SEMDEDUP_TARGET_CELL
) -> DataFrame:
    """(vec_id, cluster, embedding) with ADAPTIVE cell refinement.

    Base blocking is the nearest-label-centroid assignment (the exact
    E-step shared with ``q_kmeans_assign``). The cell multiplier is the
    smallest power of two ``cell_mult`` with
    ``N <= k0 * target_cell * cell_mult`` (N = corpus size, k0 = base
    cell count) — pure integer comparisons, computed from a broadcast
    one-row aggregate so the plan stays lazy and any engine derives the
    same value. With ``b = log2(cell_mult)`` refinement bits, vector v in
    label cell L lands in sub-cell ``Σ_{d<b} 2^d·[v[d] > centroid_L[d]]``
    — each bit splits the cell through its own centroid's coordinate
    hyperplane, preserving semantic locality (near-identical vectors sit
    on the same side of every hyperplane except within ~0 of the
    boundary). Encoded key: ``cluster = label·cell_mult + sub_cell``,
    which degenerates to the raw label when no refinement is needed.

    Exactness: centroid coordinates are the engine-exact quantized means
    (``label_centroids``) and each bit is one double comparison of
    identical doubles — deterministic in both engines, so the DuckDB twin
    reproduces the refined blocking bit-for-bit.
    """
    # One centroid aggregation feeds both the E-step scoring and the
    # sub-cell sign bits: K rows, checkpointed so the (label, pos)
    # explode-aggregate runs once (A/B at sf0.1: 4.2s -> ~2s for the
    # declared query vs recomputing cent per consumer).
    cent = label_centroids(emb).localCheckpoint()
    asg = nearest_centroid_assignment(emb, cent=cent).select(
        "vec_id", F.col("assigned_label").alias("lbl")
    )
    cm = F.greatest(
        F.lit(1),
        *[
            F.when(
                F.col("n_vec") > F.col("k0") * F.lit(target_cell * 2 ** (i - 1)),
                F.lit(2**i),
            ).otherwise(F.lit(1))
            for i in range(1, SEMDEDUP_MAX_SUB_BITS + 1)
        ],
    )
    stats = emb.agg(
        F.count(F.lit(1)).alias("n_vec"), F.count_distinct(F.col("label")).alias("k0")
    ).select(cm.cast("bigint").alias("cell_mult"))
    ad = _as_double(F.col("embedding"))
    sub = None
    for d in range(SEMDEDUP_MAX_SUB_BITS):
        bit = F.when(
            (F.col("cell_mult") > F.lit(2**d))
            & (F.get(ad, d) > F.get(F.col("cvec"), d)),
            F.lit(2**d),
        ).otherwise(F.lit(0))
        sub = bit if sub is None else sub + bit
    return (
        emb.join(asg, "vec_id")
        .join(F.broadcast(cent), F.col("lbl") == F.col("c_label"))
        .crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            (F.col("lbl").cast("bigint") * F.col("cell_mult") + sub.cast("bigint")).alias(
                "cluster"
            ),
            "embedding",
        )
    )


def dedup_semantic(
    spark: SparkSession, sf_dir: str, target_cell: int = SEMDEDUP_TARGET_CELL
) -> DataFrame:
    """SemDeDup: within-k-means-cluster cosine dedup (arXiv:2303.09540).

    Every vector is assigned to its nearest per-label centroid (the exact
    E-step shared with ``q_kmeans_assign``), adaptively refined so cells
    stay ~``target_cell``-sized at any corpus size (``_semdedup_members``
    — the paper's "k grows with N" contract, in-plan); within each cell,
    every ``i < j`` pair's exact cosine is computed, and ``j`` is a
    semantic duplicate iff some lower-id cell-mate ``i`` has
    ``cos(i, j) >= SEMDEDUP_TAU`` — the deterministic analog of the
    paper's keep-one-representative rule. Output: one row per vector with
    its cell, the max cosine to any lower-id cell-mate (NULL for the
    cell's lowest id), and the duplicate verdict.

    Plan shape: centroid assignment is a broadcast (k rows) against a
    linear scan; the refinement adds one broadcast one-row aggregate and
    k centroid rows (no extra shuffle); the pair join shuffles both sides
    once on the cell key; the per-vector reduction is a groupBy on vec_id
    (map-side combinable max). Deterministic end-to-end — same quantized
    centroids, same pinned-fold cosine as the rest of the similarity
    family — so the DuckDB twin hash-matches exactly.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # members feeds three consumers (both pair sides + the final rejoin);
    # checkpointing avoids re-running the E-step per consumer (A/B at
    # sf0.1: 1.27s -> 1.12s).
    members = _semdedup_members(emb, target_cell).localCheckpoint()
    return semantic_dup_flags(members).orderBy("vec_id")


def semantic_dup_flags(members: DataFrame) -> DataFrame:
    """SemDeDup core over an ARBITRARY clustering: ``members`` is
    (vec_id, cluster, embedding) — any blocking the caller chooses. This
    is the published scale lever made into API: the declared query feeds
    it label-centroid cells, and a corpus that outgrows its k simply
    supplies a finer clustering (more centroids, sub-clustered cells) —
    the within-cluster pair cost is quadratic in CELL size only: doubling
    the cell count halves the total pair work (per-cell pairs quarter,
    cell count doubles) with identical downstream semantics
    (demonstrated in tests/test_llm_ops.py)."""
    # Round 14 (guide §2.4 remove shuffles outright): within-cell pairs
    # are generated ROW-LOCALLY — one groupBy on the cell key collects the
    # vec_id-sorted member structs (cells are ~TARGET_CELL-bounded by the
    # adaptive refinement), then the C(k,2) strictly-later slice explode
    # emits each i < j pair once inside codegen. This replaces the cluster
    # self-join that shuffled the embedding payload TWICE (both pair
    # sides) with ONE cell-keyed shuffle; the r10b win condition holds
    # (bounded groups, E[cell]^2 >> 1). The cosine is the IDENTICAL
    # pinned fold on the exploded struct fields — same IEEE ops in the
    # same order, so values hash-match the join formulation (the DuckDB
    # oracle keeps its self-join; the contract is on values). vec_id is
    # unique, so sorting by the struct's leading field is a total order
    # and "strictly later in the sorted list" == "i < j".
    grouped = members.groupBy("cluster").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("vec_id").alias("i"), F.col("embedding").alias("e"))
            )
        ).alias("ms")
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) -> "
                "transform(slice(ms, i + 2, size(ms)), "
                "y -> struct(y.i AS j, x.e AS ea, y.e AS eb))))"
            )
        ).alias("p")
    ).select(F.col("p.j").alias("j"), F.col("p.ea").alias("ea"), F.col("p.eb").alias("eb"))
    da, db_ = _as_double(F.col("ea")), _as_double(F.col("eb"))
    cos = _dot(da, db_) / F.sqrt(_dot(da, da) * _dot(db_, db_))
    pair_max = (
        pairs.select("j", cos.alias("cos"))
        .groupBy("j")
        .agg(F.max("cos").alias("max_cos_lower"))
    )
    return members.join(pair_max, members.vec_id == pair_max.j, "left").select(
        "vec_id",
        "cluster",
        "max_cos_lower",
        F.coalesce(
            F.col("max_cos_lower") >= F.lit(SEMDEDUP_TAU), F.lit(False)
        ).alias("is_semantic_dup"),
    )


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 heuristic quality flags per document.

    All rules are integer counts or exact ratios over the split word
    array — single projection, whole-stage codegen, no shuffle except the
    top-word frequency (one groupBy on (doc_id, word) + per-doc max,
    map-side combinable). Ratios divide two exact integer counts in
    double precision, which is bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    nw = F.size(w)
    sum_wl = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    mean_wl = sum_wl.cast("double") / nw
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw
    )
    # array_intersect already returns distinct members — no pre-distinct.
    stop_count = F.size(
        F.array_intersect(w, F.array(*[F.lit(t) for t in GOPHER_STOPWORDS]))
    )
    base = docs.select(
        "doc_id",
        nw.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_count.alias("stop_count"),
        F.col("text").contains("{").alias("has_brace"),
        F.col("text").contains("lorem ipsum").alias("has_lorem"),
    )
    top = (
        docs.select("doc_id", F.explode(w).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"))
    )
    j = base.join(top, "doc_id")
    top_frac = F.col("top_word_count").cast("double") / F.col("n_words")
    flags = {
        "ok_word_count": F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
        "ok_mean_word_len": (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WL)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WL),
        "ok_alpha": F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC,
        "ok_stopwords": F.col("stop_count") >= GOPHER_MIN_STOPWORDS,
        "ok_top_word": top_frac <= GOPHER_MAX_TOP_WORD_FRAC,
        "ok_no_blocklist": ~F.col("has_brace") & ~F.col("has_lorem"),
    }
    out = j.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_count",
        top_frac.alias("top_word_frac"),
        *[v.alias(k) for k, v in flags.items()],
    )
    pass_all = None
    for k in flags:
        pass_all = F.col(k) if pass_all is None else (pass_all & F.col(k))
    return out.withColumn("pass_gopher", pass_all).orderBy("doc_id")


def text_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169):
    score every document by how target-like its token distribution is,
    where the target is the English subset (``lang = 'en'``) and the raw
    distribution is the whole corpus; select documents whose importance
    weight clears 1.0.

    DSIR weights are exp(Σ log p_target(w) - log p_raw(w)) over hashed
    n-gram features; cross-engine log/exp is last-ulp fragile, so the
    weight here is the ratio-of-averages rational
    ``(Σ cnt_target(w) · N_raw) / (Σ cnt_raw(w) · N_target)`` — integer
    sums, double-cast factors multiplied in double (wrap-proof at any
    corpus size; exact while every factor and product sits under 2^53,
    which covers every fixture scale), ONE division at the end, monotone
    in target-likeness and bit-identical in both engines (same trick as
    ``text_unigram_score``). At scale the term key becomes
    ``xxhash64(term) % B`` hashed buckets exactly as published — same
    plan; raw terms are kept here so the oracle groups identically
    without a cross-engine hash.

    Plan shape: one token explode feeds two map-side-combined vocab
    aggregations (target counts filter before the shuffle); the token
    stream joins the vocab on term (shuffle join on purpose — a 100 TB
    junk-token vocabulary is not broadcastable), then reduces per doc;
    the two scalar totals broadcast via a 1-row crossJoin.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("cnt_t"),
    )
    totals = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_t"),
    )
    per_doc = (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            F.sum("cnt_t").cast("bigint").alias("s_target"),
            F.sum("cnt_raw").cast("bigint").alias("s_raw"),
        )
    )
    # Each factor casts to double BEFORE the multiply: at 100 TB both
    # products can pass 2^63 (int64 wrap under non-ANSI Spark); double
    # products merely round past 2^53, and at fixture scale every factor
    # and product stays under 2^53 so the ratio remains exact.
    w = (F.col("s_target").cast("double") * F.col("n_raw").cast("double")) / (
        F.col("s_raw").cast("double") * F.col("n_t").cast("double")
    )
    return (
        per_doc.crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "n_tok",
            "s_target",
            "s_raw",
            w.alias("importance_w"),
            (w >= 1.0).alias("is_selected"),
        )
        .orderBy("doc_id")
    )


RRF_K = 60  # Cormack et al. 2009 reciprocal-rank-fusion constant
HYBRID_TOP = 10


def text_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval with reciprocal-rank fusion (Cormack et
    al. 2009): the BM25 keyword top-10 and the embedding-cosine top-10
    (query = vector 0, fixture convention doc i ↔ embedding i) fuse by
    ``rrf = 1/(K + r_sparse) + 1/(K + r_dense)`` over the union, a
    missing rank contributing 0.

    Rank-based fusion is the cross-engine-exactness sweet spot: ranks are
    integers, each reciprocal is a single double division, and the sum is
    one fixed-order two-term expression — no order-dependent float
    aggregation anywhere.

    Plan shape: both stages are existing top-k plans (BM25's broadcast
    stats + TakeOrdered; the dense side's broadcast query + TakeOrdered);
    fusion is a full outer join of two 10-row frames — driver-trivial,
    and at 100 TB still |results|-sized, never corpus-sized.
    """
    from .similarity import _cosine
    from .text import text_bm25_search

    sparse = text_bm25_search(spark, sf_dir).select(
        "doc_id", F.row_number().over(
            W.orderBy(F.col("score").desc(), F.col("doc_id"))
        ).alias("bm25_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("query_vec"))
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("embedding"), F.col("query_vec")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(HYBRID_TOP)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(
                W.orderBy(F.col("cos").desc(), F.col("vec_id"))
            ).alias("cos_rank"),
        )
    )
    rrf = F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("cos_rank")), F.lit(0.0)
    )
    return (
        sparse.join(dense, "doc_id", "full_outer")
        .select("doc_id", "bm25_rank", "cos_rank", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    )


QUERIES = {
    "dedup_semantic": dedup_semantic,
    "text_gopher_rules": text_gopher_rules,
    "text_importance_resample": text_importance_resample,
    "text_hybrid_search_rrf": text_hybrid_search_rrf,
}

_STOP_SQL = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)

_HYBRID_SQL = f"""
        WITH b AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
            FROM ({_TEXT_ORACLES["text_bm25_search"]})),
        craw AS (
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id = 0),
                 e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae
                       FROM embeddings WHERE vec_id <> 0)
            SELECT vec_id,
                   list_dot_product(ae, qe)
                       / sqrt(list_dot_product(ae, ae)
                              * list_dot_product(qe, qe)) AS cos
            FROM e, q
            ORDER BY cos DESC, vec_id
            LIMIT {HYBRID_TOP}),
        c AS (
            SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS cos_rank
            FROM craw)
        SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
               b.bm25_rank, c.cos_rank,
               COALESCE(1.0 / ({RRF_K} + b.bm25_rank), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + c.cos_rank), 0.0) AS rrf_score
        FROM b FULL OUTER JOIN c ON b.doc_id = c.doc_id
        ORDER BY rrf_score DESC, doc_id
"""

def _semdedup_sql(target_cell: int = SEMDEDUP_TARGET_CELL) -> str:
    """DuckDB twin of ``dedup_semantic`` with the SAME adaptive cell
    refinement (cell_mult + sign-split sub-cells), built from the same
    constants so tests can exercise refined configurations."""
    doublings = ", ".join(
        f"CASE WHEN n_vec > k0 * {target_cell * 2 ** (i - 1)} "
        f"THEN {2 ** i} ELSE 1 END"
        for i in range(1, SEMDEDUP_MAX_SUB_BITS + 1)
    )
    subbits = " + ".join(
        f"(CASE WHEN cell_mult > {2 ** d} AND ae[{d + 1}] > cvec[{d + 1}] "
        f"THEN {2 ** d} ELSE 0 END)"
        for d in range(SEMDEDUP_MAX_SUB_BITS)
    )
    return f"""
        WITH e AS (
            SELECT label, i - 1 AS pos,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * CAST(1000000.0 AS DOUBLE))
                        AS BIGINT) AS q
            FROM embeddings, generate_series(1, 64) AS g(i)),
        cp AS (
            SELECT label, pos,
                   CAST(SUM(CAST(q AS DECIMAL(28,0))) AS DOUBLE)
                       / (COUNT(*) * CAST(1000000.0 AS DOUBLE)) AS c
            FROM e GROUP BY label, pos),
        cent AS (
            SELECT label AS c_label, list(c ORDER BY pos) AS cvec
            FROM cp GROUP BY label),
        scored AS (
            SELECT vec_id, c_label,
                   (list_dot_product(ae, ae) - 2.0 * list_dot_product(ae, cvec))
                       + list_dot_product(cvec, cvec) AS dist2
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ae
                  FROM embeddings), cent),
        asg AS (
            SELECT vec_id, c_label AS lbl
            FROM (SELECT vec_id, c_label,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY dist2, c_label) AS rn
                  FROM scored)
            WHERE rn = 1),
        cm AS (
            SELECT CAST(GREATEST(1, {doublings}) AS BIGINT) AS cell_mult
            FROM (SELECT COUNT(*) AS n_vec, COUNT(DISTINCT label) AS k0
                  FROM embeddings)),
        m AS (
            SELECT a.vec_id,
                   CAST(a.lbl AS BIGINT) * cell_mult
                       + CAST({subbits} AS BIGINT) AS cluster,
                   a.ae AS v
            FROM (SELECT asg.vec_id, asg.lbl,
                         CAST(e2.embedding AS DOUBLE[]) AS ae
                  FROM asg JOIN embeddings e2 ON asg.vec_id = e2.vec_id) a
            JOIN cent ON a.lbl = cent.c_label
            CROSS JOIN cm),
        pm AS (
            SELECT b.vec_id AS j,
                   MAX(list_dot_product(a.v, b.v)
                       / sqrt(list_dot_product(a.v, a.v)
                              * list_dot_product(b.v, b.v))) AS max_cos_lower
            FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            GROUP BY b.vec_id)
        SELECT m.vec_id, m.cluster, pm.max_cos_lower,
               COALESCE(pm.max_cos_lower >= {SEMDEDUP_TAU}, FALSE)
                   AS is_semantic_dup
        FROM m LEFT JOIN pm ON m.vec_id = pm.j
        ORDER BY m.vec_id
    """


ORACLES = {
    "text_hybrid_search_rrf": _HYBRID_SQL,
    "dedup_semantic": _semdedup_sql(),
    "text_importance_resample": """
        WITH toks AS (
            SELECT doc_id, lang, term
            FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            WHERE term <> ''),
        vocab AS (
            SELECT term, COUNT(*) AS cnt_raw,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt_t
            FROM toks GROUP BY term),
        totals AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_raw,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_t
            FROM toks),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tok,
                   CAST(SUM(cnt_t) AS BIGINT) AS s_target,
                   CAST(SUM(cnt_raw) AS BIGINT) AS s_raw
            FROM toks JOIN vocab USING (term)
            GROUP BY doc_id)
        SELECT doc_id, n_tok, s_target, s_raw,
               (CAST(s_target AS DOUBLE) * CAST(n_raw AS DOUBLE))
                   / (CAST(s_raw AS DOUBLE) * CAST(n_t AS DOUBLE))
                   AS importance_w,
               (CAST(s_target AS DOUBLE) * CAST(n_raw AS DOUBLE))
                   / (CAST(s_raw AS DOUBLE) * CAST(n_t AS DOUBLE)) >= 1.0
                   AS is_selected
        FROM per_doc, totals
        ORDER BY doc_id
    """,
    "text_gopher_rules": f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS w,
                   text LIKE '%{{%' AS has_brace,
                   text LIKE '%lorem ipsum%' AS has_lorem
            FROM documents),
        feat AS (
            SELECT doc_id,
                   len(w) AS n_words,
                   CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                       / len(w) AS mean_word_len,
                   CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                        AS DOUBLE) / len(w) AS alpha_frac,
                   len(list_intersect(w, [{_STOP_SQL}])) AS stop_count,
                   has_brace, has_lorem
            FROM base),
        top AS (
            SELECT doc_id, MAX(c) AS top_word_count
            FROM (SELECT doc_id, word, COUNT(*) AS c
                  FROM (SELECT doc_id, unnest(w) AS word FROM base)
                  GROUP BY doc_id, word)
            GROUP BY doc_id),
        flagged AS (
            SELECT f.doc_id, f.n_words, f.mean_word_len, f.stop_count,
                   CAST(t.top_word_count AS DOUBLE) / f.n_words AS top_word_frac,
                   f.n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                       AS ok_word_count,
                   f.mean_word_len >= {GOPHER_MIN_MEAN_WL}
                       AND f.mean_word_len <= {GOPHER_MAX_MEAN_WL}
                       AS ok_mean_word_len,
                   f.alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS ok_alpha,
                   f.stop_count >= {GOPHER_MIN_STOPWORDS} AS ok_stopwords,
                   CAST(t.top_word_count AS DOUBLE) / f.n_words
                       <= {GOPHER_MAX_TOP_WORD_FRAC} AS ok_top_word,
                   NOT f.has_brace AND NOT f.has_lorem AS ok_no_blocklist
            FROM feat f JOIN top t ON f.doc_id = t.doc_id)
        SELECT *,
               ok_word_count AND ok_mean_word_len AND ok_alpha
                   AND ok_stopwords AND ok_top_word AND ok_no_blocklist
                   AS pass_gopher
        FROM flagged
        ORDER BY doc_id
    """,
}
