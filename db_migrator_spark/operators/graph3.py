"""Synchronous label propagation — community detection (round 8).

The reference has no graph operators (its data path is a 1:1 table
copy, /root/reference/src/migrate/table_migrator.rs:43-114); this
completes the engine's graph family (connected components, PageRank,
triangles, k-core) with the canonical community-detection workload
(Raghavan et al. 2007), made deterministic: labels start as node ids
and every round EVERY node simultaneously adopts its neighborhood's
majority label with the fixed tie-break (highest count, then lowest
label). Fixed ``LPROP_ROUNDS`` synchronous rounds — the same
"operator = R rounds" semantics as ``graph_kcore`` and
``graph_pagerank``, exactly reproducible by the unrolled-CTE twin
whether or not the labeling has converged.

Scale notes (100 TB): per round, one join of the arc list against the
|V|-row label relation (keyed shuffle) and one map-side-combined
(node, label) count — the PageRank plan family; ``localCheckpoint``
truncates lineage per round. The sparsified co-purchase graph (same
build as ``graph_kcore``) keeps the arc list linear in lineitem.
Everything is integer; no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..io import load_table
from .graph2 import KCORE_MIN_COOC

LPROP_ROUNDS = 3
# Lineage-truncation cadence: the graph_pagerank result reproduces here
# — an eager per-round localCheckpoint LOSES at the 3-round horizon
# (A/B at sf0.1: 3.75s vs 3.24s min-of-3), so checkpoint only every
# LPROP_CKPT_EVERY rounds; a long-horizon propagation (tens of rounds)
# flips the trade and gets truncation automatically.
LPROP_CKPT_EVERY = 8


def _sparse_arcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric arc list of the sparsified co-purchase graph (pairs
    co-occurring in >= KCORE_MIN_COOC orders — graph_kcore's semantics).

    Built on graph2._copair_explode (round 9): the row-local C(k,2)
    pair explode replaces the lineitem self-join — A/B and the
    multiset-equality argument live on that helper. Benefits all seven
    _sparse_arcs consumers (label propagation, modularity, link
    prediction, assortativity, clustering coefficient, resource
    allocation, BFS)."""
    from .graph2 import _copair_explode

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    und = (
        _copair_explode(li)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= KCORE_MIN_COOC)
        .select("u", "v")
    )
    return und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _lprop_labels(arcs: DataFrame) -> DataFrame:
    """Final (u, lbl) relation after ``LPROP_ROUNDS`` synchronous
    majority rounds (the loop both graph_label_propagation and
    graph_modularity share)."""
    labels = arcs.select("u").distinct().select(
        "u", F.col("u").alias("lbl")
    )
    for it in range(LPROP_ROUNDS):
        nb = arcs.join(
            labels.select(F.col("u").alias("v"), "lbl"), "v"
        ).select("u", "lbl")
        # Majority pick as a two-level aggregation (round 14, guide
        # §2.3 aggregate-before-shuffle): min over (-cnt, lbl) structs
        # is exactly the row_number(ORDER BY cnt DESC, lbl) == 1 pick
        # (highest count, ties to the lowest label — labels are
        # non-negative part keys, so the negation is safe), but both
        # levels are hash aggregates with map-side partial aggregation
        # — the per-round window's sort and its full (u, lbl, cnt) row
        # shuffle are gone.
        labels = (
            nb.groupBy("u", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("u")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("lbl"))
                ).alias("m")
            )
            .select("u", F.col("m.lbl").alias("lbl"))
        )
        if (it + 1) % LPROP_CKPT_EVERY == 0 and it + 1 < LPROP_ROUNDS:
            labels = labels.localCheckpoint()
    return labels


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community label per node after ``LPROP_ROUNDS`` synchronous
    majority rounds, with each community's final size — most-populous
    communities first."""
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    # A final-labels localCheckpoint for the two consumers (sizes + the
    # join) was A/B'd and REVERTED (round 12c: 3.21 vs 3.13s — parity;
    # the identical sub-plans already dedupe at runtime, unlike the
    # quantile-action + rank-side consumers in the checkpointed rank
    # queries, which are NOT identical plans).
    labels = _lprop_labels(arcs)
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return (
        labels.join(sizes, "lbl")
        .select(
            F.col("u").alias("part_key"),
            F.col("lbl").alias("community"),
            "community_size",
        )
        .orderBy(F.desc("community_size"), "community", "part_key")
    )


def _lprop_oracle() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, LPROP_ROUNDS + 1):
        rounds.append(
            f"""l{r} AS MATERIALIZED (
                SELECT u, lbl
                FROM (SELECT c.u, c.lbl,
                             ROW_NUMBER() OVER (
                                 PARTITION BY c.u
                                 ORDER BY c.cnt DESC, c.lbl) AS rn
                      FROM (SELECT a.u, p.lbl, COUNT(*) AS cnt
                            FROM arcs a
                            JOIN {prev} p ON p.u = a.v
                            GROUP BY a.u, p.lbl) c)
                WHERE rn = 1)"""
        )
        prev = f"l{r}"
    joined = ",\n        ".join(rounds)
    return f"""
        WITH und AS MATERIALIZED (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {KCORE_MIN_COOC}),
        arcs AS MATERIALIZED (
            SELECT u, v FROM und
            UNION ALL
            SELECT v AS u, u AS v FROM und),
        l0 AS (SELECT DISTINCT u, u AS lbl FROM arcs),
        {joined},
        sizes AS (
            SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
            FROM {prev} GROUP BY lbl)
        SELECT l.u AS part_key, l.lbl AS community, s.community_size
        FROM {prev} l JOIN sizes s ON s.lbl = l.lbl
        ORDER BY s.community_size DESC, community, part_key
    """


# Link prediction: wedge CENTERS above this degree are excluded from
# common-neighbor generation. Two reasons, both standard: (a) compute —
# sub-cap centers bound the candidate-pair relation at n*cap^2/2
# structurally (the same "last reducer" argument as the triangle
# orientation trick, here as a cap because link prediction needs ALL
# common-neighbor pairs, not just closed ones, so orientation cannot
# prune); (b) signal — a hub that neighbors everything certifies no
# affinity between two of its spokes (the Adamic-Adar 1/log(deg)
# intuition taken to its limit). The statistic is therefore the
# HUB-FILTERED Jaccard: cn counts sub-cap common neighbors while the
# union denominator keeps FULL degrees — deterministic, documented,
# reproduced exactly by the twin.
LINKPRED_HUB_CAP = 32
LINKPRED_TOP_K = 100


def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K predicted links on the sparsified co-purchase graph:
    non-adjacent part pairs ranked by hub-filtered Jaccard overlap
    (module constant doc). Output: part pair, sub-cap common-neighbor
    count, both full degrees, jaccard_micro = cn * 1e6 div
    (deg_a + deg_b - cn); ties broken by (a, b) for determinism.

    Plan: degrees (one map-side-combined agg), wedge generation keyed
    by the sub-cap center (bounded fan-out), one anti-join against the
    edge set to drop existing links, two degree joins, TakeOrdered for
    the top-K — no global sort, no collect.
    """
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    deg = arcs.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    centers = deg.filter(F.col("deg") <= LINKPRED_HUB_CAP).select("u")
    capped = arcs.join(centers, "u", "left_semi")
    # Common-neighbor pairs generated ROW-LOCALLY from each sub-cap
    # center's sorted neighbor list (round 14 — the same rewrite the
    # triangle wedge stage got, guide §2.3/§2.4): one groupBy collects
    # <= LINKPRED_HUB_CAP neighbors per center and the C(k,2) explode
    # runs inside codegen, each unordered pair emitted once per shared
    # center — replacing the wa-join-wb self-join that shuffled the
    # capped arc list twice and emitted k^2 ordered pairs per center
    # before filtering half away. Neighbors are distinct within a
    # center (the arc list is distinct pairs), so strictly-later
    # slicing over the sorted list is exactly the join's a < b pair
    # multiset.
    nbrs = capped.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("ns")
    )
    pairs = (
        nbrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    und = arcs.filter(F.col("u") < F.col("v"))
    cand = pairs.join(
        und,
        (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
        "left_anti",
    )
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            "deg_a",
            "deg_b",
            F.expr(
                "cn * 1000000 div (deg_a + deg_b - cn)"
            ).alias("jaccard_micro"),
        )
        .orderBy(F.desc("jaccard_micro"), "a", "b")
        .limit(LINKPRED_TOP_K)
    )


def _linkpred_oracle() -> str:
    return f"""
        WITH und AS MATERIALIZED (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {KCORE_MIN_COOC}),
        arcs AS MATERIALIZED (
            SELECT u, v FROM und
            UNION ALL
            SELECT v AS u, u AS v FROM und),
        deg AS MATERIALIZED (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            FROM arcs GROUP BY u),
        capped AS MATERIALIZED (
            SELECT a.u, a.v FROM arcs a
            JOIN deg d ON d.u = a.u
            WHERE d.deg <= {LINKPRED_HUB_CAP}),
        pairs AS MATERIALIZED (
            SELECT wa.v AS a, wb.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
            FROM capped wa JOIN capped wb ON wb.u = wa.u
            WHERE wa.v < wb.v
            GROUP BY 1, 2),
        cand AS (
            SELECT p.* FROM pairs p
            WHERE NOT EXISTS (
                SELECT 1 FROM und e WHERE e.u = p.a AND e.v = p.b))
        SELECT c.a, c.b, c.cn, da.deg AS deg_a, db.deg AS deg_b,
               c.cn * 1000000 // (da.deg + db.deg - c.cn) AS jaccard_micro
        FROM cand c
        JOIN deg da ON da.u = c.a
        JOIN deg db ON db.u = c.b
        ORDER BY jaccard_micro DESC, c.a, c.b
        LIMIT {LINKPRED_TOP_K}
    """


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities, EXACT:
    with ac = |arcs| (= 2m) and per community c its intra-arc count
    ia_c (= 2*e_c) and degree sum d_c, the contribution
    e_c/m - (d_c/2m)^2 scaled by 4m^2 is the INTEGER ac*ia_c - d_c^2
    (4m*e_c = ac*ia_c exactly), so per-community and total Q surface
    in micros via one truncating div by ac^2 — the quality score that
    tells you whether the propagation found real structure (Q > 0) or
    noise. Output: per community n_nodes / intra_arcs / degree_sum /
    q_contrib_micro, plus the total row (community = -1) whose
    q_contrib_micro IS the graph's modularity in micros.

    Scale notes (100 TB): two label joins of the arc list (the same
    keyed-shuffle shape as one propagation round), one community
    aggregate, one broadcast of the one-row (ac) scalar. Everything
    integer; contributions bounded by ac^2 * 1e6 in DECIMAL(38,0).
    """
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    labels = _lprop_labels(arcs)
    ac_df = arcs.agg(F.count(F.lit(1)).cast("bigint").alias("ac"))
    lu = labels.select(F.col("u"), F.col("lbl").alias("lbl_u"))
    lv = labels.select(F.col("u").alias("v"), F.col("lbl").alias("lbl_v"))
    intra = (
        arcs.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("lbl_u") == F.col("lbl_v"))
        .groupBy(F.col("lbl_u").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_arcs"))
    )
    deg = arcs.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    dsum = (
        deg.join(labels, "u")
        .groupBy(F.col("lbl").alias("community"))
        .agg(
            F.sum("deg").cast("bigint").alias("degree_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        )
    )
    per = (
        dsum.join(intra, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("intra_arcs"), F.lit(0)).alias("intra_arcs"),
            "degree_sum",
        )
        .crossJoin(F.broadcast(ac_df))
    )
    contrib = (
        "CAST((CAST(ac AS DECIMAL(38,0)) * intra_arcs"
        " - CAST(degree_sum AS DECIMAL(38,0)) * degree_sum) * 1000000"
        " div (CAST(ac AS DECIMAL(38,0)) * ac) AS BIGINT)"
    )
    classes = per.select(
        "community",
        "n_nodes",
        "intra_arcs",
        "degree_sum",
        F.expr(contrib).alias("q_contrib_micro"),
    )
    total = (
        per.groupBy()
        .agg(
            F.sum("n_nodes").cast("bigint").alias("n_nodes"),
            F.sum("intra_arcs").cast("bigint").alias("intra_arcs"),
            F.sum("degree_sum").cast("bigint").alias("degree_sum"),
            F.sum(
                F.expr(
                    "CAST(ac AS DECIMAL(38,0)) * intra_arcs"
                    " - CAST(degree_sum AS DECIMAL(38,0)) * degree_sum"
                )
            ).alias("num"),
            F.max("ac").alias("ac"),
        )
        .select(
            F.lit(-1).cast("bigint").alias("community"),
            "n_nodes",
            "intra_arcs",
            "degree_sum",
            F.expr(
                "CAST(num * 1000000 div (CAST(ac AS DECIMAL(38,0)) * ac)"
                " AS BIGINT)"
            ).alias("q_contrib_micro"),
        )
    )
    return classes.unionByName(total).orderBy("community")


def _modularity_oracle() -> str:
    return f"""
        SELECT * FROM (
        WITH lp AS MATERIALIZED (
            {_lprop_oracle().replace(chr(10), chr(10) + '    ')}
        ),
        arcs2 AS MATERIALIZED (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {KCORE_MIN_COOC}),
        arcs AS MATERIALIZED (
            SELECT u, v FROM arcs2
            UNION ALL
            SELECT v AS u, u AS v FROM arcs2),
        ac_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS ac FROM arcs),
        intra AS (
            SELECT lu.community AS community,
                   CAST(COUNT(*) AS BIGINT) AS intra_arcs
            FROM arcs a
            JOIN lp lu ON lu.part_key = a.u
            JOIN lp lv ON lv.part_key = a.v
            WHERE lu.community = lv.community
            GROUP BY 1),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            FROM arcs GROUP BY u),
        dsum AS (
            SELECT l.community,
                   CAST(SUM(d.deg) AS BIGINT) AS degree_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM deg d JOIN lp l ON l.part_key = d.u
            GROUP BY 1),
        per AS (
            SELECT s.community, s.n_nodes,
                   CAST(COALESCE(i.intra_arcs, 0) AS BIGINT) AS intra_arcs,
                   s.degree_sum, ac_t.ac
            FROM dsum s
            LEFT JOIN intra i ON i.community = s.community, ac_t)
        -- Modularity contributions CAN be negative (deg^2 > ac*intra);
        -- negative ``//`` drifts across DuckDB versions (1.0 truncates,
        -- later floor) while Spark's div truncates — divide magnitudes
        -- and reapply the sign (r14 floordiv_probe).
        SELECT community, n_nodes, intra_arcs, degree_sum,
               CASE WHEN CAST(ac AS HUGEINT) * intra_arcs
                         - CAST(degree_sum AS HUGEINT) * degree_sum < 0
                    THEN CAST(-(((CAST(degree_sum AS HUGEINT) * degree_sum
                                  - CAST(ac AS HUGEINT) * intra_arcs)
                                 * 1000000)
                                // (CAST(ac AS HUGEINT) * ac)) AS BIGINT)
                    ELSE CAST(((CAST(ac AS HUGEINT) * intra_arcs
                                - CAST(degree_sum AS HUGEINT) * degree_sum)
                               * 1000000)
                              // (CAST(ac AS HUGEINT) * ac) AS BIGINT)
               END AS q_contrib_micro
        FROM per
        UNION ALL
        SELECT -1, CAST(SUM(n_nodes) AS BIGINT),
               CAST(SUM(intra_arcs) AS BIGINT),
               CAST(SUM(degree_sum) AS BIGINT),
               CASE WHEN SUM(CAST(ac AS HUGEINT) * intra_arcs
                             - CAST(degree_sum AS HUGEINT) * degree_sum) < 0
                    THEN CAST(-((-SUM(CAST(ac AS HUGEINT) * intra_arcs
                                      - CAST(degree_sum AS HUGEINT)
                                        * degree_sum) * 1000000)
                                // (CAST(MAX(ac) AS HUGEINT) * MAX(ac)))
                              AS BIGINT)
                    ELSE CAST((SUM(CAST(ac AS HUGEINT) * intra_arcs
                                   - CAST(degree_sum AS HUGEINT)
                                     * degree_sum) * 1000000)
                              // (CAST(MAX(ac) AS HUGEINT) * MAX(ac))
                              AS BIGINT)
               END
        FROM per
        ) ORDER BY community
    """


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the co-purchase graph, EXACT.

    Pearson correlation of endpoint degrees over the symmetric arc
    list. Because the arc list contains both directions, the source
    and target degree distributions are identical (Sx = Sy,
    Sxx = Syy), so the usual sqrt denominator collapses and
    r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2) is a RATIO OF INTEGERS —
    surfaced in signed micros on the decimal `div` contract, no
    floating point anywhere.

    Plan: one degree aggregate, two keyed joins of the arc list
    against the |V|-row degree relation (the PageRank shuffle shape),
    one five-sum fold to a single row. DECIMAL(38,0)/HUGEINT promotion
    because M*Sxy*1e6 passes 2^63 well before fixture scale.

    arcs is checkpointed like every other _sparse_arcs consumer
    (round 13): its two consumers (degree aggregate, xy join side)
    have DIFFERING plans, so exchange reuse does not apply — the
    SCALE.md case-3 shape. A/B at sf0.1: 2.09 -> 1.94s, new <= old
    3/3 pairs.

    Round 14 (guide §2.3 — shuffle fewer bytes / aggregate first):
    because the arc list is symmetric, every per-arc source-degree
    moment is a pure DEGREE-relation aggregate — each node u sources
    exactly deg(u) arcs, so M = Σ deg, Sx = Σ deg², Sxx = Σ deg³ —
    and only Sxy needs the arc list at all:
    Sxy = Σ_u deg(u) · Σ_{v∈N(u)} deg(v). The previous shape joined
    the arc list against deg TWICE and folded decimals over |arcs|
    rows; now ONE arcs⋈deg join (+ a map-side-combined groupBy back
    to |V| rows) computes the neighbor-degree sums, every other
    moment folds over the |V|-row degree relation, and the final
    Sxy fold is |V|-sized too. Values are identical integers — same
    oracle, same hash.
    """
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    # deg has three consumers (nbr join side, the moment fold, the Sxy
    # join) but recomputes from the CHECKPOINTED arcs — one cheap
    # aggregate per consumer; an eager deg checkpoint A/B'd WORSE (the
    # barrier job outweighs the re-aggregation, SCALE.md case 3 does
    # not apply because the lineage below deg is already truncated).
    deg = arcs.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    dd = F.col("deg").cast("decimal(38,0)")
    # Per-node sum of neighbor degrees: the ONLY arc-sized operation.
    nbr = (
        arcs.join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("dv")), "v"
        )
        .groupBy("u")
        .agg(F.sum(F.col("dv").cast("decimal(38,0)")).alias("nbr_deg_sum"))
    )
    moments = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(dd).alias("m"),
        F.sum(dd * dd).alias("sx"),
        F.sum(dd * dd * dd).alias("sxx"),
    )
    sxy = deg.join(nbr, "u").agg(
        F.sum(dd * F.col("nbr_deg_sum")).alias("sxy")
    )
    return moments.crossJoin(F.broadcast(sxy)).select(
        "n_nodes",
        F.col("m").cast("bigint").alias("n_arcs"),
        F.expr(
            "CASE WHEN m * sxx - sx * sx = 0 THEN NULL"
            " ELSE CAST((m * sxy - sx * sx) * 1000000"
            " div (m * sxx - sx * sx) AS BIGINT) END"
        ).alias("assortativity_micro"),
    )


def _assortativity_oracle() -> str:
    return f"""
        WITH und AS MATERIALIZED (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {KCORE_MIN_COOC}),
        arcs AS MATERIALIZED (
            SELECT u, v FROM und
            UNION ALL
            SELECT v AS u, u AS v FROM und),
        deg AS MATERIALIZED (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            FROM arcs GROUP BY u),
        xy AS (
            SELECT CAST(du.deg AS HUGEINT) AS dx,
                   CAST(dv.deg AS HUGEINT) AS dy
            FROM arcs a
            JOIN deg du ON du.u = a.u
            JOIN deg dv ON dv.u = a.v),
        sums AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS m,
                   SUM(dx) AS sx,
                   SUM(dx * dx) AS sxx,
                   SUM(dx * dy) AS sxy
            FROM xy),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
        SELECT nn.n_nodes, CAST(sums.m AS BIGINT) AS n_arcs,
               CASE WHEN sums.m * sums.sxx - sums.sx * sums.sx = 0
                    THEN NULL
                    ELSE CAST((sums.m * sums.sxy - sums.sx * sums.sx)
                              * 1000000
                              // (sums.m * sums.sxx - sums.sx * sums.sx)
                              AS BIGINT) END AS assortativity_micro
        FROM sums, nn
    """


QUERIES = {
    "graph_label_propagation": graph_label_propagation,
    "graph_degree_assortativity": graph_degree_assortativity,
    "graph_jaccard_linkpred": graph_jaccard_linkpred,
    "graph_modularity": graph_modularity,
}
ORACLES = {
    "graph_label_propagation": _lprop_oracle(),
    "graph_degree_assortativity": _assortativity_oracle(),
    "graph_jaccard_linkpred": _linkpred_oracle(),
    "graph_modularity": _modularity_oracle(),
}
