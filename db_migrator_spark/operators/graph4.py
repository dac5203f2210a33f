"""Local clustering and rational link prediction (round 8c).

The reference has no graph operators (its data path is a 1:1 table
copy, /root/reference/src/migrate/table_migrator.rs:43-114); these
extend the graph family (PageRank, triangles, k-core, label
propagation, modularity, assortativity, Jaccard link prediction) with
the two canonical per-node/per-pair structure scores, both exact:

- ``graph_clustering_coefficient``: per-node local clustering
  coefficient on the SPARSIFIED co-purchase graph (graph_kcore's
  build — pairs co-occurring in >= KCORE_MIN_COOC orders): cc_ppm =
  2 * tri * 1e6 div (deg * (deg - 1)) for deg >= 2 nodes, triangles
  counted once per node via the degree-ordered orientation trick
  (graph2 module doc — O(sqrt(m)) wedges per apex, structural skew
  bound). A final global row (node = -1) carries the graph
  TRANSITIVITY: 3 * triangles / wedges in ppm — the whole-graph
  clustering summary on the same exact arithmetic.
- ``graph_resource_allocation``: top-K non-adjacent pairs by the
  Resource-Allocation index RA(a,b) = sum over common neighbors w of
  1/deg(w) — the standard link-prediction score whose terms are
  RATIONAL (unlike Adamic-Adar's 1/log deg, which would need
  irrational constants in-plan). Each term surfaces as 1e6 div
  deg(w) with per-term truncation — the documented cross-engine
  contract — then sums exactly. Hub-filtered like
  ``graph3.graph_jaccard_linkpred`` (centers capped at
  LINKPRED_HUB_CAP) so the candidate-pair relation is bounded by
  n * cap^2 / 2 regardless of the degree distribution.

Scale notes (100 TB): both ride the sparsified graph (THINS with
corpus growth — graph2 module doc). Clustering: one orientation pass,
then row-local wedge generation + the adaptive closing-edge probe
shared with graph_triangle_counts (graph2._oriented_triangle_credits,
round 14), explode(3) + map-side-combined counts; degrees join back
broadcast-sized. RA: wedge generation keyed by
sub-cap centers (bounded fan-out), one anti-join against the edge
set, TakeOrdered for the top-K — no global sort, no collect, no
cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph3 import (
    LINKPRED_HUB_CAP,
    LINKPRED_TOP_K,
    _sparse_arcs,
)
from .graph2 import KCORE_MIN_COOC, _oriented_triangle_credits


def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-node local clustering coefficient (exact ppm) on the
    sparsified co-purchase graph, plus the global transitivity row
    (node = -1, module doc)."""
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    edges = arcs.filter(F.col("u") < F.col("v"))
    deg = arcs.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    ).withColumnRenamed("u", "node")
    # Degree-ordered orientation (graph2's trick): every triangle has
    # exactly one apex; wedge fan-out per apex is O(sqrt(m)).
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    ranked = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias(
            "deg_dst"
        ),
    ).localCheckpoint()
    # Row-local wedge generation + adaptive closing probe shared with
    # graph_triangle_counts (round 14 — see _oriented_triangle_credits;
    # this op previously carried its own e1⋈e2 wedge self-join and an
    # unpacked (x, y) closing join).
    per_node = _oriented_triangle_credits(oriented).select(
        "node", F.col("tri_count").cast("bigint").alias("tri_count")
    )
    local = (
        deg.filter(F.col("degree") >= 2)
        .join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("tri_count", F.lit(0))
            .cast("bigint")
            .alias("tri_count"),
        )
        .select(
            "*",
            F.expr(
                "CAST(2 * tri_count * 1000000"
                " div (degree * (degree - 1)) AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )
    # Global transitivity: 3T / wedge count, from the SAME exact
    # counts (sum tri_count = 3T; wedges = sum deg*(deg-1)/2).
    glob = (
        local.agg(
            F.sum(F.expr("degree * (degree - 1) div 2"))
            .cast("bigint")
            .alias("wedges"),
            F.sum("tri_count").cast("bigint").alias("tri3"),
        )
        .select(
            F.lit(-1).cast("bigint").alias("node"),
            F.lit(0).cast("bigint").alias("degree"),
            F.expr("tri3 div 3").cast("bigint").alias("tri_count"),
            F.expr(
                "CAST(CASE WHEN wedges = 0 THEN 0"
                " ELSE tri3 * 1000000 div wedges END AS BIGINT)"
            ).alias("cc_ppm"),
        )
    )
    return local.unionByName(glob).orderBy("node")


def graph_resource_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-K predicted links by the Resource-Allocation index (exact
    micro, per-term truncating div — module doc). Output: part pair,
    sub-cap common-neighbor count, ra_micro; ties break by (a, b)."""
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    deg = arcs.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    centers = deg.filter(F.col("deg") <= LINKPRED_HUB_CAP)
    capped = arcs.join(centers, "u", "left_semi").join(
        deg, "u"
    )  # carry deg(w) for the 1/deg term
    # Row-local C(k,2) from each sub-cap center's sorted neighbor list
    # (round 14, same rewrite as graph_jaccard_linkpred / the triangle
    # wedges, guide §2.3/§2.4): the per-center 1000000 div deg(w) term
    # is constant across the center's pairs, so it rides along the
    # grouped row and each emitted pair contributes exactly one cn and
    # one RA term — identical to the wa-join-wb multiset.
    nbrs = capped.groupBy("u", "deg").agg(
        F.sort_array(F.collect_list("v")).alias("ns")
    )
    pairs = (
        nbrs.select(
            F.expr("1000000 div deg").alias("ra_term"),
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "ra_term")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum("ra_term").cast("bigint").alias("ra_micro"),
        )
    )
    und = arcs.filter(F.col("u") < F.col("v"))
    cand = pairs.join(
        und,
        (pairs["a"] == und["u"]) & (pairs["b"] == und["v"]),
        "left_anti",
    )
    return cand.orderBy(F.desc("ra_micro"), "a", "b").limit(
        LINKPRED_TOP_K
    )


QUERIES = {
    "graph_clustering_coefficient": graph_clustering_coefficient,
    "graph_resource_allocation": graph_resource_allocation,
}


def _cc_oracle() -> str:
    # Plain p1 < p2 triangle counting on the sparsified graph (it
    # THINS as sf grows — graph2 module doc — so the naive twin stays
    # cheap); temp-table staging per the graph2 precedent.
    return f"""
        CREATE OR REPLACE TEMP TABLE cc_und AS
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {KCORE_MIN_COOC};
        CREATE OR REPLACE TEMP TABLE cc_deg AS
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT u AS node FROM cc_und
                  UNION ALL SELECT v FROM cc_und)
            GROUP BY node;
        CREATE OR REPLACE TEMP TABLE cc_tri AS
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM cc_und e1
            JOIN cc_und e2 ON e2.u = e1.v
            JOIN cc_und e3 ON e3.u = e1.u AND e3.v = e2.v;
        CREATE OR REPLACE TEMP TABLE cc_pn AS
            SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_count
            FROM (SELECT a AS node FROM cc_tri
                  UNION ALL SELECT b FROM cc_tri
                  UNION ALL SELECT c FROM cc_tri)
            GROUP BY node;
        WITH local_cc AS (
            SELECT d.node, d.degree,
                   COALESCE(p.tri_count, 0) AS tri_count,
                   CAST(2 * COALESCE(p.tri_count, 0) * 1000000
                        // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_ppm
            FROM cc_deg d LEFT JOIN cc_pn p ON p.node = d.node
            WHERE d.degree >= 2),
        gsum AS (
            SELECT CAST(-1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS degree,
                   CAST(SUM(tri_count) // 3 AS BIGINT) AS tri_count,
                   CAST(CASE WHEN SUM(degree * (degree - 1) // 2) = 0 THEN 0
                        ELSE SUM(tri_count) * 1000000
                             // SUM(degree * (degree - 1) // 2) END
                        AS BIGINT) AS cc_ppm
            FROM local_cc)
        SELECT * FROM local_cc
        UNION ALL SELECT * FROM gsum
        ORDER BY node
    """


def _ra_oracle() -> str:
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
            SELECT a.u, a.v, d.deg FROM arcs a
            JOIN deg d ON d.u = a.u
            WHERE d.deg <= {LINKPRED_HUB_CAP}),
        pairs AS MATERIALIZED (
            SELECT wa.v AS a, wb.v AS b,
                   CAST(COUNT(*) AS BIGINT) AS cn,
                   CAST(SUM(1000000 // wa.deg) AS BIGINT) AS ra_micro
            FROM capped wa JOIN capped wb ON wb.u = wa.u
            WHERE wa.v < wb.v
            GROUP BY 1, 2),
        cand AS (
            SELECT p.* FROM pairs p
            WHERE NOT EXISTS (
                SELECT 1 FROM und e WHERE e.u = p.a AND e.v = p.b))
        SELECT a, b, cn, ra_micro
        FROM cand
        ORDER BY ra_micro DESC, a, b
        LIMIT {LINKPRED_TOP_K}
    """


ORACLES = {
    "graph_clustering_coefficient": _cc_oracle(),
    "graph_resource_allocation": _ra_oracle(),
}


# Multi-source BFS: distances from the BFS_N_SEEDS lowest-id nodes,
# expanded BFS_ROUNDS rounds — the traversal primitive the graph
# family lacked (PageRank/label-prop/k-core are all value iterations;
# this one is frontier expansion). Fixed rounds, so the surface is the
# exact radius-R distance table (the PageRank fixed-round contract).
BFS_N_SEEDS = 10
BFS_ROUNDS = 4


def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-seed BFS distances (<= BFS_ROUNDS hops) from the
    lowest-id seeds over the sparsified co-purchase graph (module
    comment). One arcs-keyed join + min-combine per round, frontier
    localCheckpointed (the iterate feeds both the union and the next
    expansion — the 2^rounds lineage lesson)."""
    arcs = _sparse_arcs(spark, sf_dir).localCheckpoint()
    seeds = (
        arcs.select("u")
        .distinct()
        .orderBy("u")
        .limit(BFS_N_SEEDS)
        .select(F.col("u").alias("seed"))
    )
    dist = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).alias("dist")
    ).localCheckpoint()
    for _ in range(BFS_ROUNDS):
        hop = (
            dist.join(arcs, dist["node"] == arcs["u"])
            .select("seed", F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select(
        "seed", "node", F.col("dist").cast("bigint").alias("dist")
    ).orderBy("seed", "node")


QUERIES["graph_bfs_distances"] = graph_bfs_distances


def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality of the BFS seeds within the BFS_ROUNDS-hop
    horizon: H(s) = sum over reached nodes of 1/dist, surfaced as the
    exact integer sum of 1000000 div dist (each term a pinned rational
    — dist is a small integer, so the per-term truncation is the
    whole cross-engine contract; round 11b). The standard
    centrality that stays defined on DISCONNECTED graphs (unreachable
    nodes contribute zero instead of an infinite distance), which is
    why it is the production pick over closeness. Rides the existing
    bounded-round BFS (one arcs-keyed shuffle per round); the rollup
    is one seeds-sized aggregate."""
    d = graph_bfs_distances(spark, sf_dir)
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.sum(F.expr("1000000 div dist")).cast("bigint").alias(
                "harmonic_micro"
            ),
        )
        .orderBy("seed")
    )


QUERIES["graph_harmonic_centrality"] = graph_harmonic_centrality


def _bfs_oracle() -> str:
    stmts = [
        f"""
        CREATE OR REPLACE TEMP TABLE bfs_und AS
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {KCORE_MIN_COOC};
        CREATE OR REPLACE TEMP TABLE bfs_arcs AS
            SELECT u, v FROM bfs_und
            UNION ALL SELECT v, u FROM bfs_und;
        CREATE OR REPLACE TEMP TABLE bfs_dist AS
            SELECT u AS seed, u AS node, 0 AS dist
            FROM (SELECT DISTINCT u FROM bfs_arcs ORDER BY u
                  LIMIT {BFS_N_SEEDS});
        """
    ]
    for _ in range(BFS_ROUNDS):
        stmts.append(
            """
        CREATE OR REPLACE TEMP TABLE bfs_dist AS
            SELECT seed, node, MIN(dist) AS dist FROM (
                SELECT seed, node, dist FROM bfs_dist
                UNION ALL
                SELECT d.seed, a.v AS node, d.dist + 1
                FROM bfs_dist d JOIN bfs_arcs a ON a.u = d.node)
            GROUP BY seed, node;
        """
        )
    return ";".join(stmts)


ORACLES["graph_bfs_distances"] = _bfs_oracle() + """;
        SELECT seed, node, CAST(dist AS BIGINT) AS dist
        FROM bfs_dist
        ORDER BY seed, node
        """

ORACLES["graph_harmonic_centrality"] = _bfs_oracle() + """;
        SELECT seed,
               CAST(COUNT(*) AS BIGINT) AS n_reached,
               CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro
        FROM bfs_dist
        WHERE dist > 0
        GROUP BY seed
        ORDER BY seed
        """
