"""Iterative graph algorithms as DataFrame loops.

The reference has no graph operators (its whole data path is a 1:1 table
copy, /root/reference/src/migrate/table_migrator.rs:43-114); this module
extends the engine's iterative-algorithm family (so far: connected
components in ``dedup.dedup_clusters``) with PageRank — the canonical
"propagate, aggregate, repeat" workload.

Determinism contract: ranks live in integer micro-units (BIGINT, 1e6 =
rank 1.0) and every step is integer arithmetic — contribution is
truncating integer division ``rank div degree``, damping is
``(85 * sum) div 100`` — so the fixed-point after K iterations is
bit-identical in any engine and independent of aggregation order. The
float formulation would be order-dependent under a parallel sum. The
DuckDB twin unrolls the same K iterations as a CTE chain with ``//``.

Scale notes (100 TB): each iteration is one shuffle — contributions are
keyed by destination and map-side combined; the rank vector (2 longs per
node) re-partitions by node_id once and the edge list joins it on the
source key. ``localCheckpoint`` truncates rank lineage every
``PR_CKPT_EVERY`` iterations — the ``dedup_clusters`` pattern, measured
a net loss at the 3-iteration horizon (on a real cluster, checkpoint to
reliable storage instead). Hub skew (a node with millions of in-edges) is a
map-side-combinable SUM — partial aggregation absorbs it; out-degree
fan-out is a join on the source key that AQE skew-splits. Integer
micro-unit sums stay under 2^63 up to ~9e12 nodes; past ~2^53 the
DOUBLE-based oracle comparison (not the Spark side) would need decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

PR_ITERATIONS = 3
PR_CKPT_EVERY = 8  # truncate rank lineage every N iterations (see loop)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
PR_UNIT = 1_000_000  # micro-units per 1.0 of rank
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_UNIT // PR_DAMP_DEN  # (1-d)·unit


def _order_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer—supplier bipartite graph from order history:
    one edge per distinct (o_custkey, l_suppkey) pair, emitted in both
    directions. Node ids interleave: customer k -> 2k, supplier k ->
    2k+1."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # Both directions come from ONE explode of the distinct pair set — a
    # unionAll of two selects re-evaluates the join+distinct subtree
    # twice (two BroadcastHashJoins + two Exchanges in the plan).
    both = F.array(
        F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
        F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
    )
    return pairs.select(F.explode(both).alias("e")).select("e.src", "e.dst")


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer—supplier order graph, ``PR_ITERATIONS``
    exact integer iterations at damping 0.85.

    rank_0 = 1.0 for every node;
    rank_{t+1}(v) = (1-d) + d · Σ_{u→v} (rank_t(u) div deg(u)),
    all in BIGINT micro-units with truncating division — deterministic
    and aggregation-order-free (see module docstring). Output: every
    node with its type, degree, and final integer rank, highest first.
    """
    # Round 14 negatives on pre-partitioning the static relations, both
    # plan-verified then A/B-REVERTED:
    # (a) repartition("src") before the eager localCheckpoint under AQE
    #     is a silent no-op — the checkpoint captures outputPartitioning
    #     from the AdaptiveSparkPlanExec wrapper, which reports Unknown,
    #     so every iteration re-exchanged the ExistingRDD anyway (22
    #     Exchanges before AND after) and the repartition was a pure
    #     extra shuffle in the checkpoint build.
    # (b) building repartition("src") + sortWithinPartitions("src") +
    #     localCheckpoint inside an AQE-OFF window DOES carry
    #     hashpartitioning+ordering into the LogicalRDD and collapses
    #     the plan to ONE exchange+sort per iteration (the contrib
    #     groupBy; plans/r14/graph_pagerank_after_rejected.txt: 22 -> 8
    #     Exchange mentions, all edges/degrees join sides exchange- and
    #     sort-free) — but it LOSES on wall time at fixture scale
    #     (interleaved fresh-JVM A/Bs: 4/4 pairs calm-box old {2.73,
    #     2.29, 2.49, 2.79} vs new {2.94, 2.91, 2.77, 3.91}, repeat
    #     run's settled pairs agree). Cause: with every side flowing
    #     through an exchange, AQE converts these joins to broadcast at
    #     runtime (|V| ranks is tiny locally), so the baseline never
    #     shuffles the edge payload either — the "saved" exchanges were
    #     already free, and pinning the layout forces a SortMergeJoin
    #     merge walk where a broadcast hash probe ran before. On a
    #     cluster where |V| exceeds the broadcast cap the co-partitioned
    #     shape wins (it removes PR_ITERATIONS edge-sized exchanges);
    #     locally it is a measured regression on a benched query, so the
    #     AQE-decided plan stays.
    edges = _order_edges(spark, sf_dir).localCheckpoint()
    # degrees feeds every iteration's rebase join (PR_ITERATIONS
    # consumers): one eager materialization of |V| rows beats re-running
    # the edge aggregation per iteration (A/B at sf0.1: 3.1s -> 2.1s).
    degrees = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree")).localCheckpoint()
    )
    ranks = degrees.select(
        "src", "degree", F.lit(PR_UNIT).cast("bigint").alias("rank")
    )
    for it in range(PR_ITERATIONS):
        contrib = (
            edges.join(ranks, "src")
            .select("dst", F.expr("rank div degree").alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("inflow"))
        )
        ranks = (
            degrees.join(contrib, degrees.src == contrib.dst, "left")
            .select(
                "src",
                "degree",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(inflow, 0L)) div {PR_DAMP_DEN}"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
        # Lineage-truncation cadence: an eager localCheckpoint per
        # iteration was A/B'd at 3 iterations and LOST (3.8s vs 2.5s at
        # sf0.1 — three barrier jobs for a lineage Catalyst handles
        # easily). A long-horizon PageRank (tens of iterations) needs
        # periodic truncation or the plan growth dominates — checkpoint
        # every CKPT_EVERY rounds, same pattern as dedup_clusters.
        if (it + 1) % PR_CKPT_EVERY == 0 and it + 1 < PR_ITERATIONS:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("src").alias("node_id"),
        F.when(F.col("src") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        "degree",
        F.col("rank").alias("rank_micro"),
    ).orderBy(F.desc("rank_micro"), "node_id")


QUERIES = {"graph_pagerank": graph_pagerank}

_EDGE_SQL = """
        pairs AS (
            SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        edges AS (
            SELECT c AS src, s AS dst FROM pairs
            UNION ALL
            SELECT s AS src, c AS dst FROM pairs),
        deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
"""

_PR_STEP = """
        r{t} AS (
            SELECT d.src, d.degree,
                   {base} + ({num} * COALESCE(i.inflow, 0)) // {den} AS rank
            FROM deg d
            LEFT JOIN (SELECT e.dst, SUM(r.rank // r.degree) AS inflow
                       FROM edges e JOIN r{p} r ON e.src = r.src
                       GROUP BY e.dst) i
                ON d.src = i.dst)
"""

ORACLES = {
    "graph_pagerank": (
        "WITH "
        + _EDGE_SQL
        + f", r0 AS (SELECT src, degree, {PR_UNIT} AS rank FROM deg)"
        + "".join(
            ","
            + _PR_STEP.format(
                t=t, p=t - 1, base=PR_BASE, num=PR_DAMP_NUM, den=PR_DAMP_DEN
            )
            for t in range(1, PR_ITERATIONS + 1)
        )
        + f"""
        SELECT src AS node_id,
               CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END
                   AS node_type,
               degree,
               CAST(rank AS BIGINT) AS rank_micro
        FROM r{PR_ITERATIONS}
        ORDER BY rank_micro DESC, node_id
    """
    ),
}
