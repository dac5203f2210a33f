"""HITS hubs & authorities (round 11b, graph5).

The reference has no graph operators (1:1 table copier,
/root/reference/src/migrate/table_migrator.rs:43-114); this extends the
iterative-graph family (PageRank in graph.py, label propagation /
K-core in graph2.py, BFS/harmonic in graph4.py) with the second
classical power-iteration ranking: Kleinberg's HITS on the DIRECTED
customer -> supplier purchase graph (customers are hubs, suppliers are
authorities — the natural bipartite reading of "who buys broadly" /
"who is bought by the broad buyers").

Determinism contract: scores live in BIGINT micro-units and each
half-iteration renormalizes by the MAXIMUM score (the L-infinity norm
— exact under integers, unlike the textbook L2 norm whose sqrt is
irrational): score' = score * 1e6 div max(score). Truncating integer
division + aggregation-order-free SUM/MAX make the K-iteration fixed
point bit-identical on any engine; the DuckDB twin unrolls the same
half-steps as a CTE chain with ``//``.

Scale notes (100 TB): each half-iteration is ONE keyed shuffle (the
groupBy on the receiving side; hub skew is absorbed by map-side
combine) plus a broadcast of the 1-row max. Score relations are
ENTITY-GRAIN (one row per customer/supplier), so each normalized
relation is eagerly ``localCheckpoint``-ed per the entity-grain
checkpoint rule (docs/SCALE.md): the normalize step consumes its
input twice (max aggregate + rescale), which would otherwise double
plan lineage per HALF-iteration — 2^(2K) leaf scans by the end, the
round-8c nesting lesson. Six |V|-row materializations replace that.
On a real cluster checkpoint to reliable storage instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table

HITS_ITERATIONS = 3
HITS_UNIT = 1_000_000


def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer -> supplier edges: one per distinct pair."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )


def _renorm(df: DataFrame, col: str) -> DataFrame:
    """Rescale ``col`` to max = HITS_UNIT by exact truncating division
    (L-infinity normalization, module doc). Consumes ``df`` twice —
    callers checkpoint the result (entity-grain rule)."""
    mx = df.agg(F.max(col).alias("__mx"))
    return df.crossJoin(F.broadcast(mx)).select(
        *[c for c in df.columns if c != col],
        F.expr(f"CAST({col} * {HITS_UNIT} div __mx AS BIGINT)").alias(col),
    )


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the directed customer -> supplier purchase graph,
    ``HITS_ITERATIONS`` exact integer half-step pairs with L-infinity
    renormalization (module doc). Output: every node with its side and
    final micro-unit score, highest first."""
    edges = _purchase_edges(spark, sf_dir).localCheckpoint()
    hubs = (
        edges.select("c")
        .distinct()
        .select("c", F.lit(HITS_UNIT).cast("bigint").alias("h"))
    )
    auth = None
    for _ in range(HITS_ITERATIONS):
        araw = (
            edges.join(hubs, "c")
            .groupBy("s")
            .agg(F.sum("h").cast("bigint").alias("a"))
        )
        auth = _renorm(araw, "a").localCheckpoint()
        hraw = (
            edges.join(auth, "s")
            .groupBy("c")
            .agg(F.sum("a").cast("bigint").alias("h"))
        )
        hubs = _renorm(hraw, "h").localCheckpoint()
    out_h = hubs.select(
        F.col("c").alias("node_key"),
        F.lit("hub_customer").alias("node_side"),
        F.col("h").alias("score_micro"),
    )
    out_a = auth.select(
        F.col("s").alias("node_key"),
        F.lit("auth_supplier").alias("node_side"),
        F.col("a").alias("score_micro"),
    )
    return out_h.unionAll(out_a).orderBy(
        F.desc("score_micro"), "node_side", "node_key"
    )


QUERIES = {"graph_hits": graph_hits}


def _hits_oracle() -> str:
    steps = [
        """
        h0 AS MATERIALIZED (
            SELECT DISTINCT c, CAST(1000000 AS HUGEINT) AS h
            FROM edges)"""
    ]
    for t in range(1, HITS_ITERATIONS + 1):
        steps.append(f"""
        a{t}raw AS MATERIALIZED (
            SELECT e.s, CAST(SUM(h.h) AS HUGEINT) AS a
            FROM edges e JOIN h{t - 1} h ON h.c = e.c
            GROUP BY e.s),
        a{t} AS MATERIALIZED (
            SELECT s, a * 1000000 // (SELECT MAX(a) FROM a{t}raw) AS a
            FROM a{t}raw),
        h{t}raw AS MATERIALIZED (
            SELECT e.c, CAST(SUM(a.a) AS HUGEINT) AS h
            FROM edges e JOIN a{t} a ON a.s = e.s
            GROUP BY e.c),
        h{t} AS MATERIALIZED (
            SELECT c, h * 1000000 // (SELECT MAX(h) FROM h{t}raw) AS h
            FROM h{t}raw)""")
    k = HITS_ITERATIONS
    return (
        """
        WITH edges AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),"""
        + ",".join(steps)
        + f"""
        SELECT node_key, node_side, CAST(score_micro AS BIGINT)
                   AS score_micro
        FROM (
            SELECT c AS node_key, 'hub_customer' AS node_side,
                   h AS score_micro
            FROM h{k}
            UNION ALL
            SELECT s, 'auth_supplier', a FROM a{k})
        ORDER BY score_micro DESC, node_side, node_key
    """
    )


ORACLES = {"graph_hits": _hits_oracle()}
