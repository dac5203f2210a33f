"""Semantic check for graph_hits: the L-infinity-normalized integer
HITS fixed point recomputed in plain Python from the fixture edge list
(sf0.001 so collects stay tiny)."""

from collections import defaultdict

from db_migrator_spark.io import load_table

SF0 = "/root/testdata/sf0.001"


def test_hits_matches_python(spark):
    from db_migrator_spark.operators.graph5 import (
        HITS_ITERATIONS,
        HITS_UNIT,
        graph_hits,
    )

    li = load_table(spark, SF0, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, SF0, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = {
        (r.o_custkey, r.l_suppkey)
        for r in li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).collect()
    }
    out_s = defaultdict(dict)  # customers' out-neighbors etc.
    in_s = defaultdict(dict)
    for c, s in edges:
        out_s[c][s] = True
        in_s[s][c] = True

    hub = {c: HITS_UNIT for c in out_s}
    auth = {}
    for _ in range(HITS_ITERATIONS):
        auth = {s: sum(hub[c] for c in in_s[s]) for s in in_s}
        mx = max(auth.values())
        auth = {s: a * HITS_UNIT // mx for s, a in auth.items()}
        hub = {c: sum(auth[s] for s in out_s[c]) for c in out_s}
        mx = max(hub.values())
        hub = {c: h * HITS_UNIT // mx for c, h in hub.items()}

    got = graph_hits(spark, SF0).collect()
    gh = {r.node_key: r.score_micro for r in got if r.node_side == "hub_customer"}
    ga = {r.node_key: r.score_micro for r in got if r.node_side == "auth_supplier"}
    assert gh == hub
    assert ga == auth
    # normalization invariant: each side's max is exactly the unit
    assert max(gh.values()) == HITS_UNIT
    assert max(ga.values()) == HITS_UNIT
    # output is sorted by score desc
    scores = [r.score_micro for r in got]
    assert scores == sorted(scores, reverse=True)
