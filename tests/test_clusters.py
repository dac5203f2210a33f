"""dedup_clusters correctness: distributed min-label propagation must equal
a driver-side union-find over the same edge set."""

SF = "/root/testdata/sf0.01"


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for node in parent:
        clusters.setdefault(find(node), set()).add(node)
    return {frozenset(m) for m in clusters.values()}


def test_clusters_equal_union_find(spark):
    from db_migrator_spark.operators.dedup import dedup_clusters, dedup_ngram_jaccard

    pairs = [(r.d1, r.d2) for r in dedup_ngram_jaccard(spark, SF).collect()]
    want = union_find(pairs)
    rows = dedup_clusters(spark, SF).collect()
    # members is a sorted CSV string (driver-canonicalizer-safe form)
    parsed = [(r.cluster_id, [int(x) for x in r.members.split(",")], r.size) for r in rows]
    got = {frozenset(m) for _, m, _ in parsed}
    assert got == want
    # cluster_id is the minimum member (canonical doc); members sorted
    for cid, members, size in parsed:
        assert cid == min(members)
        assert size == len(members)
        assert members == sorted(members)
