"""Connected components (large-star/small-star) + dedup clustering."""

from pyspark.sql import functions as F

from nutch_spark.operators.dedup_text import (
    connected_components, dedup_clusters)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _check(spark, edges, nodes):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nd = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {r.id: r.cluster_id
           for r in connected_components(e, nodes=nd).collect()}
    assert got == _uf_components(edges, nodes)


def test_path_graph_worst_case_diameter(spark):
    # a 24-node path in descending-id order — the shape that defeats
    # naive min-propagation in O(diameter); large/small-star must
    # still collapse it (in O(log n) rounds)
    n = 24
    edges = [(i + 1, i) for i in range(n - 1)]
    _check(spark, edges, list(range(n)))


def test_stars_cycles_isolated(spark):
    edges = [(1, 2), (2, 3), (3, 1),          # triangle
             (10, 11), (10, 12), (10, 13),    # star centered high
             (20, 13),                        # bridge into the star
             (30, 31)]                        # pair
    nodes = list(range(40))                   # 0,4..9,14..19 isolated
    _check(spark, edges, nodes)


def test_duplicate_and_reversed_edges(spark):
    edges = [(5, 6), (6, 5), (5, 6), (7, 7), (6, 7)]
    _check(spark, edges, [5, 6, 7, 8])


def test_dedup_clusters_keeps_longest_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaaaaaaa"), (2, "bb"), (3, "cc"), (4, "cc")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (3, 4)], "id_a long, id_b long")
    out = {r.id: (r.cluster_id, r.keep)
           for r in dedup_clusters(docs, pairs).collect()}
    assert out == {0: (0, False), 1: (0, True),   # longest wins
                   2: (2, True),                  # singleton keeps
                   3: (3, True), 4: (3, False)}   # tie -> smallest id


def test_minhash_pairs_to_clusters_end_to_end(spark):
    """Near-dup pairs from the LSH operator feed clustering: three
    copies of one doc + an unrelated doc -> one 3-cluster, one kept."""
    from nutch_spark.operators.dedup_text import minhash_lsh
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [(0, base), (1, base + "extra tail"), (2, base),
         (3, "completely different words entirely unrelated " * 8)],
        "doc_id long, text string")
    pairs = minhash_lsh(docs, verify_threshold=0.5)
    out = dedup_clusters(docs, pairs)
    rows = {r.id: r for r in out.collect()}
    assert {rows[i].cluster_id for i in (0, 1, 2)} == {0}
    assert rows[3].cluster_id == 3
    assert sum(r.keep for r in rows.values()) == 2
    assert rows[1].keep  # longest of the dup cluster


def test_string_ids_url_keys(spark):
    # the reference DeduplicationJob keys clusters by URL — string ids
    # must survive the internal xxhash64 keying and come back verbatim
    e = spark.createDataFrame(
        [("http://a.test/1", "http://a.test/2"),
         ("http://a.test/2", "http://a.test/3"),
         ("http://b.test/x", "http://b.test/y")],
        "id_a string, id_b string")
    nd = spark.createDataFrame(
        [("http://a.test/1",), ("http://a.test/2",),
         ("http://a.test/3",), ("http://b.test/x",),
         ("http://b.test/y",), ("http://c.test/solo",)],
        "doc_id string")
    got = {r.id: r.cluster_id
           for r in connected_components(e, nodes=nd).collect()}
    assert set(got) == {r.doc_id for r in nd.collect()}
    a = {"http://a.test/1", "http://a.test/2", "http://a.test/3"}
    b = {"http://b.test/x", "http://b.test/y"}
    assert len({got[u] for u in a}) == 1 and got[next(iter(a))] in a
    assert len({got[u] for u in b}) == 1 and got[next(iter(b))] in b
    assert got["http://c.test/solo"] == "http://c.test/solo"


def test_dedup_clusters_string_ids(spark):
    docs = spark.createDataFrame(
        [("u1", "long text wins here"), ("u2", "short"),
         ("u3", "mid text")],
        "doc_id string, text string")
    pairs = spark.createDataFrame([("u1", "u2"), ("u2", "u3")],
                                  "id_a string, id_b string")
    out = {r.id: r for r in
           dedup_clusters(docs, pairs).collect()}
    assert len({out[u].cluster_id for u in ("u1", "u2", "u3")}) == 1
    assert out["u1"].keep and not out["u2"].keep and not out["u3"].keep


def test_nonconvergence_raises(spark):
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(30, 0, -1)], "id_a long, id_b long")
    try:
        connected_components(e, max_iter=1).collect()
        raise AssertionError("expected RuntimeError on max_iter=1")
    except RuntimeError as ex:
        assert "fixpoint" in str(ex)
