"""Loops cycle detection and LinkRank's loop-exclusion + per-domain
contribution dedup (Loops.java, LinkRank.java:437-553)."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.linkdb import find_loops, linkrank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "from_url string, to_url string")


def test_loops_reciprocal(spark):
    """a↔b is found at depth 1 of the Looper pass."""
    e = _edges(spark, [("http://a.ex/", "http://b.ex/"),
                       ("http://b.ex/", "http://a.ex/")])
    loops = {r.url: set(r.loop_set) for r in find_loops(e).collect()}
    assert loops == {"http://a.ex/": {"http://b.ex/"},
                     "http://b.ex/": {"http://a.ex/"}}


def test_loops_three_cycle_depth2(spark):
    """a→b→c→a requires the second pass (depth=2 default)."""
    e = _edges(spark, [("http://a.ex/", "http://b.ex/"),
                       ("http://b.ex/", "http://c.ex/"),
                       ("http://c.ex/", "http://a.ex/")])
    loops = {r.url: set(r.loop_set) for r in find_loops(e).collect()}
    assert loops["http://a.ex/"] == {"http://b.ex/"}
    assert loops["http://b.ex/"] == {"http://c.ex/"}
    assert loops["http://c.ex/"] == {"http://a.ex/"}
    # depth=1 must NOT find the 3-cycle
    assert find_loops(e, depth=1).count() == 0


def test_loops_no_cycle(spark):
    e = _edges(spark, [("http://a.ex/", "http://b.ex/"),
                       ("http://b.ex/", "http://c.ex/")])
    assert find_loops(e).count() == 0


def test_linkrank_excludes_loops(spark):
    """With the loopset supplied, the reciprocal edge is dropped from
    inversion: b receives no score from a's loop edge
    (LinkRank.java:437-445)."""
    e = _edges(spark, [("http://a.ex/", "http://b.ex/"),
                       ("http://b.ex/", "http://a.ex/"),
                       ("http://z.ex/", "http://b.ex/")])
    loops = find_loops(e)
    with_loops = {r.url: r.score
                  for r in linkrank(e, iterations=2, loops=loops,
                                    limit_domains=False,
                                    limit_pages=False).collect()}
    without = {r.url: r.score
               for r in linkrank(e, iterations=2, limit_domains=False,
                                 limit_pages=False).collect()}
    # the loop edges are gone: only z→b remains, so a ends at rank-one
    assert with_loops["http://a.ex/"] == pytest.approx(0.15)
    assert with_loops["http://b.ex/"] > with_loops["http://a.ex/"]
    # and differs from the cyclic computation
    assert without["http://a.ex/"] > with_loops["http://a.ex/"]


def test_linkrank_domain_dedup(spark):
    """Two inlinks from one registered domain count once; two domains
    count twice (LinkRank.java:541-547, link.ignore.limit.domain)."""
    # t1: two inlinks from sub-hosts of one domain
    # t2: two inlinks from two distinct domains
    # real TLDs: the full suffix table resolves x.one.com -> one.com
    # (a fake ".ex" tld would collapse every host to domain "ex")
    e = _edges(spark, [
        ("http://x.one.com/", "http://t1.com/"),
        ("http://y.one.com/", "http://t1.com/"),
        ("http://x.one.com/", "http://t2.com/"),
        ("http://z.two.com/", "http://t2.com/"),
    ])
    ranks = {r.url: r.score
             for r in linkrank(e, iterations=1,
                               limit_pages=False).collect()}
    # x.one.com deg=2 (0.5 each), y deg=1, z deg=1.
    # t1 dedup(one.com): max(0.5, 1.0)=1.0 counts once.
    # t2: one.com 0.5 + two.com 1.0 = 1.5
    assert ranks["http://t2.com/"] > ranks["http://t1.com/"]
    assert ranks["http://t1.com/"] == pytest.approx(0.15 + 0.85 * 1.0)
    assert ranks["http://t2.com/"] == pytest.approx(0.15 + 0.85 * 1.5)


def test_linkrank_page_dedup_query_strings(spark):
    """Inlinks differing only in query string are one page
    (URLUtil.getPage: lowercased url minus query)."""
    e = _edges(spark, [
        ("http://a.ex/p?x=1", "http://t.ex/"),
        ("http://a.ex/p?x=2", "http://t.ex/"),
    ])
    ranks = {r.url: r.score
             for r in linkrank(e, iterations=1,
                               limit_domains=False).collect()}
    assert ranks["http://t.ex/"] == pytest.approx(0.15 + 0.85 * 1.0)


def test_loops_route_cap_bounds_fanout(spark):
    """max_routes_per_node: a hub accumulating more routes than the cap
    forwards only `cap` of them — per-pass route volume is bounded at
    cap × outdeg per node (the 100×-scale safety valve)."""
    # star into hub h, hub fans out to 3 leaves, leaves loop back to
    # their spoke: every spoke s_i seeds a route sitting at h
    pairs = []
    for i in range(8):
        pairs.append((f"http://s{i}.ex/", "http://h.ex/"))
    for j in range(3):
        pairs.append(("http://h.ex/", f"http://l{j}.ex/"))
    # make h have inlinks so routes seed THROUGH it, and close one loop
    pairs.append(("http://l0.ex/", "http://s0.ex/"))
    e = _edges(spark, pairs)

    full = {(r.url, tuple(sorted(r.loop_set)))
            for r in find_loops(e, depth=2,
                                max_routes_per_node=None).collect()}
    capped = {(r.url, tuple(sorted(r.loop_set)))
              for r in find_loops(e, depth=2,
                                  max_routes_per_node=2).collect()}
    # capped output is a subset of the exact output, never a superset
    assert capped <= full
    # a generous cap changes nothing
    loose = {(r.url, tuple(sorted(r.loop_set)))
             for r in find_loops(e, depth=2,
                                 max_routes_per_node=100).collect()}
    assert loose == full


def test_loops_cap_deterministic(spark):
    pairs = [(f"http://s{i}.ex/", "http://h.ex/") for i in range(6)]
    pairs += [("http://h.ex/", f"http://s{i}.ex/") for i in range(6)]
    e = _edges(spark, pairs)
    a = sorted((r.url, tuple(sorted(r.loop_set)))
               for r in find_loops(e, max_routes_per_node=3).collect())
    b = sorted((r.url, tuple(sorted(r.loop_set)))
               for r in find_loops(e, max_routes_per_node=3).collect())
    assert a == b


def _hub_graph(spark, n_spokes=40):
    """A dense hub: every spoke links the hub and the hub links every
    spoke (n reciprocal 2-loops through one node), plus a disjoint
    clean 2-loop. Routes sitting at the hub = n_spokes — the fan-out
    shape the route cap exists for."""
    hub = "http://hub.ex/"
    pairs = []
    for i in range(n_spokes):
        s = f"http://s{i:03d}.ex/"
        pairs += [(s, hub), (hub, s)]
    pairs += [("http://x.ex/", "http://y.ex/"),
              ("http://y.ex/", "http://x.ex/")]
    return _edges(spark, pairs)


def test_loops_route_cap_invisible_when_not_binding(spark):
    """Cap far above the hub's route count -> byte-identical output
    to the uncapped run (the default-100k 'invisible on the test
    corpus' claim, exercised)."""
    e = _hub_graph(spark)
    capped = {r.url: set(r.loop_set)
              for r in find_loops(e, max_routes_per_node=1000).collect()}
    uncapped = {r.url: set(r.loop_set)
                for r in find_loops(e, max_routes_per_node=None)
                .collect()}
    assert capped == uncapped


def test_loops_route_cap_binds_gracefully_on_hub(spark):
    """Cap below the hub's route count: bounded work, found loops are
    a deterministic SUBSET of the uncapped output (recall trades for
    the outdeg^depth bound — never wrong pairs, never duplicates),
    and loops away from the hub are unaffected."""
    e = _hub_graph(spark)
    uncapped = {r.url: set(r.loop_set)
                for r in find_loops(e, max_routes_per_node=None)
                .collect()}
    capped_rows = find_loops(e, max_routes_per_node=5).collect()
    capped = {r.url: set(r.loop_set) for r in capped_rows}
    assert len(capped_rows) == len(capped)  # no duplicate urls
    for url, ls in capped.items():
        assert ls <= uncapped[url]          # subset, never invention
    # the cap only squeezes the hub neighborhood; the disjoint clean
    # loop (and the hub's own entry) survive intact
    assert capped["http://x.ex/"] == {"http://y.ex/"}
    assert capped["http://y.ex/"] == {"http://x.ex/"}
    assert "http://hub.ex/" in capped
    # determinism: same cap -> same output
    again = {r.url: set(r.loop_set)
             for r in find_loops(e, max_routes_per_node=5).collect()}
    assert again == capped


def test_link_dumper(spark):
    """LinkDumper: inversion with source scores, loop exclusion (same
    edge drop as LinkRank), deterministic smallest-from_url cap."""
    from nutch_spark.operators import linkdb as linkdb_op
    from nutch_spark.config import DEFAULT

    edges = spark.createDataFrame(
        [("http://a.test/", "http://b.test/", "x"),
         ("http://b.test/", "http://a.test/", "x"),   # 2-cycle
         ("http://c.test/", "http://a.test/", "x"),
         ("http://d.test/", "http://a.test/", "x")],
        "from_url string, to_url string, anchor string")
    scores = spark.createDataFrame(
        [("http://a.test/", 2.0), ("http://b.test/", 3.0),
         ("http://c.test/", 5.0)],  # d.test absent -> 0.0 default
        "url string, score double")
    wg = linkdb_op.webgraph(edges, scores, DEFAULT)
    out = {r.url: r.inlinks
           for r in linkdb_op.link_dumper(
               wg["outlinkdb"], wg["nodedb"]).collect()}
    assert [(i.from_url, i.score) for i in out["http://a.test/"]] == [
        ("http://b.test/", 3.0), ("http://c.test/", 5.0),
        ("http://d.test/", 0.0)]
    assert [(i.from_url, i.score) for i in out["http://b.test/"]] == [
        ("http://a.test/", 2.0)]

    # loop exclusion: drop a<->b edges from the inversion
    loops = linkdb_op.find_loops(edges.select("from_url", "to_url"),
                                 depth=2)
    out2 = {r.url: r.inlinks
            for r in linkdb_op.link_dumper(
                wg["outlinkdb"], wg["nodedb"], loops=loops).collect()}
    assert [i.from_url for i in out2["http://a.test/"]] == [
        "http://c.test/", "http://d.test/"]
    assert "http://b.test/" not in out2

    # cap keeps the N smallest from_url, deterministically
    out3 = {r.url: r.inlinks
            for r in linkdb_op.link_dumper(
                wg["outlinkdb"], wg["nodedb"],
                max_inlinks=2).collect()}
    assert [i.from_url for i in out3["http://a.test/"]] == [
        "http://b.test/", "http://c.test/"]


def test_node_reader_point_lookup(spark):
    """NodeReader (NodeReader.java:67-85): single-node degrees +
    scores; outlink score = inlink score / outdegree (Node.java:68)."""
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators.linkdb import node_reader, webgraph

    e = _edges(spark, [("http://a.ex/", "http://b.ex/"),
                       ("http://a.ex/", "http://c.ex/"),
                       ("http://b.ex/", "http://a.ex/")])
    scores = spark.createDataFrame(
        [("http://a.ex/", 2.0)], "url string, score double")
    wg = webgraph(e, scores, CrawlConfig())
    row = node_reader(wg["nodedb"], "http://a.ex/").collect()
    assert len(row) == 1
    r = row[0]
    assert (r.num_inlinks, r.num_outlinks) == (1, 2)
    assert r.inlink_score == 2.0 and r.outlink_score == 1.0
    # a node with no outlinks keeps its inlink score (Node.java:68)
    r2 = node_reader(wg["nodedb"], "http://c.ex/").collect()[0]
    assert r2.num_outlinks == 0 and r2.outlink_score == r2.inlink_score
    # absent url -> empty result, like a MapFile miss
    assert node_reader(wg["nodedb"], "http://zz.ex/").count() == 0


def test_loop_reader_point_lookup(spark):
    """LoopReader (LoopReader.java:68-90): one row per loop url of the
    requested start url only."""
    from nutch_spark.operators.linkdb import loop_reader

    e = _edges(spark, [("http://a.ex/", "http://b.ex/"),
                       ("http://b.ex/", "http://a.ex/"),
                       ("http://b.ex/", "http://c.ex/"),
                       ("http://c.ex/", "http://b.ex/")])
    loops = find_loops(e)
    got = loop_reader(loops, "http://b.ex/").collect()
    assert {r.loop_url for r in got} == {"http://a.ex/", "http://c.ex/"}
    assert all(r.url == "http://b.ex/" for r in got)
    assert loop_reader(loops, "http://zz.ex/").count() == 0
