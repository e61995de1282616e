"""LinkDb — inverted link table, plus WebGraph node/link tables.

Reference: LinkDb.java:85-155 (invert: per outlink emit
``toUrl → Inlink(fromUrl, anchor)``, internal links ignored by default,
anchors truncated at db.max.anchor.length=100), LinkDbMerger.java
(union + cap at db.max.inlinks), Inlinks.java (set semantics),
WebGraph.java:96-115 (outlinkdb / inlinkdb / nodedb),
NodeDumper.java (top-N by degree/score).

Spark shape: ``explode(outlinks)`` →
``groupBy(to_url).agg(slice(collect_set(struct(from_url, anchor))))``.
collect_set gives the reference's set semantics; the cap bounds state
for viral pages (the same skew the reference bounds with
db.max.inlinks). One shuffle on to_url with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import CrawlConfig
from ..functions.urls import host_col, spark_udfs


def invert_links(edges: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """(from_url, to_url, anchor) edges → LINKDB
    (url, inlinks array<struct<from_url, anchor>>)."""
    df = edges
    if cfg.db_ignore_internal_links:
        # null host → skip, same host → skip (LinkDb.java:116-126)
        df = df.where(host_col("from_url").isNotNull()
                      & host_col("to_url").isNotNull()
                      & (host_col("from_url") != host_col("to_url")))
    df = df.withColumn(
        "anchor",
        F.substring(F.coalesce(F.col("anchor"), F.lit("")), 1,
                    cfg.db_max_anchor_length))
    return _capped_inlinks(
        df.select(F.col("to_url").alias("url"), "from_url", "anchor"),
        cfg.db_max_inlinks)


def _capped_inlinks(rows: DataFrame, cap: int) -> DataFrame:
    """(url, from_url, anchor) rows → (url, inlinks array) with set
    semantics and the db.max.inlinks cap applied BEFORE aggregation.

    The cap must run before ``collect_set``: a viral page with 10⁸
    inlinks would otherwise materialize the full set in one in-memory
    aggregation buffer (OOM at scale) before being sliced. The window
    sort is spillable, so the pre-cap bounds the collect buffer at
    ``cap`` structs — the same bounded-queue semantics as the
    reference's reduce-side cap (LinkDb.java:147-153,
    LinkDbMerger.java:73-95). Keeps the N smallest (from_url, anchor)
    pairs, identical to the previous sort+slice output. The window and
    the groupBy share the url hash-partitioning, so only the
    dropDuplicates adds a shuffle."""
    df = rows.dropDuplicates(["url", "from_url", "anchor"])
    w = Window.partitionBy("url").orderBy("from_url", "anchor")
    df = (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap).drop("_rn"))
    return df.groupBy("url").agg(
        F.sort_array(F.collect_list(F.struct("from_url", "anchor")))
        .alias("inlinks"))


def merge_linkdbs(dbs: list[DataFrame], cfg: CrawlConfig) -> DataFrame:
    """LinkDbMerger: union inlink sets, re-cap (LinkDbMerger.java:73-95)."""
    assert dbs
    u = dbs[0]
    for d in dbs[1:]:
        u = u.unionByName(d)
    return _capped_inlinks(
        u.select("url", F.explode("inlinks").alias("l"))
         .select("url", F.col("l.from_url").alias("from_url"),
                 F.col("l.anchor").alias("anchor")),
        cfg.db_max_inlinks)


def webgraph(edges: DataFrame, scores: DataFrame | None,
             cfg: CrawlConfig) -> dict[str, DataFrame]:
    """WebGraph's three tables from the edge list
    (WebGraph.java:96-500): outlinkdb (dedup'd edges), inlinkdb
    (inversion), nodedb (degrees + score)."""
    out = edges.select("from_url", "to_url").distinct()
    inl = out.select(F.col("to_url").alias("url"),
                     F.col("from_url").alias("inlink"))
    outdeg = out.groupBy(F.col("from_url").alias("url")) \
        .agg(F.count("*").alias("out_degree"))
    indeg = inl.groupBy("url").agg(F.count("*").alias("in_degree"))
    node = (outdeg.join(indeg, "url", "full_outer")
            .select("url",
                    F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
                    F.coalesce("out_degree", F.lit(0)).alias("out_degree")))
    if scores is not None:
        node = (node.join(scores.select("url", "score"), "url", "left")
                .withColumn("score", F.coalesce("score", F.lit(0.0))))
    else:
        node = node.withColumn("score", F.lit(0.0))
    return {"outlinkdb": out, "inlinkdb": inl, "nodedb": node}


def linkrank(edges: DataFrame, iterations: int = 10,
             damping: float = 0.85) -> DataFrame:
    """LinkRank (LinkRank.java): PageRank variant — initial score 1.0
    (line 342), per-iteration score = (1−d) + d·Σ inlink share with
    d=0.85 (lines 486-487, 560-561), duplicate inlink contributions
    deduped per page (lines 541-547), dangling handling by rank-one
    for zero-inlink pages (lines 523-525).

    Iterative DataFrame loop with localCheckpoint to truncate lineage —
    each iteration is one shuffle on to_url."""
    e = edges.select("from_url", "to_url").distinct().cache()
    nodes = (e.select(F.col("from_url").alias("url"))
             .union(e.select("to_url")).distinct().cache())
    outdeg = e.groupBy("from_url").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("score", F.lit(1.0))
    rank_one = 1.0 - damping
    for _ in range(iterations):
        contrib = (e.join(ranks, e.from_url == ranks.url)
                   .join(outdeg, "from_url")
                   .select(F.col("to_url").alias("url"),
                           (F.col("score") / F.col("deg")).alias("c")))
        summed = contrib.groupBy("url").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "url", "left")
                 .select("url",
                         (F.lit(rank_one)
                          + F.lit(damping)
                          * F.coalesce("s", F.lit(0.0))).alias("score")))
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def score_updater(crawldb: DataFrame, nodedb: DataFrame) -> DataFrame:
    """ScoreUpdater.java:59-63: copy nodedb scores into the crawldb;
    urls absent from the nodedb get score cleared to 0."""
    nd = nodedb.select("url", F.col("score").alias("_node_score"))
    return (crawldb.join(nd, "url", "left")
            .withColumn("score",
                        F.coalesce("_node_score", F.lit(0.0)))
            .drop("_node_score"))


def node_dumper(nodedb: DataFrame, by: str = "score",
                n: int = 10, asc: bool = False) -> DataFrame:
    """NodeDumper.java: top-N urls by in/out degree or score."""
    col = {"score": "score", "inlinks": "in_degree",
           "outlinks": "out_degree"}[by]
    order = F.asc(col) if asc else F.desc(col)
    return nodedb.orderBy(order, F.asc("url")).limit(n) \
        .select("url", F.col(col).alias(by))
