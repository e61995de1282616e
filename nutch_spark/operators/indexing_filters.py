"""Indexing-filter plugins — optional column adders over the indexable
document frame produced by :func:`readers.indexer_docs`.

The reference chains IndexingFilter plugins over each NutchDocument
(IndexingFilters.java; plugin order = ``indexingfilter.order``). Each
plugin adds/edits fields; one (mimetype-filter) can drop the document.
Spark mapping: each plugin is a pure-column transformation
``DataFrame -> DataFrame`` — no UDFs except the already-vectorized
domain-suffix walk for ``tld`` — chained by
:func:`apply_indexing_filters` in ``cfg.indexing_filters`` order, so
the whole chain stays inside one whole-stage-codegen span regardless
of how many plugins are on.

Plugins reproduced (reference file:line in each function):

- ``basic``      BasicIndexingFilter.java   (title/content truncation)
- ``anchor``     AnchorIndexingFilter.java  (case-insensitive dedup)
- ``more``       MoreIndexingFilter.java    (type/length/dates/title)
- ``metadata``   MetadataIndexer.java       (metadata keys -> fields)
- ``static``     StaticFieldIndexer.java    (constant fields)
- ``tld``        TLDIndexingFilter.java     (public-suffix field)
- ``mimetype``   MimeTypeIndexingFilter.java (accept/reject by prefix)
- ``subcollection`` SubcollectionIndexingFilter.java (matching names)
- ``geoip``      GeoIPIndexingFilter.java   (ip-range city-db lookup)

HTTP response headers travel in the document's ``metadata``
map<string,string> column (the fetcher's content metadata — the
reference reads the same keys from ParseData's content metadata).
Engine convention: ``Last-Modified`` holds epoch **milliseconds** as a
decimal string — the engine normalizes header dates at fetch time
instead of carrying the reference's 23-format Java date parser
(MoreIndexingFilter.java:121-151) into every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig
from ..functions.urls import spark_udfs

def _meta(doc: DataFrame, key: str):
    """Header lookup that is null-safe when the doc has no metadata."""
    if "metadata" not in doc.columns:
        return F.lit(None).cast("string")
    empty = F.create_map().cast("map<string,string>")
    return F.element_at(F.coalesce(F.col("metadata"), empty), F.lit(key))


def _digits_to_long(col):
    """ANSI-safe string->long: null unless the trimmed value is all
    digits (NUTCH-1010: Content-Length not trimmed)."""
    t = F.trim(col)
    return F.when(t.rlike(r"^\d+$"), t.cast("long"))


def index_basic(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """index-basic truncations (BasicIndexingFilter.java:70-90):
    title capped at ``indexer.max.title.length`` (default 100) and
    content at ``indexer.max.content.length`` (default -1 = no cap).
    The field *construction* (host/url/content/title/tstamp) already
    happens in :func:`readers.indexer_docs`."""
    out = doc
    if cfg.indexer_max_title_length >= 0 and "title" in doc.columns:
        out = out.withColumn(
            "title", F.substring("title", 1, cfg.indexer_max_title_length))
    if cfg.indexer_max_content_length >= 0 and "text" in doc.columns:
        out = out.withColumn(
            "text", F.substring("text", 1, cfg.indexer_max_content_length))
    return out


def index_anchor(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """index-anchor (AnchorIndexingFilter.java:60-90): when
    ``anchorIndexingFilter.deduplicate`` is on, drop anchors whose
    lowercase form was already seen, keeping the FIRST original-case
    occurrence (the reference's HashSet insert order)."""
    if not cfg.anchor_deduplicate or "anchors" not in doc.columns:
        return doc
    dedup = F.aggregate(
        F.col("anchors"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            x.isNull() | F.exists(acc, lambda y: F.lower(y) == F.lower(x)),
            acc).otherwise(F.concat(acc, F.array(x))))
    return doc.withColumn(
        "anchors", F.when(F.col("anchors").isNotNull(), dedup))


def index_more(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """index-more (MoreIndexingFilter.java):

    - ``last_modified`` from the Last-Modified header (epoch-ms
      convention, see module docstring) — :84-118;
    - ``date`` = last-modified, else the fetch time (the datum's
      modified_time branch collapses into fetched_at here because the
      indexer join carries the fetch datum's time) — :95-118;
    - ``content_length`` from Content-Length, trimmed (NUTCH-1010)
      — :153-164;
    - ``type`` = cleaned mime (params stripped, lowercased =
      MimeUtil.cleanMimeType) plus ``primary_type``/``sub_type``
      when ``moreIndexingFilter.indexMimeTypeParts`` (the reference
      multi-values one field; columns are the DataFrame analog)
      — :186-255;
    - title reset from a Content-Disposition ``filename=`` hint when
      the doc has no title — :257-292.
    """
    lm_ms = _digits_to_long(_meta(doc, "Last-Modified"))
    date_ms = F.coalesce(lm_ms, F.col("fetched_at").cast("long")
                         if "fetched_at" in doc.columns
                         else F.lit(None).cast("long"))
    ct = F.lower(F.trim(F.split_part(_meta(doc, "Content-Type"),
                                     F.lit(";"), F.lit(1))))
    ct = F.when(ct != "", ct)
    out = (doc
           .withColumn("last_modified", F.timestamp_millis(lm_ms))
           .withColumn("date", F.timestamp_millis(date_ms))
           .withColumn("content_length",
                       _digits_to_long(_meta(doc, "Content-Length")))
           .withColumn("type", ct))
    if cfg.more_index_mime_parts:
        out = (out
               .withColumn("primary_type",
                           F.split_part(F.col("type"), F.lit("/"), F.lit(1)))
               .withColumn("sub_type",
                           F.when(F.col("type").contains("/"),
                                  F.split_part(F.col("type"), F.lit("/"),
                                               F.lit(2)))))
    if "title" in doc.columns:
        cd = _meta(doc, "Content-Disposition")
        quoted = F.regexp_extract(cd, r"""\bfilename=['"]([^'"]+)['"]""", 1)
        bare = F.regexp_extract(cd, r"""\bfilename=(\S+)""", 1)
        hint = F.when(quoted != "", quoted).otherwise(
            F.when(bare != "", bare))
        out = out.withColumn(
            "title", F.coalesce(F.col("title"), hint))
    return out


def index_metadata(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """index-metadata (MetadataIndexer.java:57-85): copy the
    configured ``index.parse.md`` keys out of the metadata map into
    top-level fields (field name = key lowercased, the reference's
    Locale.ROOT lowering of the parse-md tag)."""
    out = doc
    for key in cfg.index_parse_md:
        out = out.withColumn(key.lower(), _meta(doc, key))
    return out


def index_static(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """index-static (StaticFieldIndexer.java:60-115): constant
    field:value pairs from ``index.static``; multiple values for one
    field (the reference's valuesep split) become an array column."""
    out = doc
    for name, values in cfg.index_static:
        vals = (values,) if isinstance(values, str) else tuple(values)
        out = out.withColumn(
            name, F.lit(vals[0]) if len(vals) == 1
            else F.array(*[F.lit(v) for v in vals]))
    return out


def index_tld(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """tld plugin (TLDIndexingFilter.java:49-61): ``tld`` = the url
    host's matched public suffix (URLUtil.getDomainSuffix — the full
    reference suffix table, vectorized)."""
    return doc.withColumn("tld", spark_udfs()["suffix"](F.col("url")))


def mimetype_filter(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """mimetype-filter (MimeTypeIndexingFilter.java:110-200): keep or
    drop whole documents by content type. Rules are prefixes
    (PrefixStringMatcher); the mode mirrors the rule file's leading
    ``+`` (accept: keep only matching) / ``-`` (reject: drop
    matching). A document with no resolved type matches nothing.
    Run AFTER :func:`index_more` (which resolves ``type``)."""
    if not cfg.mimetype_filter_prefixes:
        return doc
    prefixes = F.array(*[F.lit(p) for p in cfg.mimetype_filter_prefixes])
    matched = F.coalesce(
        F.exists(prefixes, lambda p: F.col("type").startswith(p)),
        F.lit(False))
    return doc.where(matched if cfg.mimetype_filter_mode == "accept"
                     else ~matched)


def subcollection(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """subcollection (SubcollectionIndexingFilter.java:80-92,
    Subcollection.java:161-190): ``subcollection`` = names of every
    configured collection whose whitelist has a substring match on
    the url and whose blacklist does not (blacklist wins)."""
    url = F.col("url")
    names = []
    for name, white, black in cfg.subcollections:
        hit = F.lit(False)
        for w in white:
            hit = hit | url.contains(w)
        for b in black:
            hit = hit & ~url.contains(b)
        names.append(F.when(hit, F.lit(name)))
    arr = (F.filter(F.array(*names), lambda x: x.isNotNull())
           if names else F.array().cast("array<string>"))
    return doc.withColumn("subcollection", arr)


GEO_FIELDS = ("city_name", "country_iso", "country_name", "lat_lon",
              "time_zone", "postal_code", "continent_code")

_GEO_SCHEMA = ("start_ip string, end_ip string, city_name string, "
               "country_iso string, country_name string, lat double, "
               "lon double, time_zone string, postal_code string, "
               "continent_code string")


def _ip_num(col):
    """Dotted-quad IPv4 -> uint32 (as long), null on malformed input
    — pure JVM arithmetic, no UDF."""
    ok = col.rlike(
        r"^(25[0-5]|2[0-4]\d|1?\d?\d)(\.(25[0-5]|2[0-4]\d|1?\d?\d)){3}$")
    parts = F.split(col, r"\.")
    num = (F.element_at(parts, 1).cast("long") * 16777216
           + F.element_at(parts, 2).cast("long") * 65536
           + F.element_at(parts, 3).cast("long") * 256
           + F.element_at(parts, 4).cast("long"))
    return F.when(ok, num)


def index_geoip(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """index-geoip cityDatabase analog (GeoIPIndexingFilter.java:
    204-233, GeoIPDocumentCreator.createDocFromCityDb): when
    ``store.ip.address`` is on, the server IP travels in the content
    metadata key ``_ip_``; the filter adds ``ip`` plus city-db fields
    (city/country/latlon/timezone/postal/continent), all null when
    there is no IP or no covering range.

    The MaxMind .mmdb side-file becomes a ranges DataFrame —
    ``cfg.geoip_ranges`` ships a deterministic fixture (no geo DB in
    the sandbox); production loads a real GeoLite2 CSV and calls
    :func:`index_geoip_with` directly."""
    if not cfg.store_ip_address:
        return doc
    spark = doc.sparkSession
    geo = spark.createDataFrame(list(cfg.geoip_ranges), _GEO_SCHEMA)
    return index_geoip_with(doc, geo)


def index_geoip_with(doc: DataFrame, geo: DataFrame) -> DataFrame:
    """Join geo fields onto the doc frame by IP range.

    100 TB shape: a raw range predicate would force a
    BroadcastNestedLoopJoin (every doc row scans every range). Instead
    each range is exploded over the /16 buckets it spans and the join
    is an EQUI-join on the bucket (broadcast hash join — GeoLite2 city
    is ~3M ranges, a few hundred MB exploded, well within broadcast
    range) followed by the start<=ip<=end filter. Ranges rarely span
    many /16s, so the explode is ~1 row per range."""
    from pyspark.sql.functions import broadcast
    gstart, gend = _ip_num(F.col("start_ip")), _ip_num(F.col("end_ip"))
    lat_lon = F.when(
        F.col("lat").isNotNull() & F.col("lon").isNotNull(),
        F.concat(F.col("lat").cast("string"), F.lit(","),
                 F.col("lon").cast("string")))
    geob = (geo.select(
        gstart.alias("_gs"), gend.alias("_ge"),
        F.col("city_name"), F.col("country_iso"),
        F.col("country_name"), lat_lon.alias("lat_lon"),
        F.col("time_zone"), F.col("postal_code"),
        F.col("continent_code"))
        .where(F.col("_gs").isNotNull() & F.col("_ge").isNotNull())
        .select(F.explode(F.sequence(
            (F.col("_gs") / 65536).cast("long"),
            (F.col("_ge") / 65536).cast("long"))).alias("_bucket"),
            "_gs", "_ge", *GEO_FIELDS))
    withip = doc.withColumn("ip", _meta(doc, "_ip_")) \
        .withColumn("_ipn", _ip_num(F.col("ip"))) \
        .withColumn("_bucket", (F.col("_ipn") / 65536).cast("long"))
    joined = (withip.join(
        broadcast(geob),
        (withip["_bucket"] == geob["_bucket"])
        & (F.col("_ipn") >= F.col("_gs"))
        & (F.col("_ipn") <= F.col("_ge")), "left")
        .drop("_bucket", "_gs", "_ge", "_ipn"))
    return joined


FILTERS = {
    "basic": index_basic,
    "anchor": index_anchor,
    "more": index_more,
    "metadata": index_metadata,
    "static": index_static,
    "tld": index_tld,
    "mimetype": mimetype_filter,
    "subcollection": subcollection,
    "geoip": index_geoip,
}


def index_replace(doc: DataFrame, rules,
                  cfg: CrawlConfig | None = None) -> DataFrame:
    """index-replace plugin (ReplaceIndexer.java:41-200): ordered
    regex replacements on indexed field values, scoped by hostmatch /
    urlmatch patterns. ``rules`` is a sequence of
    ``(scope_kind, scope_pattern, replacements)`` where scope_kind is
    ``"hostmatch"`` / ``"urlmatch"`` / ``None`` (all docs) and
    replacements is ``[(field, regexp, replacement), ...]`` — the
    property-file form ``fieldname=/regexp/replacement/`` with the
    preceding host/urlmatch line as the scope. Rules apply in order to
    docs whose host/url matches (Java Matcher.replaceAll semantics =
    Spark regexp_replace, all occurrences); fields absent from the doc
    are skipped like the reference\'s missing NutchField. Pure JVM
    column program."""
    from ..functions.urls import host_col

    for scope_kind, scope_pat, reps in rules:
        if scope_kind == "hostmatch":
            cond = F.coalesce(host_col(F.col("url")), F.lit("")) \
                .rlike(scope_pat)
        elif scope_kind == "urlmatch":
            cond = F.col("url").rlike(scope_pat)
        elif scope_kind is None:
            cond = F.lit(True)
        else:
            raise ValueError(f"unknown scope kind {scope_kind!r}")
        for field, rx, repl in reps:
            if field not in doc.columns:
                continue
            doc = doc.withColumn(
                field,
                F.when(cond & F.col(field).isNotNull(),
                       F.regexp_replace(F.col(field), rx, repl))
                 .otherwise(F.col(field)))
    return doc


def apply_indexing_filters(doc: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Chain the configured plugins in order (IndexingFilters.java:40-60,
    ``indexingfilter.order``). Unknown names raise — a silently skipped
    plugin is how documents leak past a mimetype filter."""
    for name in cfg.indexing_filters:
        try:
            fn = FILTERS[name]
        except KeyError:
            raise ValueError(
                f"unknown indexing filter {name!r}; "
                f"known: {sorted(FILTERS)}") from None
        doc = fn(doc, cfg)
    return doc
