"""Explicit StructTypes for every persistent table.

The reference's fixed Writable schemas (CrawlDatum.java:128-135,
Content.java:51-63, ParseData.java:43-48, ParseText.java:39) map to the
DataFrame schemas below. Times are epoch **milliseconds** (long), same
unit as the reference's ``fetchTime``/``modifiedTime``, so schedule
arithmetic is integer-exact. Intervals are seconds (int), statuses are
lowercase string enums (CrawlDatum.java:56-96 names).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- status enums (CrawlDatum.java:56-96) -------------------------------
DB_UNFETCHED = "db_unfetched"
DB_FETCHED = "db_fetched"
DB_GONE = "db_gone"
DB_REDIR_TEMP = "db_redir_temp"
DB_REDIR_PERM = "db_redir_perm"
DB_NOTMODIFIED = "db_notmodified"
DB_DUPLICATE = "db_duplicate"

FETCH_SUCCESS = "fetch_success"
FETCH_RETRY = "fetch_retry"
FETCH_REDIR_TEMP = "fetch_redir_temp"
FETCH_REDIR_PERM = "fetch_redir_perm"
FETCH_GONE = "fetch_gone"
FETCH_NOTMODIFIED = "fetch_notmodified"

STATUS_SIGNATURE = "signature"
STATUS_INJECTED = "injected"
STATUS_LINKED = "linked"
STATUS_PARSE_META = "parse_meta"

DB_STATUSES = (DB_UNFETCHED, DB_FETCHED, DB_GONE, DB_REDIR_TEMP,
               DB_REDIR_PERM, DB_NOTMODIFIED, DB_DUPLICATE)
FETCH_STATUSES = (FETCH_SUCCESS, FETCH_RETRY, FETCH_REDIR_TEMP,
                  FETCH_REDIR_PERM, FETCH_GONE, FETCH_NOTMODIFIED)

# reserved metadata keys (Nutch.java:33-76)
META_GENERATE_TIME = "_ngt_"
META_REPR_URL = "_repr_"
META_PROTOCOL_STATUS = "_pst_"
META_FIXED_INTERVAL = "fixedInterval"
# HttpHeaders.CONTENT_TYPE as carried in CrawlDatum metadata
# (MimeAdaptiveFetchSchedule.java:110-123)
META_CONTENT_TYPE = "Content-Type"

# --- crawldb: the frontier (CrawlDatum.java:128-135) --------------------
CRAWLDB = StructType([
    StructField("url", StringType(), False),
    StructField("status", StringType(), False),
    StructField("fetch_time", LongType(), False),      # epoch ms, next-due
    StructField("retries", IntegerType(), False),
    StructField("fetch_interval", IntegerType(), False),  # seconds
    StructField("score", DoubleType(), False),
    StructField("signature", StringType(), True),      # hex digest
    StructField("modified_time", LongType(), False),   # epoch ms, 0=unset
    StructField("metadata", MapType(StringType(), StringType()), True),
])

# --- pages: CC-style input table (BASELINE.json input_hint) -------------
PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# --- http_status: simulated protocol outcomes (FIXTURES.md F2) ----------
HTTP_STATUS = StructType([
    StructField("url", StringType(), False),
    StructField("status_code", IntegerType(), False),
    StructField("redirect_to", StringType(), True),
    StructField("content_length", LongType(), True),
])

# --- robots fixtures (FIXTURES.md F3, HttpRobotRulesParser.java:57-71) --
ROBOTS = StructType([
    StructField("authority", StringType(), False),   # proto://host[:port]
    StructField("robots_txt", StringType(), True),
    StructField("fetch_code", IntegerType(), False),
])

# --- fetchlist: crawl_generate segment table ---------------------------
FETCHLIST = StructType(CRAWLDB.fields + [
    StructField("segnum", IntegerType(), False),
    StructField("fetch_partition", IntegerType(), False),
])

# --- outlink (Outlink.java:33-35) --------------------------------------
OUTLINK = StructType([
    StructField("to_url", StringType(), False),
    StructField("anchor", StringType(), True),
])

# --- parse output (ParseData.java:43-48 + ParseText.java:39) ------------
PARSE = StructType([
    StructField("url", StringType(), False),
    StructField("title", StringType(), True),
    StructField("text", StringType(), True),
    StructField("outlinks", ArrayType(OUTLINK), True),
    StructField("parse_status", StringType(), False),
    StructField("signature", StringType(), True),
])

# --- updatedb input message rows (markers, CrawlDatum.java:89-96) -------
# crawldb rows ∪ fetch rows ∪ linked rows ∪ signature ∪ parse_meta all
# share the CRAWLDB schema; `status` distinguishes the message type.
UPDATE_MSG = CRAWLDB

# --- linkdb (Inlinks.java:27-28) ---------------------------------------
LINKDB = StructType([
    StructField("url", StringType(), False),
    StructField("inlinks", ArrayType(StructType([
        StructField("from_url", StringType(), False),
        StructField("anchor", StringType(), True),
    ])), False),
])
