"""MimeAdaptiveFetchSchedule rates and CrawlDbFilter normalize/filter
re-keying inside updatedb (MimeAdaptiveFetchSchedule.java:103-127,
CrawlDbFilter.java:91-108)."""

from nutch_spark.config import DEFAULT
from nutch_spark.operators.updatedb import updatedb
from tests.helpers import NOW, by_url, crawldb_df, datum

INTERVAL = DEFAULT.db_fetch_interval_default


def test_mime_adaptive_rates(spark):
    """Per-MIME inc/dec from metadata Content-Type; unknown or absent
    mime falls back to the adaptive defaults; parameters after ';'
    are stripped (MimeUtil.cleanMimeType)."""
    cfg = DEFAULT.with_(fetch_schedule="mime_adaptive",
                        adaptive_sync_delta=False)
    sig = "aa" * 16
    old = crawldb_df(spark, [
        datum(f"http://{h}.ex/", "db_fetched", fetch_time=NOW - 5000,
              signature=sig, modified_time=NOW - 99000)
        for h in ("pdf", "html", "unknown", "nomime")])
    msgs = crawldb_df(spark, [
        # notmodified result -> interval × (1 + inc_rate)
        datum("http://pdf.ex/", "fetch_notmodified", fetch_time=NOW,
              metadata={"Content-Type": "application/pdf"}),
        datum("http://html.ex/", "fetch_notmodified", fetch_time=NOW,
              metadata={"Content-Type": "text/html; charset=utf-8"}),
        datum("http://unknown.ex/", "fetch_notmodified", fetch_time=NOW,
              metadata={"Content-Type": "application/x-whatever"}),
        datum("http://nomime.ex/", "fetch_notmodified", fetch_time=NOW),
    ])
    rows = by_url(updatedb(old, msgs, cfg, NOW))
    # pdf: inc 0.1 -> ×1.1; html (cleaned of ';charset'): inc 0.2;
    # unknown/absent: default 0.2
    assert rows["http://pdf.ex/"]["fetch_interval"] == int(INTERVAL * 1.1)
    assert rows["http://html.ex/"]["fetch_interval"] == int(INTERVAL * 1.2)
    assert rows["http://unknown.ex/"]["fetch_interval"] == \
        int(INTERVAL * 1.2)
    assert rows["http://nomime.ex/"]["fetch_interval"] == \
        int(INTERVAL * 1.2)


def test_mime_adaptive_dec_rate(spark):
    """Modified pdf shrinks by its own dec rate 0.4."""
    cfg = DEFAULT.with_(fetch_schedule="mime_adaptive",
                        adaptive_sync_delta=False)
    old = crawldb_df(spark, [
        datum("http://pdf.ex/", "db_fetched", fetch_time=NOW - 5000,
              signature="aa" * 16, modified_time=NOW - 99000)])
    msgs = crawldb_df(spark, [
        datum("http://pdf.ex/", "fetch_success", fetch_time=NOW,
              signature="bb" * 16,
              metadata={"Content-Type": "application/pdf"})])
    rows = by_url(updatedb(old, msgs, cfg, NOW))
    assert rows["http://pdf.ex/"]["fetch_interval"] == \
        int(INTERVAL * (1 - 0.4))


def test_updatedb_normalize_rekeys_db_rows(spark):
    """crawldb.url.normalizers: existing db rows are re-normalized and
    re-keyed, so rows collapsing to one canonical url merge
    (CrawlDbFilter.java:91-99)."""
    cfg = DEFAULT.with_(db_update_normalize=True)
    # two spellings of the same page already in the db
    old = crawldb_df(spark, [
        datum("http://A.ex/p", "db_fetched", fetch_time=NOW - 1000,
              score=1.0),
        datum("http://a.ex:80/p", "db_unfetched", fetch_time=NOW - 500,
              score=2.0),
    ])
    msgs = crawldb_df(spark, [])
    rows = by_url(updatedb(old, msgs, cfg, NOW))
    assert set(rows) == {"http://a.ex/p"}


def test_updatedb_filter_drops_rows(spark):
    """crawldb.url.filters drops rows whose url the filter chain
    rejects (CrawlDbFilter.java:100-106)."""
    cfg = DEFAULT.with_(db_update_filter=True)
    old = crawldb_df(spark, [
        datum("http://keep.ex/page", "db_fetched"),
        datum("http://drop.ex/file.zip", "db_fetched"),
    ])
    msgs = crawldb_df(spark, [])
    rows = by_url(updatedb(old, msgs, cfg, NOW))
    assert set(rows) == {"http://keep.ex/page"}
