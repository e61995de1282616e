"""nutch_spark — a PySpark-native crawl/analytics engine.

A from-scratch reimplementation of the computation performed by Apache
Nutch 1.11 (reference at /root/reference — the generate→fetch→parse→
updatedb crawl cycle) as declarative Spark DataFrame programs over
columnar tables of Common-Crawl-style pages, plus the large-scale
training-data operators (dedup, similarity search, text analysis) a
100 TB web-text pipeline needs.

Design:
  * DataFrame/SQL-first; Catalyst plans everything. No RDDs.
  * All hot-path expressions are JVM-side builtins; Python appears only
    as Arrow-vectorized pandas UDFs (URL canonicalization, robots
    evaluation, HTML parse, text-profile signatures).
  * Per-host politeness is a deterministic virtual-time schedule
    (window math), not threads — same ordering contract as the
    reference's in-memory fetch queues.
  * The frontier (CrawlDb) is a snapshotted columnar table bucketed by
    url hash; frontier stages never read page bytes (column pruning).
"""

__version__ = "0.1.0"
