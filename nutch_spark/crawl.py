"""Crawl-cycle driver: inject → [generate → fetch → parse → updatedb →
invertlinks → dedup]×rounds, with per-round checkpoints and metrics.

Reference: src/bin/crawl:18-279 — inject once, then loop generate
(-topN, -noFilter), fetch (-noParsing), parse, updatedb, invertlinks,
dedup; the loop exits when generate yields an empty fetchlist.

Spark shape: each stage is a DataFrame program; round boundaries are
parquet snapshot directories (``crawldb/round=N``) standing in for
Iceberg snapshot commits (atomic install, CrawlDb.java:155-173 — on a
cluster these become ``overwritePartitions`` on an Iceberg table
bucket-partitioned by url hash). A ``_metrics`` table accumulates
per-round, per-stage row counts and virtual-clock stats — the
per-partition lineage + metrics the north rule requires for
resumability; ``resume_round`` restarts from the latest snapshot.
"""

from __future__ import annotations

import json
import os
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import CrawlConfig
from .operators import dedup as dedup_op
from .operators import fetch as fetch_op
from .operators import generate as gen_op
from .operators import inject as inject_op
from .operators import linkdb as linkdb_op
from .operators import parse as parse_op
from .operators import updatedb as update_op
from .operators import cuckoo as cuckoo_op
from .operators import urlseen
from . import schema as S


def _lineage_rows(lineage: list[dict]) -> int | None:
    """Total rows from footer lineage, or None when any footer was
    unreadable (callers fall back to a Spark count)."""
    if not lineage or any(p["rows"] is None for p in lineage):
        return None
    return sum(p["rows"] for p in lineage)


class CrawlRun:
    """One crawl over a pages table, checkpointed under ``out_dir``."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 cfg: CrawlConfig, pages: DataFrame,
                 robots: DataFrame, http_status: DataFrame | None = None,
                 use_bloom: bool = True, bloom_buckets: int = 64,
                 seen_filter: str | None = None,
                 storage: str = "bucketed", db_buckets: int = 32,
                 linkrank_every: int = 1, linkrank_iterations: int = 10):
        """``storage``:

        - ``"bucketed"`` (default, the production layout): crawldb
          snapshots are url-bucketed :class:`~nutch_spark.storage.
          SnapshotTable` commits — Iceberg ``bucket(url, N)`` semantics.
          The frontier side of the updatedb merge and (when ``pages``
          is itself a bucketed table) the two pages-side fetch joins
          run with NO Exchange on the big side.
        - ``"parquet"``: plain per-round parquet snapshot dirs with the
          reference's current/old install dance — simpler, but the
          frontier re-shuffles every round.
        """
        self.spark = spark
        self.out = out_dir
        self.cfg = cfg
        self.pages = pages
        self.robots = robots
        self.http_status = http_status
        # URL-seen layer kind: "bloom" (default), "cuckoo" (same
        # contract + deletion — north rule names both), or "none".
        # `use_bloom` kept as the legacy on/off switch.
        if seen_filter is None:
            seen_filter = "bloom" if use_bloom else "none"
        if seen_filter not in ("bloom", "cuckoo", "none"):
            raise ValueError(f"seen_filter: {seen_filter!r}")
        self.seen_filter = seen_filter
        self.use_bloom = seen_filter != "none"
        self.bloom_buckets = bloom_buckets
        # scoring_filter="link" only: run webgraph→linkrank→
        # scoreupdater every N rounds (0 disables)
        self.linkrank_every = linkrank_every
        self.linkrank_iterations = linkrank_iterations
        if storage not in ("bucketed", "parquet"):
            raise ValueError(f"storage must be bucketed|parquet: {storage}")
        self.storage = storage
        self.db_table = None
        if storage == "bucketed":
            from .storage import SnapshotTable
            # sort=False: the crawldb is rewritten every round and its
            # consumers hash-aggregate/filter — per-bucket url order
            # would be pure write-side sort cost at 10^10 rows
            self.db_table = SnapshotTable(spark, out_dir, "crawldb",
                                          bucket_col="url",
                                          n_buckets=db_buckets,
                                          sort=False)
        self.metrics: list[dict] = []

    # --- checkpoint helpers --------------------------------------------
    def _path(self, name: str, rnd: int | None = None) -> str:
        p = os.path.join(self.out, name)
        return p if rnd is None else os.path.join(p, f"round={rnd}")

    def _write_tmp(self, df: DataFrame, name: str,
                   rnd: int | None = None,
                   partition_by: str | None = None) -> DataFrame:
        """Stage half of the atomic install: write the table to the
        ``.tmp`` dir (durable, but NOT yet committed — resume ignores
        it) and return a read of the staged data. :meth:`_install`
        performs the commit; :meth:`_write` composes both."""
        path = self._path(name, rnd)
        tmp = path + ".tmp"
        if os.path.isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(tmp)
        from .storage import partition_lineage
        out = self.spark.read.parquet(tmp)
        out._nutch_lineage_rows = _lineage_rows(partition_lineage(tmp))
        return out

    def _install(self, name: str, rnd: int | None = None) -> DataFrame:
        """Commit half: stamp the ``_snapshot.json`` commit record
        (with per-partition lineage) and install with the reference's
        current/old rename dance (CrawlDb.install). A crash before
        this point leaves only the ``.tmp`` dir, which resume
        ignores."""
        path = self._path(name, rnd)
        tmp = path + ".tmp"
        old = path + ".old"
        from .storage import partition_lineage
        lineage = partition_lineage(tmp)
        with open(os.path.join(tmp, "_snapshot.json"), "w") as f:
            json.dump({"name": name, "round": rnd, "ts": time.time(),
                       "rows": sum(p["rows"] or 0 for p in lineage),
                       "partitions": lineage}, f)
        # install: current -> old, tmp -> current, drop old
        # (CrawlDb.install; dir renames are atomic on POSIX)
        if os.path.isdir(old):
            import shutil
            shutil.rmtree(old)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.isdir(old):
            import shutil
            shutil.rmtree(old)
        out = self.spark.read.parquet(path)
        out._nutch_lineage_rows = _lineage_rows(lineage)
        return out

    def _write(self, df: DataFrame, name: str, rnd: int | None = None,
               partition_by: str | None = None) -> DataFrame:
        """Atomic snapshot install (CrawlDb.java:155-173 / Iceberg
        ``overwritePartitions`` semantics on a cluster): the table is
        written to a temp dir, a ``_snapshot.json`` commit record is
        added only after the write fully succeeds, and the directory
        is then installed with the reference's current/old rename
        dance. A crash at ANY point leaves either the previous
        committed snapshot in place or a temp dir that resume ignores —
        never a half-written table that :meth:`resume_round` would
        treat as committed."""
        self._write_tmp(df, name, rnd, partition_by)
        return self._install(name, rnd)

    @staticmethod
    def _committed(path: str) -> bool:
        return os.path.isfile(os.path.join(path, "_snapshot.json"))

    def _metric(self, rnd: int, stage: str, **kv) -> None:
        self.metrics.append({"round": rnd, "stage": stage,
                             "ts": time.time(), **kv})

    def flush_metrics(self) -> None:
        path = os.path.join(self.out, "_metrics.jsonl")
        with open(path, "w") as f:
            for m in self.metrics:
                f.write(json.dumps(m) + "\n")

    def resume_round(self) -> int:
        """Latest *committed* crawldb round, or -1 if none (the
        resumability contract: restart continues from here).

        Bucketed mode: the SnapshotTable's current pointer — a staged
        but unpublished snapshot is invisible, exactly like Iceberg's
        metadata swap. Parquet mode: only rounds carrying a
        ``_snapshot.json`` commit record count — ``.tmp``/``.old``
        leftovers from a crash mid-install are ignored, mirroring the
        reference's current/old install where an interrupted install
        leaves ``current`` untouched."""
        if self.db_table is not None:
            cur = self.db_table.current_id()
            return -1 if cur is None else cur
        base = os.path.join(self.out, "crawldb")
        if not os.path.isdir(base):
            return -1
        rounds = [int(d.split("=")[1]) for d in os.listdir(base)
                  if d.startswith("round=") and not d.endswith(".tmp")
                  and not d.endswith(".old")
                  and self._committed(os.path.join(base, d))]
        return max(rounds) if rounds else -1

    def load_crawldb(self, rnd: int) -> DataFrame:
        if self.db_table is not None:
            return self.db_table.read(rnd)
        return self.spark.read.parquet(self._path("crawldb", rnd))

    def _stage_crawldb(self, df: DataFrame, rnd: int) -> DataFrame:
        """Durable-but-uncommitted crawldb write for round ``rnd``."""
        if self.db_table is not None:
            out = self.db_table.stage(df, rnd)
            out._nutch_lineage_rows = self.db_table.staged_rows(rnd)
            return out
        return self._write_tmp(df, "crawldb", rnd)

    @staticmethod
    def _rows_or_count(df: DataFrame) -> int:
        """Row count of the frame just written: read from the write's
        parquet-footer lineage, carried ON the returned frame itself
        (zero Spark jobs — the metric counts in the reference come
        free from the MR framework's counters, and a 10^10-row table
        is too big to re-scan just for a metric). The count travels
        with the df argument, so an interposed write can never make
        it report a different table's rows; falls back to a count job
        when a footer was unreadable."""
        n = getattr(df, "_nutch_lineage_rows", None)
        return n if n is not None else df.count()

    def _commit_crawldb(self, rnd: int) -> DataFrame:
        """Make round ``rnd``'s staged crawldb the committed snapshot —
        the round's resume marker, always the round's LAST write."""
        if self.db_table is not None:
            staged = self.spark.table(self.db_table._table_name(rnd))
            self.db_table.publish(staged, rnd)
            return self.db_table.read(rnd)
        return self._install("crawldb", rnd)

    @property
    def _seen_dir(self) -> str:
        # bloom keeps its historical dir name so pre-existing
        # checkpoints resume; cuckoo layers live beside it
        return ("urlseen_bloom" if self.seen_filter == "bloom"
                else f"urlseen_{self.seen_filter}")

    def _load_bloom(self, rnd: int) -> DataFrame | None:
        """Committed URL-seen layer (bloom or cuckoo table rows) for
        round ``rnd`` (covers that round's crawldb snapshot), or
        None."""
        if not self.use_bloom or rnd < 0:
            return None
        path = self._path(self._seen_dir, rnd)
        if not self._committed(path):
            return None
        return self.spark.read.parquet(path)

    def _write_bloom(self, db: DataFrame, rnd: int) -> None:
        if self.seen_filter == "cuckoo":
            layer = cuckoo_op.build_cuckoo(db.select("url"),
                                           n_buckets=self.bloom_buckets)
        else:
            layer = urlseen.build_bloom(db.select("url"),
                                        n_buckets=self.bloom_buckets)
        self._write(layer, self._seen_dir, rnd)

    def _split_seen(self, linked: DataFrame,
                    layer: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(definitely_new, maybe_seen) via the active seen layer."""
        if self.seen_filter == "cuckoo":
            return cuckoo_op.split_seen(linked, layer)
        return urlseen.split_seen(linked, layer)

    def purge_gone(self, rnd: int) -> dict:
        """Frontier purge (the CleaningJob deletion semantic,
        ``CleaningJob.java:97-117``, applied to the crawldb itself):
        drop ``db_gone`` urls from round ``rnd``'s committed snapshot
        and commit the result as round ``rnd + 1``. With the cuckoo
        seen layer the purged urls are DELETED from the layer
        (one fingerprint each) instead of rebuilding it over the
        10^10-url frontier — the operation a bloom cannot express;
        the bloom path rebuilds."""
        db = self.load_crawldb(rnd)
        gone = db.where(F.col("status") == S.DB_GONE).select("url")
        kept = db.where(F.col("status") != S.DB_GONE)
        nxt = rnd + 1
        n_gone = gone.count()
        staged = self._stage_crawldb(kept, nxt)
        n_db = self._rows_or_count(staged)
        if self.seen_filter == "cuckoo":
            layer = self._load_bloom(rnd)
            if layer is not None:
                layer = cuckoo_op.cuckoo_delete(layer, gone)
                self._write(layer, self._seen_dir, nxt)
            else:
                self._write_bloom(staged, nxt)
        elif self.use_bloom:
            self._write_bloom(staged, nxt)
        self._commit_crawldb(nxt)
        self._metric(nxt, "purge", rows=n_db)
        return {"round": nxt, "crawldb_rows": n_db,
                "purged_rows": n_gone}

    # --- stages --------------------------------------------------------
    def inject(self, seeds: DataFrame, now_ms: int) -> DataFrame:
        prev = self.resume_round()
        db = self.load_crawldb(prev) if prev >= 0 else None
        new_db = inject_op.inject(db, seeds, self.cfg, now_ms)
        rnd = max(prev, 0)
        staged = self._stage_crawldb(new_db, rnd)
        n_db = self._rows_or_count(staged)
        if self.use_bloom:
            # round 1 pre-splits its discoveries against the seed set
            self._write_bloom(staged, rnd)
        out = self._commit_crawldb(rnd)
        self._metric(rnd, "inject", rows=n_db)
        return out

    def run_round(self, rnd: int, now_ms: int) -> dict:
        """One generate→fetch→parse→updatedb→invertlinks→dedup round.
        Returns the per-stage row counts; ``fetchlist_rows == 0``
        signals the caller to stop (bin/crawl:195-207)."""
        cfg = self.cfg
        db = self.load_crawldb(rnd - 1 if rnd > 0 else 0)
        t0 = time.time()

        fetchlist = gen_op.generate(
            db, cfg.with_(partition_seed=cfg.partition_seed ^ rnd),
            cur_time_ms=now_ms, gen_time_ms=now_ms)
        fetchlist = self._write(fetchlist, "segments/crawl_generate", rnd)
        n_fl = self._rows_or_count(fetchlist)
        self._metric(rnd, "generate", rows=n_fl, sec=time.time() - t0)
        if n_fl == 0:
            return {"fetchlist_rows": 0}

        t0 = time.time()
        fr = fetch_op.fetch(fetchlist, self.pages, self.robots,
                            self.http_status, cfg, now_ms)
        crawl_fetch = self._write(fr["crawl_fetch"],
                                  "segments/crawl_fetch", rnd)
        n_fetched = self._rows_or_count(crawl_fetch)
        content = fr["content"]
        linked_redir = fr["linked"]
        self._metric(rnd, "fetch", rows=n_fetched, sec=time.time() - t0,
                     partitions=cfg.num_fetch_partitions)

        t0 = time.time()
        # parse: html-only path by default; mime-dispatched (ParseUtil
        # via parse-plugins.xml — html/feed/zip/text families) when
        # configured, for CC-style mixed-mime corpora (bin/crawl:232)
        if cfg.parse_mime_dispatch:
            pr = parse_op.parse_segment_dispatch(content, cfg, now_ms)
        else:
            pr = parse_op.parse_segment(content, cfg, now_ms)
        parse_text = self._write(pr["parse_text"], "segments/parse_text",
                                 rnd)
        n_parsed = self._rows_or_count(parse_text)
        parse_data = self._write(pr["parse_data"], "segments/parse_data",
                                 rnd)
        crawl_parse = pr["crawl_parse"].unionByName(linked_redir)
        self._metric(rnd, "parse", rows=n_parsed,
                     sec=time.time() - t0)

        # URL-seen bloom pre-split (north rule's partitioned-bloom
        # URL-seen layer): discovered linked rows that the previous
        # round's bloom rules out are DEFINITELY not in the frontier,
        # so they go through a db-less updatedb aggregation and never
        # enter the frontier merge — only bloom hits (true seen +
        # ~fpp false positives, which the merge itself resolves
        # exactly) reach the 10^10-row db join. Correctness is exact:
        # blooms have no false negatives, and the split is skipped in
        # normalize/filter mode where message urls may re-key into
        # frontier urls after the split decision.
        t0 = time.time()
        messages = crawl_fetch.drop("queue_id", "virtual_time") \
            .unionByName(crawl_parse)
        # the message stream feeds several plan branches (bloom split,
        # frontier merge, db-less fresh merge) — without a persist each
        # branch re-derives it from the parse/fetch frames, and the
        # duplicated subtrees multiply the round's compute
        messages = messages.persist(StorageLevel.MEMORY_AND_DISK)
        bloom = self._load_bloom(rnd - 1)
        can_split = (bloom is not None and not cfg.db_update_normalize
                     and not cfg.db_update_filter)
        if can_split:
            linked = messages.where(F.col("status") == S.STATUS_LINKED)
            others = messages.where(F.col("status") != S.STATUS_LINKED)
            new_rows, maybe = self._split_seen(linked, bloom)
            self.debug_split = {"new": new_rows, "maybe": maybe}
            merged = update_op.updatedb(db, others.unionByName(maybe),
                                        cfg, now_ms)
            # fresh urls: same state machine, no frontier side at all
            # (old = null ⇒ the link_new branch; additions_allowed
            # off drops them exactly as the merge would)
            fresh = update_op.updatedb(None, new_rows, cfg, now_ms)
            new_db = merged.unionByName(fresh)
        else:
            new_db = update_op.updatedb(db, messages, cfg, now_ms)
        # dedup references its input TWICE (crawldb ⋈ marked losers),
        # which would duplicate — and re-execute — the entire merge
        # subtree inside one plan; materialize the merge once
        new_db = new_db.persist(StorageLevel.MEMORY_AND_DISK)
        merge_cached = new_db
        new_db = dedup_op.dedup(new_db)
        # plan introspection for tests/bench: the pre-write frames whose
        # physical plans carry the round's shuffle structure
        self.debug_plans = {"updatedb": new_db, "schedule": fr["schedule"]}
        t_updatedb = time.time() - t0

        t0 = time.time()
        edges = parse_op.outlink_edges(parse_data)
        ldb = linkdb_op.invert_links(edges, cfg)
        ldb = self._write(ldb, "linkdb", rnd)
        self._metric(rnd, "invertlinks", rows=self._rows_or_count(ldb),
                     sec=time.time() - t0)

        # link-analysis scoring (bin/crawl:260-277 — the webgraph →
        # linkrank → scoreupdater steps the reference ships commented
        # out; enabled here by scoring_filter="link"): ranks computed
        # on this round's link graph replace the crawldb scores before
        # the snapshot commits, so the NEXT generate orders by LinkRank
        if cfg.scoring_filter == "link" and self.linkrank_every > 0 \
                and rnd % self.linkrank_every == 0:
            t0 = time.time()
            raw_edges = edges.select("from_url", "to_url")
            loops = linkdb_op.find_loops(raw_edges, depth=2)
            ranks = linkdb_op.linkrank(
                raw_edges, iterations=self.linkrank_iterations,
                loops=loops)
            nodedb = ranks  # (url, score) is all score_updater needs
            new_db = linkdb_op.score_updater(new_db, nodedb)
            self._metric(rnd, "linkrank", rows=ranks.count(),
                         sec=time.time() - t0)

        # stage (durable, uncommitted) — the crawldb snapshot is the
        # resume marker, so its COMMIT must be the round's last write:
        # a crash after the commit but before linkdb/bloom would
        # otherwise mark the round done with those products missing.
        # Staging happens AFTER the linkrank branch so link-scoring
        # mode pays exactly ONE bucketed write of the 10^10-row table
        # per round (it used to stage pre- and post-score-update), and
        # BEFORE the index branch so docs/deletes scan the staged table
        # instead of re-executing the updatedb+dedup subtree per write.
        t0 = time.time()
        new_db = self._stage_crawldb(new_db, rnd)
        n_db = self._rows_or_count(new_db)
        self._metric(rnd, "updatedb", rows=n_db,
                     sec=t_updatedb + time.time() - t0)

        # per-round index + clean (bin/crawl:249-256, INDEXFLAG): the
        # IndexingJob's doc emission over this round's crawldb ∪ linkdb
        # ∪ segment, plus the delete stream (IndexerMapReduce delete
        # rules ∪ CleaningJob's gone/duplicate scan) — materialized as
        # the docs/deletes tables, the engine's analog of the Solr/ES
        # sink (SURVEY §2.7 IndexerMapReduce row)
        if cfg.index_enabled:
            t0 = time.time()
            docs, _ = self._index_products(
                rnd, new_db, ldb, parse_text, parse_data,
                crawl_fetch.drop("queue_id", "virtual_time"), cfg)
            self._metric(rnd, "index", rows=self._rows_or_count(docs),
                         sec=time.time() - t0)

        if self.use_bloom:
            self._write_bloom(new_db, rnd)

        # commit the crawldb snapshot LAST: resume_round() only counts
        # a round done once every per-round product exists
        new_db = self._commit_crawldb(rnd)

        # release the within-round reuse caches (fetch schedule, parse
        # output): every consumer has materialized by now, and persisted
        # blocks would otherwise accumulate across rounds in one session
        for cached in (fr.get("schedule"), pr.get("parsed"),
                       pr.get("content_cache"), messages, merge_cached):
            if cached is not None:
                cached.unpersist()

        return {"fetchlist_rows": n_fl, "fetched_rows": n_fetched,
                "crawldb_rows": n_db}

    def _index_products(self, rnd: int, db: DataFrame, ldb: DataFrame,
                        parse_text: DataFrame, parse_data: DataFrame,
                        crawl_fetch: DataFrame, cfg) -> tuple:
        """IndexingJob's two output streams for one round: the doc
        emission (IndexerMapReduce.reduce → NutchDocument) and the
        delete stream (delete rules ∪ CleaningJob's gone/duplicate
        scan), installed atomically as ``indexes/docs`` and
        ``indexes/deletes``. Shared by the in-round INDEXFLAG step and
        the standalone :meth:`index_round` job."""
        from .operators import readers
        docs = readers.indexer_docs(db, ldb, parse_text, parse_data,
                                    crawl_fetch, cfg)
        docs = self._write(docs, "indexes/docs", rnd)
        dels = readers.indexer_deletes(db, parse_data, crawl_fetch, cfg)
        deletes = dels.unionByName(readers.cleaning_job(db)).distinct()
        deletes = self._write(deletes, "indexes/deletes", rnd)
        return docs, deletes

    def index_round(self, rnd: int | None = None) -> dict:
        """Standalone IndexingJob over an already-committed round
        (JobType.INDEX, ``IndexingJob.java:96-180`` — the reference job
        likewise takes crawldb + linkdb + segment dirs as inputs, so a
        crawl run with ``index_enabled=False`` can be indexed after the
        fact, or re-indexed after a config change). Reads round
        ``rnd``'s committed snapshots and installs the docs/deletes
        tables; defaults to the latest committed round."""
        if rnd is None:
            rnd = self.resume_round()
        if rnd <= 0:
            raise ValueError("no committed round to index")

        def _seg(name: str) -> DataFrame:
            path = self._path(name, rnd)
            if not self._committed(path):
                raise FileNotFoundError(
                    f"round {rnd} has no committed {name}")
            return self.spark.read.parquet(path)

        docs, deletes = self._index_products(
            rnd, self.load_crawldb(rnd), _seg("linkdb"),
            _seg("segments/parse_text"), _seg("segments/parse_data"),
            _seg("segments/crawl_fetch").drop("queue_id",
                                              "virtual_time"),
            self.cfg)
        return {"round": rnd, "docs_rows": self._rows_or_count(docs),
                "deletes_rows": self._rows_or_count(deletes)}

    def _clock_path(self) -> str:
        return os.path.join(self.out, "_crawl.json")

    def _load_or_pin_start(self, start_ms: int | None) -> int:
        """The virtual clock's epoch is pinned on first use and reused
        on resume: resumed rounds must run on the SAME clock as the
        committed ones, or fetch_time / re-fetch comparisons against
        pre-crash snapshots stop being deterministic."""
        path = self._clock_path()
        if os.path.isfile(path):
            with open(path) as f:
                return int(json.load(f)["start_ms"])
        now = start_ms if start_ms is not None else int(time.time() * 1000)
        os.makedirs(self.out, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"start_ms": now}, f)
        return now

    def crawl(self, seeds: DataFrame, rounds: int,
              start_ms: int | None = None,
              round_ms: int = 24 * 3600 * 1000) -> DataFrame:
        """Full crawl; virtual clock advances one ``round_ms`` per
        round so re-fetch scheduling behaves deterministically (the
        epoch persists in ``_crawl.json`` and survives resume)."""
        now = self._load_or_pin_start(start_ms)
        # resume: completed rounds are skipped — a crash between stage
        # commits restarts its round from the last committed crawldb
        # snapshot (per-round checkpoints, north-rule resumability)
        done = self.resume_round()
        if done <= 0:
            self.inject(seeds, now)
        for r in range(max(1, done + 1), rounds + 1):
            stats = self.run_round(r, now + r * round_ms)
            if stats["fetchlist_rows"] == 0:
                break
        self.flush_metrics()
        return self.load_crawldb(self.resume_round())
