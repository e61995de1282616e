"""Snapshot-versioned, url-bucketed table storage — the Iceberg stand-in.

On a production cluster the crawldb/pages live in Iceberg tables
partitioned by ``bucket(url, N)`` (north rule); commits are snapshot
pointer swaps, reads can time-travel, and old snapshots expire. The
sandbox has no Iceberg runtime, so :class:`SnapshotTable` reproduces
the exact same contract on what IS available:

- **data layout**: Spark *bucketed* tables (``bucketBy(N, url)`` +
  ``sortBy(url)``) — the engine-visible property Iceberg's bucket
  transform provides: scans carry ``HashPartitioning(url, N)``, so
  url-keyed joins/aggregations against the table run with NO Exchange
  on the table side (a storage-partitioned join);
- **commit protocol**: each snapshot is its own bucketed table dir;
  a ``_table.json`` metadata file lists snapshots and the current
  pointer, and commits are ``os.replace`` pointer swaps — atomic, so a
  crash mid-write leaves the previous snapshot current (Iceberg's
  metadata.json swap);
- **time-travel**: ``read(snapshot_id)`` opens any retained snapshot
  (``VERSION AS OF``);
- **expiry**: ``expire_snapshots(keep_last)`` drops old snapshot
  tables and their data (``expireSnapshots``).

Snapshot tables self-register: a fresh SparkSession (resume after a
crash, a different process) re-creates the catalog entries from the
persisted metadata — schema, bucket spec and location all come from
``_table.json``, never from the session that wrote them.

Reference analog: the crawldb ``current/old`` MapFile install
(CrawlDb.java:155-173) gives atomic replace but neither history nor
bucketed join locality; this layer supplies both.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def partition_lineage(path: str) -> list[dict]:
    """Per-partition lineage for commit records (north rule:
    checkpoints carry per-partition lineage): one entry per parquet
    part file with its row count and byte size, read from the parquet
    FOOTERS — no extra Spark job; resume/audit can verify a snapshot
    partition-by-partition without scanning data."""
    out = []
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return out
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(root, fn)
            try:
                rows = pq.ParquetFile(fp).metadata.num_rows
            except Exception:
                rows = None
            out.append({
                "file": os.path.relpath(fp, path),
                "rows": rows,
                "bytes": os.path.getsize(fp),
            })
    return out


def _quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


class SnapshotTable:
    """One logical table with snapshot history, stored as a family of
    url-bucketed Spark tables under ``base_dir/name/``."""

    def __init__(self, spark: SparkSession, base_dir: str, name: str,
                 bucket_col: str = "url", n_buckets: int = 32,
                 sort: bool = True):
        """``sort``: keep each bucket file sorted by the bucket column
        (Iceberg write-order). Worth it for write-once/join-many
        tables (pages: the SMJ probe side skips its per-round Sort);
        pure write-side cost for tables that are rewritten every round
        and only ever hash-aggregated or filtered (crawldb), which
        pass ``sort=False``."""
        self.spark = spark
        self.name = name
        self.dir = os.path.join(base_dir, name)
        self.bucket_col = bucket_col
        self.n_buckets = n_buckets
        self.sort = sort
        # catalog identifiers must be unique per on-disk table (the
        # session catalog is shared across CrawlRuns/tests)
        digest = hashlib.md5(os.path.abspath(self.dir).encode()) \
            .hexdigest()[:10]
        self._prefix = f"snap_{name}_{digest}"
        # footer lineage captured at stage() time, consumed by
        # publish() (and by callers that want the staged row count
        # without a Spark count job over the just-written files)
        self._staged_lineage: dict[int, list[dict]] = {}

    # --- metadata ------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.dir, "_table.json")

    def _load_meta(self) -> dict:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"snapshots": {}, "current": None,
                    "bucket_col": self.bucket_col,
                    "n_buckets": self.n_buckets}

    def _save_meta(self, meta: dict) -> None:
        """Atomic metadata swap — the commit point (Iceberg's
        metadata.json pointer). ``os.replace`` is atomic on POSIX."""
        os.makedirs(self.dir, exist_ok=True)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def snapshots(self) -> list[int]:
        return sorted(int(k) for k in self._load_meta()["snapshots"])

    def current_id(self) -> int | None:
        return self._load_meta()["current"]

    # --- write path ------------------------------------------------------
    def _table_name(self, snapshot_id: int) -> str:
        return f"{self._prefix}_s{snapshot_id}"

    def stage(self, df: DataFrame, snapshot_id: int) -> DataFrame:
        """Write snapshot data (durable, NOT yet visible): the bucketed
        table for ``snapshot_id`` is materialized but the metadata
        pointer still names the previous snapshot. :meth:`publish`
        makes it current; ``stage``+``publish`` = Iceberg's
        write-then-swap commit. Returns a read of the staged table.

        The write lands in a ``.tmp`` dir first and swaps in only after
        the job completes, so re-staging a snapshot id whose previous
        data feeds the new plan (re-running a crashed round reads
        round N−1 but re-staging round 0 at inject reads round 0) never
        overwrites its own input mid-job."""
        tbl = self._table_name(snapshot_id)
        wtbl = tbl + "_w"
        path = os.path.join(self.dir, f"s{snapshot_id}")
        tmp = path + ".tmp"
        self.spark.sql(f"DROP TABLE IF EXISTS {wtbl}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        # repartition on the bucket expression: Spark's bucket files use
        # the same murmur3 HashPartitioning, so when the upstream plan
        # already ends url-partitioned (the updatedb merge join does)
        # EnsureRequirements elides this exchange; otherwise it is the
        # one unavoidable shuffle of a bucketed write (without it every
        # task writes n_buckets files — file-count explosion at scale)
        w = (df.repartition(self.n_buckets, self.bucket_col)
               .write.mode("overwrite")
               .bucketBy(self.n_buckets, self.bucket_col))
        if self.sort:
            w = w.sortBy(self.bucket_col)
        w.option("path", tmp).saveAsTable(wtbl)
        schema = json.loads(self.spark.table(wtbl).schema.json())
        # swap the completed write into place (data is fully on disk;
        # DROP of an external table removes only the catalog entry)
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        self.spark.sql(f"DROP TABLE IF EXISTS {wtbl}")
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        self._create_external(tbl, schema, path)
        self._staged_lineage[snapshot_id] = partition_lineage(path)
        return self.spark.table(tbl)

    def staged_rows(self, snapshot_id: int) -> int | None:
        """Row count of a snapshot staged THIS session, from the
        parquet footers captured at stage() time — no Spark job. None
        when unknown (not staged here, or a footer was unreadable)."""
        lineage = self._staged_lineage.get(snapshot_id)
        if not lineage or any(p["rows"] is None for p in lineage):
            return None
        return sum(p["rows"] for p in lineage)

    def _create_external(self, tbl: str, schema: dict, path: str,
                         sort: bool | None = None) -> None:
        st = StructType.fromJson(schema)
        cols = ", ".join(f"{_quote(f.name)} {f.dataType.simpleString()}"
                         for f in st.fields)
        bc = _quote(self.bucket_col)
        sorted_by = f"SORTED BY ({bc}) " \
            if (self.sort if sort is None else sort) else ""
        self.spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({bc}) {sorted_by}"
            f"INTO {self.n_buckets} BUCKETS "
            f"LOCATION '{path}'")

    def publish(self, df_schema_src: DataFrame, snapshot_id: int) -> None:
        """Commit: record the staged snapshot in the metadata (with
        per-partition lineage from the parquet footers — north rule:
        checkpoints carry per-partition lineage) and swap the current
        pointer (atomic)."""
        path = os.path.join(self.dir, f"s{snapshot_id}")
        lineage = self._staged_lineage.get(snapshot_id) \
            or partition_lineage(path)
        meta = self._load_meta()
        meta["snapshots"][str(snapshot_id)] = {
            "table": self._table_name(snapshot_id),
            "path": path,
            "schema": json.loads(df_schema_src.schema.json()),
            "n_buckets": self.n_buckets,
            "bucket_col": self.bucket_col,
            "sort": self.sort,
            "rows": sum(p["rows"] or 0 for p in lineage),
            "partitions": lineage,
        }
        meta["current"] = snapshot_id
        self._save_meta(meta)

    def commit(self, df: DataFrame, snapshot_id: int) -> DataFrame:
        """stage + publish in one step."""
        out = self.stage(df, snapshot_id)
        self.publish(out, snapshot_id)
        return out

    # --- read path -----------------------------------------------------
    def _ensure_registered(self, snap: dict) -> None:
        """Re-create the catalog entry from persisted metadata when a
        fresh session resumes over existing snapshot data. The CREATE
        carries the bucket spec, so the re-registered table scans with
        the same storage partitioning as the writing session's."""
        tbl = snap["table"]
        if self.spark.catalog.tableExists(tbl):
            return
        schema = StructType.fromJson(snap["schema"])
        cols = ", ".join(
            f"{_quote(f.name)} {f.dataType.simpleString()}"
            for f in schema.fields)
        bc = _quote(snap["bucket_col"])
        sorted_by = f"SORTED BY ({bc}) " if snap.get("sort", True) else ""
        self.spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({bc}) {sorted_by}"
            f"INTO {snap['n_buckets']} BUCKETS "
            f"LOCATION '{snap['path']}'")

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to ``snapshot_id``
        (Iceberg ``VERSION AS OF``)."""
        meta = self._load_meta()
        sid = meta["current"] if snapshot_id is None else snapshot_id
        if sid is None:
            raise ValueError(f"table {self.name} has no snapshots")
        try:
            snap = meta["snapshots"][str(sid)]
        except KeyError:
            raise ValueError(
                f"table {self.name}: snapshot {sid} not found "
                f"(retained: {self.snapshots()})") from None
        self._ensure_registered(snap)
        return self.spark.table(snap["table"])

    # --- maintenance -----------------------------------------------------
    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots (the current
        one is always retained). Returns the expired ids."""
        meta = self._load_meta()
        ids = sorted(int(k) for k in meta["snapshots"])
        cur = meta["current"]
        keep = set(ids[-keep_last:]) | ({cur} if cur is not None else set())
        expired = [i for i in ids if i not in keep]
        for sid in expired:
            snap = meta["snapshots"].pop(str(sid))
            self.spark.sql(f"DROP TABLE IF EXISTS {snap['table']}")
            shutil.rmtree(snap["path"], ignore_errors=True)
        self._save_meta(meta)
        return expired
