"""Manifest-based bucketed Parquet lake table (the "lakehouse core").

A small, self-contained Iceberg-style table format: snapshot manifests,
atomic commits, bucket layout, schema merge, time travel. Built because the
sandbox has no Iceberg runtime jar; the API is shaped so a real
``iceberg-spark-runtime`` catalog + ``MERGE INTO`` backend could be slotted
in where available.

Reference parity:
- replaces the reference's two-stage inbox/onboarded lake with `_SUCCESS`
  markers and delete-inbox-before-write idempotency
  (``storage/sources/DataSources.scala:8-13``,
  ``storage/dataset/FileSystemDatasetStore.scala:12-28``,
  ``EthereumTransactionsPipeline.scala:51``) by a strictly stronger
  protocol: data files are written under a unique commit directory, then a
  JSON manifest listing exactly the live files is atomically renamed into
  place. Readers only trust manifested files, so a crashed half-write is
  invisible (the reference's `_SUCCESS` probe, ``FileSystemDatasetStore.scala:26-28``).
- schema projection on read + internal-column dropping mirrors
  ``storage/dataset/DatasetStore.scala:43-57`` (select exactly the logical
  columns; physical files may carry more).
- batch-id filtered reads mirror ``BatchLoadOption.UseExactly/UseExcept``
  (``storage/dataset/DatasetStore.scala:11-23,37-41``).

Layout::

    <root>/
      _manifests/v00000001.json      # snapshot: files per bucket, schema,
                                     # batch_id, lsn range, stats
      data/<commit-uuid>/_bucket=K/part-*.parquet

Bucketing: ``bucket = pmod(xxhash64(conv_id), n_buckets)`` — a pure function
of the key, recomputable on read (so explicit file-list reads need no
partition-dir inference). MERGE touches only the buckets present in a batch:
manifest-level file pruning, no directory listing. At 100 TB you would run
n_buckets in the thousands; the manifest stays tiny (file lists, not data).

Scale notes: the atomic-commit primitive is ``os.rename`` (atomic on POSIX
and HDFS). On S3 you would swap ``_rename_commit`` for a conditional PUT /
catalog swap — single writer is assumed here, as in the reference.

Internal columns (never visible to readers unless asked):
  _lsn long        — LSN of the winning change for the row
  _mts timestamp   — mutation wall-clock of the winning change (LWW tiebreak)
  _deleted boolean — tombstone flag (survives until compaction)
  _batch string    — commit batch id (lineage / batch-filtered reads)
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

INTERNAL_COLS = ["_lsn", "_mts", "_deleted", "_batch"]


def bucket_expr(key_col: str, n_buckets: int) -> F.Column:
    """bucket = pmod(xxhash64(key), n) — the key-partitioned MERGE routing."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _schema_to_json(schema: T.StructType) -> str:
    return schema.json()


def _schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(json.loads(s))


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Additive schema merge: old field order preserved, new fields appended.

    Mirrors Iceberg's add-column evolution and the reference's
    "encoder schema is the contract" reads (``DatasetStore.scala:52-56``).
    Type changes are rejected (only additive evolution is supported).
    """
    fields = list(old.fields)
    names = {f.name for f in fields}
    for f in new.fields:
        if f.name in names:
            old_f = next(x for x in fields if x.name == f.name)
            if old_f.dataType != f.dataType:
                raise ValueError(
                    f"non-additive schema change on column {f.name!r}: "
                    f"{old_f.dataType} -> {f.dataType}"
                )
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


class ManifestTable:
    """Snapshot-committed bucketed Parquet table with LWW-merge support."""

    def __init__(
        self,
        path: str,
        n_buckets: int = 16,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        bucket_key: str = "conv_id",
    ) -> None:
        self.path = path
        self.n_buckets = n_buckets
        self.key_cols = tuple(key_cols)
        self.bucket_key = bucket_key
        self._manifest_dir = os.path.join(path, "_manifests")
        self._data_dir = os.path.join(path, "data")
        os.makedirs(self._manifest_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)

    # ---------------- snapshot/manifest plumbing ----------------

    def _manifest_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self._manifest_dir) if f.startswith("v") and f.endswith(".json")
        )

    def current_version(self) -> int:
        mf = self._manifest_files()
        return int(mf[-1][1:-5]) if mf else 0

    def manifest(self, version: int | None = None) -> dict | None:
        """Load a snapshot manifest (latest by default) — time travel hook."""
        if version is None:
            version = self.current_version()
        if version <= 0:
            return None
        with open(os.path.join(self._manifest_dir, f"v{version:08d}.json")) as fh:
            return json.load(fh)

    def watermark(self) -> int:
        """Sink-side high watermark: max lsn_hi over committed snapshots.

        Analog of ``loadParquet(onBoarded).agg(max(blockNumber))`` with -1
        default on first run (``BlockSummaryPipeline.scala:61-66``) — but
        O(1) from the manifest instead of a full-table scan+agg: at 100 TB
        you do not want a scan job just to find the watermark.
        """
        m = self.manifest()
        return int(m["lsn_hi"]) if m else -1

    def committed_batches(self) -> set[str]:
        """Batch ids already applied (exactly-once replay skip-list)."""
        out: set[str] = set()
        for name in self._manifest_files():
            with open(os.path.join(self._manifest_dir, name)) as fh:
                out.add(json.load(fh)["batch_id"])
        return out

    def schema(self, with_internal: bool = True) -> T.StructType | None:
        m = self.manifest()
        if m is None:
            return None
        s = _schema_from_json(m["schema"])
        if with_internal:
            return s
        return T.StructType([f for f in s.fields if f.name not in INTERNAL_COLS])

    # ---------------- read path ----------------

    def read(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        with_internal: bool = False,
        version: int | None = None,
        batch_ids: list[str] | None = None,
        exclude_batch_ids: list[str] | None = None,
    ) -> DataFrame:
        """Snapshot read of manifested files only, with bucket pruning.

        - ``buckets``: manifest-level file pruning (the key-partitioned MERGE
          read path) — only those buckets' files are handed to the scan.
        - ``with_internal=False``: schema projection on read — drop internal
          columns and tombstones (``DatasetStore.scala:52-57`` analog).
        - ``batch_ids``/``exclude_batch_ids``: BatchLoadOption analog
          (``DatasetStore.scala:37-41``).
        - ``version``: time travel to an older snapshot.
        """
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        schema = _schema_from_json(m["schema"])
        gens = m.get("bucket_gens", {})
        files: list[str] = []
        needs_merge = False
        for b, flist in m["buckets"].items():
            if buckets is None or int(b) in set(buckets):
                files.extend(os.path.join(self.path, f) for f in flist)
                if gens.get(b, 1) > 1:
                    needs_merge = True
        if not files:
            df = spark.createDataFrame([], schema)
        else:
            # Explicit schema: old files missing newly-added columns read as
            # null (additive evolution); extra physical cols are projected out.
            df = spark.read.schema(schema).parquet(*files)
        if batch_ids is not None:
            df = df.where(F.col("_batch").isin(batch_ids))
        if exclude_batch_ids is not None:
            df = df.where(~F.col("_batch").isin(exclude_batch_ids))
        if needs_merge:
            # Merge-on-read: LWW across file generations — narrow winner
            # selection (fixed-width HashAggregate) + join-back on the
            # globally-unique _lsn; tombstone winners survive as tombstones.
            key_cols = list(m.get("key_cols", self.key_cols))
            winners = (
                df.select(*key_cols, "_lsn")
                .groupBy(*key_cols)
                .agg(F.max("_lsn").alias("_win_lsn"))
                .select("_win_lsn")
            )
            df = df.join(
                F.broadcast(winners), df["_lsn"] == winners["_win_lsn"], "inner"
            ).drop("_win_lsn")
        if not with_internal:
            df = df.where(~F.col("_deleted")).drop(*INTERNAL_COLS)
        return df

    def multi_gen_buckets(self, threshold: int = 2) -> list[int]:
        """Buckets whose generation count >= threshold (compaction queue)."""
        m = self.manifest()
        if m is None:
            return []
        return [int(b) for b, g in m.get("bucket_gens", {}).items() if g >= threshold]

    # ---------------- write path ----------------

    def commit(
        self,
        df: DataFrame,
        batch_id: str,
        lsn_lo: int,
        lsn_hi: int,
        replaced_buckets: list[int] | None,
        stats: dict | None = None,
        mode: str = "replace",
    ) -> dict:
        """Atomically commit ``df`` into the table.

        ``mode="replace"`` (copy-on-write / compaction): the new files become
        the ONLY content of ``replaced_buckets`` (None = whole table).
        ``mode="append"`` (merge-on-read): the new files are appended as an
        extra *generation* of their buckets; readers LWW-merge generations.

        Protocol (the delete-inbox-then-append dance done right):
          1. write data files under a fresh ``data/<uuid>/`` directory,
             hash-partitioned by ``_bucket`` (dir-per-bucket);
          2. build the next manifest = previous buckets -/+ new files;
          3. ``os.rename`` the manifest into place (the commit point).
        A crash before (3) leaves orphan files that no reader sees; replay of
        the same batch_id is skipped upstream via ``committed_batches``.
        """
        staged = self.stage(df, batch_id)
        return self.commit_staged(
            staged, batch_id, lsn_lo, lsn_hi, replaced_buckets, stats, mode
        )

    def stage(self, df: DataFrame, batch_id: str) -> dict:
        """Write the batch's data files WITHOUT committing them.

        This is the heavy, fully-parallel part — safe to run concurrently for
        several batches (pipelining): staged files are invisible until a
        manifest references them. Returns the staged-state handle for
        ``commit_staged``.
        """
        if "_bucket" not in df.columns:
            df = df.withColumn("_bucket", bucket_expr(self.bucket_key, self.n_buckets))

        import concurrent.futures as _cf
        import time as _time

        _timing = os.environ.get("ENDOR_MERGE_TIMING") == "1"
        _t0 = _time.time()
        commit_id = uuid.uuid4().hex[:12]
        commit_dir = os.path.join(self._data_dir, commit_id)
        # partitionBy gives dir-per-bucket; repartition by _bucket first so a
        # bucket's rows land in few files (AQE coalesces small shuffles).
        df.repartition("_bucket").write.mode("overwrite").partitionBy("_bucket").parquet(commit_dir)
        if _timing:
            print(f"[commit {batch_id}] write: {_time.time()-_t0:.2f}s", flush=True)

        # Collect the written files per bucket (driver-side listing of ONE
        # commit dir — bounded by this batch's bucket count, not table size).
        # Per-bucket row counts and _lsn ranges come free from the parquet
        # footers — no Spark job needed; footers read in a thread pool.
        import pyarrow.parquet as _pq

        def _stat_bucket(entry: str):
            b = entry.split("=", 1)[1]
            bdir = os.path.join(commit_dir, entry)
            files = [f for f in os.listdir(bdir) if f.endswith(".parquet")]
            rel = [os.path.relpath(os.path.join(bdir, f), self.path) for f in files]
            n_rows, mn, mx = 0, None, None
            for f in files:
                md = _pq.ParquetFile(os.path.join(bdir, f)).metadata
                n_rows += md.num_rows
                try:
                    idx = md.schema.names.index("_lsn")
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is not None and st.has_min_max:
                            mn = st.min if mn is None else min(mn, st.min)
                            mx = st.max if mx is None else max(mx, st.max)
                except ValueError:
                    pass
            return b, rel, {"n_rows": n_rows, "min_lsn": mn, "max_lsn": mx}

        entries = [e for e in os.listdir(commit_dir) if e.startswith("_bucket=")]
        new_buckets: dict[str, list[str]] = {}
        bucket_stats: dict[str, dict] = {}
        with _cf.ThreadPoolExecutor(max_workers=16) as pool:
            for b, rel, st in pool.map(_stat_bucket, entries):
                new_buckets[b] = rel
                bucket_stats[b] = st

        data_schema = T.StructType([f for f in df.schema.fields if f.name != "_bucket"])
        return {
            "new_buckets": new_buckets,
            "bucket_stats": bucket_stats,
            "data_schema": data_schema,
        }

    def commit_staged(
        self,
        staged: dict,
        batch_id: str,
        lsn_lo: int,
        lsn_hi: int,
        replaced_buckets: list[int] | None,
        stats: dict | None = None,
        mode: str = "replace",
    ) -> dict:
        """Publish staged files atomically (manifest build + rename).

        Driver-side only, milliseconds. Callers pipelining multiple batches
        MUST call this in batch order — the commit lock serializes version
        assignment, ordering is the caller's contract (a later batch
        committed first would advance the watermark over a gap).
        """
        if batch_id in self.committed_batches():
            raise ValueError(f"batch {batch_id!r} already committed (idempotency violation)")
        new_buckets = staged["new_buckets"]
        bucket_stats = staged["bucket_stats"]
        data_schema = staged["data_schema"]
        prev = self.manifest()
        if prev is None:
            buckets = new_buckets
            schema = data_schema
            gens = {b: 1 for b in new_buckets}
            total = 0
        else:
            schema = merge_schemas(_schema_from_json(prev["schema"]), data_schema)
            buckets = {b: list(fl) for b, fl in prev["buckets"].items()}
            gens = dict(prev.get("bucket_gens", {b: 1 for b in buckets}))
            if mode == "append":
                for b, fl in new_buckets.items():
                    buckets[b] = buckets.get(b, []) + fl
                    gens[b] = gens.get(b, 0) + 1
            else:
                replaced = (
                    set(str(b) for b in replaced_buckets)
                    if replaced_buckets is not None
                    else set(buckets)
                )
                for b in replaced:
                    buckets.pop(b, None)
                    gens.pop(b, None)
                for b, fl in new_buckets.items():
                    buckets[b] = fl
                    gens[b] = 1
            total = prev.get("total_commits", 0)

        version = self.current_version() + 1
        manifest = {
            "version": version,
            "batch_id": batch_id,
            "lsn_lo": lsn_lo,
            "lsn_hi": lsn_hi,
            "schema": _schema_to_json(schema),
            "buckets": buckets,
            "bucket_gens": gens,
            "n_buckets": self.n_buckets,
            "key_cols": list(self.key_cols),
            "bucket_key": self.bucket_key,
            "stats": stats or {},
            "new_bucket_stats": bucket_stats,
            "total_commits": total + 1,
        }
        tmp = os.path.join(self._manifest_dir, f".tmp-{uuid.uuid4().hex[:12]}.json")
        final = os.path.join(self._manifest_dir, f"v{version:08d}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, final)  # the commit point
        return manifest

    # ---------------- maintenance ----------------

    def vacuum(self) -> int:
        """Delete data files unreferenced by the LATEST snapshot (destroys
        time travel to older versions). Returns number of files removed."""
        m = self.manifest()
        live = set()
        if m:
            for fl in m["buckets"].values():
                live.update(fl)
        removed = 0
        for commit in list(os.listdir(self._data_dir)):
            cdir = os.path.join(self._data_dir, commit)
            for sub in list(os.listdir(cdir)):
                sdir = os.path.join(cdir, sub)
                if not os.path.isdir(sdir):
                    continue
                for f in list(os.listdir(sdir)):
                    rel = os.path.relpath(os.path.join(sdir, f), self.path)
                    if f.endswith(".parquet") and rel not in live:
                        os.remove(os.path.join(sdir, f))
                        removed += 1
                if not os.listdir(sdir):
                    os.rmdir(sdir)
            if not os.listdir(cdir):
                os.rmdir(cdir)
        return removed
