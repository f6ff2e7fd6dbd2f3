"""Incremental corpus deduplication against a PERSISTED MinHash-LSH index.

The r3 gap: every dedup entry point recomputed signatures for the WHOLE
corpus, while the engine's own north star is incremental — the CDC core
never rescans onboarded state (the reference's watermark tail,
``blocksummaries/BlockSummaryPipeline.scala:61-84``). A 100-TB curation
pipeline adds a batch and asks "which new docs duplicate the existing
corpus?"; answering that must cost O(batch), not O(corpus).

Design — two ManifestTables under one index root (exactly-once batch
commits, atomic manifests, idempotent replay for free):

- ``bands``    key (doc_id, band_idx): every doc's LSH band rows. A new
  batch computes bands for ITS docs only and appends them (MoR) under the
  batch id; candidate pairs = new bands ⋈ index bands on (band_idx,
  band_key) + the intra-batch self-join. The index side arrives bucketed by
  doc_id and pruned to manifested files — never recomputed.
- ``clusters`` key (doc_id): the current connected-component label per doc
  (cluster_id = min doc_id in the component; singletons carry their own
  id). New pairs fold in via union-find over (new pairs + the member edges
  of AFFECTED clusters only) — labels can only change in a cluster that
  contains a node touched by a new pair, so the fold is O(touched), not
  O(corpus). Updated labels append as a new LWW generation.

Both tables are read with the WINDOW merge strategy: their ``_lsn`` is the
batch sequence number (shared by every row of a batch), so the CDC read
path's unique-lsn broadcast join-back does not apply — the per-key
row_number merge is the correct shape here and shuffles only the index
table's rows.

Invariant (tested): after any batch split, ``keep_list()`` is row-identical
to the one-shot ``dedup_resolution`` over the union of all batches — the
incremental fold is an exact refactoring of global connected components,
because band signatures are per-doc deterministic and the pair set
telescopes (intra(b1) + intra(b2) + cross(b2,b1) = pairs(b1 ∪ b2)).

Scale notes: the pair list and the affected-cluster membership are the
SMALL artifacts (pairs bounded by LSH bucket caps per doc, membership by
touched clusters); both are driver-collected under an explicit bound, the
same adaptive discipline as ``dup_clusters``. ``remove_docs`` handles
takedown/opt-out: tombstone the doc's band + label rows, then re-fold the
labels of its cluster over the REMAINING members (removal can split a
cluster or flip its canonical keeper) — the same O(affected) contract as
``add_batch``.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from endor_blockchain_data_pipeline_spark.operators.dedup import (
    DUP_CLUSTERS_DRIVER_PAIR_LIMIT,
    lsh_bands,
    minhash_signatures,
)
from endor_blockchain_data_pipeline_spark.plans.partitioning import materialize
from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable


class DedupIndex:
    """Persisted incremental near-dup state (band index + cluster labels).

    Signature params are part of the INDEX, not the call: they persist in a
    ``params.json`` sidecar on first use and later opens adopt them; an
    explicit conflicting value raises (bands hashed with different params
    never collide correctly — same rule as the table-layout reconcile).
    """

    PARAMS = ("k_shingle", "n_hashes", "n_bands", "hash_fn")

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        k_shingle: int | None = None,
        n_hashes: int | None = None,
        n_bands: int | None = None,
        hash_fn: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 16,
        driver_pair_limit: int | None = None,
        id_type: str = "long",
        small_commit_rows: int = 0,
    ) -> None:
        if id_type not in ("long", "string"):
            raise ValueError(f"id_type must be 'long' or 'string', got {id_type!r}")
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.id_type = id_type
        # python-side converter matching the declared Spark id type (driver
        # union-find keys, createDataFrame rows)
        self._pyid = int if id_type == "long" else str
        self.driver_pair_limit = (
            DUP_CLUSTERS_DRIVER_PAIR_LIMIT
            if driver_pair_limit is None
            else driver_pair_limit
        )
        passed = {
            "k_shingle": k_shingle,
            "n_hashes": n_hashes,
            "n_bands": n_bands,
            "hash_fn": hash_fn,
        }
        defaults = {"k_shingle": 12, "n_hashes": 4, "n_bands": 2, "hash_fn": "md5_long"}
        os.makedirs(root, exist_ok=True)
        pfile = os.path.join(root, "params.json")
        if os.path.exists(pfile):
            with open(pfile) as fh:
                stored = json.load(fh)
            # id_type is part of the index like the signature recipe (band
            # rows were written with that schema); pre-id_type sidecars are
            # all long-keyed.
            if stored.setdefault("id_type", "long") != id_type:
                raise ValueError(
                    f"dedup-index id_type conflict at {root}: stored="
                    f"{stored['id_type']!r} passed={id_type!r}"
                )
            for k in self.PARAMS:
                if passed[k] is not None and passed[k] != stored[k]:
                    raise ValueError(
                        f"dedup-index param conflict at {root}: {k} stored="
                        f"{stored[k]!r} passed={passed[k]!r}; omit it to "
                        "adopt the stored recipe"
                    )
            self.params = stored
        else:
            self.params = {
                k: defaults[k] if passed[k] is None else passed[k] for k in self.PARAMS
            }
            self.params["id_type"] = id_type
            with open(pfile, "w") as fh:
                json.dump(self.params, fh)
        # unique_lsn=False: these tables stamp _lsn per BATCH, so every read
        # (including compaction's) is forced onto the per-key window merge —
        # the lsn-equality broadcast join-back is unsound here and the table
        # itself now refuses it.
        # small_commit_rows: writer-side fast path for delta-scoped folds
        # (the live-curation near index) — 0 (default) keeps standalone
        # corpus-scale ingestion fully distributed (see ManifestTable).
        self.bands = ManifestTable(
            os.path.join(root, "bands"),
            n_buckets=n_buckets,
            key_cols=(id_col, "band_idx"),
            bucket_key=id_col,
            unique_lsn=False,
            small_commit_rows=small_commit_rows,
        )
        self.clusters = ManifestTable(
            os.path.join(root, "clusters"),
            n_buckets=n_buckets,
            key_cols=(id_col,),
            bucket_key=id_col,
            unique_lsn=False,
            small_commit_rows=small_commit_rows,
        )

    # ---------------- reads ----------------

    def _read(self, table: ManifestTable, **kw) -> DataFrame | None:
        if table.manifest() is None:
            return None
        # _lsn is per-BATCH here (not per-row unique): the tables are opened
        # with unique_lsn=False, which pins every merge — this read's AND
        # compaction's — to the per-key window strategy (the CDC broadcast
        # join-back on lsn equality would be wrong).
        return table.read(self.spark, **kw)

    def maintain(
        self, compact_threshold: int = 8, vacuum_grace_sec: float = 3600.0
    ) -> dict:
        """Bound the index's read amplification: fold any bucket that has
        accumulated ``compact_threshold`` generations (one per ingested
        batch) back to one, then vacuum unreferenced files. Idempotent per
        watermark; run it every N batches like the CDC job's auto-compaction.
        """
        from endor_blockchain_data_pipeline_spark.operators.merge import (
            compact_buckets,
        )

        out = {}
        for name, t in (("bands", self.bands), ("clusters", self.clusters)):
            due = t.multi_gen_buckets(compact_threshold)
            if due:
                compact_buckets(t, self.spark, f"compact-wm{t.watermark()}", due)
            removed = t.vacuum(grace_sec=vacuum_grace_sec)
            out[name] = {"buckets_compacted": len(due), "files_removed": removed}
        return out

    def keep_list(self) -> DataFrame:
        """Corpus-wide verdict: (id, cluster_id, keep) — ``keep`` marks the
        cluster's canonical doc (min id); singletons keep themselves.
        Row-identical to one-shot ``dedup_resolution`` over all ingested
        batches (tested)."""
        cl = self._read(self.clusters)
        if cl is None:
            idt = T.LongType() if self.id_type == "long" else T.StringType()
            schema = T.StructType(
                [
                    T.StructField(self.id_col, idt),
                    T.StructField("cluster_id", idt),
                    T.StructField("keep", T.BooleanType()),
                ]
            )
            return self.spark.createDataFrame([], schema)
        return cl.select(
            F.col(self.id_col),
            F.col("cluster_id"),
            (F.col("cluster_id") == F.col(self.id_col)).alias("keep"),
        )

    # ---------------- the incremental fold ----------------

    def _with_internals(
        self, df: DataFrame, batch_id: str, seq: int, deleted: bool = False
    ) -> DataFrame:
        return df.select(
            "*",
            F.lit(seq).cast("long").alias("_lsn"),
            F.timestamp_seconds(F.lit(seq)).alias("_mts"),
            F.lit(deleted).alias("_deleted"),
            F.lit(batch_id).alias("_batch"),
        )

    def add_batch(self, docs: DataFrame, batch_id: str) -> dict:
        """Ingest one document batch: dedup it against the index + itself,
        append its bands, fold the new pairs into the cluster labels.

        Idempotent per table (batch registry skip), so a crash between the
        two commits resumes cleanly: the pair computation always reads the
        index EXCLUDING this batch id, making replay deterministic whether
        or not the bands commit already landed.
        """
        if (
            batch_id in self.bands.committed_batches()
            and batch_id in self.clusters.committed_batches()
        ):
            # Fully-committed replay: skip the signature/pair/fold compute
            # entirely — O(1), matching what the skip message promises. A
            # PARTIAL replay (bands landed, clusters didn't) still recomputes
            # below, deterministically, to finish the crashed fold.
            return {
                "batch_id": batch_id,
                "fold": "replay",
                "replayed_bands": True,
                "replayed_clusters": True,
            }
        id_col = self.id_col
        p = self.params
        new_bands = materialize(
            lsh_bands(
                minhash_signatures(
                    docs, self.text_col, id_col,
                    p["k_shingle"], p["n_hashes"], p["hash_fn"],
                ),
                id_col,
                p["n_bands"],
            )
        )

        # candidate pairs: cross (new x index) + intra (new x new), both
        # bucket joins on (band_idx, band_key) — never all-pairs.
        intra_a, intra_b = new_bands.alias("a"), new_bands.alias("b")
        pairs = (
            intra_a.join(
                intra_b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
        )
        n_cross = 0
        index = self._read(self.bands, exclude_batch_ids=[batch_id])
        if index is not None:
            idx = index.alias("i")
            cross = (
                new_bands.alias("n")
                .join(
                    idx,
                    (F.col("n.band_idx") == F.col("i.band_idx"))
                    & (F.col("n.band_key") == F.col("i.band_key"))
                    & (F.col(f"n.{id_col}") != F.col(f"i.{id_col}")),
                )
                .select(
                    F.least(F.col(f"n.{id_col}"), F.col(f"i.{id_col}")).alias("id_a"),
                    F.greatest(F.col(f"n.{id_col}"), F.col(f"i.{id_col}")).alias("id_b"),
                )
            )
            pairs = pairs.unionByName(cross)
        # Count rides the materialization (Observation); a limit(n).collect()
        # would run CollectLimit's scale-up job ladder (1, 4, 16, ...
        # partitions — several driver-scheduled jobs) just to probe the size.
        from pyspark.sql import Observation

        obs = Observation()
        pairs = materialize(
            pairs.distinct().observe(obs, F.count("*").alias("n"))
        )
        n_pairs = int(obs.get["n"] or 0)
        if n_pairs > self.driver_pair_limit:
            # Pair set too big for the driver fold: go DISTRIBUTED — same
            # adaptive discipline as dup_clusters, nothing corpus-sized
            # ever reaches the driver.
            return self._add_batch_distributed(docs, batch_id, new_bands, pairs)
        import numpy as np
        import pandas as pd

        from endor_blockchain_data_pipeline_spark.operators.dedup import (
            _arrow_col,
            _min_label_components,
        )

        # Arrow collect (bounded by the limit just checked) — a .collect()
        # pays a per-Row py4j/pickle round-trip
        ptbl = pairs.toArrow()
        p_a, p_b = _arrow_col(ptbl, "id_a"), _arrow_col(ptbl, "id_b")

        # ---- fold pairs into cluster labels (driver connected components
        # over the TOUCHED subgraph only — vectorized min-label
        # propagation, output identical to union-find) ----
        touched = np.unique(np.concatenate([p_a, p_b]))
        m_ids = m_cids = touched[:0]
        cl = self._read(self.clusters)
        if cl is not None and len(touched):
            # affected clusters = clusters containing a touched node; pull
            # their FULL membership (labels can only change there). Two
            # pushed-filter reads of the small clusters table, one collect
            # bounded by affected-cluster membership.
            touched_df = self.spark.createDataFrame(
                pd.DataFrame({id_col: touched}), f"{id_col} {self.id_type}"
            )
            affected_cids = cl.join(
                F.broadcast(touched_df), id_col, "leftsemi"
            ).select("cluster_id").distinct()
            mtbl = (
                cl.join(
                    F.broadcast(affected_cids.withColumnRenamed("cluster_id", "_cid")),
                    cl["cluster_id"] == F.col("_cid"),
                    "leftsemi",
                )
                .select(id_col, "cluster_id")
                .toArrow()
            )
            m_ids = _arrow_col(mtbl, id_col)
            m_cids = _arrow_col(mtbl, "cluster_id")
        # edges = new pairs + (member -> its current label); nodes covers
        # every endpoint, exactly the union-find's parent key set
        nodes, labs = _min_label_components(
            np.concatenate([m_ids, p_a]), np.concatenate([m_cids, p_b])
        )

        # rows to (re)write: every doc of THIS batch + any previously-known
        # member whose label changed. Only the TOUCHED subgraph's labels
        # (pair-bounded) travel through the driver; untouched new docs label
        # themselves BY EXPRESSION off the materialized bands — the r5 path
        # collected every batch doc id (O(batch) driver traffic) just to
        # emit identity labels.
        label_schema = f"{id_col} {self.id_type}, cluster_id {self.id_type}"
        # one row per doc WITHOUT a distinct shuffle: signatures are a
        # groupBy(id) (ids unique), so every doc has exactly one band_idx=0
        # row in the materialized bands
        new_ids_df = new_bands.where(F.col("band_idx") == 0).select(id_col)
        if len(nodes):
            tl = F.broadcast(
                self.spark.createDataFrame(
                    pd.DataFrame({id_col: nodes, "cluster_id": labs}),
                    label_schema,
                )
            )
            labels = new_ids_df.join(
                tl.withColumnRenamed("cluster_id", "_cid"), id_col, "left"
            ).select(
                F.col(id_col),
                F.coalesce("_cid", F.col(id_col)).alias("cluster_id"),
            )
        else:
            labels = new_ids_df.select(
                F.col(id_col), F.col(id_col).alias("cluster_id")
            )
        if len(m_ids):
            new_lab = labs[np.searchsorted(nodes, m_ids)]
            chg = new_lab != m_cids
            if chg.any():
                labels = labels.unionByName(
                    self.spark.createDataFrame(
                        pd.DataFrame(
                            {id_col: m_ids[chg], "cluster_id": new_lab[chg]}
                        ),
                        label_schema,
                    ).join(new_ids_df, id_col, "left_anti")
                )
        return self._commit_batch(
            batch_id,
            new_bands,
            labels,
            {
                "batch_id": batch_id,
                "fold": "driver-union-find",
                # filled from the staged files' parquet footers at commit
                "n_new_docs": None,
                "n_pairs": n_pairs,
                "n_label_writes": None,
            },
        )

    def _add_batch_distributed(
        self, docs: DataFrame, batch_id: str, new_bands: DataFrame, pairs: DataFrame
    ) -> dict:
        """The fold for pair sets beyond the driver bound: pure DataFrames.

        Edges = new pairs + (member -> cluster_id) edges of the AFFECTED
        clusters; ``dup_clusters`` runs its distributed hash-min label
        propagation over them (it would re-choose union-find only if the
        union shrank under the bound). Label rows to write are computed by
        joins — nothing corpus-sized is ever collected.
        """
        id_col = self.id_col
        touched = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        cl = self._read(self.clusters)
        edges = pairs
        members = None
        if cl is not None:
            affected_cids = (
                cl.join(touched, id_col, "leftsemi").select("cluster_id").distinct()
            )
            members = materialize(
                cl.join(
                    affected_cids.withColumnRenamed("cluster_id", "_cid"),
                    cl["cluster_id"] == F.col("_cid"),
                    "leftsemi",
                ).select(id_col, "cluster_id")
            )
            member_edges = members.where(
                F.col(id_col) != F.col("cluster_id")
            ).select(
                F.least(id_col, "cluster_id").alias("id_a"),
                F.greatest(id_col, "cluster_id").alias("id_b"),
            )
            edges = edges.unionByName(member_edges)
        from endor_blockchain_data_pipeline_spark.operators.dedup import dup_clusters

        labels = dup_clusters(edges, driver_pair_limit=self.driver_pair_limit)
        new_rows = (
            docs.select(F.col(id_col))
            .distinct()
            .join(labels, F.col(id_col) == labels["node"], "left")
            .select(
                F.col(id_col),
                F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            )
        )
        out = new_rows
        if members is not None:
            changed = (
                members.withColumnRenamed("cluster_id", "_old")
                .join(labels, F.col(id_col) == labels["node"], "left")
                .select(
                    F.col(id_col),
                    F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
                    F.col("_old"),
                )
                .where(F.col("cluster_id") != F.col("_old"))
                .join(new_rows.select(id_col), id_col, "left_anti")
                .select(id_col, "cluster_id")
            )
            out = out.unionByName(changed)
        return self._commit_batch(
            batch_id,
            new_bands,
            out,
            {"batch_id": batch_id, "fold": "distributed-label-propagation"},
        )

    def _commit_batch(
        self, batch_id: str, new_bands: DataFrame, labels: DataFrame, stats: dict
    ) -> dict:
        return self._commit_frames(
            batch_id,
            lambda seq: self._with_internals(new_bands, batch_id, seq),
            lambda seq: self._with_internals(labels, batch_id, seq),
            stats,
        )

    def _commit_frames(self, batch_id: str, make_bands, make_clusters, stats) -> dict:
        """Publish bands then cluster labels, each idempotent per batch id.

        The two STAGE passes (the heavy, fully-parallel file writes) run
        concurrently — the tables are independent until their manifest
        commits, the same pipelining discipline as the CDC job's MoR
        staging; commits stay ordered (bands first) so a crash window
        always leaves the pair-replay deterministic. ``make_bands`` /
        ``make_clusters`` build the fully-internaled generation frames for
        the chosen sequence number (append rows, tombstones, or a mix).
        """
        import concurrent.futures as _cf

        # Sequence over BOTH tables' watermarks: deriving from bands alone
        # would, after a crash between the two commits, give the replayed
        # clusters generation the same (_lsn, _mts) as the NEXT batch's —
        # and the window merge's (_lsn desc, _mts desc) order would then
        # tie-break arbitrarily between stale and fresh labels.
        seq = max(self.bands.watermark(), self.clusters.watermark()) + 1
        stats = {**stats, "replayed_bands": False, "replayed_clusters": False}
        do_bands = batch_id not in self.bands.committed_batches()
        do_clusters = batch_id not in self.clusters.committed_batches()

        def _staged_rows(staged: dict) -> int:
            return sum(s["n_rows"] for s in staged["bucket_stats"].values())

        with _cf.ThreadPoolExecutor(max_workers=2) as pool:
            fb = (
                pool.submit(self.bands.stage, make_bands(seq), batch_id)
                if do_bands
                else None
            )
            fc = (
                pool.submit(self.clusters.stage, make_clusters(seq), batch_id)
                if do_clusters
                else None
            )
            if fb is not None:
                staged_b = fb.result()
                # doc/label counts come free from the staged parquet footers
                # (no extra count jobs — the r5 driver path collected every
                # batch id partly to report these)
                if stats.get("n_new_docs", 0) is None:
                    stats["n_new_docs"] = _staged_rows(staged_b) // int(
                        self.params["n_bands"]
                    )
                self.bands.commit_staged(
                    staged_b, batch_id, seq, seq, None, mode="append"
                )
            else:
                stats["replayed_bands"] = True
            if fc is not None:
                staged_c = fc.result()
                if stats.get("n_label_writes", 0) is None:
                    stats["n_label_writes"] = _staged_rows(staged_c)
                # the bucket ids this fold's label rows landed in — free
                # driver-side metadata callers reuse to bucket-prune their
                # read-back of exactly these rows (LiveCuration.refresh)
                # without paying a collect_set observation action for it
                stats["label_buckets"] = sorted(
                    int(b) for b in staged_c["new_buckets"]
                )
                self.clusters.commit_staged(
                    staged_c, batch_id, seq, seq, None, mode="append"
                )
            else:
                stats["replayed_clusters"] = True
        return stats

    # ---------------- removal (takedown / opt-out) ----------------

    def remove_docs(self, ids, batch_id: str) -> dict:
        """Take docs OUT of the corpus: tombstone their band rows and label
        rows, then re-fold the labels of every AFFECTED cluster over its
        REMAINING members. Removal can split a cluster (the removed doc may
        have been the only LSH bridge between two subgroups) and can flip
        the canonical keeper (the removed doc may have been the min id), so
        the fold recomputes connected components from the persisted band
        index — scoped to affected-cluster membership, O(affected), never
        O(corpus). Afterwards ``keep_list()`` equals the one-shot
        resolution over the remaining corpus (tested). This is the CDC
        core's delete handling (tombstones win the per-key merge) applied
        to the curation index; re-adding a removed doc later simply
        out-LSNs its tombstones.

        ``ids`` is a list of doc ids or a one-column DataFrame.
        """
        if (
            batch_id in self.bands.committed_batches()
            and batch_id in self.clusters.committed_batches()
        ):
            return {
                "batch_id": batch_id,
                "fold": "replay",
                "replayed_bands": True,
                "replayed_clusters": True,
            }
        id_col = self.id_col
        if isinstance(ids, DataFrame):
            ids_df = ids.select(F.col(id_col).cast(self.id_type)).distinct()
        else:
            ids_df = self.spark.createDataFrame(
                [(self._pyid(i),) for i in sorted(set(ids))],
                f"{id_col} {self.id_type}",
            )
        # Reads EXCLUDE this batch id: replay after a crash between the two
        # commits sees the same pre-removal state either way (the remaining
        # members' rows are never tombstoned by this batch).
        cl = self._read(self.clusters, exclude_batch_ids=[batch_id])
        if cl is None:
            return {"batch_id": batch_id, "fold": "noop-empty-index"}
        bands = self._read(self.bands, exclude_batch_ids=[batch_id])
        ids_b = F.broadcast(ids_df)

        from pyspark.sql import Observation

        affected_cids = (
            cl.join(ids_b, id_col, "leftsemi").select("cluster_id").distinct()
        )
        # One materialization carries the removed/remaining SPLIT as a flag
        # and both side counts as observed sums (r5 paid three separate
        # materializations plus limit(n).collect() probe ladders here).
        obs_m = Observation()
        members = materialize(
            cl.join(
                F.broadcast(affected_cids.withColumnRenamed("cluster_id", "_cid")),
                cl["cluster_id"] == F.col("_cid"),
                "leftsemi",
            )
            .select(id_col, "cluster_id")
            .join(F.broadcast(ids_df.withColumn("_rm0", F.lit(True))), id_col, "left")
            .select(
                id_col,
                "cluster_id",
                F.coalesce("_rm0", F.lit(False)).alias("_rm"),
            )
            .observe(
                obs_m,
                F.sum(F.col("_rm").cast("long")).alias("n_removed"),
                F.sum((~F.col("_rm")).cast("long")).alias("n_remaining"),
            )
        )
        m_stats = obs_m.get
        n_removed = int(m_stats["n_removed"] or 0)
        removed = members.where("_rm").select(id_col, "cluster_id")
        remaining = members.where("NOT _rm").select(id_col, "cluster_id")
        # Candidate edges among the REMAINING affected members, recomputed
        # from the persisted band index (a removed bridge doc contributes no
        # edges): bands semi-join membership, then the banded self-join —
        # the same bucketed shape as add_batch, scoped to touched clusters.
        rb = materialize(
            bands.join(remaining.select(id_col), id_col, "leftsemi")
        )
        a, b = rb.alias("a"), rb.alias("b")
        obs_e = Observation()
        edges = materialize(
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .distinct()
            .observe(obs_e, F.count("*").alias("n"))
        )
        n_edges = int(obs_e.get["n"] or 0)
        tomb_bands = bands.join(ids_b, id_col, "leftsemi")

        limit = self.driver_pair_limit
        if int(m_stats["n_remaining"] or 0) > limit or n_edges > limit:
            return self._remove_docs_distributed(
                batch_id, remaining, edges, tomb_bands, removed, n_removed
            )
        import numpy as np
        import pandas as pd

        from endor_blockchain_data_pipeline_spark.operators.dedup import (
            _arrow_col,
            _min_label_components,
        )

        # Arrow collects (bounded by the limit just checked); then the
        # driver connected components over the remaining affected subgraph
        # only — vectorized min-label propagation, identical to union-find
        # (extra_nodes: edge-less remaining members label themselves)
        rtbl = remaining.toArrow()
        etbl = edges.toArrow()
        r_ids = _arrow_col(rtbl, id_col)
        r_cids = _arrow_col(rtbl, "cluster_id")
        nodes, labs = _min_label_components(
            _arrow_col(etbl, "id_a"), _arrow_col(etbl, "id_b"),
            extra_nodes=r_ids,
        )
        label_schema = f"{id_col} {self.id_type}, cluster_id {self.id_type}"
        n_label_writes = 0
        if len(r_ids):
            new_lab = labs[np.searchsorted(nodes, r_ids)]
            chg = new_lab != r_cids
            n_label_writes = int(chg.sum())
        if n_label_writes:
            live = self.spark.createDataFrame(
                pd.DataFrame({id_col: r_ids[chg], "cluster_id": new_lab[chg]}),
                label_schema,
            )
        else:
            live = self.spark.createDataFrame([], label_schema)
        return self._commit_frames(
            batch_id,
            lambda seq: self._with_internals(tomb_bands, batch_id, seq, deleted=True),
            lambda seq: self._with_internals(live, batch_id, seq).unionByName(
                self._with_internals(
                    removed.select(id_col, "cluster_id"), batch_id, seq, deleted=True
                )
            ),
            {
                "batch_id": batch_id,
                "fold": "driver-union-find",
                "n_removed": n_removed,  # observed on the members action
                "n_label_writes": n_label_writes,
            },
        )

    def _remove_docs_distributed(
        self,
        batch_id: str,
        remaining: DataFrame,
        edges: DataFrame,
        tomb_bands: DataFrame,
        removed: DataFrame,
        n_removed: int,
    ) -> dict:
        """Removal fold beyond the driver bound: label the remaining
        affected subgraph with the distributed hash-min propagation and
        write only the changed labels — nothing corpus-sized collects."""
        from endor_blockchain_data_pipeline_spark.operators.dedup import dup_clusters

        id_col = self.id_col
        # edges arrive distinct + (a<b)-oriented (materialized upstream)
        labels = dup_clusters(
            edges, driver_pair_limit=self.driver_pair_limit,
            assume_distinct=True,
        )
        live = (
            remaining.withColumnRenamed("cluster_id", "_old")
            .join(labels, F.col(id_col) == labels["node"], "left")
            .select(
                F.col(id_col),
                F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
                "_old",
            )
            .where(F.col("cluster_id") != F.col("_old"))
            .select(id_col, "cluster_id")
        )
        return self._commit_frames(
            batch_id,
            lambda seq: self._with_internals(tomb_bands, batch_id, seq, deleted=True),
            lambda seq: self._with_internals(live, batch_id, seq).unionByName(
                self._with_internals(
                    removed.select(id_col, "cluster_id"), batch_id, seq, deleted=True
                )
            ),
            {
                "batch_id": batch_id,
                "fold": "distributed-label-propagation",
                # same stats contract as the driver path: callers must not
                # see a different shape when the size bound flips the fold
                "n_removed": n_removed,  # observed on the members action
                "n_label_writes": None,  # not collected — distributed
            },
        )
