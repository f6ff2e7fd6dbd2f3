"""LWW key-partitioned MERGE — the engine's core operator.

Semantics: for each primary key ``(conv_id, turn_idx)`` the winning row is
the one with the greatest ``(lsn, mutation_ts)``; ``op='delete'`` winners
become tombstones (kept internally until compaction so late replays cannot
resurrect dropped rows).

Reference parity: the reference's per-group argmin/argmax UDAFs
(``ratesaggregation/OpenRateAggregator.scala:9-38``,
``CloseRateAggregator.scala:9-38``) are exactly Spark's built-in
``max_by(struct(payload), struct(order))`` — we use that instead of a custom
UDAF. The reference has no in-feed dedup (append-only assumption); LWW is
the target engine's generalization.

Why ``groupBy().agg(max_by(...))`` and not a window ``row_number``:
hash aggregation gets map-side partial aggregation for free — a hot key
(one conversation receiving millions of updates) is collapsed to ONE row
per map task before the shuffle, so skew never reaches the reducer. A
window function would shuffle every raw row of the hot key to a single
partition first (that's where you'd need salting). For completeness —
and because the north-star calls for it — an explicit two-phase *salted*
reduction is provided (``lww_reduce_salted``) for engines where partial
aggregation is unavailable (e.g. high-cardinality payload aggregation or
collect_list-style merges); tests assert both produce identical results.

Scale: merge cost per batch is O(changed keys + current rows of affected
buckets). Bucket pruning (manifest file lists) keeps the read side narrow;
AQE skew-join splitting covers residual join skew.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable, bucket_expr

# Columns describing a decoded change row (user payload part).
PAYLOAD_COLS = ["role", "text", "tool", "ts"]
KEY_COLS = ["conv_id", "turn_idx"]


def lww_reduce(changes: DataFrame, key_cols: list[str] = KEY_COLS) -> DataFrame:
    """Within-batch LWW: one winner per key by max (lsn, _mts).

    ``max_by(struct(<payload>), struct(lsn, _mts))`` — single shuffle with
    map-side partial aggregation (built-in hot-key defense, see module doc).
    """
    payload = [c for c in changes.columns if c not in key_cols]
    return (
        changes.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), F.struct(F.col("lsn"), F.col("_mts"))
            ).alias("_w")
        )
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def lww_reduce_salted(
    changes: DataFrame, key_cols: list[str] = KEY_COLS, salt_n: int = 16
) -> DataFrame:
    """Explicit two-phase salted LWW reduction (hot-key defense spelled out).

    Phase 1 reduces per ``(key, salt)`` where salt = pmod(xxhash64(lsn), n)
    — a hot conversation's rows spread over ``salt_n`` reducers; phase 2
    reduces the <= salt_n partials per key. Equivalent to ``lww_reduce``
    (property-tested); use when partial aggregation can't help (giant
    payloads, collect-style merges).
    """
    payload = [c for c in changes.columns if c not in key_cols]
    salted = changes.withColumn("_salt", F.pmod(F.xxhash64("lsn"), F.lit(salt_n)).cast("int"))
    phase1 = (
        salted.groupBy(*key_cols, "_salt")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), F.struct(F.col("lsn"), F.col("_mts"))
            ).alias("_w")
        )
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return lww_reduce(phase1, key_cols)


def changes_to_state(reduced: DataFrame, batch_id: str) -> DataFrame:
    """Decoded per-key winners -> internal state rows (tombstones kept)."""
    return reduced.select(
        *KEY_COLS,
        *[F.col(c) for c in PAYLOAD_COLS if c in reduced.columns],
        F.col("lsn").alias("_lsn"),
        F.col("_mts"),
        (F.col("op") == "delete").alias("_deleted"),
        F.lit(batch_id).alias("_batch"),
    )


def merge_batch(
    table: ManifestTable,
    changes: DataFrame,
    batch_id: str,
    lsn_lo: int,
    lsn_hi: int,
    salted: bool = False,
    salt_n: int = 16,
    lineage=None,
) -> dict:
    """Apply one decoded WAL batch to the table (key-partitioned MERGE).

    1. within-batch LWW reduce (one winner per key);
    2. route winners to buckets; collect the (small, <= n_buckets) affected
       bucket list — manifest-level pruning for the read side;
    3. snapshot-read ONLY those buckets' current rows (internal cols incl.
       tombstones);
    4. union current ∪ new and LWW-reduce again — new rows win on higher
       (lsn, mts); equal keys with stale lsn lose (idempotent re-delivery);
    5. commit the rewritten buckets atomically.

    Returns the commit manifest dict (plus timing in stats).
    """
    t0 = time.time()
    reduced = (lww_reduce_salted(changes, salt_n=salt_n) if salted else lww_reduce(changes))
    new_state = changes_to_state(reduced, batch_id).withColumn(
        "_bucket", bucket_expr(table.bucket_key, table.n_buckets)
    )
    # Persist: used for the bucket list, the merge union, and stats.
    new_state.persist()
    try:
        affected = [r["_bucket"] for r in new_state.select("_bucket").distinct().collect()]
        n_changes = new_state.count()

        if table.manifest() is None:
            merged = new_state
        else:
            current = table.read(
                table_spark(new_state), buckets=affected, with_internal=True
            ).withColumn("_bucket", bucket_expr(table.bucket_key, table.n_buckets))
            combined = current.unionByName(new_state, allowMissingColumns=True)
            payload = [c for c in combined.columns if c not in KEY_COLS]
            merged = (
                combined.groupBy(*KEY_COLS)
                .agg(
                    F.max_by(
                        F.struct(*[F.col(c) for c in payload]),
                        F.struct(F.col("_lsn"), F.col("_mts")),
                    ).alias("_w")
                )
                .select(*KEY_COLS, *[F.col(f"_w.{c}").alias(c) for c in payload])
            )

        stats = {
            "n_changes": n_changes,
            "n_affected_buckets": len(affected),
            "apply_sec": None,  # filled below
        }
        manifest = table.commit(
            merged, batch_id=batch_id, lsn_lo=lsn_lo, lsn_hi=lsn_hi,
            replaced_buckets=affected, stats=stats,
        )
        apply_sec = round(time.time() - t0, 3)
        manifest["stats"]["apply_sec"] = apply_sec
        if lineage is not None:
            # new_state is still persisted — lineage agg is a cheap reuse.
            lineage.record_batch(new_state, batch_id, lsn_lo, lsn_hi, apply_sec)
        return manifest
    finally:
        new_state.unpersist()


def table_spark(df: DataFrame):
    """SparkSession of a DataFrame (4.x API)."""
    return df.sparkSession


def compact(table: ManifestTable, batch_id: str) -> dict:
    """Full-table compaction: drop tombstones, rewrite every bucket.

    Run once late replays are impossible (WAL watermark passed); restores
    minimal storage. Commits a snapshot replacing ALL buckets.
    """
    spark = None
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    live = table.read(spark, with_internal=True).where(~F.col("_deleted"))
    m = table.commit(
        live, batch_id=batch_id,
        lsn_lo=table.manifest()["lsn_lo"], lsn_hi=table.watermark(),
        replaced_buckets=None, stats={"compaction": True},
    )
    return m
