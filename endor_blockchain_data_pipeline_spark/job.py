"""CDC apply job: watermark -> ranged scan -> decode -> MERGE -> lineage.

The driver loop analog of ``SparkApplication.runDriver`` +
``BlockSummaryPipeline.run`` (``infra/spark/SparkApplication.scala:49-88``,
``blocksummaries/BlockSummaryPipeline.scala:55-135``): each ``run_batch`` is
one micro-batch; ``run_to_watermark`` tails the feed until caught up.
Exactly-once: a batch id derives from its (lo, hi] LSN range; committed ids
are skipped on replay (the reference's delete-inbox + `_SUCCESS` dance,
strengthened to atomic manifest commits).

Run under ``spark-submit --py-files endor_blockchain_data_pipeline_spark.zip
-m endor_blockchain_data_pipeline_spark.job`` on a real cluster; the CLI at
the bottom drives the same loop locally.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from endor_blockchain_data_pipeline_spark.functions.decode import (
    decode_changes,
    decode_changes_arrow,
)
from endor_blockchain_data_pipeline_spark.lineage import LineageLog
from endor_blockchain_data_pipeline_spark.operators.merge import lww_reduce, merge_batch
from endor_blockchain_data_pipeline_spark.sources.checkpoint import Checkpoint
from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable
from endor_blockchain_data_pipeline_spark.sources.wal import ranged_scan, source_max


class CDCJob:
    """Tail a WAL feed into a ManifestTable with exactly-once LWW MERGE."""

    def __init__(
        self,
        spark: SparkSession,
        table: ManifestTable,
        wal: DataFrame,
        arrow_decode: bool = False,
        salted: bool = False,
        salt_n: int = 16,
        lineage: bool = True,
    ) -> None:
        self.spark = spark
        self.table = table
        self.wal = wal
        self.checkpoint = Checkpoint(table)
        self.decode = decode_changes_arrow if arrow_decode else decode_changes
        self.salted = salted
        self.salt_n = salt_n
        self.lineage = LineageLog(table.path) if lineage else None

    @staticmethod
    def batch_id_for(lo: int, hi: int) -> str:
        return f"lsn-{lo}-{hi}"

    def run_batch(self, lo: int, hi: int) -> dict | None:
        """Apply the (lo, hi] WAL range. Returns the manifest, or None if the
        batch was already committed (idempotent replay skip)."""
        batch_id = self.batch_id_for(lo, hi)
        if self.checkpoint.is_committed(batch_id):
            return None
        changes = self.decode(ranged_scan(self.wal, lo, hi))
        manifest = merge_batch(
            self.table, changes, batch_id, lo, hi,
            salted=self.salted, salt_n=self.salt_n, lineage=self.lineage,
        )
        self.checkpoint.record(batch_id, hi)
        return manifest

    def run_to_watermark(self, batch_size: int, limit_batches: int | None = None) -> list[dict]:
        """Catch up: sink watermark -> source max in ``batch_size`` steps.

        Resume-from-any-checkpoint falls out: the sink watermark IS the
        latest manifest's lsn_hi, so a restarted job continues exactly where
        the last atomic commit left off.
        """
        results = []
        lo = self.checkpoint.last_lsn()
        hi_max = source_max(self.wal)
        n = 0
        while lo < hi_max:
            hi = min(lo + batch_size, hi_max)
            m = self.run_batch(lo, hi)
            if m is not None:
                results.append(m)
            lo = hi
            n += 1
            if limit_batches is not None and n >= limit_batches:
                break
        return results

    def read_state(self) -> DataFrame:
        """Current logical table state (tombstones dropped, internals hidden)."""
        return self.table.read(self.spark)


def brute_force_state(decoded_wal: DataFrame) -> DataFrame:
    """Replay oracle: one-shot LWW over the WHOLE decoded WAL.

    The test contract (reference analog: ``BlockSummaryPipelineTest.scala:84-99``
    "Will only load new blocks" replay-equality test): incremental apply of
    every batch must equal this single global reduction, with deletes dropped.
    """
    reduced = lww_reduce(decoded_wal)
    return reduced.where(F.col("op") != "delete").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


if __name__ == "__main__":
    import argparse

    from endor_blockchain_data_pipeline_spark.session import get_spark
    from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal

    ap = argparse.ArgumentParser(description="CDC merge-apply job")
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--convs", type=int, default=4096)
    ap.add_argument("--batch-size", type=int, default=250_000)
    ap.add_argument("--table", default="/tmp/endor_cdc_table")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--salted", action="store_true")
    args = ap.parse_args()

    spark = get_spark("endor-cdc-job")
    wal = generate_wal(spark, args.events, n_convs=args.convs)
    table = ManifestTable(args.table, n_buckets=args.buckets)
    job = CDCJob(spark, table, wal, salted=args.salted)
    t0 = time.time()
    commits = job.run_to_watermark(args.batch_size)
    dt = time.time() - t0
    n = args.events
    print(f"applied {len(commits)} batches, {n} events in {dt:.1f}s = {n/dt:,.0f} events/sec")
