"""Per-partition lineage + metrics table.

Analog of the reference's Jobnik progress messages and job-group tagging
(``libraries/jobnik-client/.../Jobnik.scala:94-155``,
``context/CallsiteContext.scala:27-48``) and its ES stats reporter
(``datastats/ElasticsearchDataStatsReporter.scala``), re-expressed as an
append-only parquet metrics table the cluster itself can query.

Rows: one per (batch, bucket): source LSN range, row counts by op, apply
latency. Files are named by batch_id (deterministic) so a replayed batch
overwrites its own lineage instead of duplicating it — idempotent, like
everything else in the commit path.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class LineageLog:
    def __init__(self, table_path: str) -> None:
        self.path = os.path.join(table_path, "_lineage")
        os.makedirs(self.path, exist_ok=True)

    def record_batch(
        self,
        state_df: DataFrame,
        batch_id: str,
        lsn_lo: int,
        lsn_hi: int,
        apply_sec: float,
    ) -> None:
        """Append per-bucket lineage for one applied batch.

        ``state_df`` is the batch's new-state rows (internal cols + _bucket).
        The aggregation is tiny (<= n_buckets rows) — negligible vs the merge.
        """
        per_bucket = (
            state_df.groupBy("_bucket")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("n_deletes"),
                F.min("_lsn").alias("min_lsn"),
                F.max("_lsn").alias("max_lsn"),
            )
            .select(
                F.lit(batch_id).alias("batch_id"),
                F.col("_bucket").alias("bucket"),
                "n_rows",
                "n_deletes",
                "min_lsn",
                "max_lsn",
                F.lit(lsn_lo).alias("lsn_lo"),
                F.lit(lsn_hi).alias("lsn_hi"),
                F.lit(float(apply_sec)).alias("apply_sec"),
                F.current_timestamp().alias("recorded_at"),
            )
        )
        # Deterministic per-batch dir -> replay overwrites, never duplicates.
        per_bucket.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, f"batch-{batch_id}")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        dirs = [
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if d.startswith("batch-")
        ]
        if not dirs:
            raise FileNotFoundError("no lineage recorded")
        return spark.read.parquet(*dirs)
