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

    def record_rows(
        self,
        bucket_rows,
        batch_id: str,
        lsn_lo: int,
        lsn_hi: int,
        apply_sec: float,
    ) -> None:
        """Append per-bucket lineage from already-collected discovery rows.

        The merge's bucket-discovery job produces these (<= n_buckets) rows
        anyway; writing them driver-side with pyarrow costs ZERO Spark jobs.
        Counts are source-side (raw change rows per bucket, pre-LWW-reduce) —
        the feed-lineage view: "bucket B received n_rows changes (n_deletes
        deletes) covering LSNs [min_lsn, max_lsn] from batch (lsn_lo, lsn_hi],
        applied in apply_sec".
        """
        import datetime as _dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        now = _dt.datetime.now(_dt.timezone.utc)

        def _i(v):
            return None if v is None else int(v)

        n = len(bucket_rows)
        tbl = pa.table(
            {
                "batch_id": pa.array([batch_id] * n, pa.string()),
                "bucket": pa.array([_i(r["_bucket"]) for r in bucket_rows], pa.int32()),
                "n_rows": pa.array([_i(r["n_rows"]) for r in bucket_rows], pa.int64()),
                "n_deletes": pa.array([_i(r["n_deletes"]) for r in bucket_rows], pa.int64()),
                "min_lsn": pa.array([_i(r["min_lsn"]) for r in bucket_rows], pa.int64()),
                "max_lsn": pa.array([_i(r["max_lsn"]) for r in bucket_rows], pa.int64()),
                "lsn_lo": pa.array([lsn_lo] * n, pa.int64()),
                "lsn_hi": pa.array([lsn_hi] * n, pa.int64()),
                "apply_sec": pa.array([float(apply_sec)] * n, pa.float64()),
                "recorded_at": pa.array([now] * n, pa.timestamp("us", tz="UTC")),
            }
        )
        # Deterministic per-batch file -> replay overwrites, never duplicates.
        bdir = os.path.join(self.path, f"batch-{batch_id}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(tbl, os.path.join(bdir, "part-0.parquet"))

    def read(self, spark: SparkSession) -> DataFrame:
        dirs = [
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if d.startswith("batch-")
        ]
        if not dirs:
            raise FileNotFoundError("no lineage recorded")
        return spark.read.parquet(*dirs)
