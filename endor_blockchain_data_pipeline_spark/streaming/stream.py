"""Structured Streaming WAL ingestion.

The reference has no streaming API — it emulates a stream with repeated
batch runs over a watermarked feed (``SparkApplication.scala:49-88`` driven
by cron). This module is the Spark-native upgrade: a file-source
``readStream`` over dropped WAL batch directories (the shape
``export_batch.py`` produces) with ``foreachBatch`` applying each
micro-batch through the SAME exactly-once merge path as the batch job.

Two layers of exactly-once compose here:
- Structured Streaming's checkpoint guarantees each file is offered once
  (epoch tracking in ``checkpointLocation``);
- the engine's batch-id manifest skip-list makes the apply idempotent even
  if ``foreachBatch`` re-delivers after a crash (foreachBatch is
  at-least-once by contract — our commit makes it exactly-once).

At scale: maxFilesPerTrigger bounds micro-batch size; the merge itself is
the same bucket-pruned MoR/CoW apply, so stream vs batch is purely a
scheduling difference (as it should be in a lakehouse engine).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from endor_blockchain_data_pipeline_spark.functions.decode import decode_changes
from endor_blockchain_data_pipeline_spark.operators.merge import merge_batch
from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable

WAL_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_wal_to_table(
    spark: SparkSession,
    wal_dir: str,
    table: ManifestTable,
    checkpoint_dir: str,
    mode: str = "mor",
    max_files_per_trigger: int | None = None,
    lineage=None,
):
    """Start a stream applying dropped WAL batches to ``table``.

    Returns the StreamingQuery; caller stops it / awaits termination.
    """
    reader = (
        spark.readStream.schema(WAL_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(wal_dir)

    def apply_batch(micro: DataFrame, epoch_id: int) -> None:
        if micro.isEmpty():
            return
        # LSN range of this micro-batch gives the deterministic batch id —
        # re-delivery of the same epoch hits the manifest skip-list.
        bounds = micro.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi"), F.count("*").alias("n")
        ).first()
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
        # Epoch-qualified id: micro-batch file grouping varies with trigger
        # settings, so (lo, hi) alone could collide across different file
        # sets; (epoch, bounds, count) is stable for checkpoint re-delivery
        # (same epoch -> same files) yet unique across distinct batches.
        batch_id = f"stream-{epoch_id}-{lo}-{hi}-{int(bounds['n'])}"
        if batch_id in table.committed_batches():
            return
        merge_batch(
            table, micro, batch_id, lo - 1, hi, mode=mode, lineage=lineage,
            decode_fn=decode_changes,
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
