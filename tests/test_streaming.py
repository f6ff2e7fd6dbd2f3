"""Structured Streaming ingestion: file-drop WAL -> foreachBatch merge."""

from __future__ import annotations

import pyspark.sql.functions as F

from endor_blockchain_data_pipeline_spark.functions.decode import decode_changes
from endor_blockchain_data_pipeline_spark.job import brute_force_state
from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable
from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal, write_wal_batches
from endor_blockchain_data_pipeline_spark.streaming.stream import stream_wal_to_table

from tests.conftest import assert_df_equal


def test_stream_apply_equals_oracle(spark, tmp_path):
    n = 2000
    wal = generate_wal(spark, n, n_convs=32, max_turns=6, seed=21, tool_from_lsn=1000)
    wal_dir = str(tmp_path / "drops")
    ranges = write_wal_batches(wal, wal_dir, batch_size=500, n_events=n)
    assert len(ranges) == 4

    table = ManifestTable(str(tmp_path / "tbl"), n_buckets=4)
    q = stream_wal_to_table(
        spark, wal_dir, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        mode="mor", max_files_per_trigger=2,
    )
    q.awaitTermination(120)

    oracle = brute_force_state(decode_changes(wal))
    assert_df_equal(table.read(spark), oracle)

    # restart the stream over the same checkpoint: no new data, no new commits
    v = table.current_version()
    q2 = stream_wal_to_table(
        spark, wal_dir, table, checkpoint_dir=str(tmp_path / "ckpt"), mode="mor"
    )
    q2.awaitTermination(60)
    assert table.current_version() == v

    # drop one more batch file -> only it gets applied
    more = generate_wal(spark, n + 600, n_convs=32, max_turns=6, seed=21, tool_from_lsn=1000)
    late = more.where(F.col("lsn") >= n)
    late.write.mode("overwrite").parquet(f"{wal_dir}/batch-{n-1}-{n+599}")
    q3 = stream_wal_to_table(
        spark, wal_dir, table, checkpoint_dir=str(tmp_path / "ckpt"), mode="mor"
    )
    q3.awaitTermination(60)
    assert_df_equal(table.read(spark), brute_force_state(decode_changes(more)))
