"""LIVE JDBC feed integration (S1) against embedded Derby.

The reference proves its JDBC source with an embedded-MySQL test
(``BlockSummaryPipelineTest.scala:84-99``); this is the same probe against
the Derby engine that ships inside Spark's JVM — a REAL database behind a
real ``spark.read.jdbc`` range-partitioned scan, not plan construction.
"""

from __future__ import annotations

import pytest

from endor_blockchain_data_pipeline_spark.sources.feeds import JdbcFeed
from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal

N = 2000
DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


@pytest.fixture(scope="module")
def derby_wal(spark, tmp_path_factory):
    """Embedded Derby DB holding N WAL rows (loaded driver-side via JDBC —
    simulating the external system that owns the binlog table)."""
    db = str(tmp_path_factory.mktemp("derby") / "waldb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE wal (lsn BIGINT PRIMARY KEY, op VARCHAR(10), "
        "conv_id VARCHAR(32), turn_idx INT, payload BLOB, ts TIMESTAMP)"
    )
    ps = conn.prepareStatement("INSERT INTO wal VALUES (?, ?, ?, ?, ?, ?)")
    rows = generate_wal(spark, N, n_convs=24, max_turns=6, seed=17).collect()
    for r in rows:
        ps.setLong(1, r["lsn"])
        ps.setString(2, r["op"])
        ps.setString(3, r["conv_id"])
        ps.setInt(4, r["turn_idx"])
        if r["payload"] is None:
            ps.setNull(5, jvm.java.sql.Types.BLOB)
        else:
            ps.setBytes(5, bytes(r["payload"]))
        ps.setTimestamp(6, jvm.java.sql.Timestamp.valueOf(str(r["ts"])))
        ps.addBatch()
    ps.executeBatch()
    conn.commit()
    conn.close()
    return url, {tuple(r) for r in rows}


def test_jdbc_feed_live_scan_and_watermark(spark, derby_wal):
    url, src_rows = derby_wal
    feed = JdbcFeed(spark, url, "wal", properties=DERBY_PROPS, num_partitions=4)
    assert feed.max_lsn() == N - 1

    scan = feed.scan(-1, N - 1)
    # the striped read is genuinely partitioned over the probed range
    assert scan.rdd.getNumPartitions() == 4
    got = {tuple(r) for r in scan.collect()}
    assert got == src_rows

    # watermark-bounded incremental slice
    part = feed.scan(499, 999)
    assert part.count() == 500
    assert part.agg({"lsn": "min"}).first()[0] == 500


def test_jdbc_feed_live_cdc_equals_oracle(spark, derby_wal, tmp_path):
    """Full CDC apply fed from the LIVE database equals the replay oracle."""
    from endor_blockchain_data_pipeline_spark.functions.decode import decode_changes
    from endor_blockchain_data_pipeline_spark.job import CDCJob, brute_force_state
    from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable
    from tests.conftest import assert_df_equal

    url, _ = derby_wal
    feed = JdbcFeed(spark, url, "wal", properties=DERBY_PROPS, num_partitions=4)
    wal = feed.scan(-1, feed.max_lsn())
    table = ManifestTable(str(tmp_path / "t"), n_buckets=4)
    job = CDCJob(spark, table, wal, write_mode="mor", compact_threshold=100)
    job.run_to_watermark(batch_size=600)
    oracle = brute_force_state(
        decode_changes(generate_wal(spark, N, n_convs=24, max_turns=6, seed=17))
    )
    assert_df_equal(job.read_state(), oracle)
