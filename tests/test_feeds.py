"""Feed backends: parquet dir and JSON drops expose the same WAL contract."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from endor_blockchain_data_pipeline_spark.sources.feeds import JsonDirFeed, ParquetFeed
from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal, write_wal_batches


def test_parquet_feed_contract(spark, tmp_path):
    n = 1500
    wal = generate_wal(spark, n, n_convs=16, seed=13)
    write_wal_batches(wal, str(tmp_path / "drops"), batch_size=500, n_events=n)
    feed = ParquetFeed(spark, str(tmp_path / "drops"))
    assert feed.max_lsn() == n - 1
    sl = feed.scan(499, 999)
    assert sl.count() == 500
    assert sl.agg(F.min("lsn"), F.max("lsn")).first() == (500, 999)


def test_json_dir_feed_contract(spark, tmp_path):
    rows = [
        {"lsn": i, "op": "insert", "conv_id": f"c{i%3}", "turn_idx": i % 4,
         "payload": json.dumps({"role": "user", "text": f"t{i}", "ts": "2024-01-01 00:00:00"}),
         "ts": "2024-01-01T00:00:%02d" % (i % 60)}
        for i in range(40)
    ]
    p = tmp_path / "json"
    p.mkdir()
    (p / "drop1.json").write_text("\n".join(json.dumps(r) for r in rows))
    feed = JsonDirFeed(spark, str(p))
    df = feed.df()
    assert dict(df.dtypes)["payload"] == "binary"  # decode-ready blob
    assert feed.max_lsn() == 39
    assert feed.scan(9, 19).count() == 10

    # decodes through the standard path
    from endor_blockchain_data_pipeline_spark.functions.decode import decode_changes

    dec = decode_changes(feed.scan(-1, 39))
    assert dec.where(F.col("text").isNull()).count() == 0
    assert dec.count() == 40
