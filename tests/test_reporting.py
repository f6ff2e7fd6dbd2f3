"""Stats rollup (A6), incremental publisher (S8/S11), batch-filtered reads
(S7), and the E2 one-persist multi-output fan-out."""

from __future__ import annotations

import pyspark.sql.functions as F

from endor_blockchain_data_pipeline_spark.functions.decode import decode_changes
from endor_blockchain_data_pipeline_spark.job import CDCJob
from endor_blockchain_data_pipeline_spark.operators.stats import (
    publish_incremental,
    stats_rollup,
)
from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable
from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal


def test_stats_rollup_sums_and_dedups(spark):
    """A6 reduce shape: sums + array_distinct(flatten(collect_list))."""
    rows = [
        ("c1", 2, ["search", "python"]),
        ("c1", 3, ["python", "browser"]),
        ("c2", 5, ["none"]),
        ("c2", 7, []),
    ]
    df = spark.createDataFrame(rows, "conv_id string, n int, tools array<string>")
    out = {
        r["conv_id"]: (r["total"], r["tools_used"])
        for r in stats_rollup(
            df, ["conv_id"], {"total": "n"}, "tools", "tools_used"
        ).collect()
    }
    assert out["c1"] == (5, ["browser", "python", "search"])  # deduped + sorted
    assert out["c2"] == (12, ["none"])


def test_publish_incremental_no_duplicates(spark, tmp_path):
    """Three staggered publishes: each appends only rows past the sink's own
    watermark (ElasticsearchDataStatsReporterTest.scala:149-178 analog)."""
    sink = str(tmp_path / "sink")

    def metrics(upto: int):
        return spark.range(0, upto).select(
            F.col("id").alias("seq"),
            F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("published_at"),
            (F.col("id") * 2).alias("metric"),
        )

    assert publish_incremental(spark, metrics(10), sink, "published_at") == 10
    # re-publish the identical source: nothing is newer than the watermark
    assert publish_incremental(spark, metrics(10), sink, "published_at") == 0
    # source grew: only the delta lands
    assert publish_incremental(spark, metrics(25), sink, "published_at") == 15
    got = spark.read.parquet(sink)
    assert got.count() == 25
    assert got.select("seq").distinct().count() == 25  # no dups across runs
    # upper bound keeps "partial day" rows out
    import datetime as dt

    bound = dt.datetime.utcfromtimestamp(1700000000 + 27 * 60)
    assert publish_incremental(spark, metrics(40), sink, "published_at", upper_bound=bound) == 3
    assert spark.read.parquet(sink).count() == 28


def test_batch_filtered_reads(spark, tmp_path):
    """S7 BatchLoadOption analog: batch_ids / exclude_batch_ids reads
    (DatasetStore.scala:37-41, FileSystemDatasetStoreTest.scala:33-46)."""
    wal = generate_wal(spark, 2000, n_convs=32, seed=17)
    t = ManifestTable(str(tmp_path / "t"), n_buckets=4)
    job = CDCJob(spark, t, wal, write_mode="mor", compact_threshold=100)
    job.run_to_watermark(batch_size=1000)  # batches lsn--1-999, lsn-999-1999
    b1, b2 = "lsn--1-999", "lsn-999-1999"
    all_rows = t.read(spark, with_internal=True)
    only_b2 = t.read(spark, with_internal=True, batch_ids=[b2])
    not_b2 = t.read(spark, with_internal=True, exclude_batch_ids=[b2])
    # each filtered read sees exactly that batch's committed winner rows
    # (per-batch counts from the manifests' parquet-footer stats)
    rows_b1 = sum(s["n_rows"] for s in t.manifest(1)["new_bucket_stats"].values())
    rows_b2 = sum(s["n_rows"] for s in t.manifest(2)["new_bucket_stats"].values())
    assert only_b2.count() == rows_b2 > 0
    assert not_b2.count() == rows_b1 > 0
    assert {r["_batch"] for r in only_b2.select("_batch").distinct().collect()} == {b2}
    assert b2 not in {r["_batch"] for r in not_b2.select("_batch").distinct().collect()}
    # the unfiltered read LWW-merges keys updated in BOTH batches
    assert all_rows.count() <= rows_b1 + rows_b2
    # UseExactly with every batch == UseAll
    assert t.read(spark, with_internal=True, batch_ids=[b1, b2]).count() == all_rows.count()


def test_cached_decode_fans_out_three_sinks(spark, tmp_path):
    """E2: ONE persisted decode feeding three outputs (BlockSummaryPipeline.
    scala:90-97 caches the parse and flatMaps 3 child streams)."""
    wal = generate_wal(spark, 1500, n_convs=16, seed=23)
    decoded = decode_changes(wal).persist()
    try:
        n_src = decoded.count()  # materialize the cache once
        # three branches off the same cached parse
        turns = decoded.where(F.col("op") != "delete").select(
            "conv_id", "turn_idx", "role", "text", "ts"
        )
        deletes = decoded.where(F.col("op") == "delete").select("conv_id", "turn_idx", "lsn")
        per_role = decoded.groupBy("role").agg(F.count("*").alias("n"))
        for name, df in [("turns", turns), ("deletes", deletes), ("stats", per_role)]:
            df.write.mode("overwrite").parquet(str(tmp_path / name))
        # plans of all three branches reuse the in-memory relation
        from endor_blockchain_data_pipeline_spark.plans.explain import physical_plan

        for df in (turns, deletes, per_role):
            assert "InMemoryTableScan" in physical_plan(df)
        t = spark.read.parquet(str(tmp_path / "turns"))
        d = spark.read.parquet(str(tmp_path / "deletes"))
        s = spark.read.parquet(str(tmp_path / "stats"))
        assert t.count() + d.count() == n_src
        assert s.agg(F.sum("n")).first()[0] == n_src
    finally:
        decoded.unpersist()


def test_lww_reduce_matches_grouped_map_oracle(spark):
    """A7 grouped-map: applyInPandas as an INDEPENDENT per-key oracle for the
    LWW reduce — the reference computes its test oracle the same way with
    groupByKey.mapGroups (ElasticsearchDataStatsReporterTest.scala:79-88)."""
    import pandas as pd

    wal = generate_wal(spark, 2000, n_convs=24, max_turns=6, seed=41)
    decoded = decode_changes(wal)

    def pick_winner(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(["lsn", "_mts"], ascending=False).head(1)

    oracle = decoded.groupBy("conv_id", "turn_idx").applyInPandas(
        pick_winner, decoded.schema
    )
    from endor_blockchain_data_pipeline_spark.operators.merge import lww_reduce
    from tests.conftest import assert_df_equal

    assert_df_equal(lww_reduce(decoded), oracle)


def test_publish_incremental_scans_source_once(spark, tmp_path):
    """The publish's count comes from an Observation on the write job — the
    source is scanned exactly once (count-then-write would scan twice)."""
    import pyspark.sql.types as T

    sink = str(tmp_path / "sink_once")
    acc = spark.sparkContext.accumulator(0)

    def tick(x):
        acc.add(1)
        return x

    tick_udf = F.udf(tick, T.LongType())
    src = spark.range(0, 100).select(
        tick_udf(F.col("id")).alias("seq"),
        F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("published_at"),
    )
    assert publish_incremental(spark, src, sink, "published_at") == 100
    assert acc.value == 100  # one scan; a double-scan would read 200


def test_publish_incremental_detects_partitioned_sink(spark, tmp_path):
    """A PARTITIONED sink (no top-level *.parquet files) must still yield a
    watermark — a listing-based existence probe would re-append everything."""
    sink = str(tmp_path / "sink_part")

    def metrics(upto: int):
        return spark.range(0, upto).select(
            F.col("id").alias("seq"),
            F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("published_at"),
            (F.col("id") % 3).alias("part"),
        )

    # seed the sink as a PARTITIONED layout
    metrics(10).write.partitionBy("part").parquet(sink)
    # identical source: nothing newer than the sink watermark -> 0 appended
    assert publish_incremental(
        spark, metrics(10), sink, "published_at", partition_by=["part"]
    ) == 0
    assert publish_incremental(
        spark, metrics(25), sink, "published_at", partition_by=["part"]
    ) == 15
    assert spark.read.parquet(sink).select("seq").distinct().count() == 25
