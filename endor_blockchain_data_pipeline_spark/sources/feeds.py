"""Change-feed sources: one interface, parquet/directory/JDBC backends.

Reference parity (SURVEY.md §2.1 S1/S3/S5):
- ``JdbcFeed`` is the direct analog of the reference's watermark-bounded,
  range-partitioned MySQL tail (``BlockSummaryPipeline.scala:68-84``):
  a single-row max probe plus ``spark.read.jdbc(..., column, lowerBound,
  upperBound, numPartitions)`` with the WHERE range baked in — 200 parallel
  connections in prod, 2 in tests. No database ships in this sandbox, so
  this backend is exercised only through plan construction; its scan shape
  is identical to the tested parquet path.
- ``ParquetFeed`` tails a parquet directory (what the synthetic generator
  and host-side producers drop); lsn predicates push into row-group pruning.
- ``JsonDirFeed`` covers the reference's JSON drops
  (``rates/EthereumRatesPipeline.scala:39-40``) with an explicit schema.

All backends return the same WAL shape:
``(lsn long, op string, conv_id string, turn_idx int, payload binary, ts timestamp)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from endor_blockchain_data_pipeline_spark.sources.wal import ranged_scan, source_max


class ParquetFeed:
    """WAL in a parquet directory (possibly many dropped batch subdirs)."""

    def __init__(self, spark: SparkSession, path: str, recursive: bool = True) -> None:
        self.spark = spark
        self.path = path
        self.recursive = recursive

    def df(self) -> DataFrame:
        r = self.spark.read
        if self.recursive:
            r = r.option("recursiveFileLookup", "true")
        return r.parquet(self.path)

    def max_lsn(self) -> int:
        return source_max(self.df())

    def scan(self, lo: int, hi: int) -> DataFrame:
        return ranged_scan(self.df(), lo, hi)


class JsonDirFeed:
    """WAL as dropped JSON files, read with a DECLARED schema (never infer
    in production — schema drift becomes silent column loss otherwise)."""

    SCHEMA = (
        "lsn long, op string, conv_id string, turn_idx int, "
        "payload string, ts timestamp"
    )

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def df(self) -> DataFrame:
        raw = self.spark.read.schema(self.SCHEMA).json(self.path)
        return raw.withColumn("payload", F.encode(F.col("payload"), "UTF-8"))

    def max_lsn(self) -> int:
        return source_max(self.df())

    def scan(self, lo: int, hi: int) -> DataFrame:
        return ranged_scan(self.df(), lo, hi)


class JdbcFeed:
    """WAL in an RDBMS table — the reference's exact source shape.

    ``scan`` builds the range-partitioned parallel read: Spark issues
    ``numPartitions`` concurrent queries, each covering a slice of
    ``(lo, hi]`` on the monotonic ``lsn`` column; the watermark bounds are
    in the pushed WHERE clause so the DB only ever streams new rows
    (``BlockSummaryPipeline.scala:73-84``).
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        properties: dict[str, str] | None = None,
        num_partitions: int = 200,
    ) -> None:
        self.spark = spark
        self.url = url
        self.table = table
        self.properties = properties or {}
        self.num_partitions = num_partitions

    def max_lsn(self) -> int:
        probe = self.spark.read.jdbc(
            self.url,
            f"(SELECT MAX(lsn) AS max_lsn FROM {self.table}) src_max",
            properties=self.properties,
        )
        row = probe.first()
        return -1 if row is None or row["max_lsn"] is None else int(row["max_lsn"])

    def scan(self, lo: int, hi: int) -> DataFrame:
        subquery = (
            f"(SELECT lsn, op, conv_id, turn_idx, payload, ts FROM {self.table} "
            f"WHERE lsn > {int(lo)} AND lsn <= {int(hi)}) feed"
        )
        return self.spark.read.jdbc(
            self.url,
            subquery,
            column="lsn",
            lowerBound=int(lo) + 1,
            upperBound=int(hi) + 1,
            numPartitions=self.num_partitions,
            properties=self.properties,
        )
