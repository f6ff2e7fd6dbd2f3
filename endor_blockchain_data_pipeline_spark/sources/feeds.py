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
- ``BinaryDirFeed`` covers the reference's binary block-file entry point
  (S4: ``spark.read.ethereum(path)`` — a custom FileFormat datasource,
  ``transaction/EthereumTransactionsPipeline.scala:52-54``,
  ``block/EthereumBlocksPipeline.scala:17-19``): here it is Spark's
  built-in ``binaryFile`` source over dropped ``.bin`` block files, each
  holding many length-framed binary change records, decoded by an Arrow
  ``pandas_udf`` and exploded with parent-file provenance — the E1
  "block -> transactions" flatMap shape
  (``EthereumTransactionsPipeline.scala:26-48``).

All backends return the same WAL shape:
``(lsn long, op string, conv_id string, turn_idx int, payload binary, ts timestamp)``.
"""

from __future__ import annotations

import datetime as _dt
import os
import struct

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

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


# ---------------- binary block files (S4) ----------------

_BIN_MAGIC = b"EBW1"
_OPS = ["insert", "update", "delete"]

_BIN_RECORD = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("ts_us", T.LongType()),
    ]
)


def encode_binary_block(records: list[dict]) -> bytes:
    """Length-framed binary block file (the RLP-block analog).

    Layout: magic ``EBW1`` + u32 record count, then per record:
    i64 lsn | u8 op | u16 conv_id len + utf8 | i32 turn_idx |
    i64 ts epoch-micros | i32 payload len (-1 = NULL) + bytes.
    """
    out = [_BIN_MAGIC, struct.pack(">I", len(records))]
    for r in records:
        conv = r["conv_id"].encode("utf-8")
        ts = r["ts"]
        if isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:  # session-UTC naive timestamps
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            ts_us = int(ts.timestamp() * 1_000_000)
        else:
            ts_us = int(ts)
        out.append(
            struct.pack(
                ">qBH", int(r["lsn"]), _OPS.index(r["op"]), len(conv)
            )
        )
        out.append(conv)
        out.append(struct.pack(">iq", int(r["turn_idx"]), ts_us))
        payload = r["payload"]
        if payload is None:
            out.append(struct.pack(">i", -1))
        else:
            out.append(struct.pack(">i", len(payload)))
            out.append(bytes(payload))
    return b"".join(out)


def write_binary_drops(wal: DataFrame, path: str, records_per_file: int = 250) -> int:
    """Host-side producer: dump a WAL DataFrame as dropped ``.bin`` block
    files (``export_batch.py:25-118`` exports 250-block chunks). Driver-side
    Python on purpose — this simulates the EXTERNAL system that feeds the
    engine, not an engine code path. Returns the number of files written."""
    os.makedirs(path, exist_ok=True)
    rows = [r.asDict() for r in wal.orderBy("lsn").collect()]
    n_files = 0
    for i in range(0, len(rows), records_per_file):
        chunk = rows[i : i + records_per_file]
        fname = os.path.join(path, f"block-{chunk[0]['lsn']}-{chunk[-1]['lsn']}.bin")
        with open(fname, "wb") as fh:
            fh.write(encode_binary_block(chunk))
        n_files += 1
    return n_files


@pandas_udf(T.ArrayType(_BIN_RECORD))
def decode_binary_block_arrow(content: pd.Series) -> pd.Series:
    """Arrow-batched block decode: one file blob -> array of change records.

    The vectorized stand-in for the reference's per-block RLP decode
    (``BlockSummary.scala:72-146``): runs executor-side over Arrow batches,
    one Python pass per partition; the caller explodes the arrays (E1).
    """

    def _parse(blob) -> list[dict]:
        b = bytes(blob)
        if b[:4] != _BIN_MAGIC:
            raise ValueError("bad binary block magic")
        (n,) = struct.unpack_from(">I", b, 4)
        off = 8
        recs = []
        for _ in range(n):
            lsn, opc, clen = struct.unpack_from(">qBH", b, off)
            off += 11
            conv = b[off : off + clen].decode("utf-8")
            off += clen
            turn, ts_us = struct.unpack_from(">iq", b, off)
            off += 12
            (plen,) = struct.unpack_from(">i", b, off)
            off += 4
            payload = None
            if plen >= 0:
                payload = b[off : off + plen]
                off += plen
            recs.append(
                {
                    "lsn": lsn,
                    "op": _OPS[opc],
                    "conv_id": conv,
                    "turn_idx": turn,
                    "payload": payload,
                    "ts_us": ts_us,
                }
            )
        return recs

    return content.map(_parse)


class BinaryDirFeed:
    """WAL as dropped binary block files via ``spark.read.format("binaryFile")``.

    The S4 analog: scan file blobs (path/length/modificationTime come free
    for provenance), vectorized-decode each block into its change records,
    explode. Filename globbing keeps non-block files out of the scan.
    """

    def __init__(self, spark: SparkSession, path: str, glob: str = "*.bin") -> None:
        self.spark = spark
        self.path = path
        self.glob = glob

    def df(self) -> DataFrame:
        raw = (
            self.spark.read.format("binaryFile")
            .option("pathGlobFilter", self.glob)
            .option("recursiveFileLookup", "true")
            .load(self.path)
        )
        recs = raw.select(
            F.col("path").alias("_src_file"),
            F.explode(decode_binary_block_arrow(F.col("content"))).alias("r"),
        )
        return recs.select(
            F.col("r.lsn").alias("lsn"),
            F.col("r.op").alias("op"),
            F.col("r.conv_id").alias("conv_id"),
            F.col("r.turn_idx").alias("turn_idx"),
            F.col("r.payload").alias("payload"),
            F.timestamp_micros(F.col("r.ts_us")).alias("ts"),
        )

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
        # positional: identifier case is DB-specific (Derby/Oracle uppercase
        # unquoted aliases, MySQL preserves) — the probe has one column.
        row = probe.first()
        return -1 if row is None or row[0] is None else int(row[0])

    def partition_info(self, lo: int, hi: int) -> dict:
        """The range-partitioning Spark's JDBC reader will stripe with.

        Spark splits ``[lowerBound, upperBound)`` into ``numPartitions``
        equal strides — so the bounds MUST be the batch's REAL LSN range
        (probe ``max_lsn()`` first), never sentinels: with upperBound=2^62
        every actual row lands in stripe 0 and one connection drags the
        whole table while the rest idle. numPartitions is clamped to the
        range width so a small catch-up batch doesn't open hundreds of
        one-row connections.
        """
        lo, hi = int(lo), int(hi)
        width = max(hi - lo, 1)
        return {
            "lowerBound": lo + 1,
            "upperBound": hi + 1,
            "numPartitions": max(1, min(self.num_partitions, width)),
        }

    def scan(self, lo: int, hi: int) -> DataFrame:
        subquery = (
            f"(SELECT lsn, op, conv_id, turn_idx, payload, ts FROM {self.table} "
            f"WHERE lsn > {int(lo)} AND lsn <= {int(hi)}) feed"
        )
        df = self.spark.read.jdbc(
            self.url,
            subquery,
            column="lsn",
            properties=self.properties,
            **self.partition_info(lo, hi),
        )
        # normalize identifier case to the WAL contract (Derby/Oracle
        # uppercase unquoted column names).
        return df.toDF("lsn", "op", "conv_id", "turn_idx", "payload", "ts")
