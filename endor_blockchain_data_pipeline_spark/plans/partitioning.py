"""Physical-parallelism helpers for row-multiplying operators.

Spark sizes scan partitions by INPUT bytes (``maxPartitionBytes``), which is
right for scans but wrong ahead of a fan-out: a k-shingle explode multiplies
rows ~(len(text)-k)x, so a compact-but-dense table (one parquet file at
small scale, a few files after compaction) funnels the whole explode +
hash + partial-agg pipeline through a handful of cores while the rest of
the cluster idles. Measured here: the same MinHash signature job over a
single-partition scan ran 9x slower than over 32 partitions — the shuffle
that fixes it moves only the compact pre-explode rows.

At 100 TB the table has thousands of files and the scan is already wide —
the helper is a no-op there (the check is on the PLANNED partition count,
not table size), so it never adds a shuffle where the layout provides
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Cut the lineage and pin the result for plans that read it more than
    once (self-joins over derived tables, iterative loops).

    Default: ``localCheckpoint`` — executor-local memory+disk blocks, the
    fastest option, but blocks die with their executor. If the session has
    a reliable checkpoint directory configured
    (``sc.setCheckpointDir(hdfs_path)`` on a real cluster), this switches
    to ``checkpoint()`` automatically: same call shape, executor-loss
    resilient. Operators call this instead of hardcoding either mode, so
    one deployment setting flips the whole engine.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def parallelize_for_fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a compact input ahead of a row-multiplying
    explode, if (and only if) the planned scan is narrower than the target.

    ``min_partitions`` defaults to the session's default parallelism (the
    core count in local mode, cluster cores otherwise). ``df.rdd`` compiles
    the plan to inspect its partitioning but launches no job.
    """
    if df.isStreaming:  # .rdd is illegal on streaming plans; micro-batch
        return df       # sizing is the trigger's job, not a repartition's
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
