"""CLI modes driven as real subprocesses (own JVM, like a user would)."""

from __future__ import annotations

import subprocess
import sys

import pyspark.sql.functions as F


def test_cli_dedup_mode(spark, tmp_path):
    """--dedup runs the whole corpus near-dedup pipeline (MinHash-LSH ->
    connected components -> keep/drop verdict) and writes a verdict parquet
    covering every doc exactly once."""
    out = str(tmp_path / "verdict")
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "endor_blockchain_data_pipeline_spark.job",
            "--dedup",
            f"/root/testdata/sf0.001/documents.parquet:{out}",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dedup:" in r.stdout and "kept" in r.stdout, r.stdout

    verdict = spark.read.parquet(out)
    assert set(verdict.columns) == {"doc_id", "cluster_id", "keep"}
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert verdict.count() == n_docs  # one verdict per doc, none dropped
    assert verdict.select("doc_id").distinct().count() == n_docs
    kept = verdict.where("keep").count()
    assert 0 < kept <= n_docs
    # every cluster keeps exactly its min doc_id
    bad = (
        verdict.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("mn"), F.sum(F.col("keep").cast("int")).alias("k"))
        .where("k <> 1")
        .count()
    )
    assert bad == 0
