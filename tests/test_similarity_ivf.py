"""IVF ANN: assignment determinism, probe pruning, recall vs brute force."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from endor_blockchain_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign_expr,
    ivf_centroids,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    # three well-separated directions in 4-d + noise members around each
    def v(base, eps):
        return [x + eps for x in base]

    rows = []
    axes = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0], 2: [0.0, 0.0, 1.0, 0.0]}
    for i in range(30):
        rows.append((i, v(axes[i % 3], 0.01 * (i // 3))))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_ivf_centroids_and_assignment(spark, emb):
    cents = ivf_centroids(emb, [0, 1, 2])
    assert [c for c, _ in cents] == [0, 1, 2]
    got = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id", ivf_assign_expr("embedding", cents).alias("bucket")
        ).collect()
    }
    # every vector lands in the bucket of its own axis's centroid
    for i, b in got.items():
        assert b == i % 3, (i, b)


def test_ivf_centroids_missing_id_raises(spark, emb):
    with pytest.raises(ValueError, match="999"):
        ivf_centroids(emb, [0, 999])


def test_ivf_topk_matches_brute_force_within_probed_buckets(spark, emb):
    """With the query aligned to axis 0 and n_probe covering the right
    bucket, IVF top-k == brute-force top-k restricted to probed buckets;
    with n_probe = K it is exactly brute force."""
    q = [1.0, 0.05, 0.0, 0.0]
    cents = ivf_centroids(emb, [0, 1, 2])
    full = {
        (r["vec_id"], r["cos_sim"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    ivf_all = {
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(emb, q, cents, k=5, n_probe=3).collect()
    }
    assert ivf_all == full  # probing every bucket == exact
    # n_probe=1 only surfaces axis-0 bucket members
    narrow = ivf_topk(emb, q, cents, k=5, n_probe=1).collect()
    assert all(r["vec_id"] % 3 == 0 for r in narrow)
    assert len(narrow) == 5


def test_ivf_indexed_partition_pruning(spark, emb, tmp_path):
    """The materialized inverted file turns the probe filter into partition
    pruning: the pruned read returns exactly what the inline operator
    computes, and the scan's PartitionFilters carry the bucket predicate."""
    from endor_blockchain_data_pipeline_spark.operators.similarity import (
        ivf_topk_indexed,
        ivf_write_index,
    )

    cents = ivf_centroids(emb, [0, 1, 2])
    path = str(tmp_path / "ivf_index")
    ivf_write_index(emb, path, cents)

    q = [1.0, 0.05, 0.0, 0.0]
    inline = {
        (r["vec_id"], r["cos_sim"], r["rank"])
        for r in ivf_topk(emb, q, cents, k=5, n_probe=2).collect()
    }
    indexed_df = ivf_topk_indexed(spark, path, q, cents, k=5, n_probe=2)
    indexed = {
        (r["vec_id"], r["cos_sim"], r["rank"]) for r in indexed_df.collect()
    }
    assert indexed == inline
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan.split("PartitionFilters:")[1][:120]


def test_ivf_plan_no_udf(spark, emb):
    cents = ivf_centroids(emb, [0, 1, 2])
    plan = (
        ivf_topk(emb, [1.0, 0.0, 0.0, 0.0], cents, k=3, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
