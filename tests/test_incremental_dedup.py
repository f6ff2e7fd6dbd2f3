"""Incremental dedup against the persisted band index: equality with the
one-shot resolution, cross-batch dup detection, cluster re-labeling,
idempotent replay, recipe pinning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from endor_blockchain_data_pipeline_spark.operators.dedup import (
    dedup_resolution,
    minhash_candidates,
)
from endor_blockchain_data_pipeline_spark.operators.incremental_dedup import DedupIndex

from tests.conftest import assert_df_equal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


T1 = "the quick brown fox jumps over the lazy dog near the riverbank today"
T2 = "completely different content about distributed query engines and shuffles"
T3 = "yet another unrelated paragraph describing parquet footers and manifests"
T4 = "migratory birds navigate by starlight across continents every autumn"


def test_incremental_equals_oneshot_on_testdata(spark, tmp_path):
    """Split the real documents table into two batches; the incremental
    keep-list must be row-identical to the one-shot resolution over the
    union — the r3 VERDICT done-criterion."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(docs.where(F.col("doc_id") % 2 == 0), "b-even")
    idx.add_batch(docs.where(F.col("doc_id") % 2 == 1), "b-odd")

    oneshot = dedup_resolution(
        docs, minhash_candidates(docs, "text", "doc_id", k_shingle=12, n_hashes=4, n_bands=2)
    )
    assert_df_equal(idx.keep_list(), oneshot)


def test_batch2_near_dups_of_batch1_are_caught(spark, tmp_path):
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(_docs(spark, [(1, T1), (2, T2)]), "b1")
    # doc 10 duplicates doc 1 from the PREVIOUS batch; doc 11 is fresh
    s = idx.add_batch(_docs(spark, [(10, T1), (11, T3)]), "b2")
    assert s["n_pairs"] >= 1

    verdict = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in idx.keep_list().collect()}
    assert verdict[1] == (1, True)
    assert verdict[10] == (1, False)  # cross-batch dup resolved to batch-1 canonical
    assert verdict[2] == (2, True)
    assert verdict[11] == (11, True)


def test_cluster_merge_and_canonical_flip_across_batches(spark, tmp_path):
    """A later batch can (a) merge two existing clusters and (b) introduce a
    smaller id that takes over as canonical — prior members re-label."""
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(_docs(spark, [(20, T1), (21, T2)]), "b1")
    idx.add_batch(_docs(spark, [(30, T4), (31, T2)]), "b2")  # 31 dups 21
    v = {r["doc_id"]: r["cluster_id"] for r in idx.keep_list().collect()}
    assert v[31] == 21 and v[20] == 20 and v[30] == 30

    # batch 3: doc 5 duplicates BOTH T1 and nothing else; doc 6 dups T4.
    # doc 5 < 20 => the (20) cluster's canonical flips to 5.
    idx.add_batch(_docs(spark, [(5, T1), (6, T4)]), "b3")
    verdict = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in idx.keep_list().collect()}
    assert verdict[5] == (5, True)
    assert verdict[20] == (5, False)  # re-labeled: canonical moved to 5
    assert verdict[6] == (6, False) and verdict[30] == (6, False) or (
        verdict[6] == (6, True) and verdict[30] == (6, False)
    )
    # exact statement: min(6,30)=6 is canonical
    assert verdict[30] == (6, False) and verdict[6] == (6, True)

    # equality with one-shot over the union of all three batches
    all_docs = _docs(
        spark, [(20, T1), (21, T2), (30, T4), (31, T2), (5, T1), (6, T4)]
    )
    oneshot = dedup_resolution(
        all_docs,
        minhash_candidates(all_docs, "text", "doc_id", k_shingle=12, n_hashes=4, n_bands=2),
    )
    assert_df_equal(idx.keep_list(), oneshot)


def test_replay_is_idempotent(spark, tmp_path):
    idx = DedupIndex(spark, str(tmp_path / "idx"))
    idx.add_batch(_docs(spark, [(1, T1), (2, T2)]), "b1")
    idx.add_batch(_docs(spark, [(10, T1)]), "b2")
    before = sorted(tuple(r) for r in idx.keep_list().collect())

    s = idx.add_batch(_docs(spark, [(10, T1)]), "b2")  # replay same batch id
    assert s["replayed_bands"] and s["replayed_clusters"]
    after = sorted(tuple(r) for r in idx.keep_list().collect())
    assert before == after


def test_recipe_params_are_pinned(spark, tmp_path):
    idx = DedupIndex(spark, str(tmp_path / "idx"), n_hashes=8, n_bands=4)
    idx.add_batch(_docs(spark, [(1, T1)]), "b1")
    # reopen with omitted params adopts the stored recipe
    idx2 = DedupIndex(spark, str(tmp_path / "idx"))
    assert idx2.params["n_hashes"] == 8 and idx2.params["n_bands"] == 4
    # conflicting explicit params raise
    with pytest.raises(ValueError, match="param conflict"):
        DedupIndex(spark, str(tmp_path / "idx"), n_hashes=4)


def test_pair_bound_enforced(spark, tmp_path):
    idx = DedupIndex(spark, str(tmp_path / "idx"), driver_pair_limit=2)
    # 4 identical docs -> 6 intra pairs > bound of 2
    with pytest.raises(RuntimeError, match="pair count exceeds"):
        idx.add_batch(_docs(spark, [(i, T1) for i in range(4)]), "b1")
