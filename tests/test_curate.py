"""End-to-end corpus-curation funnel: every stage drops exactly the doc
constructed to fail it, the verdict table explains each drop, and the
packed output covers exactly the survivors."""

import pyspark.sql.functions as F
import pytest


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun and everyone naps"
)
CONTAMINATED = (
    "yet another unrelated document mentioning broadcast joins bucketing "
    "and watermark semantics for streams in production today"
)
GOOD = (
    "completely different text about spark shuffles and parquet files and "
    "adaptive query execution plans at cluster scale"
)
MIXED_OUT = (
    "ein ganz anderes dokument ueber verteilte systeme und ihre planung "
    "mit vielen unterschiedlichen woertern im korpus"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE, "en"),                                   # survives all
        (1, BASE, "en"),                                   # exact dup of 0
        (3, BASE.replace("afternoon", "morning"), "en"),   # near-dup of 0
        (5, GOOD, "en"),                                   # survives all
        (6, CONTAMINATED, "en"),                           # hits the evalset
        (7, "aa", "en"),                                   # quality junk
        (8, MIXED_OUT, "xx"),                              # mix-sampled out
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_funnel_end_to_end(spark, corpus, tmp_path):
    from endor_blockchain_data_pipeline_spark.operators.curate import curate_corpus

    evalset = spark.createDataFrame(
        [(100, CONTAMINATED)], "doc_id long, text string"
    )
    out = str(tmp_path / "curated")
    funnel = curate_corpus(
        spark, corpus, out, evalset,
        mix_rates={"en": 1.0}, mix_default=0.0,
    )
    assert funnel["input"] == 7
    assert funnel["after_quality"] == 6           # -7 (junk)
    assert funnel["after_exact_dedup"] == 5       # -1 (exact dup)
    assert funnel["after_near_dedup"] == 4        # -3 (near-dup)
    assert funnel["after_decontamination"] == 3   # -6 (eval collision)
    assert funnel["final"] == 2                   # -8 (mix rate 0 for 'xx')
    assert funnel["n_packs"] >= 1

    v = {r["doc_id"]: r for r in spark.read.parquet(f"{out}/verdicts").collect()}
    assert len(v) == 7
    assert not v[7]["quality_pass"]
    assert v[1]["quality_pass"] and not v[1]["exact_keep"]
    assert v[3]["exact_keep"] and not v[3]["near_keep"]
    assert v[6]["near_keep"] and not v[6]["decont_pass"]
    assert v[8]["decont_pass"] and not v[8]["mix_keep"]
    for i in (0, 5):
        assert v[i]["final_keep"]
    # final_keep is exactly the AND of the stage flags, every row
    for r in v.values():
        assert r["final_keep"] == all(
            r[c] for c in
            ("quality_pass", "exact_keep", "near_keep", "decont_pass", "mix_keep")
        )

    packed_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/packed").select("doc_id").collect()
    }
    assert packed_ids == {0, 5}


def test_curate_no_evalset_no_mix(spark, corpus, tmp_path):
    """Optional stages default open: no evalset -> decont passes everyone;
    no rates -> mix passes everyone."""
    from endor_blockchain_data_pipeline_spark.operators.curate import curate_corpus

    out = str(tmp_path / "curated2")
    funnel = curate_corpus(spark, corpus, out)
    assert funnel["after_decontamination"] == funnel["after_near_dedup"] == 4
    assert funnel["final"] == 4  # 0, 5, 6, 8 all keep


def test_curate_cli(spark, corpus, tmp_path):
    """--curate CLI: runs the funnel off parquet inputs and prints it."""
    import subprocess
    import sys

    docs_p = str(tmp_path / "docs.parquet")
    eval_p = str(tmp_path / "eval.parquet")
    out = str(tmp_path / "out")
    corpus.write.parquet(docs_p)
    spark.createDataFrame(
        [(100, CONTAMINATED)], "doc_id long, text string"
    ).write.parquet(eval_p)
    r = subprocess.run(
        [sys.executable, "-m", "endor_blockchain_data_pipeline_spark.job",
         "--curate", f"{docs_p}:{out}:{eval_p}"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("curate:")][-1]
    assert "input=7" in line and "final=3" in line  # no mix rates in CLI


def test_curate_transcripts_from_lake(spark, tmp_path):
    """The CDC->curation bridge: LWW lake state reassembles into per-conv
    documents (stable turn order, tombstones excluded) and runs the same
    funnel keyed by conv_id."""
    from endor_blockchain_data_pipeline_spark.operators.curate import (
        curate_transcripts,
        transcripts_as_documents,
    )
    from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable

    CLOSE = "that is all for today thanks for the help and goodbye"
    turns = [(0, "user", BASE), (1, "assistant", GOOD), (2, "user", CLOSE)]
    rows = []
    # "good-1": committed OUT of turn order; plus a tombstoned turn 3.
    for i, (ti, role, txt) in enumerate(reversed(turns)):
        rows.append(("good-1", ti, role, txt, 10 + i, False))
    rows.append(("good-1", 3, "assistant", "DELETED TURN", 13, True))
    # "dup-1": identical turns in order -> identical transcript -> exact dup.
    for i, (ti, role, txt) in enumerate(turns):
        rows.append(("dup-1", ti, role, txt, 20 + i, False))
    # "junk": one hyper-repetitive turn -> dup-word quality gate drops it.
    rows.append(("junk", 0, "user", " ".join(["spam"] * 40), 30, False))
    state = (
        spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "_lsn long, _deleted boolean",
        )
        .withColumn("_mts", F.col("_lsn"))
        .withColumn("_batch", F.lit("b1"))
    )
    table_dir = str(tmp_path / "tbl")
    t = ManifestTable(table_dir, n_buckets=4)
    t.commit(state, "b1", 0, 99, None)

    # Reassembly: turn order stable regardless of commit order; the
    # tombstoned turn never appears; text is "role: text" lines.
    docs = transcripts_as_documents(t.read(spark))
    row = docs.where(F.col("conv_id") == "good-1").head()
    assert row["n_turns"] == 3
    assert row["text"] == (
        f"user: {BASE}\nassistant: {GOOD}\nuser: {CLOSE}"
    )

    out = str(tmp_path / "cur")
    funnel = curate_transcripts(spark, table_dir, out)
    assert funnel["input"] == 3
    assert funnel["after_quality"] == 2          # -junk
    assert funnel["after_exact_dedup"] == 1      # -dup-1 (== good-1)
    assert funnel["final"] == 1
    kept = spark.read.parquet(f"{out}/packed").select("conv_id").collect()
    # exact dedup keeps the min-id representative: "dup-1" < "good-1"
    assert {r["conv_id"] for r in kept} == {"dup-1"}
