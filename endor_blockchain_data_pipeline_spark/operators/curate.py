"""End-to-end corpus curation: the whole training-data funnel as ONE job.

Composes the engine's curation family in the order a real pipeline runs
it — quality/repetition filtering -> exact dedup -> MinHash-LSH near-dedup
-> benchmark decontamination -> stratified training-mix sampling ->
sequence packing — and materializes a per-document VERDICT table carrying
every stage's keep/drop flag plus the final verdict.

Scale shape:
- Every stage's verdict is computed on the SURVIVORS of the previous
  stage (a true sequential funnel: near-dedup never pays for docs the
  quality filter already killed), then left-joined back so the verdict
  table covers the full input corpus — an auditable record of WHY each
  doc dropped, which is what takedown/compliance reviews ask for.
- The funnel report is ONE aggregation over the verdict table (no
  per-stage count() jobs re-scanning the corpus).
- Stages are the already-scale-shaped operators: fingerprint groupBy,
  banded LSH self-join (never all-pairs), broadcast-side eval grams,
  integer-threshold hash sampling, windowed greedy packing. No stage
  introduces a collect or a global sort.

Reference parity: the reference pipeline has no curation surface; this is
the §2.9 LLM-training-data family composed end-to-end (SURVEY §2.9).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from endor_blockchain_data_pipeline_spark.functions.text import (
    fingerprint_expr,
    pack_documents,
    sample_stratified_expr,
)
from endor_blockchain_data_pipeline_spark.operators.dedup import (
    decontaminate,
    dedup_exact,
    dedup_resolution,
    minhash_candidates,
)
STAGES = ("quality", "exact", "near", "decont", "mix")


def transcripts_as_documents(
    state: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """LWW conversation state -> one document per conversation.

    The bridge between the engine's two halves: the CDC lake's merged
    transcript state becomes a curation corpus. Turn order is made stable
    the same way the replay invariant is checked (``array_sort`` over
    (turn_idx, ...) structs inside ONE aggregation — no global sort;
    turn_idx is unique per conversation post-LWW, so the ordering is
    total). Text is ``role: text`` lines joined by newlines, so the
    repetition signals see real line structure."""
    ordered = F.array_sort(
        F.collect_list(F.struct(turn_col, role_col, text_col))
    )
    lines = F.transform(
        ordered, lambda t: F.concat_ws(": ", t[role_col], t[text_col])
    )
    return state.groupBy(conv_col).agg(
        F.concat_ws("\n", lines).alias("text"),
        F.count("*").alias("n_turns"),
    )


def curate_transcripts(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    evalset: DataFrame | None = None,
    **kw,
) -> dict:
    """Run the curation funnel over a CDC lake table's conversation state:
    read the LWW-merged table, reassemble per-conversation transcripts,
    curate them as documents keyed by ``conv_id``."""
    from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable

    state = ManifestTable(table_dir).read(spark)
    docs = transcripts_as_documents(state)
    kw.setdefault("strata_col", None)
    return curate_corpus(
        spark, docs, out_dir, evalset, id_col="conv_id", **kw
    )


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    evalset: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str | None = "lang",
    quality_min: float = 0.5,
    dup_line_max: float = 0.30,
    dup_word_max: float = 0.60,
    symbol_ratio_max: float = 0.10,
    mix_rates: dict[str, float] | None = None,
    mix_default: float = 1.0,
    budget_tokens: int = 512,
    max_bucket_size: int = 64,
) -> dict:
    """Run the full funnel; write ``<out>/verdicts`` + ``<out>/packed``;
    return the funnel report (docs surviving each stage, pack stats)."""
    ids = docs.select(
        F.col(id_col), F.col(text_col),
        *([F.col(strata_col)] if strata_col else []),
    )

    # Stage 1 — quality + repetition gates (map-only projection stack;
    # with_text_signals evaluates each shared split/lower tree once per row,
    # unused signal columns are pruned by Catalyst).
    from endor_blockchain_data_pipeline_spark.functions.text import (
        with_text_signals,
    )

    quality_pass = (
        (F.col("quality") >= quality_min)
        & (F.col("dup_line_frac") <= dup_line_max)
        & (F.col("dup_word_frac") <= dup_word_max)
        & (F.col("symbol_word_ratio") <= symbol_ratio_max)
    )
    flagged = (
        with_text_signals(ids, text_col)
        .withColumn("quality_pass", quality_pass)
        .select(*ids.columns, "quality_pass")
    )
    s1 = flagged.where("quality_pass")

    # Stage 2 — exact dedup (normalized-fingerprint groupBy, min-id keeper).
    exact = dedup_exact(s1, text_col, id_col)  # (fingerprint, keep_id, n)
    s1f = s1.withColumn("fingerprint", fingerprint_expr(text_col))
    s2 = (
        s1f.join(exact.select("fingerprint", "keep_id"), "fingerprint")
        .withColumn("exact_keep", F.col(id_col) == F.col("keep_id"))
        .drop("fingerprint", "keep_id")
    )
    s2k = s2.where("exact_keep")

    # Stage 3 — near-dedup (MinHash-LSH candidates -> components -> keeper).
    pairs = minhash_candidates(
        s2k, text_col, id_col, max_bucket_size=max_bucket_size
    )
    near = dedup_resolution(s2k, pairs, id_col)  # (id, cluster_id, keep)
    s3 = s2k.join(
        near.select(F.col(id_col), F.col("keep").alias("near_keep")), id_col
    )
    s3k = s3.where("near_keep")

    # Stage 4 — benchmark decontamination (word-13-gram collision).
    if evalset is not None:
        dec = decontaminate(s3k, evalset, text_col, id_col)
        s4 = s3k.join(
            dec.select(
                F.col(id_col), (~F.col("contaminated")).alias("decont_pass")
            ),
            id_col,
        )
    else:
        s4 = s3k.withColumn("decont_pass", F.lit(True))
    s4k = s4.where("decont_pass")

    # Stage 5 — stratified training-mix sampling (integer-threshold hash).
    if mix_rates and strata_col:
        mix_keep = sample_stratified_expr(
            id_col, strata_col, mix_rates, default_rate=mix_default
        )
    else:
        mix_keep = F.lit(True)
    s5 = s4k.withColumn("mix_keep", mix_keep)
    final = s5.where("mix_keep")

    # Verdict table over the FULL corpus: un-reached stages are false (the
    # doc was already out), so `final_keep = AND(all flags)` holds exactly.
    stage_flags = [
        "quality_pass", "exact_keep", "near_keep", "decont_pass", "mix_keep",
    ]
    verdicts = (
        flagged.select(id_col, "quality_pass")
        .join(s2.select(id_col, "exact_keep"), id_col, "left")
        .join(s3.select(id_col, "near_keep"), id_col, "left")
        .join(s4.select(id_col, "decont_pass"), id_col, "left")
        .join(s5.select(id_col, "mix_keep"), id_col, "left")
        .select(
            id_col,
            *[F.coalesce(c, F.lit(False)).alias(c) for c in stage_flags],
        )
        .withColumn(
            "final_keep",
            F.aggregate(
                F.array(*[F.col(c) for c in stage_flags]),
                F.lit(True),
                lambda acc, x: acc & x,
            ),
        )
    )
    verdicts.write.mode("overwrite").parquet(f"{out_dir}/verdicts")

    # Pack the survivors into fixed-token context windows and persist.
    packed = pack_documents(
        final.select(id_col, text_col), text_col, id_col,
        budget_tokens=budget_tokens,
    )
    packed.write.mode("overwrite").parquet(f"{out_dir}/packed")

    # Funnel report: ONE aggregation over the written verdicts (re-read so
    # the report reflects exactly what landed on disk).
    v = spark.read.parquet(f"{out_dir}/verdicts")
    prefixes = []
    acc = None
    for c in stage_flags:
        acc = F.col(c) if acc is None else (acc & F.col(c))
        prefixes.append(F.sum(acc.cast("long")).alias(f"after_{c}"))
    row = v.agg(F.count("*").alias("n_input"), *prefixes).first()
    p = spark.read.parquet(f"{out_dir}/packed")
    prow = p.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).agg(
        F.count("*").alias("n_packs"),
        F.coalesce(F.sum(F.when(F.col("t") >= budget_tokens, 1)), F.lit(0)).alias(
            "full_packs"
        ),
    ).first()
    funnel = {
        "input": row["n_input"],
        "after_quality": row["after_quality_pass"],
        "after_exact_dedup": row["after_exact_keep"],
        "after_near_dedup": row["after_near_keep"],
        "after_decontamination": row["after_decont_pass"],
        "final": row["after_mix_keep"],
        "n_packs": prow["n_packs"],
        "full_packs": prow["full_packs"],
    }
    return funnel
