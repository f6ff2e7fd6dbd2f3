"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. Dot products as
  ``aggregate(zip_with(...))`` column expressions — JVM-side, codegen'd,
  no UDF; one pass over the table, a single top-k reduction.
- LSH-bucketed ANN (random hyperplane / SRP): scale path. Each vector gets
  a B-bit signature from fixed pseudo-random hyperplanes (hash-derived, no
  stored model); queries only score vectors sharing a signature bucket.
  At 100 TB the bucket join replaces the full scan; recall is tuned by
  n_tables x n_bits.
- IVF-style variant: coarse k-means is overkill without a training step;
  SRP buckets give the same read-pruning shape deterministically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot_expr(a: Column, b: Column) -> Column:
    """dot(a, b) via zip_with + aggregate — sequential fold, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Single map stage computes cosine; top-k via window rank ordered by
    (-cos, id) — ties broken by id for determinism. At scale replace the
    global window with ``ORDER BY cos DESC LIMIT k`` (Spark's TakeOrdered)
    — same result, no full sort.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "cos_sim", "rank")
    )


def srp_signature_expr(vec_col: Column | str, n_bits: int = 16, seed: int = 42) -> Column:
    """Signed-random-projection signature as an int column.

    Hyperplane h_b has pseudo-random ±1 weights per dimension derived from
    xxhash64(seed, b, dim) — no stored model, identical on every executor.
    bit b = 1 iff sum_d w[b][d] * v[d] > 0.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    total = F.lit(0).cast("long")
    for b in range(n_bits):
        # weight(d) = +1 if xxhash64(seed,b,d) even else -1, expressed over
        # the vector's index array via transform+aggregate.
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x.cast("double")
                * F.when(F.pmod(F.xxhash64(F.lit(seed), F.lit(b), d), 2) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        total = total + F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return total


def srp_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only vectors whose SRP bucket matches the query's.

    The candidate set is the query's bucket (expected n/2^bits of the data);
    exact cosine ranks within it. Recall < 1 by construction — the bench
    compares it against brute force for the recall/latency tradeoff.
    """
    # One-row DF computes the query's signature with the IDENTICAL column
    # expression (xxhash64 lives JVM-side; no driver reimplementation drift).
    spark = df.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col} array<double>")
    qsig = qdf.select(srp_signature_expr(vec_col, n_bits, seed).alias("s")).first()["s"]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn("_sig", srp_signature_expr(vec_col, n_bits, seed))
    cands = bucketed.where(F.col("_sig") == F.lit(qsig))
    scored = cands.select(
        F.col(id_col), F.round(cosine_expr(F.col(vec_col), q), 6).alias("cos_sim")
    )
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "cos_sim", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, SRP-bucketed.

    Self-join only within SRP buckets (near-identical vectors share buckets
    with high probability), then exact cosine filter. The all-pairs O(n^2)
    never materializes.
    """
    sigs = df.select(
        F.col(id_col), F.col(vec_col), srp_signature_expr(vec_col, n_bits, seed).alias("_sig")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a._sig") == F.col("b._sig")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine_expr(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)
