"""Text analytics for training-data pipelines — all pure column expressions.

Everything stays inside whole-stage codegen (no Python in the hot path):
token counting, quality scoring, n-gram language ID heuristic, document
fingerprinting. These are the target engine's extension of the reference's
string-ops surface (``EthereumTokensOps.scala:12-19``) to corpus curation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny stopword lists per language for the n-gram/stopword language guesser.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count_expr(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def bpe_ish_token_count_expr(col: Column | str) -> Column:
    """BPE-flavored proxy: word-chunk + punctuation split, ~chars/4 floor.

    A deterministic, JVM-side stand-in for a real tokenizer: counts regex
    word pieces plus standalone punctuation, the usual pre-tokenization of
    BPE vocabularies.
    """
    c = F.trim(_c(col))
    pieces = F.size(
        F.filter(F.split(c, r"[^A-Za-z0-9]+"), lambda x: F.length(x) > 0)
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (pieces + punct).cast("int")


def punct_ratio_expr(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = _c(col)
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct.cast("double") / total)


def stopword_hits_expr(col: Column | str, lang: str = "en") -> Column:
    """How many stopwords of ``lang`` occur (word-boundary) in the text."""
    c = F.concat(F.lit(" "), F.lower(_c(col)), F.lit(" "))
    hits = None
    for w in STOPWORDS[lang]:
        h = F.when(c.contains(f" {w} "), 1).otherwise(0)
        hits = h if hits is None else hits + h
    return hits.cast("int")


def quality_score_expr(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    mean-word-length band. Deterministic, rounded to 4dp for oracle parity."""
    c = F.trim(_c(col))
    n = F.length(c)
    toks = token_count_expr(c)
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(n.cast("double") / toks)
    len_score = F.when((n >= 50) & (n <= 5000), 1.0).when(n > 5000, 0.5).otherwise(n.cast("double") / 50.0)
    punct_score = 1.0 - F.least(punct_ratio_expr(c) * 4, F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    return F.round((len_score * 0.4 + punct_score * 0.3 + word_score * 0.3), 4)


def lang_guess_expr(col: Column | str) -> Column:
    """Stopword-vote language guess: argmax of per-language hits, 'und' if 0.

    A deterministic n-gram-heuristic language ID; ties resolve in the fixed
    language order below (stable, oracle-expressible).
    """
    c = _c(col)
    guess = F.lit("und")
    best = F.lit(0)
    for lang in ["en", "es", "fr", "de"]:  # later langs win only strictly
        hits = stopword_hits_expr(c, lang)
        guess = F.when(hits > best, F.lit(lang)).otherwise(guess)
        best = F.when(hits > best, hits).otherwise(best)
    return guess


def hash_split_expr(
    id_col: Column | str,
    weights: dict[str, int],
    salt: str = "split",
) -> Column:
    """Deterministic dataset split assignment — the reproducible train/val
    holdout every training-data pipeline needs. Seeded ``sample()`` is
    partition-layout-dependent and irreproducible across engines; this is
    pure content hashing: bucket = md5(salt:id) mod 100, ranges assigned in
    the given order. Weights are integer percents summing to 100. The same
    id lands in the same split on ANY engine, cluster size, or file layout
    (the DuckDB oracle reproduces it verbatim).
    """
    total = sum(weights.values())
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % 100
    out = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        out = F.when(cond, name) if out is None else out.when(cond, name)
        lo += w
    return out


def sample_keep_expr(
    id_col: Column | str, rate: float, salt: str = "sample"
) -> Column:
    """Deterministic Bernoulli(rate) keep-decision by content hash.

    ``uniform < rate`` is evaluated as a PURE INTEGER comparison — the
    first 60 md5 bits as BIGINT vs ``floor(rate * 2^60)`` — so there is no
    float anywhere: the same id keeps/drops identically on any engine,
    cluster size, or file layout (seeded ``sample()`` is none of those),
    and the DuckDB oracle reproduces it verbatim. Different ``salt``
    values give independent samples of the same corpus.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    threshold = int(rate * (1 << 60))
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h < F.lit(threshold)


def sample_stratified_expr(
    id_col: Column | str,
    strata_col: Column | str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> Column:
    """Per-stratum deterministic sampling — the training-mix composition
    step (downsample over-represented sources/languages, keep the rest).
    One hash, per-stratum integer thresholds; a projection-only pass."""
    s = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    for r in list(rates.values()) + [default_rate]:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate must be in [0,1], got {r}")
    out = F.lit(int(default_rate * (1 << 60)))
    for name, r in rates.items():
        out = F.when(s == name, F.lit(int(r * (1 << 60)))).otherwise(out)
    return h < out


def sample_hash_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of the 60-bit sampling hash (shared by the oracles)."""
    return (
        f"('0x' || substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15))::BIGINT"
    )


def _dup_frac(n: Column, d: Column) -> Column:
    """(n - d) / n as ONE int-int subtraction + ONE correctly-rounded
    division — both engines produce the identical IEEE double, so the
    driver's exact-float hash matches (no multi-step float pipelines)."""
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - d).cast("double") / n.cast("double")
    )


def dup_line_frac_expr(col: Column | str) -> Column:
    """Fraction of non-blank lines that are exact repeats of an earlier
    line — the strongest boilerplate signal in the Gopher repetition
    family (nav bars, cookie banners, license headers)."""
    lines = F.filter(
        F.split(_c(col), "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    return _dup_frac(F.size(lines), F.size(F.array_distinct(lines)))


def _words(col: Column | str) -> Column:
    c = F.trim(F.lower(_c(col)))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def dup_word_frac_expr(col: Column | str) -> Column:
    """Fraction of (case-folded) word occurrences beyond each word's first
    appearance. High values mean keyword stuffing / degenerate repetition."""
    ws = _words(col)
    return _dup_frac(F.size(ws), F.size(F.array_distinct(ws)))


def dup_bigram_frac_expr(col: Column | str) -> Column:
    """Duplicate word-2-gram fraction (Gopher's dup-n-gram family, n=2).

    Bigrams are built positionally inside one ``transform`` over a
    ``sequence`` — no explode, no per-doc groupBy, so the whole signal
    stays a projection (scales as a map-only pass at 100 TB)."""
    ws = _words(col)
    n = F.size(ws)
    bg = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
    )
    # sequence(1, 0) would run DESCENDING in Spark — guard short docs first
    return F.when(n < 2, F.lit(0.0)).otherwise(
        _dup_frac(F.size(bg), F.size(F.array_distinct(bg)))
    )


def symbol_word_ratio_expr(col: Column | str) -> Column:
    """Gopher symbol-to-word ratio: '#' and ellipsis occurrences per word
    (templated/scraped pages score high)."""
    c = _c(col)
    toks = token_count_expr(col)
    syms = F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    return F.when(toks == 0, F.lit(0.0)).otherwise(
        syms.cast("double") / toks.cast("double")
    )


def with_text_signals(df, text_col: str = "text"):
    """Append the quality / language-ID / repetition signal columns in a
    stack of projections that evaluates every SHARED subexpression once per
    row: ``quality``, ``lang_guess``, ``en_stopwords``, ``dup_line_frac``,
    ``dup_word_frac``, ``dup_bigram_frac``, ``symbol_word_ratio``.

    Why not the per-signal expression functions composed inline: a column
    expression referenced inside a higher-order-function lambda is
    re-evaluated on EVERY array element (``element_at(split(...), i)``
    re-runs the split per bigram — O(words²) per document), and the
    repeated trim/lower/split trees across signals each evaluate again
    (codegen subexpression elimination does not reach into HOF lambdas).
    Hoisting each shared tree into its own aliased column makes downstream
    references ATTRIBUTE reads; CollapseProject keeps the layering because
    every hoisted alias is non-cheap and referenced more than once. Values
    are identical to the inline forms (the DuckDB oracle still
    hash-matches) — only the evaluation count changes.

    Unused signal columns are pruned by Catalyst when the caller selects a
    subset, so sharing this builder costs nothing.
    """
    t = _c(text_col)
    # L1: the raw string transforms every signal shares
    l1 = df.select(
        "*",
        F.trim(t).alias("_ts_trim"),
        F.lower(t).alias("_ts_low"),
    )
    trim_c = F.col("_ts_trim")
    low_c = F.col("_ts_low")
    # L2: arrays + scalar counts (each referenced >1 time downstream)
    lowtrim = F.trim(low_c)
    l2 = l1.select(
        "*",
        F.length(trim_c).alias("_ts_n"),
        F.when(F.length(trim_c) == 0, F.lit(0))
        .otherwise(F.size(F.split(trim_c, r"\s+")))
        .alias("_ts_toks"),
        (
            F.length(trim_c)
            - F.length(F.regexp_replace(trim_c, r"[^\w\s]", ""))
        ).alias("_ts_punct"),
        F.concat(F.lit(" "), low_c, F.lit(" ")).alias("_ts_padded"),
        F.when(F.length(lowtrim) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(lowtrim, r"\s+"))
        .alias("_ts_ws"),
        F.filter(
            F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0
        ).alias("_ts_lines"),
    )
    # L3: per-language stopword hits + the bigram array (attribute inputs)
    padded = F.col("_ts_padded")
    ws = F.col("_ts_ws")
    nw = F.size(ws)

    def hits_of(lang: str) -> Column:
        hits = None
        for w in STOPWORDS[lang]:
            h = F.when(padded.contains(f" {w} "), 1).otherwise(0)
            hits = h if hits is None else hits + h
        return hits.cast("int")

    l3 = l2.select(
        "*",
        *[hits_of(lang).alias(f"_ts_h_{lang}") for lang in STOPWORDS],
        # guard: sequence(1, 0) runs DESCENDING and element_at(ws, 0) throws
        F.when(
            nw >= 2,
            F.transform(
                F.sequence(F.lit(1), nw - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_ts_bg"),
    )
    # L4: final signals off attributes only
    n = F.col("_ts_n")
    toks = F.col("_ts_toks")
    mean_word = F.when(toks == 0, F.lit(0.0)).otherwise(
        n.cast("double") / toks
    )
    len_score = (
        F.when((n >= 50) & (n <= 5000), 1.0)
        .when(n > 5000, 0.5)
        .otherwise(n.cast("double") / 50.0)
    )
    punct_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("_ts_punct").cast("double") / n
    )
    punct_score = 1.0 - F.least(punct_ratio * 4, F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    guess = F.lit("und")
    best = F.lit(0)
    for lang in ["en", "es", "fr", "de"]:  # later langs win only strictly
        h = F.col(f"_ts_h_{lang}")
        guess = F.when(h > best, F.lit(lang)).otherwise(guess)
        best = F.when(h > best, h).otherwise(best)
    lines = F.col("_ts_lines")
    bg = F.col("_ts_bg")
    syms = F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\."))
    out = l3.select(
        "*",
        F.round(
            len_score * 0.4 + punct_score * 0.3 + word_score * 0.3, 4
        ).alias("quality"),
        guess.alias("lang_guess"),
        F.col("_ts_h_en").alias("en_stopwords"),
        _dup_frac(F.size(lines), F.size(F.array_distinct(lines))).alias(
            "dup_line_frac"
        ),
        _dup_frac(nw, F.size(F.array_distinct(ws))).alias("dup_word_frac"),
        F.when(nw < 2, F.lit(0.0))
        .otherwise(_dup_frac(F.size(bg), F.size(F.array_distinct(bg))))
        .alias("dup_bigram_frac"),
        F.when(toks == 0, F.lit(0.0))
        .otherwise(syms.cast("double") / toks.cast("double"))
        .alias("symbol_word_ratio"),
    )
    return out.drop(*[c for c in out.columns if c.startswith("_ts_")])


def fingerprint_expr(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (portable across
    engines — used as the exact-dedup key)."""
    from endor_blockchain_data_pipeline_spark.functions.decode import normalize_text_expr

    return F.md5(normalize_text_expr(_c(col)))


def char_shingles(col: Column | str, k: int = 12) -> Column:
    """Array of overlapping character k-shingles (for MinHash/Jaccard).

    Pure expression: positions via ``sequence``, slices via ``substring`` in
    a ``transform`` lambda. Empty/short texts yield a single whole-text
    shingle so every doc has >= 1.
    """
    c = _c(col)
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))


# PII patterns applied in order (most-specific first: an SSN must not be
# half-eaten by the phone rule). Plain RE2-safe syntax — no lookarounds or
# backrefs — so Java (Spark) and RE2 (DuckDB) match identically and the
# redaction is oracle-reproducible.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # no \b before '+': space->'+' is non-word->non-word, never a boundary
    (r"(?:\+|\b)\d{1,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{2,4}\b", "<PHONE>"),
)


def pii_redact_expr(col: Column | str) -> Column:
    """Redact common PII shapes (emails, SSNs, card numbers, IPv4, phone
    numbers) with typed placeholders — the takedown-adjacent scrub every
    training-data pipeline runs before releasing a corpus. Pure chained
    ``regexp_replace`` (JVM, codegen); ``pii_redact_sql`` emits the DuckDB
    mirror of the same chain."""
    out = _c(col)
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_redact_sql(expr: str) -> str:
    """The DuckDB mirror of ``pii_redact_expr`` (the 'g' flag = Spark's
    replace-all default)."""
    out = expr
    for pat, repl in PII_PATTERNS:
        # standard SQL string literals do NOT process backslashes — the
        # pattern embeds verbatim, only quotes need doubling
        out = f"regexp_replace({out}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    return out


def pack_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 512,
    n_buckets: int = 8,
    partition_cols: tuple[str, ...] = (),
):
    """Deterministic greedy sequence packing: assign each document to a
    fixed-token-budget pack (the context-window filling step of training
    prep), reproducible on any engine or cluster size.

    Scale shape: NO global sort. Documents hash into ``n_buckets``
    independent lanes (md5 — engine-portable), each lane orders by (hash,
    id) and takes ONE window prefix-sum of token counts; ``pack_id =
    lane * 2^32 + floor(exclusive_prefix / budget)``. A pack can overflow
    the budget by at most one document (the straddler stays in the pack
    where its prefix started — standard contiguous packing). At 100 TB
    that is B parallel window partitions instead of a cluster-wide
    RangePartitioning sort; raise ``n_buckets`` with the corpus.

    ``partition_cols`` packs within groups (e.g. per split, so train and
    val sequences never mix); pack identity is then ``(partition_cols...,
    pack_id)`` — the lane/sequence space restarts per group. Returns the
    input columns plus ``n_tokens``, ``pack_lane``, ``pack_id``.
    """
    from pyspark.sql import Window

    c = F.col(id_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("pack:"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    lane = F.pmod(h, F.lit(n_buckets)).cast("long")
    toks = token_count_expr(text_col).cast("long")
    with_cols = df.select(
        "*", toks.alias("n_tokens"), lane.alias("pack_lane"), h.alias("_ord")
    )
    w = (
        Window.partitionBy(*partition_cols, "pack_lane")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_cols.select(
        "*",
        (
            F.col("pack_lane") * F.lit(2**32)
            + F.floor(excl / F.lit(budget_tokens))
        ).alias("pack_id"),
    ).drop("_ord")
