"""Text-analysis operators for training-data pipelines.

All JVM-side expressions (no Python UDFs): tokenization via split /
regexp_count, fingerprints via md5, language-ID via stopword scoring.
At 100 TB these run inside whole-stage codegen over the scan — zero
shuffle until an aggregation asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic marker lists for stopword-scoring language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "table"),
    "de": ("window", "hash", "batch"),
    "es": ("data", "row", "scan"),
}


def tokens(col: str = "text") -> Column:
    """Whitespace tokens as an array column."""
    return F.split(F.col(col), " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + type-token-ratio quality scoring + fingerprint.

    n_tokens: \\S+ match count; n_distinct_tokens: distinct whitespace
    tokens; quality_score: type-token ratio (higher = less repetitive);
    fingerprint: md5 of the lowercased text (document fingerprinting).
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.regexp_count(F.col(text_col), F.lit(r"\S+")).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    # BPE-ish proxy count: letter runs, digit runs, and single
    # non-alphanumeric marks each count as one subword unit — the
    # regex family GPT-2-style tokenizers pre-split on
    n_bpe = F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    ).cast("long")
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_bpe_tokens", n_bpe)
        .withColumn("n_distinct_tokens", n_distinct)
        .withColumn(
            "quality_score",
            (F.col("n_distinct_tokens").cast("double") / F.col("n_tokens").cast("double")),
        )
        .withColumn("fingerprint", F.md5(F.lower(F.col(text_col))))
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Marker-token hit counts per language (array_intersect against the
    token array — set semantics, like counting distinct stopword types)."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def with_predicted_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic argmax over marker scores; tie order en > de > es."""
    s = lang_scores(text_col)
    df = df.withColumn("score_en", s["en"]).withColumn("score_de", s["de"]).withColumn(
        "score_es", s["es"]
    )
    return df.withColumn(
        "predicted_lang",
        F.when(
            (F.col("score_en") >= F.col("score_de")) & (F.col("score_en") >= F.col("score_es")),
            F.lit("en"),
        )
        .when(F.col("score_de") >= F.col("score_es"), F.lit("de"))
        .otherwise(F.lit("es")),
    )


# Gopher/C4-style quality-filter thresholds (arbitrary but fixed; the
# operator structure, not the constants, is the point).
QUALITY_STOPWORDS = ("the", "a", "of", "to", "and", "data", "row", "value")
MIN_TOKENS, MAX_TOKENS = 5, 1000
MIN_MEAN_TOKEN_LEN, MAX_MEAN_TOKEN_LEN = 2.0, 12.0
MIN_STOPWORD_RATIO = 0.02

FP_SEED, FP_BASE, FP_MOD = 7, 31, 1_000_000_007


def with_quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-shaped document quality gate: mean token length,
    stopword ratio, token-count bounds -> quality_pass flag. Pure
    codegen expressions; at scale this is a map-only stage fused into
    the scan."""
    # Split ONCE into a named column. Lambda-bearing expressions
    # (aggregate/transform/filter) are opaque to Catalyst's common-
    # subexpression elimination, so inlining split() into each metric
    # would re-tokenize the document five times per row.
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS) + ")"
    mean_len = F.expr(
        "CAST(aggregate(transform(_toks, t -> length(t)), 0L, (a, x) -> a + x) AS DOUBLE)"
        " / size(_toks)"
    )
    stop_ratio = F.expr(
        f"CAST(size(filter(_toks, t -> array_contains({stop_arr}, t))) AS DOUBLE)"
        " / size(_toks)"
    )
    out = (
        df.withColumn("_toks", F.split(F.col(text_col), " "))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn("mean_token_len", mean_len)
        .withColumn("stopword_ratio", stop_ratio)
        .drop("_toks")
    )
    return out.withColumn(
        "quality_pass",
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
        & (F.col("mean_token_len") >= MIN_MEAN_TOKEN_LEN)
        & (F.col("mean_token_len") <= MAX_MEAN_TOKEN_LEN)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
    words_col: str = "_w",
) -> DataFrame:
    """Gopher-style repetition signal: the share of all trigram
    occurrences taken by the single most frequent trigram per doc
    (high share = boilerplate/generated text).

    Unlike the dedup shingle path this counts occurrences WITHOUT
    per-doc dedupe — repetition is exactly what array_distinct would
    erase. One shuffle on (doc, gram): the input is pre-partitioned by
    doc, so partial aggregation collapses every within-doc repeat
    map-side and the exchange carries per-doc gram counts only. The
    per-doc total and the top gram both come from the same counted
    frame (one partition-local max_by/sum aggregate), not a second scan.
    """
    if words is None:
        words = df.repartition(id_col).select(
            id_col, F.split(F.col(text_col), " ").alias("_w")
        )
    else:
        words = words.select(id_col, F.col(words_col).alias("_w"))
    tris = F.expr(
        "transform(sequence(1, greatest(size(_w) - 2, 1)),"
        " i -> concat_ws(' ', slice(_w, i, 3)))"
    )
    counts = (
        words.select(id_col, F.explode(tris).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    # Top gram + total via a second partition-local aggregate (max_by
    # on the (cnt, gram) struct = highest count, ties to the greatest
    # gram) instead of a window pair: same one-exchange plan, but no
    # per-partition sort of the counted gram stream — the aggregate is
    # O(n) hash work and keeps one row per doc, which measured ~2x
    # faster than the sort-based windows at sf0.1.
    top = F.max_by("gram", F.struct(F.col("_cnt"), F.col("gram")))
    return counts.groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_trigrams"),
        top.alias("top_trigram"),
        (
            F.max(F.struct(F.col("_cnt"), F.col("gram")))["_cnt"].cast("double")
            / F.sum("_cnt").cast("double")
        ).alias("top_trigram_share"),
    )


def with_rolling_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-level polynomial rolling hash:
    h = fold(chars, seed, (acc, c) -> (acc*BASE + code(c)) mod MOD).
    Order-sensitive (unlike md5-of-text it survives as a streamable
    per-chunk fold) and engine-portable: plain modular BIGINT math.
    """
    expr = (
        f"aggregate(transform(split({text_col}, ''), c -> CAST(ascii(c) AS BIGINT)), "
        f"CAST({FP_SEED} AS BIGINT), (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD})"
    )
    return df.withColumn("rolling_fp", F.expr(expr))
