"""Distributed BPE-merge training: the tokenizer-training step of a
training-data pipeline, expressed as DataFrame algebra.

Classic byte-pair encoding (Sennrich et al. 2016): start from
character sequences, repeatedly (1) count adjacent symbol pairs across
the corpus, (2) pick the most frequent pair, (3) merge every
occurrence. Here each round is one Spark job over a (word, count)
vocabulary table:

- the pair count is a map-side-combinable groupBy over exploded
  adjacent pairs WEIGHTED by word frequency — the shuffle carries one
  partial row per (pair, partition), never the corpus;
- the winning pair is a 1-row driver fetch (k merges -> k tiny
  collects, like the k-means centroid loop — the only driver state is
  the merge list itself, which IS the training output);
- the merge applies as a JVM-side aggregate() fold over each word's
  symbol array — no Python in the per-word path, no repartition (the
  vocabulary table keeps its partitioning across rounds);
- training runs on the word VOCABULARY (word, n_occurrences), not the
  token stream: the corpus collapses once to vocab-sized state up
  front, which is why tokenizer training is feasible at 100 TB —
  every subsequent round touches |vocab| rows.

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(
    df: DataFrame, text_col: str = "text", end_mark: str = "▁"
) -> DataFrame:
    """Collapse a corpus to BPE training state: (syms array<string>,
    n bigint) — one row per distinct word, its character sequence
    (end-of-word marker appended, the GPT-2/sentencepiece convention)
    and its corpus frequency. The ONLY pass over the raw corpus."""
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("_word")
    ).filter(F.col("_word") != "")
    return (
        words.groupBy("_word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(
                F.split(F.col("_word"), ""), F.array(F.lit(end_mark))
            ).alias("syms"),
            "n",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair frequencies weighted by word count.
    transform+explode keeps it one Generate; the groupBy combines
    map-side so the shuffle carries distinct pairs only."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("_p"), "n")
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Merge every adjacent (a, b) into the single symbol a||b via a
    left-to-right aggregate fold — the exact sequential semantics of
    reference BPE (an overlapping run like 'aaa' under merge (a,a)
    becomes ('aa','a')), entirely in JVM expressions. The freshly
    merged tail a||b can never re-trigger the merge because matching
    would require a||b == a, impossible for non-empty b."""
    merged = F.expr(
        f"""
        aggregate(
            syms,
            CAST(array() AS array<string>),
            (acc, x) -> CASE
                WHEN size(acc) > 0
                     AND element_at(acc, -1) = {_lit(a)}
                     AND x = {_lit(b)}
                THEN concat(slice(acc, 1, size(acc) - 1),
                            array({_lit(a + b)}))
                ELSE concat(acc, array(x))
            END
        )
        """
    )
    return vocab.select(merged.alias("syms"), "n")


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a corpus. Returns the ordered
    merge list [(a, b), ...] — the tokenizer artifact.

    Driver state is k pairs of strings; every round is one job over
    the vocab table. localCheckpoint truncates the per-round lineage
    (same discipline as the connected-components rounds) so round k's
    plan does not replay rounds 1..k-1.
    """
    vocab = word_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_mark: str = "▁",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list: (id, tokens
    array<string>, n_tokens).

    The merge folds run over the DISTINCT-WORD vocabulary, not the
    word stream — tokenizing "the" once instead of a billion times is
    what makes BPE application feasible at corpus scale (the same
    memoization every fast tokenizer uses, expressed relationally).
    The per-word token arrays then join back onto the positional word
    stream (vocab-sized build side — broadcast for typical vocabularies,
    AQE decides) and re-assemble per doc in word order."""
    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("_pos", "_word"),
    )
    vocab = words.select("_word").distinct().select(
        "_word",
        F.concat(F.split("_word", ""), F.array(F.lit(end_mark))).alias("_syms"),
    )
    for a, b in merges:
        fold = (
            "aggregate(_syms, CAST(array() AS array<string>),"
            " (acc, x) -> CASE WHEN size(acc) > 0"
            f" AND element_at(acc, -1) = {_lit(a)} AND x = {_lit(b)}"
            f" THEN concat(slice(acc, 1, size(acc) - 1), array({_lit(a + b)}))"
            " ELSE concat(acc, array(x)) END)"
        )
        vocab = vocab.select("_word", F.expr(fold).alias("_syms"))
    rebuilt = (
        words.join(vocab, "_word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_syms"))
                    ),
                    lambda s: s["_syms"],
                )
            ).alias("tokens")
        )
    )
    # wordless docs drop out of the positional groupBy: restore them
    # with empty token arrays from the (id-pruned) base scan
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "tokens", F.array().cast("array<string>")
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )
