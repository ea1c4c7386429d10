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
- each round accepts a BATCH of top-m symbol-disjoint pairs from one
  tiny top-k driver fetch (bit-identical to sequential training — see
  `_batch_accept`), so k merges cost ~2k/m jobs, not k; the only
  driver state is the merge list itself, which IS the training output;
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


def _batch_accept(
    rows, batch_m: int, min_count: int, maybe_more: bool
) -> tuple[list[tuple[str, str]], bool]:
    """Pick the longest prefix of the (cnt desc, a, b)-sorted candidate
    pairs that sequential BPE is GUARANTEED to choose in that exact
    order — the standard batched-merge trick, with the guards that
    make it bit-identical to one-merge-at-a-time training:

    - symbol-disjoint prefix: a pair is accepted only while its left
      symbol, right symbol, and merged output are all unseen among the
      already-accepted pairs' symbols AND outputs (an output colliding
      with a pre-existing symbol would let an earlier merge change a
      later accepted pair's count);
    - strict-count truncation: merging an accepted pair can create new
      pairs, but any new pair's count is bounded by the count of some
      pre-existing pair that CONFLICTS with the accepted set — and by
      the prefix property every conflicting pair sorts at or after the
      stop row. Truncating the batch to counts strictly above the stop
      row's count therefore makes every accepted pair outrank every
      existing non-accepted pair, every newly created pair, and every
      tie that lexicographic ordering could flip;
    - argmax fallback: if truncation empties the batch, accept just the
      first pair — the global argmax is always what sequential picks.

    Returns (accepted pairs, done) where done means training should
    stop (no candidate reaches min_count)."""
    accepted: list[tuple[str, str]] = []
    seen: set[str] = set()
    stop_cnt: int | None = None
    for row in rows:
        a, b, cnt = row["a"], row["b"], row["cnt"]
        if cnt < min_count or len(accepted) == batch_m:
            stop_cnt = cnt
            break
        if a in seen or b in seen or (a + b) in seen:
            stop_cnt = cnt
            break
        accepted.append((a, b))
        seen.update((a, b, a + b))
    else:
        # consumed every collected row; if the collect LIMIT may have
        # cut the candidate list short, uncollected pairs bound at the
        # last row's count still exist -> same strict truncation
        if maybe_more and rows:
            stop_cnt = rows[-1]["cnt"]
    if not rows or rows[0]["cnt"] < min_count:
        return [], True
    if stop_cnt is not None:
        strict = [
            p for p, row in zip(accepted, rows) if row["cnt"] > stop_cnt
        ]
        accepted = strict if strict else accepted[:1]
    return accepted, False


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    batch_m: int = 16,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a corpus. Returns the ordered
    merge list [(a, b), ...] — the tokenizer artifact, bit-identical
    to one-merge-at-a-time training at any `batch_m` (see
    `_batch_accept` for the equivalence argument; the pure-Python
    reference test pins it across batch sizes).

    Driver state is the merge list itself; every ROUND is two jobs
    over the vocab table (top-k pair collect + checkpointed fold
    apply) and accepts up to `batch_m` merges, so a realistic 30k-merge
    tokenizer train is ~2 * 30k/batch_m jobs instead of one job per
    merge — the round-3 driver-side bottleneck. localCheckpoint
    truncates the per-round lineage (same discipline as the
    connected-components rounds) so round k's plan does not replay
    rounds 1..k-1.
    """
    vocab = word_vocab(df, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        # over-collect: conflicts shrink the accepted prefix, and the
        # strict-truncation rule needs one row PAST the acceptance cut
        limit = 4 * want + 8
        rows = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(limit)
            .collect()
        )
        batch, done = _batch_accept(rows, want, min_count, len(rows) == limit)
        if done:
            break
        merges.extend(batch)
        step = vocab
        for a, b in batch:
            step = _apply_merge(step, a, b)
        vocab = step.localCheckpoint()
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
