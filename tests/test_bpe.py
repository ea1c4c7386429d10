"""BPE-merge training vs an independent pure-Python reference."""

import pytest

from etl_pipelines_spark.llm.bpe import bpe_apply, bpe_train, word_vocab

END = "▁"


def ref_vocab(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return {tuple(list(w) + [END]): n for w, n in c.items()}


def ref_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return tuple(out)


def ref_train(texts, n_merges):
    from collections import Counter

    vocab = ref_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # max count, ties to the lexicographically smallest (a, b)
        (a, b), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        vocab = {ref_merge(s, a, b): n for s, n in vocab.items()}
    return merges


def ref_tokenize(text, merges):
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        syms = tuple(list(w) + [END])
        for a, b in merges:
            syms = ref_merge(syms, a, b)
        toks.extend(syms)
    return toks


TEXTS = [
    "the cat sat on the mat",
    "the mats sat flat",
    "that cat that sat",
    "aaa banana bandana",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_word_vocab(spark, corpus):
    rows = {tuple(r["syms"]): r["n"] for r in word_vocab(corpus).collect()}
    assert rows == ref_vocab(TEXTS)


def test_train_matches_reference(spark, corpus):
    got = bpe_train(corpus, 8)
    assert got == ref_train(TEXTS, 8)
    # trained artifacts are deterministic run to run
    assert got == bpe_train(corpus, 8)


def test_batched_schedule_is_bit_identical_to_sequential(spark, corpus):
    """The top-m batch rule (symbol-disjoint prefix + strict-count
    truncation) must reproduce the one-merge-at-a-time schedule
    exactly at every batch size."""
    expect = ref_train(TEXTS, 12)
    for m in (1, 2, 3, 8, 64):
        assert bpe_train(corpus, 12, batch_m=m) == expect, f"batch_m={m}"


def test_batched_schedule_on_adversarial_ties(spark):
    """Corpus engineered so naive batching would diverge: heavy count
    ties, pairs sharing symbols with the round winner, and a merge
    output ('ab') that collides with pre-existing symbols created by
    an earlier round — the strict-truncation and output-collision
    guards must all fire."""
    texts = [
        "abab abab cdcd",
        "ab cd ab cd",
        "aabb ccdd abcd",
        "xyxy xyxy",
        "aaaa bbbb",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expect = ref_train(texts, 10)
    for m in (2, 4, 16):
        assert bpe_train(df, 10, batch_m=m) == expect, f"batch_m={m}"


def test_batch_accept_unit_rules():
    """Driver-side rule checks without Spark: truncation at a tied
    conflicting pair, output-collision rejection, argmax fallback."""
    from etl_pipelines_spark.llm.bpe import _batch_accept

    def R(a, b, cnt):
        return {"a": a, "b": b, "cnt": cnt}

    # (x, a) conflicts with accepted (a, b) and TIES with (c, d):
    # strict truncation must drop (c, d) from the batch
    rows = [R("a", "b", 10), R("c", "d", 5), R("x", "a", 5)]
    assert _batch_accept(rows, 8, 1, False) == ([("a", "b")], False)
    # strictly above the conflict count -> both accepted
    rows = [R("a", "b", 10), R("c", "d", 6), R("x", "a", 5)]
    assert _batch_accept(rows, 8, 1, False) == (
        [("a", "b"), ("c", "d")],
        False,
    )
    # output collision: accepted ('a','b') produces 'ab'; a pair
    # consuming the pre-existing symbol 'ab' must stop the prefix
    rows = [R("a", "b", 10), R("ab", "c", 4)]
    assert _batch_accept(rows, 8, 1, False) == ([("a", "b")], False)
    # argmax fallback: truncation would empty the batch (tie at the
    # very top with a conflicting pair) -> accept the argmax alone
    rows = [R("a", "b", 7), R("b", "c", 7)]
    assert _batch_accept(rows, 8, 1, False) == ([("a", "b")], False)
    # maybe_more: a full collect page must truncate against its last
    # row even without an explicit conflict
    rows = [R("a", "b", 9), R("c", "d", 9)]
    assert _batch_accept(rows, 8, 1, True) == ([("a", "b")], False)
    assert _batch_accept(rows, 8, 1, False) == (
        [("a", "b"), ("c", "d")],
        False,
    )
    # exhausted corpus / below min_count -> done
    assert _batch_accept([], 8, 1, False) == ([], True)
    assert _batch_accept([R("a", "b", 1)], 8, 2, False) == ([], True)


def test_overlapping_run_merges_left_to_right(spark):
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges = bpe_train(df, 1)
    assert merges == [("a", "a")]
    toks = bpe_apply(df, merges).collect()[0]["tokens"]
    # each 'aaa' -> ['aa', 'a', END]: the fresh 'aa' must not re-merge
    assert toks == ["aa", "a", END, "aa", "a", END]


def test_apply_matches_reference_and_reconstructs(spark, corpus):
    merges = bpe_train(corpus, 8)
    got = {r["doc_id"]: r for r in bpe_apply(corpus, merges).collect()}
    for i, text in enumerate(TEXTS):
        expect = ref_tokenize(text, merges)
        assert list(got[i]["tokens"]) == expect
        assert got[i]["n_tokens"] == len(expect)
        # lossless: stripping end marks reconstructs the text
        rebuilt = "".join(got[i]["tokens"]).replace(END, " ").strip()
        assert rebuilt == " ".join(w for w in text.split(" ") if w)


def test_more_merges_never_grow_token_count(spark, corpus):
    m8 = bpe_train(corpus, 8)
    n0 = bpe_apply(corpus, []).agg({"n_tokens": "sum"}).collect()[0][0]
    n4 = bpe_apply(corpus, m8[:4]).agg({"n_tokens": "sum"}).collect()[0][0]
    n8 = bpe_apply(corpus, m8).agg({"n_tokens": "sum"}).collect()[0][0]
    assert n0 > n4 > n8
