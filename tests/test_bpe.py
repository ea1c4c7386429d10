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
