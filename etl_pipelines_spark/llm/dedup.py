"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard.

Scale design:
- exact dedup: hash-groupBy on md5(text) — one shuffle keyed on the
  digest, never on the document body.
- MinHash: k independent hash functions simulated as md5 over a
  seed-prefixed token; signatures are per-doc aggregates (shuffle on
  doc_id only). Banding groups signature slices; candidate pairs come
  from a self-join on band keys — the join explodes only within
  buckets, never across the corpus.
- n-gram/token Jaccard verifies candidates exactly: explode tokens,
  count intersections via an equi-join on token, |A|+|B|-∩ for union.

All md5-based so signatures are reproducible across engines and runs
(no seed-dependent JVM hashing in the contract surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.dedupe import dedupe_keep_first

N_MINHASHES = 8


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per exact text digest."""
    df = df.withColumn("_digest", F.md5(F.col(text_col)))
    return dedupe_keep_first(df, ["_digest"], [F.col(id_col).asc()]).drop("_digest")


def doc_words(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, _w: array<string>) — the one split pass every
    word-grain operator derives from. Repartition by doc first: a
    document corpus often arrives in few fat files, and the
    hash/explode work downstream is per-doc CPU — without the spread
    it single-threads on the scan partitioning. The shuffle moves raw
    text once, before it fans out to tokens/shingles/grams. A suite
    serving several tokenizing members persists THIS frame once and
    passes it down via the `words=` hooks below — one text scan and
    one split instead of one per member."""
    return df.repartition(id_col).select(
        id_col, F.split(F.col(text_col), " ").alias("_w")
    )


def doc_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, token) distinct pairs. Deduped map-side via
    array_distinct BEFORE exploding — distinctness is per-doc, so a
    cluster-wide distinct() shuffle would be pure waste. Pass `words`
    (a doc_words frame, usually persisted) to share the split pass."""
    w = words if words is not None else doc_words(df, text_col, id_col)
    return w.select(
        id_col,
        F.explode(F.array_distinct(F.col("_w"))).alias("token"),
    )


def doc_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, shingle) distinct word-trigram shingles.

    Trigrams (not unigrams) keep Jaccard discriminative on small
    vocabularies — with unigram tokens every same-domain doc pair looks
    near-identical and LSH degenerates to an all-pairs join.
    """
    # Materialize the word array ONCE per row before the lambda: an
    # expression inside transform() re-evaluates per element, so
    # inlining split() there costs O(words^2) splitting per doc.
    words = (
        words if words is not None else doc_words(df, text_col, id_col)
    )
    # per-doc dedupe happens map-side (array_distinct); repartition by
    # doc spreads the shingle+digest CPU across cores (see doc_tokens)
    return words.select(
        id_col, F.explode(F.array_distinct(_tris())).alias("shingle")
    )


# get() x3 instead of slice(): slice allocates a 3-element array
# per shingle before concat_ws; three positional reads don't
# (measured ~25% off the shingle stage). get() is null (not an
# ANSI error) past the end, and concat_ws skips nulls, so the
# size<3 degenerate doc still yields its single short shingle.
def _tris() -> F.Column:
    return F.expr(
        "transform(sequence(0, greatest(size(_w) - 3, 0)),"
        " i -> concat_ws(' ', get(_w, i), get(_w, i + 1), get(_w, i + 2)))"
    )


# single-slot registry for duplicate_spans' corpus-sized gram-array
# cache: bounds repeated-call accumulation at one copy (see docstring)
_LAST_GRAM_CACHE: DataFrame | None = None


def release_gram_cache() -> None:
    """Unpersist the gram-array cache left by the most recent
    `duplicate_spans` call. Safe anytime: consumers that re-read the
    released frame recompute from lineage (slower, never wrong)."""
    global _LAST_GRAM_CACHE
    if _LAST_GRAM_CACHE is not None:
        _LAST_GRAM_CACHE.unpersist()
        _LAST_GRAM_CACHE = None


def duplicate_spans(
    df: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """Exact substring-duplication detection (the suffix-array family:
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 — their exact-substring pass): report
    every maximal word-span of a document whose every `min_len`-gram
    occurs at least twice in the corpus (counting same-doc repeats,
    like the suffix-array total-occurrence rule). Where near-dup
    operators ask "are these DOCS similar", this asks "which PASSAGES
    are copied" — boilerplate, license headers, templated text.

    Spark shape (no suffix array needed for a fixed minimum length):
    1. every min_len-gram as an md5 digest with its 1-based start
       position — one explode, shuffled by digest, never by text;
    2. digests occurring >= 2 times survive (partial-aggregable count);
    3. surviving positions merge per doc into maximal islands — one
       window over (doc, start): an island breaks where start jumps
       past the running max span end + 1.

    Everything is linear in corpus token count; the only shuffles are
    the digest count and the per-doc window. Returns (id_col,
    span_start, span_end, n_grams) with word positions 1-based
    inclusive; n_grams = surviving gram starts inside the span (the
    island may bridge gaps up to min_len words, so it is not derivable
    from the endpoints).

    The text is tokenized and hashed ONCE: the compact per-doc gram
    arrays persist (the persisted_shingle_arrays idiom) and both
    consumers — the digest count and the semi-join probe — explode
    the cached arrays instead of re-running split+md5 over raw text.
    Default storage spills to disk when the gram stream outgrows
    memory. Cache lifecycle: the handle can't be unpersisted here (the
    returned spans frame is lazy and re-reads it per action), so each
    call RELEASES THE PREVIOUS call's corpus-sized cache — repeated
    invocation in one session holds at most ONE cached copy instead of
    accumulating toward OOM/spill pressure; `release_gram_cache()`
    frees the last one explicitly once its spans are materialized."""
    global _LAST_GRAM_CACHE
    release_gram_cache()
    arrays = gram_position_arrays(
        df, min_len, text_col, id_col, words=words
    ).persist()
    _LAST_GRAM_CACHE = arrays
    arrays.count()  # eager: both consumers schedule stages independently
    grams = _gram_stream(arrays, id_col)
    dup_hashes = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("_h")
    )
    dup = grams.join(dup_hashes, "_h", "left_semi")
    return _spans_from_dup_grams(dup, min_len, id_col)


def gram_position_arrays(
    df: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """(id_col, _gs: array<struct<start int, h string>>) — every
    `min_len`-gram of each doc as (1-based start, md5 digest), folded
    to ONE compact row per doc. This is the cache-friendly form of the
    gram stream (the persisted_shingle_arrays idiom): split + slice +
    md5 run ONCE over the text, and every consumer re-derives the
    exploded stream as a cheap Generate over cached arrays instead of
    a second pass over raw text. Also the per-doc position index the
    incremental spans state persists."""
    L = int(min_len)
    if L < 2:
        # L is interpolated into slice/sequence exprs below; < 2 yields
        # degenerate expressions (every single word "duplicated", or
        # empty slices) rather than meaningful spans — fail loudly,
        # the kmeans_centroids input-validation convention
        raise ValueError(f"duplicate_spans: min_len must be >= 2, got {min_len}")
    words = words if words is not None else doc_words(df, text_col, id_col)
    # sequence(a, b) DESCENDS when b < a — guard the short-doc case
    return words.select(
        id_col,
        F.expr(
            f"if(size(_w) < {L}, array(),"
            f" transform(sequence(1, size(_w) - {L} + 1),"
            f" i -> struct(i AS start,"
            f" md5(concat_ws(' ', slice(_w, i, {L}))) AS h)))"
        ).alias("_gs"),
    )


def _gram_stream(arrays: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, _start, _h) exploded from gram_position_arrays rows."""
    return arrays.select(id_col, F.explode("_gs").alias("_g")).select(
        id_col, F.col("_g.start").alias("_start"), F.col("_g.h").alias("_h")
    )


def _spans_from_dup_grams(
    dup: DataFrame, min_len: int, id_col: str = "doc_id"
) -> DataFrame:
    """Maximal islands over surviving gram starts: one window over
    (doc, start); an island breaks where start jumps past the running
    max span end + 1."""
    from pyspark.sql import Window

    L = int(min_len)
    w = Window.partitionBy(id_col).orderBy("_start")
    prev_end = F.max(F.col("_start") + (L - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.withColumn(
        "_island",
        F.sum(
            F.when(
                prev_end.isNull() | (F.col("_start") > prev_end + 1), 1
            ).otherwise(0)
        ).over(w),
    )
    return islands.groupBy(id_col, "_island").agg(
        F.min("_start").cast("long").alias("span_start"),
        (F.max("_start") + (L - 1)).cast("long").alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_grams"),
    ).drop("_island")


def duplication_rate(
    df: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplication rate — the fraction of a doc's words
    sitting inside `duplicate_spans` islands. THE filter signal
    corpus-quality pipelines actually threshold on ("drop docs that are
    >X% boilerplate", Lee et al. 2022 §5): span detection finds the
    copied passages, this rolls them into one number per doc. Islands
    are disjoint by construction, so covered words sum without overlap
    correction; docs with no duplicated span report 0.0. Returns
    (id_col, n_words, dup_words, dup_fraction)."""
    nw = (
        words.select(id_col, F.size("_w").cast("long").alias("n_words"))
        if words is not None
        else df.select(
            id_col,
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_words"),
        )
    )
    covered = (
        duplicate_spans(df, min_len, text_col, id_col, words=words)
        .groupBy(id_col)
        .agg(
            F.sum(F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("dup_words")
        )
    )
    dup = F.coalesce(F.col("dup_words"), F.lit(0)).cast("long")
    return nw.join(covered, id_col, "left").select(
        id_col,
        "n_words",
        dup.alias("dup_words"),
        (dup / F.col("n_words")).alias("dup_fraction"),
    )


def duplicate_spans_incremental(
    batch: DataFrame,
    state: dict[str, DataFrame] | None = None,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Incremental `duplicate_spans`: (spans_over_all_ingested, state).

    After every batch the returned spans equal a one-shot
    `duplicate_spans` over the UNION of all batches — including the
    hard case where a gram's corpus count crosses >= 2 only across
    batches, flipping spans of a document ingested long ago (pinned
    in test_corpus_plan). Batches must carry disjoint doc ids (the
    exact_dedup_incremental contract). State tables:

    - ``arrays``: per-doc gram position arrays (gram_position_arrays)
      — the positional index a re-spanned old doc is recomputed from;
      at 100 TB a partitioned table clustered by doc id, so the
      affected-doc semi-join prunes instead of scanning.
    - ``counts``: (h, n, only_doc) — corpus occurrence count per gram
      digest plus, for singletons (n == 1), the one doc holding the
      gram. `only_doc` is what makes the update O(batch + churn): when
      a batch pushes a singleton to n >= 2, the affected OLD doc reads
      straight off the state row — no corpus-wide inverted index, no
      gram-stream rescan.
    - ``spans``: the standing output; affected docs' slices are
      replaced (the warehouse replace-the-slice merge, operators/
      merge.py) and everything else carries forward untouched.

    Soundness: a doc's spans depend only on its own gram positions
    (immutable once ingested) and each gram's global dup status
    (count >= 2). Counts never decrease, so status flips only
    1 -> >=2; every old doc holding a flipping gram is recomputed,
    every other old doc's inputs are unchanged — equality with the
    rebuild follows doc-by-doc.

    Cost note: the COUNTS update and the affected-doc re-span are
    O(batch + churn), but this in-memory harness localCheckpoints the
    full ``arrays`` and ``spans`` UNIONS each batch, so per-batch
    materialization is O(corpus ingested so far). That is a harness
    artifact, not an algorithmic one: with state as partitioned TABLES
    (the 100 TB deployment shape), the unions become appends + slice
    replacements of churn-sized partitions and the per-batch write is
    O(batch + churn) too."""
    arrs_new = gram_position_arrays(
        batch, min_len, text_col, id_col
    ).localCheckpoint()
    g_new = _gram_stream(arrs_new, id_col)
    c_new = g_new.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(id_col).alias("_d"),
    )
    c_new = c_new.select(
        "_h", "_n", F.when(F.col("_n") == 1, F.col("_d")).alias("_only")
    )

    if state is None:
        counts = c_new.localCheckpoint()
        dup = g_new.join(
            counts.filter(F.col("_n") >= 2).select("_h"), "_h", "left_semi"
        )
        spans = _spans_from_dup_grams(dup, min_len, id_col).localCheckpoint()
        return spans, {"arrays": arrs_new, "counts": counts, "spans": spans}

    old = state["counts"].select(
        "_h", F.col("_n").alias("_no"), F.col("_only").alias("_oo")
    )
    merged = (
        old.join(c_new.withColumnRenamed("_n", "_nn"), "_h", "full_outer")
        .select(
            "_h",
            (F.coalesce("_no", F.lit(0)) + F.coalesce("_nn", F.lit(0))).alias("_n"),
            F.col("_no"),
            F.col("_oo"),
            F.col("_only").alias("_on"),
        )
    )
    counts = merged.select(
        "_h",
        "_n",
        F.when(F.col("_n") == 1, F.coalesce("_oo", "_on")).alias("_only"),
    ).localCheckpoint()
    # old docs whose spans can change: holders of a singleton gram the
    # batch pushed to >= 2 — read off the state row, O(churn)
    affected_old = (
        merged.filter((F.col("_no") == 1) & (F.col("_n") >= 2))
        .select(F.col("_oo").alias(id_col))
        .distinct()
    )
    affected_arrays = state["arrays"].join(
        affected_old, id_col, "left_semi"
    ).unionByName(arrs_new)
    dup = _gram_stream(affected_arrays, id_col).join(
        counts.filter(F.col("_n") >= 2).select("_h"), "_h", "left_semi"
    )
    new_slices = _spans_from_dup_grams(dup, min_len, id_col)
    recomputed = affected_old.unionByName(arrs_new.select(id_col)).distinct()
    spans = (
        state["spans"]
        .join(recomputed, id_col, "left_anti")
        .unionByName(new_slices)
        .localCheckpoint()
    )
    arrays_all = state["arrays"].unionByName(arrs_new).localCheckpoint()
    return spans, {"arrays": arrays_all, "counts": counts, "spans": spans}


def salted_self_pairs(
    keyed: DataFrame,
    key_cols: list[str],
    id_col: str,
    groups: int = 16,
    carry: list[str] | None = None,
) -> DataFrame:
    """All (a < b) pairs of ids sharing `key_cols`, skew-split.

    A plain self-join on a bucket key collapses a hot bucket with n
    members into one task doing n^2/2 work — the dominant failure mode
    of LSH banding at scale. Salting splits it: the left side carries
    hash(id) % G, the right side is replicated G times (one copy per
    salt), and the join key gains the salt — a hot bucket now spreads
    over G tasks at the cost of a G-times-larger (still tiny) build
    side. Every pair is still produced exactly once per key.

    `carry` names fixed-width payload columns to ride THROUGH the join
    (emitted as <col>_a / <col>_b): a verify stage that only needs a
    per-id scalar (a packed signature, a norm) then skips its two
    attach joins entirely — two fewer exchanges — at the cost of
    `groups` extra copies of the scalar on the replicated side. Only
    worth it for narrow scalars; never carry arrays or text here.
    """
    carry = carry or []
    left = keyed.select(
        F.col(id_col).alias("_ida"),
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"{c}_a") for c in carry],
        F.pmod(F.hash(id_col), F.lit(groups)).alias("_g"),
    )
    right = keyed.select(
        F.col(id_col).alias("_idb"),
        *[F.col(c) for c in key_cols],
        *[F.col(c).alias(f"{c}_b") for c in carry],
        F.explode(F.sequence(F.lit(0), F.lit(groups - 1))).alias("_g"),
    )
    return (
        left.join(right, [*key_cols, "_g"])
        .filter(F.col("_ida") < F.col("_idb"))
        .select(
            F.col("_ida").alias("doc_a"),
            F.col("_idb").alias("doc_b"),
            *[F.col(f"{c}_a") for c in carry],
            *[F.col(f"{c}_b") for c in carry],
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = N_MINHASHES,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature over trigram shingles.

    The k "independent" hash functions are k disjoint 4-hex-char
    slices of ONE md5 per shingle: mh_j = min(substr(md5(s), 4j, 4)).
    One digest instead of k seeded digests — hashing dominates this
    pipeline, so that is a kx saving — and md5 slices are independent
    uniform bits (k=8 slices tile the whole 32-hex digest). 16 bits
    per slice is plenty: slices are only ever consumed in pairs as
    AND-banded 32-bit band keys (see lsh_candidate_pairs), and random
    band collisions are pruned by the exact verify stage. Pass a
    persisted `shingles` frame when the caller also feeds shingles to
    the verify stage — shingling is the pipeline's one expensive
    scan."""
    sh = shingles if shingles is not None else doc_shingles(df, text_col, id_col)
    base = F.md5(F.col("shingle"))
    aggs = [
        F.min(F.substring(base, 4 * j + 1, 4)).alias(f"mh_{j}") for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Docs sharing any band of their signature -> (doc_a, doc_b) pairs,
    a < b, distinct across bands. Default 4 bands of 2 hashes
    (AND-amplification): the S-curve threshold sits at
    (1/b)^(1/r) = 0.5, exactly the downstream Jaccard cutoff. r=1
    banding is the classic LSH scale failure — any two docs sharing a
    single min-shingle collide, so common boilerplate shingles create
    huge buckets and the verify stage drowns in false candidates
    (measured 42k candidates for 256 true dups on the test corpus;
    r=2 cuts that ~50x). The exact Jaccard verify pass prunes what
    remains.

    One salted self-join over all bands at once: band id is part of the
    join key, and hot buckets are salt-split (see salted_self_pairs)."""
    banded = band_keys(signatures, id_col, bands, rows_per_band)
    # Persist + eagerly materialize: both sides of the self-join read
    # this frame, and without the cache each side re-runs the whole
    # shingle->md5->8-way-min aggregation. The frame is bands rows per
    # doc (tiny relative to the shingle stream it collapses).
    banded = banded.persist()
    banded.count()
    return salted_self_pairs(banded, ["band", "band_key"], id_col).distinct()


def band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """(doc_id, band, band_key) — each doc's LSH band membership rows
    (the index the banding self-join and the incremental band state are
    both built from)."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


N_SIMHASH_BITS = 64  # 16 md5 hex chars x 4 bits
SIMHASH_CHUNKS = 4  # hamming <= 3 => >=1 of 4 16-bit chunks identical

_HEX = "'0123456789abcdef'"


def _simhash_bit_sql(i: int, h: str = "_h") -> str:
    """SQL for bit i of the 64-bit token hash: hex digit -> bit.

    Engine-portable (Spark + DuckDB): instr/substring/floor only, no
    bitwise ops or platform hash functions.
    """
    pos, shift = i // 4 + 1, 1 << (i % 4)
    return (
        f"CAST(FLOOR((instr({_HEX}, substring({h}, {pos}, 1)) - 1) / {shift}) AS INT) % 2"
    )


def _simhash_votes(
    df: DataFrame, text_col: str, id_col: str, words: DataFrame | None = None
) -> DataFrame:
    """Per-doc bit votes: v_i = sum over distinct tokens of
    (2*bit_i(md5(token)) - 1). One shuffle on doc_id; the 64 votes are
    plain sum aggregates, fully map-side-combinable, so the shuffle
    carries 64 ints per doc — not the token stream.

    Hot path: the first 16 md5 hex chars are parsed ONCE per row into
    four 16-bit words (conv), and each of the 64 vote terms is an
    integer shift+mask — not a per-bit string probe. Bit numbering is
    identical to `_simhash_bit_sql` (used by the DuckDB oracle):
    bit i = (digit value of hex char i//4) >> (i%4) & 1, and hex char
    j of word k is that word's (3-j)th nibble.
    """
    toks = doc_tokens(df, text_col, id_col, words=words).withColumn(
        "_h", F.md5("token")
    )
    for k in range(N_SIMHASH_BITS // 16):
        toks = toks.withColumn(
            f"_w{k}",
            F.expr(f"CAST(conv(substring(_h, {4 * k + 1}, 4), 16, 10) AS BIGINT)"),
        )
    aggs = []
    for i in range(N_SIMHASH_BITS):
        k, j, s = i // 16, (i // 4) % 4, i % 4
        shift = 4 * (3 - j) + s
        aggs.append(
            F.sum(
                F.expr(f"2 * CAST(shiftrightunsigned(_w{k}, {shift}) & 1 AS INT) - 1")
            ).alias(f"v_{i}")
        )
    return toks.groupBy(id_col).agg(*aggs)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc 64-bit SimHash as a '0'/'1' string column `simhash`
    (human-inspectable form; the join path uses the packed variant)."""
    votes = _simhash_votes(df, text_col, id_col)
    chars = [
        F.when(F.col(f"v_{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(N_SIMHASH_BITS)
    ]
    return votes.select(id_col, F.concat(*chars).alias("simhash"))


def simhash_signatures_bits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """Per-doc SimHash packed into one BIGINT `sig` (bit i = vote_i>=0).
    Bit order matches position i+1 of the string form, so chunk c of the
    string equals (sig >> 16c) & 0xFFFF."""
    votes = _simhash_votes(df, text_col, id_col, words=words)
    packed = " | ".join(
        f"shiftleft(CAST(CASE WHEN v_{i} >= 0 THEN 1 ELSE 0 END AS BIGINT), {i})"
        for i in range(N_SIMHASH_BITS)
    )
    return votes.select(id_col, F.expr(packed).alias("sig"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with SimHash hamming <= max_hamming.

    Scale path: the signature is split into 4 16-bit chunks; by
    pigeonhole any pair within hamming<=3 agrees on at least one whole
    chunk, so candidates come from 4 equi-joins on chunk values — never
    an all-pairs comparison. The exact hamming check (one XOR +
    bit_count on packed BIGINT signatures) then prunes.

    The packed signature (one BIGINT per doc) RIDES THROUGH the chunk
    self-join (`salted_self_pairs(carry=["sig"])`), so the exact
    hamming verify is a map-side XOR+bit_count on the join output —
    no sig-attach joins, two fewer exchanges than the attach shape.
    The 64-vote aggregation is not persisted either: both sides of the
    self-join consume the IDENTICAL (id, sig, chunks) subtree, so the
    vote aggregation's exchange is planned once and reused
    (ReusedExchange) — the map-side token work runs once per action
    with no barrier job, where the old persist+count paid a serialized
    fixed-floor job before the main plan could start.
    """
    sigs = simhash_signatures_bits(df, text_col, id_col, words=words).persist()
    sigs.count()
    chunk_bits = N_SIMHASH_BITS // SIMHASH_CHUNKS
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk_no"),
            F.expr(
                f"shiftrightunsigned(sig, {c * chunk_bits}) & {(1 << chunk_bits) - 1}"
            ).alias("chunk_val"),
        )
        for c in range(SIMHASH_CHUNKS)
    ]
    chunked = sigs.select(
        F.col(id_col), F.col("sig"), F.explode(F.array(*chunk_structs)).alias("ck")
    ).select(
        id_col,
        F.col("sig"),
        F.col("ck.chunk_no").alias("chunk_no"),
        F.col("ck.chunk_val").alias("chunk_val"),
    )
    cands = salted_self_pairs(
        chunked, ["chunk_no", "chunk_val"], id_col, carry=["sig"]
    )
    # Candidates arrive with cross-band duplicates; the XOR+bit_count
    # filter is far cheaper than a distinct, so dedupe AFTER pruning —
    # the distinct shuffle then carries the survivors, not the 4x
    # banded candidate stream.
    return (
        cands.withColumn("hamming", F.expr("bit_count(sig_a ^ sig_b)").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


CHUNK_TOKENS = 8


def doc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = CHUNK_TOKENS,
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, ord, chunk, digest): the document cut into
    non-overlapping `chunk_tokens`-token windows in order (the "line"
    unit for corpus-level boilerplate removal when the corpus has no
    newlines; a sentence splitter would slot in identically). digest =
    md5(chunk) so downstream joins/shuffles move a fixed 32-char key,
    never the chunk text. Pass `words` (a doc_words frame) to share
    the split pass with other consumers."""
    words = words if words is not None else doc_words(df, text_col, id_col)
    k = int(chunk_tokens)
    chunks = F.expr(
        f"transform(sequence(0, CAST(ceil(size(_w) / {k}.0) AS INT) - 1),"
        f" i -> struct(i AS ord, concat_ws(' ', slice(_w, i * {k} + 1, {k})) AS chunk))"
    )
    return words.select(id_col, F.inline(chunks)).withColumn(
        "digest", F.md5("chunk")
    )


def chunk_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style corpus-level boilerplate removal: drop every chunk
    ("line") that occurs in more than one distinct document, then
    reassemble each document from its surviving chunks in original
    order. Returns (doc_id, n_chunks, n_kept, clean_text) — clean_text
    is '' when everything was boilerplate; within-doc repeats of a
    chunk survive (the rule targets cross-document boilerplate).

    Scale shape: chunk frequency is a groupBy on the md5 digest (the
    chunk vocabulary — far too big to broadcast at corpus scale), and
    the keep-filter is a left-semi join back on that digest, so both
    shuffles carry 32-char keys. Reassembly is one per-doc
    collect_list over (ord, chunk) structs — bounded by document
    size, the same invariant every per-doc text op here relies on.
    """
    ch = doc_chunks(df, text_col, id_col).persist()
    unique_digests = (
        ch.groupBy("digest")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") == 1)
        .select("digest")
    )
    kept = ch.join(unique_digests, "digest", "left_semi")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.expr("transform(array_sort(collect_list(struct(ord, chunk))), s -> s.chunk)"),
        ).alias("clean_text"),
    )
    totals = ch.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, label) per node appearing in `pairs`; label = the minimum
    id in the node's connected component.

    Min-label propagation: every round each node adopts the smallest
    label among itself and its neighbors — one equi-join keyed on node
    id plus one min-aggregation per round, both map-side combinable.
    Converges in O(graph diameter) rounds; LSH near-dup clusters are
    near-cliques, so the diameter (and round count) is tiny in the
    intended workload.

    Lineage is truncated every round with an eager localCheckpoint:
    the checkpoint job IS the round's materialization (small data,
    cheap), and then the convergence probe and every later consumer
    read those blocks instead of re-running the propagation chain.
    (Checkpointing less often was measured 2x WORSE here — each probe
    and the final consumer re-execute the un-truncated lineage, which
    grows a join per round.)

    Scale note: rounds scale with graph DIAMETER, so `max_iter` can be
    exhausted by chain-shaped components (a 40-node path needs 39
    rounds). Exhaustion is DETECTED and the computation hands off to
    `connected_components_star` (O(log n) rounds on any shape) instead
    of silently returning partially-propagated labels — the
    wrong-answer mode this guard exists for is pinned in
    test_operators (TestClusterLabelsDispatch). The simple propagation
    stays the default body because it is the right trade for the
    near-clique cluster shapes dedup actually produces.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nbr"))
        .select(F.col("src").alias("node"), F.least("src", "_nbr").alias("label"))
        .localCheckpoint()
    )
    converged = False
    for i in range(max_iter):
        nbr_min = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("_nbr_label"))
            .withColumnRenamed("src", "node")
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("_nbr_label", "label")).alias("label"),
                (F.col("_nbr_label") < F.col("label")).alias("_chg"),
            )
            .localCheckpoint()
        )
        labels = stepped.drop("_chg")
        if stepped.filter("_chg").limit(1).count() == 0:
            converged = True
            break
    if not converged:
        # diameter exceeded the round budget: labels are NOT final.
        # Re-run with the shape-insensitive algorithm rather than
        # return a wrong (partially propagated) answer — on the
        # already-materialized symmetric edge frame, NOT the raw pairs
        # lineage (which could be an expensive unpersisted LSH chain
        # that a rerun would execute a second time). The edge frame is
        # the same graph (star re-normalizes orientation and dedupes),
        # including pure self-loop nodes, which star's node roster
        # picks up from its input frame before the u != v filter.
        out = connected_components_star(edges, "src", "dst").localCheckpoint()
        edges.unpersist()
        return out
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 50,
    driver_finish: int = 50_000,
) -> DataFrame:
    """(node, label) per node in `pairs`; label = component minimum.
    Same contract as `connected_components`, different round shape:
    alternating large-star/small-star rewrites (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"), which converge in
    O(log n) rounds on ANY graph shape — the scale path for
    adversarial inputs (long chains, giant components) where plain
    min-label propagation needs O(diameter) rounds.

    Each half-round is one groupBy(min) plus one join, both on the
    edge frame keyed by node id; the edge set only ever shrinks toward
    a star per component (every node pointing at its minimum), so
    per-round cost is bounded by the current edge count. Convergence
    is an empty symmetric difference — on tiny graphs checked exactly
    as here; at 100 TB the cheap surrogate is (edge count, sum of
    endpoints) stabilizing.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    # normalized orientation: u = max endpoint, v = min endpoint
    edges = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(df: DataFrame):
        # cheap per-round fingerprint over the checkpointed frame: the
        # exact (and expensive) symmetric-difference check only runs
        # when two consecutive fingerprints agree — any real change
        # almost surely perturbs (count, hash-sum), and a (vanishingly
        # rare) fingerprint collision merely costs one extra exact
        # check, never a wrong early stop.
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (r["n"], r["h"])

    # Driver-finish tier: below `driver_finish` edges the whole graph
    # is RESULT-SIZED (16 bytes/edge -> <1 MB at the default), and a
    # single-pass union-find beats any number of distributed rounds —
    # each star round costs 2+ fixed-floor jobs regardless of size
    # (measured ~3 s for a 256-edge graph at sf0.1). The same
    # size-dispatched design as Spark's own broadcast-join threshold:
    # the distributed rounds remain the path the moment the edge set
    # is not driver-sized, and equivalence is pinned in test_operators
    # on chains and cliques through both tiers. The dispatch is ONE
    # limited collect over the checkpointed edge frame (LocalLimit
    # stops early on big graphs) instead of the old count-then-collect
    # pair — one fixed-floor job saved either way; the fingerprint
    # that seeds the round loop is only computed on the big path.
    probe = edges.limit(driver_finish + 1).collect()
    if len(probe) <= driver_finish:
        rows = probe
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            ru, rv = find(row["u"]), find(row["v"])
            if ru != rv:
                # point the larger root at the smaller: the root stays
                # the component MINIMUM by induction
                parent[max(ru, rv)] = min(ru, rv)
        nodes = {row["u"] for row in rows} | {row["v"] for row in rows}
        spark = pairs.sparkSession
        node_type = edges.schema["u"].dataType.simpleString()
        lab = spark.createDataFrame(
            [(x, find(x)) for x in sorted(nodes)],
            f"node {node_type}, _lbl {node_type}",
        )
        all_nodes = (
            pairs.select(F.col(id_a).alias("node"))
            .union(pairs.select(F.col(id_b).alias("node")))
            .distinct()
        )
        return all_nodes.join(F.broadcast(lab), "node", "left").select(
            "node", F.coalesce("_lbl", "node").alias("label")
        )
    prev_sig = _sig(edges)
    converged = False
    for _ in range(max_iter):
        # large-star: around every center c, attach each LARGER
        # neighbor to m(c) = min of c's neighborhood (incl. c)
        both = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            both.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m"))
        )
        large = (
            both.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: around every center (edges already u > v), point
        # each smaller neighbor and the center itself at the minimum
        m2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(m2, "u")
            .select(
                F.when(F.col("v") == F.col("m"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("m").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        sig = _sig(small)
        unchanged = sig == prev_sig and (
            small.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(small).limit(1).count() == 0
        )
        edges = small
        prev_sig = sig
        if unchanged:
            converged = True
            break
    if not converged:
        # Star is the terminal algorithm (propagation already falls
        # back to it), so exhausting max_iter without an unchanged
        # round must be loud: silently returning partial labels is
        # the one wrong-answer mode this family has. 50 rounds of an
        # O(log n) algorithm makes this near-impossible in practice —
        # which is exactly why a silent occurrence would be
        # undiagnosable.
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds; "
            "the graph is larger/stranger than the round budget allows — "
            "raise max_iter"
        )
    all_nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .union(pairs.select(F.col(id_b).alias("node")))
        .distinct()
    )
    return (
        all_nodes.join(
            edges.select(F.col("u").alias("node"), F.col("v").alias("_lbl")),
            "node",
            "left",
        )
        .select("node", F.coalesce("_lbl", "node").alias("label"))
    )


def cluster_labels(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    algorithm: str = "auto",
    star_threshold: int = 1000,
) -> DataFrame:
    """Connected-component labels for a dedup pair graph, dispatching
    between the two equivalent implementations:

    - "propagation" (`connected_components`): O(diameter) rounds —
      fastest on the near-clique clusters LSH dedup actually emits,
      where diameter is 2-3.
    - "star" (`connected_components_star`): O(log n) rounds on ANY
      shape — the guarantee you want when the graph's shape is not
      yours to assume (adversarial chains, giant components).
    - "auto": materializes the pair frame (the clustering loop is
      about to iterate it anyway, so the count is not wasted work) and
      picks star above `star_threshold` edges: below it the graph fits
      in a couple of tasks and a diameter-bounded loop is cheaper per
      round; above it, betting on small diameter is how a 100 TB run
      loses a night to a chain-shaped component.

    Both return identical (node, label = component minimum) frames —
    equivalence is pinned on chains and cliques in test_operators."""
    if algorithm == "auto":
        # Respect a caller's own cache: Spark persistence is not
        # reference-counted, so persist+unpersist here would evict a
        # frame the caller had cached for its own reuse.
        caller_cached = pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
        if not caller_cached:
            pairs = pairs.persist()
        algorithm = "star" if pairs.count() > star_threshold else "propagation"
        fn = (
            connected_components_star
            if algorithm == "star"
            else connected_components
        )
        # Materialize the (node-count-sized) label frame, then release
        # the pair cache: without this, every auto invocation from a
        # long-running caller pins one pair frame in executor storage
        # forever (the clustering loop checkpoints its own state, but
        # star's final node-roster join reads `pairs` lazily).
        out = fn(pairs, id_a, id_b).localCheckpoint()
        if not caller_cached:
            pairs.unpersist()
        return out
    if algorithm == "star":
        return connected_components_star(pairs, id_a, id_b)
    if algorithm == "propagation":
        return connected_components(pairs, id_a, id_b)
    raise ValueError(f"unknown clustering algorithm {algorithm!r}")


def token_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact trigram-shingle-set Jaccard for the given (doc_a, doc_b)
    pairs. Pass a persisted `shingles` frame to share the shingle scan
    with signature generation.

    Deliberately NOT pre-filtered to candidate docs: deriving the
    candidate id set from `pairs` for a semi-join re-executes the
    whole LSH chain a second time (pairs is lazy — measured 2x worse
    end-to-end than just shuffling the full persisted shingle frame).
    At 100 TB, materialize `pairs` once first and THEN semi-join."""
    if shingles is None:
        shingles = doc_shingles(df, text_col, id_col).persist()
        shingles.count()  # feeds both intersection sides and the size agg
    toks = shingles.withColumnRenamed("shingle", "token")
    sizes = toks.groupBy(id_col).agg(F.count("token").alias("n"))
    inter = (
        pairs.join(toks.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .join(
            toks.select(F.col(id_col).alias("doc_b"), F.col("token").alias("_tb")),
            "doc_b",
        )
        .filter(F.col("token") == F.col("_tb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_intersect"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill(0, ["n_intersect"])
        .join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_intersect").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_intersect")).cast("double"),
        )
        .select("doc_a", "doc_b", "n_intersect", "jaccard")
    )


def exact_dedup_incremental(
    batch: DataFrame,
    seen_digests: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Exact dedup of an incoming batch against accumulated digest
    state: returns (survivors, updated_state).

    The incrementally-sound prefix of corpus prep (quality gate +
    exact dedup) processes only NEW documents per run: a doc survives
    iff its digest is unseen in-state AND it wins keep-lowest-id
    within the batch. When batches arrive in id order this equals the
    full-rebuild `exact_dedup` exactly (pinned in test_corpus_plan) —
    the M1 insert-if-absent pattern (SURVEY.md §2.10) applied to
    content digests instead of wallet ids. State is one digest string
    per distinct doc ever kept: the anti-join broadcasts while state
    is small and degrades to a shuffled join at corpus scale, both
    correct. Near-dup clustering is deliberately NOT incremental —
    clusters span batches, so that stage re-runs on survivors.
    """
    dg = batch.withColumn("_digest", F.md5(F.col(text_col)))
    within = dedupe_keep_first(dg, ["_digest"], [F.col(id_col).asc()])
    fresh = (
        within.join(seen_digests, "_digest", "left_anti")
        if seen_digests is not None
        else within
    )
    new_state = fresh.select("_digest")
    state = (
        seen_digests.unionByName(new_state).distinct()
        if seen_digests is not None
        else new_state
    )
    return fresh.drop("_digest"), state


def lsh_dedup_incremental(
    batch: DataFrame,
    state: dict[str, DataFrame] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Incremental MinHash-LSH near-dup dedup: (survivor_ids, state).

    The incremental form of the canonical-cluster pipeline (q29) under
    the reference's I1 high-water-mark pattern
    (retrieve_dune_transfer_data.py:127-147): each run shingles ONLY
    the incoming batch; previously-seen docs contribute through three
    state tables —

    - ``bands``:  (band, band_key, doc_id) LSH band memberships,
    - ``arrays``: per-doc shingle arrays (the verify index),
    - ``pairs``:  the verified near-dup edge graph so far.

    New candidates = within-batch band collisions (salted self-join)
    UNION batch-vs-state band joins; exact Jaccard verifies against
    the array index, and clustering re-runs over the ACCUMULATED edge
    graph. Because state covers all seen docs (not just survivors),
    the edge set equals a full rebuild's exactly, so connected
    components + keep-lowest-id yields identical survivors — any graph
    shape, including clusters bridged through already-dropped docs
    (pinned in test_corpus_plan). Batches must carry disjoint doc ids
    (the exact_dedup_incremental contract).

    At 100 TB each state frame is a partitioned table (bands clustered
    by band_key, arrays by id); a batch appends its own rows and the
    heavy work — shingling, hashing, banding — touches only new docs.
    Survivors return as an id frame; join it back to the doc store.
    """
    arrs_new = doc_shingle_arrays(batch, text_col, id_col).localCheckpoint()
    sh_new = arrs_new.select(id_col, F.explode("_toks").alias("shingle"))
    sigs_new = minhash_signatures(batch, text_col, id_col, shingles=sh_new)
    banded_new = band_keys(sigs_new, id_col).localCheckpoint()
    within = salted_self_pairs(banded_new, ["band", "band_key"], id_col).distinct()
    if state is not None:
        old = state["bands"].select(
            F.col(id_col).alias("_ida"), "band", "band_key"
        )
        new = banded_new.select(F.col(id_col).alias("_idb"), "band", "band_key")
        cross = (
            old.join(new, ["band", "band_key"])
            .select(
                F.least("_ida", "_idb").alias("doc_a"),
                F.greatest("_ida", "_idb").alias("doc_b"),
            )
            .filter(F.col("doc_a") != F.col("doc_b"))
            .distinct()
        )
        cand = within.unionByName(cross).distinct()
        arrs_all = state["arrays"].unionByName(arrs_new).localCheckpoint()
        bands_all = state["bands"].unionByName(banded_new).localCheckpoint()
    else:
        cand = within
        arrs_all = arrs_new
        bands_all = banded_new
    verified = (
        array_jaccard_verify(cand, arrays=arrs_all, id_col=id_col)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b")
    )
    pairs_all = (
        verified
        if state is None
        else state["pairs"].unionByName(verified)
    ).localCheckpoint()
    labels = cluster_labels(pairs_all, "doc_a", "doc_b")
    dropped = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    survivors = arrs_all.select(id_col).join(dropped, id_col, "left_anti")
    return survivors, {"bands": bands_all, "arrays": arrs_all, "pairs": pairs_all}


def persisted_shingle_arrays(
    df, text_col: str = "text", id_col: str = "doc_id",
    words: DataFrame | None = None,
):
    """(arrs, shingle_stream): the shared-scan idiom every multi-branch
    shingle consumer uses — persist the COMPACT per-doc array frame,
    materialize it eagerly (multi-branch consumers schedule upstream
    stages independently before a lazy cache completes; see SCALE.md
    "Eager cache materialization"), and re-derive the exploded stream
    as a cheap Generate over cached arrays. Caller owns the cache
    lifecycle (bench/driver clearCache between queries)."""
    arrs = doc_shingle_arrays(df, text_col, id_col, words=words).persist()
    arrs.count()
    return arrs, arrs.select(id_col, F.explode("_toks").alias("shingle"))


def doc_shingle_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, _toks: array<string>, _n) — each doc's distinct shingle
    set folded to ONE row: the cache-friendly form of the shingle
    stream (same bytes, one row per doc; re-deriving the exploded
    stream from it is a cheap Generate over cached arrays instead of a
    re-run of split+trigram+concat over raw text). Built as a PURE
    PROJECTION over the words frame — shingle distinctness is per-doc,
    so the old explode + partition-local collect_list round-trip was a
    whole hash-aggregation pass re-folding an array the trigram
    expression had already built. Every consumer (min-hash slices,
    array_intersect verify, df-ordered prefix filter) treats _toks as
    a SET, so the element order change (document order instead of
    collect_list order) is unobservable. Persist THIS frame when
    several pipeline stages (df-ranking, banding, verify) need the
    shingles. A doc with NULL text keeps a NULL _toks row here (the
    explode used to drop it); no consumer joins arrays for ids outside
    the candidate stream, which never contains such docs."""
    w = words if words is not None else doc_words(df, text_col, id_col)
    return w.select(
        id_col, F.array_distinct(_tris()).alias("_toks")
    ).withColumn("_n", F.size("_toks").cast("long"))


def doc_word_shingle_arrays(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, _w, _toks, _n) — words AND distinct trigram shingles in
    ONE pass over the text: the single persisted feed for a suite whose
    members consume both grains (trigram minhash/verify/prefix plus
    word-grain simhash/chunks/grams). One cache-fill barrier replaces
    the words-then-arrays chain of two."""
    w = doc_words(df, text_col, id_col)
    return w.select(
        id_col, "_w", F.array_distinct(_tris()).alias("_toks")
    ).withColumn("_n", F.size("_toks").cast("long"))


def array_jaccard_verify(
    pairs: DataFrame,
    shingles: DataFrame | None = None,
    id_col: str = "doc_id",
    arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via per-doc
    shingle ARRAYS — the exchange-lean alternative to token_jaccard's
    token-stream groupBy.

    One partition-local groupBy folds each doc's (already-distinct)
    shingles into an array + size (shingle frames arrive partitioned
    on the doc id, so this adds NO exchange); candidates then fetch
    both arrays by id and the intersection computes map-side with
    array_intersect inside codegen. Two exchanges total after the
    candidate generator (pairs by doc_a, then by doc_b) versus the
    token-stream verify's four (two id joins, the pair groupBy, the
    size join).

    Shuffle volume is candidate-bounded: each candidate pair carries
    two doc arrays once — the same tokens the stream verify shuffled,
    minus the re-keyed aggregation passes. The prefix/LSH generator
    keeping candidates near the true-pair count is what makes this the
    right side of the trade at 100 TB; for a generator that
    over-produces, verify with token_jaccard instead (it never widens
    rows beyond (pair, token)).

    Pass `arrays` (a doc_shingle_arrays frame, usually persisted) to
    share the shingle scan with the candidate generator; else a
    (doc_id, shingle) `shingles` stream is folded here."""
    if arrays is not None:
        arrs = arrays
    elif shingles is not None:
        arrs = shingles.groupBy(id_col).agg(
            F.collect_list("shingle").alias("_toks"),
            F.count(F.lit(1)).alias("_n"),
        )
    else:
        raise ValueError(
            "array_jaccard_verify needs `shingles` (a (doc, shingle) "
            "stream) or `arrays` (a doc_shingle_arrays frame)"
        )
    a = arrs.select(
        F.col(id_col).alias("doc_a"),
        F.col("_toks").alias("_ta"),
        F.col("_n").alias("_na"),
    )
    b = arrs.select(
        F.col(id_col).alias("doc_b"),
        F.col("_toks").alias("_tb"),
        F.col("_n").alias("_nb"),
    )
    ni = F.size(F.array_intersect("_ta", "_tb")).cast("long")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_intersect", ni)
        .withColumn(
            "jaccard",
            F.col("n_intersect").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("n_intersect")).cast("double"),
        )
        .select("doc_a", "doc_b", "n_intersect", "jaccard")
    )


def prefix_filter_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens: DataFrame | None = None,
    broadcast_df: bool = True,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs via prefix filtering — the
    EXACT-recall set-similarity join (PPJoin family), complementing
    probabilistic LSH (lsh_candidate_pairs).

    Order every doc's token set by a global total order (rarest token
    first: ascending document frequency, token text as tiebreak); for
    Jaccard >= t two sets MUST share a token within their first
    n - ceil(t*n) + 1 tokens, so the self-join runs only on those
    prefixes. Rarest-first is what makes the filter sharp: prefixes
    are built from low-df tokens, so prefix-token buckets are small
    and the candidate count stays near the true-pair count — the
    stop-word bucket that would recreate the all-pairs join is
    structurally excluded from prefixes. Every count here is integer
    (prefix length n - ceil(t*n) + 1 computed as n - ((n*num + den - 1)
    div den) + 1 with t = num/den), so both engines agree exactly.

    Scale: the prefix stream is a fraction of the token stream; the
    self-join shuffles on token with salting unnecessary precisely
    because prefixes exclude hot tokens. The document-frequency table
    is vocabulary-sized at WORD grain but O(corpus) at SHINGLE grain
    (every 3-gram is near-unique), so `broadcast_df` is a caller
    decision: True (default) hint-broadcasts it — right whenever the
    distinct-token count is driver-memory-sized (all word-grain
    callers; shingle grain up to ~100k docs, measured fine at 50k docs
    / ~2.8M shingles on a 12g driver) — while False leaves the join
    strategy to the planner (sort-merge at scale; the round-12 sf10
    gate found the hinted 25M-shingle broadcast overflowing the
    driver, the exact failure mode guide §3.1 warns about). Verify
    candidates with token_jaccard (exact), as q74 does.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    # A small exact ratio for the threshold: raw as_integer_ratio() on
    # a non-dyadic float (0.7 -> 3152519739159347/4503599627370496)
    # would overflow BIGINT in `_n * num` for docs beyond ~2.9k tokens.
    # limit_denominator(1000) is exact for any threshold expressed with
    # <= 3 decimal digits and keeps the product within 2^63 for any
    # realistic document.
    frac = Fraction(threshold).limit_denominator(1000)
    num, den = frac.numerator, frac.denominator
    toks = tokens if tokens is not None else doc_tokens(df, text_col, id_col)
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy(id_col).orderBy("_df", "token")
    ranked = (
        toks.join(F.broadcast(dfreq) if broadcast_df else dfreq, "token")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
    )
    prefix_len = (
        F.col("_n")
        - F.expr(f"(_n * {num} + {den} - 1) div {den}")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("_rn") <= prefix_len).select(
        id_col, "token", "_rn", "_n"
    )
    a = prefix.select(
        F.col(id_col).alias("doc_a"),
        "token",
        F.col("_rn").alias("_ra"),
        F.col("_n").alias("_na"),
    )
    b = prefix.select(
        F.col(id_col).alias("doc_b"),
        "token",
        F.col("_rn").alias("_rb"),
        F.col("_n").alias("_nb"),
    )
    # PPJoin's two exact-recall-preserving prunes, applied as map-side
    # predicates inside the token join (Xiao et al., "Efficient
    # Similarity Joins for Near Duplicate Detection"):
    # - length filter: Jaccard >= t forces min(n)/max(n) >= t;
    # - positional filter: the pair must still be able to reach the
    #   required overlap alpha = ceil(t/(1+t) * (na+nb)) given where in
    #   each prefix the shared token sits — overlap is bounded by
    #   1 + min(remaining tokens after the match on either side).
    # Both are integer-exact via the num/den threshold ratio. Measured
    # 409k -> 125k candidates on the sf0.1 documents corpus (its
    # uniform doc lengths blunt the length filter; real corpora prune
    # harder); recall is a theorem, and parity (q74) pins it
    # empirically. Member wall fell 9.4 s -> 2.7 s.
    length_ok = (
        F.least("_na", "_nb") * F.lit(den) >= F.greatest("_na", "_nb") * F.lit(num)
    )
    alpha = F.expr(f"((_na + _nb) * {num} + ({num} + {den}) - 1) div ({num} + {den})")
    position_ok = (
        F.lit(1) + F.least(F.col("_na") - F.col("_ra"), F.col("_nb") - F.col("_rb"))
        >= alpha
    )
    return (
        a.join(b, "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(length_ok)
        .filter(position_ok)
        .select("doc_a", "doc_b")
        .distinct()
    )
