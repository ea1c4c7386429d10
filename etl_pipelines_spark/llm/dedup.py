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

N_MINHASHES = 4


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per exact text digest."""
    df = df.withColumn("_digest", F.md5(F.col(text_col)))
    return dedupe_keep_first(df, ["_digest"], [F.col(id_col).asc()]).drop("_digest")


def doc_tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token) distinct pairs."""
    return (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .distinct()
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) distinct word-trigram shingles.

    Trigrams (not unigrams) keep Jaccard discriminative on small
    vocabularies — with unigram tokens every same-domain doc pair looks
    near-identical and LSH degenerates to an all-pairs join.
    """
    tris = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - 2, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, 3)))"
    )
    return df.select(id_col, F.explode(tris).alias("shingle")).distinct()


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = N_MINHASHES
) -> DataFrame:
    """Per-doc MinHash signature over trigram shingles:
    mh_j = min(md5('j:' || shingle))."""
    sh = doc_shingles(df, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"mh_{j}")
        for j in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 1
) -> DataFrame:
    """Docs sharing any band of their signature -> (doc_a, doc_b) pairs,
    a < b, distinct across bands. Default 4 bands of 1 hash: loose,
    recall-oriented banding; the exact Jaccard verify pass prunes."""
    pair_frames = []
    for b in range(bands):
        cols = [f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        banded = signatures.select(
            F.col(id_col), F.concat_ws("|", *cols).alias("band_key")
        )
        left = banded.alias("l")
        right = banded.alias("r")
        pairs = (
            left.join(right, F.col("l.band_key") == F.col("r.band_key"))
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b")
            )
        )
        pair_frames.append(pairs)
    out = pair_frames[0]
    for p in pair_frames[1:]:
        out = out.unionByName(p)
    return out.distinct()


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


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc 64-bit SimHash as a '0'/'1' string column `simhash`.

    bit_i = sign of sum over distinct tokens of (2*bit_i(md5(token))-1).
    One shuffle on doc_id; the 64 votes are plain sum aggregates, fully
    map-side-combinable, so the shuffle carries 64 ints per doc — not
    the token stream.
    """
    toks = doc_tokens(df, text_col, id_col).withColumn("_h", F.md5("token"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(F.expr(f"2 * ({_simhash_bit_sql(i)}) - 1")).alias(f"v_{i}")
            for i in range(N_SIMHASH_BITS)
        ]
    )
    chars = [
        F.when(F.col(f"v_{i}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(N_SIMHASH_BITS)
    ]
    return votes.select(id_col, F.concat(*chars).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with SimHash hamming <= max_hamming.

    Scale path: the signature is split into 4 16-bit chunks; by
    pigeonhole any pair within hamming<=3 agrees on at least one whole
    chunk, so candidates come from 4 equi-joins on chunk values — never
    an all-pairs comparison. The exact hamming check then prunes.
    """
    sigs = simhash_signatures(df, text_col, id_col)
    chunk_len = N_SIMHASH_BITS // SIMHASH_CHUNKS
    frames = []
    for c in range(SIMHASH_CHUNKS):
        chunked = sigs.select(
            F.col(id_col),
            F.concat(
                F.lit(f"{c}|"), F.substring("simhash", c * chunk_len + 1, chunk_len)
            ).alias("chunk_key"),
        )
        left, right = chunked.alias("l"), chunked.alias("r")
        frames.append(
            left.join(right, F.col("l.chunk_key") == F.col("r.chunk_key"))
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias("doc_a"),
                F.col(f"r.{id_col}").alias("doc_b"),
            )
        )
    cands = frames[0]
    for fr in frames[1:]:
        cands = cands.unionByName(fr)
    cands = cands.distinct()

    sig_a = sigs.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"))
    sig_b = sigs.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"))
    hamming = F.expr(
        f"aggregate(transform(sequence(1, {N_SIMHASH_BITS}), i -> "
        "CASE WHEN substring(sh_a, i, 1) <> substring(sh_b, i, 1) THEN 1 ELSE 0 END), "
        "0, (acc, v) -> acc + v)"
    )
    return (
        cands.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def token_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact trigram-shingle-set Jaccard for the given (doc_a, doc_b)
    pairs."""
    toks = doc_shingles(df, text_col, id_col).withColumnRenamed("shingle", "token")
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
