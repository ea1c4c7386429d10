"""LLM-training-data operator queries over documents/embeddings:
dedup (exact, MinHash+LSH, Jaccard), text analysis, similarity search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipelines_spark.llm.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    token_jaccard,
)
from etl_pipelines_spark.llm.similarity import brute_force_topk
from etl_pipelines_spark.llm.text import with_predicted_lang, with_token_stats
from etl_pipelines_spark.queries.catalog import register, t

SHINGLE_SQL = """
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(
                       list_slice(string_split(text, ' '), i, i + 2), ' ')
               )) AS token
        FROM documents
"""

MINHASH_SQL = f"""
    WITH toks AS ({SHINGLE_SQL})
    SELECT doc_id,
           MIN(MD5(CONCAT('0:', token))) AS mh_0,
           MIN(MD5(CONCAT('1:', token))) AS mh_1,
           MIN(MD5(CONCAT('2:', token))) AS mh_2,
           MIN(MD5(CONCAT('3:', token))) AS mh_3
    FROM toks
    GROUP BY doc_id
"""


# --------------------------------------------------------------------- q30
@register(
    "q30_exact_dedup",
    """
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    description="Exact dedup: hash-groupBy keep lowest id",
    tags=("dedup",),
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup(t(spark, sf, "documents")).select(
        "doc_id", "lang", "source", "n_chars"
    )


# --------------------------------------------------------------------- q31
@register(
    "q31_token_stats",
    r"""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '\S+\s*', 'x', 'g')) AS BIGINT) AS n_tokens,
           CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           CAST(CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / CAST(length(regexp_replace(text, '\S+\s*', 'x', 'g')) AS DOUBLE) AS DOUBLE)
               AS quality_score,
           MD5(LOWER(text)) AS fingerprint
    FROM documents
    """,
    description="Token counting, type-token-ratio quality score, md5 "
    "document fingerprint",
    tags=("text",),
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    return with_token_stats(t(spark, sf, "documents")).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "quality_score", "fingerprint"
    )


# --------------------------------------------------------------------- q32
@register(
    "q32_lang_id",
    """
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['the', 'a', 'value', 'table'])) AS score_en,
               len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['window', 'hash', 'batch'])) AS score_de,
               len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['data', 'row', 'scan'])) AS score_es
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
                WHEN score_de >= score_es THEN 'de'
                ELSE 'es' END AS predicted_lang
    FROM scored
    """,
    description="Heuristic language ID via stopword-marker scoring "
    "(deterministic argmax)",
    tags=("text",),
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    return with_predicted_lang(t(spark, sf, "documents")).select(
        "doc_id", "lang", "predicted_lang"
    )


# --------------------------------------------------------------------- q33
@register(
    "q33_minhash_signatures",
    MINHASH_SQL,
    description="MinHash signatures: k=4 md5-seeded min-hashes over "
    "distinct tokens (shuffle on doc_id only, never the text body)",
    tags=("dedup",),
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_signatures(t(spark, sf, "documents"))


# --------------------------------------------------------------------- q34
@register(
    "q34_lsh_jaccard_pairs",
    f"""
    WITH sigs AS ({MINHASH_SQL}),
    banded AS (
        SELECT doc_id, CONCAT('0|', mh_0) AS band_key FROM sigs
        UNION ALL SELECT doc_id, CONCAT('1|', mh_1) FROM sigs
        UNION ALL SELECT doc_id, CONCAT('2|', mh_2) FROM sigs
        UNION ALL SELECT doc_id, CONCAT('3|', mh_3) FROM sigs
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM banded l JOIN banded r ON l.band_key = r.band_key
        WHERE l.doc_id < r.doc_id
    ),
    toks AS ({SHINGLE_SQL}),
    sizes AS (SELECT doc_id, COUNT(token) AS n FROM toks GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, COUNT(*) AS n_intersect
        FROM pairs p
        JOIN toks ta ON ta.doc_id = p.doc_a
        JOIN toks tb ON tb.doc_id = p.doc_b AND tb.token = ta.token
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT p.doc_a, p.doc_b,
           COALESCE(i.n_intersect, 0) AS n_intersect,
           CAST(CAST(COALESCE(i.n_intersect, 0) AS DOUBLE)
                / CAST(sa.n + sb.n - COALESCE(i.n_intersect, 0) AS DOUBLE) AS DOUBLE) AS jaccard
    FROM pairs p
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    """,
    description="MinHash-LSH banding -> candidate pairs -> exact token "
    "Jaccard verification (near-dup detection at scale: the join "
    "explodes only within LSH buckets)",
    tags=("dedup",),
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs)
    return token_jaccard(docs, pairs)


# --------------------------------------------------------------------- q35
@register(
    "q35_knn_cosine",
    """
    WITH comps AS (
        SELECT vec_id, UNNEST(embedding) AS val,
               generate_subscripts(embedding, 1) AS idx
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id,
               SQRT(CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) * 1e12)
                    AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM comps GROUP BY vec_id
    ),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(SUM(CAST(FLOOR(CAST(q.val AS DOUBLE) * CAST(c.val AS DOUBLE) * 1e12)
                    AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM comps q
        JOIN comps c ON c.idx = q.idx AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
        GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS BIGINT) AS rank,
           CAST(dot / (nq.nrm * nc.nrm) AS DOUBLE) AS cosine
    FROM dots
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = neighbor_id
    QUALIFY rank <= 10
    """,
    description="Brute-force cosine top-k ANN baseline: broadcast query "
    "set, JVM-side zip_with/aggregate dot products, decimal-exact "
    "accumulation",
    tags=("similarity",),
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10)
