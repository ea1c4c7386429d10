"""Source-mixture sampling for training-data assembly.

Multilingual/multi-source corpora are rarely used at their natural
proportions: temperature sampling (p_i ∝ count_i^alpha, alpha≈0.3-0.7,
as used for mT5/XLM-R-style training mixes) upweights small strata and
downweights dominant ones. This module computes per-stratum target
rates for a global document budget and applies them with a
deterministic per-document Bernoulli draw, so the same corpus always
yields the same sample (re-runnable, oracle-diffable — no Spark rand()
in the contract surface).

Scale shape: the strata table is a tiny aggregate (one row per
stratum) broadcast back onto the corpus; the keep-decision is a
map-only expression over md5(doc_id) — no shuffle beyond the strata
aggregation itself.

Cross-engine determinism: stratum masses are quantized to integers
(FLOOR(sqrt(count) * 1e6)) before the global sum, so the normalizing
constant is an exact BIGINT in any summation order; the remaining
arithmetic is IEEE-exact double mul/div, bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.sketches import HASH_SPACE, kmv_hash

ALPHA_SCALE = 1_000_000  # quantization of count^alpha before the global sum


def temperature_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str = "doc_id",
    budget_frac: float = 0.5,
) -> DataFrame:
    """Per-doc keep/drop under a sqrt-temperature mix (alpha = 0.5).

    Adds: n_stratum_docs (natural count), sample_rate (the stratum's
    target acceptance rate, capped at 1), keep (deterministic
    Bernoulli: md5-hash-uniform(doc_id) < sample_rate).

    The global budget is budget_frac * |corpus| documents, allocated
    across strata proportionally to sqrt(natural count); a stratum
    whose allocation exceeds its natural count is capped at rate 1
    (no oversampling — replication is a separate concern).
    """
    strata = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("n_stratum_docs"))
    strata = strata.withColumn(
        "_mass", F.floor(F.sqrt(F.col("n_stratum_docs")) * F.lit(ALPHA_SCALE)).cast("long")
    )
    totals = strata.agg(
        F.sum("_mass").alias("_total_mass"),
        F.sum("n_stratum_docs").alias("_total_docs"),
    )
    rates = strata.crossJoin(F.broadcast(totals)).select(
        *strata_cols,
        "n_stratum_docs",
        F.least(
            F.lit(1.0),
            (
                F.lit(float(budget_frac))
                * F.col("_total_docs").cast("double")
                * (F.col("_mass").cast("double") / F.col("_total_mass").cast("double"))
                / F.col("n_stratum_docs").cast("double")
            ),
        ).alias("sample_rate"),
    )
    u = kmv_hash(F.col(id_col).cast("string")).cast("double") / F.lit(HASH_SPACE)
    return (
        df.join(F.broadcast(rates), strata_cols)
        .withColumn("keep", u < F.col("sample_rate"))
    )
