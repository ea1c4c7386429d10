#!/usr/bin/env python
"""Codebook-transport scale point: prove the adaptive occupancy law
keeps within-cell pair counts ~linear in corpus size once KM_MAX_K no
longer clamps at 128, and that assignment at k >= 1000 runs through
the TorrentBroadcast transport at sane cost.

    python tools/bench_codebook.py                 # n = 300k and 600k, dim 16
    python tools/bench_codebook.py --n 300000 --dim 16

Prints ONE JSON line per corpus size:
  {"n", "k_adaptive", "assign_sec", "pairs_adaptive",
   "k_clamped128", "assign_sec_128", "pairs_clamped128"}

pairs_* = sum over cells of |cell|^2 — the SemDeDup/IVF candidate
count. Under the occupancy law (cell ~ 250) it grows ~linearly with n
(~250 * n); under a 128 clamp it grows quadratically (~n^2 / 128).
The two JSON lines make the growth rate directly readable: doubling n
should ~double pairs_adaptive and ~quadruple pairs_clamped128.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scale harness opts into the big-host heap (library default is 8g)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipelines_spark.session import get_spark  # noqa: E402


def synth_embeddings(spark, n: int, dim: int):
    """Deterministic synthetic corpus: dim pseudo-random components in
    [-1, 1) per id via xxhash64 — no files, reproducible anywhere."""
    comps = F.expr(
        f"transform(sequence(0, {dim - 1}), d -> "
        "cast(pmod(xxhash64(id, d), 100000) as double) / 50000.0 - 1.0)"
    )
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("id").alias("vec_id"), comps.alias("embedding"))
    )


def measure(spark, n: int, dim: int, n_iter: int, k_override: int | None = None,
            skip_clamped: bool = False) -> dict:
    from etl_pipelines_spark.llm.similarity import (
        assign_clusters,
        kmeans_centroids,
    )
    from etl_pipelines_spark.queries.llmops import adaptive_km_k

    emb = synth_embeddings(spark, n, dim).persist()
    emb.count()

    out = {"n": n, "dim": dim}
    tiers = [("adaptive", k_override or adaptive_km_k(n))]
    if not skip_clamped:
        tiers.append(("clamped128", min(128, adaptive_km_k(n))))
    for label, k in tiers:
        cents = kmeans_centroids(emb, k=k, n_iter=n_iter)
        t0 = time.time()
        cells = (
            assign_clusters(emb, cents)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias("pairs"))
            .first()
        )
        sec = round(time.time() - t0, 2)
        if label == "adaptive":
            out["k_adaptive"] = k
            out["assign_sec"] = sec
            out["pairs_adaptive"] = int(cells["pairs"])
        else:
            out["k_clamped128"] = k
            out["assign_sec_128"] = sec
            out["pairs_clamped128"] = int(cells["pairs"])
        if label == "adaptive":
            # the float32 GEMM kernel over the SAME codebook — the
            # production assignment path past ~10^7 vectors; also
            # record how often it disagrees with the exact kernel
            # (near-ties within float32 rounding)
            t0 = time.time()
            diff = (
                assign_clusters(emb, cents, out="c_exact")
                .join(
                    assign_clusters(emb, cents, out="c_mm", distance="matmul"),
                    "vec_id",
                )
                .filter(F.col("c_exact") != F.col("c_mm"))
                .count()
            )
            out["assign_sec_matmul_pass"] = round(time.time() - t0, 2)
            t0 = time.time()
            assign_clusters(emb, cents, distance="matmul").agg(
                F.count(F.lit(1))
            ).first()
            out["assign_sec_matmul"] = round(time.time() - t0, 2)
            out["matmul_disagree"] = int(diff)
    emb.unpersist()
    return out


def measure_two_level(spark, n: int, dim: int, k1: int, k2: int) -> dict:
    """The coarse+fine quantizer at k_eff = k1 * k2: occupancy and
    assignment cost vs a flat codebook of the same per-row work
    (k1 + k2 centroids). The flat-codebook comparison at k = k_eff
    itself is deliberately absent — a 64k-wide argmin per row is the
    ceiling the two-level structure exists to avoid paying."""
    from pyspark.sql import functions as F

    from etl_pipelines_spark.llm.similarity import (
        two_level_assign,
        two_level_centroids,
    )

    emb = synth_embeddings(spark, n, dim).persist()
    emb.count()
    t0 = time.time()
    coarse, fine = two_level_centroids(emb, k1=k1, k2=k2, n_iter=1, fine_iter=1)
    train_sec = round(time.time() - t0, 2)
    k_eff = sum(max(1, len(b)) for b in fine)
    t0 = time.time()
    occ = (
        two_level_assign(emb, coarse, fine)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("nonempty"),
            F.max("c").alias("mx"),
            F.sum(F.col("c") * F.col("c")).alias("pairs"),
        )
        .first()
    )
    assign_sec = round(time.time() - t0, 2)
    emb.unpersist()
    return {
        "mode": "two_level",
        "n": n,
        "dim": dim,
        "k1": k1,
        "k2": k2,
        "k_eff": k_eff,
        "train_sec": train_sec,
        "assign_sec": assign_sec,
        "nonempty_cells": int(occ["nonempty"]),
        "max_cell": int(occ["mx"]),
        "mean_occupancy": round(n / max(1, int(occ["nonempty"])), 2),
        "within_cell_pairs": int(occ["pairs"]),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument(
        "--iters", type=int, default=1,
        help="Lloyd's rounds for the bench codebook (1: enough to "
        "spread centroids; the transport cost is what's measured)",
    )
    ap.add_argument(
        "--k", type=int, default=None,
        help="override the adaptive codebook size (e.g. pin 4096 for "
        "the n >= 10^6 matmul-vs-exact measurement)",
    )
    ap.add_argument(
        "--skip-clamped", action="store_true",
        help="skip the k=128-clamp comparison tier (the quadratic-"
        "blowup demo; pointless at n >= 10^6 where it is just slow)",
    )
    ap.add_argument(
        "--two-level", action="store_true",
        help="measure the coarse+fine quantizer (k1 x k2 = --k1 x --k2 "
        "effective cells) instead of the flat codebook tiers",
    )
    ap.add_argument("--k1", type=int, default=256)
    ap.add_argument("--k2", type=int, default=256)
    args = ap.parse_args()
    spark = get_spark("bench-codebook")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [args.n] if args.n else [300_000, 600_000]
    for n in sizes:
        if args.two_level:
            print(json.dumps(measure_two_level(spark, n, args.dim, args.k1, args.k2)))
        else:
            print(json.dumps(measure(spark, n, args.dim, args.iters,
                                     k_override=args.k,
                                     skip_clamped=args.skip_clamped)))


if __name__ == "__main__":
    main()
