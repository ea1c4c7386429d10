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


def measure_ann(spark, n: int, dim: int, k1: int, k2: int,
                n_queries: int = 100, topk: int = 10,
                nprobe1: int = 8, nprobe2: int = 8,
                flat_k: int = 4096, flat_nprobe: int = 8,
                corpus: str | None = None) -> dict:
    """The composed end-to-end ANN proof: two-level build -> multi-
    probe two_level_topk at k_eff >= 64k, recall@topk vs exact brute
    force over the SAME queries, with a flat-codebook ivf_topk
    baseline at the adaptive k for comparison. Everything measured in
    one session on one corpus — synthetic by default, or a real
    embeddings.parquet via `corpus` (the gate-corpus scale point: the
    same two-level path q106 gates at sf0.01, measured on the actual
    sf1 table instead of a synthetic)."""
    from pyspark.sql import functions as F

    from etl_pipelines_spark.llm.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
        release_fine_codebook,
        two_level_centroids,
        two_level_topk,
    )

    if corpus is not None:
        emb = (
            spark.read.parquet(corpus)
            .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
            .persist()
        )
        n = emb.count()
        dim = len(emb.first()["embedding"])
    else:
        emb = synth_embeddings(spark, n, dim).persist()
        emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries)

    t0 = time.time()
    exact = brute_force_topk(emb, queries, k=topk).collect()
    brute_sec = round(time.time() - t0, 2)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}

    t0 = time.time()
    coarse, fine = two_level_centroids(emb, k1=k1, k2=k2, n_iter=1, fine_iter=1)
    build_sec = round(time.time() - t0, 2)
    k_eff = sum(max(1, len(b)) for b in fine)
    t0 = time.time()
    ann = two_level_topk(
        emb, coarse, fine, k=topk, n_queries=n_queries,
        nprobe1=nprobe1, nprobe2=nprobe2,
    ).collect()
    probe_sec = round(time.time() - t0, 2)
    release_fine_codebook()
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    recall = round(len(ann_pairs & exact_pairs) / max(1, len(exact_pairs)), 4)

    t0 = time.time()
    flat_cents = kmeans_centroids(emb, k=flat_k, n_iter=1)
    flat_build_sec = round(time.time() - t0, 2)
    t0 = time.time()
    flat = ivf_topk(
        emb, flat_cents, k=topk, n_queries=n_queries, nprobe=flat_nprobe
    ).collect()
    flat_probe_sec = round(time.time() - t0, 2)
    flat_pairs = {(r["query_id"], r["neighbor_id"]) for r in flat}
    flat_recall = round(len(flat_pairs & exact_pairs) / max(1, len(exact_pairs)), 4)

    emb.unpersist()
    return {
        "mode": "ann_end_to_end",
        **({"corpus": corpus} if corpus else {}),
        "n": n, "dim": dim, "n_queries": n_queries, "topk": topk,
        "brute_force_sec": brute_sec,
        "two_level": {
            "k1": k1, "k2": k2, "k_eff": k_eff,
            "nprobe1": nprobe1, "nprobe2": nprobe2,
            "build_sec": build_sec, "probe_sec": probe_sec,
            "recall": recall,
        },
        "flat_baseline": {
            "k": len(flat_cents), "nprobe": flat_nprobe,
            "build_sec": flat_build_sec, "probe_sec": flat_probe_sec,
            "recall": flat_recall,
        },
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
    ap.add_argument(
        "--ann", action="store_true",
        help="composed end-to-end proof: two-level build -> multi-probe "
        "topk, recall@10 vs brute force, vs a flat ivf_topk baseline",
    )
    ap.add_argument(
        "--ann-corpus", metavar="PARQUET", default=None,
        help="run --ann on a REAL embeddings.parquet instead of the "
        "synthetic corpus (the gate-corpus scale point, e.g. "
        "testdata_scaled/sf1/embeddings.parquet)",
    )
    ap.add_argument("--nprobe1", type=int, default=8)
    ap.add_argument("--nprobe2", type=int, default=8)
    ap.add_argument("--flat-k", type=int, default=4096)
    ap.add_argument("--flat-nprobe", type=int, default=8)
    ap.add_argument(
        "--record-append", metavar="PATH", default=None,
        help="with --ann-corpus: measure the real-corpus ANN point and "
        "append/replace it (keyed by corpus path) in an existing "
        "record file",
    )
    ap.add_argument(
        "--record", metavar="PATH", default=None,
        help="one command for the committed artifact: run the standard "
        "suite (flat n=10^6 k=4096 exact-vs-matmul, two-level 64k-cell "
        "occupancy, end-to-end ANN recall) and write {'points': [...]} "
        "to PATH",
    )
    args = ap.parse_args()
    if args.record_append and not args.ann_corpus:
        ap.error("--record-append requires --ann-corpus (it appends a "
                 "real-corpus ANN point; without a corpus there is "
                 "nothing to append)")
    spark = get_spark("bench-codebook")
    spark.sparkContext.setLogLevel("ERROR")
    if args.record:
        n = args.n or 1_000_000
        points = []
        points.append(measure(spark, n, args.dim, args.iters,
                              k_override=args.k or 4096, skip_clamped=True))
        print(json.dumps(points[-1]))
        points.append(measure_two_level(spark, n, args.dim, args.k1, args.k2))
        print(json.dumps(points[-1]))
        # 16x16 probes = 256 of ~64k cells (0.4% of the corpus scanned
        # per query) — the honest recall point for the adversarial
        # (uniform-synthetic, clusterless) corpus
        points.append(measure_ann(spark, n, args.dim, args.k1, args.k2,
                                  nprobe1=16, nprobe2=16))
        print(json.dumps(points[-1]))
        doc = {
            "tool": "tools/bench_codebook.py --record",
            "host": "local[32] single-JVM bench box (co-tenant variance "
                    "documented in SCALE.md)",
            "points": points,
        }
        with open(args.record, "w") as fh:
            json.dump(doc, fh, indent=1)
            fh.write("\n")
        return
    if args.record_append and args.ann_corpus:
        point = measure_ann(
            spark, 0, 0, args.k1, args.k2,
            nprobe1=args.nprobe1, nprobe2=args.nprobe2,
            flat_k=args.flat_k, flat_nprobe=args.flat_nprobe,
            corpus=args.ann_corpus,
        )
        print(json.dumps(point))
        with open(args.record_append) as fh:
            doc = json.load(fh)
        doc["points"] = [
            p for p in doc["points"]
            if p.get("corpus") != point.get("corpus")
        ] + [point]
        with open(args.record_append, "w") as fh:
            json.dump(doc, fh, indent=1)
            fh.write("\n")
        return
    # a real corpus fixes n (measure_ann overrides it from the corpus
    # row count), so the default two-size sweep would run the
    # identical measurement twice — collapse to one iteration
    if args.ann_corpus:
        sizes = [0]
    else:
        sizes = [args.n] if args.n else [300_000, 600_000]
    for n in sizes:
        if args.two_level:
            print(json.dumps(measure_two_level(spark, n, args.dim, args.k1, args.k2)))
        elif args.ann:
            print(json.dumps(measure_ann(spark, n, args.dim, args.k1, args.k2,
                                         corpus=args.ann_corpus)))
        else:
            print(json.dumps(measure(spark, n, args.dim, args.iters,
                                     k_override=args.k,
                                     skip_clamped=args.skip_clamped)))


if __name__ == "__main__":
    main()
