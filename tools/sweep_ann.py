#!/usr/bin/env python
"""Recall-vs-probe-cost sweep for the two-level ANN on a REAL corpus.

Builds each (k1, k2) codebook ONCE, then probes it at a grid of
(nprobe1, nprobe2) settings, scoring recall@10 against a single
brute-force pass over the same queries — the round-11 tuning run the
round-10 verdict asked for (real-corpus recall 0.675 at 8x8 was below
a retrieval default; find the >= 0.8 point that still beats brute
force).

    python tools/sweep_ann.py --corpus testdata_scaled/sf1/embeddings.parquet
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--codebooks", default="16x16,24x16,32x16",
                    help="comma list of k1xk2 pairs")
    ap.add_argument("--probes", default="8x8,8x16,16x8,16x16,16x32,24x24",
                    help="comma list of nprobe1xnprobe2 pairs")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_pipelines_spark.llm.similarity import (
        brute_force_topk,
        release_fine_codebook,
        two_level_centroids,
        two_level_topk,
    )

    spark = get_spark("sweep-ann")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(args.corpus)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        .persist()
    )
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < args.n_queries)

    t0 = time.time()
    exact = brute_force_topk(emb, queries, k=args.topk).collect()
    brute_sec = round(time.time() - t0, 2)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    print(json.dumps({"corpus": args.corpus, "n": n,
                      "brute_force_sec": brute_sec}), flush=True)

    for pair in args.codebooks.split(","):
        k1, k2 = (int(v) for v in pair.split("x"))
        t0 = time.time()
        coarse, fine = two_level_centroids(emb, k1=k1, k2=k2, n_iter=1,
                                           fine_iter=1)
        build_sec = round(time.time() - t0, 2)
        k_eff = sum(max(1, len(b)) for b in fine)
        for probe in args.probes.split(","):
            p1, p2 = (int(v) for v in probe.split("x"))
            t0 = time.time()
            ann = two_level_topk(
                emb, coarse, fine, k=args.topk, n_queries=args.n_queries,
                nprobe1=p1, nprobe2=p2,
            ).collect()
            probe_sec = round(time.time() - t0, 2)
            ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
            recall = round(
                len(ann_pairs & exact_pairs) / max(1, len(exact_pairs)), 4
            )
            print(json.dumps({
                "k1": k1, "k2": k2, "k_eff": k_eff,
                "nprobe1": p1, "nprobe2": p2,
                "build_sec": build_sec, "probe_sec": probe_sec,
                "recall": recall,
                "beats_brute": probe_sec < brute_sec,
            }), flush=True)
        release_fine_codebook()

    emb.unpersist()


if __name__ == "__main__":
    main()
