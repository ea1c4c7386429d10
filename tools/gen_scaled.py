#!/usr/bin/env python
"""Scale the driver testdata up by replication — the sf1 (10x) corpus
for the scale-proof benchmark (SCALE.md).

    python tools/gen_scaled.py                      # sf0.1 -> testdata_scaled/sf1 (10x)
    python tools/gen_scaled.py --factor 4 --out /tmp/sf0.4

Replication design (why it is a fair 10x, not a degenerate one):

- FK-consistent key offsets: replica r shifts orderkeys by r*10M and
  cust/part/supp/doc/vec keys by r*1M on every table that carries
  them, so joins resolve within a replica and key cardinality grows
  10x (more coins/wallets/orders — the way a real corpus grows).
  nation/region are fixed dimensions and stay as-is.
- documents: every word gets a per-replica suffix (w -> w_rN). Within
  a replica the shingle/Jaccard structure is IDENTICAL to the
  original, across replicas trigram overlap is zero — dedup outputs
  scale exactly linearly. Naive text replication would instead create
  R-sized exact-dup clusters whose candidate pairs grow R^2: an
  artificial quadratic blowup no real corpus has.
- embeddings: replica r applies a seeded dimension PERMUTATION + SIGN
  FLIP to every vector. Norms and all within-replica pairwise dots
  are bit-preserved (the transform is orthogonal), so each replica
  carries the original cluster geometry; cross-replica cosines are
  ~random, so ANN/SemDeDup candidate sets also scale linearly.
- dates/timestamps/values replicate unchanged: per-key time-series
  shapes (the flagship pipeline's per-(coin,wallet) structure) are
  preserved, there are just 10x more keys.

Output parquet matches the source schemas (events keeps its
TIMESTAMP(NANOS) via explicit cast). Deterministic: same inputs +
factor -> identical bytes modulo parquet metadata.
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORDER_STRIDE = 10_000_000
KEY_STRIDE = 1_000_000


def union_over_replicas(select_fn, factor: int) -> str:
    return "\nUNION ALL\n".join(select_fn(r) for r in range(factor))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_scaled", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset to emit (e.g. the warehouse-only "
        "'region,nation,customer,supplier,part,orders,lineitem' for a "
        "refresh-scale corpus — skips the expensive documents/"
        "embeddings rewrites a refresh bench never reads)",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")

    def src(name: str) -> str:
        return f"'{args.src}/{name}.parquet'"

    def copy(name: str, sql: str) -> None:
        if only is not None and name not in only:
            return
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed dimensions
    for dim in ("region", "nation"):
        copy(dim, f"SELECT * FROM {src(dim)}")

    copy(
        "customer",
        union_over_replicas(
            lambda r: f"""
            SELECT c_custkey + {r * KEY_STRIDE} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}""",
            args.factor,
        ),
    )
    copy(
        "supplier",
        union_over_replicas(
            lambda r: f"""
            SELECT s_suppkey + {r * KEY_STRIDE} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')}""",
            args.factor,
        ),
    )
    copy(
        "part",
        union_over_replicas(
            lambda r: f"""
            SELECT p_partkey + {r * KEY_STRIDE} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}""",
            args.factor,
        ),
    )
    copy(
        "orders",
        union_over_replicas(
            lambda r: f"""
            SELECT o_orderkey + {r * ORDER_STRIDE} AS o_orderkey,
                   o_custkey + {r * KEY_STRIDE} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}""",
            args.factor,
        ),
    )
    copy(
        "lineitem",
        union_over_replicas(
            lambda r: f"""
            SELECT l_orderkey + {r * ORDER_STRIDE} AS l_orderkey,
                   l_partkey + {r * KEY_STRIDE} AS l_partkey,
                   l_suppkey + {r * KEY_STRIDE} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}""",
            args.factor,
        ),
    )
    copy(
        "events",
        union_over_replicas(
            lambda r: f"""
            SELECT event_id + {r * ORDER_STRIDE} AS event_id,
                   CAST(ts AS TIMESTAMP_NS) AS ts,
                   user_id + {r * KEY_STRIDE} AS user_id,
                   event_type, value, props
            FROM {src('events')}""",
            args.factor,
        ),
    )
    def doc_select(r: int) -> str:
        if r == 0:
            text = "text"
        else:
            text = (
                "regexp_replace(text, '(\\S+)', '\\1_r" + str(r) + "', 'g')"
            )
        return f"""
            SELECT doc_id + {r * KEY_STRIDE} AS doc_id,
                   {text} AS text, lang, source,
                   CAST(length({text}) AS BIGINT) AS n_chars
            FROM {src('documents')}"""

    copy("documents", union_over_replicas(doc_select, args.factor))

    # embeddings: orthogonal per-replica transform in numpy
    if only is not None and "embeddings" not in only:
        return
    tbl = pq.read_table(os.path.join(args.src, "embeddings.parquet"))
    vec_ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    embs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    dim = embs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for r in range(args.factor):
        if r == 0:
            v = embs
        else:
            rng = np.random.default_rng(42 + r)
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            v = embs[:, perm] * signs
        out_ids.append(vec_ids + r * KEY_STRIDE)
        out_vecs.append(v)
        out_labels.append(labels)
    ids = np.concatenate(out_ids)
    vecs = np.concatenate(out_vecs)
    labs = np.concatenate(out_labels)
    out_tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [row for row in vecs.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labs, type=pa.int32()),
        }
    )
    pq.write_table(out_tbl, os.path.join(args.out, "embeddings.parquet"))
    print(f"embeddings: {len(ids)} rows")


if __name__ == "__main__":
    main()
