#!/usr/bin/env python
"""Skew an existing scaled corpus — the Zipf stress corpus for the
scale-proof gates (SCALE.md "skew validation").

    python tools/gen_skewed.py                 # testdata_scaled/sf1 -> testdata_scaled/sf1skew
    python tools/gen_skewed.py --src ... --out ...

Real 100 TB corpora are never uniform: one asset dominates the tape,
a few wallets dominate flow, and boilerplate passages repeat across a
fifth of the crawl. The uniform replicated corpus (gen_scaled.py)
proves the engine's plans scale; THIS corpus proves they survive the
key distribution production actually has:

- lineitem.l_partkey is remapped through a Zipf-style head: the HOT
  COIN carries ~32% of all rows, seven more coins carry a decaying
  3-6% each (head total ~52%), the remainder keep their original
  (uniform long-tail) key. Remap is a deterministic per-row hash over
  (l_orderkey, l_linenumber) — reproducible bytes, no RNG state.
- orders.o_custkey gets the same treatment (hot WALLET ~15%, head
  ~27%), so the flagship per-(coin, wallet) pipelines see both a hot
  join key and a hot window partition — including the worst case, the
  (hot coin x hot wallet) group at ~5% of the corpus in ONE group.
- 20% of documents (doc_id % 5 == 0) carry one shared BOILERPLATE
  passage appended to their text: every 8-gram of the passage becomes
  a hot digest (q104's count + semi-join skew), the passage chunks go
  hot for C4 chunk dedup (q56), and minhash/LSH banding gets genuinely
  hot buckets (the salted_self_pairs case). The passage words carry
  the same per-replica suffix as the body words (gen_scaled.py's
  linear-dedup design): a passage shared GLOBALLY would make exact
  near-dup pair enumeration Theta((0.2 n)^2) — quadratic output no
  engine avoids, which would measure output growth, not skew
  handling. Per replica it is still a 1000-doc hot shingle bucket and
  a 1000-occurrence gram digest per replica, i.e. exactly the hot-key
  shapes the operators must survive.

FK consistency: remap targets are existing part/customer keys, so
every join still resolves; only the DISTRIBUTION changes. All other
tables copy through byte-identical. The DuckDB oracles run on the
same skewed parquet, so the 50-entry parity gate stays exact.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

# (share, key) Zipf-style head; remainder keeps the original key.
COIN_HEAD = [
    (0.32, 1), (0.06, 2), (0.03, 3), (0.02, 4),
    (0.015, 5), (0.012, 6), (0.010, 7), (0.008, 8),
]
WALLET_HEAD = [
    (0.15, 1), (0.05, 2), (0.03, 3), (0.02, 4),
    (0.012, 5), (0.008, 6),
]

BOILERPLATE = (
    "this document is provided as is without warranty of any kind "
    "express or implied all rights reserved unauthorized reproduction "
    "or distribution is strictly prohibited"
)

KEY_STRIDE = 1_000_000  # gen_scaled.py's per-replica doc_id stride


def passage_case(factor: int) -> str:
    """CASE yielding the replica-suffixed passage for a doc_id —
    replica 0 keeps plain words, replica r suffixes every word with
    _rN, matching the body-word convention of gen_scaled.py."""
    arms = []
    for r in range(1, factor):
        suffixed = " ".join(f"{w}_r{r}" for w in BOILERPLATE.split())
        arms.append(f"WHEN doc_id // {KEY_STRIDE} = {r} THEN '{suffixed}'")
    return "CASE " + " ".join(arms) + f" ELSE '{BOILERPLATE}' END"

U64 = 18446744073709551615  # max of DuckDB hash() output


def remap_case(col: str, u_expr: str, head: list[tuple[float, int]]) -> str:
    """CASE mapping u in [0,1) through cumulative head shares; the
    tail falls through to the original column."""
    arms, cum = [], 0.0
    for share, key in head:
        cum += share
        arms.append(f"WHEN {u_expr} < {cum!r} THEN {key}")
    return "CASE " + " ".join(arms) + f" ELSE {col} END"


def main() -> None:
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(base, "testdata_scaled", "sf1"))
    ap.add_argument("--out", default=os.path.join(base, "testdata_scaled", "sf1skew"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")

    def src(name: str) -> str:
        return f"'{args.src}/{name}.parquet'"

    def copy(name: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{args.out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{args.out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # unchanged tables copy through byte-identical
    for name in ("region", "nation", "customer", "supplier", "part",
                 "events", "embeddings"):
        shutil.copyfile(
            os.path.join(args.src, f"{name}.parquet"),
            os.path.join(args.out, f"{name}.parquet"),
        )
        print(f"{name}: copied")

    # distinct hash salts so coin skew and wallet skew are independent
    u_li = f"(hash(l_orderkey * 8 + l_linenumber + 1000000007) / {U64}.0)"
    copy(
        "lineitem",
        f"""
        SELECT l_orderkey,
               {remap_case('l_partkey', u_li, COIN_HEAD)} AS l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""",
    )
    u_o = f"(hash(o_orderkey + 2718281828) / {U64}.0)"
    copy(
        "orders",
        f"""
        SELECT o_orderkey,
               {remap_case('o_custkey', u_o, WALLET_HEAD)} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""",
    )
    n_replicas = con.execute(
        f"SELECT count(DISTINCT doc_id // {KEY_STRIDE}) FROM {src('documents')}"
    ).fetchone()[0]
    p_case = passage_case(int(n_replicas))
    copy(
        "documents",
        f"""
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN text || ' ' || ({p_case})
                        ELSE text END AS text,
                   lang, source
            FROM {src('documents')}
        )
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM aug""",
    )

    # distribution report
    for col, tbl in (("l_partkey", "lineitem"), ("o_custkey", "orders")):
        top = con.execute(
            f"SELECT {col}, count(*) n, count(*) * 1.0 / sum(count(*)) OVER () s"
            f" FROM '{args.out}/{tbl}.parquet' GROUP BY 1 ORDER BY 2 DESC LIMIT 3"
        ).fetchall()
        print(f"{tbl}.{col} top keys:", [(k, n, round(s, 4)) for k, n, s in top])


if __name__ == "__main__":
    main()
