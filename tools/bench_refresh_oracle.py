#!/usr/bin/env python
"""DuckDB-side rebuild of the §3.1 warehouse refresh — the oracle
denominator for bench.py's `refresh` row.

Mirrors plans/refresh.py structurally: build the six curated tables
from the raw star schema at $SPARK_GRAFT_SF_DIR, write them as parquet
(date-partitioned for the three time-series tables, like
write_partitioned), read them back, and run the same 15 declared
expectations (expectations.yml) as SQL counts. Scope matches bench.py's
refresh row: full coin universe, 1998 calendar-year slice.

    python tools/bench_refresh_oracle.py

Prints one JSON line {"metric": "refresh_oracle_wall_clock", ...}.
Do not run concurrently with bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scale harness opts into the big-host heap (library default is 8g)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SINCE, UNTIL = "1998-01-01", "1998-12-31"

# scoped versions of the shared derivations (queries/timeseries.py
# DAILY_PRICES_SQL / TRANSFERS_SQL with the refresh scope() filters)
PRICES = f"""
    SELECT l_partkey AS coin_id, CAST(l_shipdate AS DATE) AS date,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / CAST(SUM(l_quantity) AS DOUBLE) AS DOUBLE) AS price
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN '{SINCE}' AND '{UNTIL}'
    GROUP BY l_partkey, CAST(l_shipdate AS DATE)
"""
XFERS = f"""
    SELECT l.l_partkey AS coin_id, o.o_custkey AS wallet_address,
           CAST(l.l_shipdate AS DATE) AS date,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN -l.l_quantity
                         ELSE l.l_quantity END) AS DOUBLE) AS net_transfers
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN '{SINCE}' AND '{UNTIL}'
    GROUP BY 1, 2, 3
"""


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for tbl in ("region", "nation", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'")
    out = tempfile.mkdtemp(prefix="refresh_oracle_")
    rows: dict[str, int] = {}
    t0 = time.time()

    def write(name: str, select: str, partition: bool) -> None:
        path = os.path.join(out, name)
        by = ", PARTITION_BY (date), OVERWRITE_OR_IGNORE" if partition else ""
        con.execute(f"COPY ({select}) TO '{path}' (FORMAT PARQUET{by})")
        glob = f"{path}/**/*.parquet" if partition else path
        con.execute(
            f"CREATE OR REPLACE VIEW w_{name} AS "
            f"SELECT * FROM read_parquet('{glob}', hive_partitioning=true)"
        )
        rows[name] = con.execute(f"SELECT count(*) FROM w_{name}").fetchone()[0]

    # 0. dimensions
    write(
        "chains",
        """
        SELECT chain_id, chain, chain_group FROM (
            SELECT n_nationkey AS chain_id, lower(n_name) AS chain,
                   lower(r_name) AS chain_group,
                   ROW_NUMBER() OVER (PARTITION BY lower(n_name)
                                      ORDER BY n_nationkey) AS rn
            FROM nation JOIN region ON r_regionkey = n_regionkey
        ) WHERE rn = 1
        """,
        partition=False,
    )
    det_id = (
        "concat_ws('-', substr(h, 1, 8), substr(h, 9, 4), substr(h, 13, 4),"
        " substr(h, 17, 4), substr(h, 21, 12))"
    )
    write(
        "coins",
        f"""
        SELECT coin_id, name, brand, {det_id} AS coingecko_id, has_market_data
        FROM (
            SELECT p_partkey AS coin_id, lower(p_name) AS name,
                   lower(p_brand) AS brand,
                   md5(concat_ws('|', CAST(p_partkey AS VARCHAR), p_brand)) AS h,
                   p_partkey IN (SELECT DISTINCT l_partkey FROM lineitem)
                       AS has_market_data
            FROM part
        )
        """,
        partition=False,
    )
    write(
        "coin_facts",
        """
        SELECT COALESCE(a.coin_id, b.coin_id) AS coin_id,
               COALESCE(a.category, 'unknown') AS category,
               COALESCE(a.list_price, 0.0) AS list_price,
               b.first_seen,
               COALESCE(b.n_suppliers, 0) AS n_suppliers
        FROM (SELECT p_partkey AS coin_id, p_type AS category,
                     CAST(p_retailprice AS DOUBLE) AS list_price FROM part) a
        FULL OUTER JOIN (
            SELECT l_partkey AS coin_id,
                   MIN(CAST(l_shipdate AS DATE)) AS first_seen,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
            FROM lineitem GROUP BY l_partkey
        ) b USING (coin_id)
        """,
        partition=False,
    )

    # 1. market data: densify (per-coin min -> global max) + ffill +
    # days_imputed (the q21 oracle idiom, scoped)
    write(
        "coin_market_data",
        f"""
        WITH daily AS ({PRICES}),
        bounds AS (SELECT coin_id, MIN(date) AS min_d FROM daily GROUP BY coin_id),
        gmax AS (SELECT MAX(date) AS max_d FROM daily),
        scaffold AS (
            SELECT b.coin_id,
                   CAST(UNNEST(generate_series(b.min_d, g.max_d, INTERVAL 1 DAY)) AS DATE) AS date
            FROM bounds b CROSS JOIN gmax g
        ),
        joined AS (
            SELECT s.coin_id, s.date, d.price
            FROM scaffold s LEFT JOIN daily d
              ON d.coin_id = s.coin_id AND d.date = s.date
        ),
        lagged AS (
            SELECT *, CASE WHEN price IS NOT NULL
                           OR LAG(price) OVER (PARTITION BY coin_id ORDER BY date) IS NOT NULL
                      THEN 1 ELSE 0 END AS new_grp
            FROM joined
        ),
        grouped AS (
            SELECT *, SUM(new_grp) OVER (PARTITION BY coin_id ORDER BY date
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
            FROM lagged
        )
        SELECT coin_id, date,
               LAST_VALUE(price IGNORE NULLS)
                   OVER (PARTITION BY coin_id ORDER BY date
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price,
               CASE WHEN price IS NULL
                    THEN CAST(ROW_NUMBER() OVER (PARTITION BY coin_id, grp ORDER BY date) AS BIGINT)
               END AS days_imputed
        FROM grouped
        """,
        partition=True,
    )

    # 2. wallet transfers + running balance
    write(
        "coin_wallet_transfers",
        f"""
        WITH x AS ({XFERS})
        SELECT coin_id, wallet_address, date, net_transfers,
               CAST(SUM(net_transfers) OVER (
                   PARTITION BY coin_id, wallet_address ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS balance
        FROM x
        """,
        partition=True,
    )

    # 3. wallet profits kernel (the q22 oracle, scoped)
    write(
        "coin_wallet_profits",
        f"""
        WITH prices AS ({PRICES}),
        xfers AS ({XFERS}),
        merged AS (
            SELECT x.coin_id, x.wallet_address, x.date, x.net_transfers,
                   CAST(SUM(x.net_transfers) OVER (PARTITION BY x.coin_id, x.wallet_address
                        ORDER BY x.date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS balance,
                   p.price
            FROM xfers x
            JOIN prices p ON p.coin_id = x.coin_id AND p.date = x.date
        ),
        kernel AS (
            SELECT coin_id, wallet_address, date, net_transfers, balance, price,
                   COALESCE(LAG(price) OVER w, price) AS prev_price,
                   COALESCE(LAG(balance) OVER w, 0.0) AS prev_balance
            FROM merged
            WINDOW w AS (PARTITION BY coin_id, wallet_address ORDER BY date)
        ),
        changes AS (
            SELECT coin_id, wallet_address, date,
                   CAST((price - prev_price) * prev_balance AS DOUBLE) AS profits_change,
                   CAST(balance * price AS DOUBLE) AS usd_balance,
                   CAST(net_transfers * price AS DOUBLE) AS usd_net_transfers,
                   CAST(CASE WHEN net_transfers * price > 0
                             THEN net_transfers * price ELSE 0.0 END AS DOUBLE) AS usd_inflows
            FROM kernel
        )
        SELECT coin_id, wallet_address, date, profits_change,
               CAST(SUM(CAST(FLOOR(profits_change * 1e6) AS BIGINT)) OVER cum AS DOUBLE) / 1e6
                   AS profits_cumulative,
               usd_balance, usd_net_transfers, usd_inflows,
               CAST(SUM(CAST(FLOOR(usd_inflows * 1e6) AS BIGINT)) OVER cum AS DOUBLE) / 1e6
                   AS usd_inflows_cumulative
        FROM changes
        WINDOW cum AS (PARTITION BY coin_id, wallet_address ORDER BY date
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        partition=True,
    )

    # the 15 declared expectations as violation counts
    def count(sql: str) -> int:
        return con.execute(sql).fetchone()[0]

    audits = {
        "chains.not_null": count(
            "SELECT count(*) FROM w_chains WHERE chain_id IS NULL OR chain IS NULL"
        ),
        "chains.unique": count(
            "SELECT count(*) FROM (SELECT chain FROM w_chains GROUP BY chain HAVING count(*) > 1)"
        ),
        "chains.lowercase": count(
            "SELECT count(*) FROM w_chains WHERE chain <> lower(chain)"
        ),
        "coins.not_null": count(
            "SELECT count(*) FROM w_coins WHERE coin_id IS NULL OR coingecko_id IS NULL"
        ),
        "coins.unique": count(
            "SELECT count(*) FROM (SELECT coin_id FROM w_coins GROUP BY coin_id HAVING count(*) > 1)"
        ),
        "coins.lowercase": count(
            "SELECT count(*) FROM w_coins WHERE name <> lower(name)"
        ),
        "coin_facts.unique": count(
            "SELECT count(*) FROM (SELECT coin_id FROM w_coin_facts GROUP BY coin_id HAVING count(*) > 1)"
        ),
        "coin_facts.referential": count(
            "SELECT count(*) FROM (SELECT DISTINCT coin_id FROM w_coin_facts "
            "EXCEPT SELECT DISTINCT coin_id FROM w_coins)"
        ),
        "cmd.not_null": count(
            "SELECT count(*) FROM w_coin_market_data "
            "WHERE coin_id IS NULL OR date IS NULL OR price IS NULL"
        ),
        "cmd.unique": count(
            "SELECT count(*) FROM (SELECT coin_id, date FROM w_coin_market_data "
            "GROUP BY 1, 2 HAVING count(*) > 1)"
        ),
        "cmd.no_date_gaps": count(
            "SELECT count(*) FROM (SELECT coin_id FROM w_coin_market_data "
            "GROUP BY coin_id HAVING count(DISTINCT date) "
            "<> date_diff('day', MIN(date), MAX(date)) + 1)"
        ),
        "cwt.not_null": count(
            "SELECT count(*) FROM w_coin_wallet_transfers WHERE coin_id IS NULL "
            "OR wallet_address IS NULL OR date IS NULL OR balance IS NULL"
        ),
        "cwt.unique": count(
            "SELECT count(*) FROM (SELECT coin_id, wallet_address, date "
            "FROM w_coin_wallet_transfers GROUP BY 1, 2, 3 HAVING count(*) > 1)"
        ),
        "cwp.unique": count(
            "SELECT count(*) FROM (SELECT coin_id, wallet_address, date "
            "FROM w_coin_wallet_profits GROUP BY 1, 2, 3 HAVING count(*) > 1)"
        ),
        "cwp.monotone": count(
            "SELECT count(*) FROM (SELECT usd_inflows_cumulative AS v, "
            "LAG(usd_inflows_cumulative) OVER (PARTITION BY coin_id, wallet_address "
            "ORDER BY date) AS pv FROM w_coin_wallet_profits) WHERE pv IS NOT NULL AND v < pv"
        ),
    }
    elapsed = round(time.time() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "refresh_oracle_wall_clock",
                "value": elapsed,
                "unit": "sec",
                "tables": rows,
                "audits_pass": all(v == 0 for v in audits.values()),
                "violations": {k: v for k, v in audits.items() if v},
                "scope": f"{SINCE}..{UNTIL}, full coin universe",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
