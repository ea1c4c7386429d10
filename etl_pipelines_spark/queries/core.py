"""Relational operator queries (SURVEY.md §2.1-2.5, §2.8, §2.10).

Each query exercises one operator family from the reference on the
driver testdata, with a DuckDB oracle. Reference citations are on each
function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.dedupe import dedupe_keep_first
from etl_pipelines_spark.operators.daily_net import daily_net_transfers
from etl_pipelines_spark.queries.catalog import davg, dsum, o_davg, o_dsum, register, t


# --------------------------------------------------------------------- q01
@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           {o_dsum("l_extendedprice")} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           {o_davg("l_extendedprice")} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="A1 groupBy aggregate + P2 predicate (TPC-H Q1 shape; "
    "reference freshness aggs e.g. coingecko_market_data.py:126-158)",
    tags=("agg", "filter"),
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------- q02
@register(
    "q02_region_customer_revenue",
    f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(DISTINCT c.c_custkey) AS n_customers,
           {o_dsum("o.o_totalprice")} AS total_revenue
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
    description="J1 fact x dim broadcast joins + A1/A3 countDistinct "
    "(reference transfers x coins join core_coin_wallet_transfers.py:190)",
    tags=("join", "agg"),
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    o = t(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------- q03
@register(
    "q03_dedupe_keep_latest",
    """
    SELECT user_id, event_type, event_id, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    description="A6 streaming-dupe killer: row_number keep-newest "
    "(reference core_coin_market_data.py:53-57)",
    tags=("window", "dedupe"),
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return dedupe_keep_first(
        ev, ["user_id", "event_type"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_type", "event_id", "value")


# --------------------------------------------------------------------- q04
@register(
    "q04_running_balance",
    """
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS balance,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS transfer_sequence
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    description="W1/W2 running balance + transfer_sequence "
    "(reference core_coin_wallet_transfers.py:186-203)",
    tags=("window",),
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("balance"),
        F.row_number().over(w2).cast("long").alias("transfer_sequence"),
    )


# --------------------------------------------------------------------- q05
@register(
    "q05_daily_net_kernel",
    """
    WITH exploded AS (
        SELECT CAST(l.l_shipdate AS DATE) AS date,
               CONCAT('c', CAST(o.o_custkey AS VARCHAR)) AS wallet_address,
               l.l_partkey AS token_id,
               l.l_quantity AS signed
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        UNION ALL
        SELECT CAST(l.l_shipdate AS DATE) AS date,
               CONCAT('s', CAST(l.l_suppkey AS VARCHAR)) AS wallet_address,
               l.l_partkey AS token_id,
               -l.l_quantity AS signed
        FROM lineitem l
    )
    SELECT date, wallet_address, token_id,
           CAST(SUM(signed) AS DOUBLE) AS amount
    FROM exploded
    GROUP BY date, wallet_address, token_id
    HAVING SUM(signed) <> 0
    """,
    description="A2 daily-net transfer kernel: +receiver/-sender explode, "
    "HAVING SUM<>0 (reference ethereum_transfers_updates.py:224-249)",
    tags=("agg", "explode"),
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    # spread the single-file scan on the join key before the heavy
    # explode+agg (a many-file scan at cluster scale provides this
    # spread for free); the orders side broadcasts under AQE here and
    # degrades gracefully to a co-partitioned shuffle join at scale
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_partkey", "l_suppkey", "l_quantity"
    ).repartition("l_orderkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    raw = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_shipdate").alias("block_timestamp"),
        F.col("l_partkey").alias("token_address"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("from_address"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("to_address"),
        F.col("l_quantity").alias("value"),
    )
    out = daily_net_transfers(raw)
    return out.select(
        "date", "wallet_address", F.col("token_address").alias("token_id"), "amount"
    )


# --------------------------------------------------------------------- q06
@register(
    "q06_anti_join_exclusions",
    """
    SELECT c.c_custkey, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NULL
    """,
    description="J4 left-anti exclusion (reference 5-deep anti-join stack "
    "core_coin_wallet_transfers.py:285-302)",
    tags=("join",),
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --------------------------------------------------------------------- q07
@register(
    "q07_semi_join_priced_coins",
    """
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE p.p_partkey IN (
        SELECT l_partkey FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    )
    """,
    description="J6 semi join on grouped subquery: keep only coins having "
    "price data (reference core_coin_wallet_profits.py:146-151)",
    tags=("join",),
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    li = t(spark, sf, "lineitem").filter(
        F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date")
    )
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select("p_partkey", "p_name")


# --------------------------------------------------------------------- q08
@register(
    "q08_full_outer_coalesce",
    f"""
    WITH ship AS (
        SELECT l_partkey AS partkey, {o_dsum("l_quantity")} AS shipped_qty
        FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_partkey
    ),
    ret AS (
        SELECT l_partkey AS partkey, {o_dsum("l_quantity")} AS returned_qty
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
    )
    SELECT COALESCE(s.partkey, r.partkey) AS partkey,
           COALESCE(s.shipped_qty, 0.0) AS shipped_qty,
           COALESCE(r.returned_qty, 0.0) AS returned_qty
    FROM ship s FULL OUTER JOIN ret r ON s.partkey = r.partkey
    """,
    description="J7 full-outer + P10 coalesce cascade (reference metadata "
    "merge core_coin_facts_metadata.py:106-111)",
    tags=("join",),
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    # one shuffle on partkey feeds both agg branches and co-partitions
    # the full-outer join, so neither branch adds its own exchange
    li = t(spark, sf, "lineitem").select(
        "l_partkey", "l_returnflag", "l_quantity"
    ).repartition("l_partkey")
    ship = (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum("l_quantity").alias("shipped_qty"))
    )
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum("l_quantity").alias("returned_qty"))
    )
    joined = ship.alias("s").join(
        ret.alias("r"), F.col("s.partkey") == F.col("r.partkey"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("s.partkey"), F.col("r.partkey")).alias("partkey"),
        F.coalesce(F.col("s.shipped_qty"), F.lit(0.0)).alias("shipped_qty"),
        F.coalesce(F.col("r.returned_qty"), F.lit(0.0)).alias("returned_qty"),
    )


# --------------------------------------------------------------------- q09
@register(
    "q09_theta_join_overage",
    """
    WITH nation_avg AS (
        SELECT c_nationkey, CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, na.avg_bal
    FROM customer c
    JOIN nation_avg na ON na.c_nationkey = c.c_nationkey
        AND c.c_acctbal > 2 * na.avg_bal
    """,
    description="J8 theta join with equi key + inequality (reference "
    "balance > total_supply core_coin_wallet_transfers.py:346-349)",
    tags=("join",),
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    na = c.groupBy("c_nationkey").agg(davg("c_acctbal", "decimal(18,2)").alias("avg_bal"))
    return (
        c.join(
            F.broadcast(na.withColumnRenamed("c_nationkey", "nk")),
            (F.col("c_nationkey") == F.col("nk"))
            & (F.col("c_acctbal") > 2 * F.col("avg_bal")),
        )
        .select("c_custkey", "c_nationkey", "c_acctbal", "avg_bal")
    )


# --------------------------------------------------------------------- q10
@register(
    "q10_conditional_agg_census",
    """
    SELECT c_nationkey,
           COUNT(*) AS wallets,
           COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS negative_wallets,
           COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS building_wallets
    FROM customer
    GROUP BY c_nationkey
    """,
    description="A4 conditional count census (reference negative-wallet "
    "census core_coin_wallet_transfers.py:317-331)",
    tags=("agg",),
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("wallets"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("negative_wallets"),
            F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("building_wallets"),
        )
    )


# --------------------------------------------------------------------- q11
@register(
    "q11_union_distinct_ids",
    """
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    description="O5/O6 union + distinct (reference coins-with-transfers "
    "union core_coins.py:327-346)",
    tags=("setop",),
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# --------------------------------------------------------------------- q12
@register(
    "q12_top1_per_group",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           CAST(o_totalprice AS DOUBLE) AS latest_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    description="O4/A8 top-1 per group / per-group last (reference "
    "groupby last core_coin_wallet_profits.py:392-397)",
    tags=("window",),
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return dedupe_keep_first(
        o, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    ).select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


# --------------------------------------------------------------------- q13
@register(
    "q13_deterministic_sample",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    ORDER BY MD5(CONCAT('seed42', CAST(o_orderkey AS VARCHAR))), o_orderkey
    LIMIT 100
    """,
    description="O3 deterministic seeded sample (reference farm_fingerprint "
    "ORDER BY dbt math test :19-23; md5 stands in cross-engine)",
    tags=("sample",),
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.orderBy(
            F.md5(F.concat(F.lit("seed42"), F.col("o_orderkey").cast("string"))),
            "o_orderkey",
        )
        .select("o_orderkey", "o_custkey")
        .limit(100)
    )


# --------------------------------------------------------------------- q14
@register(
    "q14_stable_id_issuance",
    """
    SELECT c_name AS wallet_address,
           CAST(ROW_NUMBER() OVER (ORDER BY c_name) + 1000 AS BIGINT) AS wallet_id
    FROM (SELECT DISTINCT c_name FROM customer)
    """,
    description="M1/W4 stable dense ID issuance ordered by key, offset by "
    "max existing (reference core_coin_wallet_transfers.py:426-439)",
    tags=("ids", "window"),
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.operators.ids import dense_global_ids

    c = t(spark, sf, "customer").select(F.col("c_name").alias("wallet_address"))
    return dense_global_ids(c, "wallet_address", "wallet_id", offset=1000)


# --------------------------------------------------------------------- q15
@register(
    "q15_case_normalization",
    """
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'BUILDING' THEN LOWER(c_name) ELSE c_name END AS wallet_address,
           CONCAT(CAST(c_nationkey AS VARCHAR), ':', c_mktsegment) AS chain_key,
           CAST(SPLIT_PART(c_name, '#', 2) AS BIGINT) AS name_number
    FROM customer
    """,
    description="P3/F1 conditional lowercase + string ops (reference "
    "conditional lower core_coin_wallet_transfers.py:228-231, split "
    "ethereum_transfers_updates.py:146-157)",
    tags=("scalar",),
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", F.lower(F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("wallet_address"),
        F.concat(
            F.col("c_nationkey").cast("string"), F.lit(":"), F.col("c_mktsegment")
        ).alias("chain_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).cast("long").alias("name_number"),
    )


# --------------------------------------------------------------------- q16
@register(
    "q16_json_extraction",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    """,
    description="F5/S14 JSON-string column parse (reference Dune row parse "
    "retrieve_dune_transfer_data.py:540-569)",
    tags=("json",),
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    ).filter(F.col("k_value").isNotNull())


# --------------------------------------------------------------------- q17
@register(
    "q17_outlier_rules",
    """
    WITH transfers AS (
        SELECT l.l_partkey AS coin_id, o.o_custkey AS wallet_address,
               CAST(l.l_shipdate AS DATE) AS date,
               CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN -l.l_quantity
                             ELSE l.l_quantity END) AS DOUBLE) AS net_transfers
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2, 3
    ),
    balances AS (
        SELECT *, SUM(net_transfers) OVER (
                   PARTITION BY coin_id, wallet_address ORDER BY date
                   ROWS UNBOUNDED PRECEDING) AS balance
        FROM transfers
    ),
    mins AS (
        SELECT coin_id, wallet_address, MIN(balance) AS lowest
        FROM balances GROUP BY 1, 2
    ),
    coin_census AS (
        SELECT coin_id,
               COUNT(CASE WHEN lowest < -0.1 THEN 1 END) AS neg_wallets
        FROM mins GROUP BY coin_id
    ),
    q1 AS (
        SELECT b.* FROM balances b
        JOIN mins m ON m.coin_id = b.coin_id
                   AND m.wallet_address = b.wallet_address AND m.lowest > -0.1
        JOIN coin_census c ON c.coin_id = b.coin_id AND c.neg_wallets < 10
    ),
    supply AS (
        SELECT p_partkey AS coin_id,
               CAST(p_size AS DOUBLE) * 40.0 AS total_supply
        FROM part
    ),
    overage_pairs AS (
        SELECT DISTINCT q.coin_id, q.wallet_address
        FROM q1 q JOIN supply s ON s.coin_id = q.coin_id
        WHERE q.balance > s.total_supply
    ),
    overage_coins AS (
        SELECT coin_id FROM overage_pairs
        GROUP BY coin_id HAVING COUNT(wallet_address) >= 5
    ),
    q2 AS (
        SELECT q.* FROM q1 q
        LEFT JOIN overage_pairs op ON op.coin_id = q.coin_id
                                  AND op.wallet_address = q.wallet_address
        WHERE op.coin_id IS NULL
          AND q.coin_id NOT IN (SELECT coin_id FROM overage_coins)
    )
    SELECT coin_id, wallet_address,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(balance) AS DOUBLE) AS peak_balance
    FROM q2 GROUP BY coin_id, wallet_address
    """,
    description="Q1+Q2 outlier rules: drop wallets with min(balance) <= "
    "-0.1 (whole coin at >=10 such), drop supply-overage wallets via "
    "theta join (whole coin at >=5). Thresholds and order are the spec "
    "(core_coin_wallet_transfers.py:306-385)",
    tags=("quality",),
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    # Single-pass evaluation of the Q1+Q2 rule stack. The row-preserving
    # operators in operators/outliers.py read their input from five
    # branches (mins, census, theta join, semi/anti join-backs) — the
    # right shape when downstream needs the surviving ROWS (see
    # plans/transfers.py). This query only emits per-pair aggregates, so
    # every rule collapses onto one pair-level frame:
    #   - min/max/count of balance per pair in ONE aggregation
    #   - the row-level theta join `balance > total_supply` == the
    #     per-pair predicate `max(balance) > total_supply`
    #   - both coin-level censuses become windows over the tiny
    #     pair-stats frame instead of groupBy + join-back branches
    # Plan: scan -> (coin,wallet,date) agg -> balance window -> pair agg
    # -> coin windows -> filters. No recomputed subtree, no persist.
    from etl_pipelines_spark.operators.windows import cumulative_window
    from etl_pipelines_spark.queries.timeseries import transfers as transfers_fn
    from pyspark.sql import Window

    tr = transfers_fn(spark, sf)
    balances = tr.withColumn(
        "balance",
        F.sum("net_transfers").over(
            cumulative_window(["coin_id", "wallet_address"], ["date"])
        ),
    )
    supply = t(spark, sf, "part").select(
        F.col("p_partkey").alias("coin_id"),
        (F.col("p_size").cast("double") * 40.0).alias("total_supply"),
    )
    pair_stats = (
        balances.groupBy("coin_id", "wallet_address")
        .agg(
            F.min("balance").alias("_lowest"),
            F.count(F.lit(1)).alias("n_days"),
            F.max("balance").alias("_peak"),
        )
        .join(F.broadcast(supply), "coin_id")
    )
    coin_w = Window.partitionBy("coin_id")
    # Q1: drop pairs with min(balance) <= -0.1; drop the coin at >= 10
    q1 = (
        pair_stats.withColumn(
            "_neg_wallets",
            F.sum(F.when(F.col("_lowest") < -0.1, 1).otherwise(0)).over(coin_w),
        )
        .filter((F.col("_lowest") > -0.1) & (F.col("_neg_wallets") < 10))
    )
    # Q2 over Q1 survivors: drop supply-overage pairs; drop the coin at >= 5
    q2 = (
        q1.withColumn("_over", F.col("_peak") > F.col("total_supply"))
        .withColumn(
            "_over_wallets", F.sum(F.col("_over").cast("int")).over(coin_w)
        )
        .filter(~F.col("_over") & (F.col("_over_wallets") < 5))
    )
    return q2.select(
        "coin_id",
        "wallet_address",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("_peak").cast("double").alias("peak_balance"),
    )


# --------------------------------------------------------------------- q18
@register(
    "q18_array_aggregation",
    """
    SELECT o_custkey AS customer,
           CAST(len(list_distinct(list(o_orderpriority))) AS INT) AS n_priorities,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
               AS priorities_csv,
           list_sort(list_distinct(list(o_orderpriority)))[1] AS first_priority,
           CAST(len(list(o_orderkey)) AS INT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    description="F4 array ops: ARRAY_AGG DISTINCT + sort + element "
    "access + length (reference categories agg "
    "core_coin_facts_coingecko.py:94-100, websites[OFFSET(0)] "
    "core_coin_facts_metadata.py:46-50)",
    tags=("array",),
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    # ONE collect buffer per group: referencing the sorted-distinct
    # array inside several agg expressions would give each its own
    # collect_list aggregate; aggregate once, derive in the projection
    grouped = o.groupBy(F.col("o_custkey").alias("customer")).agg(
        F.array_sort(F.array_distinct(F.collect_list("o_orderpriority"))).alias("_arr"),
        F.count(F.lit(1)).cast("int").alias("n_orders"),
    )
    return grouped.select(
        "customer",
        F.size("_arr").alias("n_priorities"),
        F.array_join("_arr", ",").alias("priorities_csv"),
        F.element_at("_arr", 1).alias("first_priority"),
        "n_orders",
    )


# --------------------------------------------------------------------- q19
@register(
    "q19_scalar_combine_joins",
    """
    WITH most_recent_order AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS max_order_date FROM orders
    ),
    max_price AS (
        SELECT CAST(MAX(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS max_retail FROM part
    ),
    freshness AS (
        SELECT max_order_date, max_retail
        FROM most_recent_order CROSS JOIN max_price
    )
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
           f.max_order_date, f.max_retail
    FROM orders o
    JOIN freshness f ON f.max_order_date > CAST(o.o_orderdate AS DATE)
    WHERE o.o_orderkey % 100 = 0
    """,
    description="J10 cross join of 1-row aggregates + J9 range-predicate "
    "join against the combined scalar row (reference freshness gate "
    "test_cCoinWalletProfits_transfers_and_profits_math.sql:30-41,73-74)",
    tags=("join",),
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    p = t(spark, sf, "part")
    most_recent = o.agg(F.max(F.to_date("o_orderdate")).alias("max_order_date"))
    max_price = p.agg(
        F.max(F.col("p_retailprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("max_retail")
    )
    freshness = most_recent.crossJoin(max_price)
    return (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .join(
            F.broadcast(freshness),
            F.col("max_order_date") > F.to_date("o_orderdate"),
        )
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "max_order_date",
            "max_retail",
        )
    )


# --------------------------------------------------------------------- q46
@register(
    "q46_rollup_totals",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="A12 grouping sets: ROLLUP subtotals + grand total "
    "(absent in the reference, free in Spark - partial aggregation "
    "covers all grouping sets in one shuffle)",
    tags=("agg",),
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


# --------------------------------------------------------------------- q47
@register(
    "q47_stratified_dev_sample",
    """
    WITH coins AS (
        SELECT p_partkey AS coin_id,
               p_partkey % 3 = 0 AS has_orders
        FROM part
    ),
    with_data AS (
        SELECT coin_id, 'with_data' AS stratum,
               ROW_NUMBER() OVER (ORDER BY MD5(CONCAT('seed42', CAST(coin_id AS VARCHAR)))) AS rn
        FROM coins WHERE has_orders
    ),
    without_data AS (
        SELECT coin_id, 'without_data' AS stratum,
               ROW_NUMBER() OVER (ORDER BY MD5(CONCAT('seed42', CAST(coin_id AS VARCHAR)))) AS rn
        FROM coins WHERE NOT has_orders
    )
    SELECT coin_id, stratum FROM with_data WHERE rn <= 200
    UNION ALL
    SELECT coin_id, stratum FROM without_data WHERE rn <= 50
    """,
    description="O3 stratified deterministic dev sample: 200 + 50 coins "
    "per stratum ordered by seeded hash (reference dev_core sandbox, "
    "dev_core_tables/create_reference_dev_coins.sql:1-28; md5 stands "
    "in for farm_fingerprint - same determinism, different sample set)",
    tags=("sample",),
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    coins = t(spark, sf, "part").select(
        F.col("p_partkey").alias("coin_id"),
        (F.col("p_partkey") % 3 == 0).alias("has_orders"),
    )
    seed_hash = F.md5(F.concat(F.lit("seed42"), F.col("coin_id").cast("string")))

    def stratum(flag, name, n):
        w = Window.orderBy(seed_hash)
        return (
            coins.filter(flag)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select("coin_id", F.lit(name).alias("stratum"))
        )

    return stratum(F.col("has_orders"), "with_data", 200).unionByName(
        stratum(~F.col("has_orders"), "without_data", 50)
    )


# --------------------------------------------------------------------- q49
@register(
    "q49_or_condition_join",
    """
    WITH exclusions AS (
        SELECT 'EUROPE' AS region_scope, 'audit' AS reason
        UNION ALL SELECT 'all', 'global_hold'
    )
    SELECT r.r_name AS region, e.reason
    FROM region r
    JOIN exclusions e ON e.region_scope = r.r_name OR e.region_scope = 'all'
    ORDER BY region, reason
    """,
    description="J11 OR-condition join (reference chains x exclusions "
    "on source = chain OR source = 'all', "
    "core_coin_wallet_transfers.py:233-236). Spark executes the OR as "
    "BNLJ; the union-of-equi-cases rewrite keeps it a hash join",
    tags=("join",),
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    r = t(spark, sf, "region")
    exclusions = spark.createDataFrame(
        [("EUROPE", "audit"), ("all", "global_hold")], "region_scope string, reason string"
    )
    # union-of-equi-cases: the targeted case joins on the key, the
    # 'all' wildcard case cross-joins the (tiny) wildcard rows — both
    # hash-joinable, no boolean-OR nested loop
    targeted = r.join(
        F.broadcast(exclusions.filter(F.col("region_scope") != "all")),
        F.col("region_scope") == F.col("r_name"),
    ).select(F.col("r_name").alias("region"), "reason")
    wildcard = r.crossJoin(
        F.broadcast(exclusions.filter(F.col("region_scope") == "all"))
    ).select(F.col("r_name").alias("region"), "reason")
    return targeted.unionByName(wildcard)


# --------------------------------------------------------------------- q50
@register(
    "q50_sql_view_union",
    """
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
        SELECT * FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT * FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY o_orderpriority
    """,
    description="S6 view-over-union via the SQL surface: temp views + "
    "spark.sql text (the reference's dynamic cohort-union view, "
    "ethereum_transfers_updates.py:330-396 - here one partitioned "
    "table makes the dynamic union unnecessary, but the SQL API is a "
    "first-class entry point)",
    tags=("sql", "setop"),
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "orders").createOrReplaceTempView("q50_orders")
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW q50_union AS "
        "SELECT * FROM q50_orders WHERE o_orderstatus = 'F' "
        "UNION ALL SELECT * FROM q50_orders WHERE o_orderstatus = 'O'"
    )
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM q50_union
        GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------- q54
@register(
    "q54_column_profile",
    """
    WITH a AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn_ok,
               COUNT(DISTINCT o_orderkey) AS nd_ok,
               CAST(MIN(o_orderkey) AS DOUBLE) AS mn_ok, CAST(MAX(o_orderkey) AS DOUBLE) AS mx_ok,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn_ck,
               COUNT(DISTINCT o_custkey) AS nd_ck,
               CAST(MIN(o_custkey) AS DOUBLE) AS mn_ck, CAST(MAX(o_custkey) AS DOUBLE) AS mx_ck,
               SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn_tp,
               COUNT(DISTINCT o_totalprice) AS nd_tp,
               MIN(o_totalprice) AS mn_tp, MAX(o_totalprice) AS mx_tp,
               SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn_os,
               COUNT(DISTINCT o_orderstatus) AS nd_os,
               MIN(o_orderstatus) AS mn_os, MAX(o_orderstatus) AS mx_os,
               SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn_op,
               COUNT(DISTINCT o_orderpriority) AS nd_op,
               MIN(o_orderpriority) AS mn_op, MAX(o_orderpriority) AS mx_op,
               SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn_od,
               COUNT(DISTINCT o_orderdate) AS nd_od,
               CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS mn_od,
               CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS mx_od
        FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n AS n_rows, CAST(nn_ok AS BIGINT) AS n_null,
           CAST(nd_ok AS BIGINT) AS n_distinct, mn_ok AS min_num, mx_ok AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
    UNION ALL SELECT 'o_custkey', n, CAST(nn_ck AS BIGINT), CAST(nd_ck AS BIGINT),
           mn_ck, mx_ck, NULL, NULL FROM a
    UNION ALL SELECT 'o_totalprice', n, CAST(nn_tp AS BIGINT), CAST(nd_tp AS BIGINT),
           mn_tp, mx_tp, NULL, NULL FROM a
    UNION ALL SELECT 'o_orderstatus', n, CAST(nn_os AS BIGINT), CAST(nd_os AS BIGINT),
           NULL, NULL, mn_os, mx_os FROM a
    UNION ALL SELECT 'o_orderpriority', n, CAST(nn_op AS BIGINT), CAST(nd_op AS BIGINT),
           NULL, NULL, mn_op, mx_op FROM a
    UNION ALL SELECT 'o_orderdate', n, CAST(nn_od AS BIGINT), CAST(nd_od AS BIGINT),
           NULL, NULL, mn_od, mx_od FROM a
    """,
    description="Table profile (null count, distinct count, typed "
    "min/max per column), one row per column — the data-quality "
    "census a pipeline runs before training ingestion. One branch "
    "per column: a column-pruned scan feeding groupBy(value).count "
    "(map-side combinable; the shuffle carries distinct values, not "
    "rows) then a 1-row rollup. This sidesteps Spark's multi-"
    "countDistinct Expand rewrite, which multiplies every input row "
    "by the number of DISTINCT aggregates before shuffling. Numeric "
    "and string extrema carried in separate typed columns "
    "(double->string formatting is not engine-portable)",
    tags=("profiling", "agg"),
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")

    def profile(col: str, kind: str) -> DataFrame:
        # distinct-by-grouping: n_distinct = count of non-null group
        # keys; null count and n_rows recovered from the group sizes,
        # so one narrow shuffle serves every statistic
        g = o.select(col).groupBy(col).agg(F.count(F.lit(1)).alias("_cnt"))
        if kind == "num":
            mn = F.min(col).cast("double").alias("min_num")
            mx = F.max(col).cast("double").alias("max_num")
            ms = F.lit(None).cast("string").alias("min_str")
            xs = F.lit(None).cast("string").alias("max_str")
        elif kind == "date":
            mn = F.lit(None).cast("double").alias("min_num")
            mx = F.lit(None).cast("double").alias("max_num")
            ms = F.min(col).cast("date").cast("string").alias("min_str")
            xs = F.max(col).cast("date").cast("string").alias("max_str")
        else:
            mn = F.lit(None).cast("double").alias("min_num")
            mx = F.lit(None).cast("double").alias("max_num")
            ms = F.min(col).alias("min_str")
            xs = F.max(col).alias("max_str")
        return g.agg(
            F.lit(col).alias("col_name"),
            F.sum("_cnt").alias("n_rows"),
            F.sum(F.when(F.col(col).isNull(), F.col("_cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_null"),
            F.count(col).cast("long").alias("n_distinct"),
            mn,
            mx,
            ms,
            xs,
        )

    cols = [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_totalprice", "num"),
        ("o_orderstatus", "str"),
        ("o_orderpriority", "str"),
        ("o_orderdate", "date"),
    ]
    out = profile(*cols[0])
    for c, kind in cols[1:]:
        out = out.unionByName(profile(c, kind))
    return out.select(
        "col_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


# --------------------------------------------------------------------- q76
@register(
    "q76_external_snapshot_scan",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type = 'purchase' AND value > 10
    GROUP BY user_id
    """,
    description="S7/S8 external federation through the "
    "register_external_source boundary: a named snapshot source (the "
    "local stand-in for a BigQuery/JDBC/federated connector, reference "
    "ethereum_transfers_updates.py:220-222 and "
    "retrieve_dune_transfer_data.py:504-536) scanned via external_scan "
    "with a predicate and projection applied at the reader root — both "
    "reach the underlying scan (PushedFilters/ReadSchema pinned in "
    "test_plan_audits), so a connector that supports pushdown receives "
    "them. The aggregation on top is ordinary engine work: per-user "
    "purchase counts and an order-independent DECIMAL sum",
    tags=("source", "federation"),
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from etl_pipelines_spark.sources.federation import (
        external_scan,
        parquet_snapshot_source,
        register_external_source,
    )

    register_external_source(
        "warehouse.events",
        parquet_snapshot_source(os.path.join(sf, "events.parquet")),
    )
    ev = external_scan(
        spark,
        "warehouse.events",
        columns=["user_id", "value"],
        predicate="event_type = 'purchase' AND value > 10",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------- q77
@register(
    "q77_merge_upsert",
    """
    WITH target AS (
        SELECT p_partkey AS id, p_name AS name,
               CAST(p_retailprice AS DOUBLE) AS v
        FROM part
    ),
    raw_updates AS (
        -- two conflicting update rows per changed key: keep-latest
        -- must pick the v*2 variant (v > 0, so 2v > 1.5v always)
        SELECT p_partkey AS id, 'stale_' || p_name AS name,
               CAST(p_retailprice AS DOUBLE) * 1.5 AS v
        FROM part WHERE p_partkey % 10 = 0
        UNION ALL
        SELECT p_partkey, upper(p_name), CAST(p_retailprice AS DOUBLE) * 2.0
        FROM part WHERE p_partkey % 10 = 0
        UNION ALL
        -- invented keys are NEGATED real keys: real p_partkey is
        -- always positive, so these can never collide at ANY scale
        -- factor (a fixed positive offset would collide once the key
        -- domain grows past it)
        SELECT 0 - p_partkey, lower(p_name),
               CAST(p_retailprice AS DOUBLE)
        FROM part WHERE p_partkey % 100 = 7
    ),
    updates AS (
        SELECT id, name, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY v DESC) AS rn
            FROM raw_updates
        ) WHERE rn = 1
    )
    SELECT t.id, t.name, t.v FROM target t
    LEFT JOIN (SELECT DISTINCT id FROM updates) u ON u.id = t.id
    WHERE u.id IS NULL
    UNION ALL
    SELECT id, name, v FROM updates
    """,
    description="M3/M4 MERGE upsert as one plan (operators/merge.py "
    "merge_upsert): the reference's DELETE-matching-keys + INSERT-stage "
    "temp-table choreography collapsed to an anti-join on the merge "
    "keys plus a union of the updates — matched target rows replaced, "
    "unmatched updates inserted, and duplicate update keys resolved "
    "keep-latest — the update set deliberately carries TWO conflicting "
    "rows per changed key so the dedupe branch does real work (the "
    "q69 non-vacuity lesson). The anti-join shuffles on the merge "
    "keys exactly as the DELETE would; a small update set broadcasts "
    "and the target never shuffles. v = one double multiplication -> "
    "exact parity",
    tags=("merge", "join"),
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.operators.merge import merge_upsert

    part = t(spark, sf, "part")
    target = part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_retailprice").cast("double").alias("v"),
    )
    changed = part.filter(F.col("p_partkey") % 10 == 0)
    stale = changed.select(
        F.col("p_partkey").alias("id"),
        F.concat(F.lit("stale_"), F.col("p_name")).alias("name"),
        (F.col("p_retailprice").cast("double") * F.lit(1.5)).alias("v"),
    )
    fresh = changed.select(
        F.col("p_partkey").alias("id"),
        F.upper("p_name").alias("name"),
        (F.col("p_retailprice").cast("double") * F.lit(2.0)).alias("v"),
    )
    inserted = part.filter(F.col("p_partkey") % 100 == 7).select(
        (-F.col("p_partkey")).alias("id"),
        F.lower("p_name").alias("name"),
        F.col("p_retailprice").cast("double").alias("v"),
    )
    updates = stale.unionByName(fresh).unionByName(inserted)
    return merge_upsert(target, updates, ["id"], order_col="v")


# --------------------------------------------------------------------- q86
@register(
    "q86_window_family",
    """
    SELECT c_custkey,
           CAST(c_nationkey AS BIGINT) AS nation,
           CAST(ntile(4) OVER w AS BIGINT) AS bal_quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS bal_pct_rank,
           CAST(cume_dist() OVER w AS DOUBLE) AS bal_cume_dist,
           CAST(nth_value(c_custkey, 2) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    description="W-series completion: the distribution-rank window "
    "family (ntile quartiles, percent_rank, cume_dist, nth_value over "
    "the full-frame window) per nation — all four ride ONE sort on the "
    "same (nation, balance) ordering, so the family costs a single "
    "exchange + sort no matter how many rank flavors stack",
    tags=("window",),
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t(spark, sf, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nation"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.nth_value("c_custkey", 2).over(w_full).cast("long").alias(
            "second_richest"
        ),
    )


# --------------------------------------------------------------------- q87
@register(
    "q87_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38, 6))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
    description="A12 completion: arbitrary GROUPING SETS (not just the "
    "ROLLUP prefix chain — the (priority)-only set is unreachable by "
    "rollup/cube) with grouping_id disambiguating NULL-as-group from "
    "NULL-as-subtotal. One shuffle covers all four sets via Spark's "
    "Expand+partial-aggregate, which is the right use of Expand (each "
    "input row feeds every set it belongs to); sums are DECIMAL-exact",
    tags=("agg",),
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .groupingSets(
            [
                [F.col("o_orderstatus"), F.col("o_orderpriority")],
                [F.col("o_orderstatus")],
                [F.col("o_orderpriority")],
                [],
            ],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------- q88
@register(
    "q88_scd2_history",
    """
    WITH s1 AS (
        SELECT p_partkey AS id, p_name AS name,
               CAST(p_retailprice AS DOUBLE) AS price
        FROM part
    )
    SELECT id, name, price,
           '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
    FROM s1 WHERE id % 100 != 17 AND id % 10 NOT IN (3, 7)
    UNION ALL
    SELECT id, name, price, '2024-01-01', '2024-02-01'
    FROM s1 WHERE id % 100 = 17 OR id % 10 IN (3, 7)
    UNION ALL
    SELECT id,
           CASE WHEN id % 10 = 7 THEN name || '+' ELSE name END,
           CASE WHEN id % 10 = 3 THEN price + 1.5 ELSE price END,
           '2024-02-01', NULL
    FROM s1 WHERE id % 100 != 17 AND id % 10 IN (3, 7)
    UNION ALL
    SELECT 0 - id, 'NEW ' || name, price + 1.0, '2024-02-01', NULL
    FROM s1 WHERE id % 100 = 11
    """,
    description="SCD2 history build (operators/scd2.py, the M2/M3 "
    "mutation family extended to KEEP history): bootstrap the part "
    "dimension at 2024-01-01, then apply a second snapshot (renames on "
    "id%10=7, reprices on id%10=3, hard-deletes on id%100=17 with "
    "close_missing, inserts on id%100=11) — changed rows close at the "
    "effective date and re-open as new versions via ONE full-outer "
    "join on the key whose rows explode into their 1-2 output "
    "versions (a union of filtered arms would replicate the join per "
    "arm), historical rows untouched. The oracle enumerates the "
    "outcome arms directly",
    tags=("merge", "mutation"),
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.operators.scd2 import scd2_apply, scd2_init

    s1 = t(spark, sf, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_retailprice").cast("double").alias("price"),
    )
    changed = s1.filter(F.col("id") % 100 != 17).select(
        "id",
        F.when(F.col("id") % 10 == 7, F.concat("name", F.lit("+")))
        .otherwise(F.col("name"))
        .alias("name"),
        F.when(F.col("id") % 10 == 3, F.col("price") + 1.5)
        .otherwise(F.col("price"))
        .alias("price"),
    )
    # negated real keys: collision-free with positive ids at any sf
    inserted = s1.filter(F.col("id") % 100 == 11).select(
        (-F.col("id")).alias("id"),
        F.concat(F.lit("NEW "), "name").alias("name"),
        (F.col("price") + 1.0).alias("price"),
    )
    s2 = changed.unionByName(inserted)
    dim1 = scd2_init(s1, ["id"], ["name", "price"], "2024-01-01")
    return scd2_apply(
        dim1, s2, ["id"], ["name", "price"], "2024-02-01", close_missing=True
    )


# --------------------------------------------------------------------- q97
def _snapshot_diff_oracle() -> str:
    from etl_pipelines_spark.operators.tablediff import row_digest_sql

    dig = row_digest_sql(["ck", "st"])
    return f"""
    WITH old AS (
        SELECT o_orderkey AS id, o_custkey AS ck, o_orderstatus AS st
        FROM orders
    ),
    new AS (
        SELECT id, CASE WHEN id % 10 = 3 THEN ck + 1 ELSE ck END AS ck, st
        FROM old WHERE id % 50 <> 1
        UNION ALL
        SELECT 0 - id, ck, st FROM old WHERE id % 100 = 7
    ),
    o AS (SELECT id, {dig} AS od FROM old),
    n AS (SELECT id, {dig} AS nd FROM new)
    SELECT COALESCE(o.id, n.id) AS id,
           CASE WHEN o.id IS NULL THEN 'added'
                WHEN n.id IS NULL THEN 'removed'
                WHEN od <> nd THEN 'changed' END AS status
    FROM o FULL OUTER JOIN n ON n.id = o.id
    WHERE (o.id IS NULL OR n.id IS NULL OR od <> nd)
    """


@register(
    "q97_snapshot_diff",
    _snapshot_diff_oracle(),
    description="Key-level snapshot diff (operators/tablediff.py "
    "snapshot_diff): added / removed / changed keys between two table "
    "versions — the incremental-load-vs-rebuild reconciliation audit. "
    "Each side shuffles only (key, one 48-bit row digest), so the "
    "full-outer join is narrow at any table width and the output is "
    "proportional to the churn. The new snapshot deliberately drops "
    "1-in-50 keys, rewrites 1-in-10, and invents 1-in-100 so all "
    "three arms carry rows",
    tags=("merge", "mutation", "quality"),
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.operators.tablediff import snapshot_diff

    old = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("ck"),
        F.col("o_orderstatus").alias("st"),
    )
    new = (
        old.filter(F.col("id") % 50 != 1)
        .select(
            "id",
            F.when(F.col("id") % 10 == 3, F.col("ck") + 1)
            .otherwise(F.col("ck"))
            .alias("ck"),
            "st",
        )
        .unionByName(
            old.filter(F.col("id") % 100 == 7).select(
                (-F.col("id")).alias("id"), "ck", "st"
            )
        )
    )
    return snapshot_diff(old, new, ["id"])


# --------------------------------------------------------------------- q98
def _table_digest_oracle() -> str:
    from etl_pipelines_spark.operators.tablediff import row_digest_sql

    dig = row_digest_sql(["l_orderkey", "l_partkey", "l_linenumber", "l_returnflag", "sd"])
    return f"""
    WITH x AS (
        SELECT l_orderkey, l_partkey, l_linenumber, l_returnflag,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS sd
        FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST({dig} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS digest
    FROM x
    """


@register(
    "q98_table_digest",
    _table_digest_oracle(),
    description="Order-independent whole-table checksum "
    "(operators/tablediff.py table_digest): sum of 48-bit per-row md5 "
    "digests accumulated as DECIMAL(38,0) — identical under any "
    "partitioning, row order, or engine, so a 100 TB copy validates "
    "by comparing two numbers instead of sorting either side. "
    "DECIMAL accumulation is the cross-engine trap the operator "
    "exists to encode: BIGINT sums overflow Spark's ANSI long while "
    "DuckDB silently widens to HUGEINT",
    tags=("quality", "agg"),
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.operators.tablediff import table_digest

    # repartition off the scan: a single-file corpus is 3 row-group
    # tasks, and md5-per-row is CPU-bound — the one exchange fans the
    # digest work across cores (the transfers/daily_prices idiom;
    # measured 1.6 s -> 1.1 s at sf0.1). At cluster scale a many-file
    # layout provides the fan-out and the exchange is map-side cheap.
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_shipdate").cast("date").cast("string").alias("sd"),
    ).repartition("l_orderkey")
    return table_digest(li)


# --------------------------------------------------------------------- q100
def _correlation_oracle() -> str:
    cols = {"q": "l_quantity", "e": "l_extendedprice", "d": "l_discount", "t": "l_tax"}
    pairs = [("q", "e"), ("q", "d"), ("q", "t"), ("e", "d"), ("e", "t"), ("d", "t")]
    scaled = ", ".join(
        f"CAST(CAST({src} AS DECIMAL(18,2)) * 100 AS BIGINT) AS {k}"
        for k, src in cols.items()
    )
    notnull = " AND ".join(f"{src} IS NOT NULL" for src in cols.values())
    # HUGEINT wraps the OPERANDS (mirror of the Spark side's
    # DECIMAL-before-multiply): a BIGINT*BIGINT per-row product
    # overflows at scaled |v| >= ~3e9
    moments = ", ".join(
        [f"CAST(COUNT(*) AS HUGEINT) AS n"]
        + [f"CAST(SUM({k}) AS HUGEINT) AS s_{k}" for k in cols]
        + [f"SUM(CAST({k} AS HUGEINT) * {k}) AS ss_{k}" for k in cols]
        + [f"SUM(CAST({a} AS HUGEINT) * {b}) AS sp_{a}_{b}" for a, b in pairs]
    )

    def corr(a: str, b: str) -> str:
        return (
            f"CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
            f" / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)))"
        )

    unions = "\n    UNION ALL ".join(
        f"SELECT '{cols[a]}' AS col_a, '{cols[b]}' AS col_b,"
        f" CAST(n AS BIGINT) AS n, {corr(a, b)} AS corr FROM m"
        for a, b in pairs
    )
    return f"""
    WITH s AS (SELECT {scaled} FROM lineitem WHERE {notnull}),
    m AS (SELECT {moments} FROM s)
    {unions}
    """


@register(
    "q100_correlation_matrix",
    _correlation_oracle(),
    description="Exact Pearson correlation matrix over the lineitem "
    "numeric columns (operators/profiling.py correlation_matrix): all "
    "pairwise moments accumulate in ONE partial-aggregable pass — "
    "inputs rendered exact via fixed-point DECIMAL (never "
    "floor(double*scale): 0.29*100 is 28.999...), sums ride "
    "DECIMAL(38,0)/HUGEINT, and the final r is one pinned IEEE "
    "sequence over exact integers, so both engines agree "
    "bit-for-bit. The profiling question after q54's per-column "
    "facts: which columns move together",
    tags=("profile", "agg"),
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.operators.profiling import correlation_matrix

    # scan fan-out (q98's reasoning): 15 decimal aggregates per row
    # are CPU work a 3-row-group file serializes onto 3 cores
    # (measured 1.0 s -> 0.65 s at sf0.1)
    li = t(spark, sf, "lineitem").repartition("l_orderkey")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"], decimals=2
    )


# --------------------------------------------------------------------- q103
def _url_parsing_oracle() -> str:
    """DuckDB rendering of the url scalar family: string_split /
    list_position have the exact Spark split / array_position
    semantics (1-based, 0 when absent, out-of-bounds index -> NULL is
    guarded on both sides because negative indexes count from the
    END in both engines)."""

    def seg(marker: str, off: int) -> str:
        return f"""
        CASE WHEN list_position(parts, '{marker}') > 0
              AND list_position(parts, '{marker}') + ({off}) >= 1
              AND list_position(parts, '{marker}') + ({off}) <= len(parts)
             THEN parts[list_position(parts, '{marker}') + ({off})]
        END"""

    return f"""
    WITH raw AS (
        SELECT p_partkey AS key,
               CASE p_partkey % 7
                 WHEN 0 THEN 'https://www.geckoterminal.com/chain' || CAST(p_partkey % 5 AS VARCHAR) || '/pools/0xgt' || CAST(p_partkey AS VARCHAR)
                 WHEN 1 THEN 'check this https://dexscreener.com/chain' || CAST(p_partkey % 5 AS VARCHAR) || '/0xds' || CAST(p_partkey AS VARCHAR) || '?utm_source=tg'
                 WHEN 2 THEN 'https://www.dextools.io/app/en/chain' || CAST(p_partkey % 5 AS VARCHAR) || '/pair-explorer/0xdt' || CAST(p_partkey AS VARCHAR)
                 WHEN 3 THEN 'https://www.coingecko.com/en/coins/token-' || CAST(p_partkey AS VARCHAR)
                 WHEN 4 THEN 'https://www.coingecko.com/id/koin_koin/token-' || CAST(p_partkey AS VARCHAR)
                 WHEN 5 THEN 'no link here #' || CAST(p_partkey AS VARCHAR)
                 ELSE 'visit geckoterminal.com/solana/pools/0xgt' || CAST(p_partkey AS VARCHAR) || '?ref=tw'
               END AS link_text
        FROM part
    ),
    cleaned AS (
        SELECT key,
               regexp_replace(regexp_extract(trim(link_text), '(\\S+)$', 1),
                              '\\?.*$', '') AS url
        FROM raw
    ),
    split AS (
        SELECT key, url, string_split(url, '/') AS parts FROM cleaned
    )
    SELECT key,
           CASE WHEN url LIKE '%geckoterminal%' THEN 'geckoterminal'
                WHEN url LIKE '%dexscreener%' THEN 'dexscreener'
                WHEN url LIKE '%dextools%' THEN 'dextools'
                WHEN url LIKE '%coingecko%' THEN 'coingecko'
                ELSE 'other' END AS source,
           CASE WHEN url LIKE '%geckoterminal%' THEN ({seg('pools', -1)})
                WHEN url LIKE '%dexscreener%' THEN ({seg('dexscreener.com', 1)})
                WHEN url LIKE '%dextools%' THEN ({seg('pair-explorer', -1)})
           END AS chain,
           CASE WHEN url LIKE '%geckoterminal%' THEN ({seg('pools', 1)})
                WHEN url LIKE '%dexscreener%' THEN ({seg('dexscreener.com', 2)})
                WHEN url LIKE '%dextools%' THEN ({seg('pair-explorer', 1)})
                WHEN url LIKE '%coingecko%' THEN
                     COALESCE(({seg('coins', 1)}), ({seg('www.coingecko.com', 2)}))
           END AS token_ref,
           regexp_extract(url, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]+)', 1) AS host
    FROM split
    """


@register(
    "q103_url_parsing",
    _url_parsing_oracle(),
    description="URL-parsing scalar family (functions/scalars.py "
    "url_clean/url_host/url_segment_near/parse_call_url), porting the "
    "user-submitted-link triage of community_calls_processing.py:679-743: "
    "last whitespace token, query-string strip, source classification "
    "in reference branch order, and chain/pool/coin-id extraction by "
    "position relative to marker path segments — including the "
    "www-anchored fallback for locale-prefixed coingecko URLs. Pure "
    "column expressions over a deterministic 7-shape link corpus "
    "(every branch + junk + bare-host arms carry rows)",
    tags=("scalar",),
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    from etl_pipelines_spark.functions.scalars import parse_call_url, url_host

    key = F.col("p_partkey")
    s = lambda c: c.cast("string")  # noqa: E731
    link = (
        F.when(key % 7 == 0, F.concat(F.lit("https://www.geckoterminal.com/chain"), s(key % 5), F.lit("/pools/0xgt"), s(key)))
        .when(key % 7 == 1, F.concat(F.lit("check this https://dexscreener.com/chain"), s(key % 5), F.lit("/0xds"), s(key), F.lit("?utm_source=tg")))
        .when(key % 7 == 2, F.concat(F.lit("https://www.dextools.io/app/en/chain"), s(key % 5), F.lit("/pair-explorer/0xdt"), s(key)))
        .when(key % 7 == 3, F.concat(F.lit("https://www.coingecko.com/en/coins/token-"), s(key)))
        .when(key % 7 == 4, F.concat(F.lit("https://www.coingecko.com/id/koin_koin/token-"), s(key)))
        .when(key % 7 == 5, F.concat(F.lit("no link here #"), s(key)))
        .otherwise(F.concat(F.lit("visit geckoterminal.com/solana/pools/0xgt"), s(key), F.lit("?ref=tw")))
    )
    parsed = t(spark, sf, "part").select(
        key.alias("key"), parse_call_url(link).alias("p")
    )
    return parsed.select(
        "key",
        F.col("p.source").alias("source"),
        F.col("p.chain").alias("chain"),
        F.col("p.token_ref").alias("token_ref"),
        url_host(F.col("p.url")).alias("host"),
    )
