"""Declared relational query set Q01-Q17 (SURVEY.md §2.18).

Each query is a DataFrame program (the engine surface) with a DuckDB SQL
twin (the oracle). Column names/aliases are identical on both sides; all
aggregated doubles go through the integer-units path (see helpers).

Scale annotations assume the 100 TB layout: lineitem/orders are the big
fact tables (shuffle on join keys, AQE), nation/region/customer-dims are
broadcast-sized or bucket-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from icebug_spark.catalog import table
from icebug_spark.queries.helpers import (
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
    units,
    sql_units,
)


# Q01 — filter + project with computed column (predicate/column pushdown:
# the parquet scan must show PushedFilters on l_shipdate and a 5-column
# ReadSchema).
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1995-06-01")
            & (F.col("l_shipdate") < "1996-06-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            # prices are exact 2dp, discounts exact 2dp → the product is an
            # exact integer number of 1e-4 units; integer arithmetic + one
            # division gives bit-identical doubles in both engines (a
            # round() on the raw double product can straddle the half-ulp
            # boundary differently in Spark vs DuckDB).
            (
                units("l_extendedprice", 2) * (100 - units("l_discount", 2)) / 1e4
            ).alias("disc_price"),
        )
    )


Q01_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) / 10000.0 AS disc_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01'
  AND l_shipdate <  TIMESTAMP '1996-06-01'
"""


# Q02 — TPC-H Q1-style multi-key group-agg (map-side partial agg; 6 groups
# → single-stage reduce regardless of input size).
def q02(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.round(
                F.sum(units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
                / 1e4,
                4,
            ).alias("sum_disc_price"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q02_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_money_sum('l_quantity', 'sum_qty')},
       {sql_money_sum('l_extendedprice', 'sum_base_price')},
       ROUND(SUM({sql_units('l_extendedprice * (1 - l_discount)', 4)}) / 10000.0, 4)
           AS sum_disc_price,
       {sql_money_avg('l_quantity', 'avg_qty')},
       {sql_money_avg('l_extendedprice', 'avg_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# Q03 — 3-way join with agg. nation is tiny → broadcast; orders⋈customer
# is the real shuffle (both sides partitioned by custkey).
def q03(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            money_sum("o_totalprice", "revenue"),
            F.count(F.lit(1)).alias("num_orders"),
        )
    )


Q03_SQL = f"""
SELECT n_name, {sql_money_sum('o_totalprice', 'revenue')}, COUNT(*) AS num_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# Q04 — left join + null handling (customers with zero orders kept).
def q04(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(
                F.coalesce(F.sum(units("o_totalprice")), F.lit(0)) / 100.0, 2
            ).alias("total_spent"),
        )
    )


Q04_SQL = f"""
SELECT c_custkey, COUNT(o_orderkey) AS order_count,
       ROUND(COALESCE(SUM({sql_units('o_totalprice')}), 0) / 100.0, 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# Q05 — semi join: BUILDING-segment customers that have >= 1 order.
def q05(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "leftsemi")
        .select("c_custkey", "c_name")
    )


Q05_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# Q06 — anti join: parts never ordered.
def q06(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    li = table(spark, sf, "lineitem")
    return (
        p.join(li.select(F.col("l_partkey").alias("p_partkey")), "p_partkey", "left_anti")
        .select("p_partkey", "p_name")
    )


Q06_SQL = """
SELECT p_partkey, p_name
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


# Q07 — window row_number: top-3 orders per customer, ties broken by key.
def q07(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q07_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) t WHERE rn <= 3
"""


# Q08 — running sum per customer over orderdate (exact: integer cents in
# the window so segment-tree vs sequential accumulation cannot diverge).
def q08(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(units("o_totalprice")).over(w) / 100.0, 2).alias("running_total"),
    )


Q08_SQL = f"""
SELECT o_custkey, o_orderkey,
       ROUND(SUM({sql_units('o_totalprice')}) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 2)
           AS running_total
FROM orders
"""


# Q09 — rollup on (nation, mktsegment).
def q09(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum("c_acctbal", "total_acctbal"),
        )
    )


Q09_SQL = f"""
SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
       {sql_money_sum('c_acctbal', 'total_acctbal')}
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
"""


# Q10 — count distinct (exact distinct per group — a two-stage partial-
# aggregate shuffle; approx_count_distinct is the sketch path at scale).
def q10(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


Q10_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


# Q11 — union/intersect/except of customer key sets.
def q11(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    finished = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = urgent.intersect(finished).select(F.lit("both").alias("op"), "c_custkey")
    only_u = urgent.subtract(finished).select(F.lit("only_urgent").alias("op"), "c_custkey")
    only_f = finished.subtract(urgent).select(F.lit("only_finished").alias("op"), "c_custkey")
    return both.union(only_u).union(only_f)


Q11_SQL = """
WITH urgent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
     finished AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                  WHERE o_orderstatus = 'F')
SELECT 'both' AS op, c_custkey FROM (SELECT c_custkey FROM urgent INTERSECT SELECT c_custkey FROM finished)
UNION ALL
SELECT 'only_urgent', c_custkey FROM (SELECT c_custkey FROM urgent EXCEPT SELECT c_custkey FROM finished)
UNION ALL
SELECT 'only_finished', c_custkey FROM (SELECT c_custkey FROM finished EXCEPT SELECT c_custkey FROM urgent)
"""


# Q12 — order-by + limit top-k (total tie-break → deterministic; Spark
# executes as TakeOrderedAndProject, no full sort at scale).
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


Q12_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# Q13 — string functions.
def q13(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    return (
        c.where(F.col("c_name").like("%1%"))
        .select(
            "c_custkey",
            F.upper(F.col("c_name")).alias("uname"),
            F.substring(F.col("c_name"), 1, 8).alias("prefix"),
            F.length(F.col("c_name")).cast("long").alias("name_len"),
        )
    )


Q13_SQL = """
SELECT c_custkey, UPPER(c_name) AS uname, SUBSTR(c_name, 1, 8) AS prefix,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len
FROM customer WHERE c_name LIKE '%1%'
"""


# Q14 — date functions (UTC session tz ⇒ identical extraction).
def q14(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "revenue"),
        )
    )


Q14_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       COUNT(*) AS n_orders, {sql_money_sum('o_totalprice', 'revenue')}
FROM orders GROUP BY 1, 2
"""


# Q15 — math/case expressions: discounted-price buckets.
def q15(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    bucket = (
        F.when(val < 1000, "low").when(val < 5000, "mid").otherwise("high")
    )
    return (
        li.select(bucket.alias("bucket"), val.alias("val"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(units(F.col("val"), 4)) / 1e4, 4).alias("total_value"),
        )
    )


Q15_SQL = f"""
SELECT CASE WHEN l_extendedprice * (1 - l_discount) < 1000 THEN 'low'
            WHEN l_extendedprice * (1 - l_discount) < 5000 THEN 'mid'
            ELSE 'high' END AS bucket,
       COUNT(*) AS n_items,
       ROUND(SUM({sql_units('l_extendedprice * (1 - l_discount)', 4)}) / 10000.0, 4)
           AS total_value
FROM lineitem GROUP BY 1
"""


# Q16 — tumbling-window event counts (batch twin of the streaming op;
# window_start emitted as a string so both engines agree on dtype).
def q16(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(units("value", 6)) / 1e6, 6).alias("sum_value"),
        )
    )


Q16_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events,
       ROUND(SUM({sql_units('value', 6)}) / 1000000.0, 6) AS sum_value
FROM events GROUP BY 1, 2
"""


# Q17 — sessionization-lite: per-user session count with 30-min gap rule
# (lag window over epoch-microseconds — exact integer arithmetic).
def q17(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # testdata may carry ts as TIMESTAMP_NTZ; session tz is UTC so the cast is
    # an identity on wall-clock values and unix_micros stays exact integer math.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    flagged = e.select(
        "user_id",
        F.when(gap > 1800 * 1_000_000, 1).otherwise(0).alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("new_session") + 1).cast("long").alias("n_sessions"),
    )


Q17_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions
FROM flagged GROUP BY user_id
"""


RELATIONAL = {
    "q01_filter_project": (q01, Q01_SQL),
    "q02_groupagg_pricing": (q02, Q02_SQL),
    "q03_join3_nation_revenue": (q03, Q03_SQL),
    "q04_leftjoin_nulls": (q04, Q04_SQL),
    "q05_semijoin_segment": (q05, Q05_SQL),
    "q06_antijoin_unordered_parts": (q06, Q06_SQL),
    "q07_window_topn_per_customer": (q07, Q07_SQL),
    "q08_window_running_sum": (q08, Q08_SQL),
    "q09_rollup_nation_segment": (q09, Q09_SQL),
    "q10_count_distinct": (q10, Q10_SQL),
    "q11_set_ops": (q11, Q11_SQL),
    "q12_topk_orders": (q12, Q12_SQL),
    "q13_string_funcs": (q13, Q13_SQL),
    "q14_date_funcs": (q14, Q14_SQL),
    "q15_case_buckets": (q15, Q15_SQL),
    "q16_events_tumbling_hour": (q16, Q16_SQL),
    "q17_events_sessionization": (q17, Q17_SQL),
}
