"""Analytics coverage: window functions, set operations, rollup, sessionization,
incremental refresh equivalence, and heavier join trees for the bench.

The reference has none of these (SURVEY.md §2.5/§2.7/§2.12) — they're part of
the "complete engine" surface this repo adds, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions.util import one_partition
from pyspark.sql.window import Window

from ..operators.latest_state import incremental_refresh, latest_state
from ..sources.parquet import read_table


# ---------------------------------------------------------------------------
# window functions


def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() per group: top-3 orders by totalprice per customer."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (orders.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey", "o_totalprice", "rk"))


SQL_TOPK_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative sum: a new session starts after a
    >30 min gap; count sessions and events per user."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (ev.withColumn("new_sess", new_sess)
            .withColumn("session_id", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id")
            .agg(F.max("session_id").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


SQL_EVENT_SESSIONS = """
WITH g AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY event_id) AS gap
  FROM events
), s AS (
  SELECT user_id,
         SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM s GROUP BY user_id
"""


def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: running sum of event value per user in event order
    (last value per user = deterministic single row each)."""
    ev = read_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    run = ev.withColumn(
        "running", F.sum(F.col("value").cast("decimal(18,2)")).over(w))
    latest = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (run.withColumn("rn", F.row_number().over(latest))
            .filter("rn = 1")
            .select("user_id",
                    F.col("running").cast("double").alias("total")))


SQL_RUNNING_BALANCE = """
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# set operations


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / anti-join: customers with no order since 2001."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    return (cust.select("c_custkey")
            .exceptAll(orders.select(F.col("o_custkey").alias("c_custkey")))
            .distinct())


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
"""


def q_active_entity_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): all entity keys present in either side."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (cust.select(F.col("c_custkey").alias("k"))
            .union(orders.select(F.col("o_custkey").alias("k")))
            .distinct())


SQL_ACTIVE_ENTITY_UNION = """
SELECT c_custkey AS k FROM customer
UNION
SELECT o_custkey AS k FROM orders
"""


def q_nation_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nation keys hosting BOTH a customer and a supplier."""
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    return (cust.select(F.col("c_nationkey").alias("k"))
            .intersect(sup.select(F.col("s_nationkey").alias("k"))))


SQL_NATION_INTERSECT = """
SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey AS k FROM supplier
"""


def q_nation_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — the MULTISET difference (each nation key survives
    customer-count minus supplier-count times), which plain EXCEPT/
    anti-join can't express. Non-degenerate on every fixture SF because
    customers outnumber suppliers per nation."""
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    return (cust.select(F.col("c_nationkey").alias("k"))
            .exceptAll(sup.select(F.col("s_nationkey").alias("k"))))


SQL_NATION_EXCEPT = """
SELECT c_nationkey AS k FROM customer
EXCEPT ALL
SELECT s_nationkey AS k FROM supplier
"""


# ---------------------------------------------------------------------------
# rollup / grouping sets


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total."""
    li = read_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.sum(d2("l_extendedprice")).cast("double")
                 .alias("sum_price"),
                 F.count(F.lit(1)).alias("n")))


SQL_ROLLUP_REVENUE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): ROLLUP's missing grouping —
    the per-linestatus-across-all-flags slice."""
    li = read_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.sum(d2("l_extendedprice")).cast("double")
                 .alias("sum_price"),
                 F.count(F.lit(1)).alias("n")))


SQL_CUBE_REVENUE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# incremental refresh (T5) — equivalence with full recompaction


def q_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the changelog at offset 5000: compact the prefix, then fold in
    the suffix incrementally. Must equal one-shot compaction (the oracle
    computes the one-shot answer)."""
    from ..sources.changelog import events_changelog

    log = events_changelog(read_table(spark, sf_dir, "events")) \
        .select("topic", "key", "offset", "value")
    prior = latest_state(log.filter(F.col("offset") <= 5000),
                         drop_tombstones=False)
    delta = log.filter(F.col("offset") > 5000)
    out = incremental_refresh(prior, delta)
    return out.select("topic", "key", F.col("offset").alias("last_offset"))


SQL_INCREMENTAL_REFRESH = """
WITH log AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'melt.main.users_even'
              ELSE 'melt.main.users_odd' END AS topic,
         '{"user_id":' || user_id || '}' AS key,
         event_id AS off,
         CASE WHEN event_type = 'error' THEN NULL ELSE 'v' END AS value
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY topic, key
                               ORDER BY off DESC) AS rn
  FROM log
)
SELECT topic, key, off AS last_offset
FROM ranked WHERE rn = 1 AND value IS NOT NULL
"""


# ---------------------------------------------------------------------------
# heavier join tree (bench)


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-table join, revenue per nation. Dimension chain
    (region→nation→customer/supplier) broadcasts; the orders⋈lineitem
    shuffle dominates — exactly the shape AQE optimizes at scale."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # exact integer 1e-4 revenue units — the q_tpch_q1 long-cents proof
    # (r12): same columns, same product, same exact final conversion
    rev_4 = (F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
             * (F.lit(100).cast("long")
                - F.floor(F.col("l_discount") * 100.0 + 0.5)))
    return (region.filter(F.col("r_name") == "ASIA")
            .join(nation, nation.n_regionkey == region.r_regionkey)
            .join(cust, cust.c_nationkey == nation.n_nationkey)
            .join(orders, orders.o_custkey == cust.c_custkey)
            .join(li, li.l_orderkey == orders.o_orderkey)
            .join(sup, (li.l_suppkey == sup.s_suppkey)
                  & (sup.s_nationkey == nation.n_nationkey))
            .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
            .groupBy("n_name")
            .agg((F.sum(rev_4).cast("decimal(38,0)")
                  / F.lit(10_000).cast("decimal(7,0)"))
                 .cast("double").alias("revenue")))


SQL_TPCH_Q5 = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + aggregate — the pushdown showcase
    (all three predicates reach the parquet scan)."""
    li = read_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    return (li.filter(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
                & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24))
            .agg(F.sum(d2("l_extendedprice") * d2("l_discount"))
                 .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


SQL_TPCH_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): counts per
    event_type (5 hot keys over 10k+ rows — the shape where one reducer
    would otherwise take the whole table)."""
    from ..operators.skew import salted_count

    ev = read_table(spark, sf_dir, "events")
    return salted_count(ev, ["event_type"], entropy_col="event_id",
                        buckets=8, out="n")


SQL_SALTED_EVENT_COUNTS = """
SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
"""


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for every event, the user's most
    recent 'purchase' at or before it (sequence order = event_id, which is
    unique — no tie ambiguity). NULL when the user hasn't purchased yet."""
    from ..operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id",
                         F.col("event_id").alias("purchase_event_id"),
                         F.col("value").alias("purchase_value")))
    out = asof_join(left, purchases, on=["user_id"],
                    left_ts="event_id", right_ts="purchase_event_id")
    # -1 sentinels for "no purchase yet": NULL-bearing numeric columns
    # degrade to NaN-bearing float64 on the DuckDB side of the driver hash.
    return out.select(
        "event_id", "user_id",
        F.coalesce("purchase_event_id", F.lit(-1)).alias("purchase_event_id"),
        F.coalesce("purchase_value", F.lit(-1.0)).alias("purchase_value"))


SQL_ASOF_LAST_PURCHASE = """
SELECT e.event_id, e.user_id,
       coalesce(p.purchase_event_id, -1) AS purchase_event_id,
       coalesce(p.purchase_value, -1.0) AS purchase_value
FROM events e LEFT JOIN LATERAL (
  SELECT event_id AS purchase_event_id, value AS purchase_value
  FROM events p
  WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
    AND p.event_id <= e.event_id
  ORDER BY p.event_id DESC LIMIT 1
) p ON TRUE
"""


def q_purchase_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized range join (operators/range_join.py): every event that
    falls inside a ±12 h attribution window around a same-user purchase.
    Points and intervals both derive from events; the join runs as a plain
    (user_id, bucket) equi-join — no nested loop at any scale."""
    from ..operators.range_join import range_join

    ev = read_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")  # UTC session tz pinned by tune_session
    points = ev.select("event_id", "user_id", sec.alias("at_sec"))
    windows = (ev.filter(F.col("event_type") == "purchase")
               .select("user_id", F.col("event_id").alias("ref_id"),
                       (sec - 43200).alias("lo"), (sec + 43200).alias("hi")))
    out = range_join(points, windows, point_col="at_sec",
                     start_col="lo", end_col="hi", on=["user_id"],
                     bucket_width=86400)
    return out.select(
        "event_id", "user_id", "ref_id",
        (F.col("at_sec") - F.col("lo")).cast("double").alias("offset_sec"))


SQL_PURCHASE_WINDOWS = """
SELECT e.event_id, e.user_id, w.ref_id,
       CAST(floor(epoch(e.ts)) - w.lo AS DOUBLE) AS offset_sec
FROM events e JOIN (
  SELECT user_id, event_id AS ref_id,
         floor(epoch(ts)) - 43200 AS lo, floor(epoch(ts)) + 43200 AS hi
  FROM events WHERE event_type = 'purchase') w
ON e.user_id = w.user_id
   AND floor(epoch(e.ts)) >= w.lo AND floor(epoch(e.ts)) <= w.hi
"""


def q_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascade (operators/rollup.py): hourly event
    aggregates per type, then DAILY re-aggregated from the hourly level —
    the raw table is scanned once; the daily pass reads 24 rows/key/day.
    Output unions both resolutions with a level tag."""
    from ..operators.rollup import cascade_rollup

    ev = read_table(spark, sf_dir, "events")
    src = ev.select("ts", "event_type",
                    F.col("value").cast("decimal(18,6)").alias("v"))
    levels = cascade_rollup(
        src, "ts", ["event_type"],
        {"sum_value": ("v", "sum"), "n": ("v", "count"),
         "max_value": ("v", "max")},
        widths=[3600, 86400])
    proj = lambda df, tag: df.select(
        F.lit(tag).alias("level"),
        F.unix_timestamp("bucket_ts").alias("bucket_epoch"),
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        "n",
        F.col("max_value").cast("double").alias("max_value"))
    return proj(levels[3600], "hour").unionByName(proj(levels[86400], "day"))


SQL_TIME_BUCKET_ROLLUP = """
WITH hourly AS (
  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket_epoch,
         event_type,
         SUM(CAST(value AS DECIMAL(18,6))) AS sum_value,
         COUNT(value) AS n,
         MAX(CAST(value AS DECIMAL(18,6))) AS max_value
  FROM events GROUP BY 1, 2)
SELECT 'hour' AS level, bucket_epoch, event_type,
       CAST(sum_value AS DOUBLE) AS sum_value, n,
       CAST(max_value AS DOUBLE) AS max_value
FROM hourly
UNION ALL
SELECT 'day' AS level,
       CAST(floor(bucket_epoch / 86400) * 86400 AS BIGINT) AS bucket_epoch,
       event_type,
       CAST(SUM(sum_value) AS DOUBLE) AS sum_value,
       CAST(SUM(n) AS BIGINT) AS n,
       CAST(MAX(max_value) AS DOUBLE) AS max_value
FROM hourly GROUP BY 2, 3
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS semi-join — orders placed in 1997 having at
    least one line shipped after the order date, counted by priority."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    late = li.join(o, li.l_orderkey == o.o_orderkey) \
             .filter(F.col("l_shipdate") > F.col("o_orderdate")) \
             .select("l_orderkey")
    qualified = o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
    return (qualified.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


SQL_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral shipping volume between two nations by
    year (supplier nation ≠ customer nation, both ∈ {0, 1})."""
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(n1, sup.s_nationkey == F.col("s_nk"))
            .join(n2, cust.c_nationkey == F.col("c_nk"))
            .filter(F.col("s_nk").isin(0, 1) & F.col("c_nk").isin(0, 1)
                    & (F.col("s_nk") != F.col("c_nk")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(d2("l_extendedprice") * (one - d2("l_discount")))
                 .cast("double").alias("revenue")))


SQL_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey IN (0, 1) AND n2.n_nationkey IN (0, 1)
  AND n1.n_nationkey <> n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by returned-goods revenue in one
    quarter (deterministic tiebreak on custkey)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # exact integer 1e-4 revenue units — the q_tpch_q1 long-cents proof
    # (r12): same columns, same product, same exact final conversion
    rev_4 = (F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
             * (F.lit(100).cast("long")
                - F.floor(F.col("l_discount") * 100.0 + 0.5)))
    return (cust
            .join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .filter((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
                    & (F.col("l_returnflag") == "R"))
            .groupBy("c_custkey", "c_name")
            .agg((F.sum(rev_4).cast("decimal(38,0)")
                  / F.lit(10_000).cast("decimal(7,0)"))
                 .cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: conditional aggregation — per linestatus, how many
    1997-shipped lines belong to high- vs low-priority orders."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).cast("long")
                 .alias("low_line_count")))


SQL_TPCH_Q12 = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share — ratio of two exact decimal
    sums, divided in double (deterministic: one division of exact values)."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    rev = d2("l_extendedprice") * (one - d2("l_discount"))
    return (li.join(part, li.l_partkey == part.p_partkey)
            .filter((F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
            .agg((F.sum(F.when(F.col("p_type") == "PROMO", rev)
                        .otherwise(F.lit(0).cast("decimal(18,4)")))
                  .cast("double") * 100.0
                  / F.sum(rev).cast("double")).alias("promo_revenue_pct")))


SQL_TPCH_Q14 = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2))
               - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
     AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond rollup: (returnflag), (linestatus), and grand
    total in one pass, with grouping-id disambiguation."""
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_rf,
       CAST(grouping(l_linestatus) AS INT) AS g_ls,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: exact COUNT(DISTINCT) + multi-distinct in one
    grouped pass (machinery the reference lacks entirely, SURVEY §2.4)."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("distinct_users"),
                 F.countDistinct((F.col("user_id") % 4)).alias("distinct_parts"),
                 F.count(F.lit(1)).alias("n")))


SQL_DISTINCT_COUNTS = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(DISTINCT user_id % 4) AS distinct_parts,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch (functions/sketches.py) beside the exact
    control: per event_type, exact COUNT(DISTINCT user_id), the k=16
    sketch's estimate, and its kth-min hash (the sketch state). The
    estimate is floor()ed integer-exact math, so it oracle-checks —
    unlike engine-specific HLL."""
    from ..functions.sketches import kmv_estimate, kmv_sketch

    ev = read_table(spark, sf_dir, "events")
    sk = kmv_estimate(kmv_sketch(ev, ["event_type"], "user_id", k=16))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return (exact.join(sk, "event_type")
            .select("event_type", "exact_distinct", "kmv_est",
                    F.col("kth").alias("kth_hash")))


# 12-hex-char md5 fold (48-bit) — DuckDB restatement of Spark
# conv(substr(md5(x),1,12),16,10); same fold as pipeline_suite._hex_int_sql
# at doubled width.
def _hex12_sql(expr: str) -> str:
    return ("list_reduce(list_transform(string_split_regex("
            f"substr(md5({expr}), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(a,b) -> a*16+b)")


SQL_KMV_DISTINCT = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         {_hex12_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
sk AS (
  SELECT event_type, COUNT(*) AS n_mins, MAX(h) AS kth
  FROM r WHERE rn <= 16 GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT e.event_type, e.exact_distinct,
       CAST(CASE WHEN sk.n_mins < 16 THEN sk.n_mins
                 ELSE floor(15.0 * 281474976710656.0 / sk.kth)
            END AS BIGINT) AS kmv_est,
       sk.kth AS kth_hash
FROM exact e JOIN sk USING (event_type)
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog on the portable md5 hash (functions/sketches.py
    hll_registers/hll_estimate) beside exact controls — three branches
    chosen to pin BOTH estimator regimes at the sf0.01 gate:
    per-event_type user_id (~150 distinct, raw HLL regime), global
    o_custkey (~1500 distinct, deep raw regime), and global event_type
    (5 distinct, linear-counting regime). s_scaled is the exact BIGINT
    register fold; hll_e4 the 1e-4-units estimate — even the estimate
    hash-matches DuckDB because every input to it is deterministic
    (see the sketches.py design note)."""
    from ..functions.sketches import hll_estimate, hll_registers

    ev = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")

    def branch(df, keys, value, kind, key_expr):
        est = hll_estimate(hll_registers(df, keys, value), keys)
        agg = df.groupBy(*keys).agg(
            F.countDistinct(value).alias("exact_distinct")) if keys \
            else df.agg(F.countDistinct(value).alias("exact_distinct"))
        joined = est.join(agg, keys) if keys else est.crossJoin(agg)
        return joined.select(F.lit(kind).alias("kind"),
                             key_expr.alias("key"), "n_zero_regs",
                             "s_scaled", "hll_e4", "exact_distinct")

    by_type = branch(ev, ["event_type"], "user_id", "by_type",
                     F.col("event_type"))
    cust = branch(orders, [], "o_custkey", "global", F.lit("o_custkey"))
    lc = branch(ev, [], "event_type", "lc", F.lit("event_type"))
    return by_type.unionByName(cust).unionByName(lc)


# DuckDB restatement of hll_parts: 12-bit md5 prefix mod 64 for the
# register, 48-bit substream for rho = 49 - bitlength (bin() renders
# minimal on both engines). All float literals CAST AS DOUBLE — DuckDB
# parses bare decimals as DECIMAL, which would change the arithmetic.
def _hll_branch_sql(table: str, value: str, keys: str, kind: str,
                    key_expr: str) -> str:
    h3 = ("list_reduce(list_transform(string_split_regex("
          f"substr(md5({value}), 1, 3), ''), "
          "c -> instr('0123456789abcdef', c) - 1), (a,b) -> a*16+b)")
    h12 = ("list_reduce(list_transform(string_split_regex("
           f"substr(md5({value}), 4, 12), ''), "
           "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
           "(a,b) -> a*16+b)")
    kcols = f"{keys}, " if keys else ""
    kgroup = f"GROUP BY {keys}" if keys else ""
    raw = ("CAST(2904.064 AS DOUBLE) * (CAST(562949953421312 AS DOUBLE)"
           " / CAST(s_scaled AS DOUBLE))")
    return f"""
WITH h AS (
  SELECT {kcols}{h3} % 64 AS reg,
         CASE WHEN {h12} = 0 THEN 49
              ELSE 49 - length(bin({h12})) END AS rho
  FROM {table}
), r AS (
  SELECT {kcols}reg, MAX(rho) AS rho FROM h GROUP BY {kcols}reg
), s AS (
  SELECT {kcols}CAST(64 - COUNT(*) AS BIGINT) AS n_zero_regs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - rho))
              + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 49) AS BIGINT)
           AS s_scaled
  FROM r {kgroup}
), x AS (
  SELECT {kcols}COUNT(DISTINCT {value}) AS exact_distinct
  FROM {table} {kgroup}
)
SELECT '{kind}' AS kind, {key_expr} AS key, n_zero_regs, s_scaled,
       CAST(round(CASE WHEN {raw} <= CAST(160.0 AS DOUBLE)
                        AND n_zero_regs > 0
                       THEN CAST(64.0 AS DOUBLE) * ln(CAST(64.0 AS DOUBLE)
                            / CAST(n_zero_regs AS DOUBLE))
                       ELSE {raw} END
                  * CAST(10000.0 AS DOUBLE)) AS BIGINT) AS hll_e4,
       exact_distinct
FROM s {'JOIN x USING (' + keys + ')' if keys else 'CROSS JOIN x'}
"""


SQL_HLL_DISTINCT = "\nUNION ALL\n".join(
    f"SELECT * FROM (\n{b}\n) AS hb{i}" for i, b in enumerate([
        _hll_branch_sql("events", "CAST(user_id AS VARCHAR)", "event_type",
                        "by_type", "event_type"),
        _hll_branch_sql("orders", "CAST(o_custkey AS VARCHAR)", "",
                        "global", "'o_custkey'"),
        _hll_branch_sql("events", "CAST(event_type AS VARCHAR)", "",
                        "lc", "'event_type'"),
    ]))


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (functions/hypothesis.py) per event
    type: does the event-value distribution differ between the two
    md5-split user variants (the same reproducible 50/50 assignment as
    q_ab_test)? The rank-based complement to the z-test's proportions —
    doubled U statistics and the Σ(t³−t) tie term are exact BIGINTs, the
    tie-corrected z rounds once to 1e-6."""
    from ..functions.hypothesis import mann_whitney_u
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("grp"))
    return mann_whitney_u(labeled, ["event_type"], "cents", "grp")


_MW_HASH = ("list_reduce(list_transform(string_split_regex("
            "substr(md5(CAST(user_id AS VARCHAR)), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(a,b) -> a*16+b) % 2")

SQL_MANN_WHITNEY = f"""
WITH pts AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         CAST({_MW_HASH} AS INT) AS grp
  FROM events
),
r AS (
  SELECT event_type, v, grp,
         rank() OVER (PARTITION BY event_type ORDER BY v) AS rk
  FROM pts
),
t AS (
  SELECT event_type, v, COUNT(*) AS tn
  FROM pts GROUP BY 1, 2
),
agg AS (
  SELECT r.event_type,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN grp = 0 THEN 2 * rk + tn - 1 ELSE 0 END)
              AS BIGINT) AS r0_2x
  FROM r JOIN t ON t.event_type = r.event_type AND t.v = r.v
  GROUP BY 1
),
tc AS (
  SELECT event_type,
         CAST(SUM(tn * tn * tn - tn) AS BIGINT) AS tie_cube
  FROM t GROUP BY 1
),
s AS (
  SELECT a.event_type, n0, n1, r0_2x - n0 * (n0 + 1) AS u0_2x, tie_cube
  FROM agg a JOIN tc USING (event_type)
),
z AS (
  SELECT *,
    CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(12.0 AS DOUBLE)
      * ((CAST(n0 + n1 AS DOUBLE) + CAST(1.0 AS DOUBLE))
         - CAST(tie_cube AS DOUBLE)
           / (CAST(n0 + n1 AS DOUBLE)
              * (CAST(n0 + n1 AS DOUBLE) - CAST(1.0 AS DOUBLE))))
      AS var
  FROM s
)
SELECT event_type, n0, n1, u0_2x,
       2 * n0 * n1 - u0_2x AS u1_2x, tie_cube,
       CAST(round(CASE WHEN var > 0
                       THEN (CAST(u0_2x AS DOUBLE)
                             - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                            / (CAST(2.0 AS DOUBLE) * sqrt(var))
                       ELSE CAST(0.0 AS DOUBLE) END
                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS z_e6
FROM z
"""


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (functions/hypothesis.py) per
    event type between the two md5 user variants — the parametric
    complement to q_mann_whitney on the same cohorts. Counts/sums are
    exact BIGINTs; t (1e-4) and the Welch-Satterthwaite dof (1e-2) are
    pinned IEEE expressions rounded once."""
    from ..functions.hypothesis import welch_ttest
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("grp"))
    return welch_ttest(labeled, ["event_type"], "cents", "grp")


SQL_WELCH_TTEST = f"""
WITH pts AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         CAST({_MW_HASH} AS INT) AS grp
  FROM events
),
a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN grp = 0 THEN v ELSE 0 END) AS BIGINT) AS sum0,
         CAST(SUM(CASE WHEN grp = 1 THEN v ELSE 0 END) AS BIGINT) AS sum1,
         CAST(SUM(CASE WHEN grp = 0 THEN v * v ELSE 0 END) AS BIGINT)
           AS ssq0,
         CAST(SUM(CASE WHEN grp = 1 THEN v * v ELSE 0 END) AS BIGINT)
           AS ssq1
  FROM pts GROUP BY 1
),
v AS (
  SELECT *,
    (CAST(ssq0 AS DOUBLE)
     - CAST(sum0 AS DOUBLE) * sum0 / CAST(n0 AS DOUBLE))
      / (CAST(n0 AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS var0,
    (CAST(ssq1 AS DOUBLE)
     - CAST(sum1 AS DOUBLE) * sum1 / CAST(n1 AS DOUBLE))
      / (CAST(n1 AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS var1
  FROM a
),
w AS (
  SELECT *, var0 / CAST(n0 AS DOUBLE) + var1 / CAST(n1 AS DOUBLE) AS se2
  FROM v
)
SELECT event_type, n0, n1, sum0, sum1,
  CAST(round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se2 > 0
    THEN (CAST(sum0 AS DOUBLE) / CAST(n0 AS DOUBLE)
          - CAST(sum1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / sqrt(se2)
    ELSE 0.0 END * CAST(10000.0 AS DOUBLE)) AS BIGINT) AS t_e4,
  CAST(round(CASE WHEN n0 >= 2 AND n1 >= 2 AND se2 > 0
    THEN se2 * se2
         / ((var0 / CAST(n0 AS DOUBLE)) * (var0 / CAST(n0 AS DOUBLE))
              / (CAST(n0 AS DOUBLE) - CAST(1.0 AS DOUBLE))
            + (var1 / CAST(n1 AS DOUBLE)) * (var1 / CAST(n1 AS DOUBLE))
              / (CAST(n1 AS DOUBLE) - CAST(1.0 AS DOUBLE)))
    ELSE 0.0 END * CAST(100.0 AS DOUBLE)) AS BIGINT) AS df_e2
FROM w
"""


def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid mixture-SPRT readout (functions/hypothesis.py
    msprt_two_sample, Johari et al. KDD 2017) per event type between
    the md5 variants — the sequential test that survives continuous
    peeking, beside the fixed-horizon z/t tests; plus the fixed-horizon
    MDE the platform reports for experiment sizing."""
    from ..functions.hypothesis import msprt_two_sample
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("grp"))
    return msprt_two_sample(labeled, ["event_type"], "cents", "grp")


SQL_MSPRT = f"""
WITH pts AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         CAST({_MW_HASH} AS INT) AS grp
  FROM events
),
a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN grp = 0 THEN v ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN grp = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS ssq,
         CAST(SUM(v) AS BIGINT) AS s
  FROM pts GROUP BY 1
),
d AS (
  SELECT *,
    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS theta,
    (CAST(ssq AS DOUBLE)
     - CAST(s AS DOUBLE) * s / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - CAST(1.0 AS DOUBLE))
      AS s2
  FROM a
),
w AS (
  SELECT *,
    s2 * (CAST(1.0 AS DOUBLE) / CAST(n0 AS DOUBLE)
          + CAST(1.0 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS vv,
    (n0 >= 2 AND n1 >= 2 AND s2 > 0) AS ok
  FROM d
),
l AS (
  SELECT *,
    CAST(0.5 AS DOUBLE) * ln(vv / (vv + CAST(10000.0 AS DOUBLE)))
      + theta * theta * CAST(10000.0 AS DOUBLE)
        / (CAST(2.0 AS DOUBLE) * vv * (vv + CAST(10000.0 AS DOUBLE)))
      AS log_lam
  FROM w
)
SELECT event_type, n0, n1,
  CAST(CASE WHEN n0 > 0 AND n1 > 0
            THEN round(theta * CAST(10000.0 AS DOUBLE)) ELSE 0 END
       AS BIGINT) AS theta_e4,
  CAST(CASE WHEN ok THEN round(vv * 1e9) ELSE 0 END AS BIGINT) AS v_e9,
  CAST(round(CASE WHEN ok
                  THEN least(CAST(1.0 AS DOUBLE), exp(-log_lam))
                  ELSE CAST(1.0 AS DOUBLE) END
             * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS p_e6,
  CAST(round(CASE WHEN ok THEN CAST(2.8016 AS DOUBLE) * sqrt(vv)
                  ELSE CAST(0.0 AS DOUBLE) END
             * CAST(10000.0 AS DOUBLE)) AS BIGINT) AS mde_e4
FROM l
"""


def q_spearman_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (functions/hypothesis.py spearman_corr)
    per event type between event value (cents) and event time (epoch
    seconds) — the monotone-drift readout: a nonzero rho says the
    metric is trending over the corpus window. Midranks handle the
    heavy value ties; the rank-product sums ride DECIMAL(38)."""
    from ..functions.hypothesis import spearman_corr

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.col("ts").cast("long").alias("sec"))
    return spearman_corr(base, ["event_type"], "cents", "sec")


SQL_SPEARMAN_DRIFT = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x,
         CAST(floor(epoch(ts)) AS BIGINT) AS y
  FROM events
),
r AS (
  SELECT event_type,
    2 * rank() OVER (PARTITION BY event_type ORDER BY x)
      + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
    2 * rank() OVER (PARTITION BY event_type ORDER BY y)
      + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS ry
  FROM base
),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(rx AS HUGEINT)) AS sx,
         SUM(CAST(ry AS HUGEINT)) AS sy,
         SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
         SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
         SUM(CAST(ry AS HUGEINT) * ry) AS syy
  FROM r GROUP BY 1
),
d AS (
  SELECT event_type, n,
    CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
    CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
    CAST(syy AS DOUBLE) * CAST(n AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
  FROM a
)
SELECT event_type, n,
  CAST(round(CASE WHEN vx > 0 AND vy > 0
                  THEN cov / sqrt(vx * vy) ELSE 0.0 END
             * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS rho_e6
FROM d
"""


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard (functions/hypothesis.py srm_check,
    Fabijan et al. KDD 2019) on the md5 variant split per event type —
    the validity check run BEFORE any experiment metric is read; a
    50/50 design that drifts means broken assignment, not a winning
    variant."""
    from ..functions.hypothesis import srm_check
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_type",
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("grp"))
    return srm_check(labeled, ["event_type"], "grp")


SQL_SRM_CHECK = f"""
WITH pts AS (
  SELECT event_type, CAST({_MW_HASH} AS INT) AS grp FROM events
),
a AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM pts GROUP BY 1
)
SELECT event_type, n0, n1,
  CAST(round(CASE WHEN n0 + n1 > 0 THEN
    CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
    / CAST(n0 + n1 AS DOUBLE) ELSE 0.0 END
    * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS chi2_e6,
  CAST(CASE WHEN CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n1 AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE) > 10.828
            THEN 1 ELSE 0 END AS INT) AS srm
FROM a
"""


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 difference-in-differences (functions/hypothesis.py
    diff_in_diff) per event type: md5-variant cohorts x pre/post halves
    of the corpus window — the causal workhorse that nets out both the
    cohort baseline and the common time trend; exact cell moments,
    did/se in 1e-4 pinned IEEE."""
    from ..functions.hypothesis import diff_in_diff
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    mid = ev.agg(((F.min(F.col("ts").cast("long"))
                   + F.max(F.col("ts").cast("long"))) / 2)
                 .alias("__mid"))
    base = (ev.crossJoin(F.broadcast(mid))
            .select("event_type",
                    F.round(F.col("value") * 100).cast("bigint")
                    .alias("cents"),
                    (kmv_hash(F.col("user_id")) % 2).cast("int")
                    .alias("grp"),
                    (F.col("ts").cast("long").cast("double")
                     >= F.col("__mid")).cast("int").alias("period")))
    return diff_in_diff(base, ["event_type"], "cents", "grp", "period")


SQL_DID = f"""
WITH mid AS (
  SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
          + MAX(CAST(floor(epoch(ts)) AS BIGINT))) / 2 AS m
  FROM events
),
base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         CAST({_MW_HASH} AS INT) AS g,
         CASE WHEN CAST(CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE)
                   >= m THEN 1 ELSE 0 END AS p
  FROM events CROSS JOIN mid
),
cell AS (
  SELECT event_type, g, p, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS ssq
  FROM base GROUP BY 1, 2, 3
),
mv AS (
  SELECT event_type,
    COUNT(DISTINCT CASE WHEN g IN (0, 1) AND p IN (0, 1)
                        THEN g * 2 + p END) AS n_cells,
    SUM(CASE WHEN g = 1 AND p = 1
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END)
    - SUM(CASE WHEN g = 1 AND p = 0
               THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END)
    - SUM(CASE WHEN g = 0 AND p = 1
               THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END)
    + SUM(CASE WHEN g = 0 AND p = 0
               THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0.0 END)
      AS did,
    sqrt(SUM(CASE WHEN n >= 2 THEN
        ((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
          / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
        / CAST(n AS DOUBLE) ELSE 0.0 END)) AS se
  FROM cell GROUP BY 1
)
SELECT c.event_type, CAST(c.g AS INT) AS grp, CAST(c.p AS INT) AS period,
       c.n, c.s AS sum_v,
       CAST(CASE WHEN mv.n_cells >= 4
                 THEN round(mv.did * CAST(10000.0 AS DOUBLE))
                 ELSE 0 END AS BIGINT) AS did_e4,
       CAST(CASE WHEN mv.n_cells >= 4
                 THEN round(mv.se * CAST(10000.0 AS DOUBLE))
                 ELSE 0 END AS BIGINT) AS se_e4
FROM cell c JOIN mv ON mv.event_type = c.event_type
"""


def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Gini coefficient of per-user spend
    (functions/heavy.py gini_concentration) — the Lorenz-curve
    concentration summary beside the skew diagnostic's head counts:
    how unequal is the value distribution across users."""
    from ..functions.heavy import gini_concentration

    ev = read_table(spark, sf_dir, "events")
    base = ev.select("event_type", "user_id",
                     F.round(F.col("value") * 100).cast("bigint")
                     .alias("cents"))
    return gini_concentration(base, ["event_type"], "user_id", "cents")


SQL_GINI_SPEND = """
WITH per AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, user_id) AS rn
  FROM per
),
a AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_entities,
         CAST(SUM(x) AS BIGINT) AS total,
         SUM(CAST(rn AS HUGEINT) * x) AS srx
  FROM r GROUP BY 1
)
SELECT event_type, n_entities, total,
  CAST(CASE WHEN total > 0 THEN
    round((CAST(2.0 AS DOUBLE) * CAST(srx AS DOUBLE)
           - (CAST(n_entities AS DOUBLE) + CAST(1.0 AS DOUBLE))
             * CAST(total AS DOUBLE))
          / (CAST(n_entities AS DOUBLE) * CAST(total AS DOUBLE))
          * CAST(1000000.0 AS DOUBLE))
    ELSE 0 END AS BIGINT) AS gini_ppm
FROM a
"""


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (functions/hypothesis.py) per event
    type: is the share of high-value events (value >= 100) trending
    monotonically across ISO weekday 1..7? The ordered-category
    dose-response test beside chi2_weekday's unordered independence
    check — a weekly ramp that chi-square dilutes shows up as one
    signed z here."""
    from ..functions.hypothesis import cochran_armitage

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.dayofweek(F.col("ts")).alias("dow_raw"),
        (F.col("value") >= 100.0).cast("int").alias("hit"))
    # ISO weekday 1..7 from Spark's Sunday-1 dayofweek, matching
    # DuckDB's isodow — the chi2_weekday convention
    base = base.select(
        "event_type",
        F.when(F.col("dow_raw") == 1, F.lit(7))
        .otherwise(F.col("dow_raw") - 1).alias("isodow"), "hit")
    return cochran_armitage(base, ["event_type"], "isodow", "hit")


SQL_COCHRAN_ARMITAGE = """
WITH base AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS w,
         CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS y
  FROM events
),
cell AS (
  SELECT event_type, w, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(y) AS BIGINT) AS r_i
  FROM base GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(SUM(n_i) AS BIGINT) AS n_total,
         CAST(SUM(r_i) AS BIGINT) AS r_total,
         CAST(SUM(w * r_i) AS BIGINT) AS swr,
         CAST(SUM(w * n_i) AS BIGINT) AS swn,
         CAST(SUM(w * w * n_i) AS BIGINT) AS sw2n,
         COUNT(*) AS k
  FROM cell GROUP BY 1
),
z AS (
  SELECT event_type, n_total, r_total,
    CASE WHEN r_total > 0 AND r_total < n_total AND k >= 2
              AND (CAST(r_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                  * (CAST(1.0 AS DOUBLE)
                     - CAST(r_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                  * (CAST(sw2n AS DOUBLE)
                     - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)
                       / CAST(n_total AS DOUBLE)) > 0
    THEN (CAST(swr AS DOUBLE)
          - (CAST(r_total AS DOUBLE) / CAST(n_total AS DOUBLE))
            * CAST(swn AS DOUBLE))
         / sqrt((CAST(r_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                * (CAST(1.0 AS DOUBLE)
                   - CAST(r_total AS DOUBLE) / CAST(n_total AS DOUBLE))
                * (CAST(sw2n AS DOUBLE)
                   - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)
                     / CAST(n_total AS DOUBLE)))
    ELSE 0.0 END AS zz
  FROM tot
)
SELECT c.event_type, CAST(c.w AS INT) AS score, c.n_i, c.r_i,
       z.n_total, z.r_total,
       CAST(round(z.zz * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS z_e6
FROM cell c JOIN z ON z.event_type = c.event_type
"""


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (functions/hypothesis.py) per event type across
    THREE md5 user cohorts — the k-group generalization of
    q_mann_whitney (do any cohorts differ?). Per-group exact doubled
    rank sums; the tie-corrected H folds in group order over one
    bounded key row and rounds once to 1e-6."""
    from ..functions.hypothesis import kruskal_wallis
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (kmv_hash(F.col("user_id")) % 3).cast("int").alias("grp"))
    return kruskal_wallis(labeled, ["event_type"], "cents", "grp")


_KW_HASH = _MW_HASH.replace("% 2", "% 3")

SQL_KRUSKAL_WALLIS = f"""
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         CAST({_KW_HASH} AS INT) AS g
  FROM events
),
r AS (
  SELECT event_type, g,
    2 * rank() OVER (PARTITION BY event_type ORDER BY v)
      + COUNT(*) OVER (PARTITION BY event_type, v) - 1 AS r2x
  FROM base
),
pg AS (
  SELECT event_type, g, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(r2x) AS BIGINT) AS r2x
  FROM r GROUP BY 1, 2
),
tc AS (
  SELECT event_type, CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cube
  FROM (SELECT event_type, v, COUNT(*) AS t FROM base GROUP BY 1, 2)
  GROUP BY 1
),
one AS (
  SELECT pg.event_type,
         list_sort(list(struct_pack(g := g, n_g := n_g, r2x := r2x)))
           AS a,
         CAST(SUM(n_g) AS BIGINT) AS n
  FROM pg GROUP BY 1
),
hh AS (
  SELECT one.event_type, a, n, tie_cube,
    list_reduce(list_transform(a, x ->
        CAST(x.r2x AS DOUBLE) * CAST(x.r2x AS DOUBLE)
        / CAST(x.n_g AS DOUBLE)), (p, q) -> p + q)
      / CAST(4.0 AS DOUBLE) AS s
  FROM one JOIN tc ON tc.event_type = one.event_type
),
hv AS (
  SELECT event_type, a, tie_cube,
    CASE WHEN n >= 2
              AND (CAST(1.0 AS DOUBLE) - CAST(tie_cube AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) > 0
    THEN (CAST(12.0 AS DOUBLE)
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                                  + CAST(1.0 AS DOUBLE))) * s
          - CAST(3.0 AS DOUBLE) * (CAST(n AS DOUBLE)
                                   + CAST(1.0 AS DOUBLE)))
         / (CAST(1.0 AS DOUBLE) - CAST(tie_cube AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
    ELSE 0.0 END AS h
  FROM hh
)
SELECT event_type, CAST(x.g AS INT) AS grp, x.n_g AS n_g, x.r2x AS r2x,
       tie_cube,
       CAST(round(h * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS h_e6
FROM (SELECT event_type, tie_cube, h, unnest(a) AS x FROM hv)
"""


def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (functions/hypothesis.py) of order
    totals in cents — the forensic-accounting digit-law check (Benford
    1938, Nigrini's audit canon). Per digit: exact observed counts, the
    law's expected share as a ppm literal, and the χ² contribution in
    1e-6 units (sum the column for the 8-df statistic)."""
    from ..functions.hypothesis import benford_digits

    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    return benford_digits(vals, "cents")


def _benford_case() -> str:
    from ..functions.hypothesis import BENFORD_PPM
    return ("CASE digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in sorted(BENFORD_PPM.items()))
        + " END")


SQL_BENFORD_PRICES = f"""
WITH c AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n_obs
  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
  GROUP BY 1
),
dom AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
d AS (
  -- densified against the fixed 1..9 domain: an unobserved digit still
  -- contributes its full expected-count term to the statistic
  SELECT dom.digit, CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
         CAST(SUM(COALESCE(c.n_obs, 0)) OVER () AS BIGINT) AS n_total,
         CAST({_benford_case().replace('CASE digit',
                                       'CASE dom.digit')} AS BIGINT)
           AS exp_ppm
  FROM dom LEFT JOIN c ON c.digit = dom.digit
)
SELECT digit, n_obs, n_total, exp_ppm,
  CAST(round(CASE WHEN n_total > 0 THEN
    CAST(n_total AS DOUBLE)
    * (CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)
       - CAST(exp_ppm AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
    * (CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)
       - CAST(exp_ppm AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
    / (CAST(exp_ppm AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
    * CAST(1000000.0 AS DOUBLE) ELSE 0.0 END) AS BIGINT) AS chi2_e6
FROM d
"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve (functions/hypothesis.py) of
    time-to-first-big-purchase: per user, days from first activity to
    the first purchase event with value >= 130 (observed), right-
    censored at the corpus' last date otherwise — the threshold puts
    BOTH regimes in play at every SF (sf0.01: 88 observed / 62
    censored). n_risk/d/censored are exact integers; S(t) is the pinned
    ascending left-fold of IEEE factors, rounded once to 1e-6."""
    from ..functions.hypothesis import kaplan_meier

    ev = read_table(spark, sf_dir, "events")
    tagged = ev.withColumn(
        "big_purchase",
        (F.col("event_type") == "purchase") & (F.col("value") >= 130.0))
    return kaplan_meier(tagged, "user_id", "ts", "big_purchase")


_KM_PREFIX = ("CASE WHEN len(list_filter(a, y -> y.dur < x.dur)) = 0"
              " THEN 0 ELSE list_reduce(list_transform("
              "list_filter(a, y -> y.dur < x.dur), z -> z.n_all),"
              " (p, q) -> p + q) END")

SQL_KAPLAN_MEIER = f"""
WITH per AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' AND value >= 130.0
                  THEN CAST(ts AS DATE) END) AS tp,
         MAX(CAST(ts AS DATE)) AS t1
  FROM events GROUP BY 1
),
gm AS (SELECT MAX(t1) AS gmax FROM per),
r AS (
  SELECT date_diff('day', t0, COALESCE(tp, gmax)) AS dur,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS evt
  FROM per CROSS JOIN gm
),
g AS (
  SELECT dur, CAST(SUM(evt) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_all
  FROM r GROUP BY 1
),
one AS (
  SELECT list_sort(list(struct_pack(dur := dur, d := d,
                                    n_all := n_all))) AS a,
         CAST(SUM(n_all) AS BIGINT) AS total
  FROM g
),
f AS (
  SELECT a, total,
         list_transform(a, x -> CAST(1.0 AS DOUBLE)
           - CAST(x.d AS DOUBLE)
             / CAST(total - {_KM_PREFIX} AS DOUBLE)) AS factors
  FROM one
),
e AS (
  SELECT unnest(a) AS x, generate_subscripts(a, 1) AS i,
         a, total, factors
  FROM f
)
SELECT x.dur AS dur_days,
       CAST(total - CASE WHEN i = 1 THEN 0
                         ELSE list_reduce(
                           list_transform(a[1:i-1], y -> y.n_all),
                           (p, q) -> p + q) END AS BIGINT) AS n_risk,
       x.d AS d_evt,
       x.n_all - x.d AS n_censored,
       CAST(round(list_reduce(factors[1:i], (p, q) -> p * q)
                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS s_e6
FROM e
"""


def q_km_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant Kaplan-Meier curves (functions/hypothesis.py
    kaplan_meier with group_col): one INDEPENDENT product-limit curve
    per md5 user variant — the survival plot every experimentation
    readout shows beside log_rank's single test statistic. Censoring
    stays administrative at the GLOBAL study end, so the two curves are
    comparable."""
    from ..functions.hypothesis import kaplan_meier
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id", "ts",
        ((F.col("event_type") == "purchase")
         & (F.col("value") >= 130.0)).alias("big_purchase"),
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("variant"))
    return kaplan_meier(tagged, "user_id", "ts", "big_purchase",
                        group_col="variant")


SQL_KM_VARIANTS = f"""
WITH per AS (
  SELECT CAST({_hex12_sql("CAST(user_id AS VARCHAR)")} % 2 AS INT)
           AS variant,
         user_id, MIN(CAST(ts AS DATE)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' AND value >= 130.0
                  THEN CAST(ts AS DATE) END) AS tp,
         MAX(CAST(ts AS DATE)) AS t1
  FROM events GROUP BY 1, 2
),
gm AS (SELECT MAX(t1) AS gmax FROM per),
r AS (
  SELECT variant, date_diff('day', t0, COALESCE(tp, gmax)) AS dur,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS evt
  FROM per CROSS JOIN gm
),
g AS (
  SELECT variant, dur, CAST(SUM(evt) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_all
  FROM r GROUP BY 1, 2
),
one AS (
  SELECT variant,
         list_sort(list(struct_pack(dur := dur, d := d,
                                    n_all := n_all))) AS a,
         CAST(SUM(n_all) AS BIGINT) AS total
  FROM g GROUP BY 1
),
f AS (
  SELECT variant, a, total,
         list_transform(a, x -> CAST(1.0 AS DOUBLE)
           - CAST(x.d AS DOUBLE)
             / CAST(total - {_KM_PREFIX} AS DOUBLE)) AS factors
  FROM one
),
e AS (
  SELECT variant, unnest(a) AS x, generate_subscripts(a, 1) AS i,
         a, total, factors
  FROM f
)
SELECT variant, x.dur AS dur_days,
       CAST(total - CASE WHEN i = 1 THEN 0
                         ELSE list_reduce(
                           list_transform(a[1:i-1], y -> y.n_all),
                           (p, q) -> p + q) END AS BIGINT) AS n_risk,
       x.d AS d_evt,
       x.n_all - x.d AS n_censored,
       CAST(round(list_reduce(factors[1:i], (p, q) -> p * q)
                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS s_e6
FROM e
"""


def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (functions/timeseries.py acf) of the
    DAILY per-event-type count series at lags 1..7 — the seasonality
    readout run before picking forecast model orders (a weekly cycle
    spikes at lag 7). Series densified over the corpus span (missing
    days count 0); the biased estimator folds in index order over one
    bounded row per type and rounds once to 1e-6."""
    from ..functions.timeseries import acf

    events = read_table(spark, sf_dir, "events")
    return acf(events, "ts", ["event_type"], max_lag=7, width=86_400)


SQL_ACF_DAILY = """
WITH g AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 86400) * 86400 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
one AS (
  SELECT event_type, list_sort(list(struct_pack(b := b, n := n))) AS a,
         MIN(b) AS lo, MAX(b) AS hi
  FROM g GROUP BY 1
),
d AS (
  SELECT event_type,
    list_transform(range(lo, hi + 86400, 86400), t ->
      COALESCE(list_filter(a, x -> x.b = t)[1].n, 0)) AS xs
  FROM one
),
m AS (
  SELECT event_type, xs,
    list_reduce(list_transform(xs, x -> CAST(x AS DOUBLE)),
                (p, q) -> p + q) / CAST(len(xs) AS DOUBLE) AS mu
  FROM d
),
dn AS (
  SELECT event_type, xs, mu,
    list_reduce(list_transform(xs, x ->
        (CAST(x AS DOUBLE) - mu) * (CAST(x AS DOUBLE) - mu)),
      (p, q) -> p + q) AS den
  FROM m
),
l AS (
  SELECT event_type, xs, mu, den, unnest(range(1, 8)) AS lag FROM dn
)
SELECT event_type, CAST(lag AS INT) AS lag,
       CAST(len(xs) AS BIGINT) AS n_buckets,
       CAST(round(CASE WHEN den > 0 AND len(xs) > lag THEN
         list_reduce(list_transform(range(1, len(xs) - lag + 1), t ->
             (CAST(xs[CAST(t AS INT)] AS DOUBLE) - mu)
             * (CAST(xs[CAST(t + lag AS INT)] AS DOUBLE) - mu)),
           (p, q) -> p + q) / den
         ELSE 0.0 END * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS acf_e6
FROM l
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier gate (functions/timeseries.py mad_outliers): per
    event type, flag event values beyond 3 consistency-scaled median
    absolute deviations — the robust complement to anomaly_zscore's
    mean/sigma window. Lower-median rank picks and an integer-scaled
    comparison keep every output exact."""
    from ..functions.timeseries import mad_outliers

    ev = read_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    return mad_outliers(cents, "cents", ["event_type"], "event_id")


SQL_MAD_OUTLIERS = """
WITH pts AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
r AS (
  SELECT event_type, event_id, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM pts
),
med AS (
  SELECT event_type, x AS med FROM r WHERE rk = (n + 1) // 2
),
dev AS (
  SELECT r.event_type, r.event_id, abs(r.x - m.med) AS d, m.med, r.n
  FROM r JOIN med m USING (event_type)
),
dr AS (
  SELECT event_type, d, med, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY d, event_id) AS rd
  FROM dev
),
mad AS (
  SELECT event_type, d AS mad FROM dr WHERE rd = (n + 1) // 2
)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(dev.med) AS BIGINT) AS med,
       CAST(MIN(mad.mad) AS BIGINT) AS mad,
       CAST(SUM(CASE WHEN dev.d * 10000 > mad.mad * 44478
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY 1
"""


def q_chi2_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test (functions/hypothesis.py):
    is event type independent of ISO weekday? Exact contingency counts
    and margins; per-cell (O−E)²/E contributions in 1e-6 units — sum
    for the 24-df statistic. The goodness-of-fit (Benford) and
    independence views complete the chi-square family."""
    from ..functions.hypothesis import chi2_independence

    ev = read_table(spark, sf_dir, "events")
    isodow = (((F.dayofweek("ts") + 5) % 7) + 1).cast("int")
    return chi2_independence(
        ev.select("event_type", isodow.alias("isodow")),
        "event_type", "isodow")


SQL_CHI2_WEEKDAY = """
WITH pts AS (
  SELECT event_type, CAST(isodow(ts) AS INT) AS isodow FROM events
),
cells AS (SELECT event_type, isodow, COUNT(*) AS n_obs
          FROM pts GROUP BY 1, 2),
r AS (SELECT event_type, COUNT(*) AS row_tot FROM pts GROUP BY 1),
c AS (SELECT isodow, COUNT(*) AS col_tot FROM pts GROUP BY 1),
t AS (SELECT COUNT(*) AS n_total FROM pts),
dense AS (
  SELECT r.event_type, c.isodow, r.row_tot, c.col_tot,
         COALESCE(cells.n_obs, 0) AS n_obs
  FROM r CROSS JOIN c
  LEFT JOIN cells ON cells.event_type = r.event_type
                 AND cells.isodow = c.isodow
)
SELECT dense.event_type, dense.isodow,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST(row_tot AS BIGINT) AS row_tot,
       CAST(col_tot AS BIGINT) AS col_tot,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(round(
         (CAST(n_obs AS DOUBLE)
          - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
            / CAST(n_total AS DOUBLE))
         * (CAST(n_obs AS DOUBLE)
            - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
              / CAST(n_total AS DOUBLE))
         / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
            / CAST(n_total AS DOUBLE))
         * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS chi2_e6
FROM dense CROSS JOIN t
"""


def q_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test (functions/hypothesis.py, Mantel 1966):
    do the two md5-variant user cohorts (the q_ab_test split) differ in
    time-to-first-big-purchase survival? Per-duration risk sets, events
    and the hypergeometric E/V terms, plus the dur=-1 summary row
    carrying the 1-df chi-square statistic — the survival-curve
    comparison beside kaplan_meier's single-curve estimate."""
    from ..functions.hypothesis import log_rank
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id", "ts",
        ((F.col("event_type") == "purchase")
         & (F.col("value") >= 130.0)).alias("big_purchase"),
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("variant"))
    return log_rank(tagged, "user_id", "ts", "big_purchase", "variant")


_LR_PRE0 = ("CASE WHEN len(list_filter(a, y -> y.dur < x.dur)) = 0"
            " THEN 0 ELSE list_reduce(list_transform("
            "list_filter(a, y -> y.dur < x.dur), z -> z.a0),"
            " (p, q) -> p + q) END")
_LR_PRE1 = _LR_PRE0.replace("z.a0", "z.a1")

SQL_LOG_RANK = f"""
WITH per AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' AND value >= 130.0
                  THEN CAST(ts AS DATE) END) AS tp,
         MAX(CAST(ts AS DATE)) AS t1,
         MIN(CAST({_MW_HASH} AS INT)) AS g
  FROM events GROUP BY 1
),
gm AS (SELECT MAX(t1) AS gmax FROM per),
r AS (
  SELECT date_diff('day', t0, COALESCE(tp, gmax)) AS dur,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS evt, g
  FROM per CROSS JOIN gm
),
gt AS (
  SELECT dur,
         CAST(SUM(CASE WHEN g = 0 AND evt = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS d0,
         CAST(SUM(CASE WHEN g = 1 AND evt = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1
  FROM r GROUP BY 1
),
one AS (
  SELECT list_sort(list(struct_pack(dur := dur, d0 := d0, d1 := d1,
                                    a0 := a0, a1 := a1))) AS a,
         CAST(SUM(a0) AS BIGINT) AS t0, CAST(SUM(a1) AS BIGINT) AS t1
  FROM gt
),
eq AS (SELECT unnest(a) AS x, a, t0, t1 FROM one),
e AS (
  SELECT x, t0 - {_LR_PRE0} AS n0r, t1 - {_LR_PRE1} AS n1r FROM eq
),
d AS (
  SELECT x.dur AS dur_days,
         CAST(n0r AS BIGINT) AS n0_risk, CAST(n1r AS BIGINT) AS n1_risk,
         x.d0 AS d0, x.d1 AS d1,
         CAST(x.d0 + x.d1 AS DOUBLE) * CAST(n0r AS DOUBLE)
           / CAST(n0r + n1r AS DOUBLE) AS e0,
         CASE WHEN n0r + n1r > 1 THEN
           CAST(x.d0 + x.d1 AS DOUBLE)
           * (CAST(n0r AS DOUBLE) / CAST(n0r + n1r AS DOUBLE))
           * (CAST(n1r AS DOUBLE) / CAST(n0r + n1r AS DOUBLE))
           * (CAST(n0r + n1r AS DOUBLE) - CAST(x.d0 + x.d1 AS DOUBLE))
           / (CAST(n0r + n1r AS DOUBLE) - CAST(1.0 AS DOUBLE))
         ELSE CAST(0.0 AS DOUBLE) END AS v,
         CAST(x.d0 AS DOUBLE) AS od0
  FROM e
)
SELECT dur_days, n0_risk, n1_risk, d0, d1,
       CAST(round(e0 * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS e0_e6,
       CAST(round(v * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS v_e6
FROM d
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       CAST(CASE WHEN SUM(v) > 0
                 THEN round((SUM(od0) - SUM(e0)) * (SUM(od0) - SUM(e0))
                            / SUM(v) * CAST(1000000.0 AS DOUBLE))
                 ELSE 0.0 END AS BIGINT)
FROM d
"""


def q_dbscan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based DBSCAN (functions/density.py, Ester et al. KDD 1996 /
    He et al. MR-DBSCAN 2011): density clustering of customers on
    (total spend cents, order count) — core points in dense grid
    regions, border points attached to the nearest core cluster, the
    rest labeled noise. Spend sums through DECIMAL so the integer
    features are engine-exact; every later decision is integer/string
    algebra. Cell sizes (25e6 cents × 2 orders, min_pts 40) are tuned
    to the fixture's density so core, border AND noise are all
    populated at sf0.01."""
    from ..functions.density import dbscan_grid

    orders = read_table(spark, sf_dir, "orders")
    pts = (orders.groupBy("o_custkey")
           .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 * 100).cast("bigint").alias("x"),
                F.count(F.lit(1)).alias("y"))
           .select(F.col("o_custkey").alias("id"), "x", "y"))
    return dbscan_grid(pts, gx=25_000_000, gy=2, min_pts=40)


SQL_DBSCAN_CUSTOMERS = """
WITH RECURSIVE f AS MATERIALIZED (
  SELECT o_custkey AS id,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
cells AS MATERIALIZED (
  SELECT x // 25000000 AS cx, y // 2 AS cy, COUNT(*) AS n
  FROM f GROUP BY 1, 2
),
contrib AS (
  SELECT cx + dx AS tx, cy + dy AS ty, n
  FROM cells,
       (SELECT unnest([-1, 0, 1]) AS dx),
       (SELECT unnest([-1, 0, 1]) AS dy)
),
neigh AS (SELECT tx AS cx, ty AS cy, SUM(n) AS nn FROM contrib
          GROUP BY 1, 2),
core AS MATERIALIZED (
  SELECT c.cx, c.cy,
         CAST(c.cx AS VARCHAR) || ':' || CAST(c.cy AS VARCHAR) AS ckey
  FROM cells c JOIN neigh USING (cx, cy) WHERE nn >= 40
),
edges AS MATERIALIZED (
  SELECT a.ckey AS src, b.ckey AS dst
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
),
reach AS (
  SELECT src AS node, src AS reached FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.reached
),
labels AS MATERIALIZED (
  SELECT node AS ckey, MIN(reached) AS cluster_id FROM reach GROUP BY 1
),
core_lab AS MATERIALIZED (
  SELECT core.cx, core.cy, l.cluster_id
  FROM core JOIN labels l USING (ckey)
),
noncore AS (SELECT c.cx, c.cy FROM cells c ANTI JOIN core USING (cx, cy)),
border AS (
  SELECT n.cx, n.cy, MIN(cl.cluster_id) AS cluster_id
  FROM noncore n JOIN core_lab cl
    ON abs(cl.cx - n.cx) <= 1 AND abs(cl.cy - n.cy) <= 1
  GROUP BY 1, 2
),
assign AS MATERIALIZED (
  SELECT cx, cy, cluster_id, 'core' AS role FROM core_lab
  UNION ALL
  SELECT cx, cy, cluster_id, 'border' AS role FROM border
)
SELECT f.id, COALESCE(a.role, 'noise') AS role,
       COALESCE(a.cluster_id, '') AS cluster_id
FROM f LEFT JOIN assign a
  ON a.cx = f.x // 25000000 AND a.cy = f.y // 2
"""


def q_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sample quantiles (functions/sketches.py bottomk_*):
    per order status, quartiles of o_totalprice estimated from the
    deterministic 64-row hash-bottom sample, beside the sample size.
    The estimate is an integer rank into real data values — exact
    arithmetic, so even the APPROXIMATION oracle-checks (the KMV
    argument applied to quantiles)."""
    from ..functions.sketches import bottomk_quantiles, bottomk_sample

    orders = read_table(spark, sf_dir, "orders")
    sample = bottomk_sample(orders, ["o_orderstatus"], "o_orderkey",
                            "o_totalprice", k=64)
    return (bottomk_quantiles(sample, ["o_orderstatus"])
            .select("o_orderstatus", "n_sample", "q_25", "q_50", "q_75"))


SQL_BOTTOMK_QUANTILES = f"""
WITH h AS (
  SELECT o_orderstatus, {_hex12_sql("CAST(o_orderkey AS VARCHAR)")} AS h,
         o_totalprice AS v
  FROM orders
),
r AS (
  SELECT o_orderstatus, v,
         row_number() OVER (PARTITION BY o_orderstatus ORDER BY h, v)
           AS rn
  FROM h
),
s AS (
  SELECT o_orderstatus, list_sort(list(v)) AS vs,
         CAST(COUNT(*) AS BIGINT) AS n_sample
  FROM r WHERE rn <= 64 GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_sample,
  vs[CAST(floor(0.25 * (n_sample - 1)) AS INT) + 1] AS q_25,
  vs[CAST(floor(0.5 * (n_sample - 1)) AS INT) + 1] AS q_50,
  vs[CAST(floor(0.75 * (n_sample - 1)) AS INT) + 1] AS q_75
FROM s
"""


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/scd.py pit_join): every event-fact
    looks up the SCD2 dimension version valid AT ITS OWN change version —
    the feature-store label-leakage guard. Dimension and facts derive
    from the same events-as-changes convention as the scd2 branch of
    cdc_replay; output aggregates fact counts per matched dimension
    version, so every interval assignment participates in the hash."""
    from ..operators.scd import pit_join, scd2_intervals

    events = read_table(spark, sf_dir, "events")
    changes = events.select(
        (F.col("user_id") + 1).alias("c_custkey"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U").alias("sys_change_operation"),
        (F.col("event_id") + 1).alias("sys_change_version"))
    dim = scd2_intervals(changes, "c_custkey")
    facts = events.select((F.col("user_id") + 1).alias("c_custkey"),
                          (F.col("event_id") + 1).alias("at_v"))
    j = pit_join(facts, dim, "c_custkey", "at_v")
    return (j.groupBy("c_custkey", "valid_from", "is_current")
            .agg(F.count(F.lit(1)).alias("n_facts"),
                 F.max("at_v").alias("last_at")))


SQL_PIT_JOIN = """
WITH changes AS (
  SELECT user_id + 1 AS c_custkey,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS sys_change_operation,
         event_id + 1 AS sys_change_version
  FROM events
),
dim AS (
  SELECT c_custkey,
         sys_change_version AS valid_from,
         lead(sys_change_version) OVER (PARTITION BY c_custkey
                                        ORDER BY sys_change_version)
           AS valid_to,
         CAST(CASE WHEN lead(sys_change_version)
                          OVER (PARTITION BY c_custkey
                                ORDER BY sys_change_version) IS NULL
                    AND sys_change_operation <> 'D'
                   THEN 1 ELSE 0 END AS INTEGER) AS is_current
  FROM changes
  QUALIFY sys_change_operation <> 'D'
),
facts AS (
  SELECT user_id + 1 AS c_custkey, event_id + 1 AS at_v FROM events
)
SELECT f.c_custkey, d.valid_from, d.is_current,
       COUNT(*) AS n_facts, MAX(f.at_v) AS last_at
FROM facts f
JOIN dim d ON f.c_custkey = d.c_custkey
          AND f.at_v >= d.valid_from
          AND (d.valid_to IS NULL OR f.at_v < d.valid_to)
GROUP BY 1, 2, 3
"""


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom filter (functions/bloom.py): build over the
    even-user-id half of the event stream, probe with every real user
    PLUS a planted never-seen cohort (+100000 ids). Output = the filter's
    words themselves (hash-checking the whole bit array) stacked with the
    membership summary: probes / exact members / bloom positives / false
    positives — the FPR evidence. All integers."""
    from ..functions.bloom import bloom_build, bloom_might_contain

    ev = read_table(spark, sf_dir, "events")
    members = ev.filter(F.col("user_id") % 2 == 0).select("user_id")
    bloom = bloom_build(members, "user_id")
    real = ev.select("user_id").distinct()
    probes = real.unionByName(
        real.select((F.col("user_id") + 100000).alias("user_id")))
    verdicts = bloom_might_contain(bloom, probes, "user_id")
    exact = (members.distinct()
             .select(F.col("user_id").alias("item"),
                     F.lit(1).alias("is_member")))
    j = (verdicts.join(exact, "item", "left")
         .select("item", F.col("might_contain").cast("int").alias("mc"),
                 F.coalesce("is_member", F.lit(0)).alias("m")))
    summary = j.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("m").alias("n_members"),
        F.sum("mc").alias("n_bloom_pos"),
        F.sum(F.when((F.col("mc") == 1) & (F.col("m") == 0), 1)
              .otherwise(0)).alias("n_false_pos"),
        F.sum(F.when((F.col("mc") == 0) & (F.col("m") == 1), 1)
              .otherwise(0)).alias("n_false_neg"))
    srows = summary.selectExpr(
        "stack(5, 'n_probes', n_probes, 'n_members', n_members,"
        " 'bloom_pos', n_bloom_pos, 'false_pos', n_false_pos,"
        " 'false_neg', n_false_neg) AS (part, v)") \
        .select("part", F.lit(-1).cast("bigint").alias("k"),
                F.col("v").cast("bigint").alias("v"))
    wrows = bloom.select(F.lit("word").alias("part"),
                         F.col("word").cast("bigint").alias("k"),
                         F.col("bits").alias("v"))
    return wrows.unionByName(srows)


def _bloom_sql() -> str:
    from ..functions.bloom import BLOOM_BITS, BLOOM_DEPTH
    h = _hex12_sql("CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
    return f"""
WITH members AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 0
),
mpos AS (
  SELECT ({h}) % {BLOOM_BITS} AS p
  FROM members, (SELECT unnest(generate_series(0, {BLOOM_DEPTH - 1}))
                 AS r)
),
words AS (
  SELECT CAST(p // 32 AS INT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM mpos GROUP BY 1
),
real AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT user_id FROM real
  UNION ALL SELECT user_id + 100000 FROM real
),
ppos AS (
  SELECT user_id, ({h}) % {BLOOM_BITS} AS p
  FROM probes, (SELECT unnest(generate_series(0, {BLOOM_DEPTH - 1}))
                AS r)
),
hits AS (
  SELECT pp.user_id,
         CASE WHEN (coalesce(w.bits, 0)
                    & (CAST(1 AS BIGINT) << CAST(pp.p % 32 AS INT))) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM ppos pp LEFT JOIN words w ON w.word = CAST(pp.p // 32 AS INT)
),
verdicts AS (
  SELECT user_id AS item,
         CASE WHEN SUM(hit) = {BLOOM_DEPTH} THEN 1 ELSE 0 END AS mc
  FROM hits GROUP BY user_id
),
joined AS (
  SELECT v.item, v.mc,
         CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END AS m
  FROM verdicts v LEFT JOIN members m ON m.user_id = v.item
),
summary AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(m) AS BIGINT) AS n_members,
         CAST(SUM(mc) AS BIGINT) AS n_bloom_pos,
         CAST(SUM(CASE WHEN mc = 1 AND m = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos,
         CAST(SUM(CASE WHEN mc = 0 AND m = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_neg
  FROM joined
)
SELECT 'word' AS part, CAST(word AS BIGINT) AS k, bits AS v FROM words
UNION ALL
SELECT unnest(['n_probes', 'n_members', 'bloom_pos', 'false_pos',
               'false_neg']) AS part,
       CAST(-1 AS BIGINT) AS k,
       unnest([n_probes, n_members, n_bloom_pos, n_false_pos,
               n_false_neg]) AS v
FROM summary
"""


SQL_BLOOM_FILTER = _bloom_sql()


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix (functions/sketches.py kmv_overlap_matrix):
    pairwise distinct-user overlap estimates for every event-type pair
    from per-type sketches built in ONE scan, beside the exact
    intersections — the m²-pairs-one-scan sketch-reuse pitch."""
    from ..functions.sketches import kmv_overlap_matrix

    ev = read_table(spark, sf_dir, "events")
    est = kmv_overlap_matrix(ev, "event_type", "user_id", k=16)
    tu = ev.select("event_type", "user_id").distinct()
    a = tu.select(F.col("event_type").alias("ka"),
                  F.col("user_id").alias("u"))
    b = tu.select(F.col("event_type").alias("kb"),
                  F.col("user_id").alias("u"))
    exact = (a.join(b, "u").filter(F.col("ka") < F.col("kb"))
             .groupBy("ka", "kb")
             .agg(F.count(F.lit(1)).alias("exact_inter")))
    return (est.join(exact, ["ka", "kb"], "left")
            .select("ka", "kb", "j_num", "n_union_mins", "union_est",
                    "inter_est",
                    F.coalesce("exact_inter", F.lit(0)).cast("bigint")
                    .alias("exact_inter")))


SQL_KMV_OVERLAP = f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS kk,
         {_hex12_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
mins AS (
  SELECT kk, h,
         row_number() OVER (PARTITION BY kk ORDER BY h) AS rn
  FROM hashed QUALIFY rn <= 16
),
keys AS (SELECT DISTINCT kk FROM mins),
kp AS (
  SELECT a.kk AS ka, b.kk AS kb FROM keys a, keys b WHERE a.kk < b.kk
),
u AS (
  SELECT DISTINCT ka, kb, h FROM (
    SELECT kp.ka, kp.kb, m.h FROM kp JOIN mins m ON m.kk = kp.ka
    UNION ALL
    SELECT kp.ka, kp.kb, m.h FROM kp JOIN mins m ON m.kk = kp.kb
  ) t
),
um AS (
  SELECT ka, kb, h,
         row_number() OVER (PARTITION BY ka, kb ORDER BY h) AS rn
  FROM u QUALIFY rn <= 16
),
tagged AS (
  SELECT um.ka, um.kb, um.h,
         CASE WHEN ma.h IS NOT NULL AND mb.h IS NOT NULL
              THEN 1 ELSE 0 END AS in_both
  FROM um
  LEFT JOIN mins ma ON ma.kk = um.ka AND ma.h = um.h
  LEFT JOIN mins mb ON mb.kk = um.kb AND mb.h = um.h
),
agg AS (
  SELECT ka, kb, CAST(COUNT(*) AS BIGINT) AS n_union_mins,
         CAST(SUM(in_both) AS BIGINT) AS j_num, MAX(h) AS kth
  FROM tagged GROUP BY 1, 2
),
est AS (
  SELECT ka, kb, j_num, n_union_mins,
    CAST(CASE WHEN n_union_mins < 16 THEN n_union_mins
              ELSE floor(15.0 * 281474976710656.0 / kth) END AS BIGINT)
      AS union_est
  FROM agg
),
tu AS (SELECT DISTINCT event_type, user_id FROM events),
exact AS (
  SELECT a.event_type AS ka, b.event_type AS kb,
         CAST(COUNT(*) AS BIGINT) AS exact_inter
  FROM tu a JOIN tu b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT e.ka, e.kb, e.j_num, e.n_union_mins, e.union_est,
       CAST(CASE WHEN e.n_union_mins < 16 THEN e.j_num
                 ELSE (e.j_num * e.union_est) // 16 END AS BIGINT)
         AS inter_est,
       CAST(coalesce(x.exact_inter, 0) AS BIGINT) AS exact_inter
FROM est e LEFT JOIN exact x ON x.ka = e.ka AND x.kb = e.kb
"""


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (functions/graph.py kcore, Matula-Beck /
    Montresor-et-al synchronous peeling) over the customer↔supplier
    bipartite graph at k=24, 4 unrolled rounds — the dense-region
    extractor beside pagerank/triangles/butterflies."""
    from ..functions.graph import kcore

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("a"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("b"))
             .distinct())
    return kcore(pairs, "a", "b", k=24, rounds=4)


def _kcore_sql(k: int = 24, rounds: int = 4) -> str:
    # every e{r} is referenced 3x by round r+1 (two degree scans + the
    # restriction join); WITHOUT the MATERIALIZED hint DuckDB may inline
    # each reference, re-deriving the orders⋈lineitem base 3^rounds
    # times — at sf0.1 that spilled until the DISK filled. Materialize
    # each round once (the Spark side's localCheckpoint analogue).
    ctes = ["""e0 AS MATERIALIZED (
  SELECT DISTINCT least(o_custkey, (-l_suppkey - 1)) AS u,
         greatest(o_custkey, (-l_suppkey - 1)) AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey <> (-l_suppkey - 1)
)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS (
  SELECT n, COUNT(*) AS d FROM (
    SELECT u AS n FROM e{r - 1} UNION ALL SELECT v AS n FROM e{r - 1}
  ) t GROUP BY n
),
a{r} AS (SELECT n FROM d{r} WHERE d >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{r - 1} e
  JOIN a{r} x ON x.n = e.u
  JOIN a{r} y ON y.n = e.v
)""")
    return f"""
WITH {','.join(ctes)},
fd AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e{rounds}
    UNION ALL SELECT v AS node FROM e{rounds}
  ) t GROUP BY node
)
SELECT node, deg FROM fd WHERE deg >= {k}
"""


SQL_KCORE = _kcore_sql()


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (functions/graph.py adamic_adar):
    top-50 supplier pairs scored through shared customers, neighbor
    weights integer-scaled (round(1e9/ln deg)) so the pair score is an
    order-independent BIGINT sum; wedge generation rides the salted
    hub-skew guard shared with the butterfly census."""
    from ..functions.graph import adamic_adar

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("l_suppkey").alias("supp"),
                     F.col("o_custkey").alias("cust")))
    return adamic_adar(edges, "supp", "cust", k=50)


SQL_ADAMIC_ADAR = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS w, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
deg AS (SELECT w, COUNT(*) AS d FROM e GROUP BY w),
wt AS (
  SELECT w, CAST(round(1e9 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w_e9
  FROM deg WHERE d >= 2
),
prs AS (
  SELECT a.s AS u, b.s AS v, a.w
  FROM e a JOIN e b ON a.w = b.w AND a.s < b.s
),
agg AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(w_e9) AS BIGINT) AS aa_e9
  FROM prs JOIN wt USING (w)
  GROUP BY u, v
)
SELECT u, v, n_common, aa_e9,
       CAST(row_number() OVER (ORDER BY aa_e9 DESC, u, v) AS INT) AS rank
FROM agg QUALIFY rank <= 50
"""


def q_kmv_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop neighborhood-size estimation (functions/graph.py kmv_reach,
    HyperBall-with-KMV) over the customer↔supplier bipartite graph;
    output restricted to supplier nodes (node < 0; suppliers pack as
    -l_suppkey - 1, disjoint from custkeys at ANY scale)."""
    from ..functions.graph import kmv_reach

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("a"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("b"))
             .distinct())
    return (kmv_reach(pairs, "a", "b", radius=2, k=16)
            .filter(F.col("node") < 0))


def _kmv_reach_sql(radius: int = 2, k: int = 16) -> str:
    # m{r} is referenced twice by round r+1 (carry + propagate) —
    # MATERIALIZED per the kcore exponential-inlining lesson
    h = _hex12_sql("CAST(src AS VARCHAR)")
    ctes = [f"""e0 AS MATERIALIZED (
  SELECT o_custkey AS src, (-l_suppkey - 1) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  UNION
  SELECT (-l_suppkey - 1) AS src, o_custkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
m0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, {h} AS h FROM e0
)"""]
    for r in range(1, radius + 1):
        ctes.append(f"""p{r} AS (
  SELECT e.dst AS node, m.h FROM e0 e JOIN m{r - 1} m ON m.node = e.src
),
u{r} AS (
  SELECT DISTINCT node, h FROM (
    SELECT node, h FROM m{r - 1} UNION ALL SELECT node, h FROM p{r}
  ) t
),
m{r} AS MATERIALIZED (
  SELECT node, h FROM (
    SELECT node, h, row_number() OVER (PARTITION BY node ORDER BY h)
      AS rn FROM u{r}
  ) t WHERE rn <= {k}
)""")
    return f"""
WITH {','.join(ctes)},
sk AS (
  SELECT node, COUNT(*) AS n_mins, MAX(h) AS kth
  FROM m{radius} GROUP BY node
)
SELECT node, CAST(n_mins AS BIGINT) AS n_mins, kth,
       CAST(CASE WHEN n_mins < {k} THEN n_mins
                 ELSE floor({float(k - 1)!r} * 281474976710656.0 / kth)
            END AS BIGINT) AS reach
FROM sk WHERE node < 0
"""


SQL_KMV_REACH = _kmv_reach_sql()


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (functions/fuzzy.py, Gravano et al. VLDB
    2001): 200 customer names with one planted substitution each,
    matched back to the originals at edit distance <= 2 via the q-gram
    count prefilter + levenshtein verification."""
    from ..functions.fuzzy import fuzzy_match

    cust = (read_table(spark, sf_dir, "customer")
            .orderBy("c_custkey").limit(200)
            .select("c_custkey", "c_name"))
    pos = (F.col("c_custkey") % 8 + 4).cast("int")
    typos = cust.select(
        (F.col("c_custkey") + 100000).alias("t_id"),
        F.concat(F.expr("substr(c_name, 1, cast(c_custkey % 8 + 3"
                        " as int))"),
                 F.lit("~"),
                 F.col("c_name").substr(pos + 1, F.lit(1000)))
        .alias("t_name"))
    pairs = fuzzy_match(typos, cust, "t_id", "t_name",
                        "c_custkey", "c_name", q=3, max_dist=2)
    # reciprocal best match — the entity-RESOLUTION step on top of the
    # candidate pairs: keep is_best=1 iff the pair is each side's rank-1
    # by (lev asc, shared desc, id asc); deterministic total order
    wt = Window.partitionBy("t_id").orderBy(
        F.asc("lev"), F.desc("shared_grams"), F.asc("c_custkey"))
    wc = Window.partitionBy("c_custkey").orderBy(
        F.asc("lev"), F.desc("shared_grams"), F.asc("t_id"))
    return (pairs
            .withColumn("rt", F.row_number().over(wt))
            .withColumn("rc", F.row_number().over(wc))
            .select("t_id", "c_custkey", "shared_grams", "lev",
                    ((F.col("rt") == 1) & (F.col("rc") == 1)).cast("int")
                    .alias("is_best")))


SQL_FUZZY_MATCH = """
WITH cust AS (
  SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 200
),
typos AS (
  SELECT c_custkey + 100000 AS t_id,
         substr(c_name, 1, CAST(c_custkey % 8 + 3 AS INT)) || '~' ||
         substr(c_name, CAST(c_custkey % 8 + 4 AS INT) + 1, 1000)
           AS t_name
  FROM cust
),
-- sentinel padding (Gravano et al.'s own formulation, the r5 ADVICE
-- fix): q-1 begin/end markers so strings shorter than q still gram.
-- The Spark side's prefix filter + short-string direct path generate a
-- candidate SUPERSET of every pair passing the final predicates, so
-- the oracle states the SEMANTICS directly: all pairs with
-- levenshtein <= 2 and the distinct-gram count bound — quadratic is
-- fine at oracle scale (200 x 200)
lp AS (
  SELECT t_id, t_name,
         list_distinct(list_transform(
           range(1, length(p) - 1), i -> substr(p, i, 3))) AS gl
  FROM (SELECT t_id, t_name,
               repeat(chr(1), 2) || t_name || repeat(chr(2), 2) AS p
        FROM typos) t
),
rp AS (
  SELECT c_custkey, c_name,
         list_distinct(list_transform(
           range(1, length(p) - 1), i -> substr(p, i, 3))) AS gr
  FROM (SELECT c_custkey, c_name,
               repeat(chr(1), 2) || c_name || repeat(chr(2), 2) AS p
        FROM cust) t
),
verified AS (
  SELECT t_id, c_custkey,
         CAST(len(list_intersect(gl, gr)) AS BIGINT) AS shared_grams,
         CAST(levenshtein(t_name, c_name) AS INT) AS lev
  FROM lp, rp
  WHERE levenshtein(t_name, c_name) <= 2
    AND len(list_intersect(gl, gr)) >= greatest(len(gl), len(gr)) - 6
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY t_id
                       ORDER BY lev, shared_grams DESC, c_custkey) AS rt,
    row_number() OVER (PARTITION BY c_custkey
                       ORDER BY lev, shared_grams DESC, t_id) AS rc
  FROM verified
)
SELECT t_id, c_custkey, shared_grams, lev,
       CAST(CASE WHEN rt = 1 AND rc = 1 THEN 1 ELSE 0 END AS INT)
         AS is_best
FROM ranked
"""


def q_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality profile per event type: ISO-weekday counts
    (the 7-bin seasonal fingerprint every capacity/anomaly model
    baselines against) plus the peak weekday (max count, lowest-dow
    tie-break). Integer counts end to end; the ISO-dow normalization is
    the date-battery's Spark(1=Sun)/DuckDB(0=Sun) off-by-one guard."""
    ev = read_table(spark, sf_dir, "events")
    isodow = (((F.dayofweek("ts") + 5) % 7) + 1).cast("int")
    counts = (ev.groupBy("event_type", isodow.alias("isodow"))
              .agg(F.count(F.lit(1)).alias("n")))
    # lexicographic max of (n, -isodow, isodow): max count, ties to the
    # EARLIEST weekday — deterministic argmax without a window
    peak = (counts.groupBy("event_type")
            .agg(F.max(F.struct(F.col("n"), (-F.col("isodow"))
                                .alias("negd"), F.col("isodow")))
                 .alias("m"))
            .select("event_type", F.col("m.isodow").alias("isodow"),
                    F.col("m.n").alias("n")))
    return (counts.select(F.lit("dow").alias("part"), "event_type",
                          "isodow", "n")
            .unionByName(peak.select(F.lit("peak").alias("part"),
                                     "event_type", "isodow", "n")))


SQL_WEEKDAY_PROFILE = """
WITH counts AS (
  SELECT event_type, CAST(isodow(ts) AS INT) AS isodow,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
peak AS (
  SELECT event_type, isodow, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, isodow) AS rn
  FROM counts
)
SELECT 'dow' AS part, event_type, isodow, n FROM counts
UNION ALL
SELECT 'peak' AS part, event_type, isodow, n FROM peak WHERE rn = 1
"""


def q_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint monitor (functions/timeseries.py cusum_monitor,
    Page 1954) over hourly per-event-type counts — the persistent-shift
    detector beside the per-point z-score. The oracle restates the
    recurrence as a recursive CTE; identical IEEE fold order makes the
    unrounded intermediate series bit-equal."""
    from ..functions.timeseries import cusum_monitor

    events = read_table(spark, sf_dir, "events")
    return cusum_monitor(events, "ts", ["event_type"], 3600)


_CUSUM_STEP = "(CAST(r.x AS DOUBLE) - p.mu - 0.25 * p.mu)"

SQL_CUSUM_MONITOR = f"""
WITH RECURSIVE counts AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS i
  FROM counts
),
params AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu
  FROM counts GROUP BY 1
),
c AS (
  SELECT r.event_type, r.i,
         greatest(0.0, 0.0 + {_CUSUM_STEP}) AS s,
         greatest(0.0, greatest(0.0, 0.0 + {_CUSUM_STEP})) AS smax,
         CASE WHEN greatest(0.0, 0.0 + {_CUSUM_STEP}) > 4.0 * sqrt(p.mu)
              THEN 1 ELSE 0 END AS alarms
  FROM r JOIN params p USING (event_type) WHERE r.i = 1
  UNION ALL
  SELECT r.event_type, r.i,
         greatest(0.0, c.s + {_CUSUM_STEP}),
         greatest(c.smax, greatest(0.0, c.s + {_CUSUM_STEP})),
         c.alarms + CASE WHEN greatest(0.0, c.s + {_CUSUM_STEP})
                              > 4.0 * sqrt(p.mu)
                         THEN 1 ELSE 0 END
  FROM c
  JOIN r ON r.event_type = c.event_type AND r.i = c.i + 1
  JOIN params p ON p.event_type = r.event_type
),
last_i AS (SELECT event_type, MAX(i) AS mi FROM r GROUP BY 1)
SELECT c.event_type, p.n_buckets, round(p.mu, 9) AS mu,
       round(c.s, 9) AS s_final, round(c.smax, 9) AS s_max,
       c.alarms AS n_alarms
FROM c
JOIN last_i m ON m.event_type = c.event_type AND c.i = m.mi
JOIN params p ON p.event_type = c.event_type
"""


def q_match_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-matcher evaluation against the planted ground truth — the
    precision/recall row every record-linkage deployment reports
    (Fellegi-Sunter evaluation practice; see also Christen,
    *Data Matching*, 2012 ch. 7). The fuzzy fixture plants exactly one
    true mate per typo (t_id = c_custkey + 100000), so over the
    reciprocal-best matches:
        tp = best pairs that hit their mate, fp = best pairs that
        don't, fn = 200 - tp; precision/recall as exact ppm.
    One row; all integers."""
    pairs = q_fuzzy_match(spark, sf_dir)
    best = pairs.filter(F.col("is_best") == 1)
    # truth count = planted typos = the limited customer set's size (200
    # at sf >= 0.01; smaller fixtures have fewer — never hardcode it)
    n_truth = (read_table(spark, sf_dir, "customer")
               .orderBy("c_custkey").limit(200)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")))
    agg = best.agg(
        F.sum(F.when(F.col("t_id") - 100000 == F.col("c_custkey"),
                     1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(F.col("t_id") - 100000 == F.col("c_custkey"),
                     0).otherwise(1)).cast("bigint").alias("fp"))
    return (agg.crossJoin(F.broadcast(n_truth))
            .select(
                "tp", "fp", (F.col("n_truth") - F.col("tp")).alias("fn"),
                F.expr("CAST(tp * 1000000 div (tp + fp) AS BIGINT)")
                .alias("precision_e6"),
                F.expr("CAST(tp * 1000000 div n_truth AS BIGINT)")
                .alias("recall_e6")))


SQL_MATCH_QUALITY = f"""
WITH pairs AS ({SQL_FUZZY_MATCH}),
best AS (SELECT * FROM pairs WHERE is_best = 1),
agg AS (
  SELECT CAST(SUM(CASE WHEN t_id - 100000 = c_custkey THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN t_id - 100000 = c_custkey THEN 0 ELSE 1 END)
              AS BIGINT) AS fp
  FROM best
),
nt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth
  FROM (SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 200)
)
SELECT tp, fp, CAST(n_truth - tp AS BIGINT) AS fn,
       CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_e6,
       CAST(tp * 1000000 // n_truth AS BIGINT) AS recall_e6
FROM agg CROSS JOIN nt
"""


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed mean of event value per type
    (functions/timeseries.py trimmed_mean_cents) — the robust location
    estimate in integer cents."""
    from ..functions.timeseries import trimmed_mean_cents

    events = read_table(spark, sf_dir, "events")
    return trimmed_mean_cents(events, "value", ["event_type"],
                              trim_ppm=100_000)


SQL_TRIMMED_MEAN = """
WITH q AS (
  SELECT event_type, event_id,
         CAST(round(value * 100.0) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM q
),
kept AS (
  SELECT * FROM r
  WHERE rn > n * 100000 // 1000000
    AND rn <= n - n * 100000 // 1000000
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(c) AS BIGINT) AS trimmed_sum_cents,
       CAST(SUM(c) // COUNT(*) AS BIGINT) AS trimmed_mean_cents
FROM kept GROUP BY event_type
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators/skew.py skew_report) for events
    keyed by user_id — the pre-flight measurement that decides whether
    the salting operators beside it are needed. Head-of-distribution
    shares only (TakeOrdered), safe at any key cardinality."""
    from ..operators.skew import skew_report

    events = read_table(spark, sf_dir, "events")
    return skew_report(events, ["user_id"])


SQL_SKEW_REPORT = """
WITH counts AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS total_rows,
         CAST(MAX(c) AS BIGINT) AS max_key_rows
  FROM counts
),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn
  FROM counts ORDER BY c DESC, user_id LIMIT 100
),
shares AS (
  SELECT CAST(SUM(CASE WHEN rn <= 1 THEN c END) AS BIGINT) AS top1,
         CAST(SUM(CASE WHEN rn <= 10 THEN c END) AS BIGINT) AS top10,
         CAST(SUM(CASE WHEN rn <= 100 THEN c END) AS BIGINT) AS top100
  FROM top
)
SELECT n_keys, total_rows, max_key_rows,
       CAST(COALESCE(top1, 0) * 1000000 // total_rows AS BIGINT)
         AS top1_share_e6,
       CAST(COALESCE(top10, 0) * 1000000 // total_rows AS BIGINT)
         AS top10_share_e6,
       CAST(COALESCE(top100, 0) * 1000000 // total_rows AS BIGINT)
         AS top100_share_e6
FROM totals CROSS JOIN shares
"""


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer EWMA smoothing (functions/timeseries.py ewma_int, Roberts
    1959, alpha = 1/2) over hourly per-event-type counts — the smoothing
    complement of the CUSUM/z-score monitors, and the one control chart
    whose recurrence is PURE integer arithmetic: (s + x) >> 1 per step,
    so final and max smoothed values hash-check with no rounding at
    all."""
    from ..functions.timeseries import ewma_int

    events = read_table(spark, sf_dir, "events")
    return ewma_int(events, "ts", ["event_type"], 3600)


SQL_EWMA = """
WITH RECURSIVE counts AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, CAST(x AS BIGINT) AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS i
  FROM counts
),
c AS (
  SELECT event_type, i, x AS s, x AS smax FROM r WHERE i = 1
  UNION ALL
  SELECT r.event_type, r.i,
         CAST((c.s + r.x) // 2 AS BIGINT),
         greatest(c.smax, CAST((c.s + r.x) // 2 AS BIGINT))
  FROM c JOIN r ON r.event_type = c.event_type AND r.i = c.i + 1
),
last_i AS (SELECT event_type, MAX(i) AS mi FROM r GROUP BY 1)
SELECT c.event_type, CAST(m.mi AS BIGINT) AS n_buckets,
       c.s AS ewma_final, c.smax AS ewma_max
FROM c JOIN last_i m ON m.event_type = c.event_type AND c.i = m.mi
"""


def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join-size estimation (functions/sketches.py
    kmv_intersect_estimate, Beyer et al. SIGMOD 2007): |click users ∩
    purchase users| estimated from two k=16 KMV sketches, beside the
    exact controls. Every number is floor()ed integer math, so the
    ESTIMATE itself hash-checks."""
    from ..functions.sketches import kmv_intersect_estimate

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    est = kmv_intersect_estimate(clicks, buys, "user_id", k=16)
    cu = clicks.select("user_id").distinct()
    bu = buys.select("user_id").distinct()
    exact = (cu.join(bu, "user_id")
             .agg(F.count(F.lit(1)).alias("exact_inter"))
             .crossJoin(cu.unionByName(bu).distinct()
                        .agg(F.count(F.lit(1)).alias("exact_union"))))
    return est.crossJoin(F.broadcast(exact))


SQL_KMV_INTERSECT = f"""
WITH ah AS (
  SELECT DISTINCT {_hex12_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'click'
),
bh AS (
  SELECT DISTINCT {_hex12_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'purchase'
),
am AS (SELECT h FROM ah ORDER BY h LIMIT 16),
bm AS (SELECT h FROM bh ORDER BY h LIMIT 16),
um AS (SELECT DISTINCT h FROM (SELECT h FROM am UNION ALL
                               SELECT h FROM bm) t
       ORDER BY h LIMIT 16),
tagged AS (
  SELECT um.h,
    CASE WHEN am.h IS NOT NULL AND bm.h IS NOT NULL THEN 1 ELSE 0 END
      AS in_both
  FROM um LEFT JOIN am ON am.h = um.h LEFT JOIN bm ON bm.h = um.h
),
agg AS (
  SELECT CAST(SUM(in_both) AS BIGINT) AS j_num,
         CAST(COUNT(*) AS BIGINT) AS n_union_mins,
         MAX(h) AS kth
  FROM tagged
),
est AS (
  SELECT j_num, n_union_mins,
    CAST(CASE WHEN n_union_mins < 16 THEN n_union_mins
              ELSE floor(15.0 * 281474976710656.0 / kth) END AS BIGINT)
      AS union_est
  FROM agg
),
cu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
bu AS (SELECT DISTINCT user_id FROM events
       WHERE event_type = 'purchase'),
exact AS (
  SELECT (SELECT COUNT(*) FROM cu JOIN bu USING (user_id)) AS exact_inter,
         (SELECT COUNT(*) FROM (SELECT user_id FROM cu UNION
                                SELECT user_id FROM bu) t) AS exact_union
)
SELECT j_num, n_union_mins, union_est,
       CAST(CASE WHEN n_union_mins < 16 THEN j_num
                 ELSE (j_num * union_est) // 16 END AS BIGINT)
         AS inter_est,
       CAST(exact_inter AS BIGINT) AS exact_inter,
       CAST(exact_union AS BIGINT) AS exact_union
FROM est, exact
"""


def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values for orders over (customer, order-day) — the
    clustering key a layout-rewrite job (Delta OPTIMIZE ZORDER-style,
    functions/layout.py) sorts by so min/max pruning works on EITHER
    dimension. Pure bit interleave -> bit-exact in the DuckDB oracle;
    the file-level pruning effect itself is proven in
    tests/test_layout.py."""
    from ..functions.layout import zvalue

    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"),
                     F.lit("1992-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        zvalue(F.col("o_custkey"), day, bits=16).alias("zval"))


def _sql_zorder() -> str:
    from ..functions.layout import zvalue_sql

    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    return (f"SELECT o_orderkey, {zvalue_sql('(o_custkey)', f'({day})', 16)}"
            " AS zval FROM orders")


SQL_ZORDER_VALUES = _sql_zorder()


def q_hilbert_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert d-index for orders over (customer, order-day)
    (functions/layout.py hilbert_value) — the better-locality clustering
    key beside zorder_values' Morton interleave: the Hilbert walk is
    fully contiguous (every step moves one cell), so range predicates
    touch strictly fewer curve ranges. The quadrant-rotation state folds
    over packed BIGINTs, identical on both engines.

    The x coordinate is o_custkey % 32768, made EXPLICIT on both
    engines: a 15-bit grid holds ~32k distinct cells per axis, so above
    ~32k customers (SF >= ~0.25) distinct customers alias onto the same
    cell and the curve's locality is per-cell, not per-customer. For a
    larger key domain, bucket the key into the grid (key * 32768 div
    max_key) instead of masking — masking scatters neighbouring keys,
    bucketing preserves their order."""
    from ..functions.layout import hilbert_value

    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"),
                     F.lit("1992-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        hilbert_value(F.col("o_custkey") % 32768, day, bits=15)
        .alias("hval"))


def _sql_hilbert() -> str:
    from ..functions.layout import hilbert_sql

    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    return (f"SELECT o_orderkey, "
            f"{hilbert_sql('(o_custkey % 32768)', f'({day})', 15)}"
            " AS hval FROM orders")


SQL_HILBERT_VALUES = _sql_hilbert()


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: the furthest stage of signup -> click -> purchase
    each user reached IN ORDER within their FIRST 8 events (sequence =
    event_id, the suite's tie-free event order; the early-window cut is
    what a conversion funnel actually asks, and on this fixture it spreads
    users across all four stages instead of saturating at 3). One grouped
    array fold, fully JVM-side: events map to stage codes, and the fold
    advances only on code == acc + 1 — the subsequence-matching trick that
    makes the same fold restatable as DuckDB list_reduce. Scale note: the
    per-user array is bounded by user activity; for whale users beyond
    memory, the same semantics decompose into 3 chained min-aggregations
    (t1 = first signup, t2 = first click after t1, ...) at one extra
    shuffle each."""
    ev = read_table(spark, sf_dir, "events")
    code = (F.when(F.col("event_type") == "signup", 1)
            .when(F.col("event_type") == "click", 2)
            .when(F.col("event_type") == "purchase", 3)
            .otherwise(0))
    seq = F.slice(F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("event_id"),
                                             code.alias("c")))),
        lambda s: s["c"]), 1, 8)
    stage = F.aggregate(
        seq, F.lit(0),
        lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc))
    return (ev.groupBy("user_id")
            .agg(stage.cast("int").alias("funnel_stage")))


def q_timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel — signup -> click -> purchase where each
    next stage lands within 7 days of the previous one. Implemented as
    the chained min-aggregation decomposition q_event_funnel's docstring
    names as its whale-user scale path (t1 = first signup, t2 = first
    qualifying click after t1, ...): per-user scalars, one shuffle per
    stage, no per-user array — so shipping this variant also PROVES the
    decomposition works. Epoch-second arithmetic, exact integers."""
    win = 7 * 86400
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("es"))
    t1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("es").alias("t1")))
    t2 = (ev.filter(F.col("event_type") == "click")
          .join(t1, "user_id")
          .filter((F.col("es") > F.col("t1"))
                  & (F.col("es") <= F.col("t1") + win))
          .groupBy("user_id").agg(F.min("es").alias("t2")))
    t3 = (ev.filter(F.col("event_type") == "purchase")
          .join(t2, "user_id")
          .filter((F.col("es") > F.col("t2"))
                  & (F.col("es") <= F.col("t2") + win))
          .groupBy("user_id").agg(F.min("es").alias("t3")))
    users = ev.select("user_id").distinct()
    out = (users.join(t1, "user_id", "left")
           .join(t2, "user_id", "left").join(t3, "user_id", "left"))
    stage = (F.when(F.col("t3").isNotNull(), 3)
             .when(F.col("t2").isNotNull(), 2)
             .when(F.col("t1").isNotNull(), 1).otherwise(0))
    neg = F.lit(-1).cast("bigint")
    return out.select(
        "user_id", stage.cast("int").alias("stage_timed"),
        F.coalesce("t1", neg).alias("t1"),
        F.coalesce("t2", neg).alias("t2"),
        F.coalesce("t3", neg).alias("t3"))


SQL_TIMED_FUNNEL = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
t1 AS (SELECT user_id, MIN(es) AS t1 FROM ev
       WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, MIN(e.es) AS t2
  FROM ev e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.es > t1.t1
    AND e.es <= t1.t1 + 604800
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.es) AS t3
  FROM ev e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.es > t2.t2
    AND e.es <= t2.t2 + 604800
  GROUP BY e.user_id
),
users AS (SELECT DISTINCT user_id FROM ev)
SELECT u.user_id,
  CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
            WHEN t2.t2 IS NOT NULL THEN 2
            WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS INT)
    AS stage_timed,
  coalesce(t1.t1, -1) AS t1, coalesce(t2.t2, -1) AS t2,
  coalesce(t3.t3, -1) AS t3
FROM users u
LEFT JOIN t1 ON t1.user_id = u.user_id
LEFT JOIN t2 ON t2.user_id = u.user_id
LEFT JOIN t3 ON t3.user_id = u.user_id
"""


SQL_EVENT_FUNNEL = """
SELECT user_id,
       CAST(list_reduce(
         list_prepend(0, (list(CASE event_type WHEN 'signup' THEN 1
                                               WHEN 'click' THEN 2
                                               WHEN 'purchase' THEN 3
                                               ELSE 0 END
                               ORDER BY event_id))[1:8]),
         (acc, x) -> CASE WHEN x = acc + 1 THEN acc + 1 ELSE acc END
       ) AS INTEGER) AS funnel_stage
FROM events GROUP BY user_id
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (functions/graph.py) over the customer <->
    supplier bipartite graph (edge = "customer ordered from supplier",
    symmetrized). 3 unrolled damped iterations in BIGINT arithmetic —
    the iterative-algorithm family made oracle-checkable: every op is
    floor-division/integer-sum, so the unrolled SQL CTE chain reproduces
    scores bit-for-bit regardless of summation order."""
    from ..functions.graph import pagerank_int, symmetrize

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("cust"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("supp"))
             .distinct())
    return pagerank_int(symmetrize(pairs, "cust", "supp"), iters=3,
                        checkpoint_edges=True)


def _pagerank_sql(iters: int = 3) -> str:
    scale, base = 10 ** 9, 10 ** 9 * 15 // 100
    ctes = [f"""
pairs AS (
  SELECT DISTINCT o_custkey AS cust, (-l_suppkey - 1) AS supp
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (SELECT cust AS src, supp AS dst FROM pairs
          UNION SELECT supp, cust FROM pairs),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT DISTINCT src AS node FROM edges),
s0 AS (SELECT node, CAST({scale} AS BIGINT) AS score FROM n)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
i{i} AS (
  SELECT e.dst AS node, SUM(s.score // d.outdeg) AS s
  FROM edges e JOIN s{i - 1} s ON s.node = e.src
  JOIN outdeg d ON d.src = e.src
  GROUP BY e.dst
),
s{i} AS (
  SELECT n.node,
         CAST({base} + (85 * COALESCE(i{i}.s, 0)) // 100 AS BIGINT) AS score
  FROM n LEFT JOIN i{i} USING (node)
)""")
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT node, score FROM s{iters}")


SQL_PAGERANK = _pagerank_sql(3)


def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (functions/graph.py ppr_int) from seed
    customers {1,2,3} over the symmetrized purchase graph — restart mass
    returns to the seeds, so scores rank proximity to THAT neighborhood
    (the GraphRAG / recommendation ranker), in the same unrolled BIGINT
    arithmetic as the global pagerank beside it."""
    from ..functions.graph import ppr_int, symmetrize

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("cust"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("supp"))
             .distinct())
    return ppr_int(symmetrize(pairs, "cust", "supp"), seeds=[1, 2, 3],
                   iters=3, checkpoint_edges=True)


def _ppr_sql(iters: int = 3, seeds: tuple = (1, 2, 3)) -> str:
    scale = 10 ** 9
    restart = scale * 15 // 100 // len(seeds)
    init = scale // len(seeds)
    seed_list = ", ".join(str(s) for s in seeds)
    ctes = [f"""
pairs AS (
  SELECT DISTINCT o_custkey AS cust, (-l_suppkey - 1) AS supp
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (SELECT cust AS src, supp AS dst FROM pairs
          UNION SELECT supp, cust FROM pairs),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT DISTINCT src AS node FROM edges),
b AS MATERIALIZED (
  SELECT node, CASE WHEN node IN ({seed_list})
                    THEN CAST({restart} AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS restart
  FROM n
),
s0 AS (SELECT node, CASE WHEN restart > 0 THEN CAST({init} AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END AS score FROM b)"""]
    for i in range(1, iters + 1):
        ctes.append(f""",
i{i} AS (
  SELECT e.dst AS node, SUM(s.score // d.outdeg) AS s
  FROM edges e JOIN s{i - 1} s ON s.node = e.src
  JOIN outdeg d ON d.src = e.src
  GROUP BY e.dst
),
s{i} AS (
  SELECT b.node,
         CAST(b.restart + (85 * COALESCE(i{i}.s, 0)) // 100 AS BIGINT)
           AS score
  FROM b LEFT JOIN i{i} USING (node)
)""")
    return ("WITH " + "".join(ctes)
            + f"\nSELECT node, score FROM s{iters}")


SQL_PPR = _ppr_sql(3)


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point HITS (functions/graph.py hits_int) over the DIRECTED
    customer -> supplier purchase graph — hubs are broad buyers,
    authorities are widely-bought-from suppliers. 2 unrolled iterations
    with max-normalization in BIGINT arithmetic: every op is an integer
    sum / floor division, so the unrolled SQL CTE chain reproduces both
    score vectors bit-for-bit."""
    from ..functions.graph import hits_int

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("src"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("dst"))
             .distinct())
    return hits_int(edges, iters=2, checkpoint_edges=True)


def _hits_sql(iters: int = 2) -> str:
    """Unrolled HITS oracle. Every CTE that a later round references is
    MATERIALIZED (the kcore exponential-inlining lesson); scalar MAX
    subqueries read the materialized raw tables."""
    scale = 10 ** 6
    ctes = [f"""
edges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, (-l_suppkey - 1) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
n AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
h0 AS (SELECT node, CAST({scale} AS BIGINT) AS h FROM n)"""]
    for r in range(1, iters + 1):
        ctes.append(f""",
ar{r} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(s.h) AS a
  FROM edges e JOIN h{r - 1} s ON s.node = e.src GROUP BY e.dst
),
a{r} AS MATERIALIZED (
  SELECT n.node,
         CAST(COALESCE(r.a, 0) * {scale}
              // (SELECT MAX(a) FROM ar{r}) AS BIGINT) AS a
  FROM n LEFT JOIN ar{r} r USING (node)
),
hr{r} AS MATERIALIZED (
  SELECT e.src AS node, SUM(s.a) AS h
  FROM edges e JOIN a{r} s ON s.node = e.dst GROUP BY e.src
),
h{r} AS MATERIALIZED (
  SELECT n.node,
         CAST(COALESCE(r.h, 0) * {scale}
              // (SELECT MAX(h) FROM hr{r}) AS BIGINT) AS h
  FROM n LEFT JOIN hr{r} r USING (node)
)""")
    ctes.append(f"""
SELECT h.node, h.h AS hub, a.a AS authority
FROM h{iters} h JOIN a{iters} a USING (node)""")
    return "WITH " + "".join(ctes)


SQL_HITS = _hits_sql(2)


def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (linear interpolation —
    bit-identical to DuckDB's quantile_cont on the same doubles)."""
    orders = read_table(spark, sf_dir, "orders")
    return (orders.groupBy("o_orderstatus")
            .agg(F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
                 F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
                 F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
                 F.count(F.lit(1)).alias("n")))


SQL_ORDER_PERCENTILES = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.75) AS p75,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


_QUANTILE_PPM = (250000, 500000, 750000, 900000, 990000)


def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide quantiles by global rank selection — the
    complement of order_value_percentiles' per-group interpolation and of
    percentile_approx's sketch: the type-1 (lower) quantile at q is THE
    row whose global rank is 1 + (n-1)·q, selected without ever sorting
    the table through one task (util.global_order_scan — range shuffle +
    tiny offset table; the same primitive behind the distributed ntile).
    Exact integer cents; ties broken by o_orderkey so the pick is
    deterministic on both engines.

    Scale shape: one range shuffle of (cents, key), one broadcast of the
    5-row quantile spine, one per-row rank-arithmetic filter. At 100 TB
    this is THE way to get an exact p99 — approx sketches can't certify
    the exact value and a global orderBy().limit() can't reach rank
    0.99·n."""
    from ..functions.util import global_order_scan

    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderkey").alias("k"))
    ranked = global_order_scan(vals, [F.asc("cents"), F.asc("k")],
                               rank_col="r", total_col="n")
    spine = spark.range(1).select(F.explode(F.array(
        *[F.lit(q) for q in _QUANTILE_PPM])).alias("q_ppm"))
    return (ranked.crossJoin(F.broadcast(spine))
            .filter(F.col("r") == 1 + F.expr("(n - 1) * q_ppm div 1000000"))
            .select(F.col("q_ppm").cast("int").alias("q_ppm"),
                    F.col("r").cast("bigint").alias("rank"),
                    F.col("n").cast("bigint").alias("n"),
                    F.col("cents").alias("value_cents")))


SQL_EXACT_QUANTILES = f"""
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey AS k
  FROM orders
),
n AS (SELECT COUNT(*) AS n FROM v),
r AS (SELECT cents, row_number() OVER (ORDER BY cents, k) AS r FROM v),
q AS (SELECT unnest([{', '.join(str(q) for q in _QUANTILE_PPM)}])
        AS q_ppm)
SELECT CAST(q.q_ppm AS INT) AS q_ppm, CAST(r.r AS BIGINT) AS rank,
       CAST(n.n AS BIGINT) AS n, r.cents AS value_cents
FROM r, q, n WHERE r.r = 1 + ((n.n - 1) * q.q_ppm) // 1000000
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: HAVING-subquery membership — customers whose orders
    total more than 150 quantity units."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .alias("sum_qty"))
           .filter(F.col("sum_qty") > 150)
           .select("l_orderkey"))
    return (orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.count(F.lit(1)).alias("n_big_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_spent")))


SQL_TPCH_Q18 = """
SELECT c_custkey, c_name, COUNT(*) AS n_big_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    AS total_spent
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY c_custkey, c_name
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: scalar-subquery threshold + anti-join — wealthy
    (above-average balance) customers with no orders since 2001, by nation."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                     .cast("double")
                     / F.count(F.lit(1))).alias("a")))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")) \
        .select("o_custkey")
    wealthy = (cust.crossJoin(F.broadcast(avg_bal))
               .filter(F.col("c_acctbal") > F.col("a")))
    idle = wealthy.join(recent, wealthy.c_custkey == recent.o_custkey,
                        "left_anti")
    return (idle.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_cust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("total_bal")))


SQL_TPCH_Q22 = """
SELECT c_nationkey, COUNT(*) AS n_cust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q_rank_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank vs row_number on REAL ties (order dates repeat):
    the three must diverge exactly as SQL defines."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey")
    wd = Window.partitionBy("o_orderstatus").orderBy("o_orderdate")
    return (orders.select(
        "o_orderkey", "o_orderstatus",
        F.rank().over(wd).alias("rk"),
        F.dense_rank().over(wd).alias("drk"),
        F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50))


SQL_RANK_SEMANTICS = """
SELECT o_orderkey, o_orderstatus, rk, drk, rn FROM (
  SELECT o_orderkey, o_orderstatus,
         rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS rk,
         dense_rank() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_orderdate) AS drk,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 50
"""


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist — the distribution window
    functions (ntile over a deterministic total order; percent_rank and
    cume_dist over the tie-aware date order, where their semantics
    differ)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey")
    wd = Window.partitionBy("o_orderstatus").orderBy("o_orderdate")
    return (orders.select(
        "o_orderkey", "o_orderstatus",
        F.ntile(4).over(w).alias("nt"),
        F.percent_rank().over(wd).alias("pr"),
        F.cume_dist().over(wd).alias("cd"),
        F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50))


SQL_WINDOW_DISTRIBUTION = """
SELECT o_orderkey, o_orderstatus, nt, pr, cd, rn FROM (
  SELECT o_orderkey, o_orderstatus,
         ntile(4) OVER (PARTITION BY o_orderstatus
                        ORDER BY o_orderdate, o_orderkey) AS nt,
         percent_rank() OVER (PARTITION BY o_orderstatus
                              ORDER BY o_orderdate) AS pr,
         cume_dist() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_orderdate) AS cd,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 50
"""


def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: user × event_type count matrix (fixed column set so the
    schema is static — dynamic pivot is an anti-pattern at scale)."""
    ev = read_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (ev.groupBy("user_id")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .na.fill(0, types))


SQL_PIVOT_EVENT_COUNTS = """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id
"""


def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long — the literal 'melt' operation): part numeric
    columns to (key, metric, value) rows."""
    part = read_table(spark, sf_dir, "part")
    return (part.select(
        "p_partkey",
        F.expr("stack(2, 'p_size', CAST(p_size AS DOUBLE),"
               " 'p_retailprice', p_retailprice) AS (metric, value)")))


SQL_UNPIVOT_PART_METRICS = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregates per vector: norm (left fold), min/max elements —
    all JVM-side array ops."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        "vec_id", norm.alias("norm"),
        F.array_min(v).alias("vmin"), F.array_max(v).alias("vmax"),
        F.size(v).alias("dims"))


SQL_EMBEDDING_STATS = """
SELECT vec_id,
  sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]),
       x -> x * x), (a, b) -> a + b)) AS norm,
  list_min(CAST(embedding AS DOUBLE[])) AS vmin,
  list_max(CAST(embedding AS DOUBLE[])) AS vmax,
  len(embedding) AS dims
FROM embeddings
"""


def q_embedding_pca(spark: SparkSession, sf_dir: str,
                    state: dict | None = None) -> DataFrame:
    """PCA top-component / anisotropy readout over the embedding corpus
    (functions/pca.py pca_top_component; Mu & Viswanath ICLR 2018
    "all-but-the-top", Ethayarajh EMNLP 2019): exact-integer covariance
    moments (one map-side-combined d²/2 aggregate — the only
    corpus-sized stage), then 8 unrolled power-iteration rounds on the
    bounded d²-row matrix with order-pinned float folds. Per-dim
    eigenvector estimate + scaled variances, plus the dim=-1 summary
    carrying share_ppm — the number that decides whether to de-mean /
    de-ax vectors before ANN indexing."""
    from ..functions.pca import pca_top_component

    emb = read_table(spark, sf_dir, "embeddings")
    # dim pinned to the oracle's d=64 contract (r10 ADVICE fix): a
    # ragged row can no longer slip a 63- or 65-wide vector into the
    # moments the SQL restatement divides by the pinned-width count.
    # ``state``: the shared pca_state channel (r11 verdict #5) — the
    # numeric_profiles entry computes the moments once for this AND
    # the abtt branch; standalone drives compute their own.
    return pca_top_component(emb, dim=64, state=state)


def _pca_prefix(d: int = 64, iters: int = 8) -> str:
    """Shared CTE chain (qe .. fin) for the PCA oracle restatements —
    d pinned to the fixture's 64 dims; the same quantization, exact
    HUGEINT moments, and the identical 8 ordered product-fold rounds
    (list_reduce over list_prepend(0.0, ...) is the same left-fold
    sequence as Spark's F.aggregate). Used by both the readout
    (_sql_embedding_pca) and the applied correction (_sql_abtt_ann)."""
    rng = f"range(1, {d + 1})"
    its = []
    for k in range(1, iters + 1):
        its.append(f"""
w{k} AS (
  SELECT c.i,
         list_reduce(list_prepend(0.0,
           list_transform({rng},
             jj -> c.arr[jj] * v{k - 1}.varr[jj])), (a, b) -> a + b) AS w
  FROM crow c, v{k - 1}
),
g{k} AS (
  SELECT warr,
         sqrt(list_reduce(list_prepend(0.0,
           list_transform(warr, x -> x * x)), (a, b) -> a + b)) AS lam
  FROM (SELECT list(w ORDER BY i) AS warr FROM w{k})
),
v{k} AS (
  SELECT CASE WHEN lam > 0 THEN list_transform(warr, x -> x / lam)
              ELSE warr END AS varr, lam
  FROM g{k}
)""")
    return f"""qe AS (
  SELECT list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000.0) AS BIGINT)) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {d}
),
up AS (
  SELECT ii.i AS i, jj.j AS j,
         SUM(CAST(q[ii.i] AS HUGEINT) * q[jj.j]) AS P
  FROM qe, (SELECT unnest({rng}) AS i) ii, (SELECT unnest({rng}) AS j) jj
  WHERE jj.j >= ii.i
  GROUP BY 1, 2
),
sm AS (
  SELECT ii.i AS i, SUM(CAST(q[ii.i] AS HUGEINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM qe, (SELECT unnest({rng}) AS i) ii GROUP BY 1
),
cup AS (
  SELECT u.i, u.j,
         CAST(si.n AS HUGEINT) * u.P - si.s * sj.s AS c, si.n
  FROM up u JOIN sm si ON si.i = u.i JOIN sm sj ON sj.i = u.j
),
cfull AS (
  SELECT i, j, c, n FROM cup
  UNION ALL
  SELECT j AS i, i AS j, c, n FROM cup WHERE i <> j
),
crow AS (
  SELECT i, list(CAST(c AS DOUBLE) ORDER BY j) AS arr, MAX(n) AS n
  FROM cfull GROUP BY i
),
tr AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS tr FROM cup WHERE i = j
),
v0 AS (SELECT list_transform({rng}, x -> 1.0) AS varr),
{",".join(its)},
fin AS (
  SELECT varr,
         CAST(CASE WHEN tr.tr > 0
                   THEN round(lam / tr.tr * 1000000.0) ELSE 0.0 END
              AS BIGINT) AS share_ppm,
         tr.tr
  FROM v{iters}, tr
)"""


def _sql_embedding_pca(d: int = 64, iters: int = 8) -> str:
    return f"""
WITH {_pca_prefix(d, iters)}
SELECT CAST(c.i AS INT) AS dim,
       CAST(round(fin.varr[c.i] * 1000000.0) AS BIGINT) AS v_e6,
       CAST(d.c AS DOUBLE) AS cdiag, c.n
FROM crow c JOIN cup d ON d.i = c.i AND d.j = c.i CROSS JOIN fin
UNION ALL
SELECT CAST(-1 AS INT) AS dim, share_ppm AS v_e6, tr AS cdiag,
       (SELECT MAX(n) FROM crow) AS n
FROM fin
"""


SQL_EMBEDDING_PCA = _sql_embedding_pca()


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor (functions/similarity.py
    embedding_drift): per-label centroid cosine + L2 shift between the
    id-parity reference/candidate halves — the re-embedding sanity
    check run before trusting a refreshed ANN index; exact integer
    moments, DECIMAL(38) products, one e9 quantization per readout."""
    from ..functions.similarity import embedding_drift

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_drift(emb)


SQL_EMBEDDING_DRIFT = """
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings
           WHERE embedding IS NOT NULL AND len(embedding) = 64),
q AS (SELECT vec_id, label, vec_id % 2 = 0 AS is_ref,
             list_transform(e, x -> CAST(round(x * 1000000.0) AS BIGINT))
               AS q
      FROM v),
bd AS (
  SELECT label AS lab, g.i AS i,
         CAST(SUM(CASE WHEN is_ref THEN q[g.i] ELSE 0 END) AS HUGEINT)
           AS sr,
         CAST(SUM(CASE WHEN NOT is_ref THEN q[g.i] ELSE 0 END)
              AS HUGEINT) AS sc
  FROM q, unnest(generate_series(1, 64)) AS g(i)
  GROUP BY 1, 2
),
cn AS (SELECT label AS lab,
              CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                AS n_ref,
              CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_cand
       FROM q GROUP BY 1),
mom AS (
  SELECT bd.lab, SUM(sr * sc) AS dot, SUM(sr * sr) AS ra,
         SUM(sc * sc) AS rb,
         SUM((sr * cn.n_cand - sc * cn.n_ref)
             * (sr * cn.n_cand - sc * cn.n_ref)) AS d2,
         MAX(cn.n_ref) AS n_ref, MAX(cn.n_cand) AS n_cand
  FROM bd JOIN cn USING (lab) GROUP BY 1
)
SELECT lab AS label, n_ref, n_cand,
  CAST(floor(CASE WHEN ra > 0 AND rb > 0
                  THEN CAST(dot AS DOUBLE)
                       / (sqrt(CAST(ra AS DOUBLE))
                          * sqrt(CAST(rb AS DOUBLE)))
                  ELSE 0.0 END * 1000000000.0 + 0.5) AS BIGINT)
    AS centroid_cos_e9,
  CAST(floor(CASE WHEN n_ref > 0 AND n_cand > 0
                  THEN sqrt(CAST(d2 AS DOUBLE))
                       / (CAST(n_ref AS DOUBLE) * n_cand * 1000000.0)
                  ELSE -1.0 END * 1000000000.0 + 0.5) AS BIGINT)
    AS l2_shift_e9
FROM mom
"""


def q_abtt_ann(spark: SparkSession, sf_dir: str,
               state: dict | None = None) -> DataFrame:
    """All-but-the-top APPLIED (functions/pca.py abtt_ann_overlap; Mu &
    Viswanath ICLR 2018, D=1): de-mean + subtract the top-component
    projection from every embedding, exact cosine top-10 in the
    corrected space for the ann_cosine_topk query set, each neighbor
    flagged in_raw if it also ranks top-10 in the RAW space —
    avg(in_raw) is the neighborhood overlap the anisotropy readout
    (embedding_pca's share_ppm) predicts, closing the readout's
    decision loop. Integer corrections (q, mu_e6, v_e6 all exact),
    portable half-up quantization, order-pinned cosine folds."""
    from ..functions.pca import abtt_ann_overlap

    emb = read_table(spark, sf_dir, "embeddings")
    return abtt_ann_overlap(emb, dim=64, k=10, n_queries=5, state=state)


def _sql_abtt_ann(d: int = 64, iters: int = 8, k: int = 10,
                  nq: int = 5) -> str:
    rng = f"range(1, {d + 1})"

    def dot(a: str, b: str) -> str:
        # same seedless left fold as pipeline_suite._dot_sql / Spark's
        # aggregate-from-0.0 (0.0 + x1 == x1 exactly in IEEE)
        return (f"list_reduce(list_transform(generate_series(1, {d}),"
                f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)")

    return f"""
WITH {_pca_prefix(d, iters)},
ve AS (
  SELECT list_transform(varr,
                        x -> CAST(round(x * 1000000.0) AS BIGINT)) AS varr
  FROM fin
),
mu AS (
  SELECT list(CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT)
              ORDER BY i) AS muarr
  FROM sm
),
qi AS (
  SELECT vec_id AS id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000.0) AS BIGINT)) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {d}
),
xcp AS (
  SELECT id, list_transform({rng}, i -> q[i] - muarr[i]) AS xc
  FROM qi, mu
),
pj AS (
  SELECT id, xc,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform({rng}, i -> xc[i] * ve.varr[i])),
           (a, b) -> a + b) AS proj
  FROM xcp, ve
),
cv AS (
  SELECT id,
         list_transform({rng},
           i -> CAST(xc[i] - CAST(floor(CAST(proj AS DOUBLE) * ve.varr[i]
                / 1000000000000.0 + 0.5) AS BIGINT) AS DOUBLE)) AS cd
  FROM pj, ve
),
rv AS (SELECT id, list_transform(q, x -> CAST(x AS DOUBLE)) AS rd
       FROM qi),
cq AS (SELECT id AS query_id, cd AS qv FROM cv WHERE id < {nq}),
cs AS (
  SELECT query_id, c.id AS neighbor_id,
         {dot("qv", "c.cd")}
           / (sqrt({dot("qv", "qv")}) * sqrt({dot("c.cd", "c.cd")})) AS cos
  FROM cq, cv c WHERE query_id <> c.id
),
ct AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
       FROM cs),
rq AS (SELECT id AS query_id, rd AS qv FROM rv WHERE id < {nq}),
rs AS (
  SELECT query_id, c.id AS neighbor_id,
         {dot("qv", "c.rd")}
           / (sqrt({dot("qv", "qv")}) * sqrt({dot("c.rd", "c.rd")})) AS cos
  FROM rq, rv c WHERE query_id <> c.id
),
rt AS (
  SELECT query_id, neighbor_id FROM
    (SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
     FROM rs)
  WHERE rank <= {k}
)
SELECT ct.query_id, ct.neighbor_id, ct.rank, ct.cos,
       CAST(CASE WHEN rt.neighbor_id IS NOT NULL
                 THEN 1 ELSE 0 END AS INT) AS in_raw
FROM ct LEFT JOIN rt
  ON rt.query_id = ct.query_id AND rt.neighbor_id = ct.neighbor_id
WHERE ct.rank <= {k}
"""


SQL_ABTT_ANN = _sql_abtt_ann()


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantization error profile per vector (the 4×-smaller
    scan path for 100 TB embedding corpora; see functions/similarity.py)."""
    from ..functions.similarity import quantization_error

    emb = read_table(spark, sf_dir, "embeddings")
    return quantization_error(emb)


SQL_QUANTIZE_INT8 = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (
  SELECT vec_id, e,
    CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0 THEN 1.0
         ELSE list_max(list_transform(e, x -> abs(x))) / 127.0 END AS scale
  FROM v
),
q AS (
  SELECT vec_id, e, scale,
    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
  FROM s
)
SELECT vec_id, len(e) AS dims, scale,
  list_max(list_transform(range(1, len(e) + 1),
    i -> abs(qv[i] * scale - e[i]))) AS max_abs_err,
  list_reduce(list_prepend(0.0, list_transform(range(1, len(e) + 1),
    i -> (qv[i] * scale - e[i]) * (qv[i] * scale - e[i]))),
    (a, b) -> a + b) / len(e) AS mse
FROM q
"""


def q_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed distinct counts: daily active users."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.groupBy(F.date_format(F.date_trunc("day", "ts"),
                                     "yyyy-MM-dd").alias("day"))
            .agg(F.countDistinct("user_id").alias("dau"),
                 F.count(F.lit(1)).alias("n_events")))


SQL_DAILY_ACTIVE_USERS = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS dau, COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue trend with month-over-month delta. The lag rides
    util.global_row_number + a self-join on rank-1 (exactly lag() over
    the month order, but distributed) instead of a partition-less lag
    window — months are few, but the plan discipline is uniform."""
    from ..functions.util import global_row_number

    orders = read_table(spark, sf_dir, "orders")
    monthly = (orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"),
                      "yyyy-MM").alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .alias("revenue")))
    ranked = global_row_number(monthly, [F.asc("month")], "rn")
    prev = ranked.select((F.col("rn") + 1).alias("rn"),
                         F.col("revenue").alias("prev_revenue"))
    # NULL first-month delta -> 0 sentinel: the driver hash degrades a
    # NULL-bearing numeric column to NaN-bearing float64 on the DuckDB side.
    return (ranked.join(prev, "rn", "left")
            .select("month",
                    F.col("revenue").cast("double").alias("revenue"),
                    F.coalesce((F.col("revenue") - F.col("prev_revenue"))
                               .cast("double"), F.lit(0.0))
                    .alias("mom_delta")))


SQL_MONTHLY_REVENUE = """
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, CAST(revenue AS DOUBLE) AS revenue,
  coalesce(CAST(revenue - lag(revenue) OVER (ORDER BY month) AS DOUBLE),
           0.0) AS mom_delta
FROM m
"""


# Deterministic partsupp synthesis (the fixture set lacks the TPC-H
# partsupp table; derive it so q2/q11-style shapes are expressible):
# each part gets 4 suppliers s = (p*7 + i) % n_supp, availqty/supplycost
# from pure arithmetic — identical construction in both engines.
_PARTSUPP_SQL = """
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         ((p_partkey * 7 + i) % (SELECT COUNT(*) FROM supplier)) + 1
           AS ps_suppkey,
         (p_partkey * 31 + i * 131) % 9000 + 1 AS ps_availqty,
         CAST((p_partkey * 13 + i * 17) % 99900 + 100 AS DOUBLE) / 100.0
           AS ps_supplycost
  FROM part, (SELECT unnest(generate_series(0, 3)) AS i)
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    n_supp = read_table(spark, sf_dir, "supplier").count()
    i = spark.range(4).select(F.col("id").cast("int").alias("i"))
    return (part.crossJoin(i).select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") * 7 + F.col("i")) % n_supp + 1)
        .alias("ps_suppkey"),
        ((F.col("p_partkey") * 31 + F.col("i") * 131) % 9000 + 1)
        .alias("ps_availqty"),
        (((F.col("p_partkey") * 13 + F.col("i") * 17) % 99900 + 100)
         .cast("double") / 100.0).alias("ps_supplycost")))


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered exact triangle census (functions/graph.py
    triangle_count) over the supplier co-supply graph: suppliers adjacent
    when they stock a common part (partsupp self-join). The unipartite
    complement of the butterfly census — and the published case where
    vertex ordering defuses hub skew without explicit salting."""
    from ..functions.graph import triangle_count

    ps = _partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    ps2 = ps.select(F.col("ps_partkey").alias("pk2"),
                    F.col("ps_suppkey").alias("sk2"))
    pairs = (ps.join(ps2, (F.col("ps_partkey") == F.col("pk2"))
                     & (F.col("ps_suppkey") < F.col("sk2")))
             .select(F.col("ps_suppkey").alias("sa"),
                     F.col("sk2").alias("sb")).distinct())
    return triangle_count(pairs, "sa", "sb")


SQL_TRIANGLES = f"""
WITH {_PARTSUPP_SQL.strip().rstrip()},
und AS (
  SELECT DISTINCT least(a.ps_suppkey, b.ps_suppkey) AS u,
         greatest(a.ps_suppkey, b.ps_suppkey) AS v
  FROM partsupp a JOIN partsupp b
    ON a.ps_partkey = b.ps_partkey AND a.ps_suppkey < b.ps_suppkey
),
deg AS (
  SELECT u, COUNT(*) AS d FROM (
    SELECT u FROM und UNION ALL SELECT v FROM und
  ) t GROUP BY u
),
oriented AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v)
              THEN und.u ELSE und.v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND und.u < und.v)
              THEN und.v ELSE und.u END AS dst
  FROM und
  JOIN deg du ON du.u = und.u
  JOIN deg dv ON dv.u = und.v
),
owedges AS (
  SELECT least(o1.dst, o2.dst) AS cx, greatest(o1.dst, o2.dst) AS cy
  FROM oriented o1 JOIN oriented o2
    ON o1.src = o2.src AND o1.dst < o2.dst
),
closing AS (
  SELECT least(src, dst) AS cx, greatest(src, dst) AS cy FROM oriented
),
tri AS (
  SELECT COUNT(*) AS triangles FROM owedges JOIN closing USING (cx, cy)
),
wed AS (
  SELECT SUM(d * (d - 1)) AS w2, COUNT(*) AS n_nodes, SUM(d) AS deg_sum
  FROM deg
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(deg_sum // 2 AS BIGINT) AS n_edges,
       CAST(w2 // 2 AS BIGINT) AS wedges,
       CAST(triangles AS BIGINT) AS triangles,
       CASE WHEN w2 > 0 THEN CAST(3 * triangles AS DOUBLE)
                             / CAST(w2 // 2 AS DOUBLE)
            ELSE -1.0 END AS transitivity
FROM tri, wed
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: inventory value per part vs a global scalar
    threshold (group-agg + scalar subquery over the same relation)."""
    ps = _partsupp(spark, sf_dir)
    value = (F.col("ps_supplycost") * F.col("ps_availqty"))
    per_part = (ps.groupBy("ps_partkey")
                .agg(F.sum(value.cast("decimal(18,4)"))
                     .cast("decimal(38,4)").alias("part_value")))
    total = per_part.agg(
        (F.sum("part_value").cast("double") * 0.001).alias("threshold"))
    return (per_part.crossJoin(F.broadcast(total))
            .filter(F.col("part_value").cast("double") > F.col("threshold"))
            .select("ps_partkey",
                    F.col("part_value").cast("double").alias("part_value")))


SQL_TPCH_Q11 = f"""
WITH {_PARTSUPP_SQL},
per_part AS (
  SELECT ps_partkey,
    CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,4)))
         AS DECIMAL(38,4)) AS part_value
  FROM partsupp GROUP BY ps_partkey
)
SELECT ps_partkey, CAST(part_value AS DOUBLE) AS part_value FROM per_part
WHERE CAST(part_value AS DOUBLE) >
  (SELECT CAST(SUM(part_value) AS DOUBLE) * 0.001 FROM per_part)
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: min-cost supplier per part (correlated-min pattern
    as a join against the per-group minimum)."""
    ps = _partsupp(spark, sf_dir)
    sup = read_table(spark, sf_dir, "supplier")
    mins = ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost"))
    best = (ps.join(mins, "ps_partkey")
            .filter(F.col("ps_supplycost") == F.col("min_cost")))
    return (best.join(sup, best.ps_suppkey == sup.s_suppkey)
            .groupBy("ps_partkey")
            .agg(F.min("s_suppkey").alias("best_suppkey"),  # tie -> lowest
                 F.min("min_cost").alias("min_cost")))


SQL_TPCH_Q2 = f"""
WITH {_PARTSUPP_SQL},
mins AS (
  SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
  FROM partsupp GROUP BY ps_partkey
)
SELECT ps.ps_partkey, MIN(s.s_suppkey) AS best_suppkey,
       MIN(m.min_cost) AS min_cost
FROM partsupp ps
JOIN mins m ON m.ps_partkey = ps.ps_partkey
           AND ps.ps_supplycost = m.min_cost
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
GROUP BY ps.ps_partkey
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: national market share — share of AMERICA-region
    ECONOMY-part order volume supplied by NATION_3, per year. The full
    8-relation snowflake; every dimension broadcasts, the orders⋈lineitem
    spine is the only shuffle."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    sup = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    vol = (d2("l_extendedprice") * (one - d2("l_discount")))
    n_cust = nation.select(F.col("n_nationkey").alias("cn_key"),
                           F.col("n_regionkey").alias("cn_region"))
    n_supp = nation.select(F.col("n_nationkey").alias("sn_key"),
                           F.col("n_name").alias("supp_nation"))
    joined = (li
              .join(part.filter(F.col("p_type") == "ECONOMY"),
                    li.l_partkey == F.col("p_partkey"))
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .join(cust, orders.o_custkey == cust.c_custkey)
              .join(n_cust, cust.c_nationkey == F.col("cn_key"))
              .join(region.filter(F.col("r_name") == "AMERICA"),
                    F.col("cn_region") == F.col("r_regionkey"))
              .join(sup, li.l_suppkey == sup.s_suppkey)
              .join(n_supp, sup.s_nationkey == F.col("sn_key"))
              .filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))))
    return (joined
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                       .otherwise(F.lit(0).cast("decimal(18,2)")))
                 .cast("double").alias("nation_vol"),
                 F.sum(vol).cast("double").alias("total_vol"))
            .select(F.col("o_year").cast("long").alias("o_year"),
                    (F.col("nation_vol") / F.col("total_vol"))
                    .alias("mkt_share")))


SQL_TPCH_Q8 = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
    THEN CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'AMERICA'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY year(o_orderdate)
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation and year over PROMO
    parts; cost side comes from the synthesized partsupp (same derivation
    both engines)."""
    nation = read_table(spark, sf_dir, "nation")
    sup = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    ps = _partsupp(spark, sf_dir)
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    profit = (d2("l_extendedprice") * (one - d2("l_discount"))
              - F.col("ps_supplycost").cast("decimal(18,2)")
              * d2("l_quantity")).cast("decimal(18,4)")
    return (li
            .join(part.filter(F.col("p_type") == "PROMO"),
                  li.l_partkey == F.col("p_partkey"))
            .join(ps, (li.l_partkey == ps.ps_partkey)
                  & (li.l_suppkey == ps.ps_suppkey))
            .join(sup, li.l_suppkey == sup.s_suppkey)
            .join(nation, sup.s_nationkey == nation.n_nationkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.sum(profit).cast("double").alias("sum_profit")))


SQL_TPCH_Q9 = f"""
WITH {_PARTSUPP_SQL}
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      - CAST(ps_supplycost AS DECIMAL(18,2))
      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)))
    AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY n_name, year(o_orderdate)
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: top supplier(s) by revenue in a ship-date window
    (scalar-max subquery kept in DECIMAL so the equality is exact)."""
    sup = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    rev = (li.filter(
               (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
               & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp")))
           .groupBy("l_suppkey")
           .agg(F.sum(d2("l_extendedprice") * (one - d2("l_discount")))
                .alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("max_rev"))
            .join(sup, F.col("l_suppkey") == sup.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_rev")))


SQL_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: revenue from small-quantity orders of Brand#1
    small parts — the correlated-average pattern as a per-part aggregate
    join. Threshold arithmetic is written identically on both engines
    (DECIMAL sum → double → *0.2 → /count)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    small = part.filter((F.col("p_brand") == "Brand#1")
                        & (F.col("p_size") < 10))
    avg_q = (li.groupBy("l_partkey")
             .agg((F.sum(d2("l_quantity")).cast("double") * 0.2
                   / F.count(F.lit(1))).alias("qty_thr")))
    return (li
            .join(F.broadcast(small), li.l_partkey == F.col("p_partkey"))
            .join(avg_q, "l_partkey")
            .filter(F.col("l_quantity") < F.col("qty_thr"))
            .agg((F.sum(d2("l_extendedprice")).cast("double") / 7.0)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n")))


SQL_TPCH_Q17 = """
WITH avg_q AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.2
      / COUNT(*) AS qty_thr
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1' AND p_size < 10
JOIN avg_q ON avg_q.l_partkey = lineitem.l_partkey
WHERE l_quantity < qty_thr
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: disjunction of brand/size/quantity conjuncts —
    the CNF-conversion + pushdown stressor (Catalyst splits the common
    p_partkey = l_partkey conjunct out of the OR)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    joined = li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30))))
    return (joined.filter(cond)
            .agg(F.sum(d2("l_extendedprice") * (one - d2("l_discount")))
                 .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


SQL_TPCH_Q19 = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS revenue,
  COUNT(*) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: customer order-count distribution (left outer join
    preserving zero-order customers, then a second aggregation)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


SQL_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct supplier count per (brand, type, size)
    for non-excluded parts, minus a NOT-IN supplier blacklist (the
    deterministic s_suppkey % 7 = 0 stand-in for the comment filter)."""
    part = read_table(spark, sf_dir, "part")
    sup = read_table(spark, sf_dir, "supplier")
    ps = _partsupp(spark, sf_dir)
    sizes = [1, 4, 9, 14, 19, 24, 29, 34]
    good_parts = part.filter((F.col("p_brand") != "Brand#1")
                             & (F.col("p_type") != "PROMO")
                             & F.col("p_size").isin(sizes))
    blacklist = sup.filter(F.col("s_suppkey") % 7 == 0).select("s_suppkey")
    return (ps.join(F.broadcast(good_parts),
                    ps.ps_partkey == F.col("p_partkey"))
            .join(F.broadcast(blacklist),
                  ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt")))


SQL_TPCH_Q16 = f"""
WITH {_PARTSUPP_SQL}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers whose available stock exceeds half of
    what they shipped of that part in 1997 (semi-join against a
    per-(part,supplier) shipped-quantity aggregate)."""
    sup = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    shipped = (li.filter(
                   (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                   & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                    .cast("double").alias("qty")))
    overstocked = (ps.join(shipped,
                           (ps.ps_partkey == F.col("l_partkey"))
                           & (ps.ps_suppkey == F.col("l_suppkey")))
                   .filter(F.col("ps_availqty") > F.col("qty") * 0.5)
                   .select("ps_suppkey").distinct())
    return (sup.join(overstocked, sup.s_suppkey == F.col("ps_suppkey"))
            .select("s_suppkey", "s_name"))


SQL_TPCH_Q20 = f"""
WITH {_PARTSUPP_SQL},
shipped AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM partsupp
  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE ps_availqty > qty * 0.5)
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers-who-kept-waiting) — the last uncovered TPC-H
    shape. The fixture lineitem has no l_commitdate/l_receiptdate, so both
    are DERIVED deterministically from existing columns with the SAME
    formula on both engines (receipt = ship + transit days keyed on
    (orderkey, linenumber); commit = ship + promise days keyed on
    (partkey, suppkey)); the q21 semantics — multi-supplier 'F' orders
    where exactly ONE supplier was late, counted per supplier — then run
    genuinely. Aggregate restatement of the EXISTS / NOT EXISTS pair: per
    order, n_supp > 1 AND n_late == 1 (Spark-first: two hash aggregates,
    no correlated subquery)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    sup = read_table(spark, sf_dir, "supplier")
    receipt = F.date_add(
        F.col("l_shipdate").cast("date"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 10 + 1).cast("int"))
    commit = F.date_add(
        F.col("l_shipdate").cast("date"),
        ((F.col("l_partkey") + F.col("l_suppkey")) % 12).cast("int"))
    lx = li.select("l_orderkey", "l_suppkey", receipt.alias("receipt"),
                   commit.alias("commit"))
    per_order = lx.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("receipt") > F.col("commit"),
                               F.col("l_suppkey"))).alias("n_late"))
    late = (lx.filter(F.col("receipt") > F.col("commit"))
            .select("l_orderkey", "l_suppkey").distinct())
    f_orders = (orders.filter(F.col("o_orderstatus") == "F")
                .select(F.col("o_orderkey").alias("l_orderkey")))
    waiting = (late.join(per_order, "l_orderkey")
               .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
               .join(f_orders, "l_orderkey"))
    return (waiting.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), "s_name").limit(100))


SQL_TPCH_Q21 = """
WITH lx AS (
  SELECT l_orderkey, l_suppkey,
    CAST(l_shipdate AS DATE)
      + CAST((l_orderkey + l_linenumber) % 10 + 1 AS INT) AS receipt,
    CAST(l_shipdate AS DATE)
      + CAST((l_partkey + l_suppkey) % 12 AS INT) AS commit
  FROM lineitem
),
per_order AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN receipt > commit THEN l_suppkey END)
           AS n_late
  FROM lx GROUP BY l_orderkey
),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lx
         WHERE receipt > commit),
waiting AS (
  SELECT late.l_orderkey, late.l_suppkey
  FROM late
  JOIN per_order USING (l_orderkey)
  JOIN orders ON o_orderkey = late.l_orderkey AND o_orderstatus = 'F'
  WHERE n_supp > 1 AND n_late = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM waiting JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL edge cases — the classic engine-parity traps: null-safe
    equality, coalesce/nullif, NULL propagation through arithmetic and
    concat, COUNT vs COUNT(col), aggregates over all-NULL groups."""
    docs = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "a", None), (4, None, None)],
        "id long, s string, v long")
    docs.createOrReplaceTempView("nulldemo")
    return spark.sql("""
        SELECT g,
               COUNT(*) AS n_rows, COUNT(v) AS n_vals,
               CAST(SUM(v) AS BIGINT) AS sum_v,
               MIN(v) AS min_v
        FROM (
          SELECT CASE WHEN s <=> NULL THEN 'null_s'
                      ELSE coalesce(nullif(s, 'z'), 'subst') END AS g,
                 v
          FROM nulldemo
        ) GROUP BY g
    """)


SQL_NULL_SEMANTICS = """
WITH nulldemo(id, s, v) AS (VALUES
  (1, 'a', 10), (2, NULL, 20), (3, 'a', NULL), (4, NULL, NULL))
SELECT g, COUNT(*) AS n_rows, COUNT(v) AS n_vals,
       CAST(SUM(v) AS BIGINT) AS sum_v, MIN(v) AS min_v
FROM (
  SELECT CASE WHEN s IS NOT DISTINCT FROM NULL THEN 'null_s'
              ELSE coalesce(nullif(s, 'z'), 'subst') END AS g,
         v
  FROM nulldemo
) t GROUP BY g
"""


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function parity incl. levenshtein (identical DP algorithm in
    both engines), padding, slicing, case mapping."""
    # orderBy BEFORE limit: the oracle takes ORDER BY c_custkey LIMIT 200,
    # and an unordered .limit() only happens to agree on a single-file
    # fixture scanned as one split — any repartitioned fixture would
    # compare different row subsets. The limit is tiny; the sort is cheap.
    cust = (read_table(spark, sf_dir, "customer")
            .orderBy("c_custkey").limit(200))
    return cust.select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("seg_up"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.replace(F.col("c_name"), F.lit("Customer"),
                  F.lit("Cst")).alias("name_repl"),
        F.levenshtein("c_name", "c_mktsegment").alias("lev"),
        F.length("c_name").alias("name_len"))


SQL_STRING_FUNCTIONS = """
SELECT c_custkey,
  upper(c_mktsegment) AS seg_up,
  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
  substr(c_name, 10, 5) AS name_mid,
  replace(c_name, 'Customer', 'Cst') AS name_repl,
  levenshtein(c_name, c_mktsegment) AS lev,
  length(c_name) AS name_len
FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 200)
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function parity battery over order dates: truncation,
    month-end, calendar fields, interval arithmetic — rendered as ISO
    strings / small ints so both engines hash identically. (dayofweek is
    normalized to ISO 1=Monday..7=Sunday explicitly: Spark's native
    dayofweek is 1=Sunday, DuckDB's is 0=Sunday — an off-by-one trap.)"""
    # ordered limit for the same reason as q_string_functions: the oracle
    # uses ORDER BY o_orderkey LIMIT 500.
    orders = (read_table(spark, sf_dir, "orders")
              .orderBy("o_orderkey").limit(500))
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("day"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        # ISO weekday: Spark dayofweek is 1=Sun..7=Sat -> shift
        (((F.dayofweek(d) + 5) % 7) + 1).alias("iso_dow"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2m"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd")
        .alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).alias("days_to"))


SQL_DATE_FUNCTIONS = """
SELECT o_orderkey,
  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  quarter(CAST(o_orderdate AS DATE)) AS qtr,
  weekofyear(CAST(o_orderdate AS DATE)) AS iso_week,
  isodow(CAST(o_orderdate AS DATE)) AS iso_dow,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d')
    AS plus_2m,
  strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
    AS month_start,
  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
    AS days_to
FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 500)
"""


def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic math subset (floor/ceil/abs/sign/sqrt/mod — IEEE-exact
    everywhere; deliberately NOT exp/ln whose libm bits vary)."""
    cust = read_table(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.floor(b).cast("long").alias("fl"),
        F.ceil(b).cast("long").alias("ce"),
        F.abs(b).alias("ab"),
        F.signum(b).cast("int").alias("sg"),
        F.sqrt(F.abs(b)).alias("sq"),
        F.pmod(F.col("c_custkey"), F.lit(7)).cast("long").alias("md"))


SQL_MATH_FUNCTIONS = """
SELECT c_custkey,
  CAST(floor(c_acctbal) AS BIGINT) AS fl,
  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
  abs(c_acctbal) AS ab,
  CAST(sign(c_acctbal) AS INT) AS sg,
  sqrt(abs(c_acctbal)) AS sq,
  CAST(c_custkey % 7 AS BIGINT) AS md
FROM customer
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (the event-analytics staple): users are
    cohorted by the day of their FIRST event; each later active day counts
    toward (cohort_day, day_offset). Two compact shuffles — (user, day)
    distinct activity, then the cohort aggregation; the first-event table
    is user-sized and broadcast-joins back at fixture scale. Rate is one
    exact-integer divide."""
    ev = read_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("bigint")
    act = ev.select("user_id", day.alias("d")).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("d0"))
    coh = first.groupBy("d0").agg(F.count(F.lit(1)).alias("cohort_n"))
    return (act.join(first, "user_id").join(coh, "d0")
            .groupBy(F.col("d0").alias("cohort_day"),
                     ((F.col("d") - F.col("d0")) / 86400).cast("bigint")
                     .alias("day_offset"), "cohort_n")
            .agg(F.count(F.lit(1)).alias("n_active"))
            .select("cohort_day", "day_offset", "cohort_n", "n_active",
                    (F.col("n_active").cast("double")
                     / F.col("cohort_n").cast("double")).alias("retention")))


SQL_COHORT_RETENTION = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(floor(epoch(ts)) / 86400) * 86400 AS BIGINT) AS d
  FROM events
),
first AS (SELECT user_id, MIN(d) AS d0 FROM act GROUP BY user_id),
coh AS (SELECT d0, COUNT(*) AS cohort_n FROM first GROUP BY d0)
SELECT f.d0 AS cohort_day,
       CAST((a.d - f.d0) / 86400 AS BIGINT) AS day_offset,
       c.cohort_n, COUNT(*) AS n_active,
       CAST(COUNT(*) AS DOUBLE) / CAST(c.cohort_n AS DOUBLE) AS retention
FROM act a JOIN first f USING (user_id) JOIN coh c USING (d0)
GROUP BY 1, 2, 3
"""


def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-fill (functions/timeseries.py): hourly value sums
    per event type, densified over each type's observed range with LOCF
    and linear interpolation — time_bucket_gapfill + locf()/interpolate()
    re-expressed as sequence()/explode spine + two window passes."""
    from ..functions.timeseries import gapfill

    ev = read_table(spark, sf_dir, "events")
    return gapfill(ev, "ts", ["event_type"], "value", 3600)


SQL_GAPFILL_HOURLY = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS v_dec
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT event_type, unnest(generate_series(b_min, b_max, 3600)) AS bucket
  FROM (SELECT event_type, MIN(bucket) AS b_min, MAX(bucket) AS b_max
        FROM hourly GROUP BY event_type)
),
dense AS (
  SELECT s.event_type, s.bucket, h.n, CAST(h.v_dec AS DOUBLE) AS v
  FROM spine s LEFT JOIN hourly h USING (event_type, bucket)
),
w AS (
  SELECT event_type, bucket, n, v,
    last_value(v IGNORE NULLS) OVER tw AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER tw AS pb,
    first_value(v IGNORE NULLS) OVER fw AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER fw AS nb
  FROM dense
  WINDOW tw AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fw AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket, CAST(coalesce(n, 0) AS BIGINT) AS n,
  coalesce(v, -1.0) AS v_sum,
  round(coalesce(v, pv, nv), 9) AS v_locf,
  round(coalesce(v, CASE WHEN pv IS NULL THEN nv
                         WHEN nv IS NULL THEN pv
                         ELSE pv + (nv - pv)
                              * (CAST(bucket - pb AS DOUBLE)
                                 / CAST(nb - pb AS DOUBLE)) END), 9)
    AS v_interp
FROM w
"""


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detector (functions/timeseries.py): hourly
    event-count z-score per type against the prior 24 observed buckets.
    Mean/variance come from exact integer window sums so the only float
    ops are IEEE-deterministic."""
    from ..functions.timeseries import trailing_zscore

    ev = read_table(spark, sf_dir, "events")
    return trailing_zscore(ev, "ts", ["event_type"], 3600, lookback=24)


SQL_ANOMALY_ZSCORE = """
WITH c AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, bucket, x,
         COUNT(x) OVER tw AS cnt, SUM(x) OVER tw AS s1,
         SUM(x * x) OVER tw AS s2
  FROM c
  WINDOW tw AS (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, bucket, x,
  CASE WHEN cnt < 2 OR CAST(cnt * s2 - s1 * s1 AS DOUBLE)
                       / CAST(cnt * cnt AS DOUBLE) <= 0.0 THEN -999.0
       ELSE round((CAST(x AS DOUBLE)
                   - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
                  / sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE)
                         / CAST(cnt * cnt AS DOUBLE)), 9) END AS z
FROM w
"""


def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates (functions/sketches.py) for every
    user's event count, joined with the exact count so the classic
    one-sided overestimate is visible data, not a claim. The sketch build
    shuffles a fixed-size table regardless of stream cardinality; probes
    broadcast-join the sketch."""
    from ..functions.sketches import cms_build, cms_estimate

    ev = read_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    est = cms_estimate(sketch, ev, "user_id")
    exact = ev.groupBy(F.col("user_id").cast("string").alias("item")) \
        .agg(F.count(F.lit(1)).alias("exact_n"))
    return (est.join(exact, "item")
            .select(F.col("item").cast("bigint").alias("user_id"),
                    "cms_est", "exact_n",
                    (F.col("cms_est") - F.col("exact_n"))
                    .alias("overcount")))


def _sql_cms() -> str:
    h = _hex12_sql("CAST(g.r AS VARCHAR) || ':' || item")
    return f"""
WITH items AS (SELECT CAST(user_id AS VARCHAR) AS item FROM events),
cells AS (
  SELECT g.r AS row, {h} % 256 AS cell
  FROM items, unnest(generate_series(0, 3)) AS g(r)
),
sketch AS (SELECT row, cell, COUNT(*) AS total FROM cells GROUP BY 1, 2),
probes AS (SELECT DISTINCT item FROM items),
pcells AS (
  SELECT item, g.r AS row, {h} % 256 AS cell
  FROM probes, unnest(generate_series(0, 3)) AS g(r)
),
est AS (
  SELECT item, MIN(total) AS cms_est
  FROM pcells JOIN sketch USING (row, cell) GROUP BY item
),
exact AS (SELECT item, COUNT(*) AS exact_n FROM items GROUP BY item)
SELECT CAST(item AS BIGINT) AS user_id, cms_est, exact_n,
       cms_est - exact_n AS overcount
FROM est JOIN exact USING (item)
"""


SQL_CMS_USER_COUNTS = _sql_cms()


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite butterfly census (functions/graph.py butterfly_count)
    over the customer↔supplier purchasing graph — edge/wedge/butterfly
    counts + clustering coefficient, iterated from the low-degree
    customer side (the KDD-18 sum-deg² cost lever)."""
    from ..functions.graph import butterfly_count

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select("o_custkey", "l_suppkey"))
    return butterfly_count(edges, "o_custkey", "l_suppkey")


SQL_BUTTERFLIES = """
WITH e AS (
  SELECT DISTINCT o_custkey AS l, l_suppkey AS r
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
pairs AS (
  SELECT a.r AS r1, b.r AS r2, COUNT(*) AS n_common
  FROM e a JOIN e b ON a.l = b.l AND a.r < b.r
  GROUP BY a.r, b.r
),
stats AS (
  SELECT coalesce(SUM(n_common * (n_common - 1)), 0) // 2 AS butterflies,
         coalesce(COUNT(*), 0) AS right_pairs,
         coalesce(SUM(n_common), 0) AS wedges
  FROM pairs
),
totals AS (SELECT COUNT(*) AS n_edges, COUNT(DISTINCT l) AS n_left FROM e)
SELECT CAST(t.n_edges AS BIGINT) AS n_edges,
       CAST(t.n_left AS BIGINT) AS n_left,
       CAST(s.wedges AS BIGINT) AS wedges,
       CAST(s.right_pairs AS BIGINT) AS right_pairs,
       CAST(s.butterflies AS BIGINT) AS butterflies,
       CASE WHEN s.wedges > 0
            THEN CAST(4 * s.butterflies AS DOUBLE)
                 / CAST(s.wedges AS DOUBLE)
            ELSE -1.0 END AS clustering_coeff
FROM stats s, totals t
"""


BASKET_MINSUP = 3


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket 2-itemset mining over order baskets: support and
    lift for part pairs co-occurring in an order (the exact-counting core
    of FP-growth/Apriori at the pair level — Agrawal & Srikant, VLDB
    1994). Pair generation is per-basket (C(basket,2), baskets are small
    — linear in orders); lift = support·N / (n1·n2) is one IEEE divide
    of exact integers. The per-item counts broadcast-join back onto the
    vocabulary-sized pair table."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct()
    b2 = b.select(F.col("o").alias("o2"), F.col("p").alias("p2"))
    pairs = (b.join(b2, (F.col("o") == F.col("o2"))
                    & (F.col("p") < F.col("p2")))
             .groupBy("p", "p2")
             .agg(F.count(F.lit(1)).alias("support"))
             .filter(F.col("support") >= BASKET_MINSUP))
    item = b.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    n = b.agg(F.countDistinct("o").alias("n_orders"))
    out = (pairs
           .join(F.broadcast(item.select(F.col("p").alias("pa"),
                                         F.col("cnt").alias("n1"))),
                 F.col("p") == F.col("pa"))
           .join(F.broadcast(item.select(F.col("p").alias("pb"),
                                         F.col("cnt").alias("n2"))),
                 F.col("p2") == F.col("pb"))
           .crossJoin(F.broadcast(n)))
    lift = ((F.col("support") * F.col("n_orders")).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double"))
    return out.select(F.col("p").alias("p1"), "p2", "support",
                      "n1", "n2", lift.alias("lift"))


SQL_BASKET_RULES = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
pairs AS (
  SELECT a.p AS p1, c.p AS p2, COUNT(*) AS support
  FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {BASKET_MINSUP}
),
item AS (SELECT p, COUNT(*) AS cnt FROM b GROUP BY p),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM b)
SELECT pr.p1, pr.p2, pr.support, i1.cnt AS n1, i2.cnt AS n2,
       CAST(pr.support * n.n_orders AS DOUBLE)
         / CAST(i1.cnt * i2.cnt AS DOUBLE) AS lift
FROM pairs pr
JOIN item i1 ON pr.p1 = i1.p
JOIN item i2 ON pr.p2 = i2.p, n
"""


def q_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of hourly event counts
    (functions/timeseries.py grouped_trend): slope/intercept/r² from
    exact BIGINT moments."""
    from ..functions.timeseries import grouped_trend

    ev = read_table(spark, sf_dir, "events")
    return grouped_trend(ev, "ts", ["event_type"], 3600)


SQL_EVENT_TREND = """
WITH raw AS (
  SELECT event_type, CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS x0,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, x0 - MIN(x0) OVER (PARTITION BY event_type) AS x, y
  FROM raw
),
m AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM c GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_points,
  CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN -999.0
       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE), 9) END AS slope,
  CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN -999.0
       ELSE round((CAST(sy AS DOUBLE)
                   - (CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE))
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 9)
       END AS intercept,
  CASE WHEN n < 2 OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
       THEN -999.0
       ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                  * (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * syy - sy * sy AS DOUBLE)), 9) END AS r2
FROM m
"""


def q_event_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type time-weighted average of `value`
    (functions/timeseries.py time_weighted_avg_by_id) — LOCF-weighted
    mean over irregular samples, (ts, event_id)-ordered for a
    deterministic tie-break."""
    from ..functions.timeseries import time_weighted_avg_by_id

    ev = read_table(spark, sf_dir, "events")
    return time_weighted_avg_by_id(ev, "ts", "event_id", ["event_type"],
                                   "value")


SQL_EVENT_TWA = """
WITH r AS (
  SELECT event_type, epoch_us(ts) AS tus, event_id AS rid,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
s AS (
  SELECT event_type, tus, v,
         lead(tus) OVER (PARTITION BY event_type ORDER BY tus, rid) - tus
           AS dt
  FROM r
),
a AS (
  SELECT event_type, COUNT(*) AS n_points,
         SUM(CASE WHEN dt IS NOT NULL
                  THEN CAST(v * dt AS DECIMAL(38,6)) END) AS wsum,
         MAX(tus) - MIN(tus) AS span_us
  FROM s GROUP BY event_type
)
SELECT event_type, CAST(n_points AS BIGINT) AS n_points,
  CAST(span_us AS BIGINT) AS span_us,
  CASE WHEN span_us > 0
       THEN round(CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE), 9)
       ELSE -1.0 END AS twa
FROM a
"""


_STATS_TABLES = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
}


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style catalog statistics (catalog/statistics.py): per
    column of the dimension tables — row/null/exact-distinct counts in
    one scan per table."""
    from ..catalog.statistics import column_stats

    out = None
    for t, cols in _STATS_TABLES.items():
        s = column_stats(read_table(spark, sf_dir, t), t, cols)
        out = s if out is None else out.unionByName(s)
    return out


SQL_TABLE_STATS = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, '{c}' AS column,"
    f" COUNT(*) AS n_rows, COUNT(*) - COUNT({c}) AS n_nulls,"
    f" COUNT(DISTINCT {c}) AS n_distinct FROM {t}"
    for t, cols in _STATS_TABLES.items() for c in cols)


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation battery (catalog/expectations.py): key
    uniqueness, null gates, referential integrity across the star schema,
    accepted values and numeric ranges — one violation-count row per
    check."""
    from ..catalog.expectations import (expect_accepted_values,
                                        expect_not_null, expect_range,
                                        expect_references, expect_unique,
                                        run_battery)

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    nation = read_table(spark, sf_dir, "nation")
    return run_battery([
        ("customer_pk_unique", expect_unique(cust, ["c_custkey"])),
        ("orders_pk_unique", expect_unique(orders, ["o_orderkey"])),
        ("lineitem_pk_unique",
         expect_unique(li, ["l_orderkey", "l_linenumber"])),
        ("orders_custkey_not_null", expect_not_null(orders, "o_custkey")),
        ("orders_ref_customer",
         expect_references(orders, "o_custkey", cust, "c_custkey")),
        ("lineitem_ref_orders",
         expect_references(li, "l_orderkey", orders, "o_orderkey")),
        ("customer_ref_nation",
         expect_references(cust, "c_nationkey", nation, "n_nationkey")),
        ("orderstatus_accepted",
         expect_accepted_values(orders, "o_orderstatus", ["O", "F", "P"])),
        ("totalprice_range",
         expect_range(orders, "o_totalprice", 0.0, 10_000_000.0)),
    ])


SQL_EXPECTATIONS = """
SELECT 'customer_pk_unique' AS "check",
  CAST(coalesce(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT)
    AS n_violations,
  coalesce(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) = 0 AS passed
FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey)
UNION ALL
SELECT 'orders_pk_unique',
  CAST(coalesce(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT),
  coalesce(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) = 0
FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'lineitem_pk_unique',
  CAST(coalesce(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT),
  coalesce(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) = 0
FROM (SELECT COUNT(*) AS c FROM lineitem
      GROUP BY l_orderkey, l_linenumber)
UNION ALL
SELECT 'orders_custkey_not_null',
  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
  COUNT(*) - COUNT(o_custkey) = 0
FROM orders
UNION ALL
SELECT 'orders_ref_customer', CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem_ref_orders', CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'customer_ref_nation', CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
UNION ALL
SELECT 'orderstatus_accepted',
  CAST(coalesce(SUM(CASE WHEN o_orderstatus IS NOT NULL
       AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END), 0) AS BIGINT),
  coalesce(SUM(CASE WHEN o_orderstatus IS NOT NULL
       AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END), 0) = 0
FROM orders
UNION ALL
SELECT 'totalprice_range',
  CAST(coalesce(SUM(CASE WHEN o_totalprice IS NOT NULL
       AND (o_totalprice < 0.0 OR o_totalprice > 10000000.0)
       THEN 1 END), 0) AS BIGINT),
  coalesce(SUM(CASE WHEN o_totalprice IS NOT NULL
       AND (o_totalprice < 0.0 OR o_totalprice > 10000000.0)
       THEN 1 END), 0) = 0
FROM orders
"""


PSI_SPLIT = "1997-01-01"
PSI_BIN = 50_000.0
PSI_NBINS = 10


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index — the standard production drift monitor
    (credit-scoring lineage; PSI < 0.1 stable, > 0.25 shifted): compare
    the order-value distribution before vs after a split date over fixed
    equal-width bins with +0.5 smoothing (so empty bins contribute
    finitely). Per-bin rows plus a 'total' row carrying the index.

    Determinism: counts are integers; p and q are single IEEE divides;
    ln is NOT correctly rounded, so per-bin contributions round(9) and
    the total folds them in bin order before its own round(9)."""
    orders = read_table(spark, sf_dir, "orders")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    bin_c = F.least(F.floor(F.col("o_totalprice") / PSI_BIN),
                    F.lit(PSI_NBINS - 1)).cast("int")
    counts = (orders
              .select(bin_c.alias("bin"),
                      (F.col("o_orderdate") < split).alias("is_a"))
              .groupBy("bin")
              .agg(F.sum(F.when(F.col("is_a"), 1).otherwise(0))
                   .alias("n_a"),
                   F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
                   .alias("n_b")))
    # densify over the fixed bin range so empty bins smooth, not vanish
    bins = spark.range(PSI_NBINS).select(F.col("id").cast("int")
                                         .alias("bin"))
    dense = (bins.join(counts, "bin", "left")
             .select("bin",
                     F.coalesce("n_a", F.lit(0)).cast("bigint")
                     .alias("n_a"),
                     F.coalesce("n_b", F.lit(0)).cast("bigint")
                     .alias("n_b")))
    tot = dense.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    half_b = float(PSI_NBINS) * 0.5
    p = ((F.col("n_a").cast("double") + 0.5)
         / (F.col("ta").cast("double") + half_b))
    q = ((F.col("n_b").cast("double") + 0.5)
         / (F.col("tb").cast("double") + half_b))
    contrib = F.round((p - q) * F.log(p / q), 9)
    per_bin = (dense.crossJoin(F.broadcast(tot))
               .select("bin", "n_a", "n_b", contrib.alias("psi")))
    total = (per_bin
             .agg(F.round(F.aggregate(
                 F.array_sort(F.collect_list(F.struct("bin", "psi"))),
                 F.lit(0.0), lambda acc, s: acc + s["psi"]), 9)
                 .alias("psi"),
                 F.sum("n_a").alias("n_a"), F.sum("n_b").alias("n_b"))
             .select(F.lit(-1).cast("int").alias("bin"), "n_a", "n_b",
                     "psi"))
    return per_bin.unionByName(total)


SQL_PSI_DRIFT = f"""
WITH counts AS (
  SELECT CAST(least(floor(o_totalprice / {PSI_BIN}),
                    {PSI_NBINS - 1}) AS INT) AS bin,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
                  THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
                  THEN 0 ELSE 1 END) AS n_b
  FROM orders GROUP BY 1
),
dense AS (
  SELECT b.bin, CAST(coalesce(c.n_a, 0) AS BIGINT) AS n_a,
         CAST(coalesce(c.n_b, 0) AS BIGINT) AS n_b
  FROM (SELECT CAST(unnest(generate_series(0, {PSI_NBINS - 1})) AS INT)
          AS bin) b
  LEFT JOIN counts c USING (bin)
),
tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM dense),
per_bin AS (
  SELECT bin, n_a, n_b,
    round(((CAST(n_a AS DOUBLE) + 0.5)
             / (CAST(tot.ta AS DOUBLE) + {PSI_NBINS * 0.5})
           - (CAST(n_b AS DOUBLE) + 0.5)
             / (CAST(tot.tb AS DOUBLE) + {PSI_NBINS * 0.5}))
          * ln(((CAST(n_a AS DOUBLE) + 0.5)
                / (CAST(tot.ta AS DOUBLE) + {PSI_NBINS * 0.5}))
               / ((CAST(n_b AS DOUBLE) + 0.5)
                  / (CAST(tot.tb AS DOUBLE) + {PSI_NBINS * 0.5}))), 9)
      AS psi
  FROM dense, tot
)
SELECT bin, n_a, n_b, psi FROM per_bin
UNION ALL
SELECT CAST(-1 AS INT), CAST(SUM(n_a) AS BIGINT),
  CAST(SUM(n_b) AS BIGINT),
  round(list_reduce(list_prepend(0.0, list(psi ORDER BY bin)),
                    (a, b) -> a + b), 9)
FROM per_bin
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over the same binned
    order-value periods as psi_drift: D = max |F_a(bin) - F_b(bin)| over
    the cumulative bin fractions — the rank-based drift complement to
    PSI's likelihood-ratio view (PSI weights tail log-ratios; KS sees
    the largest CDF gap wherever it is). Counts are exact integers,
    each CDF value is one divide, per-bin |gap| rounds to 9; the max is
    order-independent.

    Output: per-bin rows (bin, cum_a, cum_b, gap) + a bin=-1 row with
    the D statistic."""
    orders = read_table(spark, sf_dir, "orders")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    bin_c = F.least(F.floor(F.col("o_totalprice") / PSI_BIN),
                    F.lit(PSI_NBINS - 1)).cast("int")
    counts = (orders
              .select(bin_c.alias("bin"),
                      (F.col("o_orderdate") < split).alias("is_a"))
              .groupBy("bin")
              .agg(F.sum(F.when(F.col("is_a"), 1).otherwise(0))
                   .alias("n_a"),
                   F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
                   .alias("n_b")))
    bins = spark.range(PSI_NBINS).select(F.col("id").cast("int")
                                         .alias("bin"))
    dense = (bins.join(counts, "bin", "left")
             .select("bin",
                     F.coalesce("n_a", F.lit(0)).cast("bigint")
                     .alias("n_a"),
                     F.coalesce("n_b", F.lit(0)).cast("bigint")
                     .alias("n_b"))
             # exactly PSI_NBINS rows (unique-keyed left join onto the
             # literal bin spine): no-op limit = plan-visible bound
             .limit(PSI_NBINS))
    w = Window.partitionBy(one_partition(F.col("bin"))).orderBy("bin")\
        .rowsBetween(Window.unboundedPreceding, 0)
    tot = dense.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    cum = (dense.crossJoin(F.broadcast(tot))
           .select("bin",
                   (F.sum("n_a").over(w).cast("double")
                    / F.col("ta").cast("double")).alias("cum_a"),
                   (F.sum("n_b").over(w).cast("double")
                    / F.col("tb").cast("double")).alias("cum_b")))
    per_bin = cum.select(
        "bin", F.round("cum_a", 9).alias("cum_a"),
        F.round("cum_b", 9).alias("cum_b"),
        F.round(F.abs(F.col("cum_a") - F.col("cum_b")), 9).alias("gap"))
    total = (per_bin.agg(F.max("gap").alias("gap"))
             .select(F.lit(-1).cast("int").alias("bin"),
                     F.lit(-1.0).alias("cum_a"),
                     F.lit(-1.0).alias("cum_b"), "gap"))
    return per_bin.unionByName(total)


SQL_KS_DRIFT = f"""
WITH counts AS (
  SELECT CAST(least(floor(o_totalprice / {PSI_BIN}),
                    {PSI_NBINS - 1}) AS INT) AS bin,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
                  THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
                  THEN 0 ELSE 1 END) AS n_b
  FROM orders GROUP BY 1
),
dense AS (
  SELECT b.bin, CAST(coalesce(c.n_a, 0) AS BIGINT) AS n_a,
         CAST(coalesce(c.n_b, 0) AS BIGINT) AS n_b
  FROM (SELECT CAST(unnest(generate_series(0, {PSI_NBINS - 1})) AS INT)
          AS bin) b
  LEFT JOIN counts c USING (bin)
),
tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM dense),
cum AS (
  SELECT bin,
    CAST(SUM(n_a) OVER (ORDER BY bin) AS DOUBLE)
      / CAST(tot.ta AS DOUBLE) AS cum_a,
    CAST(SUM(n_b) OVER (ORDER BY bin) AS DOUBLE)
      / CAST(tot.tb AS DOUBLE) AS cum_b
  FROM dense, tot
),
per_bin AS (
  SELECT bin, round(cum_a, 9) AS cum_a, round(cum_b, 9) AS cum_b,
         round(abs(cum_a - cum_b), 9) AS gap
  FROM cum
)
SELECT bin, cum_a, cum_b, gap FROM per_bin
UNION ALL
SELECT CAST(-1 AS INT), -1.0, -1.0, MAX(gap) FROM per_bin
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix (first-order Markov counts): for
    each consecutive event pair within a user's (ts, event_id)-ordered
    stream, count (from_type → to_type). The transition PROBABILITIES
    are the exact quotients of these hashed counts — product analytics'
    "what do users do next" primitive, and the model behind journey
    simulation. One lag() window partitioned by user + one compact
    aggregation; ties in ts break on event_id so the ordering is
    deterministic cross-engine."""
    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id")
    pairs = (ev.select("user_id", "event_type",
                       F.lead("event_type").over(w).alias("next_type"))
             .filter(F.col("next_type").isNotNull()))
    counts = (pairs.groupBy(F.col("event_type").alias("from_type"),
                            F.col("next_type").alias("to_type"))
              .agg(F.count(F.lit(1)).alias("n")))
    out_tot = counts.groupBy("from_type").agg(F.sum("n").alias("n_out"))
    return (counts.join(out_tot, "from_type")
            .select("from_type", "to_type", "n", "n_out",
                    (F.col("n").cast("double")
                     / F.col("n_out").cast("double")).alias("p")))


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS next_type
  FROM events
),
c AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT from_type, SUM(n) AS n_out FROM c GROUP BY from_type)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       CAST(t.n_out AS BIGINT) AS n_out,
       CAST(c.n AS DOUBLE) / CAST(t.n_out AS DOUBLE) AS p
FROM c JOIN t USING (from_type)
"""


def q_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (PrefixSpan's 2-sequence core, Pei et
    al. ICDE 2001): for each ordered type pair (a, b), how many users did
    a and LATER b — any gap, unlike the adjacent-only Markov transitions.
    Implemented on per-user first/last occurrence timestamps (min_ts(a) <
    max_ts(b) ⟺ "a eventually followed by b" for first-occurrence
    semantics): one compact aggregation to (user, type, min, max), then a
    per-user type×type comparison — 25 pairs per user, never an event-
    level self-join. Support ratio is an exact integer quotient."""
    ev = read_table(spark, sf_dir, "events")
    per = (ev.groupBy("user_id", "event_type")
           .agg(F.min(F.unix_micros("ts")).alias("first_us"),
                F.max(F.unix_micros("ts")).alias("last_us")))
    a = per.select("user_id", F.col("event_type").alias("a"),
                   F.col("first_us").alias("a_first"))
    b = per.select(F.col("user_id").alias("u2"),
                   F.col("event_type").alias("b"),
                   F.col("last_us").alias("b_last"))
    pairs = (a.join(b, (F.col("user_id") == F.col("u2"))
                    & (F.col("a") != F.col("b"))
                    & (F.col("a_first") < F.col("b_last")))
             .groupBy("a", "b").agg(F.countDistinct("user_id")
                                    .alias("support")))
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    return (pairs.crossJoin(F.broadcast(n_users))
            .select("a", "b", "support", "n_users",
                    (F.col("support").cast("double")
                     / F.col("n_users").cast("double")).alias("ratio")))


SQL_EVENTUALLY_FOLLOWS = """
WITH per AS (
  SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_us,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id, event_type
),
pairs AS (
  SELECT x.event_type AS a, y.event_type AS b,
         COUNT(DISTINCT x.user_id) AS support
  FROM per x JOIN per y
    ON x.user_id = y.user_id AND x.event_type <> y.event_type
   AND x.first_us < y.last_us
  GROUP BY 1, 2
),
n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
SELECT a, b, CAST(support AS BIGINT) AS support,
       CAST(n.n_users AS BIGINT) AS n_users,
       CAST(support AS DOUBLE) / CAST(n.n_users AS DOUBLE) AS ratio
FROM pairs, n
"""


# ---------------------------------------------------------------------------
# round 6: RFM quintile scoring + Otsu auto-threshold


def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring (Hughes, "Strategic Database Marketing",
    1994 — the recency/frequency/monetary quintile code every CRM
    segmentation starts from): per purchasing user, days since last
    purchase, purchase count, and total spend in exact cents, each
    ntile(5)-coded with a (value, user_id) total order so the quintile
    assignment is deterministic. R=5 is most recent, F=5 most frequent,
    M=5 highest spend; code packs r*100+f*10+m.

    Scale shape: each quintile rides util.global_ntile — a range
    shuffle + tiny offset table + broadcast join — instead of the
    partition-less ntile window that sorts every user through ONE task
    (the round-6 audit's single-reducer hazard). Bit-identical to the
    SQL window ntile, so the oracle hash still holds."""
    ev = read_table(spark, sf_dir, "events")
    buys = ev.filter(F.col("event_type") == "purchase")
    ref = buys.agg(F.max(F.to_date("ts")).alias("ref_day"))
    per_user = (buys.groupBy("user_id")
                .agg(F.max(F.to_date("ts")).alias("last_day"),
                     F.count(F.lit(1)).alias("frequency"),
                     F.sum(F.round(F.col("value") * 100).cast("bigint"))
                     .alias("monetary_cents"))
                .crossJoin(F.broadcast(ref))
                .select("user_id",
                        F.datediff("ref_day", "last_day").cast("int")
                        .alias("recency_days"),
                        F.col("frequency").cast("bigint"),
                        "monetary_cents"))
    from ..functions.util import global_ntile

    # three tilings re-reference the per-user aggregate (each
    # global_ntile cites its input twice); materialize it ONCE — a
    # per-user frame, already the small side of the computation
    per_user = per_user.localCheckpoint(eager=True)
    tiled = global_ntile(per_user, 5,
                         [F.asc("recency_days"), F.asc("user_id")], "tr")
    tiled = global_ntile(tiled, 5,
                         [F.desc("frequency"), F.asc("user_id")], "tf")
    tiled = global_ntile(tiled, 5,
                         [F.desc("monetary_cents"), F.asc("user_id")], "tm")
    scored = tiled.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        (6 - F.col("tr")).alias("r"), (6 - F.col("tf")).alias("f"),
        (6 - F.col("tm")).alias("m"))
    return scored.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        F.col("r").cast("int"), F.col("f").cast("int"),
        F.col("m").cast("int"),
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("int")
        .alias("rfm_code"))


SQL_RFM_SCORES = """
WITH buys AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
ref AS (SELECT MAX(d) AS ref_day FROM buys),
pu AS (
  SELECT user_id,
         CAST(datediff('day', MAX(d), (SELECT ref_day FROM ref)) AS INT)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(cents) AS BIGINT) AS monetary_cents
  FROM buys GROUP BY user_id
),
scored AS (
  SELECT user_id, recency_days, frequency, monetary_cents,
         6 - ntile(5) OVER (ORDER BY recency_days, user_id) AS r,
         6 - ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f,
         6 - ntile(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m
  FROM pu
)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
       CAST(r * 100 + f * 10 + m AS INT) AS rfm_code
FROM scored
"""


def q_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu automatic thresholding (Otsu, "A threshold selection method
    from gray-level histograms", IEEE SMC 1979) over the document-length
    histogram — the data-driven way to pick a filter cutoff instead of
    hand-tuning one: 32 equal-width bins, and for every candidate
    threshold t the between-class criterion
    (s0·w1 − s1·w0)² div (w0·w1) in EXACT integer arithmetic (the
    squared numerator stays < 2^63 for corpora into the millions of
    docs; go DECIMAL beyond). chosen = 1 marks the argmax (ties to the
    lowest t).

    Scale shape: one map-side-combined histogram shuffle, then the
    criterion sweep runs over 32 rows."""
    docs = read_table(spark, sf_dir, "documents")
    mm = docs.agg(F.min("n_chars").alias("lo"),
                  F.max("n_chars").alias("hi"))
    binned = (docs.crossJoin(F.broadcast(mm))
              .select(F.expr("(n_chars - lo) * 32"
                             " div (hi - lo + 1)").alias("bin"))
              .groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
              # bin in [0, 32) by construction: the no-op limit makes
              # the bound plan-visible for the cumsum window below
              .limit(32))
    w = Window.partitionBy(one_partition(F.col("bin"))).orderBy("bin")\
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin", "n",
        F.sum("n").over(w).alias("w0"),
        F.sum(F.col("bin") * F.col("n")).over(w).alias("s0"))
    tot = binned.agg(F.sum("n").alias("nt"),
                     F.sum(F.col("bin") * F.col("n")).alias("st"))
    crit = (cum.crossJoin(F.broadcast(tot))
            .select("bin", "n", "w0",
                    (F.col("nt") - F.col("w0")).alias("w1"),
                    "s0", (F.col("st") - F.col("s0")).alias("s1"))
            .withColumn(
                "crit",
                F.when((F.col("w0") > 0) & (F.col("w1") > 0),
                       F.expr("(s0 * w1 - s1 * w0) * (s0 * w1 - s1 * w0)"
                              " div (w0 * w1)")).otherwise(F.lit(0))
                .cast("bigint")))
    best = F.max(F.struct(F.col("crit"), (-F.col("bin")).alias("nb"))) \
        .over(Window.partitionBy(one_partition(F.col("bin"))))
    return (crit.withColumn(
        "chosen", ((F.col("crit") == best["crit"])
                   & (F.col("bin") == -best["nb"])).cast("int"))
        .select(F.col("bin").cast("int").alias("t"),
                F.col("n").cast("bigint"),
                F.col("w0").cast("bigint"), F.col("w1").cast("bigint"),
                "crit", "chosen"))


SQL_OTSU_THRESHOLD = """
WITH mm AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi
            FROM documents),
binned AS (
  SELECT (n_chars - mm.lo) * 32 // (mm.hi - mm.lo + 1) AS bin,
         COUNT(*) AS n
  FROM documents, mm GROUP BY 1
),
cum AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin) AS w0,
         SUM(bin * n) OVER (ORDER BY bin) AS s0
  FROM binned
),
tot AS (SELECT SUM(n) AS nt, SUM(bin * n) AS st FROM binned),
crit AS (
  SELECT bin, n, w0, tot.nt - w0 AS w1, s0, tot.st - s0 AS s1,
         CAST(CASE WHEN w0 > 0 AND tot.nt - w0 > 0 THEN
           (s0 * (tot.nt - w0) - (tot.st - s0) * w0)
           * (s0 * (tot.nt - w0) - (tot.st - s0) * w0)
           // (w0 * (tot.nt - w0))
         ELSE 0 END AS BIGINT) AS crit
  FROM cum, tot
),
best AS (
  SELECT bin AS best_bin FROM crit
  QUALIFY row_number() OVER (ORDER BY crit DESC, bin) = 1
)
SELECT CAST(c.bin AS INT) AS t, CAST(c.n AS BIGINT) AS n,
       CAST(c.w0 AS BIGINT) AS w0, CAST(c.w1 AS BIGINT) AS w1, c.crit,
       CAST(CASE WHEN c.bin = b.best_bin THEN 1 ELSE 0 END AS INT)
         AS chosen
FROM crit c, best b
"""


# ---------------------------------------------------------------------------
# round 6: golden-record survivorship over the fuzzy-match clusters


def q_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM golden-record survivorship — the step AFTER entity matching:
    records (originals ∪ typo'd duplicates) are clustered by the
    reciprocal-best fuzzy matches, and each cluster elects one surviving
    master record by the longest-name-then-lowest-id rule (the same
    deterministic survivorship canonical_docs applies to near-dup text).
    Output per record: its cluster, the cluster size, the elected
    survivor, and whether this record IS the survivor.

    Scale shape: the match pairs are candidate-bounded (fuzzy_match's
    prefix filter), the cluster map is one broadcast-size left join, and
    survivorship is a partial-aggregable argmax — max of
    (name_length, -id) — never a window over the record corpus."""
    pairs = (q_fuzzy_match(spark, sf_dir)
             .filter(F.col("is_best") == 1)
             .select("t_id", "c_custkey"))
    cust = (read_table(spark, sf_dir, "customer")
            .orderBy("c_custkey").limit(200)
            .select("c_custkey", "c_name"))
    pos = (F.col("c_custkey") % 8 + 4).cast("int")
    typos = cust.select(
        (F.col("c_custkey") + 100000).alias("id"),
        F.concat(F.expr("substr(c_name, 1, cast(c_custkey % 8 + 3"
                        " as int))"),
                 F.lit("~"),
                 F.col("c_name").substr(pos + 1, F.lit(1000)))
        .alias("name"))
    recs = (cust.select(F.col("c_custkey").alias("id"),
                        F.col("c_name").alias("name"))
            .unionByName(typos))
    cl = (recs.join(F.broadcast(pairs.select(F.col("t_id").alias("id"),
                                             F.col("c_custkey")
                                             .alias("cl"))),
                    "id", "left")
          .select("id", "name",
                  F.coalesce("cl", F.col("id")).alias("cluster_id")))
    surv = (cl.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.max(F.struct(F.length("name").alias("l"),
                                (-F.col("id")).alias("ni"))).alias("m"))
            .select("cluster_id", "n_members",
                    (-F.col("m.ni")).alias("survivor_id")))
    return (cl.join(surv, "cluster_id")
            .select(F.col("id").alias("record_id"), "cluster_id",
                    F.col("n_members").cast("bigint"),
                    "survivor_id",
                    (F.col("id") == F.col("survivor_id")).cast("int")
                    .alias("keep")))


def _golden_sql() -> str:
    return f"""
WITH fm AS MATERIALIZED (
  SELECT t_id, c_custkey FROM (
{SQL_FUZZY_MATCH}
  ) WHERE is_best = 1
),
cust AS (
  SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 200
),
recs AS (
  SELECT c_custkey AS id, c_name AS name FROM cust
  UNION ALL
  SELECT c_custkey + 100000 AS id,
         substr(c_name, 1, CAST(c_custkey % 8 + 3 AS INT)) || '~' ||
         substr(c_name, CAST(c_custkey % 8 + 4 AS INT) + 1, 1000) AS name
  FROM cust
),
cl AS (
  SELECT r.id, r.name, COALESCE(fm.c_custkey, r.id) AS cluster_id
  FROM recs r LEFT JOIN fm ON fm.t_id = r.id
),
surv AS (
  SELECT cluster_id, id AS survivor_id FROM cl
  QUALIFY row_number() OVER (PARTITION BY cluster_id
                             ORDER BY length(name) DESC, id) = 1
),
cnt AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM cl GROUP BY 1)
SELECT cl.id AS record_id, cl.cluster_id, cnt.n_members,
       surv.survivor_id,
       CAST(CASE WHEN cl.id = surv.survivor_id THEN 1 ELSE 0 END AS INT)
         AS keep
FROM cl JOIN surv USING (cluster_id) JOIN cnt USING (cluster_id)
"""


SQL_GOLDEN_RECORDS = _golden_sql()


# ---------------------------------------------------------------------------
# round 6: graph — label-propagation communities, deterministic walks

_GRAPH_EDGES_SQL = """
pairs AS MATERIALIZED (
  SELECT DISTINCT least(o_custkey, (-l_suppkey - 1)) AS u,
         greatest(o_custkey, (-l_suppkey - 1)) AS v
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_custkey <> (-l_suppkey - 1)
),
edges AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM pairs
  UNION ALL SELECT v AS src, u AS dst FROM pairs
)"""


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (functions/graph.py
    lpa_communities, Raghavan et al. 2007) over the customer↔supplier
    bipartite graph, 3 unrolled rounds — the near-linear community
    detector beside the exact CC clusters: every node adopts its
    neighborhood's majority label, ties to the smallest label, so the
    result is engine-independent and the oracle unrolls the same
    rounds."""
    from ..functions.graph import lpa_communities

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("a"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("b"))
             .distinct())
    return lpa_communities(pairs, "a", "b", rounds=3)


def _lpa_sql(rounds: int = 3) -> str:
    ctes = [_GRAPH_EDGES_SQL,
            "l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"]
    for r in range(1, rounds + 1):
        ctes.append(f"""c{r} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS cnt
  FROM edges e JOIN l{r - 1} l ON l.node = e.src GROUP BY 1, 2
),
l{r} AS MATERIALIZED (
  SELECT node, label FROM c{r}
  QUALIFY row_number() OVER (PARTITION BY node
                             ORDER BY cnt DESC, label) = 1
)""")
    return (f"WITH {','.join(ctes)}\n"
            f"SELECT node, CAST(label AS BIGINT) AS community FROM "
            f"l{rounds}")


SQL_LPA_COMMUNITIES = _lpa_sql()


def q_fdr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control (Benjamini & Hochberg, JRSS-B
    1995) over the per-event-type Mann-Whitney battery — the multiple-
    testing layer every metrics platform needs once it runs one test
    per segment. Two-sided p-values come from the Abramowitz-Stegun
    26.2.17 normal-CDF polynomial (identical literal coefficients on
    both engines; exp() is the one 1-ulp-risk op, so p rounds to 1e-6
    before the BH comparison — and the BH decision compares EXACT
    integers p_e6 · m vs rank · q_e6 with q = 0.10). The battery is
    category-bounded (5 event types), certified by a plan-visible
    limit; rejected = rank <= the largest i with p_(i) <= i·q/m
    (the step-up rule, applied via running max of passing ranks)."""
    from ..functions.hypothesis import mann_whitney_u
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (kmv_hash(F.col("user_id")) % 2).cast("int").alias("grp"))
    mw = mann_whitney_u(labeled, ["event_type"], "cents", "grp")
    z = F.abs(F.col("z_e6").cast("double") / F.lit(1e6))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * z)
    poly = (F.lit(0.319381530) * t
            - F.lit(0.356563782) * t * t
            + F.lit(1.781477937) * t * t * t
            - F.lit(1.821255978) * t * t * t * t
            + F.lit(1.330274429) * t * t * t * t * t)
    pdf = F.exp(-z * z / F.lit(2.0)) / F.lit(2.5066282746310002)
    p_two = F.lit(2.0) * pdf * poly          # 2·(1 − Φ(|z|))
    from ..functions.hypothesis import bh_stepup

    scored = (mw.select("event_type", "z_e6",
                        F.round(p_two * F.lit(1e6)).cast("bigint")
                        .alias("p_e6"))
              .limit(64))                     # category-bounded battery
    return bh_stepup(scored, "p_e6", "event_type", q_ppm=100_000) \
        .select("event_type", "z_e6", "p_e6", "rank", "m", "rejected")


SQL_FDR_BATTERY = f"""
WITH mw AS (
{SQL_MANN_WHITNEY}
),
p AS (
  SELECT event_type, z_e6,
    CAST(round(
      CAST(2.0 AS DOUBLE)
      * (exp(-(abs(CAST(z_e6 AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
               * abs(CAST(z_e6 AS DOUBLE) / CAST(1000000.0 AS DOUBLE))
               / CAST(2.0 AS DOUBLE)))
         / CAST(2.5066282746310002 AS DOUBLE))
      * (CAST(0.319381530 AS DOUBLE) * t
         - CAST(0.356563782 AS DOUBLE) * t * t
         + CAST(1.781477937 AS DOUBLE) * t * t * t
         - CAST(1.821255978 AS DOUBLE) * t * t * t * t
         + CAST(1.330274429 AS DOUBLE) * t * t * t * t * t)
      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS p_e6
  FROM (
    SELECT event_type, z_e6,
           CAST(1.0 AS DOUBLE)
             / (CAST(1.0 AS DOUBLE) + CAST(0.2316419 AS DOUBLE)
                * abs(CAST(z_e6 AS DOUBLE)
                      / CAST(1000000.0 AS DOUBLE))) AS t
    FROM mw
  )
),
r AS (
  SELECT event_type, z_e6, p_e6,
         row_number() OVER (ORDER BY p_e6, event_type) AS rank,
         COUNT(*) OVER () AS m
  FROM p
),
s AS (
  SELECT *, CASE WHEN p_e6 * m <= rank * 100000 THEN 1 ELSE 0 END
           AS passes
  FROM r
)
SELECT event_type, z_e6, p_e6, CAST(rank AS INT) AS rank,
       CAST(m AS INT) AS m,
       CAST(CASE WHEN rank <= MAX(CASE WHEN passes = 1 THEN rank
                                       ELSE 0 END) OVER ()
                 THEN 1 ELSE 0 END AS INT) AS rejected
FROM s
"""


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (the Micci-Barreca 2001 /
    Kaggle-canon categorical encoder, LOO variant): each row's category
    is encoded as the mean target of OTHER rows in the category,
    enc_i = (S_c − x_i)/(n_c − 1) — the leakage-free mean that a
    K-fold pipeline approximates. Rows collapse to distinct
    (category, value) pairs (the encoding depends on the row only
    through its value), so the output is compact and every input to
    the one divide is an exact BIGINT; singleton categories fall back
    to the global mean (the standard degenerate rule).

    One map-side-combined groupBy on (category, value) + two tiny
    broadcast margins — no window, no per-row state."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    cells = (base.groupBy("event_type", "cents")
             .agg(F.count(F.lit(1)).cast("long").alias("n_rows")))
    cat = (base.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_c"),
                F.sum("cents").cast("long").alias("s_c")))
    glob = base.agg(F.count(F.lit(1)).cast("long").alias("n_g"),
                    F.sum("cents").cast("long").alias("s_g"))
    j = (cells.join(F.broadcast(cat), "event_type")
         .crossJoin(F.broadcast(glob)))
    loo = (F.col("s_c").cast("double") - F.col("cents").cast("double")) \
        / (F.col("n_c").cast("double") - F.lit(1.0))
    gmean = F.col("s_g").cast("double") / F.col("n_g").cast("double")
    enc = F.when(F.col("n_c") > 1, loo).otherwise(gmean)
    return j.select(
        "event_type", "cents", "n_rows", "n_c", "s_c",
        F.round(enc * F.lit(1_000_000.0)).cast("bigint")
        .alias("enc_e6"))


SQL_TARGET_ENCODING = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
cells AS (
  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM base GROUP BY 1, 2
),
cat AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_c,
         CAST(SUM(cents) AS BIGINT) AS s_c
  FROM base GROUP BY 1
),
g_all AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(cents) AS BIGINT) AS s_g
  FROM base
)
SELECT cells.event_type, cents, n_rows, n_c, s_c,
       CAST(round(CASE WHEN n_c > 1
                       THEN (CAST(s_c AS DOUBLE) - CAST(cents AS DOUBLE))
                            / (CAST(n_c AS DOUBLE) - CAST(1.0 AS DOUBLE))
                       ELSE CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                  END * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS enc_e6
FROM cells JOIN cat USING (event_type) CROSS JOIN g_all
"""


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (functions/hypothesis.py
    cuped_adjust, Deng et al. WSDM 2013): Y = post-window purchase
    count per user, X = pre-window activity count (the pre-experiment
    covariate), variant = the md5 50/50 split. On this homogeneous
    synthetic fixture corr(X, Y) ≈ 0, so the honest reduction is ≈ 0 —
    the hand-frame pytest demonstrates real reduction on correlated
    data; here the value is the exact, hash-checked adjustment
    algebra."""
    from ..functions.hypothesis import cuped_adjust
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    per = (ev.groupBy("user_id")
           .agg(F.sum((F.col("ts") < split).cast("int")).alias("x"),
                F.sum(((F.col("ts") >= split)
                       & (F.col("event_type") == "purchase"))
                      .cast("int")).alias("y")))
    base = per.select(
        "x", "y", (kmv_hash(F.col("user_id")) % 2).cast("int")
        .alias("g"))
    return cuped_adjust(base, "y", "x", "g")


SQL_CUPED = f"""
WITH per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y,
         CAST({_MW_HASH} AS INT) AS g
  FROM events GROUP BY user_id
),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM per
),
pv AS (
  SELECT g AS variant, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(x) AS BIGINT) AS gx, CAST(SUM(y) AS BIGINT) AS gy,
         CAST(SUM(x * x) AS BIGINT) AS gxx,
         CAST(SUM(y * y) AS BIGINT) AS gyy,
         CAST(SUM(x * y) AS BIGINT) AS gxy
  FROM per GROUP BY 1
),
d AS (
  SELECT variant, ng, gx, gy,
    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         ELSE CAST(0.0 AS DOUBLE) END AS theta,
    CAST(gy AS DOUBLE) / CAST(ng AS DOUBLE) AS my,
    CAST(gx AS DOUBLE) / CAST(ng AS DOUBLE) AS mx,
    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
    CAST(gyy AS DOUBLE) / CAST(ng AS DOUBLE)
      - (CAST(gy AS DOUBLE) / CAST(ng AS DOUBLE))
        * (CAST(gy AS DOUBLE) / CAST(ng AS DOUBLE)) AS var_y,
    CAST(gxx AS DOUBLE) / CAST(ng AS DOUBLE)
      - (CAST(gx AS DOUBLE) / CAST(ng AS DOUBLE))
        * (CAST(gx AS DOUBLE) / CAST(ng AS DOUBLE)) AS var_x,
    CAST(gxy AS DOUBLE) / CAST(ng AS DOUBLE)
      - (CAST(gx AS DOUBLE) / CAST(ng AS DOUBLE))
        * (CAST(gy AS DOUBLE) / CAST(ng AS DOUBLE)) AS cov_xy
  FROM pv CROSS JOIN pooled
),
v AS (
  SELECT variant, ng, gx, gy, theta, my,
         my - theta * (mx - xbar) AS mycv, var_y,
         var_y + theta * theta * var_x
           - CAST(2.0 AS DOUBLE) * theta * cov_xy AS var_cv
  FROM d
)
SELECT 'variant' AS kind, CAST(variant AS INT) AS variant,
       ng AS n, gx AS sum_x, gy AS sum_y,
       CAST(round(my * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
         AS mean_y_e6,
       CAST(round(mycv * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
         AS mean_ycv_e6,
       CAST(round(var_y * CAST(1000000000.0 AS DOUBLE)) AS BIGINT)
         AS var_y_e9,
       CAST(round(var_cv * CAST(1000000000.0 AS DOUBLE)) AS BIGINT)
         AS var_ycv_e9
FROM v
UNION ALL
SELECT 'summary', CAST(-1 AS INT),
       CAST(round(MIN(theta) * CAST(1000000.0 AS DOUBLE)) AS BIGINT),
       CAST(round(SUM(CASE WHEN variant = 1 THEN my ELSE -my END)
                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT),
       CAST(round(SUM(CASE WHEN variant = 1 THEN mycv ELSE -mycv END)
                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT),
       CAST(CASE WHEN SUM(var_y) > 0
                 THEN round((CAST(1.0 AS DOUBLE)
                             - SUM(var_cv) / SUM(var_y))
                            * CAST(1000000.0 AS DOUBLE))
                 ELSE 0.0 END AS BIGINT),
       CAST(CASE WHEN SUM(var_cv / CAST(ng AS DOUBLE)) > 0
                 THEN round(SUM(CASE WHEN variant = 1 THEN mycv
                                     ELSE -mycv END)
                            / sqrt(SUM(var_cv / CAST(ng AS DOUBLE)))
                            * CAST(10000.0 AS DOUBLE))
                 ELSE 0.0 END AS BIGINT),
       CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
FROM v
"""


def q_random_group_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-sample replication CI for the mean order value
    (functions/hypothesis.py random_group_ci): 16 deterministic
    hash-bit half-samples, replicate means, and the random-group /
    BRR-style standard error + 95% CI — resampling inference with no
    RNG, so even the CI bounds hash-match the oracle. The shuffle is 16
    rows per task regardless of input size (the CMS/Bloom pattern)."""
    from ..functions.hypothesis import random_group_ci
    from ..functions.sketches import kmv_hash

    orders = read_table(spark, sf_dir, "orders")
    base = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("cents"),
        kmv_hash(F.col("o_orderkey")).alias("h"))
    return random_group_ci(base, "cents", "h", n_reps=16)


_RG_HASH = ("list_reduce(list_transform(string_split_regex("
            "substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(a,b) -> a*16+b)")

SQL_RANDOM_GROUP_CI = f"""
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         {_RG_HASH} AS h
  FROM orders
),
tagged AS (
  SELECT v, rep FROM base,
       (SELECT unnest(range(0, 16)) AS rep)
  WHERE (h >> rep) & 1 = 1
),
got AS (
  SELECT CAST(rep AS INT) AS rep, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sum_v
  FROM tagged GROUP BY 1
),
reps AS (
  -- densified against the 0..n_reps-1 replicate domain: an empty
  -- replicate still emits its row and deviates 0 while R stays fixed
  SELECT CAST(dom.rep AS INT) AS rep,
         CAST(COALESCE(got.n, 0) AS BIGINT) AS n,
         CAST(COALESCE(got.sum_v, 0) AS BIGINT) AS sum_v
  FROM (SELECT unnest(range(0, 16)) AS rep) dom
  LEFT JOIN got ON got.rep = dom.rep
),
full_s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS fn, CAST(SUM(v) AS BIGINT) AS fs
  FROM base
),
summ AS (
  SELECT SUM(CASE WHEN n > 0 THEN
             (CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE)
              - CAST(fs AS DOUBLE) / CAST(fn AS DOUBLE))
             * (CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(fs AS DOUBLE) / CAST(fn AS DOUBLE))
             ELSE 0.0 END) AS ss,
         MIN(fn) AS fn, MIN(fs) AS fs
  FROM reps CROSS JOIN full_s
)
SELECT rep, n, sum_v,
       CAST(CASE WHEN n > 0 THEN
            round(CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE)
                  * CAST(10000.0 AS DOUBLE)) ELSE 0 END AS BIGINT)
         AS mean_e4,
       CAST(-1 AS BIGINT) AS se_e4,
       CAST(-1 AS BIGINT) AS ci_lo_e4,
       CAST(-1 AS BIGINT) AS ci_hi_e4
FROM reps
UNION ALL
SELECT CAST(-1 AS INT), fn, fs,
       CAST(round(CAST(fs AS DOUBLE) / CAST(fn AS DOUBLE)
                  * CAST(10000.0 AS DOUBLE)) AS BIGINT),
       CAST(round(sqrt(ss / CAST(16.0 AS DOUBLE))
                  * CAST(10000.0 AS DOUBLE)) AS BIGINT),
       CAST(round((CAST(fs AS DOUBLE) / CAST(fn AS DOUBLE)
                   - CAST(1.96 AS DOUBLE)
                     * sqrt(ss / CAST(16.0 AS DOUBLE)))
                  * CAST(10000.0 AS DOUBLE)) AS BIGINT),
       CAST(round((CAST(fs AS DOUBLE) / CAST(fn AS DOUBLE)
                   + CAST(1.96 AS DOUBLE)
                     * sqrt(ss / CAST(16.0 AS DOUBLE)))
                  * CAST(10000.0 AS DOUBLE)) AS BIGINT)
FROM summ
"""


def q_pruning_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-quality evaluation: how many of 32 size-balanced files
    does a point-range predicate touch under a Z-ORDER layout vs the
    natural (orderkey) layout? Files are global_ntile(32) assignments
    over the layout's sort key (distributed — no single-reducer sort);
    per-file min/max of both predicate columns decide skipping, the
    Delta/Iceberg OPTIMIZE ZORDER argument as a hashed, oracle-checked
    number instead of a pytest assertion (tests/test_layout.py proves
    the same effect at file granularity on disk).

    Output per (layout, predicate): n_files, files_hit, rows_in_hit —
    exact integers; the z-order layout must touch fewer files than the
    natural layout on BOTH dimensions (pytest-pinned)."""
    from ..functions.layout import zvalue
    from ..functions.util import global_ntile

    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"),
                     F.lit("1992-01-01").cast("date"))
    base = orders.select("o_orderkey", "o_custkey", day.alias("day"),
                         zvalue(F.col("o_custkey"), day, bits=16)
                         .alias("zval"))

    def layout(df, order_cols, name):
        tiled = global_ntile(df, 32, order_cols, "file_id")
        # localCheckpoint: the two predicate branches below reference
        # this frame twice — without materialization the ntile subtree
        # (monotonically_increasing_id inside global_order_scan) would
        # re-derive per reference with fresh nondeterministic ids (the
        # rfm/contrastive lesson, NOTES r7); 32 rows, so it's free
        per_file = (tiled.groupBy("file_id")
                    .agg(F.count(F.lit(1)).alias("n_rows"),
                         F.min("o_custkey").alias("c_lo"),
                         F.max("o_custkey").alias("c_hi"),
                         F.min("day").alias("d_lo"),
                         F.max("day").alias("d_hi"))
                    .localCheckpoint(eager=True))
        out = None
        for pred, lo_c, hi_c in (("cust", "c_lo", "c_hi"),
                                 ("day", "d_lo", "d_hi")):
            lo, hi = (100, 200) if pred == "cust" else (1200, 1300)
            hit = (per_file
                   .agg(F.count(F.lit(1)).alias("n_files"),
                        F.sum(((F.col(lo_c) <= hi)
                               & (F.col(hi_c) >= lo)).cast("long"))
                        .alias("files_hit"),
                        F.sum(F.when((F.col(lo_c) <= hi)
                                     & (F.col(hi_c) >= lo),
                                     F.col("n_rows")).otherwise(0))
                        .alias("rows_in_hit"))
                   .select(F.lit(name).alias("layout"),
                           F.lit(pred).alias("pred"),
                           F.col("n_files").cast("bigint"),
                           F.col("files_hit").cast("bigint"),
                           F.col("rows_in_hit").cast("bigint")))
            out = hit if out is None else out.unionByName(hit)
        return out

    z = layout(base, [F.col("zval").asc(), F.col("o_orderkey").asc()],
               "zorder")
    nat = layout(base, [F.col("o_orderkey").asc()], "natural")
    return z.unionByName(nat)


def _pruning_sql() -> str:
    from ..functions.layout import zvalue_sql

    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    z = zvalue_sql("o_custkey", day, bits=16)
    branches = []
    for name, order in (("zorder", "zval, o_orderkey"),
                        ("natural", "o_orderkey")):
        for pred, lo, hi, locol, hicol in (
                ("cust", 100, 200, "c_lo", "c_hi"),
                ("day", 1200, 1300, "d_lo", "d_hi")):
            branches.append(f"""
SELECT * FROM (
WITH base AS (
  SELECT o_orderkey, o_custkey, {day} AS day, {z} AS zval FROM orders
),
tiled AS (
  SELECT *, ntile(32) OVER (ORDER BY {order}) AS file_id FROM base
),
pf AS (
  SELECT file_id, COUNT(*) AS n_rows,
         MIN(o_custkey) AS c_lo, MAX(o_custkey) AS c_hi,
         MIN(day) AS d_lo, MAX(day) AS d_hi
  FROM tiled GROUP BY 1
)
SELECT '{name}' AS layout, '{pred}' AS pred,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN {locol} <= {hi} AND {hicol} >= {lo}
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       CAST(SUM(CASE WHEN {locol} <= {hi} AND {hicol} >= {lo}
                     THEN n_rows ELSE 0 END) AS BIGINT) AS rows_in_hit
FROM pf
) AS pe_{name}_{pred}""")
    return "\nUNION ALL\n".join(branches)


SQL_PRUNING_EVAL = _pruning_sql()


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution — the marketing-
    analytics credit assignment (e.g. Kaushik's web-analytics canon):
    each purchase event credits the user's FIRST non-purchase touch and
    the LAST non-purchase touch strictly before it. Per channel
    (event type): n_last_touch, n_first_touch; conversions with no
    prior touch land in the 'none' bucket.

    Determinism: the per-user total order is (unix MICROSECONDS,
    event_id) — events.parquet is TIMESTAMP(NANOS) and Spark reads it
    µs-truncated (NOTES.md), so ordering by raw ts could disagree with
    DuckDB on sub-µs ties; epoch_us on both engines pins it. Window
    frames are per-user (distribute); counts are exact integers."""
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (Window.partitionBy("user_id").orderBy(us.asc(), "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col("event_type") != "purchase",
                   F.col("event_type"))
    tagged = (ev.withColumn(
        "last_touch", F.last(touch, ignorenulls=True).over(w))
        .withColumn("first_touch", F.first(touch, ignorenulls=True)
                    .over(w))
        .filter(F.col("event_type") == "purchase"))
    last = (tagged.groupBy(F.coalesce("last_touch", F.lit("none"))
                           .alias("channel"))
            .agg(F.count(F.lit(1)).alias("n_last_touch")))
    first = (tagged.groupBy(F.coalesce("first_touch", F.lit("none"))
                            .alias("channel"))
             .agg(F.count(F.lit(1)).alias("n_first_touch")))
    return (last.join(first, "channel", "full")
            .select("channel",
                    F.coalesce("n_last_touch", F.lit(0)).cast("bigint")
                    .alias("n_last_touch"),
                    F.coalesce("n_first_touch", F.lit(0)).cast("bigint")
                    .alias("n_first_touch")))


SQL_ATTRIBUTION = """
WITH t AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS touch
  FROM events
),
w AS (
  SELECT event_type,
         last_value(touch IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_touch,
         first_value(touch IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS first_touch
  FROM t
),
conv AS (SELECT * FROM w WHERE event_type = 'purchase'),
l AS (SELECT COALESCE(last_touch, 'none') AS channel,
             COUNT(*) AS n_last_touch FROM conv GROUP BY 1),
f AS (SELECT COALESCE(first_touch, 'none') AS channel,
             COUNT(*) AS n_first_touch FROM conv GROUP BY 1)
SELECT COALESCE(l.channel, f.channel) AS channel,
       CAST(COALESCE(n_last_touch, 0) AS BIGINT) AS n_last_touch,
       CAST(COALESCE(n_first_touch, 0) AS BIGINT) AS n_first_touch
FROM l FULL JOIN f USING (channel)
"""


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity (functions/graph.py modularity) of the
    3-round LPA partition over the same customer↔supplier graph — the
    quality score that tells you whether lpa_communities found real
    structure. Per-community contributions in 1e-9 units; exact
    n_nodes/e_intra/d_sum beside them."""
    from ..functions.graph import lpa_communities, modularity

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # compact (a, b) pair set — checkpoint once (r12): both the LPA
    # rounds' edge build and modularity's canonical undirected set read
    # it, and each previously re-ran the orders⋈lineitem join+distinct
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("a"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("b"))
             .distinct().localCheckpoint(eager=True))
    labels = lpa_communities(pairs, "a", "b", rounds=3)
    return modularity(pairs, "a", "b", labels)


def _modularity_sql(rounds: int = 3) -> str:
    """Reuses _lpa_sql's CTE chain for the labels, then restates the
    modularity algebra over the same canonical undirected pairs."""
    lpa = _lpa_sql(rounds)
    body = lpa[len("WITH "):lpa.index("\nSELECT")]
    return f"""WITH {body},
lab AS (SELECT node, CAST(label AS BIGINT) AS community FROM l{rounds}),
m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY 1
),
intra AS (
  SELECT lu.community, COUNT(*) AS e_intra
  FROM pairs p
  JOIN lab lu ON lu.node = p.u
  JOIN lab lv ON lv.node = p.v
  WHERE lu.community = lv.community
  GROUP BY 1
),
per AS (
  SELECT l.community, COUNT(*) AS n_nodes, SUM(d.deg) AS d_sum
  FROM deg d JOIN lab l USING (node) GROUP BY 1
)
SELECT per.community,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(intra.e_intra, 0) AS BIGINT) AS e_intra,
       CAST(d_sum AS BIGINT) AS d_sum,
       CAST(round((CAST(COALESCE(intra.e_intra, 0) AS DOUBLE)
                   / CAST(m AS DOUBLE)
                   - (CAST(d_sum AS DOUBLE)
                      / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE)))
                     * (CAST(d_sum AS DOUBLE)
                        / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE))))
                  * CAST(1000000000.0 AS DOUBLE)) AS BIGINT) AS q_e9
FROM per LEFT JOIN intra USING (community) CROSS JOIN m1
"""


SQL_MODULARITY = _modularity_sql()


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DeepWalk-style walk corpus (functions/graph.py
    random_walks, Perozzi et al. KDD 2014): one 3-hop walk per vertex of
    the customer↔supplier graph, each hop the neighbor minimizing the
    portable 48-bit md5 fold of "cur:step:next" — RNG-free, so the walk
    corpus (the training data for graph embeddings) is reproducible on
    any engine and oracle-checkable."""
    from ..functions.graph import random_walks

    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("a"),
                     (-F.col("l_suppkey") - F.lit(1)).alias("b"))
             .distinct())
    return random_walks(pairs, "a", "b", steps=3)


def _walks_sql(steps: int = 3) -> str:
    ctes = [_GRAPH_EDGES_SQL,
            "w0 AS (SELECT DISTINCT src AS start, src AS cur FROM edges)"]
    for t in range(1, steps + 1):
        h = _hex12_sql("CAST(e.src AS VARCHAR) || ':' || "
                       f"'{t}' || ':' || CAST(e.dst AS VARCHAR)")
        prev_cols = ", ".join(f"w.n{i}" for i in range(1, t))
        sel = f"w.start{', ' + prev_cols if prev_cols else ''}"
        # per-NODE transition table (the hop hash is walk-independent),
        # mirroring the Spark side's hub-concentration-immune shape
        ctes.append(f"""tr{t} AS MATERIALIZED (
  SELECT e.src, e.dst FROM edges e
  QUALIFY row_number() OVER (PARTITION BY e.src
                             ORDER BY {h}, e.dst) = 1
),
w{t} AS MATERIALIZED (
  SELECT {sel}, tr.dst AS n{t}, tr.dst AS cur
  FROM w{t - 1} w JOIN tr{t} tr ON tr.src = w.cur
)""")
    cols = ", ".join(f"n{t}" for t in range(1, steps + 1))
    return f"WITH {','.join(ctes)}\nSELECT start, {cols} FROM w{steps}"


SQL_RANDOM_WALKS = _walks_sql()


# ---------------------------------------------------------------------------
# round 6: KMV set difference, Holt trend forecast, OHLC bars, A/B z-test


def q_kmv_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based set-DIFFERENCE estimation (functions/sketches.py
    kmv_difference_estimate — the theta-sketch a-not-b operation):
    |click users \\ signup users| and the reverse, each estimated from
    two k=16 KMV sketches beside the exact anti-join controls. The churn
    /new-keys planner query: answered from fixed-size sketches, never an
    anti-join over the corpus."""
    from ..functions.sketches import kmv_difference_estimate

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    signups = ev.filter(F.col("event_type") == "signup")
    est = kmv_difference_estimate(clicks, signups, "user_id", k=16)
    cu = clicks.select("user_id").distinct()
    su = signups.select("user_id").distinct()
    exact = (cu.join(su, "user_id", "left_anti")
             .agg(F.count(F.lit(1)).alias("exact_anotb"))
             .crossJoin(su.join(cu, "user_id", "left_anti")
                        .agg(F.count(F.lit(1)).alias("exact_bnota"))))
    return est.crossJoin(F.broadcast(exact))


SQL_KMV_DIFFERENCE = f"""
WITH ah AS (
  SELECT DISTINCT {_hex12_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'click'
),
bh AS (
  SELECT DISTINCT {_hex12_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events WHERE event_type = 'signup'
),
am AS (SELECT h FROM ah ORDER BY h LIMIT 16),
bm AS (SELECT h FROM bh ORDER BY h LIMIT 16),
um AS (SELECT DISTINCT h FROM (SELECT h FROM am UNION ALL
                               SELECT h FROM bm) t
       ORDER BY h LIMIT 16),
tagged AS (
  SELECT um.h,
    CASE WHEN am.h IS NOT NULL AND bm.h IS NULL THEN 1 ELSE 0 END
      AS a_only,
    CASE WHEN bm.h IS NOT NULL AND am.h IS NULL THEN 1 ELSE 0 END
      AS b_only
  FROM um LEFT JOIN am ON am.h = um.h LEFT JOIN bm ON bm.h = um.h
),
agg AS (
  SELECT CAST(SUM(a_only) AS BIGINT) AS d_ab_num,
         CAST(SUM(b_only) AS BIGINT) AS d_ba_num,
         CAST(COUNT(*) AS BIGINT) AS n_union_mins,
         MAX(h) AS kth
  FROM tagged
),
est AS (
  SELECT d_ab_num, d_ba_num, n_union_mins,
    CAST(CASE WHEN n_union_mins < 16 THEN n_union_mins
              ELSE floor(15.0 * 281474976710656.0 / kth) END AS BIGINT)
      AS union_est
  FROM agg
),
cu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
su AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
exact AS (
  SELECT (SELECT COUNT(*) FROM cu
          WHERE user_id NOT IN (SELECT user_id FROM su)) AS exact_anotb,
         (SELECT COUNT(*) FROM su
          WHERE user_id NOT IN (SELECT user_id FROM cu)) AS exact_bnota
)
SELECT d_ab_num, d_ba_num, n_union_mins, union_est,
       CAST(CASE WHEN n_union_mins < 16 THEN d_ab_num
                 ELSE (d_ab_num * union_est) // 16 END AS BIGINT)
         AS anotb_est,
       CAST(CASE WHEN n_union_mins < 16 THEN d_ba_num
                 ELSE (d_ba_num * union_est) // 16 END AS BIGINT)
         AS bnota_est,
       CAST(exact_anotb AS BIGINT) AS exact_anotb,
       CAST(exact_bnota AS BIGINT) AS exact_bnota
FROM est, exact
"""


def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (functions/timeseries.py
    holt_int, alpha = beta = 1/2) over hourly per-event-type counts —
    level AND trend, with the one-step-ahead forecast a capacity monitor
    alarms against. Both recurrences are exact floor-halvings computed
    as floor(u/2.0) on BOTH engines (the trend goes negative, so integer
    div's truncate-vs-floor divergence is deliberately avoided)."""
    from ..functions.timeseries import holt_int

    events = read_table(spark, sf_dir, "events")
    return holt_int(events, "ts", ["event_type"], 3600)


SQL_HOLT_TREND = """
WITH RECURSIVE counts AS (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, CAST(x AS BIGINT) AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS i
  FROM counts
),
c AS (
  SELECT event_type, i, x AS l, CAST(0 AS BIGINT) AS b FROM r WHERE i = 1
  UNION ALL
  SELECT r.event_type, r.i,
         CAST(floor((r.x + c.l + c.b) / 2.0) AS BIGINT),
         CAST(floor((CAST(floor((r.x + c.l + c.b) / 2.0) AS BIGINT)
                     - c.l + c.b) / 2.0) AS BIGINT)
  FROM c JOIN r ON r.event_type = c.event_type AND r.i = c.i + 1
),
last_i AS (SELECT event_type, MAX(i) AS mi FROM r GROUP BY 1)
SELECT c.event_type, CAST(m.mi AS BIGINT) AS n_buckets,
       c.l AS level_final, c.b AS trend_final,
       CAST(c.l + c.b AS BIGINT) AS forecast_next
FROM c JOIN last_i m ON m.event_type = c.event_type AND c.i = m.mi
"""


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type (functions/timeseries.py
    theil_sen): the median of all pairwise slopes over hourly counts —
    the 29%-breakdown robust complement to event_trend's OLS fit. Pair
    slopes are generated inside a per-key sorted array (zero extra
    shuffle); floor(Δx·1e9/Δt) on an IEEE-exact quotient keeps negative
    slopes engine-identical; the median is a deterministic lower-rank
    pick."""
    from ..functions.timeseries import theil_sen

    events = read_table(spark, sf_dir, "events")
    return theil_sen(events, "ts", ["event_type"], 3600)


SQL_THEIL_SEN = """
WITH counts AS MATERIALIZED (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, bucket, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY bucket) AS i
  FROM counts
),
pairs AS MATERIALIZED (
  SELECT a.event_type,
         CAST(floor(CAST(b.x - a.x AS DOUBLE) * 1e9
              / CAST(b.bucket - a.bucket AS DOUBLE)) AS BIGINT) AS slope,
         a.i AS i, b.i AS j
  FROM r a JOIN r b ON b.event_type = a.event_type AND b.i > a.i
),
np AS (SELECT event_type, COUNT(*) AS n_pairs FROM pairs GROUP BY 1),
med AS (
  SELECT p.event_type, p.slope AS slope_e9
  FROM pairs p JOIN np USING (event_type)
  QUALIFY row_number() OVER (PARTITION BY p.event_type
                             ORDER BY p.slope, p.i, p.j)
          = (np.n_pairs + 1) // 2
),
t0 AS (SELECT event_type, MIN(bucket) AS t0 FROM counts GROUP BY 1),
-- LEFT JOIN + COALESCE keep single-bucket keys (zero pair slopes) in
-- the result with slope 0, matching the Spark side's contract-total
-- output (timeseries.theil_sen emits slope_e9=0 for those keys)
res AS (
  SELECT c.event_type,
         c.x * 1000000000
           - COALESCE(m.slope_e9, 0) * (c.bucket - t.t0) AS v,
         c.bucket
  FROM counts c LEFT JOIN med m USING (event_type)
       JOIN t0 t USING (event_type)
),
nb AS (SELECT event_type, COUNT(*) AS n_buckets FROM counts GROUP BY 1),
icpt AS (
  SELECT r2.event_type, r2.v AS intercept_nano
  FROM res r2 JOIN nb USING (event_type)
  QUALIFY row_number() OVER (PARTITION BY r2.event_type
                             ORDER BY r2.v, r2.bucket)
          = (nb.n_buckets + 1) // 2
)
SELECT nb.event_type, CAST(nb.n_buckets AS BIGINT) AS n_buckets,
       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(m.slope_e9, 0) AS BIGINT) AS slope_e9,
       CAST(i.intercept_nano AS BIGINT) AS intercept_nano
FROM nb LEFT JOIN np USING (event_type)
LEFT JOIN med m USING (event_type)
JOIN icpt i USING (event_type)
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per (event_type, hour): open/close via
    min_by/max_by over a zero-padded (epoch_us, event_id) string key —
    the deterministic total order that makes first/last well-defined
    under ties (DuckDB arg_min/arg_max accept VARCHAR ordering keys but
    not ROWs, hence the lexicographic packing). The TimescaleDB
    first()/last() time-bucket idiom; high/low/n ride along. One
    map-side-combined shuffle — min_by/max_by are ordinary partial
    aggregates, no window over the raw events."""
    ev = read_table(spark, sf_dir, "events")
    okey = F.concat_ws(
        ":",
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"))
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600) \
        .cast("bigint")
    return (ev.groupBy("event_type", bucket.alias("bucket"))
            .agg(F.min_by("value", okey).alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max_by("value", okey).alias("close"),
                 F.count(F.lit(1)).alias("n")))


SQL_OHLC_BARS = """
SELECT event_type,
       CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket,
       arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || ':' ||
                      lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || ':' ||
                      lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 experiment split
    — the A/B-test readout every product-analytics engine ships. Cohort
    = every user; conversion = "heavy buyer" (>= 14 purchase events, the
    fixture's median purchase count, so both classes are populated at
    every SF — the naive "did purchase" converts 100% of this synthetic
    corpus and zeroes the pooled variance); variant = the 48-bit md5
    fold of user_id mod 2 (the same portable hash as the KMV sketches,
    so assignment is reproducible on any engine). Counts and rate_ppm
    are exact integers; the pooled z-statistic is one sqrt + IEEE
    divisions, rounded to micro units per the ln-fold discipline.

    Scale shape: one map-side-combined per-user purchase count + one
    distinct, joined on user_id, then a 2-row aggregate — nothing grows
    with event volume except the combines."""
    from ..functions.sketches import kmv_hash

    ev = read_table(spark, sf_dir, "events")
    pc = (ev.filter(F.col("event_type") == "purchase")
          .groupBy("user_id").agg(F.count(F.lit(1)).alias("np")))
    cohort = (ev.select("user_id").distinct()
              .join(pc, "user_id", "left")
              .select("user_id",
                      (F.coalesce("np", F.lit(0)) >= 14).cast("int")
                      .alias("conv"),
                      (kmv_hash(F.col("user_id")) % 2).cast("int")
                      .alias("variant")))
    g = (cohort.groupBy("variant")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")))
    one = g.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"))
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    z_micro = F.round((p0 - p1) / se * 1e6).cast("bigint")
    wide = one.select("n0", "c0", "n1", "c1",
                      z_micro.alias("z_micro"),
                      (F.abs(z_micro) >= 1_960_000).cast("int")
                      .alias("significant"))
    return (wide.selectExpr(
        "stack(2, 0, n0, c0, 1, n1, c1) AS (variant, n_exposed, n_conv)",
        "z_micro", "significant")
        .select(F.col("variant").cast("int"),
                F.col("n_exposed").cast("bigint"),
                F.col("n_conv").cast("bigint"),
                F.expr("n_conv * 1000000 div n_exposed")
                .alias("rate_ppm"),
                "z_micro", "significant"))


SQL_AB_TEST = f"""
WITH au AS (SELECT DISTINCT user_id FROM events),
pc AS (SELECT user_id, COUNT(*) AS np FROM events
       WHERE event_type = 'purchase' GROUP BY 1),
cohort AS (
  SELECT au.user_id,
         CASE WHEN COALESCE(pc.np, 0) >= 14 THEN 1 ELSE 0 END AS conv,
         CAST({_hex12_sql("CAST(au.user_id AS VARCHAR)")} % 2 AS INT)
           AS variant
  FROM au LEFT JOIN pc ON pc.user_id = au.user_id
),
g AS (SELECT variant, COUNT(*) AS n, SUM(conv) AS c
      FROM cohort GROUP BY 1),
one AS (
  SELECT SUM(CASE WHEN variant = 0 THEN n END) AS n0,
         SUM(CASE WHEN variant = 0 THEN c END) AS c0,
         SUM(CASE WHEN variant = 1 THEN n END) AS n1,
         SUM(CASE WHEN variant = 1 THEN c END) AS c1
  FROM g
),
wide AS (
  SELECT n0, c0, n1, c1,
    CAST(round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
         / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                * (1.0 / n0 + 1.0 / n1)) * 1e6) AS BIGINT) AS z_micro
  FROM one
)
SELECT CAST(v.variant AS INT) AS variant,
       CAST(CASE WHEN v.variant = 0 THEN n0 ELSE n1 END AS BIGINT)
         AS n_exposed,
       CAST(CASE WHEN v.variant = 0 THEN c0 ELSE c1 END AS BIGINT)
         AS n_conv,
       CAST((CASE WHEN v.variant = 0 THEN c0 ELSE c1 END) * 1000000
            // (CASE WHEN v.variant = 0 THEN n0 ELSE n1 END) AS BIGINT)
         AS rate_ppm,
       z_micro,
       CAST(CASE WHEN abs(z_micro) >= 1960000 THEN 1 ELSE 0 END AS INT)
         AS significant
FROM wide CROSS JOIN (VALUES (0), (1)) AS v(variant)
"""


ANALYTICS_SUITE: dict[str, tuple] = {
    "topk_orders_per_customer": (q_topk_orders_per_customer, SQL_TOPK_ORDERS),
    "event_sessions": (q_event_sessions, SQL_EVENT_SESSIONS),
    "running_balance": (q_running_balance, SQL_RUNNING_BALANCE),
    "customers_without_orders": (q_customers_without_orders,
                                 SQL_CUSTOMERS_WITHOUT_ORDERS),
    "active_entity_union": (q_active_entity_union, SQL_ACTIVE_ENTITY_UNION),
    "rollup_revenue": (q_rollup_revenue, SQL_ROLLUP_REVENUE),
    "incremental_refresh": (q_incremental_refresh, SQL_INCREMENTAL_REFRESH),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "salted_event_counts": (q_salted_event_counts, SQL_SALTED_EVENT_COUNTS),
    "asof_last_purchase": (q_asof_last_purchase, SQL_ASOF_LAST_PURCHASE),
    "purchase_windows": (q_purchase_windows, SQL_PURCHASE_WINDOWS),
    "time_bucket_rollup": (q_time_bucket_rollup, SQL_TIME_BUCKET_ROLLUP),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "distinct_counts": (q_distinct_counts, SQL_DISTINCT_COUNTS),
    "kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT),
    "hll_distinct": (q_hll_distinct, SQL_HLL_DISTINCT),
    "dbscan_customers": (q_dbscan_customers, SQL_DBSCAN_CUSTOMERS),
    "mann_whitney": (q_mann_whitney, SQL_MANN_WHITNEY),
    "welch_ttest": (q_welch_ttest, SQL_WELCH_TTEST),
    "spearman_drift": (q_spearman_drift, SQL_SPEARMAN_DRIFT),
    "msprt": (q_msprt, SQL_MSPRT),
    "kruskal_wallis": (q_kruskal_wallis, SQL_KRUSKAL_WALLIS),
    "gini_spend": (q_gini_spend, SQL_GINI_SPEND),
    "srm_check": (q_srm_check, SQL_SRM_CHECK),
    "did": (q_did, SQL_DID),
    "cochran_armitage": (q_cochran_armitage, SQL_COCHRAN_ARMITAGE),
    "benford_prices": (q_benford_prices, SQL_BENFORD_PRICES),
    "kaplan_meier": (q_kaplan_meier, SQL_KAPLAN_MEIER),
    "km_variants": (q_km_variants, SQL_KM_VARIANTS),
    "chi2_weekday": (q_chi2_weekday, SQL_CHI2_WEEKDAY),
    "log_rank": (q_log_rank, SQL_LOG_RANK),
    "mad_outliers": (q_mad_outliers, SQL_MAD_OUTLIERS),
    "acf_daily": (q_acf_daily, SQL_ACF_DAILY),
    "modularity": (q_modularity, SQL_MODULARITY),
    "attribution": (q_attribution, SQL_ATTRIBUTION),
    "pruning_eval": (q_pruning_eval, SQL_PRUNING_EVAL),
    "random_group_ci": (q_random_group_ci, SQL_RANDOM_GROUP_CI),
    "cuped": (q_cuped, SQL_CUPED),
    "target_encoding": (q_target_encoding, SQL_TARGET_ENCODING),
    "fdr_battery": (q_fdr_battery, SQL_FDR_BATTERY),
    "bottomk_quantiles": (q_bottomk_quantiles, SQL_BOTTOMK_QUANTILES),
    "pit_join": (q_pit_join, SQL_PIT_JOIN),
    "triangles": (q_triangles, SQL_TRIANGLES),
    "bloom_filter": (q_bloom_filter, SQL_BLOOM_FILTER),
    "kmv_intersect": (q_kmv_intersect, SQL_KMV_INTERSECT),
    "kmv_difference": (q_kmv_difference, SQL_KMV_DIFFERENCE),
    "lpa_communities": (q_lpa_communities, SQL_LPA_COMMUNITIES),
    "golden_records": (q_golden_records, SQL_GOLDEN_RECORDS),
    "random_walks": (q_random_walks, SQL_RANDOM_WALKS),
    "holt_trend": (q_holt_trend, SQL_HOLT_TREND),
    "theil_sen": (q_theil_sen, SQL_THEIL_SEN),
    "rfm_scores": (q_rfm_scores, SQL_RFM_SCORES),
    "otsu_threshold": (q_otsu_threshold, SQL_OTSU_THRESHOLD),
    "ohlc_bars": (q_ohlc_bars, SQL_OHLC_BARS),
    "ab_test": (q_ab_test, SQL_AB_TEST),
    "cusum_monitor": (q_cusum_monitor, SQL_CUSUM_MONITOR),
    "ewma": (q_ewma, SQL_EWMA),
    "skew_report": (q_skew_report, SQL_SKEW_REPORT),
    "trimmed_mean": (q_trimmed_mean, SQL_TRIMMED_MEAN),
    "match_quality": (q_match_quality, SQL_MATCH_QUALITY),
    "weekday_profile": (q_weekday_profile, SQL_WEEKDAY_PROFILE),
    "fuzzy_match": (q_fuzzy_match, SQL_FUZZY_MATCH),
    "kcore": (q_kcore, SQL_KCORE),
    "adamic_adar": (q_adamic_adar, SQL_ADAMIC_ADAR),
    "kmv_reach": (q_kmv_reach, SQL_KMV_REACH),
    "kmv_overlap": (q_kmv_overlap, SQL_KMV_OVERLAP),
    "ks_drift": (q_ks_drift, SQL_KS_DRIFT),
    "timed_funnel": (q_timed_funnel, SQL_TIMED_FUNNEL),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "gapfill_hourly": (q_gapfill_hourly, SQL_GAPFILL_HOURLY),
    "anomaly_zscore": (q_anomaly_zscore, SQL_ANOMALY_ZSCORE),
    "cms_user_counts": (q_cms_user_counts, SQL_CMS_USER_COUNTS),
    "butterflies": (q_butterflies, SQL_BUTTERFLIES),
    "basket_rules": (q_basket_rules, SQL_BASKET_RULES),
    "event_trend": (q_event_trend, SQL_EVENT_TREND),
    "event_twa": (q_event_twa, SQL_EVENT_TWA),
    "table_stats": (q_table_stats, SQL_TABLE_STATS),
    "nation_intersect": (q_nation_intersect, SQL_NATION_INTERSECT),
    "nation_except": (q_nation_except, SQL_NATION_EXCEPT),
    "cube_revenue": (q_cube_revenue, SQL_CUBE_REVENUE),
    "date_functions": (q_date_functions, SQL_DATE_FUNCTIONS),
    "expectations": (q_expectations, SQL_EXPECTATIONS),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "eventually_follows": (q_eventually_follows,
                           SQL_EVENTUALLY_FOLLOWS),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "hits": (q_hits, SQL_HITS),
    "ppr": (q_ppr, SQL_PPR),
    "event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "zorder_values": (q_zorder_values, SQL_ZORDER_VALUES),
    "hilbert_values": (q_hilbert_values, SQL_HILBERT_VALUES),
    "exact_quantiles": (q_exact_quantiles, SQL_EXACT_QUANTILES),
    "order_value_percentiles": (q_order_value_percentiles,
                                SQL_ORDER_PERCENTILES),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
    "rank_semantics": (q_rank_semantics, SQL_RANK_SEMANTICS),
    "window_distribution": (q_window_distribution, SQL_WINDOW_DISTRIBUTION),
    "pivot_event_counts": (q_pivot_event_counts, SQL_PIVOT_EVENT_COUNTS),
    "unpivot_part_metrics": (q_unpivot_part_metrics,
                             SQL_UNPIVOT_PART_METRICS),
    "embedding_stats": (q_embedding_stats, SQL_EMBEDDING_STATS),
    "embedding_pca": (q_embedding_pca, SQL_EMBEDDING_PCA),
    "abtt_ann": (q_abtt_ann, SQL_ABTT_ANN),
    "embedding_drift": (q_embedding_drift, SQL_EMBEDDING_DRIFT),
    "quantize_int8": (q_quantize_int8, SQL_QUANTIZE_INT8),
    "daily_active_users": (q_daily_active_users, SQL_DAILY_ACTIVE_USERS),
    "monthly_revenue": (q_monthly_revenue, SQL_MONTHLY_REVENUE),
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
    "null_semantics": (q_null_semantics, SQL_NULL_SEMANTICS),
    "ship_latency_histogram": (
        lambda spark, sf_dir: (
            read_table(spark, sf_dir, "lineitem")
            .join(read_table(spark, sf_dir, "orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .select(F.datediff("l_shipdate", "o_orderdate").alias("days"))
            .groupBy(F.floor(F.col("days") / 30).cast("int")
                     .alias("month_bucket"))
            .agg(F.count(F.lit(1)).alias("n"))),
        """
        SELECT CAST(floor(CAST(datediff('day', o_orderdate, l_shipdate)
                    AS DOUBLE) / 30) AS INT) AS month_bucket,
               COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
        """),
    "regex_extract_ids": (
        lambda spark, sf_dir: (
            read_table(spark, sf_dir, "customer")
            .select("c_custkey",
                    F.regexp_extract("c_name", r"Customer#(\d+)", 1)
                    .cast("long").alias("name_id"))
            .filter(F.col("name_id") == F.col("c_custkey"))),
        """
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT)
                 AS name_id
        FROM customer
        WHERE CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT)
              = c_custkey
        """),
    "string_functions": (q_string_functions, SQL_STRING_FUNCTIONS),
    "math_functions": (q_math_functions, SQL_MATH_FUNCTIONS),
}
