"""General analytics operator surface (SURVEY.md §2.2-§2.6).

Every public ``q_*`` function takes ``(spark, sf_dir)`` and returns a
DataFrame over the driver fixtures (TESTDATA.md); the module-level
``ORACLE`` dict holds the DuckDB-SQL twin keyed by the same name.
These are the operator-level correctness probes for the reference's
capability surface: projections/filters (P1-P9), scalar functions
(F1-F12), aggregations (A1-A10), joins (§2.5), windows/sorts/limits/
set ops (§2.6).

Scale notes baked into each query:
- dimension joins use ``F.broadcast`` explicitly (region/nation/
  supplier are tiny at any SF — never shuffle the fact side for them);
- aggregates are expressed as single groupBy/agg passes (map-side
  partial aggregation, one shuffle on the group keys);
- double sums go through DECIMAL (functions/oracle.py) so results are
  reproducible at any partition count — see that module's docstring;
- top-k is ``orderBy().limit()`` (Spark runs TakeOrderedAndProject —
  per-partition heaps, no global sort) with a unique tiebreak column
  so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.localframe import local_df
from ..functions.oracle import DEC, davg, davg_sql, dsum, dsum_spark_sql, dsum_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (groupBy + 8 aggregates).
# Exercises P4 (date filter), F12 (casts), A-family aggregation.
# ---------------------------------------------------------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE["pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# P2/P4/P6-P8: projection + conjunctive filter (pushdown showcase).
# ---------------------------------------------------------------------------
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 10)
        & (F.col("l_discount") >= 0.05)
        & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


ORACLE["filter_project"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity < 10 AND l_discount >= 0.05 AND l_returnflag IN ('A', 'R')
"""


# ---------------------------------------------------------------------------
# F1/F8: conditional decode of a categorical (the reference's
# facilityType/weekday literal-map pattern, on o_orderpriority).
# ---------------------------------------------------------------------------
def q_conditional_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import decode_map

    mapping = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "unspecified",
        "5-LOW": "low",
    }
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("priority_name", decode_map("o_orderpriority", mapping))
        .groupBy("priority_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
    )


ORACLE["conditional_decode"] = f"""
SELECT CASE o_orderpriority
         WHEN '1-URGENT' THEN 'urgent'
         WHEN '2-HIGH' THEN 'high'
         WHEN '3-MEDIUM' THEN 'medium'
         WHEN '4-NOT SPECIFIED' THEN 'unspecified'
         WHEN '5-LOW' THEN 'low'
         ELSE o_orderpriority
       END AS priority_name,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# F4-F6: date/time functions (to_date, hour, epoch arithmetic).
# ---------------------------------------------------------------------------
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("event_hour"),
        F.dayofweek("ts").alias("dow"),
        F.unix_timestamp(F.date_trunc("minute", F.col("ts"))).alias("epoch_minute"),
    )


ORACLE["date_functions"] = """
SELECT event_id,
       CAST(ts AS DATE) AS event_date,
       CAST(hour(ts) AS INT) AS event_hour,
       CAST(dayofweek(ts) + 1 AS INT) AS dow,
       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS epoch_minute
FROM events
"""


# ---------------------------------------------------------------------------
# F7: guarded division (reference avg_cost_per_kwh semantics).
# ---------------------------------------------------------------------------
def q_guarded_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import safe_div

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        safe_div("l_extendedprice", "l_quantity").alias("unit_price"),
        safe_div("l_discount", "l_tax").alias("disc_per_tax"),
    )


ORACLE["guarded_division"] = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity END AS unit_price,
       CASE WHEN l_tax > 0 THEN l_discount / l_tax END AS disc_per_tax
FROM lineitem
"""


# ---------------------------------------------------------------------------
# F9-F11: array construction + higher-order filter + size (the
# reference's quarantine_reason pipeline shape, on orders).
# ---------------------------------------------------------------------------
def q_array_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rules = F.array(
        F.when(F.col("o_totalprice") > 300000, F.lit("big_ticket")),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("urgent")),
        F.when(F.col("o_orderstatus") == "F", F.lit("finished")),
    )
    reasons = F.filter(rules, lambda x: x.isNotNull())
    return o.select(
        "o_orderkey",
        F.size(reasons).alias("n_flags"),
        F.array_join(reasons, ",").alias("flags"),
    )


ORACLE["array_rules"] = """
SELECT o_orderkey,
       CAST(len(flags_list) AS INT) AS n_flags,
       COALESCE(array_to_string(flags_list, ','), '') AS flags
FROM (
  SELECT o_orderkey,
         list_filter([
           CASE WHEN o_totalprice > 300000 THEN 'big_ticket' END,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' END,
           CASE WHEN o_orderstatus = 'F' THEN 'finished' END
         ], x -> x IS NOT NULL) AS flags_list
  FROM orders
)
"""


# ---------------------------------------------------------------------------
# A8 analog: avg metric per group (avg session duration per site).
# ---------------------------------------------------------------------------
def q_avg_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            davg("value").alias("avg_value"),
            dsum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


ORACLE["avg_value_per_type"] = f"""
SELECT event_type,
       {davg_sql('value')} AS avg_value,
       {dsum_sql('value')} AS sum_value,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# A9: peak hours — hourly histogram + rank (window over a 24-row agg;
# the window input is already tiny so the single-partition window is
# fine at any scale).
# ---------------------------------------------------------------------------
def q_peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.hour("ts").alias("event_hour")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = W.orderBy(F.col("n_events").desc(), F.col("event_hour"))
    return hourly.withColumn("hour_rank", F.rank().over(w)).orderBy("hour_rank", "event_hour")


ORACLE["peak_hours"] = """
SELECT CAST(event_hour AS INT) AS event_hour, n_events,
       CAST(rank() OVER (ORDER BY n_events DESC, event_hour) AS INT) AS hour_rank
FROM (SELECT hour(ts) AS event_hour, COUNT(*) AS n_events FROM events GROUP BY 1)
ORDER BY hour_rank, event_hour
"""


# ---------------------------------------------------------------------------
# A10: usage distribution — share-of-total via window over the agg.
# ---------------------------------------------------------------------------
def q_usage_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    total = W.partitionBy()
    return counts.select(
        "event_type",
        "n_events",
        (F.col("n_events").cast("double") / F.sum("n_events").over(total)).alias("share"),
    ).orderBy("event_type")


ORACLE["usage_share"] = """
SELECT event_type, n_events,
       CAST(n_events AS DOUBLE) / SUM(n_events) OVER () AS share
FROM (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY 1)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.5): snowflake dim chain, broadcast both dims.
# ---------------------------------------------------------------------------
def q_join_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .orderBy("r_name", "n_name")
    )


ORACLE["join_customer_geo"] = f"""
SELECT r_name, n_name, COUNT(*) AS n_customers,
       {dsum_sql('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# ---------------------------------------------------------------------------
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ORACLE["join_semi"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


ORACLE["join_anti"] = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ---------------------------------------------------------------------------
# Multi-join star query (TPC-H Q5 shape): fact x 2 facts x 3 dims.
# lineitem->orders co-partitioned shuffle join; dims broadcast.
# ---------------------------------------------------------------------------
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


ORACLE["revenue_by_nation"] = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# W1: top-k per group via row_number with unique tiebreak.
# ---------------------------------------------------------------------------
def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
    )


ORACLE["topk_orders_per_segment"] = """
SELECT c_mktsegment, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Running (cumulative) aggregate per key — decimal-routed for
# order-stable doubles.
# ---------------------------------------------------------------------------
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(25,10)"))
        .over(w)
        .cast("string")
        .cast("double")
        .alias("running_value"),
    )


ORACLE["running_total"] = """
SELECT user_id, event_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,10)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
       AS running_value
FROM events
"""


# ---------------------------------------------------------------------------
# W2/W3: global sort + top-k (TakeOrderedAndProject, no full sort).
# ---------------------------------------------------------------------------
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


ORACLE["top_orders"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


# ---------------------------------------------------------------------------
# W4: set operations.
# ---------------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    part_c = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey").distinct()
    only_open = open_c.exceptAll(done_c).withColumn("bucket", F.lit("open_only"))
    both = open_c.intersect(done_c).withColumn("bucket", F.lit("open_and_done"))
    union_p = part_c.union(done_c).distinct().withColumn("bucket", F.lit("partial_or_done"))
    return only_open.union(both).union(union_p).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_custkeys")
    )


ORACLE["set_ops"] = """
WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     done_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     part_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'),
     buckets AS (
       SELECT 'open_only' AS bucket, o_custkey FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM done_c)
       UNION ALL
       SELECT 'open_and_done', o_custkey FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM done_c)
       UNION ALL
       SELECT 'partial_or_done', o_custkey FROM (SELECT o_custkey FROM part_c UNION SELECT o_custkey FROM done_c)
     )
SELECT bucket, COUNT(*) AS n_custkeys FROM buckets GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# Distinct + exact distinct counts (A6 family).
# ---------------------------------------------------------------------------
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE["distinct_counts"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Rollup / cube (SURVEY.md §2.4 note: single-call Spark built-ins).
# NULL group markers coalesced identically on both sides.
# ---------------------------------------------------------------------------
def q_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


ORACLE["rollup_status_priority"] = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


ORACLE["cube_flag_status"] = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Pivot (wide aggregation) — column names fixed on both sides.
# ---------------------------------------------------------------------------
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_finished")
        .orderBy("l_returnflag")
    )


ORACLE["pivot_status"] = f"""
SELECT l_returnflag,
       {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_finished
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# String functions over documents (F-family on text).
# ---------------------------------------------------------------------------
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("text_len"),
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.when(F.col("text").contains("spark"), F.lit(1)).otherwise(F.lit(0)).alias(
            "mentions_spark"
        ),
    )


ORACLE["string_functions"] = """
SELECT doc_id,
       CAST(length(text) AS INT) AS text_len,
       upper(substr(text, 1, 10)) AS head_upper,
       concat_ws('|', lang, source) AS lang_source,
       CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS mentions_spark
FROM documents
"""

# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + running
# conditional count — the batch twin of streaming session_window).
# Epoch arithmetic in integer microseconds so both engines agree.
# ---------------------------------------------------------------------------
SESSION_GAP_US = 30 * 60 * 1_000_000


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessioned = ev.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value").alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


ORACLE["sessionize"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  -- DuckDB SUM(int) yields HUGEINT (-> pandas float64); Spark emits BIGINT.
  -- Cast so the driver's type-sensitive value hash matches.
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {dsum_sql('value')} AS session_value
FROM sessioned
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# As-of lookup: each event joined to the user's most recent prior (or
# concurrent) purchase — the window formulation of an as-of join (no
# range-join explosion; one shuffle on user_id).
# ---------------------------------------------------------------------------
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        last_purchase.alias("last_purchase_ts"),
        F.when(
            last_purchase.isNotNull(),
            (F.unix_micros(F.col("ts")) - F.unix_micros(last_purchase)) / 1_000_000.0,
        ).alias("secs_since_purchase"),
    )


ORACLE["asof_last_purchase"] = """
SELECT user_id, event_id, event_type,
       last_purchase_ts,
       CASE WHEN last_purchase_ts IS NOT NULL
            THEN (epoch_us(ts) - epoch_us(last_purchase_ts)) / 1000000.0 END
         AS secs_since_purchase
FROM (
  SELECT user_id, event_id, event_type, ts,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
  FROM events
)
"""


# ---------------------------------------------------------------------------
# SQL endpoint (reference S12 — Athena-style SQL-on-lake): the same
# engine surface exercised through spark.sql over registered views.
# ---------------------------------------------------------------------------
def q_sql_endpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH seg AS (
          SELECT c_mktsegment, c_custkey FROM customer
        )
        SELECT s.c_mktsegment AS mktsegment,
               COUNT(DISTINCT o.o_custkey) AS active_customers,
               CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,10))) AS STRING) AS DOUBLE)
                 AS segment_revenue
        FROM orders o
        JOIN seg s ON o.o_custkey = s.c_custkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY s.c_mktsegment
        ORDER BY mktsegment
        """
    )


ORACLE["sql_endpoint"] = """
SELECT c_mktsegment AS mktsegment,
       COUNT(DISTINCT o_custkey) AS active_customers,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
         AS segment_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus <> 'F'
GROUP BY c_mktsegment
ORDER BY mktsegment
"""


# ---------------------------------------------------------------------------
# A8 (README.md:47): avg session duration per site — sessions built by
# the sessionize operator, duration averaged per user_id (the
# fixtures' site analog). Durations are exact micro-second integers
# scaled to seconds, so the davg decimal route keeps the mean
# engine-exact.
# ---------------------------------------------------------------------------
def q_avg_session_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = q_sessionize(spark, sf_dir)
    duration_sec = (
        F.unix_micros("session_end") - F.unix_micros("session_start")
    ).cast("double") / 1e6
    return (
        sessions.withColumn("dur", duration_sec)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            davg("dur").alias("avg_duration_sec"),
        )
        .orderBy("user_id")
    )


ORACLE["avg_session_duration"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  -- DuckDB SUM(int) yields HUGEINT (-> pandas float64); Spark emits BIGINT.
  -- Cast so the driver's type-sensitive value hash matches.
  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1e6 AS dur
  FROM sessioned GROUP BY user_id, session_seq
)
SELECT user_id, COUNT(*) AS n_sessions,
       {davg_sql('dur')} AS avg_duration_sec
FROM sessions GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# A9 (README.md:48): utilization ratio — distinct active hours over
# the user's observed hour span. Integer hour-bucket arithmetic end
# to end; the final ratio is one exact int/int double division.
# ---------------------------------------------------------------------------
def q_utilization_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour_bucket = F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
    return (
        ev.withColumn("hb", hour_bucket)
        .groupBy("user_id")
        .agg(
            F.countDistinct("hb").alias("active_hours"),
            ((F.max("hb") - F.min("hb")) / 3600 + 1).cast("long").alias("span_hours"),
        )
        .select(
            "user_id",
            "active_hours",
            "span_hours",
            (F.col("active_hours").cast("double") / F.col("span_hours")).alias(
                "utilization"
            ),
        )
        .orderBy("user_id")
    )


ORACLE["utilization_ratio"] = """
WITH g AS (
  SELECT user_id,
         COUNT(DISTINCT epoch(date_trunc('hour', ts))) AS active_hours,
         CAST((MAX(epoch(date_trunc('hour', ts))) -
               MIN(epoch(date_trunc('hour', ts)))) / 3600 + 1 AS BIGINT) AS span_hours
  FROM events GROUP BY user_id
)
SELECT user_id, active_hours, span_hours,
       CAST(active_hours AS DOUBLE) / span_hours AS utilization
FROM g ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Range join, time-window variant: click -> purchase attribution
# within a 10-minute window per user. Spark has no native range-join
# operator; the naive plan is a nested-loop inequality join (O(n*m)).
# The scale-path composition used here: EQUI-join on
# (user_id, time_bucket) with each left row fanned out to the 2
# buckets its window can reach, then refine with the exact inequality
# — candidate pairs drop from n*m to pairs sharing a coarse bucket,
# and the join is hash-partitioned, shuffle-friendly, AQE-skew-
# splittable. Bucket width == window width, so the fan-out factor is
# exactly 2 regardless of scale.
# ---------------------------------------------------------------------------
ATTRIBUTION_WINDOW_US = 10 * 60 * 1_000_000


def q_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("cus"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pus"),
    )
    w = ATTRIBUTION_WINDOW_US
    # purchase sits in its own bucket; each click probes its bucket
    # and the next one (window can span at most one boundary)
    clicks_fan = clicks.withColumn(
        "bucket", F.explode(F.array((F.col("cus") / w).cast("long"),
                                    (F.col("cus") / w).cast("long") + 1))
    )
    purchases_b = purchases.withColumn("bucket", (F.col("pus") / w).cast("long"))
    return (
        clicks_fan.join(
            purchases_b,
            (F.col("cu") == F.col("pu")) & (clicks_fan.bucket == purchases_b.bucket),
        )
        .filter((F.col("pus") > F.col("cus")) & (F.col("pus") - F.col("cus") <= w))
        .select(
            F.col("cu").alias("user_id"),
            "click_id",
            "purchase_id",
            ((F.col("pus") - F.col("cus")) / F.lit(1e6)).alias("lag_sec"),
        )
        .orderBy("user_id", "click_id", "purchase_id")
    )


ORACLE["range_join_attribution"] = f"""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       (epoch_us(p.ts) - epoch_us(c.ts)) / 1e6 AS lag_sec
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) > epoch_us(c.ts)
 AND epoch_us(p.ts) - epoch_us(c.ts) <= {ATTRIBUTION_WINDOW_US}
ORDER BY c.user_id, click_id, purchase_id
"""


# ---------------------------------------------------------------------------
# Range join, band variant: price-band dimension lookup
# (lo <= value < hi). Tiny band tables broadcast; the inequality
# pushes into a BroadcastNestedLoop probe that never shuffles the
# fact side — the right Spark plan when the range table is small.
# ---------------------------------------------------------------------------
PRICE_BANDS = [
    ("budget", 0.0, 20000.0),
    ("mid", 20000.0, 45000.0),
    ("premium", 45000.0, 1e18),
]


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bands = local_df(spark, PRICE_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("band_revenue"),
        )
        .orderBy("band")
    )


_BAND_ROWS = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)
ORACLE["range_join_bands"] = f"""
WITH bands(band, lo, hi) AS (VALUES {_BAND_ROWS})
SELECT band, COUNT(*) AS n_items, {dsum_sql('l_extendedprice')} AS band_revenue
FROM lineitem JOIN bands
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band ORDER BY band
"""


# ---------------------------------------------------------------------------
# Approximate distinct counting (HyperLogLog++) next to the exact
# count — the sketch every 100 TB pipeline uses when exact
# countDistinct's shuffle is too expensive. Raw sketch estimates are
# engine-specific, so the oracled surface is the exact count plus a
# ±5% bounds check on the estimate (the sketch is configured at
# rsd=1%, so 5% is a hard contract, not a flaky tolerance); tests
# additionally pin <2% relative error.
# ---------------------------------------------------------------------------
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Two separate aggregation passes, NOT one agg with both: mixing
    # countDistinct with approx_count_distinct plans an Expand whose
    # partial stage keeps one HLL++ sketch (16 KB at rsd=1%) per
    # (l_returnflag, l_orderkey) group — ~150k sketches at sf0.1,
    # gigabytes of agg state, sort-based fallback + spill (OOMs a
    # default-memory driver; measured 235 s vs <2 s split). Separated,
    # the sketch pass holds one sketch per coarse group and the exact
    # pass is a map-combinable distinct — both scale linearly.
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders")
    )
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    err = F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col(
        "exact_orders"
    )
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (err <= 0.05).alias("within_5pct_of_exact"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["approx_distinct"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS within_5pct_of_exact
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Skew-safe salted aggregation (functions/skew.py): l_returnflag has
# only 3 values over 600k rows at sf0.1 — exactly the hot-key shape
# that straggles a direct groupBy at 100 TB. The two-phase plan's
# result is IDENTICAL to the plain GROUP BY, which is the oracle.
# Decimal-sum via the partial/merge decomposition of dsum: partials
# sum to decimal, the merge sums the exact decimals, one final
# string->double conversion.
# ---------------------------------------------------------------------------
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n_rows": (F.count(F.lit(1)), F.sum("n_rows")),
            "qty_dec": (
                F.sum(F.col("l_quantity").cast("decimal(25,10)")),
                F.sum("qty_dec"),
            ),
        },
        salt_on="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        "n_rows",
        F.col("qty_dec").cast("string").cast("double").alias("sum_qty"),
    ).orderBy("l_returnflag")


ORACLE["skew_salted_agg"] = f"""
SELECT l_returnflag, COUNT(*) AS n_rows, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# TPC-H Q14-style promo revenue share per brand (lineitem x part).
# part is a classic broadcast dim: the fact side streams through one
# BroadcastHashJoin, the conditional promo sum rides the same
# single-shuffle groupBy. share = exact-decimal double / exact-decimal
# double -> deterministic at any partition count.
# ---------------------------------------------------------------------------
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(revenue).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "p_brand",
            "promo_revenue",
            "total_revenue",
            "n_items",
            (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
        )
        .orderBy("p_brand")
    )


ORACLE["promo_revenue_share"] = f"""
WITH g AS (
  SELECT p_brand,
         {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           AS promo_revenue,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue,
         COUNT(*) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, promo_revenue, total_revenue, n_items,
       promo_revenue / total_revenue AS promo_share
FROM g ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Exact percentiles per group (quantile surface of the query layer).
#
# Scale note: exact percentile buffers each group's values on the
# reducer — fine for low-cardinality group keys (3 return flags) at
# any SF because the shuffle partitions by l_returnflag and each
# group streams through one sort-based aggregate. For
# high-cardinality keys or when one group exceeds executor memory,
# the scale path is ``approx_percentile`` (t-digest sketch, map-side
# combinable, bounded memory) — exposed by the same Spark function
# family; the exact form is kept here because it is oracle-checkable
# bit-for-bit (Spark and DuckDB both linear-interpolate at
# p*(n-1), verified identical on the fixtures).
# ---------------------------------------------------------------------------
_PCTS = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)]


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # ONE array-percentile aggregate per column, not one aggregate per
    # (column, p): Spark's exact percentile buffers every group value
    # per aggregate expression, so 8 scalar aggs hold 8 copies of each
    # group — the array form holds 2 (measured 2.6x faster at sf0.1:
    # 1.4 s vs 3.6 s warm, head-to-head).
    pct_arr = "array(" + ", ".join(f"{p}D" for _, p in _PCTS) + ")"
    aggs = [
        F.expr(f"percentile({col}, {pct_arr})").alias(f"_{short}")
        for col, short in [("l_quantity", "qty"), ("l_extendedprice", "price")]
    ]
    outs = [
        F.col(f"_{short}")[i].alias(f"{tag}_{short}")
        for short in ("qty", "price")
        for i, (tag, _) in enumerate(_PCTS)
    ]
    return (
        li.groupBy("l_returnflag")
        .agg(*aggs)
        .select("l_returnflag", *outs)
        .orderBy("l_returnflag")
    )


ORACLE["percentiles"] = f"""
SELECT l_returnflag,
       {', '.join(f'quantile_cont({col}, {p}) AS {tag}_{short}'
                  for col, short in [('l_quantity', 'qty'), ('l_extendedprice', 'price')]
                  for tag, p in _PCTS)}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# GROUPING SETS with grouping-id disambiguation (generalizes the
# cube/rollup pair: caller-chosen lattice points, one shuffle —
# Spark expands the sets map-side and aggregates all of them in a
# single pass, same as cube).
# ---------------------------------------------------------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS gid,
               o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {dsum_spark_sql('o_totalprice')} AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


ORACLE["grouping_sets"] = f"""
SELECT CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


# ---------------------------------------------------------------------------
# TPC-H Q4-shaped correlated-EXISTS aggregate: orders with at least
# one line shipped >90 days after the order date, counted per
# priority. The EXISTS compiles to a LEFT SEMI join on the order key
# with the date comparison as a residual join predicate — one
# shuffle on l_orderkey/o_orderkey, no duplicate-elimination pass
# (semi join short-circuits on first match, so a 7-line order costs
# the same as a 1-line order).
# ---------------------------------------------------------------------------
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 90)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_orders"))
        .orderBy("o_orderpriority")
    )


ORACLE["late_shipment_priority"] = """
SELECT o_orderpriority, COUNT(*) AS late_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Row-shift windows: lag/lead plus a 3-row moving average per user
# timeline. The frame aggregate routes through DECIMAL (see
# functions/oracle.py) so the moving average is order-stable;
# lag/lead copy values exactly. One shuffle on user_id; all four
# window expressions share the same Window spec, so Spark evaluates
# them in a single Window physical operator over one sort.
# ---------------------------------------------------------------------------
def q_window_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, W.currentRow)
    mov_sum = (
        F.sum(F.col("value").cast("decimal(25,10)"))
        .over(wf)
        .cast("string")
        .cast("double")
    )
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (mov_sum / F.count("value").over(wf)).alias("mov_avg3"),
    )


ORACLE["window_shift"] = """
SELECT user_id, event_id,
       lag(value, 1) OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) OVER wf AS VARCHAR) AS DOUBLE)
         / COUNT(value) OVER wf AS mov_avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery (per-group average used as
# a per-row predicate). Spark-first decorrelation: broadcast-semi-join
# the tiny brand slice into lineitem FIRST (prunes ~96% of the fact scan
# before any shuffle), aggregate per part, broadcast the per-part
# averages back. At 100 TB the only shuffle is the per-partkey agg over
# the brand slice; everything else is broadcast.
# ---------------------------------------------------------------------------
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small orders for one brand (TPC-H Q17 pattern).

    Capability: correlated scalar subquery via decorrelation into an
    aggregate + self-join — the reference has no subquery surface, but
    its Athena/SQL endpoint (SURVEY.md S12) implies it.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    brand_li = li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
    avg_qty = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_limit")
    ).withColumnRenamed("l_partkey", "a_partkey")
    return (
        brand_li.join(F.broadcast(avg_qty), brand_li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


ORACLE["small_quantity_revenue"] = f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < 0.2 * (
        SELECT {davg_sql('l2.l_quantity')}
        FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: left outer join + count, including the zero group.
# Scale-first formulation: pre-aggregate orders to (custkey, n) BEFORE
# joining customer — the join input shrinks from |orders| rows to
# |customers-with-orders| rows, and both sides shuffle once on custkey.
# COALESCE resurrects the customers with no (qualifying) orders.
# ---------------------------------------------------------------------------
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed 0, 1, 2, ... non-urgent orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE["customer_order_distribution"] = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: HAVING over a grouped sum feeding a multi-way join.
# The groupBy(l_orderkey) is the one unavoidable big shuffle; the
# HAVING filter then drops ~99% of groups, so AQE sees a tiny build
# side for the subsequent joins and switches them to broadcast at
# runtime — exactly the adaptive behavior we want at 100 TB.
# ---------------------------------------------------------------------------
def q_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders whose total quantity exceeds 250."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.col("o_orderdate"), F.col("o_orderkey"))
        .limit(100)
    )


ORACLE["big_order_customers"] = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 250
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: uncorrelated scalar subquery (global average) used as
# a filter, combined with an anti join. The 1-row aggregate is
# broadcast via crossJoin — zero-cost at any scale — and the anti join
# shuffles only the pre-filtered (above-average) customer slice.
# ---------------------------------------------------------------------------
def q_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no urgent orders, per nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


ORACLE["idle_high_balance"] = f"""
SELECT c_nationkey, COUNT(*) AS numcust, {dsum_sql('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_acctbal > (
        SELECT {davg_sql('c_acctbal')} FROM customer WHERE c_acctbal > 0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Ordered conversion funnel (view -> click -> purchase). Each stage's
# entry time is a conditional window-min that references the previous
# stage's time, so the stages are strictly sequential per user. All
# three window passes share the same user_id partitioning — Catalyst
# plans ONE Exchange, the final global count is a single-row agg.
# ---------------------------------------------------------------------------
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users reaching each stage of view->click->purchase,
    in strict timestamp order."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    return s3.agg(
        F.countDistinct(F.when(F.col("t1").isNotNull(), F.col("user_id"))).alias(
            "n_view"
        ),
        F.countDistinct(F.when(F.col("t2").isNotNull(), F.col("user_id"))).alias(
            "n_click"
        ),
        F.countDistinct(F.when(F.col("t3").isNotNull(), F.col("user_id"))).alias(
            "n_purchase"
        ),
    )


ORACLE["funnel"] = """
WITH w1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
), w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
)
SELECT COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
       COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_click,
       COUNT(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_purchase
FROM w3
"""


# ---------------------------------------------------------------------------
# Weekly cohort retention: users grouped by first-seen week, counted
# per week offset. First-seen is a window-min (shuffle on user_id),
# the cohort matrix is one more groupBy — two shuffles total, both
# map-side combinable.
# ---------------------------------------------------------------------------
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, week_offset, n_users) retention matrix."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    w = W.partitionBy("user_id")
    first_ts = F.min("ts").over(w)
    return (
        ev.withColumn("cohort_week", F.to_date(F.date_trunc("week", first_ts)))
        .withColumn(
            "week_offset",
            (F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


ORACLE["cohort_retention"] = """
WITH firsts AS (
  SELECT user_id, ts,
         CAST(date_trunc('week', MIN(ts) OVER (PARTITION BY user_id)) AS DATE)
           AS cohort_week
  FROM events
)
SELECT cohort_week,
       CAST(FLOOR(date_diff('day', cohort_week, CAST(ts AS DATE)) / 7.0) AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM firsts
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# Z-order clustering key (multi-dimensional layout for stats
# skipping). The query ranks events by the Morton interleave of
# (user_id, hour-of-day) — exactly the sort a compaction pass would
# apply before writing, so file k holds a tight 2-D tile and
# predicates on EITHER column prune files. Pure shift/and/or
# expressions, fully codegen, exactly oracled.
# ---------------------------------------------------------------------------
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.zorder import zorder_key

    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.hour("ts").alias("hr"),
            zorder_key(["user_id", F.hour("ts")], bits=8),
        )
        .orderBy("zkey", "event_id")
        .limit(200)
    )


def _zorder_oracle() -> str:
    from ..functions.zorder import zorder_key_sql

    zkey = zorder_key_sql(["user_id", "EXTRACT(hour FROM ts)"], bits=8)
    return f"""
SELECT event_id, user_id,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
       {zkey} AS zkey
FROM events
ORDER BY zkey, event_id
LIMIT 200
"""


ORACLE["zorder_layout"] = _zorder_oracle()


# ---------------------------------------------------------------------------
# Regex scalar functions (extract / replace / match). Patterns kept
# to the POSIX-classes subset where Java regex (Spark) and RE2
# (DuckDB) agree. Pure projection — codegen, no shuffle.
# ---------------------------------------------------------------------------
def q_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_str"),
        F.regexp_replace("event_type", "[aeiou]", "_").alias("type_devoweled"),
        F.col("event_type").rlike("^(click|view)$").alias("is_interaction"),
    )


ORACLE["regex_functions"] = """
SELECT event_id,
       COALESCE(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS k_str,
       regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_devoweled,
       regexp_matches(event_type, '^(click|view)$') AS is_interaction
FROM events
"""


# ---------------------------------------------------------------------------
# Fuzzy string matching by edit distance: all nation-name pairs
# within Levenshtein distance 5. The dim is tiny so the pair space is
# a broadcast nested loop by design; at scale the same operator runs
# after an LSH/blocking stage (see dedup) so only candidate pairs pay
# the O(len^2) distance.
# ---------------------------------------------------------------------------
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= 5)
        .orderBy("name_a", "name_b")
    )


ORACLE["fuzzy_name_match"] = """
SELECT a.n_name AS name_a, b.n_name AS name_b,
       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
FROM nation a JOIN nation b ON a.n_name < b.n_name
WHERE levenshtein(a.n_name, b.n_name) <= 5
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# Ranking-window family completion: ntile / percent_rank / cume_dist
# / first_value / last_value / nth_value over one shared (priority,
# totalprice) ordering — one Exchange + one Sort serves all six.
# ---------------------------------------------------------------------------
def q_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first_value("o_orderkey").over(wfull).alias("cheapest"),
        F.last_value("o_orderkey").over(wfull).alias("priciest"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_cheapest"),
    )


ORACLE["window_family"] = """
SELECT o_orderkey, o_orderpriority,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderkey) OVER wf AS cheapest,
       last_value(o_orderkey) OVER wf AS priciest,
       nth_value(o_orderkey, 2) OVER wf AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
       wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Per-group linear regression (trend detection) from EXACT integer
# sums: x = whole seconds since 2024-01-01 (long arithmetic), y =
# value in floor-cents; Sx/Sy/Sxy/Sxx accumulate in DECIMAL(38,0)
# (exact, associative, layout-invariant), and only the final
# slope/intercept are IEEE double ops on those exact operands — so a
# FLOAT REGRESSION is bit-reproducible at any cluster size, and
# exactly oracled. One map-side-combinable groupBy; no second pass.
# ---------------------------------------------------------------------------
_EPOCH_2024_US = 1_704_067_200_000_000


def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = F.floor((F.unix_micros("ts") - F.lit(_EPOCH_2024_US)) / 1_000_000)
    y = F.floor(F.col("value") * 100)
    d = ev.select(
        "event_type", x.cast("decimal(38,0)").alias("x"), y.cast("decimal(38,0)").alias("y")
    )
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    to_d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    slope = (F.col("n") * to_d("sxy") - to_d("sx") * to_d("sy")) / (
        F.col("n") * to_d("sxx") - to_d("sx") * to_d("sx")
    )
    return (
        agg.withColumn("slope_cents_per_sec", slope)
        .withColumn(
            "intercept_cents",
            (to_d("sy") - F.col("slope_cents_per_sec") * to_d("sx")) / F.col("n"),
        )
        .select("event_type", "n", "slope_cents_per_sec", "intercept_cents")
        .orderBy("event_type")
    )


ORACLE["linear_trend"] = f"""
WITH d AS (
  SELECT event_type,
         CAST((epoch_us(ts) - {_EPOCH_2024_US}) // 1000000 AS DECIMAL(38,0)) AS x,
         CAST(FLOOR(value * 100) AS DECIMAL(38,0)) AS y
  FROM events
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM d GROUP BY event_type
)
SELECT event_type, n,
       (n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
       / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
         AS slope_cents_per_sec,
       (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
          - ((n * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
              - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / (n * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)))
            * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / n
         AS intercept_cents
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Exact percentiles via ORDER STATISTICS — the scale path next to
# q_percentiles above. Spark's exact `percentile` aggregate buffers a
# value->count map per aggregation buffer; on a high-cardinality
# double column (l_extendedprice: ~every value distinct) the partial
# maps grow with the data and the merge is memory-bound — wrong shape
# at 100 TB. The order-statistics formulation replaces the map with
# ONE sort shuffle per (group, measure): rank every value with a
# window, keep only the <= 2 rows straddling each target rank, and
# linearly interpolate. Sorts spill gracefully; nothing is
# proportional to cardinality in memory.
#
# Engine parity: the interpolation `v_lo + (v_hi - v_lo) * frac` and
# the rank arithmetic `1 + p*(n-1)` are written with identical text
# on both sides (the oracle intentionally does NOT use DuckDB's
# quantile_cont, whose internal formula isn't contractually
# identical) — so the doubles are bit-exact by construction.
# ---------------------------------------------------------------------------
def q_percentiles_ordstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.lit("qty").alias("measure"),
        F.col("l_quantity").cast("double").alias("v"),
    ).union(
        li.select(
            "l_returnflag",
            F.lit("price").alias("measure"),
            F.col("l_extendedprice").cast("double").alias("v"),
        )
    )
    wp = W.partitionBy("l_returnflag", "measure")
    ranked = base.select(
        "l_returnflag",
        "measure",
        "v",
        F.row_number().over(wp.orderBy("v", "l_returnflag")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )

    def r_expr(p: float) -> str:
        return f"(1.0D + {p}D * (CAST(n AS DOUBLE) - 1.0D))"

    keep = " OR ".join(
        f"rn = floor({r_expr(p)}) OR rn = ceil({r_expr(p)})" for _, p in _PCTS
    )
    aggs = [F.max("n").alias("n")]
    for tag, p in _PCTS:
        r = r_expr(p)
        aggs.append(
            F.expr(f"max(CASE WHEN rn = floor({r}) THEN v END)").alias(f"lo_{tag}")
        )
        aggs.append(
            F.expr(f"max(CASE WHEN rn = ceil({r}) THEN v END)").alias(f"hi_{tag}")
        )
    grouped = ranked.filter(F.expr(keep)).groupBy("l_returnflag", "measure").agg(*aggs)
    outs = [
        F.expr(
            f"lo_{tag} + (hi_{tag} - lo_{tag}) * "
            f"({r_expr(p)} - floor({r_expr(p)}))"
        ).alias(tag)
        for tag, p in _PCTS
    ]
    return grouped.select("l_returnflag", "measure", "n", *outs).orderBy(
        "l_returnflag", "measure"
    )


def _ordstat_oracle() -> str:
    def r_expr(p: float) -> str:
        return f"(1.0 + {p} * (CAST(n AS DOUBLE) - 1.0))"

    keep = " OR ".join(
        f"rn = floor({r_expr(p)}) OR rn = ceil({r_expr(p)})" for _, p in _PCTS
    )
    lo_hi = ", ".join(
        f"max(CASE WHEN rn = floor({r_expr(p)}) THEN v END) AS lo_{tag}, "
        f"max(CASE WHEN rn = ceil({r_expr(p)}) THEN v END) AS hi_{tag}"
        for tag, p in _PCTS
    )
    outs = ", ".join(
        f"lo_{tag} + (hi_{tag} - lo_{tag}) * ({r_expr(p)} - floor({r_expr(p)})) AS {tag}"
        for tag, p in _PCTS
    )
    return f"""
WITH base AS (
  SELECT l_returnflag, 'qty' AS measure, CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'price' AS measure, CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, measure, v,
         row_number() OVER (PARTITION BY l_returnflag, measure
                            ORDER BY v, l_returnflag) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag, measure) AS n
  FROM base
), grouped AS (
  SELECT l_returnflag, measure, CAST(MAX(n) AS BIGINT) AS n, {lo_hi}
  FROM ranked WHERE {keep}
  GROUP BY l_returnflag, measure
)
SELECT l_returnflag, measure, n, {outs}
FROM grouped ORDER BY l_returnflag, measure
"""


ORACLE["percentiles_ordstat"] = _ordstat_oracle()


# ---------------------------------------------------------------------------
# Native session windows: the same gap-merge semantics as
# ``sessionize`` but through Spark's built-in ``session_window``
# operator (the one the streaming path uses — streaming/ingest.py
# session_windows shares this exact plan shape, so a green driver row
# here certifies the streaming operator's aggregation semantics too).
#
# Semantics note (and the difference from the lag/cumsum formulation
# above): Spark merges two per-event windows [t, t+gap) when they
# OVERLAP, so an event landing exactly gap after its predecessor
# starts a NEW session — the oracle's lag test is therefore ``>=``
# where sessionize's is ``>``. window.end = last event ts + gap.
#
# Scale: one shuffle on user_id (the session assignment is a
# sort-merge within partitions), map-side combinable partial aggs; no
# window-function full-partition materialization.
# ---------------------------------------------------------------------------
SESSION_WINDOW_GAP = "30 minutes"


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", SESSION_WINDOW_GAP).alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


ORACLE["session_window_agg"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       {dsum_sql('value')} AS session_value
FROM sessioned
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 flavor — cheapest supplier per part: a correlated-MIN
# subquery decorrelated into a per-part window minimum. One shuffle
# on (part, supplier) for the cost rollup, one window over part (the
# rollup output — tiny vs lineitem), no re-join against the fact.
# ---------------------------------------------------------------------------
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(davg(F.expr("l_extendedprice * (1 - l_discount)")).alias("avg_cost"))
    )
    w = W.partitionBy("l_partkey")
    best = (
        cost.withColumn("min_cost", F.min("avg_cost").over(w))
        .filter(F.col("avg_cost") == F.col("min_cost"))
        .withColumn(
            "rn",
            F.row_number().over(w.orderBy("l_suppkey")),
        )
        .filter(F.col("rn") == 1)  # deterministic on cost ties
    )
    return (
        best.join(F.broadcast(sup), best.l_suppkey == sup.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("s_name").alias("supplier_name"),
            F.col("avg_cost").alias("best_avg_cost"),
        )
        .orderBy("partkey")
        .limit(100)
    )


ORACLE["min_cost_supplier"] = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         {davg_sql('l_extendedprice * (1 - l_discount)')} AS avg_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), mins AS (
  SELECT *, MIN(avg_cost) OVER (PARTITION BY l_partkey) AS min_cost FROM cost
), best AS (
  SELECT l_partkey, l_suppkey, avg_cost FROM (
    SELECT *, row_number() OVER (PARTITION BY l_partkey ORDER BY l_suppkey) AS rn
    FROM mins WHERE avg_cost = min_cost
  ) WHERE rn = 1
)
SELECT l_partkey AS partkey, s_name AS supplier_name,
       avg_cost AS best_avg_cost
FROM best JOIN supplier ON l_suppkey = s_suppkey
ORDER BY partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 flavor — parts whose revenue share exceeds a global
# threshold: scalar aggregate broadcast against a grouped aggregate.
# The global total is ONE row (broadcast nested-loop is correct and
# free); no second scan thanks to a shared shuffle output under AQE.
# ---------------------------------------------------------------------------
SHARE_THRESHOLD = 0.0005


def q_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("part_revenue")
    )
    total = per_part.agg(
        dsum("part_revenue").alias("total_revenue")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_revenue") > F.col("total_revenue") * SHARE_THRESHOLD
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            "part_revenue",
            (F.col("part_revenue") / F.col("total_revenue")).alias("revenue_share"),
        )
        .orderBy(F.col("part_revenue").desc(), "partkey")
    )


ORACLE["part_revenue_share"] = f"""
WITH per_part AS (
  SELECT l_partkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS part_revenue
  FROM lineitem GROUP BY l_partkey
), total AS (
  SELECT {dsum_sql('part_revenue')} AS total_revenue FROM per_part
)
SELECT l_partkey AS partkey, part_revenue,
       part_revenue / total_revenue AS revenue_share
FROM per_part, total
WHERE part_revenue > total_revenue * {SHARE_THRESHOLD}
ORDER BY part_revenue DESC, partkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 flavor — supplier diversity per part attribute, with a
# NOT-IN exclusion subquery: distinct-supplier counts per
# (brand, size) over parts outside one brand, excluding suppliers in
# debt. The exclusion set is tiny -> broadcast anti join; the
# distinct count is one shuffle on the (brand, size) group key.
# ---------------------------------------------------------------------------
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    excluded = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("p_brand") != "Brand#1")
        .join(
            F.broadcast(excluded),
            li.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .select("p_brand", "p_size", "l_suppkey")
    )
    return (
        pairs.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


ORACLE["supplier_diversity"] = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 flavor — the EXISTS / NOT-EXISTS double correlation:
# suppliers whose line was the LAST to ship in a multi-supplier
# finished order. Decorrelated Spark-side into per-order window aggs
# (count distinct suppliers, max shipdate) — one shuffle on orderkey,
# no correlated re-scans of lineitem.
# ---------------------------------------------------------------------------
def q_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    w = W.partitionBy("l_orderkey")
    annotated = (
        li.join(finished, li.l_orderkey == finished.o_orderkey)
        .withColumn("n_suppliers", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("max_ship", F.max("l_shipdate").over(w))
    )
    blockers = (
        annotated.filter(
            (F.col("n_suppliers") > 1) & (F.col("l_shipdate") == F.col("max_ship"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blockers.join(F.broadcast(sup), blockers.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


ORACLE["blocking_suppliers"] = """
WITH fin AS (
  SELECT l.* FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), ann AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_suppliers,
         MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship
  FROM fin
), blockers AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM ann WHERE n_suppliers > 1 AND l_shipdate = max_ship
)
SELECT s_name, COUNT(*) AS numwait
FROM blockers JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Statistical outlier detection: per-event-type z-scores from
# exact-decimal moments. Mean and variance come from decimal sums
# (order-independent -> engine-identical doubles), so the z-score
# arithmetic is the same IEEE expression on both sides. Two shuffles
# total: one tiny moments agg (broadcast back), one none — the score
# is a map-side projection against broadcast moments.
# ---------------------------------------------------------------------------
OUTLIER_Z = 2.0


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    moments = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s1"),
        dsum(F.expr("value * value")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    stats = moments.select(
        "event_type", mean.alias("mean_v"), F.sqrt(var).alias("std_v")
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > OUTLIER_Z)
        .orderBy("event_id")
    )


ORACLE["value_outliers"] = f"""
WITH moments AS (
  SELECT event_type, COUNT(*) AS n, {dsum_sql('value')} AS s1,
         {dsum_sql('value * value')} AS s2
  FROM events GROUP BY event_type
), stats AS (
  SELECT event_type, s1 / n AS mean_v,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std_v
  FROM moments
)
SELECT event_id, e.event_type, value, (value - mean_v) / std_v AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs((value - mean_v) / std_v) > {OUTLIER_Z}
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Rolling 7-day revenue per customer: a RANGE window frame over epoch
# seconds (time-based frames are the one window shape rows-frames
# can't emulate). Decimal accumulation inside the frame keeps the
# rolling sums order-independent. One shuffle on o_custkey.
# ---------------------------------------------------------------------------
ROLLING_WINDOW_S = 7 * 24 * 3600


def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-ROLLING_WINDOW_S, 0)
    )
    rolling = (
        F.sum(F.col("o_totalprice").cast("decimal(25,10)"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            rolling.alias("revenue_7d"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


ORACLE["rolling_revenue"] = f"""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN {ROLLING_WINDOW_S} PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS revenue_7d
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


# ---------------------------------------------------------------------------
# Date-spine gap filling: generate the full calendar between the
# corpus min/max order date, left-join daily revenue onto it, fill
# gaps with zero, and carry a cumulative total. The spine is a
# sequence-explode of ONE row (min/max scalar agg broadcast) — no
# driver-side date loop; the cumulative sum is decimal (exact), over
# a frame of days, not raw orders.
# ---------------------------------------------------------------------------
def q_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # The daily sum STAYS decimal until final output: re-quantizing a
    # double back to decimal is engine-dependent at the last digit
    # (Spark casts via the shortest string repr, DuckDB via the
    # binary value), so the cumulative sum must chain exact decimals.
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,10)")).alias("day_rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    zero_dec = F.lit(0).cast("decimal(25,10)")
    cum = (
        F.sum(F.coalesce("day_rev_dec", zero_dec))
        .over(w)
        .cast("string")
        .cast("double")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("day_rev_dec", zero_dec)
            .cast("string")
            .cast("double")
            .alias("day_revenue"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            cum.alias("cum_revenue"),
        )
        .orderBy("day")
    )


ORACLE["daily_gapfill"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS day_rev_dec,
         COUNT(*) AS n_orders
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
), bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
         MAX(CAST(o_orderdate AS DATE)) AS d1
  FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT spine.day,
       CAST(CAST(COALESCE(day_rev_dec, 0) AS VARCHAR) AS DOUBLE) AS day_revenue,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(COALESCE(day_rev_dec, CAST(0 AS DECIMAL(25,10)))) OVER (
         ORDER BY spine.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS cum_revenue
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY spine.day
"""


# ---------------------------------------------------------------------------
# Approximate-percentile sketch with a bounds contract (same pattern
# as approx_distinct): the KLL/GK-style sketch behind
# approx_percentile is engine-specific, so the oracle checks the
# CONTRACT — the approximation must land within 1% RANK tolerance of
# the exact order statistics — rather than the sketch values.
# ---------------------------------------------------------------------------
def q_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    approx = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)"
        ).alias("ap")
    )
    # exact rank of each approximate answer = count of values <= it:
    # one broadcast of the (3-row) sketch output + one map-side
    # combinable conditional agg — no sort, no window.
    joined = li.join(F.broadcast(approx), "l_returnflag")
    rank_of = [
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("ap")[i], 1).otherwise(0)
        ).alias(f"rank_q{i}")
        for i in range(2)
    ]
    checked = (
        joined.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), *rank_of)
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n_rows"),
            (
                (F.abs(F.col("rank_q0") / F.col("n") - 0.5) <= 0.01)
                & (F.abs(F.col("rank_q1") / F.col("n") - 0.9) <= 0.01)
            ).alias("within_1pct_rank"),
        )
    )
    return checked.orderBy("l_returnflag")


ORACLE["approx_percentile_bounds"] = """
SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS within_1pct_rank
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Decile segmentation: ntile(10) over a deterministic total order
# (price, key tiebreak), rolled up to per-decile stats — the
# "quality calibration" shape used to pick corpus filtering
# thresholds from score distributions.
#
# Scale note: a global ntile needs a total order (one partition for
# the window). That is fine up to ~10^8 rows on one executor; beyond
# that, compute decile BOUNDARIES with approx_percentile (see
# q_approx_percentile_bounds for the sketch's rank-error contract)
# and assign buckets map-side with a broadcast threshold array — the
# same report without the global sort.
# ---------------------------------------------------------------------------
def q_totalprice_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    tiled = orders.select(
        "o_totalprice", F.ntile(10).over(w).alias("decile")
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice").alias("decile_revenue"),
        )
        .orderBy("decile")
    )


ORACLE["totalprice_deciles"] = f"""
SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       {dsum_sql('o_totalprice')} AS decile_revenue
FROM (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Event-transition matrix: first-order Markov transitions of
# event_type per user (lag pairs -> counts -> row-normalized
# probabilities). One shuffle on user_id for the lag, one tiny agg;
# the normalization window runs over the (n_types²)-row matrix.
# ---------------------------------------------------------------------------
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = W.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p",
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(total),
        )
        .orderBy("prev_type", "next_type")
    )


ORACLE["event_transitions"] = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / SUM(n_transitions) OVER (PARTITION BY prev_type) AS p
FROM counts
ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# Frequent-items sketch with a membership contract (the freqItems
# counterpart of the approx_distinct/approx_percentile bounds
# pattern): Spark's stat.freqItems implements Karp-Papadimitriou-
# Shenker — its guarantee is NO FALSE NEGATIVES above the support
# threshold, so the oracle checks exactly that: every event_type
# whose true frequency exceeds support must be in the sketch output.
# ---------------------------------------------------------------------------
FREQ_SUPPORT = 0.15


def q_frequent_items_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    freq = ev.stat.freqItems(["event_type"], FREQ_SUPPORT).select(
        F.col("event_type_freqItems").alias("sketch_items")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.col("total") * FREQ_SUPPORT)
        .crossJoin(F.broadcast(freq))
        .select(
            "event_type",
            "n",
            F.array_contains("sketch_items", F.col("event_type")).alias(
                "in_sketch"
            ),
        )
        .orderBy("event_type")
    )


ORACLE["frequent_items_bounds"] = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
), total AS (
  SELECT SUM(n) AS total FROM counts
)
SELECT event_type, n, TRUE AS in_sketch
FROM counts, total
WHERE n > total * {FREQ_SUPPORT}
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Salted shuffled join (functions/skew.salted_join): dim replicated
# across salts, fact salted on a row-distinguishing column — the
# skew recipe for joins that must shuffle (no AQE, dim too big to
# broadcast). The oracle is the PLAIN join: salting must be
# invisible in the result.
# ---------------------------------------------------------------------------
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    joined = salted_join(li, orders, key="l_orderkey", salt_on="l_linenumber")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE["skew_salted_join"] = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# UNPIVOT (melt): wide measure columns -> long (measure, value) rows
# via stack() — the inverse of q_pivot_status, completing the
# reshape pair. Map-side expansion (no shuffle for the melt itself);
# the rollup after it is one combinable agg.
# ---------------------------------------------------------------------------
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    melted = li.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, value)"
        ),
    )
    return (
        melted.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .orderBy("l_returnflag", "measure")
    )


ORACLE["unpivot_measures"] = f"""
WITH melted AS (
  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
)
SELECT l_returnflag, measure, COUNT(*) AS n,
       {dsum_sql('value')} AS total,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM melted
GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
"""


# ---------------------------------------------------------------------------
# Forward as-of: each purchase matched to the user's NEXT click (the
# mirror of q_asof_last_purchase's backward lookup) via a FOLLOWING-
# frame conditional min — still one shuffle on user_id, no range-join
# explosion, and the frame direction is the only change.
# ---------------------------------------------------------------------------
def q_asof_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    next_click = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("next_click_ts", next_click)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "next_click_ts")
        .orderBy("user_id", "event_id")
    )


ORACLE["asof_next_click"] = """
SELECT user_id, event_id, ts, next_click_ts
FROM (
  SELECT user_id, event_id, ts, event_type,
         MIN(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_click_ts
  FROM events
)
WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# Co-occurrence mining: parts frequently ordered together. The
# basket->pairs shape is the dedup posting-list pattern (one shuffle
# to group baskets, pairs generated MAP-SIDE from each sorted basket
# via higher-order slice/transform — never a self-join of the
# exploded table, which would shuffle the order-part pairs twice and
# hash-join millions of keys). TPC-H baskets are tiny (<=7 parts), so
# per-basket pair fan-out is bounded; for corpora with huge baskets
# apply the dedup module's frequency cap before pairing.
# ---------------------------------------------------------------------------
MIN_COOC = 2
TOP_COOC = 100


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts) - i - 1), "
                "y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= MIN_COOC)
        .orderBy(F.col("n_orders_together").desc(), "part_a", "part_b")
        .limit(TOP_COOC)
    )


ORACLE["copurchase_pairs"] = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders_together
FROM op a
JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING COUNT(*) >= {MIN_COOC}
ORDER BY n_orders_together DESC, part_a, part_b
LIMIT {TOP_COOC}
"""


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4.x WITH RECURSIVE): ancestor-chain flattening
# over a deterministic binary hierarchy derived from customer keys
# (parent = floor(key/2), root = 1). The classic org-chart/BOM
# traversal SQL alone could not express before recursive CTEs landed;
# the engine's iterative twin is dedup_clusters' checkpointed loop —
# this is the declarative form, planned and executed by Catalyst.
# Depth is logarithmic in the key space, so the recursion runs
# ~log2(max_key) rounds; each round is a hash join against the
# (tiny) frontier — the same shape at any scale.
# ---------------------------------------------------------------------------
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("rh_customer")
    return spark.sql(
        """
        WITH RECURSIVE anc(custkey, ancestor, depth) AS (
          SELECT c_custkey, CAST(FLOOR(c_custkey / 2) AS BIGINT), 1
          FROM rh_customer WHERE c_custkey > 1
          UNION ALL
          SELECT custkey, CAST(FLOOR(ancestor / 2) AS BIGINT), depth + 1
          FROM anc WHERE ancestor > 1
        ),
        chain AS (
          SELECT custkey, MAX(depth) AS depth_to_root FROM anc GROUP BY custkey
        )
        SELECT CAST(depth_to_root AS BIGINT) AS depth_to_root,
               COUNT(*) AS n_customers,
               CAST(MIN(custkey) AS BIGINT) AS min_key,
               CAST(MAX(custkey) AS BIGINT) AS max_key
        FROM chain
        GROUP BY depth_to_root
        ORDER BY depth_to_root
        """
    )


ORACLE["recursive_hierarchy"] = """
WITH RECURSIVE anc(custkey, ancestor, depth) AS (
  SELECT c_custkey, CAST(FLOOR(c_custkey / 2) AS BIGINT), 1
  FROM customer WHERE c_custkey > 1
  UNION ALL
  SELECT custkey, CAST(FLOOR(ancestor / 2) AS BIGINT), depth + 1
  FROM anc WHERE ancestor > 1
),
chain AS (
  SELECT custkey, MAX(depth) AS depth_to_root FROM anc GROUP BY custkey
)
SELECT CAST(depth_to_root AS BIGINT) AS depth_to_root,
       COUNT(*) AS n_customers,
       CAST(MIN(custkey) AS BIGINT) AS min_key,
       CAST(MAX(custkey) AS BIGINT) AS max_key
FROM chain
GROUP BY depth_to_root
ORDER BY depth_to_root
"""


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection: each event scored against the
# trailing ROLLING_Z_PRIOR events of the SAME user (frame excludes
# the current row, so an outlier never masks itself), flagged when
# |z| > ROLLING_Z. Complements q_value_outliers (global per-type
# moments): this is the streaming-shaped "did THIS user just deviate
# from THEIR recent behavior" detector, with a warm-up guard of
# ROLLING_Z_MIN_PRIOR observations before any score is emitted.
#
# Engine parity follows the rolling_revenue recipe: frame sums are
# exact decimals cast back through VARCHAR (functions/oracle.py), the
# frame order (ts, event_id) is total, and mean/var/z are the same
# IEEE expression text on both engines — sqrt is correctly rounded
# per IEEE-754, so the hash compare is exact.
#
# Scale: ONE shuffle (hash partition by user_id), then a sorted
# window pass; rows-frame state is O(ROLLING_Z_PRIOR) per partition.
# ---------------------------------------------------------------------------
ROLLING_Z_PRIOR = 20
ROLLING_Z_MIN_PRIOR = 10
ROLLING_Z = 3.0


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLLING_Z_PRIOR, -1)
    )
    s1 = (
        F.sum(F.col("value").cast("decimal(25,10)"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(25,10)"))
        .over(w)
        .cast("string")
        .cast("double")
    )
    n = F.count(F.lit(1)).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    # Explicit variance-positive predicate: on a constant trailing
    # window Spark's zero-divide yields NULL (row filtered) while
    # DuckDB's IEEE mode yields +/-inf (row flagged) — making the
    # guard explicit keeps both engines in agreement by construction.
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            n.alias("n_prior"),
            var.alias("_var"),
            z.alias("z"),
        )
        .filter(
            (F.col("n_prior") >= ROLLING_Z_MIN_PRIOR)
            & (F.col("_var") > 0)
            & (F.abs(F.col("z")) > ROLLING_Z)
        )
        .drop("_var")
        .orderBy("event_id")
    )


ORACLE["rolling_zscore"] = f"""
WITH wstats AS (
  SELECT event_id, user_id, event_type, value,
    CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) OVER w AS VARCHAR)
         AS DOUBLE) AS s1,
    CAST(CAST(SUM(CAST(value * value AS DECIMAL(25,10))) OVER w AS VARCHAR)
         AS DOUBLE) AS s2,
    COUNT(*) OVER w AS n_prior
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ROLLING_Z_PRIOR} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, event_type, value, n_prior,
       (value - s1 / n_prior)
         / sqrt((s2 - s1 * s1 / n_prior) / (n_prior - 1)) AS z
FROM wstats
WHERE n_prior >= {ROLLING_Z_MIN_PRIOR}
  AND (s2 - s1 * s1 / n_prior) / (n_prior - 1) > 0
  AND abs((value - s1 / n_prior)
          / sqrt((s2 - s1 * s1 / n_prior) / (n_prior - 1))) > {ROLLING_Z}
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Join-key skew profile — the diagnosis that decides WHICH mitigation
# a big join needs before it runs: for each candidate lineitem join
# key, the distinct-key count, the heaviest key's row count, the
# skew factor (heaviest key vs mean key load — how unbalanced the
# heaviest shuffle partition's hottest key is), and the heaviest
# key's share of all rows (whether ONE key dominates enough that
# salting/AQE-skew-join matters). functions/skew.py holds the
# mitigations; this is the profile a 100 TB operator reads first.
#
# Plan: one stack of the three key columns (map-side, no payload),
# two-level aggregation — per-(col,key) counts with map-side
# combine, then a 3-row per-column rollup. Shuffle volume is bounded
# by distinct keys, never row count. Ratios are single divisions of
# exact int64 counts, bit-identical cross-engine.
# ---------------------------------------------------------------------------
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.expr(
            "stack(3, 'l_orderkey', CAST(l_orderkey AS BIGINT), "
            "'l_partkey', CAST(l_partkey AS BIGINT), "
            "'l_suppkey', CAST(l_suppkey AS BIGINT)) AS (key_col, key_value)"
        )
    )
    per_key = stacked.groupBy("key_col", "key_value").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_key.groupBy("key_col")
        .agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_key_rows"),
        )
        .select(
            "key_col",
            "n_rows",
            "n_distinct",
            "max_key_rows",
            (
                (F.col("max_key_rows") * F.col("n_distinct")).cast("double")
                / F.col("n_rows")
            ).alias("skew_factor"),
            (F.col("max_key_rows").cast("double") / F.col("n_rows")).alias(
                "top_key_share"
            ),
        )
        .orderBy("key_col")
    )


ORACLE["skew_profile"] = """
WITH stacked AS (
  SELECT 'l_orderkey' AS key_col, CAST(l_orderkey AS BIGINT) AS key_value
    FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(l_partkey AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS BIGINT) FROM lineitem
), per_key AS (
  SELECT key_col, key_value, COUNT(*) AS c
  FROM stacked GROUP BY key_col, key_value
)
SELECT key_col,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       COUNT(*) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS max_key_rows,
       CAST(MAX(c) * COUNT(*) AS DOUBLE) / SUM(c) AS skew_factor,
       CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_key_share
FROM per_key GROUP BY key_col ORDER BY key_col
"""


# ---------------------------------------------------------------------------
# Longest same-type streak per user — the canonical gaps-and-islands
# shape (the one windowing idiom the registry didn't yet pin): a
# "streak" is a maximal run of consecutive events with the same
# event_type in the user's (ts, event_id) order. Islands fall out of
# the classic two-row_number difference: rn_overall - rn_within_type
# is constant exactly while the type doesn't change, so (user, type,
# diff) IS the island key — no iteration, no self-join.
#
# Everything is int64 window arithmetic (two sorted rank passes over
# the same single shuffle by user, then a count per island and a max
# per user); ties on streak length break deterministically to the
# lexicographically smallest type, then earliest island start.
# ---------------------------------------------------------------------------
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = ev.select(
        "user_id",
        "event_type",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "island"
        ),
    )
    streaks = islands.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("streak"),
        F.min("event_id").alias("first_event_id"),
    )
    w_best = W.partitionBy("user_id").orderBy(
        F.desc("streak"), "event_type", "first_event_id"
    )
    return (
        streaks.select(
            "user_id",
            "event_type",
            "streak",
            "first_event_id",
            F.row_number().over(w_best).alias("rk"),
        )
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("streak_type"),
            F.col("streak").alias("longest_streak"),
            "first_event_id",
        )
        .orderBy("user_id")
    )


ORACLE["longest_streak"] = """
WITH islands AS (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
  FROM events
), streaks AS (
  SELECT user_id, event_type, island,
         COUNT(*) AS streak, MIN(event_id) AS first_event_id
  FROM islands GROUP BY user_id, event_type, island
)
SELECT user_id, event_type AS streak_type,
       CAST(streak AS BIGINT) AS longest_streak, first_event_id
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY streak DESC, event_type, first_event_id) AS rk
  FROM streaks
)
WHERE rk = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Rolling 7-day active users — the growth-analytics DAU/WAU pair,
# computed EXACTLY: for each day, how many distinct users had at
# least one event in the trailing ROLLING_AU_DAYS window. A windowed
# COUNT(DISTINCT) doesn't exist in either engine; the classic exact
# rewrite dedups to (user, day) pairs first (tiny — bounded by
# users x days, independent of event volume), then explodes each
# pair into the ROLLING_AU_DAYS window-end days it covers and counts
# distinct users per window end. Only surviving days appear (a
# window end with zero activity has no row, identically in both
# engines).
#
# Scale: events collapse map-side to the (user, day) set (ONE
# shuffle bounded by |users| x |days|); the x7 explode multiplies
# the tiny dedup set, never the event stream.
# ---------------------------------------------------------------------------
ROLLING_AU_DAYS = 7


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    exploded = pairs.select(
        "user_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {ROLLING_AU_DAYS - 1}), "
                "i -> date_add(day, i))"
            )
        ).alias("window_end"),
    )
    daily = pairs.groupBy("day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    rolling = exploded.groupBy("window_end").agg(
        F.count_distinct("user_id").alias("wau")
    )
    return (
        daily.join(rolling, daily["day"] == rolling["window_end"])
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            (F.col("wau").cast("double") / F.col("dau").cast("double")).alias(
                "stickiness_inv"
            ),
        )
        .orderBy("day")
    )


ORACLE["rolling_active_users"] = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), daily AS (
  SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY day
), exploded AS (
  SELECT user_id, day + CAST(i || ' days' AS INTERVAL) AS window_end
  FROM pairs, UNNEST(range(0, {ROLLING_AU_DAYS})) AS t(i)
), rolling AS (
  SELECT window_end, COUNT(DISTINCT user_id) AS wau
  FROM exploded GROUP BY window_end
)
SELECT CAST(d.day AS VARCHAR) AS day, d.dau, r.wau,
       CAST(r.wau AS DOUBLE) / CAST(d.dau AS DOUBLE) AS stickiness_inv
FROM daily d JOIN rolling r ON r.window_end = d.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# New vs returning users per day — the acquisition/retention split:
# a user's FIRST-ever event day marks them new; every later active
# day counts them returning. Exact via the per-user minimum day over
# the deduped (user, day) set — event payloads never shuffle, and
# the min fold is map-side combinable.
# ---------------------------------------------------------------------------
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pairs = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = pairs.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        pairs.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("new_users"),
            F.sum(
                F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
            ).alias("returning_users"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "new_users",
            "returning_users",
        )
        .orderBy("day")
    )


ORACLE["new_vs_returning"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), firsts AS (
  SELECT user_id, MIN(day) AS first_day FROM pairs GROUP BY user_id
)
SELECT CAST(p.day AS VARCHAR) AS day,
       CAST(SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN p.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM pairs p JOIN firsts f USING (user_id)
GROUP BY p.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Pareto / ABC inventory classification — rank parts by exact revenue,
# cut the cumulative-share curve at 80% (A) and 95% (B), and report
# each class's population and revenue mass: the classic "which 20% of
# SKUs carry 80% of revenue" warehouse query.
#
# Exactness: per-part revenue is an exact decimal sum; the cumulative
# and total sums are exact DECIMAL(38,10) window aggregates over the
# slim (partkey, revenue) frame; the share and the class boundaries
# compare identical doubles on both engines.
#
# Scale: facts collapse map-side to one slim row per part; the global
# cumulative window orders (revenue, partkey) pairs only — at 100x
# the part dimension this swaps for the documented broadcast-threshold
# sketch (totalprice_deciles pattern) unchanged.
# ---------------------------------------------------------------------------
def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(25,10)")
        .alias("r"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("r").cast("decimal(38,10)").alias("rev")
    )
    wcum = W.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy()
    cum_d = F.sum("rev").over(wcum).cast("string").cast("double")
    tot_d = F.sum("rev").over(wall).cast("string").cast("double")
    share = cum_d / tot_d
    classed = per_part.select(
        "l_partkey",
        "rev",
        tot_d.alias("tot"),
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("decimal(38,10)").cast("string").cast("double").alias(
                "class_revenue"
            ),
            F.max("tot").alias("tot"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_revenue",
            (F.col("class_revenue") / F.col("tot")).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


ORACLE["pareto_abc"] = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,10)))
              AS DECIMAL(38,10)) AS rev
  FROM lineitem GROUP BY l_partkey
), curve AS (
  SELECT l_partkey, rev,
         CAST(CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS VARCHAR) AS DOUBLE) AS cum_d,
         CAST(CAST(SUM(rev) OVER () AS VARCHAR) AS DOUBLE) AS tot
  FROM per_part
), classed AS (
  SELECT l_partkey, rev, tot,
         CASE WHEN cum_d / tot <= 0.80 THEN 'A'
              WHEN cum_d / tot <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM curve
)
SELECT abc_class, COUNT(*) AS n_parts,
       CAST(CAST(CAST(SUM(rev) AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE)
         AS class_revenue,
       CAST(CAST(CAST(SUM(rev) AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE) / MAX(tot)
         AS revenue_share
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


# ---------------------------------------------------------------------------
# Sliding 7-day distinct users — the exact trailing-week unique-user
# count per day, the canonical WAU-by-day panel. COUNT(DISTINCT) over
# a sliding range has no map-combinable form, so the scalable shape
# is: dedup to (user, day) pairs map-side, EXPLODE each pair into the
# <=7 window-ends it covers (an equi-join-able key — no range/BNLJ
# join anywhere), and run one exact distinct-count per window end.
# 7x slim pairs is the whole shuffle; at 100 TB the pair dedup is the
# only pass that touches the fact table. (rolling_active_users does
# the related calendar-window variant; this one pins the explode
# re-keying shape.)
# ---------------------------------------------------------------------------
SLIDING_WINDOW_DAYS = 7


def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    pairs = ev.distinct()
    exploded = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), SLIDING_WINDOW_DAYS - 1))
        ).alias("window_end"),
    )
    spine = pairs.select(F.col("d").alias("window_end")).distinct()
    return (
        exploded.join(spine, "window_end", "left_semi")
        .groupBy("window_end")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
        .orderBy("window_end")
    )


ORACLE["sliding_distinct_users"] = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), ex AS (
  SELECT user_id, d + CAST(t.i AS INTEGER) AS window_end
  FROM pairs, generate_series(0, {SLIDING_WINDOW_DAYS - 1}) AS t(i)
), spine AS (
  SELECT DISTINCT d AS window_end FROM pairs
)
SELECT window_end, COUNT(DISTINCT user_id) AS n_users_7d
FROM ex
WHERE window_end IN (SELECT window_end FROM spine)
GROUP BY window_end
ORDER BY window_end
"""


# ---------------------------------------------------------------------------
# Clickstream path analysis — the most common first-5-event journeys:
# order each user's events by (ts, event_id), join the first five
# event types into a '>'-delimited path, and count users per path.
# The product-analytics "top user journeys" panel, and the repo's
# deterministic collect_list pattern: the list is collected unordered
# (Spark makes no ordering promise) and sorted by an explicit rank
# INSIDE the row via array_sort over (rn, type) structs.
#
# Scale: the rank window shuffles slim (user, ts, event_id, type)
# tuples partitioned by user (no global sort); paths aggregate
# map-side; top-k is a per-partition heap.
# ---------------------------------------------------------------------------
PATH_LEN = 5
TOP_PATHS = 30


def q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    firsts = ev.select("user_id", "event_type", rn.alias("rn")).where(
        F.col("rn") <= PATH_LEN
    )
    paths = firsts.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(TOP_PATHS)
    )


ORACLE["user_paths"] = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {PATH_LEN} GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT {TOP_PATHS}
"""


# ---------------------------------------------------------------------------
# Cohort lifetime value — customers cohorted by first-order month;
# for each (cohort, age-in-months) cell: active customers, exact cell
# revenue, and the running cumulative revenue per cohort member (the
# LTV curve every retention model calibrates against). Complements
# cohort_retention (which counts users only) with exact money.
#
# Exactness: the month index is pure int arithmetic (year*12+month);
# cell revenue and the cumulative window sum are exact decimals over
# the small (cohort x age) grid; the two ratios are final doubles.
# ---------------------------------------------------------------------------
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(25,10)").alias("p"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("m_idx"),
    )
    wcust = W.partitionBy("o_custkey")
    cohorted = o.select(
        "o_custkey",
        "p",
        "m_idx",
        F.min("m_idx").over(wcust).alias("cohort_idx"),
    )
    cells = cohorted.groupBy(
        "cohort_idx", (F.col("m_idx") - F.col("cohort_idx")).alias("age_months")
    ).agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("p").cast("decimal(38,10)").alias("cell_rev"),
    )
    sizes = cohorted.groupBy("cohort_idx").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    wltv = W.partitionBy("cohort_idx").orderBy("age_months").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum_d = F.sum("cell_rev").over(wltv).cast("decimal(38,10)").cast("string").cast(
        "double"
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_idx")
        .select(
            "cohort_idx",
            "age_months",
            "cohort_size",
            "n_active",
            F.col("cell_rev").cast("string").cast("double").alias("cell_revenue"),
            (cum_d / F.col("cohort_size").cast("double")).alias("ltv_per_user"),
        )
        .orderBy("cohort_idx", "age_months")
    )


ORACLE["cohort_ltv"] = """
WITH o AS (
  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(25,10)) AS p,
         year(o_orderdate) * 12 + month(o_orderdate) AS m_idx
  FROM orders
), cohorted AS (
  SELECT o_custkey, p, m_idx,
         MIN(m_idx) OVER (PARTITION BY o_custkey) AS cohort_idx
  FROM o
), cells AS (
  SELECT cohort_idx, m_idx - cohort_idx AS age_months,
         COUNT(DISTINCT o_custkey) AS n_active,
         CAST(SUM(p) AS DECIMAL(38,10)) AS cell_rev
  FROM cohorted GROUP BY 1, 2
), sizes AS (
  SELECT cohort_idx, COUNT(DISTINCT o_custkey) AS cohort_size
  FROM cohorted GROUP BY cohort_idx
)
SELECT CAST(cohort_idx AS BIGINT) AS cohort_idx,
       CAST(age_months AS BIGINT) AS age_months,
       cohort_size, n_active,
       CAST(CAST(cell_rev AS VARCHAR) AS DOUBLE) AS cell_revenue,
       CAST(CAST(CAST(SUM(cell_rev) OVER (PARTITION BY cohort_idx ORDER BY age_months
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE)
         / CAST(cohort_size AS DOUBLE) AS ltv_per_user
FROM cells JOIN sizes USING (cohort_idx)
ORDER BY cohort_idx, age_months
"""


# ---------------------------------------------------------------------------
# Signup-to-purchase conversion latency — for each user who purchased
# after signing up, the whole-second delay between first signup and
# first subsequent purchase; reported as exact order statistics
# (min / lower-median / p90 / max) plus the conversion count. The
# funnel-timing panel that complements `funnel` (which counts stages
# but not speed).
#
# Exactness: latencies are int64 epoch-second diffs; the order
# statistics PICK ranked elements (rank() over the slim latency
# frame) — no float ever appears.
#
# Scale: per-user firsts are map-side min-aggregates; the ordstat
# window ranks one slim int row per CONVERTED user (the
# percentiles_ordstat shape at user cardinality, not event
# cardinality).
# ---------------------------------------------------------------------------
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchase_ts"),
    )
    lat = (
        firsts.where(
            F.col("signup_ts").isNotNull()
            & F.col("purchase_ts").isNotNull()
            & (F.col("purchase_ts") >= F.col("signup_ts"))
        )
        .select(
            "user_id",
            (
                F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")
            ).alias("latency_s"),
        )
    )
    ranked = lat.select(
        "latency_s",
        F.rank().over(W.orderBy("latency_s", "user_id")).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    return ranked.groupBy().agg(
        F.max("n").alias("n_converted"),
        F.min("latency_s").alias("min_s"),
        F.max(
            F.when(F.col("rk") == F.floor((F.col("n") + 1) / 2), F.col("latency_s"))
        ).alias("median_s"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.9), F.col("latency_s"))
        ).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    ).where(F.col("n_converted").isNotNull())


ORACLE["conversion_latency"] = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
  FROM events GROUP BY user_id
), lat AS (
  SELECT user_id,
         CAST(floor(epoch(purchase_ts)) AS BIGINT)
           - CAST(floor(epoch(signup_ts)) AS BIGINT) AS latency_s
  FROM firsts
  WHERE signup_ts IS NOT NULL AND purchase_ts IS NOT NULL
    AND purchase_ts >= signup_ts
), ranked AS (
  SELECT latency_s,
         rank() OVER (ORDER BY latency_s, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM lat
)
SELECT MAX(n) AS n_converted,
       MIN(latency_s) AS min_s,
       MAX(CASE WHEN rk = CAST(floor((n + 1) / 2) AS BIGINT)
                THEN latency_s END) AS median_s,
       MAX(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT)
                THEN latency_s END) AS p90_s,
       MAX(latency_s) AS max_s
FROM ranked
HAVING MAX(n) IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Inactivity gap detection (gaps-and-islands) — per user, the runs of
# calendar days with NO events between two active days: lag() over
# each user's distinct activity days, a gap row wherever consecutive
# active days differ by more than one, ranked by length. The
# churn-risk early-warning panel (and the classic gaps-and-islands
# SQL shape the registry otherwise lacked).
#
# Exactness: all int day arithmetic; global totals are window counts
# over the tiny gap frame; top-k is deterministic via the
# (len, user, start) composite order.
#
# Scale: activity dedup is map-side; the lag window partitions by
# user (slim (user, day) pairs — no global sort anywhere).
# ---------------------------------------------------------------------------
GAP_TOPK = 20


def q_inactivity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    lagged = days.select(
        "user_id",
        "d",
        F.lag("d").over(W.partitionBy("user_id").orderBy("d")).alias("prev_d"),
    )
    gaps = lagged.where(
        F.col("prev_d").isNotNull() & (F.datediff("d", "prev_d") > 1)
    ).select(
        "user_id",
        F.date_add("prev_d", 1).alias("gap_start"),
        F.date_add("d", -1).alias("gap_end"),
        (F.datediff("d", "prev_d") - 1).alias("gap_days"),
    )
    wall = W.partitionBy()
    return (
        gaps.select(
            "user_id",
            "gap_start",
            "gap_end",
            "gap_days",
            F.count(F.lit(1)).over(wall).alias("n_gaps"),
            F.sum("gap_days").over(wall).alias("total_idle_days"),
        )
        .orderBy(F.desc("gap_days"), "user_id", "gap_start")
        .limit(GAP_TOPK)
    )


ORACLE["inactivity_gaps"] = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), lagged AS (
  SELECT user_id, d,
         lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
  FROM days
), gaps AS (
  SELECT user_id,
         prev_d + 1 AS gap_start,
         d - 1 AS gap_end,
         date_diff('day', prev_d, d) - 1 AS gap_days
  FROM lagged
  WHERE prev_d IS NOT NULL AND date_diff('day', prev_d, d) > 1
)
SELECT user_id, gap_start, gap_end,
       CAST(gap_days AS INT) AS gap_days,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_gaps,
       CAST(SUM(gap_days) OVER () AS BIGINT) AS total_idle_days
FROM gaps
ORDER BY gap_days DESC, user_id, gap_start
LIMIT {GAP_TOPK}
"""


# ---------------------------------------------------------------------------
# Shipping-delay profile — the distribution of order-date ->
# ship-date lag, bucketed into SLA bands per order priority, with
# each band's share of its priority: the operational latency panel
# behind late_shipment_priority (which flags one band; this profiles
# all of them).
#
# Exactness: the lag is an int day diff; buckets are integer
# comparisons; the share is one division of exact counts.
#
# Scale: the orders->lineitem equi-join shuffles on the join key with
# AQE handling skew; the profile aggregates map-side to
# |priorities| x |bands| rows.
# ---------------------------------------------------------------------------
def q_ship_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff("l_shipdate", "o_orderdate")
    band = (
        F.when(lag <= 7, "a_0_7d")
        .when(lag <= 30, "b_8_30d")
        .when(lag <= 60, "c_31_60d")
        .when(lag <= 90, "d_61_90d")
        .otherwise("e_over_90d")
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority", band.alias("delay_band")
    )
    counts = joined.groupBy("o_orderpriority", "delay_band").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    wp = W.partitionBy("o_orderpriority")
    return (
        counts.select(
            "o_orderpriority",
            "delay_band",
            "n_lines",
            (
                F.col("n_lines").cast("double")
                / F.sum("n_lines").over(wp).cast("double")
            ).alias("share_in_priority"),
        )
        .orderBy("o_orderpriority", "delay_band")
    )


ORACLE["ship_delay_profile"] = """
WITH joined AS (
  SELECT o.o_orderpriority,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 7 THEN 'a_0_7d'
              WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN 'b_8_30d'
              WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN 'c_31_60d'
              WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'd_61_90d'
              ELSE 'e_over_90d' END AS delay_band
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), counts AS (
  SELECT o_orderpriority, delay_band, COUNT(*) AS n_lines
  FROM joined GROUP BY 1, 2
)
SELECT o_orderpriority, delay_band, n_lines,
       CAST(n_lines AS DOUBLE)
         / CAST(SUM(n_lines) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
         AS share_in_priority
FROM counts
ORDER BY o_orderpriority, delay_band
"""


# ---------------------------------------------------------------------------
# Market concentration (Herfindahl–Hirschman index) — per supplier
# nation: each supplier's share of the nation's exact revenue,
# squared and summed (HHI, the antitrust-standard concentration
# measure, 1/n for perfect competition .. 1.0 for monopoly), plus the
# top supplier's share. The "is one supplier dominating this region"
# panel.
#
# Exactness: revenue sums are exact decimals; shares are
# deterministic doubles of exact totals; the share^2 sum routes
# through the repo's per-row-decimal dsum so the cross-row float sum
# is order-independent (functions/oracle.py).
#
# Scale: facts collapse map-side to one slim row per supplier; the
# nation totals are window sums over the supplier frame (bounded by
# the supplier dimension); output is |nations| rows.
# ---------------------------------------------------------------------------
def q_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(25,10)")
        .alias("r"),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_supp = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("r").cast("decimal(38,10)").alias("rev"))
    )
    wn = W.partitionBy("s_nationkey")
    tot_d = F.sum("rev").over(wn).cast("string").cast("double")
    shared = per_supp.select(
        "s_nationkey",
        (F.col("rev").cast("string").cast("double") / tot_d).alias("share"),
    )
    hhi = shared.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        dsum(F.col("share") * F.col("share")).alias("hhi"),
        F.max("share").alias("top_share"),
    )
    return (
        hhi.join(F.broadcast(nation), hhi["s_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "hhi",
            "top_share",
        )
        .orderBy("nation")
    )


ORACLE["market_concentration"] = f"""
WITH per_supp AS (
  SELECT s.s_nationkey, s.s_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,10)))
              AS DECIMAL(38,10)) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), shared AS (
  SELECT s_nationkey,
         CAST(CAST(rev AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(rev) OVER (PARTITION BY s_nationkey) AS VARCHAR)
                  AS DOUBLE) AS share
  FROM per_supp
), hhi AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers,
         {dsum_sql('share * share')} AS hhi,
         MAX(share) AS top_share
  FROM shared GROUP BY s_nationkey
)
SELECT n.n_name AS nation, h.n_suppliers, h.hhi, h.top_share
FROM hhi h JOIN nation n ON h.s_nationkey = n.n_nationkey
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Reorder-interval distribution — the day gap between each customer's
# consecutive orders, bucketed into repurchase bands with shares: the
# repeat-behavior panel behind retention and inventory forecasting
# (how long until a customer comes back).
#
# Exactness: gaps are int day diffs from lag() over (orderdate,
# orderkey); buckets are integer comparisons; shares divide exact
# counts.
#
# Scale: the lag window shuffles slim (cust, date, key) tuples
# partitioned by customer; the histogram aggregates map-side to a
# handful of rows.
# ---------------------------------------------------------------------------
def q_reorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    gaps = o.select(
        F.datediff("o_orderdate", prev).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    band = (
        F.when(F.col("gap_days") <= 7, "a_within_week")
        .when(F.col("gap_days") <= 30, "b_within_month")
        .when(F.col("gap_days") <= 90, "c_within_quarter")
        .when(F.col("gap_days") <= 365, "d_within_year")
        .otherwise("e_over_year")
    )
    counts = gaps.groupBy(band.alias("reorder_band")).agg(
        F.count(F.lit(1)).alias("n_gaps")
    )
    wall = W.partitionBy()
    return (
        counts.select(
            "reorder_band",
            "n_gaps",
            (
                F.col("n_gaps").cast("double")
                / F.sum("n_gaps").over(wall).cast("double")
            ).alias("share"),
        )
        .orderBy("reorder_band")
    )


ORACLE["reorder_intervals"] = """
WITH gaps AS (
  SELECT date_diff('day',
           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders
), banded AS (
  SELECT CASE WHEN gap_days <= 7 THEN 'a_within_week'
              WHEN gap_days <= 30 THEN 'b_within_month'
              WHEN gap_days <= 90 THEN 'c_within_quarter'
              WHEN gap_days <= 365 THEN 'd_within_year'
              ELSE 'e_over_year' END AS reorder_band
  FROM gaps WHERE gap_days IS NOT NULL
), counts AS (
  SELECT reorder_band, COUNT(*) AS n_gaps FROM banded GROUP BY reorder_band
)
SELECT reorder_band, n_gaps,
       CAST(n_gaps AS DOUBLE) / CAST(SUM(n_gaps) OVER () AS DOUBLE) AS share
FROM counts
ORDER BY reorder_band
"""


# ---------------------------------------------------------------------------
# Audience segmentation by behavior bitmask — give each event type a
# bit, OR them per user, and count users per exact behavior
# combination: the inclusion-exclusion audience panel ("viewed AND
# clicked but never purchased") that ad/retention tooling slices on.
# A bitmask aggregate is the scalable form — one int per user instead
# of N boolean columns or 2^N set intersections.
#
# Exactness: pure integer bit algebra end to end.
# Scale: map-side bit_or partials per user, one slim shuffle on
# user_id, then a 2^|types|-row rollup.
# ---------------------------------------------------------------------------
SEGMENT_BITS = [
    ("view", 1),
    ("click", 2),
    ("purchase", 4),
    ("signup", 8),
    ("error", 16),
]


def q_audience_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    bit = F.lit(0)
    for name, b in SEGMENT_BITS:
        bit = F.when(F.col("event_type") == name, F.lit(b)).otherwise(bit)
    masks = ev.select("user_id", bit.alias("bit")).groupBy("user_id").agg(
        F.bit_or("bit").alias("mask")
    )
    seg = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n_users"))
    flags = [
        ((F.col("mask").bitwiseAND(F.lit(b)) > 0).alias(f"has_{name}"))
        for name, b in SEGMENT_BITS
    ]
    return seg.select("mask", *flags, "n_users").orderBy("mask")


ORACLE["audience_segments"] = f"""
WITH bits AS (
  SELECT user_id,
         CASE event_type
              {' '.join(f"WHEN '{n}' THEN {b}" for n, b in SEGMENT_BITS)}
              ELSE 0 END AS bit
  FROM events
), masks AS (
  SELECT user_id, CAST(bit_or(bit) AS INTEGER) AS mask
  FROM bits GROUP BY user_id
)
SELECT mask,
       {', '.join(f"(mask & {b}) > 0 AS has_{n}" for n, b in SEGMENT_BITS)},
       COUNT(*) AS n_users
FROM masks
GROUP BY mask
ORDER BY mask
"""


# ---------------------------------------------------------------------------
# Revenue proration (largest-remainder allocation) — split each
# order's total price EXACTLY across the calendar months its line
# items shipped in: integer cents divide evenly, the remainder cents
# go one each to the earliest months, so per-order allocations sum to
# the order total TO THE CENT (the invariant naive ratio-multiply
# float proration silently breaks — the classic finance close bug).
#
# Exactness: everything is int64 cents with div/mod and a rank
# comparison; the only double is the final display division by 100.
#
# Scale: the orders->months equi-join shuffles on orderkey; the rank
# window partitions by order over <= a-few-months rows; the month
# rollup is tiny.
# ---------------------------------------------------------------------------
def q_revenue_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("bigint")
        .alias("m_idx"),
    )
    months = li.distinct()
    per_order = months.join(o, months["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderkey", "m_idx", "cents"
    )
    wq = W.partitionBy("o_orderkey")
    ranked = per_order.select(
        "o_orderkey",
        "m_idx",
        "cents",
        F.count(F.lit(1)).over(wq).alias("n_months"),
        F.row_number().over(wq.orderBy("m_idx")).alias("rk"),
    )
    alloc = ranked.select(
        "m_idx",
        (
            F.expr("cents div n_months")
            + F.when(F.col("rk") <= F.col("cents") % F.col("n_months"), 1).otherwise(
                0
            )
        ).alias("alloc_cents"),
    )
    return (
        alloc.groupBy("m_idx")
        .agg(
            F.count(F.lit(1)).alias("n_allocations"),
            F.sum("alloc_cents").alias("alloc_cents"),
        )
        .select(
            "m_idx",
            "n_allocations",
            "alloc_cents",
            (F.col("alloc_cents").cast("double") / F.lit(100.0)).alias(
                "alloc_revenue"
            ),
        )
        .orderBy("m_idx")
    )


ORACLE["revenue_proration"] = """
WITH o AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
), months AS (
  SELECT DISTINCT l_orderkey,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS m_idx
  FROM lineitem
), ranked AS (
  SELECT o.o_orderkey, m.m_idx, o.cents,
         COUNT(*) OVER (PARTITION BY o.o_orderkey) AS n_months,
         row_number() OVER (PARTITION BY o.o_orderkey ORDER BY m.m_idx) AS rk
  FROM months m JOIN o ON m.l_orderkey = o.o_orderkey
), alloc AS (
  SELECT m_idx,
         cents // n_months
           + CASE WHEN rk <= cents % n_months THEN 1 ELSE 0 END AS alloc_cents
  FROM ranked
)
SELECT m_idx, COUNT(*) AS n_allocations,
       CAST(SUM(alloc_cents) AS BIGINT) AS alloc_cents,
       CAST(CAST(SUM(alloc_cents) AS BIGINT) AS DOUBLE) / 100.0 AS alloc_revenue
FROM alloc
GROUP BY m_idx
ORDER BY m_idx
"""


# ---------------------------------------------------------------------------
# Growth accounting — the canonical weekly user-ledger: every active
# user is NEW (first week), RETAINED (also active the previous week),
# or RESURRECTED (returning after a gap); users active last week but
# not this week CHURN into this week's ledger. The identity
# active(w) = new + retained + resurrected, and
# churned(w) = active(w-1) - retained(w), holds exactly by
# construction — both are property-tested.
#
# Exactness: weeks are date_trunc values, classification is pure
# lag/lead date arithmetic over distinct (user, week) pairs.
#
# Scale: the pair dedup is the only pass over the fact table; the
# lag/lead window partitions by user over slim pairs; the ledger is
# |weeks| rows. Churn is right-censored: the corpus's final week
# cannot convict anyone of churning after it.
# ---------------------------------------------------------------------------
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("w")
    )
    pairs = ev.distinct()
    wu = W.partitionBy("user_id").orderBy("w")
    marked = pairs.select(
        "user_id",
        "w",
        F.lag("w").over(wu).alias("prev_w"),
        F.lead("w").over(wu).alias("next_w"),
    )
    status = marked.select(
        "w",
        F.when(F.col("prev_w").isNull(), "new")
        .when(F.col("prev_w") == F.date_add("w", -7), "retained")
        .otherwise("resurrected")
        .alias("status"),
        "next_w",
    )
    ledger = status.groupBy("w").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("new_users"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias(
            "retained_users"
        ),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).alias(
            "resurrected_users"
        ),
    )
    last_week = pairs.agg(F.max("w").alias("w_max"))
    churn = (
        marked.crossJoin(F.broadcast(last_week))
        .where(
            (F.date_add("w", 7) <= F.col("w_max"))
            & (F.col("next_w").isNull() | (F.col("next_w") > F.date_add("w", 7)))
        )
        .groupBy(F.date_add("w", 7).alias("w"))
        .agg(F.count(F.lit(1)).alias("churned_users"))
    )
    return (
        ledger.join(churn, "w", "full_outer")
        .select(
            "w",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
            F.coalesce("retained_users", F.lit(0)).alias("retained_users"),
            F.coalesce("resurrected_users", F.lit(0)).alias("resurrected_users"),
            F.coalesce("churned_users", F.lit(0)).alias("churned_users"),
        )
        .orderBy("w")
    )


ORACLE["growth_accounting"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
), marked AS (
  SELECT user_id, w,
         lag(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
         lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
  FROM pairs
), ledger AS (
  SELECT w,
         CAST(SUM(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(SUM(CASE WHEN prev_w = w - 7 THEN 1 ELSE 0 END) AS BIGINT)
           AS retained_users,
         CAST(SUM(CASE WHEN prev_w IS NOT NULL AND prev_w <> w - 7
                       THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users
  FROM marked GROUP BY w
), churn AS (
  SELECT w + 7 AS w, COUNT(*) AS churned_users
  FROM marked, (SELECT MAX(w) AS w_max FROM pairs) mx
  WHERE w + 7 <= mx.w_max AND (next_w IS NULL OR next_w > w + 7)
  GROUP BY w + 7
)
SELECT COALESCE(l.w, c.w) AS w,
       COALESCE(l.new_users, 0) AS new_users,
       COALESCE(l.retained_users, 0) AS retained_users,
       COALESCE(l.resurrected_users, 0) AS resurrected_users,
       COALESCE(c.churned_users, 0) AS churned_users
FROM ledger l FULL OUTER JOIN churn c ON l.w = c.w
ORDER BY w
"""


# ---------------------------------------------------------------------------
# Revenue bridge (price/volume decomposition) — for each part sold in
# both of the two most recent ship years, split the year-over-year
# revenue change into a VOLUME effect ((q1-q0) * p0) and a PRICE
# effect ((p1-p0) * q1): the finance-standard "bridge" that explains
# WHERE a revenue move came from (the two terms sum to the delta by
# construction). Top movers by absolute delta.
#
# Exactness: per-(part, year) quantity and revenue are exact decimal
# sums; average prices and both effects are fixed double expressions
# of the exact totals.
#
# Scale: the fact table collapses map-side to one slim row per
# (part, year); the year-pair join is a self-equi-join on partkey;
# the corpus-end year comes from a 1-row broadcast aggregate.
# ---------------------------------------------------------------------------
BRIDGE_TOPK = 50


def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("y"),
        F.col("l_quantity").cast("decimal(25,10)").alias("q"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .cast("decimal(25,10)")
        .alias("r"),
    )
    per_py = li.groupBy("l_partkey", "y").agg(
        F.sum("q").cast("decimal(38,10)").cast("string").cast("double").alias("qty"),
        F.sum("r").cast("decimal(38,10)").cast("string").cast("double").alias("rev"),
    )
    y_new = li.agg(F.max("y").alias("y1"))
    paired = (
        per_py.alias("new")
        .crossJoin(F.broadcast(y_new))
        .where(F.col("new.y") == F.col("y1"))
        .join(
            per_py.alias("old"),
            (F.col("new.l_partkey") == F.col("old.l_partkey"))
            & (F.col("old.y") == F.col("y1") - 1),
        )
        .select(
            F.col("new.l_partkey").alias("l_partkey"),
            F.col("old.qty").alias("q0"),
            F.col("old.rev").alias("rev0"),
            F.col("new.qty").alias("q1"),
            F.col("new.rev").alias("rev1"),
        )
    )
    p0 = F.col("rev0") / F.col("q0")
    p1 = F.col("rev1") / F.col("q1")
    return (
        paired.where((F.col("q0") > 0) & (F.col("q1") > 0))
        .select(
            "l_partkey",
            "rev0",
            "rev1",
            (F.col("rev1") - F.col("rev0")).alias("delta_rev"),
            ((F.col("q1") - F.col("q0")) * p0).alias("volume_effect"),
            ((p1 - p0) * F.col("q1")).alias("price_effect"),
        )
        .orderBy(F.abs(F.col("delta_rev")).desc(), "l_partkey")
        .limit(BRIDGE_TOPK)
    )


ORACLE["revenue_bridge"] = f"""
WITH per_py AS (
  SELECT l_partkey, year(l_shipdate) AS y,
         CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,10)))
                        AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE) AS qty,
         CAST(CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                                 AS DECIMAL(25,10)))
                        AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE) AS rev
  FROM lineitem GROUP BY 1, 2
), y_new AS (
  SELECT MAX(year(l_shipdate)) AS y1 FROM lineitem
), paired AS (
  SELECT n.l_partkey, o.qty AS q0, o.rev AS rev0, n.qty AS q1, n.rev AS rev1
  FROM per_py n, y_new
  JOIN per_py o ON n.l_partkey = o.l_partkey AND o.y = y_new.y1 - 1
  WHERE n.y = y_new.y1
)
SELECT l_partkey, rev0, rev1,
       rev1 - rev0 AS delta_rev,
       (q1 - q0) * (rev0 / q0) AS volume_effect,
       ((rev1 / q1) - (rev0 / q0)) * q1 AS price_effect
FROM paired
WHERE q0 > 0 AND q1 > 0
ORDER BY abs(rev1 - rev0) DESC, l_partkey
LIMIT {BRIDGE_TOPK}
"""


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — the customers not dominated on the
# (account balance, exact lifetime revenue) plane: c is dominated iff
# someone is >= on both axes and > on one. The classic skyline
# operator, computed scalably as a sort-merge: per-balance group max,
# a running strictly-above maximum over the DISTINCT balance ladder
# (slim rows), and two comparisons per candidate — never the O(n^2)
# pairwise dominance join.
#
# Determinism: dominance compares exact-decimal-derived doubles;
# equal (balance, revenue) duplicates are mutually non-dominating and
# both survive, by definition.
# ---------------------------------------------------------------------------
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(25,10)").alias("p")
    )
    rev = o.groupBy("o_custkey").agg(
        F.sum("p").cast("decimal(38,10)").cast("string").cast("double").alias("rev")
    )
    per_cust = cust.join(
        rev, cust["c_custkey"] == rev["o_custkey"], "left"
    ).select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("rev", F.lit(0.0)).alias("revenue"),
    )
    grp = per_cust.groupBy("c_acctbal").agg(F.max("revenue").alias("grp_max"))
    wdesc = W.orderBy(F.desc("c_acctbal")).rowsBetween(
        W.unboundedPreceding, -1
    )
    ladder = grp.select(
        "c_acctbal",
        "grp_max",
        F.max("grp_max").over(wdesc).alias("max_above"),
    )
    return (
        per_cust.join(F.broadcast(ladder), "c_acctbal")
        .where(
            (F.col("revenue") == F.col("grp_max"))
            & (F.col("max_above").isNull() | (F.col("revenue") > F.col("max_above")))
        )
        .select("c_custkey", "c_acctbal", "revenue")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
    )


ORACLE["pareto_frontier"] = """
WITH rev AS (
  SELECT o_custkey,
         CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10)))
                        AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE) AS rev
  FROM orders GROUP BY o_custkey
), per_cust AS (
  SELECT c.c_custkey, c.c_acctbal, COALESCE(r.rev, 0.0) AS revenue
  FROM customer c LEFT JOIN rev r ON c.c_custkey = r.o_custkey
), ladder AS (
  SELECT c_acctbal, MAX(revenue) AS grp_max,
         MAX(MAX(revenue)) OVER (ORDER BY c_acctbal DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS max_above
  FROM per_cust GROUP BY c_acctbal
)
SELECT p.c_custkey, p.c_acctbal, p.revenue
FROM per_cust p JOIN ladder l ON p.c_acctbal = l.c_acctbal
WHERE p.revenue = l.grp_max
  AND (l.max_above IS NULL OR p.revenue > l.max_above)
ORDER BY p.c_acctbal DESC, p.c_custkey
"""


# ---------------------------------------------------------------------------
# FIFO return matching — per part, match returned quantity ('R' lines)
# against shipments in first-in-first-out order via the running-total
# interval technique: a shipment whose cumulative-start lies below the
# part's total returned quantity is (at least partially) consumed, one
# whose cumulative-END lies below it is fully consumed, and the FIFO
# frontier is the latest ship date any return reaches. The classic
# inventory-allocation shape (FIFO cost layers, lot consumption)
# WITHOUT the quadratic sale x return pairing — each shipment
# compares against one per-part scalar.
#
# Exactness: quantities and running sums are exact decimals; dates
# and counts are picked, not summed.
#
# Scale: two map-side per-part aggregates plus one running-sum window
# partitioned by part over slim tuples; output is one row per part
# with returns.
# ---------------------------------------------------------------------------
FIFO_TOPK = 25


def q_fifo_return_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_returnflag",
        F.col("l_quantity").cast("decimal(25,10)").alias("q"),
    )
    returns = li.where(F.col("l_returnflag") == "R").groupBy("l_partkey").agg(
        F.sum("q").cast("decimal(38,10)").alias("ret_qty")
    )
    sales = li.where(F.col("l_returnflag") != "R")
    wfifo = (
        W.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = sales.select(
        "l_partkey",
        "l_shipdate",
        "q",
        (F.sum("q").over(wfifo) - F.col("q")).alias("cum_start"),
        F.sum("q").over(wfifo).alias("cum_end"),
    )
    matched = cum.join(returns, "l_partkey")
    agg = matched.groupBy("l_partkey").agg(
        F.sum("q").cast("decimal(38,10)").cast("string").cast("double").alias(
            "sales_qty"
        ),
        F.max(F.col("ret_qty").cast("string").cast("double")).alias("returns_qty"),
        F.sum(F.when(F.col("cum_start") < F.col("ret_qty"), 1).otherwise(0)).alias(
            "n_touched"
        ),
        F.sum(F.when(F.col("cum_end") <= F.col("ret_qty"), 1).otherwise(0)).alias(
            "n_fully_consumed"
        ),
        F.max(
            F.when(F.col("cum_start") < F.col("ret_qty"), F.col("l_shipdate"))
        ).alias("fifo_frontier_date"),
    )
    return agg.orderBy(F.desc("returns_qty"), "l_partkey").limit(FIFO_TOPK)


ORACLE["fifo_return_matching"] = f"""
WITH returns AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,10))) AS DECIMAL(38,10))
           AS ret_qty
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
), cum AS (
  SELECT l_partkey, l_shipdate,
         CAST(l_quantity AS DECIMAL(25,10)) AS q,
         SUM(CAST(l_quantity AS DECIMAL(25,10)))
           OVER (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - CAST(l_quantity AS DECIMAL(25,10)) AS cum_start,
         SUM(CAST(l_quantity AS DECIMAL(25,10)))
           OVER (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
  FROM lineitem WHERE l_returnflag <> 'R'
)
SELECT c.l_partkey,
       CAST(CAST(CAST(SUM(c.q) AS DECIMAL(38,10)) AS VARCHAR) AS DOUBLE)
         AS sales_qty,
       MAX(CAST(CAST(r.ret_qty AS VARCHAR) AS DOUBLE)) AS returns_qty,
       CAST(SUM(CASE WHEN c.cum_start < r.ret_qty THEN 1 ELSE 0 END)
            AS BIGINT) AS n_touched,
       CAST(SUM(CASE WHEN c.cum_end <= r.ret_qty THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fully_consumed,
       MAX(CASE WHEN c.cum_start < r.ret_qty THEN c.l_shipdate END)
         AS fifo_frontier_date
FROM cum c JOIN returns r USING (l_partkey)
GROUP BY c.l_partkey
ORDER BY returns_qty DESC, c.l_partkey
LIMIT {FIFO_TOPK}
"""


# ---------------------------------------------------------------------------
# Association rules (market-basket analysis) — the directional
# upgrade of q_copurchase_pairs: for every frequent part pair, both
# rules A=>B and B=>A with support / confidence / lift, the Agrawal
# et al. shapes every recommender and cross-sell report starts from.
#
# Scale: pair counts come from the SAME capped posting-list expansion
# as copurchase_pairs (map-side pair generation, one shuffle on the
# pair key); per-part order counts are one combinable groupBy; the
# rule joins against the slim (part, count) frame are keyed
# equi-joins (AQE picks broadcast when the frame fits). All ratios
# are single deterministic double divisions of exact int64 counts —
# no float aggregation anywhere.
# ---------------------------------------------------------------------------
RULES_TOPK = 40


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = op.select("l_orderkey").distinct().count()
    if n_orders == 0:
        return local_df(spark, 
            [],
            "antecedent bigint, consequent bigint, n_together bigint, "
            "support double, confidence double, lift double",
        )
    baskets = (
        op.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts) - i - 1), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_together"))
        .filter(F.col("n_together") >= MIN_COOC)
    )
    counts = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    directed = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "n_together",
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "n_together",
        )
    )
    ca = counts.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_part").alias("n_a")
    )
    cb = counts.select(
        F.col("l_partkey").alias("consequent"), F.col("n_part").alias("n_b")
    )
    nn = F.lit(float(n_orders))
    # count frames are |distinct parts|-sized — bounded here, not at
    # SF100k; keyed equi-joins let AQE choose broadcast vs shuffle
    return (
        directed.join(ca, "antecedent")
        .join(cb, "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("n_together").cast("bigint").alias("n_together"),
            (F.col("n_together").cast("double") / nn).alias("support"),
            (
                F.col("n_together").cast("double")
                / F.col("n_a").cast("double")
            ).alias("confidence"),
            (
                F.col("n_together").cast("double")
                / F.col("n_a").cast("double")
                / (F.col("n_b").cast("double") / nn)
            ).alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(),
            F.col("confidence").desc(),
            "antecedent",
            "consequent",
        )
        .limit(RULES_TOPK)
    )


ORACLE["association_rules"] = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nn AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM op),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_together
  FROM op a
  JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_COOC}
),
counts AS (SELECT l_partkey, COUNT(*) AS n_part FROM op GROUP BY 1),
directed AS (
  SELECT part_a AS antecedent, part_b AS consequent, n_together FROM pairs
  UNION ALL
  SELECT part_b, part_a, n_together FROM pairs
)
SELECT antecedent, consequent, CAST(n_together AS BIGINT) AS n_together,
       CAST(n_together AS DOUBLE) / nn.n AS support,
       CAST(n_together AS DOUBLE) / CAST(ca.n_part AS DOUBLE) AS confidence,
       CAST(n_together AS DOUBLE) / CAST(ca.n_part AS DOUBLE)
         / (CAST(cb.n_part AS DOUBLE) / nn.n) AS lift
FROM directed
JOIN counts ca ON ca.l_partkey = antecedent
JOIN counts cb ON cb.l_partkey = consequent, nn
ORDER BY lift DESC, confidence DESC, antecedent, consequent
LIMIT {RULES_TOPK}
"""


# ---------------------------------------------------------------------------
# Daily open-order backlog — the event-delta technique
# (concurrent_peak's shape on the order lifecycle): an order OPENS at
# o_orderdate and CLOSES the day after its last line ships; the
# backlog curve is the running sum of +1/-1 deltas over the date
# ladder, and the dollar backlog the running sum of +/- o_totalprice.
# Per month: end-of-month depth and peak depth.
#
# Exactness: count deltas are int64 (running sums exact at any
# order); value deltas accumulate in DECIMAL(25,10) through the
# ordered window — exact, so the final double cast is deterministic.
# Scale: orders collapse to 2 delta rows each (no per-day explode);
# the window runs over |distinct dates| rows. The running-total
# window over one unpartitioned ladder is the same pinned
# single-partition payload-free exchange as concurrent_peak.
# ---------------------------------------------------------------------------
def q_open_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    closed = li.groupBy("l_orderkey").agg(
        F.date_add(F.to_date(F.max("l_shipdate")), 1).alias("close_date")
    )
    spans = orders.join(
        closed, orders.o_orderkey == closed.l_orderkey, "inner"
    ).select(F.to_date("o_orderdate").alias("open_date"), "close_date", "o_totalprice")
    deltas = spans.select(
        F.col("open_date").alias("d"),
        F.lit(1).alias("dc"),
        F.col("o_totalprice").alias("dv"),
    ).unionAll(
        spans.select(
            F.col("close_date").alias("d"),
            F.lit(-1).alias("dc"),
            (-F.col("o_totalprice")).alias("dv"),
        )
    )
    daily = deltas.groupBy("d").agg(
        F.sum("dc").alias("dc"),
        F.sum(F.col("dv").cast(DEC)).alias("dv"),
    )
    wrun = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    curve = daily.select(
        "d",
        F.sum("dc").over(wrun).alias("backlog"),
        F.sum("dv").over(wrun).cast("string").cast("double").alias("backlog_value"),
    )
    return (
        curve.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.max("backlog").cast("bigint").alias("peak_backlog"),
            F.max_by("backlog", "d").cast("bigint").alias("eom_backlog"),
            F.max_by("backlog_value", "d").alias("eom_backlog_value"),
        )
        .orderBy("month")
    )


ORACLE["open_order_backlog"] = """
WITH closed AS (
  SELECT l_orderkey,
         CAST(MAX(l_shipdate) AS DATE) + INTERVAL 1 DAY AS close_date
  FROM lineitem GROUP BY l_orderkey
), spans AS (
  SELECT CAST(o_orderdate AS DATE) AS open_date,
         CAST(close_date AS DATE) AS close_date, o_totalprice
  FROM orders JOIN closed ON l_orderkey = o_orderkey
), deltas AS (
  SELECT open_date AS d, 1 AS dc, o_totalprice AS dv FROM spans
  UNION ALL
  SELECT close_date, -1, -o_totalprice FROM spans
), daily AS (
  SELECT d, SUM(dc) AS dc,
         SUM(CAST(dv AS DECIMAL(25,10))) AS dv
  FROM deltas GROUP BY d
), curve AS (
  SELECT d,
         SUM(dc) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS backlog,
         CAST(CAST(SUM(dv) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)
           AS DOUBLE) AS backlog_value
  FROM daily
)
SELECT strftime(d, '%Y-%m') AS month,
       CAST(MAX(backlog) AS BIGINT) AS peak_backlog,
       CAST(max_by(backlog, d) AS BIGINT) AS eom_backlog,
       max_by(backlog_value, d) AS eom_backlog_value
FROM curve
GROUP BY 1
ORDER BY month
"""


# ---------------------------------------------------------------------------
# XYZ demand-variability classes — the forecastability half of
# pareto_abc's ABC revenue ranking (together they form the classic
# ABC/XYZ inventory matrix): per part, the coefficient of variation
# of monthly demand INCLUDING zero months, then X (steady, cv < 0.5),
# Y (variable, cv < 1.0), Z (erratic).
#
# Zero months are handled WITHOUT a part x month gap-fill join: the
# global month count M is a 1-row broadcast, and mean/variance over
# all M months derive from the observed months' exact sums alone
# (sum over zeros is zero) — mean = S/M, var = Q/M - mean^2. S and Q
# are exact decimal sums of integer-valued quantities, cv a
# deterministic sqrt/divide; the classification is therefore exact.
# Scale: one groupBy (part, month), one groupBy part, no ladder join.
# ---------------------------------------------------------------------------
def q_xyz_demand_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    monthly = (
        li.select(
            "l_partkey",
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            "l_quantity",
        )
        .groupBy("l_partkey", "month")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC))
            .cast("string")
            .cast("double")
            .alias("q")
        )
    )
    months = li.select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).distinct().agg(F.count(F.lit(1)).alias("m"))
    per_part = monthly.groupBy("l_partkey").agg(
        F.sum(F.col("q").cast(DEC)).cast("string").cast("double").alias("s"),
        F.sum((F.col("q") * F.col("q")).cast(DEC))
        .cast("string")
        .cast("double")
        .alias("qq"),
    )
    m = F.col("m").cast("double")
    mean = F.col("s") / m
    var = F.col("qq") / m - mean * mean
    cv = F.sqrt(var) / mean
    classed = per_part.crossJoin(F.broadcast(months)).select(
        "l_partkey",
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias(
            "xyz_class"
        ),
        cv.alias("cv"),
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.min("cv").alias("min_cv"),
            F.max("cv").alias("max_cv"),
            F.min("l_partkey").alias("min_partkey"),
            F.max("l_partkey").alias("max_partkey"),
        )
        .orderBy("xyz_class")
    )


ORACLE["xyz_demand_classes"] = """
WITH monthly AS (
  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,10))) AS VARCHAR)
              AS DOUBLE) AS q
  FROM lineitem GROUP BY 1, 2
), months AS (
  SELECT CAST(COUNT(DISTINCT strftime(l_shipdate, '%Y-%m')) AS DOUBLE) AS m
  FROM lineitem
), per_part AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(q AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(q * q AS DECIMAL(25,10))) AS VARCHAR)
              AS DOUBLE) AS qq
  FROM monthly GROUP BY 1
), classed AS (
  SELECT l_partkey,
         CASE WHEN sqrt(qq / m - (s / m) * (s / m)) / (s / m) < 0.5 THEN 'X'
              WHEN sqrt(qq / m - (s / m) * (s / m)) / (s / m) < 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         sqrt(qq / m - (s / m) * (s / m)) / (s / m) AS cv
  FROM per_part, months
)
SELECT xyz_class, COUNT(*) AS n_parts, MIN(cv) AS min_cv, MAX(cv) AS max_cv,
       MIN(l_partkey) AS min_partkey, MAX(l_partkey) AS max_partkey
FROM classed
GROUP BY 1
ORDER BY xyz_class
"""


# ---------------------------------------------------------------------------
# Laspeyres price index — monthly price level vs the base month using
# base-month quantities as fixed weights: I_t = sum_p p_{p,t} q_{p,0}
# / sum_p p_{p,0} q_{p,0} over parts traded in BOTH months. The
# standard inflation / price-drift monitor for a product catalog.
#
# Exactness: per-(part, month) unit price is a ratio of exact decimal
# sums; the cross-part weighted sums are FIXED-POINT — prices
# quantized to micro-units (floor(p * 1e6), deterministic on a
# deterministic double) and multiplied by integral base quantities,
# so both index sums are exact DECIMAL(38,0) integer accumulations
# (associative, layout-invariant) and the final division is one IEEE
# op. The float-sum-order trap is structurally absent.
# Scale: two combinable groupBys (part x month, then month) plus a
# broadcast of the 1-row base-month aggregate and the base-month
# weight frame (|parts in one month|).
# ---------------------------------------------------------------------------
def q_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pm = (
        li.select(
            "l_partkey",
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            "l_extendedprice",
            "l_quantity",
        )
        .groupBy("l_partkey", "month")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("ext"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("qty"),
        )
        .select(
            "l_partkey",
            "month",
            F.floor(
                (
                    F.col("ext").cast("string").cast("double")
                    / F.col("qty").cast("string").cast("double")
                )
                * 1e6
            )
            .cast("decimal(38,0)")
            .alias("p_micro"),
            F.col("qty").cast("decimal(38,0)").alias("qty_int"),
        )
    )
    base_month = pm.agg(F.min("month").alias("bm"))
    base = (
        pm.join(F.broadcast(base_month), pm.month == F.col("bm"))
        .select(
            "l_partkey",
            F.col("p_micro").alias("p0_micro"),
            F.col("qty_int").alias("q0"),
        )
    )
    # NOT force-broadcast: the base-month weight frame is |parts in
    # one month| — bounded at fixture scale but not at SF100k; the
    # keyed equi-join lets AQE pick broadcast vs shuffle by size
    weighted = pm.join(base, "l_partkey").groupBy("month").agg(
        F.sum(F.col("p_micro") * F.col("q0")).alias("num"),
        F.sum(F.col("p0_micro") * F.col("q0")).alias("den"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return weighted.select(
        "month",
        F.col("n_parts").cast("bigint").alias("n_parts"),
        (
            F.col("num").cast("string").cast("double")
            / F.col("den").cast("string").cast("double")
        ).alias("laspeyres_index"),
    ).orderBy("month")


ORACLE["price_index_laspeyres"] = """
WITH pm AS (
  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS month,
         CAST(FLOOR(
           (CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,10)))
                 AS VARCHAR) AS DOUBLE)
            / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,10)))
                 AS VARCHAR) AS DOUBLE)) * 1e6
         ) AS DECIMAL(38,0)) AS p_micro,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,10))) AS DECIMAL(38,0))
           AS qty_int
  FROM lineitem GROUP BY 1, 2
), bm AS (
  SELECT MIN(month) AS bm FROM pm
), base AS (
  SELECT l_partkey, p_micro AS p0_micro, qty_int AS q0
  FROM pm, bm WHERE month = bm
)
SELECT pm.month, COUNT(*) AS n_parts,
       CAST(CAST(SUM(pm.p_micro * base.q0) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(base.p0_micro * base.q0) AS VARCHAR) AS DOUBLE)
         AS laspeyres_index
FROM pm JOIN base ON base.l_partkey = pm.l_partkey
GROUP BY pm.month
ORDER BY pm.month
"""


# ---------------------------------------------------------------------------
# Bucketed co-located join — the storage-level shuffle elimination
# every recurring big-big join earns at 100 TB: write both sides
# bucketed (and sorted) by the join key with Spark's bucketBy, and
# the sort-merge join planner consumes the bucket layout directly —
# NO Exchange on either side of the join (pinned in
# tests/test_plans.py::test_bucketed_join_has_no_shuffle). On a
# 1000-executor cluster this turns the nightly orders x lineitem
# reconciliation from two full-table shuffles into a metadata-only
# co-located read; the one-time bucketed write amortizes across every
# downstream join on the same key.
#
# The query freezes its aggregate into a literal frame (the snapshot
# lifecycle pattern) so the driver compares values, while the bucketed
# tables themselves are per-(sf_dir) temp-named, overwritten
# idempotently, and dropped after the read.
# ---------------------------------------------------------------------------
BUCKETS = 8


def bucketed_pair(
    spark: SparkSession, sf_dir: str, suffix: str
) -> tuple[str, str]:
    """Write orders/lineitem bucketed+sorted by the join key into the
    session warehouse (idempotent overwrite); returns table names."""
    ot, lt = f"evlake_bkt_orders_{suffix}", f"evlake_bkt_lineitem_{suffix}"
    # a FRESH session's in-memory catalog has forgotten these tables
    # while their warehouse directories persist on disk; saveAsTable
    # then refuses (LOCATION_ALREADY_EXISTS) — drop both layers first
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable(ot)
    )
    (
        li.write.mode("overwrite")
        .bucketBy(BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .saveAsTable(lt)
    )
    return ot, lt


def bucketed_join_frame(spark: SparkSession, ot: str, lt: str) -> DataFrame:
    """The co-located join plan over two bucketed tables (no Exchange
    on either join side — asserted in tests/test_plans.py)."""
    o = spark.table(ot)
    li = spark.table(lt)
    return (
        # MERGE hint: at fixture scale Catalyst would broadcast the
        # small side, hiding the property under test — at 100 TB
        # neither side broadcasts, and the SMJ-over-buckets plan (no
        # Exchange, no Sort on either input) is the whole point
        o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias(
                "revenue"
            ),
        )
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    ot, lt = bucketed_pair(spark, sf_dir, suffix)
    try:
        rows = bucketed_join_frame(spark, ot, lt).collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
    return local_df(spark, 
        [
            (r.o_orderstatus, r.n_lines, float(r.revenue))
            for r in rows
        ],
        "o_orderstatus string, n_lines bigint, revenue double",
    ).orderBy("o_orderstatus")


ORACLE["bucketed_join"] = f"""
SELECT o_orderstatus, COUNT(*) AS n_lines,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""
