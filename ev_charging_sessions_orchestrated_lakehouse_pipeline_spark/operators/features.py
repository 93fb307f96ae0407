"""Training-feature engineering operators — the tabular-ML prep tier
(leave-one-out target encoding, rank/quantile normalization, RFM
behavioral segmentation) that sits between the lake and a model
trainer, extending the LLM-corpus tier (operators/text.py,
operators/sampling.py) to the structured-data side of a training
pipeline. The reference (a 437-line medallion ETL over one CSV,
jobs/ev_sessions_gold_etl.py) has no equivalent; this module is part
of the extension tier the build brief names first-class.

Engine-parity rules (repo-wide oracle discipline, see
operators/stats.py): exact int64/decimal arithmetic everywhere a
value crosses rows; doubles appear only in final fixed-structure
expressions evaluated identically on both engines; rank-based
transforms PICK or COUNT rather than summing floats.

Scale design (100 TB):

- **Target encoding** is two map-side-combinable aggregates (per-key
  exact decimal sum + count) broadcast back onto the stream — the
  encoding join never shuffles the fact table.
- **Quantile normalization** shuffles slim (key, value) pairs for the
  per-key rank pass (the mad_outliers ordstat shape); the decile
  histogram output is |keys| x 10 rows. At petabyte scale the rank
  pass swaps for the approx_percentile sketch unchanged.
- **RFM segmentation** collapses orders to one slim row per customer
  map-side, then runs three ntile windows over (measure, custkey)
  pairs — deterministic quartiles with explicit tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.oracle import DEC

ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Leave-one-out target encoding — encode a categorical (market
# segment) by the mean of a numeric target (account balance) over the
# OTHER members of the category: enc_i = (S_k - x_i) / (n_k - 1).
# The leakage-safe form of mean encoding (plain per-key means leak
# each row's own target into its feature — the classic CV-score
# inflation bug). Output: the 100 most atypical customers (largest
# gap to their cohort's LOO mean), the "this row will dominate its
# encoding" review list.
#
# Exactness: S_k is an exact decimal sum; each enc is ONE IEEE
# division of exact operands; the gap |x - enc| subtracts two
# deterministic doubles. No float ever crosses rows.
# ---------------------------------------------------------------------------
LOO_TOPK = 100


def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_acctbal").cast("decimal(18,2)").alias("x")
    )
    seg = c.groupBy("c_mktsegment").agg(
        F.sum("x").cast("decimal(29,2)").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    enc = (
        (F.col("s") - F.col("x")).cast("decimal(30,2)").cast("string").cast("double")
        / (F.col("n") - F.lit(1)).cast("double")
    )
    x_d = F.col("x").cast("string").cast("double")
    return (
        c.join(F.broadcast(seg), "c_mktsegment")
        .select(
            "c_custkey",
            "c_mktsegment",
            x_d.alias("acctbal"),
            enc.alias("loo_mean"),
            F.abs(x_d - enc).alias("gap"),
        )
        .orderBy(F.desc("gap"), "c_custkey")
        .limit(LOO_TOPK)
    )


ORACLE["target_encoding"] = f"""
WITH c AS (
  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS x
  FROM customer
), seg AS (
  SELECT c_mktsegment, CAST(SUM(x) AS DECIMAL(29,2)) AS s, COUNT(*) AS n
  FROM c GROUP BY c_mktsegment
)
SELECT c_custkey, c_mktsegment,
       CAST(CAST(x AS VARCHAR) AS DOUBLE) AS acctbal,
       CAST(CAST(CAST(s - x AS DECIMAL(30,2)) AS VARCHAR) AS DOUBLE)
         / CAST(n - 1 AS DOUBLE) AS loo_mean,
       ABS(CAST(CAST(x AS VARCHAR) AS DOUBLE)
           - CAST(CAST(CAST(s - x AS DECIMAL(30,2)) AS VARCHAR) AS DOUBLE)
             / CAST(n - 1 AS DOUBLE)) AS gap
FROM c JOIN seg USING (c_mktsegment)
ORDER BY gap DESC, c_custkey
LIMIT {LOO_TOPK}
"""


# ---------------------------------------------------------------------------
# Rank/quantile normalization — map each event value to its within-
# group percent rank and report the resulting decile occupancy: the
# feature-preprocessing transform that makes heavy-tailed measures
# comparable across groups (and the standard pre-step for quantile
# matching between datasets). A uniform occupancy histogram certifies
# the transform; spikes reveal tie mass.
#
# Exactness: the decile is floor((rank-1) * 10 / (n-1)) computed
# ENTIRELY in int64 (rank() gives ties identical ranks on both
# engines under the same ORDER BY) — no float appears anywhere.
# ---------------------------------------------------------------------------
def q_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    wp = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.rank().over(wp.orderBy("value")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    decile = F.least(
        F.floor((F.col("rk") - 1) * 10 / (F.col("n") - 1)).cast("int"),
        F.lit(9),
    )
    return (
        ranked.groupBy("event_type", decile.alias("decile"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("event_type", "decile")
    )


ORACLE["quantile_normalization"] = """
WITH ranked AS (
  SELECT event_type,
         rank() OVER (PARTITION BY event_type ORDER BY value) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(least(CAST(floor((rk - 1) * 10 / (n - 1)) AS BIGINT), 9) AS INT)
         AS decile,
       COUNT(*) AS n_rows
FROM ranked
GROUP BY 1, 2
ORDER BY event_type, decile
"""


# ---------------------------------------------------------------------------
# RFM behavioral segmentation — quartile-code customers on Recency
# (days since last order), Frequency (order count), Monetary (exact
# lifetime revenue), the classic 64-cell behavioral grid that drives
# sampling and retention targeting. Output: one row per occupied
# (r, f, m) cell with its population and exact total monetary mass.
#
# Determinism: ntile(4) is value-identical on both engines given a
# total order; every window orders by (measure, c_custkey) so tie
# placement is pinned. Recency measures against the corpus max order
# date (1-row broadcast). Monetary sums are exact decimals end-to-end.
#
# Scale: orders collapse map-side to one slim row per customer; the
# three ntile windows shuffle (measure, custkey) pairs; the cell
# rollup is 64 rows.
# ---------------------------------------------------------------------------
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_totalprice").cast(DEC).alias("p")
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("p").cast("decimal(29,2)").alias("monetary"),
    )
    end = o.agg(F.max("o_orderdate").alias("d_end"))
    rfm = per_cust.crossJoin(F.broadcast(end)).select(
        "o_custkey",
        F.datediff("d_end", "last_order").alias("recency"),
        "freq",
        "monetary",
    )
    coded = rfm.select(
        "o_custkey",
        "monetary",
        F.ntile(4).over(W.orderBy(F.desc("recency"), "o_custkey")).alias("r_code"),
        F.ntile(4).over(W.orderBy("freq", "o_custkey")).alias("f_code"),
        F.ntile(4).over(W.orderBy("monetary", "o_custkey")).alias("m_code"),
    )
    return (
        coded.groupBy("r_code", "f_code", "m_code")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary")
            .cast("decimal(38,2)")
            .cast("string")
            .cast("double")
            .alias("total_monetary"),
        )
        .orderBy("r_code", "f_code", "m_code")
    )


ORACLE["rfm_segments"] = """
WITH o AS (
  SELECT o_custkey, o_orderdate, CAST(o_totalprice AS DECIMAL(25,10)) AS p
  FROM orders
), per_cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order, COUNT(*) AS freq,
         CAST(SUM(p) AS DECIMAL(29,2)) AS monetary
  FROM o GROUP BY o_custkey
), endd AS (
  SELECT MAX(o_orderdate) AS d_end FROM o
), rfm AS (
  SELECT o_custkey,
         date_diff('day', last_order, (SELECT d_end FROM endd)) AS recency,
         freq, monetary
  FROM per_cust
), coded AS (
  SELECT o_custkey, monetary,
         ntile(4) OVER (ORDER BY recency DESC, o_custkey) AS r_code,
         ntile(4) OVER (ORDER BY freq, o_custkey) AS f_code,
         ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_code
  FROM rfm
)
SELECT CAST(r_code AS INT) AS r_code, CAST(f_code AS INT) AS f_code,
       CAST(m_code AS INT) AS m_code,
       COUNT(*) AS n_customers,
       CAST(CAST(CAST(SUM(monetary) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
         AS total_monetary
FROM coded
GROUP BY r_code, f_code, m_code
ORDER BY r_code, f_code, m_code
"""


# ---------------------------------------------------------------------------
# Spend-band migration matrix — quartile-code each customer's exact
# quarterly revenue within its quarter, then count transitions
# between a customer's consecutive OBSERVED quarters: the Markov
# band-migration matrix behind churn/upgrade models (and the
# categorical-feature drift check for any banded feature).
#
# Determinism: quarter index is int arithmetic; revenue is an exact
# decimal sum; ntile(4) orders by (revenue, custkey) so tie placement
# is pinned; transitions are lag() over the int quarter index.
#
# Scale: orders collapse map-side to one slim row per (customer,
# quarter); the ntile windows shuffle those pairs by quarter; the
# lag window re-shuffles by customer; the matrix is 16 rows.
# ---------------------------------------------------------------------------
def q_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1)
        .cast("bigint")
        .alias("q_idx"),
        F.col("o_totalprice").cast(DEC).alias("p"),
    )
    per_cq = o.groupBy("o_custkey", "q_idx").agg(
        F.sum("p").cast("decimal(29,2)").alias("rev")
    )
    banded = per_cq.select(
        "o_custkey",
        "q_idx",
        F.ntile(4)
        .over(W.partitionBy("q_idx").orderBy("rev", "o_custkey"))
        .alias("band"),
    )
    trans = banded.select(
        "band",
        F.lag("band")
        .over(W.partitionBy("o_custkey").orderBy("q_idx"))
        .alias("from_band"),
    ).where(F.col("from_band").isNotNull())
    return (
        trans.groupBy("from_band", F.col("band").alias("to_band"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_band", "to_band")
    )


ORACLE["band_migration"] = """
WITH per_cq AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT) AS q_idx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(29,2)) AS rev
  FROM orders
  GROUP BY 1, 2
), banded AS (
  SELECT o_custkey, q_idx,
         ntile(4) OVER (PARTITION BY q_idx ORDER BY rev, o_custkey) AS band
  FROM per_cq
), trans AS (
  SELECT band AS to_band,
         lag(band) OVER (PARTITION BY o_custkey ORDER BY q_idx) AS from_band
  FROM banded
)
SELECT CAST(from_band AS INT) AS from_band, CAST(to_band AS INT) AS to_band,
       COUNT(*) AS n_transitions
FROM trans
WHERE from_band IS NOT NULL
GROUP BY from_band, to_band
ORDER BY from_band, to_band
"""
