"""Statistical profiling and data-observability operators: Benford
first-digit conformance, robust (median/MAD) outlier detection,
interval-overlap peak concurrency, order-independent partition
checksums, collocation lift, chi-square association, and EWMA
smoothing.

These extend the reference's DQ surface (its pydeequ-style
completeness/containment checks, ``jobs/ev_sessions_silver_etl_clean.py:
175-210``) with the distribution-level monitors a production lake runs
on top of row-level gates — the reference itself has no equivalent;
this module is part of the observability/extension tier alongside
operators/quality.py and operators/corpus_filter.py.

Engine-parity rules (the repo-wide oracle discipline):

- Counting happens in int64 and stays exact; every statistic performs
  its float work in the SAME textual expression order on both engines.
- Sums of per-row/per-cell double terms route through DECIMAL(25,10)
  (functions/oracle.py) so they are order-independent — a grouped or
  windowed double SUM is never hash-compared directly.
- No log()/exp() in compared output (Math.log vs libm may differ in
  the last ulp): Benford's expected shares are embedded as shared
  literal constants, and collocation strength uses the rational LIFT
  form rather than log-PMI (a monotone transform, so rankings match).

Scale design (100 TB):

- **Benford / chi-square association** aggregate to tiny keyed frames
  (9 digits, |priorities| x |statuses| cells) with map-side combine;
  the windowed total runs over those few rows, never the fact table.
- **MAD outliers** needs exact per-group order statistics: two
  rank-and-pick passes (sort shuffle each) over (group, value) pairs
  — the payload never travels — then one broadcast join of the
  per-group medians back onto the stream. At petabyte scale swap the
  exact ordstat for the approx_percentile_bounds sketch without
  changing the join shape.
- **Peak concurrency** is the classic sweep line: each session emits
  two (t, +/-1) deltas, ONE shuffle partitions by group, and a
  running sum over the sorted deltas finds the max — O(1) state per
  partition, no interval self-join (which would be quadratic on hot
  groups).
- **Partition checksums** fold a 60-bit row digest into an exact
  decimal sum per partition — commutative, so replication audits can
  compare checksums computed on different clusters with different
  partition orders, and mergeable, so per-file sums roll up to
  per-partition sums without rescanning.
- **Collocation lift** derives its marginals from the aggregated
  bigram frame itself (never a second corpus scan) and broadcasts
  them back; top-k is TakeOrderedAndProject.
- **EWMA** joins each user's LAST event against its bounded trailing
  window (EWMA_K rows) by row-number range — per-user work is O(K),
  one shuffle by user.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql
from ..functions.localframe import local_df
from ..functions.oracle import DEC

ORACLE: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Benford first-digit conformance — the classic "is this numeric feed
# organic" fraud/quality screen: compare the observed first
# significant digit distribution of a positive measure against
# Benford's law and report the chi-square-style divergence.
#
# The first digit is extracted through integer arithmetic and string
# slicing of an int64 (floor -> BIGINT -> VARCHAR -> first char) —
# never via log10 or double formatting, both of which differ across
# engines. Expected shares are literal constants shared by both query
# texts, so the only float work is share = n/total (one division of
# exact int64s) and the squared-deviation terms, decimal-summed.
# ---------------------------------------------------------------------------
_BENFORD_EXP = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    )
    per = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = W.partitionBy()
    total = F.sum("n").over(wall)
    share = F.col("n").cast("double") / total.cast("double")
    expected = F.expr(
        "CASE digit "
        + " ".join(f"WHEN '{d}' THEN {x}D" for d, x in _BENFORD_EXP.items())
        + " END"
    )
    term = (share - expected) * (share - expected) / expected
    return (
        per.select(
            "digit",
            "n",
            share.alias("share"),
            expected.alias("expected"),
            term.cast(DEC).alias("_term"),
        )
        .select(
            "digit",
            "n",
            "share",
            "expected",
            F.sum("_term").over(wall).cast("string").cast("double").alias(
                "chi2_total"
            ),
        )
        .orderBy("digit")
    )


ORACLE["benford_profile"] = (
    """
WITH per AS (
  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit,
         COUNT(*) AS n
  FROM orders GROUP BY 1
), terms AS (
  SELECT digit, n,
         CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share,
         CASE digit """
    + " ".join(f"WHEN '{d}' THEN {x}" for d, x in _BENFORD_EXP.items())
    + """ END AS expected
  FROM per
)
SELECT digit, n, share, expected,
       CAST(CAST(SUM(CAST((share - expected) * (share - expected) / expected
                          AS DECIMAL(25,10))) OVER () AS VARCHAR) AS DOUBLE)
         AS chi2_total
FROM terms
ORDER BY digit
"""
)


# ---------------------------------------------------------------------------
# Median / MAD robust outliers — the heavy-tail-safe companion to
# q_value_outliers (mean/stddev) and q_rolling_zscore: a single wild
# value inflates a standard deviation enough to mask later outliers,
# while the median absolute deviation barely moves. Flags values with
# |v - median| > MAD_K * MAD per event_type.
#
# Exactness: medians are EXACT order statistics computed with the
# rank-and-pick construction of q_percentiles_ordstat — identical
# expression text on both engines, so the interpolated median and the
# derived MAD are bit-identical, and the outlier comparison (pure
# IEEE multiply/compare) cannot disagree.
# ---------------------------------------------------------------------------
MAD_K = 3.0

_MED_R = "(1.0D + 0.5D * (CAST(n AS DOUBLE) - 1.0D))"
_MED_R_SQL = "(1.0 + 0.5 * (CAST(n AS DOUBLE) - 1.0))"


def _exact_median(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Per-``key`` exact interpolated median of ``val`` as ``out``."""
    wp = W.partitionBy(key)
    ranked = df.select(
        key,
        val,
        F.row_number().over(wp.orderBy(val)).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    keep = f"rn = floor({_MED_R}) OR rn = ceil({_MED_R})"
    grouped = (
        ranked.filter(F.expr(keep))
        .groupBy(key)
        .agg(
            F.max("n").alias("n"),
            F.expr(f"max(CASE WHEN rn = floor({_MED_R}) THEN {val} END)").alias(
                "lo"
            ),
            F.expr(f"max(CASE WHEN rn = ceil({_MED_R}) THEN {val} END)").alias(
                "hi"
            ),
        )
    )
    return grouped.select(
        key,
        "n",
        F.expr(f"lo + (hi - lo) * ({_MED_R} - floor({_MED_R}))").alias(out),
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = _exact_median(ev, "event_type", "value", "med")
    devs = ev.join(F.broadcast(med.select("event_type", "med")), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = _exact_median(devs, "event_type", "dev", "mad").select(
        "event_type", "mad"
    )
    flagged = (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("dev") > F.lit(MAD_K) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers")
        )
    )
    return (
        med.join(mad, "event_type")
        .join(flagged, "event_type")
        .select("event_type", "n", "med", "mad", "n_outliers")
        .orderBy("event_type")
    )


def _median_sql(src: str, key: str, val: str, out: str) -> str:
    r = _MED_R_SQL
    return f"""
  SELECT {key}, n, lo + (hi - lo) * ({r} - floor({r})) AS {out}
  FROM (
    SELECT {key}, CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = floor({r}) THEN {val} END) AS lo,
           MAX(CASE WHEN rn = ceil({r}) THEN {val} END) AS hi
    FROM (
      SELECT {key}, {val},
             row_number() OVER (PARTITION BY {key} ORDER BY {val}) AS rn,
             COUNT(*) OVER (PARTITION BY {key}) AS n
      FROM {src}
    )
    WHERE rn = floor({r}) OR rn = ceil({r})
    GROUP BY {key}
  )
"""


ORACLE["mad_outliers"] = f"""
WITH med AS ({_median_sql("events", "event_type", "value", "med")}),
devs AS (
  SELECT e.event_type, ABS(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type)
),
mad AS ({_median_sql("devs", "event_type", "dev", "mad")}),
flagged AS (
  SELECT d.event_type,
         CAST(SUM(CASE WHEN d.dev > {MAD_K} * a.mad THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outliers
  FROM devs d JOIN mad a USING (event_type)
  GROUP BY d.event_type
)
SELECT m.event_type, m.n, m.med, a.mad, f.n_outliers
FROM med m JOIN mad a USING (event_type) JOIN flagged f USING (event_type)
ORDER BY m.event_type
"""


# ---------------------------------------------------------------------------
# Peak concurrency (interval-overlap maximum) — "how many sessions of
# each type were active AT ONCE, and when was the peak first hit":
# the capacity-planning number a charging-network operator actually
# provisions against (the reference's peak-hours query
# counts session STARTS per hour, which undercounts sessions that
# span hours).
#
# Sessions are [start, start + floor(value * 60) + 1) second
# intervals. Sweep line: +1 at start, -1 at end, running sum over the
# total order (t, delta, event_id) — delta sorts -1 before +1 so a
# session ending exactly when another starts never overlaps it. All
# arithmetic is int64; timestamps go through floor(epoch) so
# sub-second fractions truncate identically on both engines.
# ---------------------------------------------------------------------------
def q_concurrent_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("start_t"),
        (F.floor(F.col("value") * F.lit(60.0))).cast("long").alias("dur"),
    )
    deltas = ev.select(
        "event_type",
        "event_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("start_t").alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(
                    (F.col("start_t") + F.col("dur") + F.lit(1)).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("event_type", "event_id", "e.t", "e.delta")
    # Pre-aggregate deltas per (event_type, t) BEFORE the running
    # window (VERDICT r7 #6): the window input collapses from 2N rows
    # to |distinct timestamps|, and the map-side-combinable groupBy
    # absorbs the explode. Peak-exact: the row-granular running sum
    # (ordered -1s first, then +1s) only ever reaches its per-
    # timestamp FINAL value as a running maximum — intermediate
    # partial sums at a timestamp are bounded by that timestamp's
    # final value — so max(conc) and its earliest t are unchanged.
    # one shuffle, not two: hash-partitioning by event_type alone
    # satisfies BOTH the groupBy's clustered distribution on
    # (event_type, t) — equal keys still co-locate — and the window's
    # on event_type, so Catalyst inserts no further Exchange. Reduce-
    # side agg work per event_type is bounded by |distinct t|, the
    # same bound as the window input it feeds.
    net = (
        deltas.repartition("event_type")
        .groupBy("event_type", "t")
        .agg(F.sum("delta").alias("delta"))
    )
    wrun = (
        W.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    conc = net.select(
        "event_type", "t", F.sum("delta").over(wrun).alias("conc")
    )
    peak = conc.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        conc.join(F.broadcast(peak), "event_type")
        .where(F.col("conc") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("peak_at_epoch"))
        .orderBy("event_type")
    )


ORACLE["concurrent_peak"] = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_t,
         CAST(floor(value * 60.0) AS BIGINT) AS dur
  FROM events
), deltas AS (
  SELECT event_type, event_id, start_t AS t, 1 AS delta FROM ev
  UNION ALL
  SELECT event_type, event_id, start_t + dur + 1 AS t, -1 AS delta FROM ev
), conc AS (
  SELECT event_type, t,
         SUM(delta) OVER (PARTITION BY event_type
                          ORDER BY t, delta, event_id
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
), peak AS (
  SELECT event_type, MAX(conc) AS peak FROM conc GROUP BY event_type
)
SELECT c.event_type, CAST(p.peak AS BIGINT) AS peak,
       CAST(MIN(c.t) AS BIGINT) AS peak_at_epoch
FROM conc c JOIN peak p ON c.event_type = p.event_type AND c.conc = p.peak
GROUP BY c.event_type, p.peak
ORDER BY c.event_type
"""


# ---------------------------------------------------------------------------
# Order-independent partition checksums — the replication/migration
# audit primitive: a 60-bit digest of every row's canonical string,
# folded with exact decimal addition per partition. Because the fold
# is commutative and associative, two clusters can checksum the same
# logical partition in ANY physical order (different file splits,
# different shuffle layouts) and must produce identical values —
# unlike a concatenation or first-N digest. Mergeable: per-file sums
# roll up to partition/table sums without rescanning.
#
# Doubles never enter the canonical string (double→string formatting
# is engine-specific): o_totalprice rides as DECIMAL(12,2) text, the
# date as an explicit yyyy-MM-dd format.
# ---------------------------------------------------------------------------
def q_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rowstr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    return (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            hash60(rowstr).alias("h"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("string")
            .alias("checksum"),
        )
        .orderBy("month")
    )


ORACLE["partition_checksums"] = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST({hash60_sql(
           "concat_ws('|', CAST(o_orderkey AS VARCHAR), "
           "CAST(o_custkey AS VARCHAR), o_orderstatus, "
           "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), "
           "strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)"
       )} AS DECIMAL(38,0))) AS VARCHAR) AS checksum
FROM orders
GROUP BY 1
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Collocation lift — PMI-style collocation mining over adjacent
# bigrams, using the RATIONAL lift form
#   lift(x,y) = N * c(x,y) / (c(x,·) * c(·,y))
# instead of log-PMI (log is a monotone transform, and Math.log vs
# libm log can differ in the last ulp across engines). lift > 1 means
# the pair co-occurs more than independence predicts — the phrase
# detector feeding tokenizer merges and boilerplate lexicons.
#
# All products stay exact: c_xy * N and c_x * c_y are int64 products
# well under 2^53, so the single double division is bit-deterministic.
# Marginals come from the AGGREGATED bigram frame (never a second
# corpus pass) and broadcast back onto it.
# ---------------------------------------------------------------------------
MIN_COLLOC = 5
COLLOC_TOPK = 50


def q_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .select(
            "bigram",
            "c_xy",
            F.split(F.col("bigram"), " ").getItem(0).alias("x"),
            F.split(F.col("bigram"), " ").getItem(1).alias("y"),
        )
    )
    firsts = bg.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    seconds = bg.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n_total = F.sum("c_xy").over(W.partitionBy())
    scored = (
        bg.join(F.broadcast(firsts), "x")
        .join(F.broadcast(seconds), "y")
        .select("bigram", "c_xy", "c_x", "c_y", n_total.alias("n_total"))
        .where(F.col("c_xy") >= MIN_COLLOC)
        .select(
            "bigram",
            "c_xy",
            "c_x",
            "c_y",
            (
                F.col("c_xy").cast("double")
                * F.col("n_total").cast("double")
                / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "bigram").limit(COLLOC_TOPK)


ORACLE["collocation_lift"] = f"""
WITH bg AS (
  SELECT t[i] || ' ' || t[i + 1] AS bigram, COUNT(*) AS c_xy
  FROM (
    SELECT string_split(text, ' ') AS t,
           unnest(range(1, len(string_split(text, ' ')))) AS i
    FROM documents
  )
  GROUP BY bigram
), parts AS (
  SELECT bigram, c_xy,
         string_split(bigram, ' ')[1] AS x,
         string_split(bigram, ' ')[2] AS y,
         SUM(c_xy) OVER () AS n_total
  FROM bg
), firsts AS (SELECT x, SUM(c_xy) AS c_x FROM parts GROUP BY x),
seconds AS (SELECT y, SUM(c_xy) AS c_y FROM parts GROUP BY y)
SELECT p.bigram, p.c_xy,
       CAST(f.c_x AS BIGINT) AS c_x, CAST(s.c_y AS BIGINT) AS c_y,
       CAST(p.c_xy AS DOUBLE) * CAST(p.n_total AS DOUBLE)
         / (CAST(f.c_x AS DOUBLE) * CAST(s.c_y AS DOUBLE)) AS lift
FROM parts p JOIN firsts f USING (x) JOIN seconds s USING (y)
WHERE p.c_xy >= {MIN_COLLOC}
ORDER BY lift DESC, bigram
LIMIT {COLLOC_TOPK}
"""


# ---------------------------------------------------------------------------
# Chi-square test of association between two categorical columns —
# "are order priority and order status independent?": the
# contingency-table screen run before trusting a segmentation, and
# the categorical twin of q_source_drift's binned drift test.
#
# Expected counts are integer products divided once in double; the
# chi-square total decimal-sums the per-cell terms so the scalar is
# order-independent. Degrees of freedom come from a 1-row aggregate
# cross-joined back (broadcast on the Spark side).
# ---------------------------------------------------------------------------
def q_chi_square_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_c")
    )
    wr = W.partitionBy("o_orderpriority")
    wc = W.partitionBy("o_orderstatus")
    wall = W.partitionBy()
    exp = (F.sum("n_c").over(wr) * F.sum("n_c").over(wc)).cast(
        "double"
    ) / F.sum("n_c").over(wall).cast("double")
    term = (F.col("n_c").cast("double") - F.col("exp")) * (
        F.col("n_c").cast("double") - F.col("exp")
    ) / F.col("exp")
    dims = orders.agg(
        F.count_distinct("o_orderpriority").alias("n_pri"),
        F.count_distinct("o_orderstatus").alias("n_st"),
    ).select(((F.col("n_pri") - 1) * (F.col("n_st") - 1)).alias("dof"))
    return (
        cells.select("o_orderpriority", "o_orderstatus", "n_c", exp.alias("exp"))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n_c",
            "exp",
            term.cast(DEC).alias("_term"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n_c",
            "exp",
            F.sum("_term").over(wall).cast("string").cast("double").alias("chi2"),
        )
        .crossJoin(F.broadcast(dims))
        .orderBy("o_orderpriority", "o_orderstatus")
    )


ORACLE["chi_square_assoc"] = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_c
  FROM orders GROUP BY 1, 2
), exps AS (
  SELECT o_orderpriority, o_orderstatus, n_c,
         CAST(SUM(n_c) OVER (PARTITION BY o_orderpriority)
              * SUM(n_c) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
           / CAST(SUM(n_c) OVER () AS DOUBLE) AS exp
  FROM cells
), dims AS (
  SELECT (COUNT(DISTINCT o_orderpriority) - 1)
           * (COUNT(DISTINCT o_orderstatus) - 1) AS dof
  FROM orders
)
SELECT o_orderpriority, o_orderstatus, n_c, exp,
       CAST(CAST(SUM(CAST((CAST(n_c AS DOUBLE) - exp)
                          * (CAST(n_c AS DOUBLE) - exp) / exp
                          AS DECIMAL(25,10))) OVER () AS VARCHAR) AS DOUBLE)
         AS chi2,
       CAST((SELECT dof FROM dims) AS BIGINT) AS dof
FROM exps
ORDER BY o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# EWMA (exponentially weighted moving average) — the smoothed "current
# level" per user over their trailing EWMA_K events, the state a
# monitoring/personalization pipeline keeps per entity. Decay
# alpha = 1/2 per step is deliberate: weights 2^-k are exact binary
# fractions, value * 2^-k is pure exponent arithmetic (EXACT in
# IEEE-754), and both weighted sum and weight norm go through the
# exact decimal route — so the single final division is the only
# rounding step and matches bit-for-bit cross-engine.
#
# Shape: rank events per user (one shuffle), keep each user's LAST
# row, and range-join it against its own trailing window by
# row-number distance — O(EWMA_K) rows per user, payloads never
# shuffle twice.
# ---------------------------------------------------------------------------
EWMA_K = 8


def q_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    wp = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "value", F.row_number().over(wp).alias("rn")
    )
    last = ranked.groupBy("user_id").agg(F.max("rn").alias("last_rn"))
    hist = ranked.alias("h")
    pairs = (
        last.alias("c")
        .join(hist, F.col("c.user_id") == F.col("h.user_id"))
        .where(
            (F.col("h.rn") <= F.col("c.last_rn"))
            & (F.col("h.rn") > F.col("c.last_rn") - EWMA_K)
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            (F.col("c.last_rn") - F.col("h.rn")).alias("k"),
            F.col("h.value").alias("value"),
        )
    )
    w = F.pow(F.lit(0.5), F.col("k").cast("double"))
    return (
        pairs.select(
            "user_id",
            (F.col("value") * w).cast(DEC).alias("_term"),
            w.cast(DEC).alias("_w"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_used"),
            (
                F.sum("_term").cast("string").cast("double")
                / F.sum("_w").cast("string").cast("double")
            ).alias("ewma"),
        )
        .orderBy("user_id")
    )


ORACLE["ewma_value"] = f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), last AS (
  SELECT user_id, MAX(rn) AS last_rn FROM ranked GROUP BY user_id
), pairs AS (
  SELECT c.user_id, c.last_rn - h.rn AS k, h.value
  FROM last c JOIN ranked h ON c.user_id = h.user_id
  WHERE h.rn <= c.last_rn AND h.rn > c.last_rn - {EWMA_K}
)
SELECT user_id, COUNT(*) AS n_used,
       CAST(CAST(SUM(CAST(value * power(0.5, CAST(k AS DOUBLE))
                          AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(SUM(CAST(power(0.5, CAST(k AS DOUBLE))
                              AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
         AS ewma
FROM pairs
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Fact-vs-rollup reconciliation — the cross-table consistency audit a
# lakehouse runs between a header table and its line-level detail:
# recompute each order's charge rollup SUM(extendedprice * (1 -
# discount) * (1 + tax)) from lineitem and compare it to the header's
# o_totalprice, reporting mismatch counts, orders with no lines, and
# the worst absolute delta per status. (The synthetic fixture header
# prices are NOT derived from the lines — the audit's job is exactly
# to measure and bound that disagreement, not to assume it away.)
#
# Exactness: the per-row charge is one deterministic IEEE expression;
# per-order rollups decimal-sum it (order-independent); delta and the
# MAX fold are then pure functions of exact inputs. Scale: one
# map-side-combinable groupBy on l_orderkey (the natural key the
# detail table is already clustered by), a key+two-doubles join
# against the header — line payloads never shuffle twice — then a
# tiny per-status rollup.
# ---------------------------------------------------------------------------
RECONCILE_TOL = 0.01


def q_reconcile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = _t(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    rolled = li.groupBy("l_orderkey").agg(
        F.sum(charge.cast(DEC)).cast("string").cast("double").alias("rollup")
    )
    joined = orders.join(
        rolled, orders["o_orderkey"] == rolled["l_orderkey"], "left"
    ).select(
        "o_orderstatus",
        "o_totalprice",
        "rollup",
        F.abs(F.col("o_totalprice") - F.col("rollup")).alias("abs_delta"),
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("rollup").isNull(), 1).otherwise(0)
            ).alias("n_no_lines"),
            F.sum(
                F.when(F.col("abs_delta") > RECONCILE_TOL, 1).otherwise(0)
            ).alias("n_mismatch"),
            F.max("abs_delta").alias("max_abs_delta"),
        )
        .orderBy("o_orderstatus")
    )


ORACLE["reconcile_rollup"] = f"""
WITH rolled AS (
  SELECT l_orderkey,
         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                            * (1.0 + l_tax)
                            AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
           AS rollup
  FROM lineitem GROUP BY l_orderkey
), joined AS (
  SELECT o.o_orderstatus, o.o_totalprice, r.rollup,
         ABS(o.o_totalprice - r.rollup) AS abs_delta
  FROM orders o LEFT JOIN rolled r ON o.o_orderkey = r.l_orderkey
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN rollup IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_lines,
       CAST(SUM(CASE WHEN abs_delta > {RECONCILE_TOL} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatch,
       MAX(abs_delta) AS max_abs_delta
FROM joined
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Inter-arrival burstiness — the time-series shape profile per user:
# gaps between consecutive events (int64 seconds via lag), their mean
# and standard deviation, and the Goh-Barabasi burstiness index
# B = (sigma - mu) / (sigma + mu) in [-1, 1): B near -1 is a
# metronome (periodic heartbeat), near 0 a Poisson process, toward 1
# a bursty human. The monitor that tells a rate-limiter or an
# anomaly detector what "normal" inter-event spacing looks like.
#
# Exactness: gaps are exact int64 second differences; their sums and
# squared sums fold in DECIMAL(38,0) (no 2^53 ceiling at scale) and
# reach double through the correctly-rounded string route, so
# mu/sigma/B are single deterministic IEEE expressions. One shuffle
# (window by user), then a per-user aggregate.
# ---------------------------------------------------------------------------
MIN_GAPS = 5


def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("t"), "event_id"
    )
    wp = W.partitionBy("user_id").orderBy("t", "event_id")
    gaps = ev.select(
        "user_id", (F.col("t") - F.lag("t").over(wp)).alias("d")
    ).where(F.col("d").isNotNull())
    s = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("d").cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("s1"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("s2"),
    )
    mu = F.col("s1") / F.col("n_gaps")
    sigma = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_gaps"))
        / (F.col("n_gaps") - 1)
    )
    return (
        s.where(F.col("n_gaps") >= MIN_GAPS)
        .select(
            "user_id",
            "n_gaps",
            mu.alias("mean_gap"),
            sigma.alias("std_gap"),
            ((sigma - mu) / (sigma + mu)).alias("burstiness"),
        )
        .orderBy("user_id")
    )


ORACLE["interarrival_burstiness"] = f"""
WITH gaps AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS d
  FROM events
), s AS (
  SELECT user_id, COUNT(*) AS n_gaps,
         CAST(CAST(SUM(CAST(d AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(d * d AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
           AS s2
  FROM gaps WHERE d IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_gaps,
       s1 / n_gaps AS mean_gap,
       sqrt((s2 - s1 * s1 / n_gaps) / (n_gaps - 1)) AS std_gap,
       (sqrt((s2 - s1 * s1 / n_gaps) / (n_gaps - 1)) - s1 / n_gaps)
         / (sqrt((s2 - s1 * s1 / n_gaps) / (n_gaps - 1)) + s1 / n_gaps)
         AS burstiness
FROM s
WHERE n_gaps >= {MIN_GAPS}
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Weighted median — "the price at which half the VOLUME trades": the
# 50th percentile of l_extendedprice weighted by l_quantity per
# return flag. An unweighted median treats a 1-unit line and a
# 50-unit line alike; procurement/pricing decisions weight by volume.
#
# Definition: the smallest value v whose cumulative weight reaches
# half the total (lower weighted median — no interpolation, so the
# answer is always an actual data value). Cumulative weights fold as
# exact DECIMAL(25,10) over the total order (value, rn), and the
# half-total comparison happens in decimal (2 * cumw >= total), so
# the pick is integer-exact on both engines. One sort shuffle of
# (flag, value, weight) pairs; at 100 TB the same statistic comes
# from a weighted histogram sketch with this exact query as oracle.
# ---------------------------------------------------------------------------
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast(DEC).alias("w"),
    )
    wp = W.partitionBy("l_returnflag")
    worder = wp.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = li.select(
        "l_returnflag",
        "v",
        F.sum("w").over(worder).alias("cumw"),
        F.sum("w").over(wp).alias("total"),
    )
    return (
        cum.where(F.col("cumw") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("wmedian"),
            F.max(F.col("total").cast("string").cast("double")).alias(
                "total_weight"
            ),
        )
        .orderBy("l_returnflag")
    )


ORACLE["weighted_median"] = """
WITH cum AS (
  SELECT l_returnflag, l_extendedprice AS v,
         SUM(CAST(l_quantity AS DECIMAL(25,10)))
           OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                 ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(CAST(l_quantity AS DECIMAL(25,10)))
           OVER (PARTITION BY l_returnflag) AS total
  FROM lineitem
)
SELECT l_returnflag, MIN(v) AS wmedian,
       MAX(CAST(CAST(total AS VARCHAR) AS DOUBLE)) AS total_weight
FROM cum
WHERE cumw * 2 >= total
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Weighted median, histogram-sketch path — the 100 TB successor the
# exact query's docstring names. The exact form's per-group running
# sum orders EVERY row of a group through one window task; this
# variant bounds that to one price bucket:
#   1. fixed-width buckets floor(v / 1000) -> per-(group, bucket)
#      DECIMAL weight sums (map-side combinable; |groups| x |buckets|
#      rows total, ~315 here),
#   2. a cumulative sum over the TINY histogram finds the bucket
#      where cumulative weight first crosses half the total (and the
#      exact cumulative weight entering it),
#   3. the exact running-sum window re-runs ONLY inside that bucket
#      (rows join the 1-row-per-group bucket pick by broadcast), with
#      the carried-in offset making it globally exact.
# floor(v/width) is monotonic in v, so bucket-then-value ordering IS
# value ordering and the result is bit-identical to the exact query —
# which is therefore its oracle. Window input shrinks from |group| to
# |group|/|buckets| rows; everything else is map-side.
# ---------------------------------------------------------------------------
WMEDIAN_BUCKET = 1000


def q_weighted_median_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast(DEC).alias("w"),
    )
    b = li.withColumn("bucket", F.floor(F.col("v") / F.lit(WMEDIAN_BUCKET)))
    hist = b.groupBy("l_returnflag", "bucket").agg(F.sum("w").alias("bw"))
    wf = W.partitionBy("l_returnflag")
    hcum = hist.select(
        "l_returnflag",
        "bucket",
        "bw",
        F.sum("bw")
        .over(wf.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
        .alias("cumb"),
        F.sum("bw").over(wf).alias("total"),
    )
    pick = (
        hcum.where(F.col("cumb") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min(F.struct("bucket", "cumb", "bw", "total")).alias("s"))
        .select(
            F.col("l_returnflag").alias("g"),
            F.col("s.bucket").alias("mbucket"),
            (F.col("s.cumb") - F.col("s.bw")).alias("cum_before"),
            F.col("s.total").alias("total"),
        )
    )
    inb = b.join(
        F.broadcast(pick),
        (b.l_returnflag == pick.g) & (b.bucket == pick.mbucket),
    )
    worder = wf.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = inb.select(
        "l_returnflag",
        "v",
        (F.col("cum_before") + F.sum("w").over(worder)).alias("cumw"),
        "total",
    )
    return (
        cum.where(F.col("cumw") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("wmedian"),
            F.max(F.col("total").cast("string").cast("double")).alias(
                "total_weight"
            ),
        )
        .orderBy("l_returnflag")
    )


# bit-identical by construction, so the EXACT query is the oracle
ORACLE["weighted_median_sketch"] = ORACLE["weighted_median"]


# ---------------------------------------------------------------------------
# Pearson correlation profile — exact cross-engine correlation between
# quantity and price per return flag. Spark's built-in corr() is a
# streaming-covariance fold whose result depends on accumulation
# order; this operator instead folds the five moment sums
# (n, Sx, Sy, Sxy, Sx2, Sy2) in DECIMAL(38,10) — wide enough that a
# 600k-row sum of squared prices (~6e15) cannot overflow — reads them
# back through the correctly-rounded string route, and computes
#   r = (n*Sxy - Sx*Sy) / (sqrt(n*Sx2 - Sx^2) * sqrt(n*Sy2 - Sy^2))
# as one deterministic IEEE expression. One map-side-combinable
# groupBy; shuffle volume is |groups| x 6 numbers at any data size.
# ---------------------------------------------------------------------------
_D38 = "decimal(38,10)"


def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def dsum38(c):
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum38(F.col("x")).alias("sx"),
        dsum38(F.col("y")).alias("sy"),
        dsum38(F.col("x") * F.col("y")).alias("sxy"),
        dsum38(F.col("x") * F.col("x")).alias("sx2"),
        dsum38(F.col("y") * F.col("y")).alias("sy2"),
    )
    n = F.col("n").cast("double")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("sy2") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n).alias("mean_x"),
        (F.col("sy") / n).alias("mean_y"),
        r.alias("pearson_r"),
    ).orderBy("l_returnflag")


def _dsum38_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
    )


ORACLE["corr_profile"] = f"""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         {_dsum38_sql("l_quantity")} AS sx,
         {_dsum38_sql("l_extendedprice")} AS sy,
         {_dsum38_sql("l_quantity * l_extendedprice")} AS sxy,
         {_dsum38_sql("l_quantity * l_quantity")} AS sx2,
         {_dsum38_sql("l_extendedprice * l_extendedprice")} AS sy2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       sx / CAST(n AS DOUBLE) AS mean_x,
       sy / CAST(n AS DOUBLE) AS mean_y,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (sqrt(CAST(n AS DOUBLE) * sx2 - sx * sx)
            * sqrt(CAST(n AS DOUBLE) * sy2 - sy * sy)) AS pearson_r
FROM s
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Trending items — recency-decayed demand ranking: each lineitem
# contributes 2^-(age/30d buckets) toward its part, so last month's
# shipment counts fully, a year-old one 1/4096th. The "what's hot
# NOW" counterpart of cms_heavy_hitters' all-time heavy hitters, and
# the batch shape of a decayed streaming counter.
#
# Determinism: ages are exact int64 day differences against the
# corpus max ship date (itself an exact aggregate); bucketed integer
# exponents make every weight an exact binary fraction 2^-k, summed
# in decimal. Weights below the decimal quantum (age > ~80 buckets)
# round to zero IDENTICALLY on both engines (HALF_UP at 1e-10).
# Scale: one scalar broadcast (max date), one map-side-combinable
# groupBy on partkey, TakeOrderedAndProject top-k.
# ---------------------------------------------------------------------------
TREND_HALFLIFE_DAYS = 30
TREND_TOPK = 25


def q_trending_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    maxd = li.agg(F.max("l_shipdate").alias("maxd"))
    bucket = F.floor(
        F.datediff(F.col("maxd"), F.col("l_shipdate"))
        / F.lit(TREND_HALFLIFE_DAYS)
    ).cast("double")
    w = F.pow(F.lit(0.5), bucket)
    return (
        li.crossJoin(F.broadcast(maxd))
        .select("l_partkey", w.cast(DEC).alias("_w"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_w").cast("string").cast("double").alias("trend"),
        )
        .orderBy(F.desc("trend"), "l_partkey")
        .limit(TREND_TOPK)
    )


ORACLE["trending_items"] = f"""
WITH maxd AS (SELECT MAX(l_shipdate) AS maxd FROM lineitem)
SELECT l_partkey, COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(power(0.5,
              CAST(floor(date_diff('day', l_shipdate, (SELECT maxd FROM maxd))
                         / {TREND_HALFLIFE_DAYS}) AS DOUBLE))
              AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS trend
FROM lineitem
GROUP BY l_partkey
ORDER BY trend DESC, l_partkey
LIMIT {TREND_TOPK}
"""


# ---------------------------------------------------------------------------
# Discount elasticity per brand — exact least-squares regression by
# group: the OLS slope and intercept of quantity-on-discount for each
# part brand, answering "which brands actually move more units when
# discounted". The grouped-regression shape generalizes
# q_corr_profile (same five exact moment sums; slope/intercept
# instead of r):
#   slope = (n*Sxy - Sx*Sy) / (n*Sx2 - Sx^2),
#   intercept = (Sy - slope*Sx) / n
# with sums folded in DECIMAL(38,10) through the string route, so
# both coefficients are single deterministic IEEE expressions.
#
# Scale: lineitem joins the part dim on the build side (broadcast at
# any realistic dim size), then one map-side-combinable groupBy on
# brand — shuffle volume |brands| x 6 numbers, never rows.
# ---------------------------------------------------------------------------
def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_discount").alias("x"),
        F.col("l_quantity").alias("y"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")

    def dsum38(c):
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    s = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum38(F.col("x")).alias("sx"),
            dsum38(F.col("y")).alias("sy"),
            dsum38(F.col("x") * F.col("y")).alias("sxy"),
            dsum38(F.col("x") * F.col("x")).alias("sx2"),
        )
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return (
        s.select("p_brand", "n", slope.alias("slope"), "sx", "sy")
        .select(
            "p_brand",
            "n",
            "slope",
            ((F.col("sy") - F.col("slope") * F.col("sx")) / n).alias(
                "intercept"
            ),
        )
        .orderBy("p_brand")
    )


ORACLE["discount_elasticity"] = f"""
WITH s AS (
  SELECT p.p_brand, COUNT(*) AS n,
         {_dsum38_sql("l.l_discount")} AS sx,
         {_dsum38_sql("l.l_quantity")} AS sy,
         {_dsum38_sql("l.l_discount * l.l_quantity")} AS sxy,
         {_dsum38_sql("l.l_discount * l.l_discount")} AS sx2
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
), fitted AS (
  SELECT p_brand, n, sx, sy,
         (CAST(n AS DOUBLE) * sxy - sx * sy)
           / (CAST(n AS DOUBLE) * sx2 - sx * sx) AS slope
  FROM s
)
SELECT p_brand, n, slope,
       (sy - slope * sx) / CAST(n AS DOUBLE) AS intercept
FROM fitted
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Seasonal activity profile — the day-of-week x hour-of-day matrix of
# event volume and mean value: the capacity/seasonality heatmap that
# generalizes the reference's hourly peak query (peak-hours counts by
# hour only; load patterns are weekly). Weekday uses the ISO
# convention computed explicitly on both engines (Spark weekday() is
# 0=Monday; DuckDB isodow - 1) so the matrix keys can't drift by
# engine-specific week-start defaults. Means route through the exact
# decimal path. One map-side-combinable groupBy on a <=168-cell key.
# ---------------------------------------------------------------------------
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.oracle import davg

    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr("weekday(ts)").cast("int").alias("dow_iso0"),
            F.hour("ts").cast("int").alias("hour"),
            "value",
        )
        .groupBy("dow_iso0", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value").alias("avg_value"),
        )
        .orderBy("dow_iso0", "hour")
    )


ORACLE["seasonal_profile"] = """
SELECT CAST(isodow(ts) - 1 AS INT) AS dow_iso0,
       CAST(hour(ts) AS INT) AS hour,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(value) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY dow_iso0, hour
"""


# ---------------------------------------------------------------------------
# Skewness / excess kurtosis — exact higher-moment distribution
# profile per return flag, the shape monitor behind "did this batch's
# price distribution grow a tail". Extends corr_profile's 2nd-moment
# machinery to the 3rd/4th: per-row powers of the 1e5-SCALED price
# (skewness and kurtosis are scale-invariant, and scaling keeps
# sum(v^4) far from DECIMAL(38,10)'s integer range at any SF), folded
# as four exact decimal sums, read back through the string route, and
# combined in ONE fixed-structure IEEE expression on both engines.
# Map-side combinable; shuffle is |groups| x 5 numbers at any size.
# Zero-variance groups are excluded on both engines (m2 > 0).
# ---------------------------------------------------------------------------
def q_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice") / F.lit(100000.0)).alias("v"),
    )

    def dsum38(c):
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    v = F.col("v")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum38(v).alias("s1"),
        dsum38(v * v).alias("s2"),
        dsum38((v * v) * v).alias("s3"),
        dsum38(((v * v) * v) * v).alias("s4"),
    )
    n = F.col("n").cast("double")
    q = s.select(
        "l_returnflag",
        "n",
        (F.col("s1") / n).alias("mean"),
        (F.col("s2") / n).alias("q2"),
        (F.col("s3") / n).alias("q3"),
        (F.col("s4") / n).alias("q4"),
    )
    mean, q2, q3, q4 = (F.col(c) for c in ("mean", "q2", "q3", "q4"))
    m = q.select(
        "l_returnflag",
        "n",
        (q2 - mean * mean).alias("m2"),
        (q3 - F.lit(3.0) * mean * q2 + F.lit(2.0) * ((mean * mean) * mean)).alias("m3"),
        (
            q4
            - F.lit(4.0) * mean * q3
            + F.lit(6.0) * ((mean * mean) * q2)
            - F.lit(3.0) * ((mean * mean) * (mean * mean))
        ).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    return (
        m.where(m2 > 0)
        .select(
            "l_returnflag",
            "n",
            (m3 / (F.sqrt(m2) * m2)).alias("skewness"),
            (m4 / (m2 * m2) - F.lit(3.0)).alias("excess_kurtosis"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["skewness_kurtosis"] = f"""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         {_dsum38_sql("v")} AS s1,
         {_dsum38_sql("v * v")} AS s2,
         {_dsum38_sql("(v * v) * v")} AS s3,
         {_dsum38_sql("((v * v) * v) * v")} AS s4
  FROM (SELECT l_returnflag, l_extendedprice / 100000.0 AS v FROM lineitem)
  GROUP BY l_returnflag
), q AS (
  SELECT l_returnflag, n,
         s1 / CAST(n AS DOUBLE) AS mean,
         s2 / CAST(n AS DOUBLE) AS q2,
         s3 / CAST(n AS DOUBLE) AS q3,
         s4 / CAST(n AS DOUBLE) AS q4
  FROM s
), m AS (
  SELECT l_returnflag, n,
         q2 - mean * mean AS m2,
         q3 - 3.0 * mean * q2 + 2.0 * ((mean * mean) * mean) AS m3,
         q4 - 4.0 * mean * q3 + 6.0 * ((mean * mean) * q2)
            - 3.0 * ((mean * mean) * (mean * mean)) AS m4
  FROM q
)
SELECT l_returnflag, n,
       m3 / (sqrt(m2) * m2) AS skewness,
       m4 / (m2 * m2) - 3.0 AS excess_kurtosis
FROM m
WHERE m2 > 0
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Revenue autocorrelation — lag-k Pearson correlation of the daily
# revenue series with itself at calendar offsets 1/7/30 days: the
# seasonality detector behind "is this metric weekly-periodic" that
# seasonal_profile eyeballs and this quantifies. The series is first
# collapsed to one exact-decimal revenue per date (map-side
# combinable), so the pair join runs on |dates| slim rows, not the
# fact table; lags arrive via a 3-row broadcast (the pinned BNLJ),
# and each pair joins by EXACT calendar-date equality — days missing
# from the calendar simply pair with nothing, identically on both
# engines. Pearson per lag from DECIMAL(38,10) moment sums, one
# fixed-structure IEEE expression (corr_profile's discipline).
# ---------------------------------------------------------------------------
AUTOCORR_LAGS = (1, 7, 30)


def q_autocorr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # daily revenue stays an EXACT DECIMAL(18,2) (prices carry two
    # decimals, so the narrowing cast is lossless on both engines):
    # the lagged products x*y are then exact decimal multiplies, not
    # double products whose 10th-decimal tail the two engines would
    # round differently when cast into the decimal accumulator.
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC))
        .cast("decimal(18,2)")
        .alias("r")
    )
    lags = local_df(spark, 
        [(k,) for k in AUTOCORR_LAGS], "lag int"
    )
    a = daily.select(F.col("o_orderdate").alias("d"), F.col("r").alias("x"))
    b = daily.select(F.col("o_orderdate").alias("d2"), F.col("r").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("d2 = date_add(d, lag)"))
        .select("lag", "x", "y")
    )

    def dsum38(c):
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dsum38(F.col("x")).alias("sx"),
        dsum38(F.col("y")).alias("sy"),
        dsum38((F.col("x") * F.col("y")).cast(_D38)).alias("sxy"),
        dsum38((F.col("x") * F.col("x")).cast(_D38)).alias("sx2"),
        dsum38((F.col("y") * F.col("y")).cast(_D38)).alias("sy2"),
    )
    n = F.col("n_pairs").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("sy2") - F.col("sy") * F.col("sy")
    )
    return (
        s.where(
            (n * F.col("sx2") - F.col("sx") * F.col("sx") > 0)
            & (n * F.col("sy2") - F.col("sy") * F.col("sy") > 0)
        )
        .select("lag", "n_pairs", (num / den).alias("autocorr"))
        .orderBy("lag")
    )


ORACLE["autocorr_revenue"] = f"""
WITH daily AS (
  SELECT o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY o_orderdate
), lags AS (
  SELECT * FROM (VALUES {", ".join(f"({k})" for k in AUTOCORR_LAGS)}) AS t(lag)
), pairs AS (
  SELECT l.lag, a.r AS x, b.r AS y
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON CAST(b.o_orderdate AS DATE) = CAST(a.o_orderdate AS DATE) + l.lag
), s AS (
  SELECT lag, COUNT(*) AS n_pairs,
         {_dsum38_sql("x")} AS sx,
         {_dsum38_sql("y")} AS sy,
         {_dsum38_sql("x * y")} AS sxy,
         {_dsum38_sql("x * x")} AS sx2,
         {_dsum38_sql("y * y")} AS sy2
  FROM pairs GROUP BY lag
)
SELECT lag, n_pairs,
       (CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
         / (sqrt(CAST(n_pairs AS DOUBLE) * sx2 - sx * sx)
            * sqrt(CAST(n_pairs AS DOUBLE) * sy2 - sy * sy)) AS autocorr
FROM s
WHERE CAST(n_pairs AS DOUBLE) * sx2 - sx * sx > 0
  AND CAST(n_pairs AS DOUBLE) * sy2 - sy * sy > 0
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# Gini concentration coefficient — per-priority revenue inequality via
# the exact rank formula G = 2*sum(i * x_(i)) / (n * sum(x)) - (n+1)/n
# over values sorted ascending. The wealth-inequality complement of
# q_gini_profile's categorical impurity: "is revenue concentrated in
# a few whale orders" as one number per segment, the monitor behind
# mixture-capping decisions (source_cap) and skew alerts.
#
# Ties: row_number breaks them arbitrarily, but sum(i*x) is invariant
# under permuting equal x across adjacent ranks, so the result is
# deterministic on both engines. Sums fold in DECIMAL(38,10) (exact;
# i*x of int64 rank times 2-decimal price is an exact decimal).
# Scale: only slim (group, value) pairs cross the per-group sort
# shuffle — the classic ordstat shape (cf. mad_outliers); at petabyte
# scale substitute a binned Lorenz curve (fixed price buckets ->
# cumulative shares, the weighted_median_sketch treatment) and keep
# this exact query as its oracle.
# ---------------------------------------------------------------------------
def q_gini_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    )
    wp = W.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "v",
        F.row_number().over(wp.orderBy("v")).alias("i"),
    )

    def dsum38(c):
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    s = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum38(F.col("v")).alias("sx"),
        dsum38(F.col("i") * F.col("v")).alias("six"),
    )
    n = F.col("n").cast("double")
    gini = (F.lit(2.0) * F.col("six")) / (n * F.col("sx")) - (
        n + F.lit(1.0)
    ) / n
    return (
        s.where(F.col("sx") > 0)
        .select("o_orderpriority", "n", gini.alias("gini"))
        .orderBy("o_orderpriority")
    )


ORACLE["gini_totalprice"] = f"""
WITH ranked AS (
  SELECT o_orderpriority, v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY v) AS i
  FROM (SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders)
), s AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         {_dsum38_sql("v")} AS sx,
         {_dsum38_sql("i * v")} AS six
  FROM ranked GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       (2.0 * six) / (CAST(n AS DOUBLE) * sx)
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
WHERE sx > 0
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U drift test — exact rank-sum comparison of the
# quantity distribution between returned ('R') and accepted ('A')
# lineitems: the nonparametric two-sample location test that catches
# distribution drift a mean/stddev monitor misses, complementing
# ks_drift's max-gap statistic with a tie-aware significance score.
#
# Computed WITHOUT ranking individual rows: quantity has a tiny value
# domain, so the per-(value, group) contingency aggregate (map-side
# combinable) carries everything — tie-block average ranks come from
# a window over the |domain| distinct values (slim, ~50 rows), R1 is
# a decimal fold of c1 * avg_rank (exact: integers and halves), and
# the normal approximation applies the standard tie-corrected
# variance. The one windowed pass never touches row-level data — the
# 100 TB shape for any bounded-domain rank statistic.
# ---------------------------------------------------------------------------
def q_mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .select("l_returnflag", F.col("l_quantity").alias("v"))
    )
    cells = li.groupBy("v").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias(
            "c1"
        ),
        F.count(F.lit(1)).alias("ct"),
    )
    wcum = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    blocks = cells.select(
        "v",
        "c1",
        "ct",
        (
            F.coalesce(F.sum("ct").over(wcum), F.lit(0)).cast("double")
            + (F.col("ct").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ).alias("avg_rank"),
    )

    def dsum38(c):
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    s = blocks.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).alias("n2"),
        dsum38(F.col("c1").cast("double") * F.col("avg_rank")).alias("r1"),
        dsum38(
            (F.col("ct") * F.col("ct")) * F.col("ct") - F.col("ct")
        ).alias("tie3"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    ntot = n1 + n2
    u1 = F.col("r1") - (n1 * (n1 + F.lit(1.0))) / F.lit(2.0)
    mean_u = (n1 * n2) / F.lit(2.0)
    var_u = ((n1 * n2) / F.lit(12.0)) * (
        (ntot + F.lit(1.0))
        - F.col("tie3") / (ntot * (ntot - F.lit(1.0)))
    )
    return (
        s.where(
            ((n1 * n2) / F.lit(12.0))
            * (
                (ntot + F.lit(1.0))
                - F.col("tie3") / (ntot * (ntot - F.lit(1.0)))
            )
            > 0
        )
        .select(
            "n1",
            "n2",
            u1.alias("u_stat"),
            ((u1 - mean_u) / F.sqrt(var_u)).alias("z_score"),
        )
    )


ORACLE["mann_whitney_drift"] = f"""
WITH cells AS (
  SELECT v,
         SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c1,
         COUNT(*) AS ct
  FROM (SELECT l_returnflag, l_quantity AS v FROM lineitem
        WHERE l_returnflag IN ('A', 'R'))
  GROUP BY v
), blocks AS (
  SELECT v, c1, ct,
         CAST(COALESCE(SUM(ct) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE)
           + (CAST(ct AS DOUBLE) + 1.0) / 2.0 AS avg_rank
  FROM cells
), s AS (
  SELECT SUM(c1) AS n1, SUM(ct - c1) AS n2,
         {_dsum38_sql("CAST(c1 AS DOUBLE) * avg_rank")} AS r1,
         {_dsum38_sql("(ct * ct) * ct - ct")} AS tie3
  FROM blocks
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       r1 - (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u_stat,
       (r1 - (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
        - (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0)
         / sqrt(((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 12.0)
                * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
                   - tie3 / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                             * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                                - 1.0)))) AS z_score
FROM s
WHERE ((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 12.0)
      * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1.0)
         - tie3 / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                   * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))) > 0
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint detection — locate the date where the daily
# revenue series most decisively shifts level: the classic cumulative
# sum S_k = sum_{d<=k}(r_d - mean) peaks at the changepoint. The
# sequel to ewma_value (smoothing) and ks_drift (two known samples):
# here the split point itself is unknown and recovered from the data.
#
# Exactness: the statistic is computed in SCALED integer form
# S*_k = sum_{d<=k}(n * r_d - T) = n * S_k (n = #days, T = total),
# which stays entirely in exact DECIMAL arithmetic — no double ever
# enters the running sum, so the argmax is deterministic without any
# fold-order ceremony. The two output doubles divide the exact
# decimals once, in identical textual order on both engines.
#
# Scale (100 TB): the fact table collapses to |dates| slim decimal
# rows map-side; the 1-row (n, T) aggregate broadcasts back (pinned
# BNLJ), and the running sum windows over the |dates|-row frame —
# SinglePartition but payload-free (date + decimal), the same
# documented bound as concurrent_peak's delta stream.
# ---------------------------------------------------------------------------
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC))
        .cast("decimal(18,2)")
        .alias("r")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("r").cast("decimal(29,2)").alias("t"),
    )
    dev = (
        (F.col("n") * F.col("r")).cast("decimal(29,2)") - F.col("t")
    ).cast("decimal(30,2)")
    wrun = W.orderBy("o_orderdate").rowsBetween(W.unboundedPreceding, 0)
    run = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "o_orderdate",
            "n",
            F.sum(dev).over(wrun).cast("decimal(38,2)").alias("s_star"),
        )
    )
    ranked = run.select(
        "o_orderdate",
        "n",
        "s_star",
        F.row_number()
        .over(W.orderBy(F.abs(F.col("s_star")).desc(), F.col("o_orderdate")))
        .alias("rk"),
    )
    return ranked.where(F.col("rk") == 1).select(
        F.col("o_orderdate").alias("changepoint_date"),
        F.col("n").cast("bigint").alias("n_days"),
        (
            F.abs(F.col("s_star")).cast("string").cast("double")
            / F.col("n").cast("string").cast("double")
        ).alias("cusum_peak"),
    )


ORACLE["cusum_changepoint"] = """
WITH daily AS (
  SELECT o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY o_orderdate
), tot AS (
  SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
         CAST(SUM(r) AS DECIMAL(29,2)) AS t
  FROM daily
), run AS (
  SELECT o_orderdate, n,
         CAST(SUM(CAST(CAST(n * r AS DECIMAL(29,2)) - t AS DECIMAL(30,2)))
                OVER (ORDER BY o_orderdate ROWS UNBOUNDED PRECEDING)
              AS DECIMAL(38,2)) AS s_star
  FROM daily CROSS JOIN tot
), ranked AS (
  SELECT o_orderdate, n, s_star,
         ROW_NUMBER() OVER (ORDER BY abs(s_star) DESC, o_orderdate) AS rk
  FROM run
)
SELECT o_orderdate AS changepoint_date,
       CAST(n AS BIGINT) AS n_days,
       CAST(CAST(abs(s_star) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS cusum_peak
FROM ranked
WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust trend — per-month median of all pairwise daily
# revenue slopes: the breakdown-resistant (29% outlier tolerance)
# alternative to linear_trend's OLS fit, the robust-statistics
# counterpart of mad_outliers for TRENDS rather than levels. A single
# whale order that drags the OLS slope barely moves the pairwise
# median.
#
# Exactness: each slope is ONE IEEE division of an exact decimal
# revenue delta (read through the string route) by an exact integer
# day delta; the per-month median then PICKS order statistics
# (_exact_median) rather than summing doubles, so no fold-order or
# decimal-cast ceremony is needed anywhere.
#
# Scale (100 TB): the fact table collapses map-side to |dates| slim
# decimal rows; the pair join is month-bucketed, so candidate volume
# is |months| x C(31,2) <= 465 pairs/month — bounded by the calendar,
# not the data. The median's rank shuffle carries (month, slope)
# pairs only.
# ---------------------------------------------------------------------------
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC))
        .cast("decimal(18,2)")
        .alias("r")
    ).select(
        F.trunc("o_orderdate", "month").alias("m"), F.col("o_orderdate").alias("d"), "r"
    )
    a = daily.select("m", F.col("d").alias("da"), F.col("r").alias("ra"))
    b = daily.select("m", F.col("d").alias("db"), F.col("r").alias("rb"))
    slopes = (
        a.join(b, "m")
        .where(F.col("da") < F.col("db"))
        .select(
            "m",
            (
                (F.col("rb") - F.col("ra")).cast("string").cast("double")
                / F.datediff("db", "da").cast("double")
            ).alias("slope"),
        )
    )
    med = _exact_median(slopes, "m", "slope", "theil_sen_slope")
    return med.select(
        F.col("m").alias("month"),
        F.col("n").alias("n_slopes"),
        "theil_sen_slope",
    ).orderBy("month")


ORACLE["theil_sen_trend"] = f"""
WITH daily AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         o_orderdate AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY 1, 2
), slopes AS (
  SELECT a.m,
         CAST(CAST(b.r - a.r AS VARCHAR) AS DOUBLE)
           / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.m = b.m AND a.d < b.d
),
med AS ({_median_sql("slopes", "m", "slope", "theil_sen_slope")})
SELECT m AS month, n AS n_slopes, theil_sen_slope
FROM med
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve — user-retention survival estimate over
# event-log lifetimes with right-censoring: users whose last event
# falls within KM_CENSOR_DAYS of the corpus end are censored (still
# alive), everyone else's first-to-last-event span is an observed
# churn duration. The survival complement of cohort_retention's fixed
# grid: S(t) handles censoring correctly where naive retention-rate
# curves undercount.
#
# Exactness: S(t) = prod_{s<=t}(1 - d_s/n_s) is a SEQUENTIAL product
# of IEEE factors — no log()/exp() (repo parity rule). Each row folds
# the duration-sorted factor array prefix with IEEE * in identical
# order on both engines (the source_drift fold discipline applied to
# multiplication), so the curve is bit-exact. O(T^2) over T distinct
# durations — bounded by the calendar, not the user count.
#
# Scale (100 TB): the event log collapses map-side to one slim row
# per user (min/max ts), then to |durations| cells; the lifetable and
# the fold windows run over those <= a-few-thousand rows. The 1-row
# corpus-end aggregate broadcasts back (pinned BNLJ).
# ---------------------------------------------------------------------------
KM_CENSOR_DAYS = 30


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    end = ev.agg(F.max("ts").alias("t_end"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(end))
        .select(
            F.datediff(F.to_date("t1"), F.to_date("t0")).alias("dur"),
            (
                F.datediff(F.to_date("t_end"), F.to_date("t1"))
                >= F.lit(KM_CENSOR_DAYS)
            )
            .cast("int")
            .alias("event"),
        )
    )
    cells = users.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("event").alias("d_events"),
    )
    wall = W.orderBy("dur").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    lifetable = cells.select(
        "dur",
        "d_events",
        (
            F.sum("n_at").over(wall)
            - F.coalesce(F.sum("n_at").over(wcum), F.lit(0))
        ).alias("n_risk"),
        F.collect_list(
            F.struct(
                F.col("dur").alias("t"),
                (
                    F.lit(1.0)
                    - F.col("d_events").cast("double")
                    / (
                        F.sum("n_at").over(wall)
                        - F.coalesce(F.sum("n_at").over(wcum), F.lit(0))
                    ).cast("double")
                ).alias("f"),
            )
        )
        .over(wall)
        .alias("factors"),
    )
    surv = F.expr(
        "aggregate(filter(array_sort(factors), x -> x.t <= dur), "
        "CAST(1 AS DOUBLE), (acc, x) -> acc * x.f)"
    )
    return lifetable.select(
        F.col("dur").cast("bigint").alias("dur"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_events").cast("bigint").alias("n_events"),
        surv.alias("survival"),
    ).orderBy("dur")


ORACLE["kaplan_meier"] = f"""
WITH ev AS (
  SELECT user_id, ts FROM events
), endt AS (
  SELECT MAX(ts) AS t_end FROM ev
), users AS (
  SELECT date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS dur,
         CASE WHEN date_diff('day', CAST(MAX(ts) AS DATE),
                             CAST((SELECT t_end FROM endt) AS DATE))
                   >= {KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS event
  FROM ev GROUP BY user_id
), cells AS (
  SELECT dur, COUNT(*) AS n_at, SUM(event) AS d_events
  FROM users GROUP BY dur
), risk AS (
  SELECT dur, d_events,
         SUM(n_at) OVER ()
           - COALESCE(SUM(n_at) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM cells
), lifetable AS (
  SELECT dur, d_events, n_risk,
         list({{'t': dur,
                'f': 1.0 - CAST(d_events AS DOUBLE)
                     / CAST(n_risk AS DOUBLE)}})
           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING) AS factors
  FROM risk
)
SELECT CAST(dur AS BIGINT) AS dur, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_events AS BIGINT) AS n_events,
       list_reduce(list_prepend(CAST(1 AS DOUBLE), list_transform(
         list_filter(list_sort(factors), x -> x.t <= dur), x -> x.f)),
         (acc, x) -> acc * x) AS survival
FROM lifetable
ORDER BY dur
"""


# ---------------------------------------------------------------------------
# Time-weighted average (TWAP) — per event type, the step-hold
# time-weighted mean of `value`: each observation holds until the
# next one, so its weight is the microseconds until the next event.
# THE correct average for irregularly-sampled series (sensor
# readings, prices, utilization gauges), where the arithmetic mean
# over-weights bursty periods.
#
# Exactness: timestamps become int64 epoch-microseconds; each
# value*dt product is one deterministic double multiply cast per-row
# to DECIMAL(38,10) (order-independent), summed exactly; the weight
# total is an exact decimal sum of int64s; TWAP is one final
# division of exact totals.
#
# Scale: one lead() window over slim (type, ts, id, value) tuples
# partitioned by type; the aggregate is map-side combinable.
# ---------------------------------------------------------------------------
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        F.unix_micros("ts").alias("t_us"),
    )
    w = W.partitionBy("event_type").orderBy("t_us", "event_id")
    stepped = ev.select(
        "event_type",
        "value",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull())
    agg = stepped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum((F.col("value") * F.col("dt_us").cast("double")).cast("decimal(38,10)"))
        .cast("string")
        .cast("double")
        .alias("vw_sum"),
        F.sum(F.col("dt_us").cast("decimal(38,0)"))
        .cast("string")
        .cast("double")
        .alias("w_sum"),
    )
    return (
        agg.where(F.col("w_sum") > 0)
        .select(
            "event_type",
            "n_intervals",
            (F.col("vw_sum") / F.col("w_sum")).alias("twap"),
            (F.col("w_sum") / F.lit(86400000000.0)).alias("span_days"),
        )
        .orderBy("event_type")
    )


ORACLE["time_weighted_avg"] = """
WITH ev AS (
  SELECT event_type, event_id, value,
         epoch_us(ts) AS t_us
  FROM events
), stepped AS (
  SELECT event_type, value,
         lead(t_us) OVER (PARTITION BY event_type ORDER BY t_us, event_id)
           - t_us AS dt_us
  FROM ev
), agg AS (
  SELECT event_type, COUNT(*) AS n_intervals,
         CAST(CAST(SUM(CAST(value * CAST(dt_us AS DOUBLE) AS DECIMAL(38,10)))
                   AS VARCHAR) AS DOUBLE) AS vw_sum,
         CAST(CAST(SUM(CAST(dt_us AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
           AS w_sum
  FROM stepped WHERE dt_us IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_intervals,
       vw_sum / w_sum AS twap,
       w_sum / 86400000000.0 AS span_days
FROM agg
WHERE w_sum > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# OHLC downsampling — compress each (event_type, day) to open / high
# / low / close / count: the lossy-but-shape-preserving reduction
# every time-series dashboard renders (and the candlestick primitive
# finance pipelines run at enormous scale). Open/close PICK the first
# and last value by the deterministic (ts, event_id) order via two
# row_number windows; high/low/count are plain aggregates — no float
# is ever summed.
#
# Scale: the two windows and the final aggregate share one shuffle on
# (event_type, day); output is |types| x |days| rows.
# ---------------------------------------------------------------------------
def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    wk = W.partitionBy("event_type", "day")
    marked = ev.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wk.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number().over(wk.orderBy(F.desc("ts"), F.desc("event_id"))).alias(
            "rn_d"
        ),
    )
    return (
        marked.groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


ORACLE["ohlc_downsample"] = """
WITH marked AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value,
         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, day,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM marked
GROUP BY event_type, day
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Maximum drawdown — the deepest peak-to-trough fall of the cumulative
# daily revenue curve: the risk statistic that complements
# cusum_changepoint (level shift) and ewma_value (smoothing) with
# worst-case path behavior. Running sum -> running max -> max gap, all
# exact decimals; the fraction is a fixed double expression at the
# end.
#
# Scale: the row-level table collapses to |distinct days| slim rows in
# one map-side-combinable aggregate; the three windows run over that
# bounded ladder only (the pinned payload-free SinglePartition shape
# every calendar query here uses).
# ---------------------------------------------------------------------------
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("r")
    )
    wrun = W.orderBy("o_orderdate").rowsBetween(W.unboundedPreceding, 0)
    curve = daily.select(
        "o_orderdate",
        F.sum("r").over(wrun).cast("decimal(38,2)").alias("cum"),
    )
    peaked = curve.select(
        "o_orderdate",
        "cum",
        F.max("cum").over(wrun).alias("peak"),
        (F.max("cum").over(wrun) - F.col("cum"))
        .cast("decimal(38,2)")
        .alias("dd"),
    )
    ranked = peaked.select(
        "*",
        F.row_number()
        .over(W.orderBy(F.col("dd").desc(), F.col("o_orderdate")))
        .alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_days"),
    )

    def dbl(c: str) -> Column:
        return F.col(c).cast("string").cast("double")

    return ranked.where(F.col("rk") == 1).select(
        F.col("o_orderdate").alias("trough_date"),
        F.col("n_days").cast("bigint").alias("n_days"),
        dbl("peak").alias("peak_cum"),
        dbl("cum").alias("trough_cum"),
        dbl("dd").alias("max_drawdown"),
        F.when(F.col("peak") > 0, dbl("dd") / dbl("peak")).alias(
            "drawdown_frac"
        ),
    )


ORACLE["max_drawdown"] = """
WITH daily AS (
  SELECT o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY o_orderdate
), curve AS (
  SELECT o_orderdate,
         CAST(SUM(r) OVER (ORDER BY o_orderdate ROWS UNBOUNDED PRECEDING)
              AS DECIMAL(38,2)) AS cum
  FROM daily
), peaked AS (
  SELECT o_orderdate, cum,
         MAX(cum) OVER (ORDER BY o_orderdate ROWS UNBOUNDED PRECEDING) AS peak,
         CAST(MAX(cum) OVER (ORDER BY o_orderdate ROWS UNBOUNDED PRECEDING)
              - cum AS DECIMAL(38,2)) AS dd
  FROM curve
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY dd DESC, o_orderdate) AS rk,
         COUNT(*) OVER () AS n_days
  FROM peaked
)
SELECT o_orderdate AS trough_date,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(CAST(peak AS VARCHAR) AS DOUBLE) AS peak_cum,
       CAST(CAST(cum AS VARCHAR) AS DOUBLE) AS trough_cum,
       CAST(CAST(dd AS VARCHAR) AS DOUBLE) AS max_drawdown,
       CASE WHEN peak > 0
            THEN CAST(CAST(dd AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(peak AS VARCHAR) AS DOUBLE) END AS drawdown_frac
FROM ranked WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Seasonally-adjusted anomaly days — daily revenue days whose
# deviation from their OWN day-of-week mean exceeds 2 sigma of that
# weekday's distribution: the residual screen seasonal_profile's raw
# means can't do (a strong Saturday is normal; a Saturday-sized
# Tuesday is the anomaly).
#
# Exactness: per-dow moment sums (count, sum, sum of squares) are
# exact decimals; mean, variance, and z are fixed double expressions
# of the transited totals (sqrt only). Scale: days ladder again —
# the dow-stats frame is 7 rows, broadcast to the |days| slim frame.
# ---------------------------------------------------------------------------
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("r")
    ).select(
        "o_orderdate",
        F.expr("weekday(o_orderdate)").cast("int").alias("dow_iso0"),
        "r",
    )

    def dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    dowstats = daily.groupBy("dow_iso0").agg(
        F.count(F.lit(1)).alias("n_dow"),
        dbl(F.sum("r").cast("decimal(38,2)")).alias("s_dow"),
        dbl(
            F.sum((F.col("r") * F.col("r")).cast("decimal(38,4)")).cast(
                "decimal(38,4)"
            )
        ).alias("q_dow"),
    )
    n = F.col("n_dow").cast("double")
    var = (n * F.col("q_dow") - F.col("s_dow") * F.col("s_dow")) / (
        n * (n - F.lit(1.0))
    )
    z = (dbl(F.col("r")) - F.col("s_dow") / n) / F.sqrt(var)
    return (
        daily.join(F.broadcast(dowstats), "dow_iso0")
        .where(F.col("n_dow") > 1)
        .select(
            "o_orderdate",
            "dow_iso0",
            dbl(F.col("r")).alias("revenue"),
            (F.col("s_dow") / n).alias("expected"),
            z.alias("z_score"),
        )
        .where((var > 0) & (F.abs(z) > 2.0))
        .orderBy("o_orderdate")
    )


ORACLE["seasonal_anomaly"] = """
WITH daily AS (
  SELECT o_orderdate, CAST(isodow(o_orderdate) - 1 AS INT) AS dow_iso0,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY o_orderdate
), dowstats AS (
  SELECT dow_iso0, COUNT(*) AS n_dow,
         CAST(CAST(CAST(SUM(r) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS s_dow,
         CAST(CAST(CAST(SUM(CAST(r * r AS DECIMAL(38,4))) AS DECIMAL(38,4))
              AS VARCHAR) AS DOUBLE) AS q_dow
  FROM daily GROUP BY dow_iso0
)
SELECT o_orderdate, dow_iso0,
       CAST(CAST(r AS VARCHAR) AS DOUBLE) AS revenue,
       s_dow / CAST(n_dow AS DOUBLE) AS expected,
       (CAST(CAST(r AS VARCHAR) AS DOUBLE) - s_dow / CAST(n_dow AS DOUBLE))
         / sqrt((CAST(n_dow AS DOUBLE) * q_dow - s_dow * s_dow)
                / (CAST(n_dow AS DOUBLE) * (CAST(n_dow AS DOUBLE) - 1.0))) AS z_score
FROM daily JOIN dowstats USING (dow_iso0)
WHERE n_dow > 1
  AND (CAST(n_dow AS DOUBLE) * q_dow - s_dow * s_dow)
      / (CAST(n_dow AS DOUBLE) * (CAST(n_dow AS DOUBLE) - 1.0)) > 0
  AND abs((CAST(CAST(r AS VARCHAR) AS DOUBLE) - s_dow / CAST(n_dow AS DOUBLE))
          / sqrt((CAST(n_dow AS DOUBLE) * q_dow - s_dow * s_dow)
                 / (CAST(n_dow AS DOUBLE) * (CAST(n_dow AS DOUBLE) - 1.0)))) > 2.0
ORDER BY o_orderdate
"""


# ---------------------------------------------------------------------------
# Binary-segmentation changepoints — the hierarchical sequel to
# cusum_changepoint: find the strongest level shift in the daily
# revenue series, SPLIT there, and find the strongest shift inside
# each half (each against its own segment mean). Two levels is the
# classic binseg step a monitoring pipeline runs before fitting
# per-regime baselines.
#
# Each segment's peak uses exactly cusum_changepoint's exact-decimal
# algebra (n*r - t running sum, |s*|/n as the final fixed double).
# The two split collects are 1-row driver actions (the bounded-
# iteration pattern of kmeans/bpe); every window runs over the slim
# |days| ladder, the row-level table is touched once by the daily
# aggregate.
# ---------------------------------------------------------------------------
def _cusum_argmax(daily: DataFrame):
    """(changepoint_date, n_days, peak) row of a (o_orderdate, r)
    daily-revenue frame — None when the segment has < 2 days."""
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("r").cast("decimal(29,2)").alias("t"),
    )
    dev = (
        (F.col("n") * F.col("r")).cast("decimal(29,2)") - F.col("t")
    ).cast("decimal(30,2)")
    wrun = W.orderBy("o_orderdate").rowsBetween(W.unboundedPreceding, 0)
    ranked = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "o_orderdate",
            "n",
            F.sum(dev).over(wrun).cast("decimal(38,2)").alias("s_star"),
        )
        .select(
            "*",
            F.row_number()
            .over(W.orderBy(F.abs(F.col("s_star")).desc(), F.col("o_orderdate")))
            .alias("rk"),
        )
        .where(F.col("rk") == 1)
        .select(
            "o_orderdate",
            F.col("n").cast("bigint").alias("n_days"),
            (
                F.abs(F.col("s_star")).cast("string").cast("double")
                / F.col("n").cast("string").cast("double")
            ).alias("peak"),
        )
        .collect()  # bounded: exactly one row per segment
    )
    if not ranked or ranked[0].n_days < 2:
        return None
    return ranked[0]


def q_binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("r")
    )
    out: list[tuple] = []
    top = _cusum_argmax(daily)
    if top is not None:
        out.append((1, "all", top.o_orderdate, top.n_days, top.peak))
        for seg, frame in (
            ("left", daily.where(F.col("o_orderdate") <= top.o_orderdate)),
            ("right", daily.where(F.col("o_orderdate") > top.o_orderdate)),
        ):
            sub = _cusum_argmax(frame)
            if sub is not None:
                out.append((2, seg, sub.o_orderdate, sub.n_days, sub.peak))
    return local_df(spark, 
        out,
        "level int, segment string, changepoint_date date, n_days bigint, "
        "peak double",
    ).orderBy("level", "segment")


def _binseg_seg_sql(src: str) -> str:
    """cusum argmax over a daily CTE named ``src`` (exact algebra of
    ORACLE['cusum_changepoint'], emitting (date, n_days, peak))."""
    return f"""
  SELECT o_orderdate, CAST(n AS BIGINT) AS n_days,
         CAST(CAST(abs(s_star) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n AS VARCHAR) AS DOUBLE) AS peak
  FROM (
    SELECT o_orderdate, n, s_star,
           ROW_NUMBER() OVER (ORDER BY abs(s_star) DESC, o_orderdate) AS rk
    FROM (
      SELECT o_orderdate, n,
             CAST(SUM(CAST(CAST(n * r AS DECIMAL(29,2)) - t AS DECIMAL(30,2)))
                    OVER (ORDER BY o_orderdate ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,2)) AS s_star
      FROM {src} CROSS JOIN (
        SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
               CAST(SUM(r) AS DECIMAL(29,2)) AS t
        FROM {src}
      )
    )
  )
  WHERE rk = 1 AND n_days >= 2
"""


ORACLE["binseg_changepoints"] = f"""
WITH daily AS MATERIALIZED (
  SELECT o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY o_orderdate
), c_all AS MATERIALIZED ({_binseg_seg_sql('daily')}
), d_left AS MATERIALIZED (
  SELECT * FROM daily
  WHERE o_orderdate <= (SELECT o_orderdate FROM c_all)
), d_right AS MATERIALIZED (
  SELECT * FROM daily
  WHERE o_orderdate > (SELECT o_orderdate FROM c_all)
), c_left AS ({_binseg_seg_sql('d_left')}
), c_right AS ({_binseg_seg_sql('d_right')}
)
SELECT 1 AS level, 'all' AS segment, o_orderdate AS changepoint_date,
       n_days, peak
FROM c_all
UNION ALL
SELECT 2, 'left', o_orderdate, n_days, peak FROM c_left
UNION ALL
SELECT 2, 'right', o_orderdate, n_days, peak FROM c_right
ORDER BY level, segment
"""


# ---------------------------------------------------------------------------
# Rolling 7-day median revenue — the robust companion of
# rolling_revenue's trailing mean: per day, the exact median of the
# trailing seven daily totals. Medians resist the single-day spikes
# that drag a trailing mean, which is why ops dashboards plot both.
#
# Exactness: the window collects at most 7 exact DECIMAL(18,2) values
# (sorted in-engine), and the median is emitted as TWICE-the-median
# in exact decimals (odd: 2*mid, even: lo+hi) before one fixed /2.0
# double step — decimal division semantics differ between engines,
# decimal addition doesn't. Scale: the slim |days| ladder again; the
# 7-element arrays never touch row-level data.
# ---------------------------------------------------------------------------
def q_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(18,2)").alias("r")
    )
    w7 = W.orderBy("o_orderdate").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list("r").over(w7))
    windowed = daily.select(
        "o_orderdate",
        F.col("r").cast("string").cast("double").alias("revenue"),
        arr.alias("a"),
    )
    n = F.size("a")
    lo = F.element_at("a", (n / 2).cast("int"))
    hi = F.element_at("a", (n / 2 + 1).cast("int"))
    mid = F.element_at("a", ((n + 1) / 2).cast("int"))
    med2 = F.when(n % 2 == 1, (mid + mid).cast("decimal(19,2)")).otherwise(
        (lo + hi).cast("decimal(19,2)")
    )
    return windowed.select(
        "o_orderdate",
        "revenue",
        n.cast("int").alias("n_window"),
        (med2.cast("string").cast("double") / F.lit(2.0)).alias("median_7d"),
    ).orderBy("o_orderdate")


ORACLE["rolling_median_7d"] = """
WITH daily AS (
  SELECT o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS DECIMAL(18,2)) AS r
  FROM orders GROUP BY o_orderdate
), win AS (
  SELECT o_orderdate,
         CAST(CAST(r AS VARCHAR) AS DOUBLE) AS revenue,
         list_sort(list(r) OVER (ORDER BY o_orderdate
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS a
  FROM daily
)
SELECT o_orderdate, revenue,
       CAST(len(a) AS INT) AS n_window,
       CAST(CAST(CAST(CASE WHEN len(a) % 2 = 1
                 THEN a[(len(a) + 1) // 2] + a[(len(a) + 1) // 2]
                 ELSE a[len(a) // 2] + a[len(a) // 2 + 1]
            END AS DECIMAL(19,2)) AS VARCHAR) AS DOUBLE) / 2.0 AS median_7d
FROM win
ORDER BY o_orderdate
"""


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard — the additive twin of the
# Kaplan-Meier curve above (same lifetable, same right-censoring
# rule): H(t) = sum_{s<=t} d_s / n_s. Preferred over -ln(S(t)) for
# hazard estimation (and the building block of Aalen-Johansen
# competing-risk estimates); the repo's no-log() parity rule makes
# the direct sum the exact route anyway.
#
# Exactness: each increment d_s/n_s is one deterministic double
# division; the cumulative sum folds the duration-sorted increment
# array prefix with IEEE + in identical order on both engines (the
# kaplan_meier fold discipline with + instead of *) — a windowed
# running SUM would NOT be exact cross-engine: DuckDB evaluates
# windowed aggregates over a segment tree whose combine order differs
# from Spark's sequential frame scan.
#
# Scale: identical to kaplan_meier — events collapse map-side to one
# row per user, then to |distinct durations| lifetable cells.
# ---------------------------------------------------------------------------
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    end = ev.agg(F.max("ts").alias("t_end"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(end))
        .select(
            F.datediff(F.to_date("t1"), F.to_date("t0")).alias("dur"),
            (
                F.datediff(F.to_date("t_end"), F.to_date("t1"))
                >= F.lit(KM_CENSOR_DAYS)
            )
            .cast("int")
            .alias("event"),
        )
    )
    cells = users.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("event").alias("d_events"),
    )
    wall = W.orderBy("dur").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    n_risk = (
        F.sum("n_at").over(wall)
        - F.coalesce(F.sum("n_at").over(wcum), F.lit(0))
    )
    lifetable = cells.select(
        "dur",
        "d_events",
        n_risk.alias("n_risk"),
        F.collect_list(
            F.struct(
                F.col("dur").alias("t"),
                (
                    F.col("d_events").cast("double")
                    / n_risk.cast("double")
                ).alias("h"),
            )
        )
        .over(wall)
        .alias("increments"),
    )
    cumh = F.expr(
        "aggregate(filter(array_sort(increments), x -> x.t <= dur), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x.h)"
    )
    return lifetable.select(
        F.col("dur").cast("bigint").alias("dur"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_events").cast("bigint").alias("n_events"),
        cumh.alias("cum_hazard"),
    ).orderBy("dur")


ORACLE["nelson_aalen"] = f"""
WITH ev AS (
  SELECT user_id, ts FROM events
), endt AS (
  SELECT MAX(ts) AS t_end FROM ev
), users AS (
  SELECT date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS dur,
         CASE WHEN date_diff('day', CAST(MAX(ts) AS DATE),
                             CAST((SELECT t_end FROM endt) AS DATE))
                   >= {KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS event
  FROM ev GROUP BY user_id
), cells AS (
  SELECT dur, COUNT(*) AS n_at, SUM(event) AS d_events
  FROM users GROUP BY dur
), risk AS (
  SELECT dur, d_events,
         SUM(n_at) OVER ()
           - COALESCE(SUM(n_at) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM cells
), lifetable AS (
  SELECT dur, d_events, n_risk,
         list({{'t': dur,
                'h': CAST(d_events AS DOUBLE)
                     / CAST(n_risk AS DOUBLE)}})
           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING) AS increments
  FROM risk
)
SELECT CAST(dur AS BIGINT) AS dur, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_events AS BIGINT) AS n_events,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
         list_filter(list_sort(increments), x -> x.t <= dur), x -> x.h)),
         (acc, x) -> acc + x) AS cum_hazard
FROM lifetable
ORDER BY dur
"""


# ---------------------------------------------------------------------------
# Durbin-Watson autocorrelation statistic — the regression-diagnostic
# companion to linear_trend: fit daily revenue ~ day by OLS (exact
# fixed-point sums, the linear_trend discipline), then
# DW = sum (e_t - e_{t-1})^2 / sum e_t^2 over the day-ordered
# residuals. DW ~ 2 means independent residuals; << 2 flags the
# positive autocorrelation that invalidates naive trend confidence.
#
# Exactness: x is integer days since a fixed epoch, y exact cents
# (decimal), the four OLS sums exact DECIMAL(38,0); residuals are
# deterministic doubles, and both DW sums fold the day-sorted
# residual array sequentially (the kaplan_meier fold discipline) —
# an unordered SUM of float squares would be layout-dependent.
# Scale: orders collapse to |distinct days| rows (calendar-bounded,
# ~2.4k), and the folds run in one projection over that array.
# ---------------------------------------------------------------------------
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
        .cast("decimal(38,0)")
        .alias("cents")
    )
    pts = daily.select(
        F.datediff("d", F.lit("1992-01-01").cast("date"))
        .cast("decimal(38,0)")
        .alias("x"),
        F.col("cents").alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("x").cast("double").alias("x"),
                    F.col("y").cast("string").cast("double").alias("y"),
                )
            )
        ).alias("pts"),
    )
    to_d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    slope = (nn * to_d("sxy") - to_d("sx") * to_d("sy")) / (
        nn * to_d("sxx") - to_d("sx") * to_d("sx")
    )
    intercept = (to_d("sy") - slope * to_d("sx")) / nn
    # bind slope/intercept as columns the transform can see
    withres = agg.select(
        "n",
        slope.alias("slope_c"),
        intercept.alias("icept"),
        "pts",
    ).select(
        "n",
        F.col("slope_c").alias("slope"),
        F.expr(
            "transform(pts, p -> p.y - (icept + slope_c * p.x))"
        ).alias("e"),
    )
    den = F.expr(
        "aggregate(e, CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)"
    )
    num = F.expr(
        "aggregate(zip_with(slice(e, 2, size(e) - 1), "
        "slice(e, 1, size(e) - 1), (p, q) -> p - q), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v * v)"
    )
    return withres.select(
        F.col("n").cast("bigint").alias("n_days"),
        "slope",
        (num / den).alias("dw_stat"),
    )


ORACLE["durbin_watson"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) * 100
              AS DECIMAL(38,0)) AS cents
  FROM orders GROUP BY 1
), pts AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', d) AS DECIMAL(38,0)) AS x,
         cents AS y
  FROM daily
), agg AS (
  SELECT COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
         list_sort(list({'x': CAST(x AS DOUBLE),
                         'y': CAST(CAST(y AS VARCHAR) AS DOUBLE)})) AS pts
  FROM pts
), fitted AS (
  SELECT n,
         (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
            - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
              * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
            - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
              * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS slope_c,
         pts, sx, sy
  FROM agg
), resid AS (
  SELECT n, slope_c,
         list_transform(pts, p -> p.y -
           ((CAST(CAST(sy AS VARCHAR) AS DOUBLE)
             - slope_c * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
              / CAST(n AS DOUBLE)
            + slope_c * p.x)) AS e
  FROM fitted
)
SELECT CAST(n AS BIGINT) AS n_days, slope_c AS slope,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
         list_transform(list_zip(e[2:], e[:len(e)-1]),
           z -> (z[1] - z[2]) * (z[1] - z[2]))), (acc, v) -> acc + v)
       / list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(e, v -> v * v)), (acc, v) -> acc + v) AS dw_stat
FROM resid
"""


# ---------------------------------------------------------------------------
# Log-rank test — do two user cohorts (deterministic A/B arms:
# user_id parity) have the same churn survival curve? The standard
# two-sample survival comparison completing the kaplan_meier /
# nelson_aalen family: at every event time, the observed group-1
# events are compared to the hypergeometric expectation given the
# groups' at-risk counts; Z = (O1 - E1) / sqrt(sum V).
#
# Exactness: the lifetable is integer counts on the duration ladder;
# E and V terms are deterministic doubles folded in duration order
# (the kaplan_meier fold discipline — engine-order float sums would
# differ); O1 is an exact integer; one final sqrt. Scale: identical
# to kaplan_meier — events collapse to one row per user, then to
# |distinct durations| x 2 lifetable cells.
# ---------------------------------------------------------------------------
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    end = ev.agg(F.max("ts").alias("t_end"))
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(end))
        .select(
            (F.col("user_id") % 2).cast("int").alias("grp"),
            F.datediff(F.to_date("t1"), F.to_date("t0")).alias("dur"),
            (
                F.datediff(F.to_date("t_end"), F.to_date("t1"))
                >= F.lit(KM_CENSOR_DAYS)
            )
            .cast("int")
            .alias("event"),
        )
    )
    cells = users.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("a0"),
        F.sum(
            F.when((F.col("grp") == 1) & (F.col("event") == 1), 1).otherwise(0)
        ).alias("d1"),
        F.sum(
            F.when((F.col("grp") == 0) & (F.col("event") == 1), 1).otherwise(0)
        ).alias("d0"),
    )
    wall = W.orderBy("dur").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    wcum = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    n1 = F.sum("a1").over(wall) - F.coalesce(F.sum("a1").over(wcum), F.lit(0))
    n0 = F.sum("a0").over(wall) - F.coalesce(F.sum("a0").over(wcum), F.lit(0))
    risk = cells.select(
        "dur", "d1", "d0", n1.alias("n1"), n0.alias("n0")
    ).filter(F.col("d1") + F.col("d0") > 0)
    dt = (F.col("d1") + F.col("d0")).cast("double")
    nt = (F.col("n1") + F.col("n0")).cast("double")
    e1 = dt * F.col("n1").cast("double") / nt
    v = F.when(
        nt > 1.0,
        dt
        * (F.col("n1").cast("double") / nt)
        * (F.col("n0").cast("double") / nt)
        * (nt - dt)
        / (nt - 1.0),
    ).otherwise(F.lit(0.0))
    terms = risk.agg(
        F.sum("d1").alias("o1"),
        F.count(F.lit(1)).alias("n_times"),
        F.sort_array(
            F.collect_list(F.struct(F.col("dur").alias("t"), e1.alias("e"), v.alias("v")))
        ).alias("terms"),
    )
    esum = F.expr("aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.e)")
    vsum = F.expr("aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.v)")
    return terms.select(
        F.col("o1").cast("bigint").alias("observed_g1"),
        F.col("n_times").cast("bigint").alias("n_event_times"),
        esum.alias("expected_g1"),
        ((F.col("o1").cast("double") - esum) / F.sqrt(vsum)).alias("z"),
    )


ORACLE["logrank_test"] = f"""
WITH ev AS (SELECT user_id, ts FROM events),
endt AS (SELECT MAX(ts) AS t_end FROM ev),
users AS (
  SELECT CAST(user_id % 2 AS INT) AS grp,
         date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS dur,
         CASE WHEN date_diff('day', CAST(MAX(ts) AS DATE),
                             CAST((SELECT t_end FROM endt) AS DATE))
                   >= {KM_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS event
  FROM ev GROUP BY user_id
), cells AS (
  SELECT dur,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a1,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS a0,
         SUM(CASE WHEN grp = 1 AND event = 1 THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN grp = 0 AND event = 1 THEN 1 ELSE 0 END) AS d0
  FROM users GROUP BY dur
), risk AS (
  SELECT dur, d1, d0,
         SUM(a1) OVER () - COALESCE(SUM(a1) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
         SUM(a0) OVER () - COALESCE(SUM(a0) OVER (ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
  FROM cells
), terms AS (
  SELECT SUM(d1) AS o1, COUNT(*) AS n_times,
         list_sort(list({{'t': dur,
           'e': CAST(d1 + d0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                / CAST(n1 + n0 AS DOUBLE),
           'v': CASE WHEN CAST(n1 + n0 AS DOUBLE) > 1.0
                THEN CAST(d1 + d0 AS DOUBLE)
                     * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                     * (CAST(n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                     * (CAST(n1 + n0 AS DOUBLE) - CAST(d1 + d0 AS DOUBLE))
                     / (CAST(n1 + n0 AS DOUBLE) - 1.0)
                ELSE 0.0 END}})) AS terms
  FROM risk WHERE d1 + d0 > 0
)
SELECT CAST(o1 AS BIGINT) AS observed_g1,
       CAST(n_times AS BIGINT) AS n_event_times,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
         list_transform(terms, x -> x.e)), (acc, v) -> acc + v)
         AS expected_g1,
       (CAST(o1 AS DOUBLE)
        - list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(terms, x -> x.e)), (acc, v) -> acc + v))
       / sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(terms, x -> x.v)), (acc, v) -> acc + v)) AS z
FROM terms
"""


# ---------------------------------------------------------------------------
# Seasonal strength — how much of monthly revenue variance is
# explained by the calendar month-of-year? Eta^2 = SSB/SST over the
# 12 month-of-year groups of the monthly-revenue series (plus the
# ANOVA F for significance) — the "is there real seasonality" gate
# before fitting any seasonal model (seasonal_profile shows the
# shape; this quantifies it).
#
# Exactness: monthly revenues are exact decimal sums cast once; group
# power sums accumulate the ~84-row monthly ladder in DECIMAL (the
# values are exact cents scaled — here folded as exact doubles
# through the decimal route); the cross-group term folds the
# month-sorted 12-entry array in fixed order. One sqrt-free formula.
# ---------------------------------------------------------------------------
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.month("o_orderdate").alias("moy"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
        .cast("decimal(38,0)")
        .alias("cents")
    )
    grp = monthly.groupBy("moy").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("cents").alias("s_g"),
        F.sum(F.col("cents") * F.col("cents")).alias("q_g"),
    )
    to_d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    folded = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "moy",
                    (
                        F.col("s_g").cast("string").cast("double")
                        * F.col("s_g").cast("string").cast("double")
                        / F.col("n_g").cast("double")
                    ).alias("t"),
                    F.col("s_g").cast("string").cast("double").alias("s"),
                    F.col("q_g").cast("string").cast("double").alias("q"),
                )
            )
        ).alias("terms"),
    ).select(
        "k",
        "n",
        F.expr("aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.t)").alias("ssn"),
        F.expr("aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.s)").alias("s"),
        F.expr("aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.q)").alias("q"),
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    sst = F.col("q") - F.col("s") * F.col("s") / nn
    ssb = F.col("ssn") - F.col("s") * F.col("s") / nn
    return folded.select(
        F.col("k").cast("bigint").alias("k_months"),
        F.col("n").cast("bigint").alias("n_periods"),
        (ssb / sst).alias("eta_sq"),
        (
            ssb / (kk - 1.0) / ((sst - ssb) / (nn - kk))
        ).alias("f_stat"),
    )


ORACLE["seasonal_strength"] = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(month(o_orderdate) AS INT) AS moy,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) * 100
              AS DECIMAL(38,0)) AS cents
  FROM orders GROUP BY 1, 2
), grp AS (
  SELECT moy, COUNT(*) AS n_g, SUM(cents) AS s_g,
         SUM(cents * cents) AS q_g
  FROM monthly GROUP BY moy
), folded AS (
  SELECT COUNT(*) AS k, SUM(n_g) AS n,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'moy': moy,
             't': CAST(CAST(s_g AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(s_g AS VARCHAR) AS DOUBLE)
                  / CAST(n_g AS DOUBLE),
             's': CAST(CAST(s_g AS VARCHAR) AS DOUBLE),
             'q': CAST(CAST(q_g AS VARCHAR) AS DOUBLE)})),
           x -> x.t)), (acc, v) -> acc + v) AS ssn,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'moy': moy,
             't': CAST(CAST(s_g AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(s_g AS VARCHAR) AS DOUBLE)
                  / CAST(n_g AS DOUBLE),
             's': CAST(CAST(s_g AS VARCHAR) AS DOUBLE),
             'q': CAST(CAST(q_g AS VARCHAR) AS DOUBLE)})),
           x -> x.s)), (acc, v) -> acc + v) AS s,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'moy': moy,
             't': CAST(CAST(s_g AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(s_g AS VARCHAR) AS DOUBLE)
                  / CAST(n_g AS DOUBLE),
             's': CAST(CAST(s_g AS VARCHAR) AS DOUBLE),
             'q': CAST(CAST(q_g AS VARCHAR) AS DOUBLE)})),
           x -> x.q)), (acc, v) -> acc + v) AS q
  FROM grp
)
SELECT CAST(k AS BIGINT) AS k_months, CAST(n AS BIGINT) AS n_periods,
       (ssn - s * s / CAST(n AS DOUBLE)) / (q - s * s / CAST(n AS DOUBLE))
         AS eta_sq,
       (ssn - s * s / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
         / ((q - ssn) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat
FROM folded
"""
