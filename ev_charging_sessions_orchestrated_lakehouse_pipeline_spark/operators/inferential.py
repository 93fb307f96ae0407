"""Inferential / robust statistics operators — the hypothesis-testing
tier (rank correlation, two-sample tests, robust location estimates,
association effect sizes) that a data platform runs to validate
training-data shifts before they reach a model. The reference (a
437-line medallion ETL, jobs/ev_sessions_silver_etl_clean.py) stops at
Deequ-style constraint checks; this module extends that DQ surface to
distribution-level inference, as the build brief's first-class
extension tier.

Engine-parity rules (repo-wide oracle discipline, see
operators/stats.py and functions/oracle.py):

- **No log()** anywhere — Math.log (JVM) vs libm log (DuckDB) can
  differ in the last ULP, so every statistic here is built from
  arithmetic, comparisons, and sqrt (IEEE-754 requires sqrt to be
  correctly rounded, so it IS bit-portable).
- Everything that crosses rows is an exact int64 / DECIMAL sum; the
  final statistic is a fixed-structure double expression evaluated
  identically by both engines (decimal -> varchar -> double transit,
  see functions/oracle.py docstring).
- Rank-based statistics use integer rank surrogates (2*rank + ties-1
  = twice the average rank) so no float ever enters the rank algebra;
  Pearson-on-ranks is invariant under that affine map.

Scale design (100 TB):

- **Spearman** shuffles slim (flag, measure) pairs for the rank
  windows (the mad_outliers ordstat shape — per-group sort, never a
  global one); the moment sums are map-side combinable decimals.
- **Welch's t** is a single map-side-combinable conditional aggregate
  — one reduce to one row, no shuffle of payloads at all.
- **Trimmed/winsorized means** rank within group (per-group sort of
  slim pairs) then collapse to one exact-decimal row per group.
- **Cramér's V** aggregates contingency cells map-side (|cells| =
  r*c, bounded by the categorical domains), then runs windows over
  the tiny cells frame only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

ORACLE: dict[str, str] = {}

_D38 = "decimal(38,10)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Spearman rank correlation matrix — per return flag, the rank
# correlation between extended price, quantity, and discount: the
# robust (outlier- and monotone-transform-invariant) companion to
# corr_profile's Pearson matrix, and the standard drift screen for
# heavy-tailed measures.
#
# Method: average ranks via the integer surrogate R = 2*avg_rank =
# 2*cum_before + ct + 1 (ct = tie-group size, cum_before = rows
# strictly below the tie block) — identical to 2*rank + ties - 1, so
# Pearson correlation on the surrogates IS the textbook tie-corrected
# Spearman rho (Pearson is affine-invariant). Products R*R fit
# DECIMAL(36,0) up to ~1e18 rows per group; the nine moment sums are
# exact decimals, and rho is a fixed double expression of their exact
# totals (sqrt only — no log).
#
# Scale: ranks are NOT computed by row-level windows (the 3-value
# l_returnflag would funnel a near-global sort through 3 tasks).
# Instead each measure gets a bounded-domain contingency ladder —
# groupBy(flag, value) -> counts -> cumulative count over the
# distinct-value ladder (|distinct| slim rows per flag: ~50 for
# quantity, 11 for discount, price-domain-bounded for extendedprice)
# -> per-(flag, value) surrogate — then an equi join-back to the slim
# row frame. All shuffles are keyed on high-cardinality (flag, value)
# pairs; AQE broadcasts the small ladders. Same technique as
# mann_whitney_drift (operators/stats.py).
# ---------------------------------------------------------------------------
def _rank_ladder(li: DataFrame, col: str, alias: str) -> DataFrame:
    """Per-(flag, value) integer surrogate for 2x the average rank."""
    cells = li.groupBy("l_returnflag", col).agg(F.count(F.lit(1)).alias("ct"))
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy(col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return cells.select(
        "l_returnflag",
        col,
        (
            F.lit(2) * F.coalesce(F.sum("ct").over(wcum), F.lit(0))
            + F.col("ct")
            + F.lit(1)
        )
        .cast("decimal(18,0)")
        .alias(alias),
    )


def _rho(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column, sxy: Column) -> Column:
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    return F.when((dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy)))


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_discount"
    )
    ranked = (
        li.join(_rank_ladder(li, "l_extendedprice", "rp"), ["l_returnflag", "l_extendedprice"])
        .join(_rank_ladder(li, "l_quantity", "rq"), ["l_returnflag", "l_quantity"])
        .join(_rank_ladder(li, "l_discount", "rd"), ["l_returnflag", "l_discount"])
        .select("l_returnflag", "rp", "rq", "rd")
    )

    def dsum(c: Column) -> Column:
        return F.sum(c).cast("string").cast("double")

    rp, rq, rd = F.col("rp"), F.col("rq"), F.col("rd")
    s = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(rp).alias("sp"),
        dsum(rq).alias("sq"),
        dsum(rd).alias("sd"),
        dsum(rp * rp).alias("spp"),
        dsum(rq * rq).alias("sqq"),
        dsum(rd * rd).alias("sdd"),
        dsum(rp * rq).alias("spq"),
        dsum(rp * rd).alias("spd"),
        dsum(rq * rd).alias("sqd"),
    )
    n = F.col("n_rows").cast("double")
    c = {k: F.col(k) for k in ("sp", "sq", "sd", "spp", "sqq", "sdd", "spq", "spd", "sqd")}
    return s.select(
        "l_returnflag",
        "n_rows",
        _rho(n, c["sp"], c["sq"], c["spp"], c["sqq"], c["spq"]).alias("rho_price_qty"),
        _rho(n, c["sp"], c["sd"], c["spp"], c["sdd"], c["spd"]).alias("rho_price_disc"),
        _rho(n, c["sq"], c["sd"], c["sqq"], c["sdd"], c["sqd"]).alias("rho_qty_disc"),
    ).orderBy("l_returnflag")


def _rho_sql(x: str, y: str) -> str:
    num = f"(n_d * s{x}{y} - s{x} * s{y})"
    dx = f"(n_d * s{x}{x} - s{x} * s{x})"
    dy = f"(n_d * s{y}{y} - s{y} * s{y})"
    return (
        f"CASE WHEN {dx} > 0 AND {dy} > 0 "
        f"THEN {num} / (sqrt({dx}) * sqrt({dy})) END"
    )


ORACLE["spearman_corr"] = f"""
WITH ranked AS (
  SELECT l_returnflag,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
              - 1 AS DECIMAL(18,0)) AS rp,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
              - 1 AS DECIMAL(18,0)) AS rq,
         CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
              + COUNT(*) OVER (PARTITION BY l_returnflag, l_discount)
              - 1 AS DECIMAL(18,0)) AS rd
  FROM lineitem
), s AS (
  SELECT l_returnflag, COUNT(*) AS n_rows,
         CAST(CAST(SUM(rp) AS VARCHAR) AS DOUBLE) AS sp,
         CAST(CAST(SUM(rq) AS VARCHAR) AS DOUBLE) AS sq,
         CAST(CAST(SUM(rd) AS VARCHAR) AS DOUBLE) AS sd,
         CAST(CAST(SUM(rp * rp) AS VARCHAR) AS DOUBLE) AS spp,
         CAST(CAST(SUM(rq * rq) AS VARCHAR) AS DOUBLE) AS sqq,
         CAST(CAST(SUM(rd * rd) AS VARCHAR) AS DOUBLE) AS sdd,
         CAST(CAST(SUM(rp * rq) AS VARCHAR) AS DOUBLE) AS spq,
         CAST(CAST(SUM(rp * rd) AS VARCHAR) AS DOUBLE) AS spd,
         CAST(CAST(SUM(rq * rd) AS VARCHAR) AS DOUBLE) AS sqd
  FROM ranked GROUP BY l_returnflag
), sd2 AS (
  SELECT *, CAST(n_rows AS DOUBLE) AS n_d FROM s
)
SELECT l_returnflag, n_rows,
       {_rho_sql('p', 'q')} AS rho_price_qty,
       {_rho_sql('p', 'd')} AS rho_price_disc,
       {_rho_sql('q', 'd')} AS rho_qty_disc
FROM sd2
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Welch's two-sample t-test — does the mean event value differ between
# 'purchase' and 'click' events? The unequal-variance t statistic and
# its Welch–Satterthwaite degrees of freedom, the standard A/B and
# drift gate. One map-side-combinable conditional aggregate -> one
# row; exact decimal moment sums; t and df are fixed double
# expressions (sqrt only).
# ---------------------------------------------------------------------------
WELCH_GROUP_A = "purchase"
WELCH_GROUP_B = "click"


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")

    def dsum_if(grp: str, c: Column) -> Column:
        return (
            F.sum(F.when(F.col("event_type") == grp, c).otherwise(F.lit(None)).cast(_D38))
            .cast("string")
            .cast("double")
        )

    v = F.col("value")
    agg = ev.agg(
        F.count(F.when(F.col("event_type") == WELCH_GROUP_A, 1)).alias("na"),
        F.count(F.when(F.col("event_type") == WELCH_GROUP_B, 1)).alias("nb"),
        dsum_if(WELCH_GROUP_A, v).alias("s1a"),
        dsum_if(WELCH_GROUP_A, v * v).alias("s2a"),
        dsum_if(WELCH_GROUP_B, v).alias("s1b"),
        dsum_if(WELCH_GROUP_B, v * v).alias("s2b"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ma, mb = F.col("s1a") / na, F.col("s1b") / nb
    va = (F.col("s2a") - na * (ma * ma)) / (na - F.lit(1.0))
    vb = (F.col("s2b") - nb * (mb * mb)) / (nb - F.lit(1.0))
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    t = (ma - mb) / F.sqrt(se2)
    df = (se2 * se2) / (
        (sea * sea) / (na - F.lit(1.0)) + (seb * seb) / (nb - F.lit(1.0))
    )
    return (
        agg.where((F.col("na") > 1) & (F.col("nb") > 1))
        .select(
            "na",
            "nb",
            ma.alias("mean_a"),
            mb.alias("mean_b"),
            va.alias("var_a"),
            vb.alias("var_b"),
            F.when(se2 > 0, t).alias("t_stat"),
            F.when(se2 > 0, df).alias("df_welch"),
        )
    )


ORACLE["welch_ttest"] = f"""
WITH agg AS (
  SELECT
    COUNT(CASE WHEN event_type = '{WELCH_GROUP_A}' THEN 1 END) AS na,
    COUNT(CASE WHEN event_type = '{WELCH_GROUP_B}' THEN 1 END) AS nb,
    CAST(CAST(SUM(CAST(CASE WHEN event_type = '{WELCH_GROUP_A}' THEN value END
                       AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s1a,
    CAST(CAST(SUM(CAST(CASE WHEN event_type = '{WELCH_GROUP_A}' THEN value * value END
                       AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s2a,
    CAST(CAST(SUM(CAST(CASE WHEN event_type = '{WELCH_GROUP_B}' THEN value END
                       AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s1b,
    CAST(CAST(SUM(CAST(CASE WHEN event_type = '{WELCH_GROUP_B}' THEN value * value END
                       AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS s2b
  FROM events
), m AS (
  SELECT na, nb,
         s1a / CAST(na AS DOUBLE) AS ma, s1b / CAST(nb AS DOUBLE) AS mb,
         (s2a - CAST(na AS DOUBLE) * ((s1a / CAST(na AS DOUBLE)) * (s1a / CAST(na AS DOUBLE))))
           / (CAST(na AS DOUBLE) - 1.0) AS va,
         (s2b - CAST(nb AS DOUBLE) * ((s1b / CAST(nb AS DOUBLE)) * (s1b / CAST(nb AS DOUBLE))))
           / (CAST(nb AS DOUBLE) - 1.0) AS vb
  FROM agg WHERE na > 1 AND nb > 1
), se AS (
  SELECT *, va / CAST(na AS DOUBLE) AS sea, vb / CAST(nb AS DOUBLE) AS seb
  FROM m
)
SELECT na, nb, ma AS mean_a, mb AS mean_b, va AS var_a, vb AS var_b,
       CASE WHEN sea + seb > 0
            THEN (ma - mb) / sqrt(sea + seb) END AS t_stat,
       CASE WHEN sea + seb > 0
            THEN ((sea + seb) * (sea + seb))
                 / ((sea * sea) / (CAST(na AS DOUBLE) - 1.0)
                    + (seb * seb) / (CAST(nb AS DOUBLE) - 1.0)) END AS df_welch
FROM se
"""


# ---------------------------------------------------------------------------
# Trimmed & winsorized means — per return flag, the 10%-trimmed mean
# (drop the bottom/top decile by rank) and the winsorized mean (clamp
# them to the surviving boundary values) of extended price: the robust
# location estimates that survive the fat tails plain averages don't.
#
# Exactness: prices are exact DECIMAL(18,2) per row; the kept-set
# boundary is decided by integer rank comparisons (rank() places ties
# identically on both engines); sums are exact decimals; the two means
# are fixed double expressions of exact totals and int counts.
# ---------------------------------------------------------------------------
TRIM_FRAC_DENOM = 10  # trim floor(n/10) rows from each tail


def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("decimal(18,2)").alias("p")
    )
    wf = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "p",
        F.rank().over(wf.orderBy("p")).alias("rk"),
        F.count(F.lit(1)).over(wf).alias("n"),
    ).select(
        "l_returnflag",
        "p",
        "rk",
        "n",
        F.floor(F.col("n") / F.lit(TRIM_FRAC_DENOM)).alias("lo"),
    )
    kept = (F.col("rk") > F.col("lo")) & (F.col("rk") <= F.col("n") - F.col("lo"))
    agg = ranked.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("p")))
        .cast("decimal(38,2)")
        .cast("string")
        .cast("double")
        .alias("ksum"),
        F.min(F.when(kept, F.col("p"))).cast("string").cast("double").alias("lo_val"),
        F.max(F.when(kept, F.col("p"))).cast("string").cast("double").alias("hi_val"),
        F.sum(F.when(F.col("rk") <= F.col("lo"), 1).otherwise(0)).alias("n_below"),
        F.sum(F.when(F.col("rk") > F.col("n") - F.col("lo"), 1).otherwise(0)).alias(
            "n_above"
        ),
    )
    return agg.where(F.col("n_kept") > 0).select(
        "l_returnflag",
        "n_rows",
        "n_kept",
        (F.col("ksum") / F.col("n_kept").cast("double")).alias("trimmed_mean"),
        (
            (
                F.col("ksum")
                + F.col("n_below").cast("double") * F.col("lo_val")
                + F.col("n_above").cast("double") * F.col("hi_val")
            )
            / F.col("n_rows").cast("double")
        ).alias("winsorized_mean"),
    ).orderBy("l_returnflag")


ORACLE["trimmed_stats"] = f"""
WITH ranked AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
         rank() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DECIMAL(18,2))) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
), marked AS (
  SELECT *, CAST(floor(n / {TRIM_FRAC_DENOM}) AS BIGINT) AS lo FROM ranked
), agg AS (
  SELECT l_returnflag,
         MAX(n) AS n_rows,
         CAST(SUM(CASE WHEN rk > lo AND rk <= n - lo THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(CAST(CAST(SUM(CASE WHEN rk > lo AND rk <= n - lo THEN p END)
                        AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS ksum,
         CAST(CAST(MIN(CASE WHEN rk > lo AND rk <= n - lo THEN p END)
                   AS VARCHAR) AS DOUBLE) AS lo_val,
         CAST(CAST(MAX(CASE WHEN rk > lo AND rk <= n - lo THEN p END)
                   AS VARCHAR) AS DOUBLE) AS hi_val,
         CAST(SUM(CASE WHEN rk <= lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         CAST(SUM(CASE WHEN rk > n - lo THEN 1 ELSE 0 END) AS BIGINT) AS n_above
  FROM marked GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows, n_kept,
       ksum / CAST(n_kept AS DOUBLE) AS trimmed_mean,
       (ksum + CAST(n_below AS DOUBLE) * lo_val + CAST(n_above AS DOUBLE) * hi_val)
         / CAST(n_rows AS DOUBLE) AS winsorized_mean
FROM agg
WHERE n_kept > 0
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Cramér's V association effect sizes — chi-square normalized to
# [0, 1] for two categorical pairs (order priority x status, customer
# segment x nation): the comparable-across-tables strength measure
# that raw chi2 (chi_square_assoc) is not. Contingency cells aggregate
# map-side (|cells| = r*c rows); every window below runs on that tiny
# frame; V = sqrt(chi2 / (n * min(r-1, c-1))) — sqrt only, no log.
# ---------------------------------------------------------------------------
def _cramers_one(df: DataFrame, a: str, b: str, name: str) -> DataFrame:
    cells = df.groupBy(F.col(a).alias("va"), F.col(b).alias("vb")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    wr, wc, wall = W.partitionBy("va"), W.partitionBy("vb"), W.partitionBy()
    exp = (F.sum("n_c").over(wr) * F.sum("n_c").over(wc)).cast("double") / F.sum(
        "n_c"
    ).over(wall).cast("double")
    d = F.col("n_c").cast("double") - F.col("exp")
    withexp = cells.select("va", "vb", "n_c", exp.alias("exp"))
    return withexp.agg(
        F.sum("n_c").alias("n_rows"),
        F.count_distinct("va").alias("r_levels"),
        F.count_distinct("vb").alias("c_levels"),
        F.sum(((d * d) / F.col("exp")).cast("decimal(25,10)"))
        .cast("string")
        .cast("double")
        .alias("chi2"),
    ).select(F.lit(name).alias("pair"), "n_rows", "r_levels", "c_levels", "chi2")


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    base = _cramers_one(orders, "o_orderpriority", "o_orderstatus", "priority_x_status")
    seg = _cramers_one(cust, "c_mktsegment", "c_nationkey", "segment_x_nation")
    u = base.unionByName(seg)
    mindim = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    v = F.when(
        (F.col("n_rows") > 0) & (mindim > 0),
        F.sqrt(F.col("chi2") / (F.col("n_rows").cast("double") * mindim.cast("double"))),
    )
    return u.select(
        "pair",
        "n_rows",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("dof"),
        "chi2",
        v.alias("cramers_v"),
    ).orderBy("pair")


def _cramers_sql(table: str, a: str, b: str, name: str) -> str:
    return f"""
  SELECT '{name}' AS pair, n_rows, dof, chi2,
         CASE WHEN n_rows > 0 AND mindim > 0
              THEN sqrt(chi2 / (CAST(n_rows AS DOUBLE) * CAST(mindim AS DOUBLE)))
         END AS cramers_v
  FROM (
    SELECT SUM(n_c) AS n_rows,
           (COUNT(DISTINCT va) - 1) * (COUNT(DISTINCT vb) - 1) AS dof,
           least(COUNT(DISTINCT va) - 1, COUNT(DISTINCT vb) - 1) AS mindim,
           CAST(CAST(SUM(CAST((CAST(n_c AS DOUBLE) - exp) * (CAST(n_c AS DOUBLE) - exp)
                              / exp AS DECIMAL(25,10))) AS VARCHAR) AS DOUBLE) AS chi2
    FROM (
      SELECT va, vb, n_c,
             CAST(SUM(n_c) OVER (PARTITION BY va)
                  * SUM(n_c) OVER (PARTITION BY vb) AS DOUBLE)
               / CAST(SUM(n_c) OVER () AS DOUBLE) AS exp
      FROM (SELECT {a} AS va, {b} AS vb, COUNT(*) AS n_c FROM {table} GROUP BY 1, 2)
    )
  )"""


ORACLE["cramers_v"] = f"""
SELECT pair, CAST(n_rows AS BIGINT) AS n_rows, CAST(dof AS BIGINT) AS dof,
       chi2, cramers_v
FROM (
{_cramers_sql('orders', 'o_orderpriority', 'o_orderstatus', 'priority_x_status')}
  UNION ALL
{_cramers_sql('customer', 'c_mktsegment', 'c_nationkey', 'segment_x_nation')}
)
ORDER BY pair
"""


# ---------------------------------------------------------------------------
# Kendall's tau-b — the concordance-based rank correlation between
# quantity and discount per return flag, with full tie correction:
# the third member of the rank-statistics family (spearman_corr,
# mann_whitney_drift) and the most robust of the three for heavily
# tied ordinal data.
#
# Computed WITHOUT pairing rows: both measures have tiny value
# domains, so the (flag, quantity, discount) contingency grid (at
# most |Q| x |D| cells per flag, ~550) carries everything. The
# concordant count is sum(n_ij * P_ij) where P_ij is the 2-D
# EXCLUSIVE prefix sum over the densified grid — two slim window
# passes (cumulate over discount within quantity, then over quantity
# at fixed discount); the discordant count uses the mirrored suffix.
# All pair counts are exact DECIMAL(38,0) folds (a 100-TB group has
# ~1e12 rows, so C ~ 1e24 overflows int64 — decimals don't); tau_b
# is a fixed double expression (sqrt only, no log). Row-level data
# is touched exactly once, by the map-side-combinable cell count.
# ---------------------------------------------------------------------------
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("d"),
    )
    cells = li.groupBy("l_returnflag", "q", "d").agg(
        F.count(F.lit(1)).alias("n")
    )
    # densify: every (q, d) combination per flag, zero-filled — the
    # 2-D prefix windows need the full grid to cumulate correctly
    qs = li.select("l_returnflag", "q").distinct()
    ds = li.select("l_returnflag", "d").distinct()
    dense = (
        qs.join(ds, "l_returnflag")
        .join(cells, ["l_returnflag", "q", "d"], "left")
        .fillna(0, ["n"])
    )
    w_dlt = (
        W.partitionBy("l_returnflag", "q")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_dgt = (
        W.partitionBy("l_returnflag", "q")
        .orderBy("d")
        .rowsBetween(1, W.unboundedFollowing)
    )
    pre = dense.select(
        "l_returnflag",
        "q",
        "d",
        "n",
        F.coalesce(F.sum("n").over(w_dlt), F.lit(0)).alias("c_dlt"),
        F.coalesce(F.sum("n").over(w_dgt), F.lit(0)).alias("c_dgt"),
    )
    w_qlt = (
        W.partitionBy("l_returnflag", "d")
        .orderBy("q")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    grid = pre.select(
        "l_returnflag",
        "q",
        "d",
        "n",
        F.coalesce(F.sum("c_dlt").over(w_qlt), F.lit(0)).alias("p_conc"),
        F.coalesce(F.sum("c_dgt").over(w_qlt), F.lit(0)).alias("p_disc"),
    )

    def dprod(a: str, b: str) -> Column:
        return F.sum(
            F.col(a).cast("decimal(19,0)") * F.col(b).cast("decimal(19,0)")
        ).cast("string").cast("double")

    s = grid.groupBy("l_returnflag").agg(
        F.sum("n").alias("n_rows"),
        dprod("n", "p_conc").alias("conc"),
        dprod("n", "p_disc").alias("disc"),
    )
    # tie sums per variable: tq over quantity marginals, td over
    # discount marginals — each a bounded-domain aggregate
    def ties(colname: str, alias: str):
        marg = li.groupBy("l_returnflag", colname).agg(
            F.count(F.lit(1)).alias("t")
        )
        return marg.groupBy("l_returnflag").agg(
            (
                F.sum(
                    F.col("t").cast("decimal(19,0)")
                    * (F.col("t") - F.lit(1)).cast("decimal(19,0)")
                )
                / F.lit(2)
            )
            .cast("decimal(38,0)")
            .cast("string")
            .cast("double")
            .alias(alias)
        )

    out = (
        s.join(ties("q", "tie_q"), "l_returnflag")
        .join(ties("d", "tie_d"), "l_returnflag")
    )
    n = F.col("n_rows").cast("double")
    n0 = n * (n - F.lit(1.0)) / F.lit(2.0)
    denom = (n0 - F.col("tie_q")) * (n0 - F.col("tie_d"))
    return (
        out.where(denom > 0)
        .select(
            "l_returnflag",
            "n_rows",
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            ((F.col("conc") - F.col("disc")) / F.sqrt(denom)).alias("tau_b"),
        )
        .orderBy("l_returnflag")
    )


ORACLE["kendall_tau"] = """
WITH base AS (
  SELECT l_returnflag, l_quantity AS q, l_discount AS d FROM lineitem
), cells AS (
  SELECT l_returnflag, q, d, COUNT(*) AS n FROM base GROUP BY 1, 2, 3
), dense AS (
  SELECT g.l_returnflag, g.q, g.d, COALESCE(c.n, 0) AS n
  FROM (
    SELECT qs.l_returnflag, qs.q, ds.d
    FROM (SELECT DISTINCT l_returnflag, q FROM base) qs
    JOIN (SELECT DISTINCT l_returnflag, d FROM base) ds
      USING (l_returnflag)
  ) g
  LEFT JOIN cells c
    ON c.l_returnflag = g.l_returnflag AND c.q = g.q AND c.d = g.d
), pre AS (
  SELECT l_returnflag, q, d, n,
         COALESCE(SUM(n) OVER (PARTITION BY l_returnflag, q ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_dlt,
         COALESCE(SUM(n) OVER (PARTITION BY l_returnflag, q ORDER BY d
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS c_dgt
  FROM dense
), grid AS (
  SELECT l_returnflag, q, d, n,
         COALESCE(SUM(c_dlt) OVER (PARTITION BY l_returnflag, d ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_conc,
         COALESCE(SUM(c_dgt) OVER (PARTITION BY l_returnflag, d ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_disc
  FROM pre
), s AS (
  SELECT l_returnflag, SUM(n) AS n_rows,
         CAST(CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(p_conc AS DECIMAL(19,0)))
              AS VARCHAR) AS DOUBLE) AS conc,
         CAST(CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(p_disc AS DECIMAL(19,0)))
              AS VARCHAR) AS DOUBLE) AS disc
  FROM grid GROUP BY l_returnflag
), tq AS (
  SELECT l_returnflag,
         CAST(CAST(CAST(SUM(CAST(t AS DECIMAL(19,0)) * CAST(t - 1 AS DECIMAL(19,0))) / 2
              AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS tie_q
  FROM (SELECT l_returnflag, q, COUNT(*) AS t FROM base GROUP BY 1, 2)
  GROUP BY l_returnflag
), td AS (
  SELECT l_returnflag,
         CAST(CAST(CAST(SUM(CAST(t AS DECIMAL(19,0)) * CAST(t - 1 AS DECIMAL(19,0))) / 2
              AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS tie_d
  FROM (SELECT l_returnflag, d, COUNT(*) AS t FROM base GROUP BY 1, 2)
  GROUP BY l_returnflag
)
SELECT s.l_returnflag, CAST(n_rows AS BIGINT) AS n_rows,
       conc AS concordant, disc AS discordant,
       (conc - disc)
         / sqrt((CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0) / 2.0 - tie_q)
              * (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0) / 2.0 - tie_d)) AS tau_b
FROM s JOIN tq USING (l_returnflag) JOIN td USING (l_returnflag)
WHERE (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0) / 2.0 - tie_q)
      * (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0) / 2.0 - tie_d) > 0
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Two-proportion z-test — does the USER conversion rate differ between
# the two arms of a deterministic A/B split (arm = user_id % 2, the
# standard hash-bucket experiment assignment)? The categorical
# counterpart of welch_ttest (which compares means): pooled-proportion
# z statistic, where a user converts if they logged >= 1 purchase.
# One groupBy(user) -> any(purchase) pass (slim shuffle on the user
# key), then one conditional aggregate -> one row; every input to the
# z expression is an exact int64 count, so the statistic is a fixed
# double expression (sqrt only) — nothing to drift at any scale.
# ---------------------------------------------------------------------------
def q_prop_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    arm = (F.col("user_id") % 2 == 0).cast("long")
    s = users.agg(
        F.sum(arm).alias("na"),
        F.sum(arm * F.col("conv")).alias("ka"),
        F.sum(F.lit(1) - arm).alias("nb"),
        F.sum((F.lit(1) - arm) * F.col("conv")).alias("kb"),
    )
    na, ka = F.col("na").cast("double"), F.col("ka").cast("double")
    nb, kb = F.col("nb").cast("double"), F.col("kb").cast("double")
    pool = (ka + kb) / (na + nb)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return s.where((F.col("na") > 0) & (F.col("nb") > 0) & (se > 0)).select(
        "na",
        "ka",
        "nb",
        "kb",
        (ka / na).alias("rate_a"),
        (kb / nb).alias("rate_b"),
        ((ka / na - kb / nb) / se).alias("z_score"),
    )


ORACLE["prop_ztest"] = """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), s AS (
  SELECT
    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
    SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS ka,
    SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS nb,
    SUM(CASE WHEN user_id % 2 <> 0 THEN conv ELSE 0 END) AS kb
  FROM users
), d AS (
  SELECT CAST(na AS BIGINT) AS na, CAST(ka AS BIGINT) AS ka,
         CAST(nb AS BIGINT) AS nb, CAST(kb AS BIGINT) AS kb,
         CAST(na AS DOUBLE) AS nad, CAST(ka AS DOUBLE) AS kad,
         CAST(nb AS DOUBLE) AS nbd, CAST(kb AS DOUBLE) AS kbd
  FROM s
)
SELECT na, ka, nb, kb,
       kad / nad AS rate_a,
       kbd / nbd AS rate_b,
       (kad / nad - kbd / nbd)
         / sqrt(((kad + kbd) / (nad + nbd)) * (1.0 - (kad + kbd) / (nad + nbd))
                * (1.0 / nad + 1.0 / nbd)) AS z_score
FROM d
WHERE na > 0 AND nb > 0
  AND sqrt(((kad + kbd) / (nad + nbd)) * (1.0 - (kad + kbd) / (nad + nbd))
           * (1.0 / nad + 1.0 / nbd)) > 0
"""


# ---------------------------------------------------------------------------
# Two-factor OLS — revenue per lineitem regressed on quantity AND
# discount jointly, per return flag: the multiple-regression upgrade
# of linear_trend (simple regression), answering "what does a unit of
# quantity buy holding discount fixed". Closed-form normal equations
# for two centered regressors — beta = (Sqq*Sdy - Sqd*Sqy... solved
# 2x2 — from exact decimal moment sums; coefficients are fixed double
# expressions of the transited totals. One map-side-combinable
# aggregate per flag; no matrix library, no iteration, no shuffle of
# anything but the 10 moments.
# ---------------------------------------------------------------------------
def q_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )

    def dsum(c: Column) -> Column:
        return F.sum(c.cast(_D38)).cast("string").cast("double")

    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * x2).alias("s12"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
    )
    n = F.col("n_rows").cast("double")
    # centered second moments (computed from raw sums, one fixed form)
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    intercept = (F.col("sy") - b1 * F.col("s1") - b2 * F.col("s2")) / n
    return (
        s.where(det > 0)
        .select(
            "l_returnflag",
            "n_rows",
            b1.alias("beta_quantity"),
            b2.alias("beta_discount"),
            intercept.alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


def _ols_sql() -> str:
    n = "CAST(n_rows AS DOUBLE)"
    c11 = f"(s11 - s1 * s1 / {n})"
    c22 = f"(s22 - s2 * s2 / {n})"
    c12 = f"(s12 - s1 * s2 / {n})"
    c1y = f"(s1y - s1 * sy / {n})"
    c2y = f"(s2y - s2 * sy / {n})"
    det = f"({c11} * {c22} - {c12} * {c12})"
    b1 = f"(({c22} * {c1y} - {c12} * {c2y}) / {det})"
    b2 = f"(({c11} * {c2y} - {c12} * {c1y}) / {det})"

    def d38(expr: str) -> str:
        return (
            f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR)"
            " AS DOUBLE)"
        )

    return f"""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n_rows,
         {d38('l_quantity')} AS s1,
         {d38('l_discount')} AS s2,
         {d38('l_extendedprice')} AS sy,
         {d38('l_quantity * l_quantity')} AS s11,
         {d38('l_discount * l_discount')} AS s22,
         {d38('l_quantity * l_discount')} AS s12,
         {d38('l_quantity * l_extendedprice')} AS s1y,
         {d38('l_discount * l_extendedprice')} AS s2y
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       {b1} AS beta_quantity,
       {b2} AS beta_discount,
       (sy - {b1} * s1 - {b2} * s2) / {n} AS intercept
FROM s
WHERE {det} > 0
ORDER BY l_returnflag
"""


ORACLE["ols_two_factor"] = _ols_sql()


# ---------------------------------------------------------------------------
# One-way ANOVA — does mean l_quantity differ across return-flag
# groups? The k-sample generalization of welch_ttest's two-sample
# comparison (classic equal-variance F test). F = (SSB/(k-1)) /
# (SSW/(N-k)) with SSB = sum_g S_g^2/n_g - S^2/N and
# SSW = Q - sum_g S_g^2/n_g from raw power sums only.
#
# Exactness: l_quantity is integer-valued, so S_g = sum(x) and
# Q = sum(x^2) are EXACT decimal sums (functions/oracle.py route);
# every downstream op is deterministic IEEE double arithmetic on
# those exact aggregates. The 3-term sum over groups folds the
# flag-sorted array in identical order on both engines (same
# discipline as the kaplan_meier factor fold) — never a float SUM()
# whose accumulation order the engine picks.
#
# Scale: one map-side-combinable groupBy over k=|distinct flags|
# keys; the k-row frame folds driver-free in one projection.
# ---------------------------------------------------------------------------
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("l_quantity").cast(_D38))
        .cast("string")
        .cast("double")
        .alias("s_g"),
    )
    tot = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(_D38))
        .cast("string")
        .cast("double")
        .alias("s"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(_D38))
        .cast("string")
        .cast("double")
        .alias("q"),
    )
    folded = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sort_array(
            F.collect_list(
                F.struct("l_returnflag", (F.col("s_g") * F.col("s_g") / F.col("n_g").cast("double")).alias("t"))
            )
        ).alias("terms"),
    ).select(
        "k",
        F.expr(
            "aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.t)"
        ).alias("sum_sq_over_n"),
    )
    return folded.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_total"),
        (F.col("sum_sq_over_n") - F.col("s") * F.col("s") / F.col("n").cast("double")).alias("ss_between"),
        (F.col("q") - F.col("sum_sq_over_n")).alias("ss_within"),
        (
            (F.col("sum_sq_over_n") - F.col("s") * F.col("s") / F.col("n").cast("double"))
            / (F.col("k") - F.lit(1)).cast("double")
            / (
                (F.col("q") - F.col("sum_sq_over_n"))
                / (F.col("n") - F.col("k")).cast("double")
            )
        ).alias("f_stat"),
    )


ORACLE["anova_oneway"] = """
WITH grp AS (
  SELECT l_returnflag, COUNT(*) AS n_g,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) AS s_g
  FROM lineitem GROUP BY l_returnflag
), tot AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
              AS VARCHAR) AS DOUBLE) AS q
  FROM lineitem
), folded AS (
  SELECT COUNT(*) AS k,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'l_returnflag': l_returnflag,
                           't': s_g * s_g / CAST(n_g AS DOUBLE)})),
           x -> x.t)), (acc, x) -> acc + x) AS sum_sq_over_n
  FROM grp
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_total,
       sum_sq_over_n - s * s / CAST(n AS DOUBLE) AS ss_between,
       q - sum_sq_over_n AS ss_within,
       (sum_sq_over_n - s * s / CAST(n AS DOUBLE))
         / CAST(k - 1 AS DOUBLE)
         / ((q - sum_sq_over_n) / CAST(n - k AS DOUBLE)) AS f_stat
FROM folded, tot
"""


# ---------------------------------------------------------------------------
# Jarque-Bera normality test — per return flag, the sample skewness
# g1, excess kurtosis g2, and JB = n/6 * (g1^2 + g2^2/4): the
# standard "is this residual distribution normal enough" gate for
# regression diagnostics and anomaly thresholds (skewness_kurtosis
# surfaces the moments; this adds the test statistic per group).
#
# Exactness: central moments expand into RAW power sums
# (m_k from Q1..Q4 via the binomial expansion) — l_quantity is
# integer-valued so Q_k = sum(x^k) are exact decimal sums (x^4 <=
# 6.25e6 per row; DECIMAL(38,10) holds the total at any SF), and all
# downstream arithmetic is deterministic IEEE double on exact inputs.
# sqrt is the one libm call both engines implement correctly-rounded
# (repo parity rule: sqrt safe, log/exp forbidden).
#
# Scale: one map-side-combinable groupBy over |distinct flags| keys
# carrying four decimal accumulators — nothing else moves.
# ---------------------------------------------------------------------------
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")

    def psum(expr: Column, name: str) -> Column:
        return (
            F.sum(expr.cast(_D38)).cast("string").cast("double").alias(name)
        )

    mom = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        psum(x, "q1"),
        psum(x * x, "q2"),
        psum(x * x * x, "q3"),
        psum(x * x * x * x, "q4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("q1") / n
    m2 = F.col("q2") / n - mu * mu
    m3 = F.col("q3") / n - F.lit(3.0) * mu * F.col("q2") / n + F.lit(2.0) * mu * mu * mu
    m4 = (
        F.col("q4") / n
        - F.lit(4.0) * mu * F.col("q3") / n
        + F.lit(6.0) * mu * mu * F.col("q2") / n
        - F.lit(3.0) * mu * mu * mu * mu
    )
    g1 = m3 / F.sqrt(m2 * m2 * m2)
    g2 = m4 / (m2 * m2) - F.lit(3.0)
    return mom.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        g1.alias("skewness"),
        g2.alias("excess_kurtosis"),
        (n / F.lit(6.0) * (g1 * g1 + g2 * g2 / F.lit(4.0))).alias("jb_stat"),
    ).orderBy("l_returnflag")


ORACLE["jarque_bera"] = """
WITH mom AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) AS q1,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
              AS VARCHAR) AS DOUBLE) AS q2,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
              AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS q3,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
              * l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS q4
  FROM lineitem GROUP BY l_returnflag
), m AS (
  SELECT l_returnflag, n,
         q1 / CAST(n AS DOUBLE) AS mu,
         q2 / CAST(n AS DOUBLE)
           - (q1 / CAST(n AS DOUBLE)) * (q1 / CAST(n AS DOUBLE)) AS m2,
         q3 / CAST(n AS DOUBLE)
           - 3.0 * (q1 / CAST(n AS DOUBLE)) * q2 / CAST(n AS DOUBLE)
           + 2.0 * (q1 / CAST(n AS DOUBLE)) * (q1 / CAST(n AS DOUBLE))
                 * (q1 / CAST(n AS DOUBLE)) AS m3,
         q4 / CAST(n AS DOUBLE)
           - 4.0 * (q1 / CAST(n AS DOUBLE)) * q3 / CAST(n AS DOUBLE)
           + 6.0 * (q1 / CAST(n AS DOUBLE)) * (q1 / CAST(n AS DOUBLE))
                 * q2 / CAST(n AS DOUBLE)
           - 3.0 * (q1 / CAST(n AS DOUBLE)) * (q1 / CAST(n AS DOUBLE))
                 * (q1 / CAST(n AS DOUBLE)) * (q1 / CAST(n AS DOUBLE)) AS m4
  FROM mom
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       m3 / sqrt(m2 * m2 * m2) AS skewness,
       m4 / (m2 * m2) - 3.0 AS excess_kurtosis,
       CAST(n AS DOUBLE) / 6.0 * ((m3 / sqrt(m2 * m2 * m2))
         * (m3 / sqrt(m2 * m2 * m2))
         + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0) AS jb_stat
FROM m
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test — the nonparametric significance twin of
# theil_sen_trend's slope: S = sum over month pairs i<j of
# sign(y_j - y_i) on the monthly revenue series, tie-corrected
# variance, and the standardized Z. The standard "is this series
# actually trending" gate for KPI monitoring (no normality or
# linearity assumed).
#
# Exactness: monthly revenues are exact decimal sums cast once to
# double; sign comparisons and the integer pair sums are exact; the
# only float ops are the final /18 and the sqrt in Z. Scale: the
# O(n^2) pair join runs over the MONTH ladder (bounded by the
# calendar, not the data — ~84 rows at any SF), coalesced to one
# partition; everything upstream is one map-side-combinable groupBy.
# ---------------------------------------------------------------------------
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("m")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,10)"))
            .cast("string")
            .cast("double")
            .alias("y")
        )
        .coalesce(1)
    )
    a = monthly.select(F.col("m").alias("mi"), F.col("y").alias("yi"))
    b = monthly.select(F.col("m").alias("mj"), F.col("y").alias("yj"))
    s = (
        a.join(b, F.col("mi") < F.col("mj"))
        .agg(
            F.sum(
                F.when(F.col("yj") > F.col("yi"), 1)
                .when(F.col("yj") < F.col("yi"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    ties = (
        monthly.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1.0) * (2.0 * n + 5.0)
        - F.col("tie_term").cast("double")
    ) / 18.0
    sd = F.sqrt(var_s)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return s.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("bigint").alias("n_periods"),
        F.col("s_stat").cast("bigint").alias("s_stat"),
        var_s.alias("var_s"),
        z.alias("z"),
    )


ORACLE["mann_kendall_trend"] = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS m,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS VARCHAR)
              AS DOUBLE) AS y
  FROM orders GROUP BY 1
), s AS (
  SELECT SUM(CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS s_stat
  FROM monthly a JOIN monthly b ON a.m < b.m
), ties AS (
  SELECT COUNT(*) AS n_distinct,
         SUM(t * (t - 1) * (2 * t + 5)) AS tie_term,
         SUM(t) AS n
  FROM (SELECT y, COUNT(*) AS t FROM monthly GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n_periods, CAST(s_stat AS BIGINT) AS s_stat,
       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
          * (2.0 * CAST(n AS DOUBLE) + 5.0)
        - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s,
       CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
              / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                * (2.0 * CAST(n AS DOUBLE) + 5.0)
                - CAST(tie_term AS DOUBLE)) / 18.0)
            WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
              / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                * (2.0 * CAST(n AS DOUBLE) + 5.0)
                - CAST(tie_term AS DOUBLE)) / 18.0)
            ELSE 0.0 END AS z
FROM s, ties
"""


# ---------------------------------------------------------------------------
# Grubbs outlier statistic — per return flag, G = max deviation from
# the mean in standard-deviation units, the classic single-outlier
# screen on grouped measures. No per-row float aggregation anywhere:
# the extreme deviation is max(mean - min, max - mean) from the
# group's exact MIN/MAX, and mean/sd come from exact decimal power
# sums (l_quantity is integer-valued), so every output is a
# deterministic function of exact aggregates. One combinable groupBy.
# ---------------------------------------------------------------------------
def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(_D38)).cast("string").cast("double").alias("s"),
        F.sum((x * x).cast(_D38)).cast("string").cast("double").alias("q"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    sd = F.sqrt((F.col("q") - F.col("s") * F.col("s") / n) / (n - 1.0))
    g = F.greatest(mean - F.col("mn"), F.col("mx") - mean) / sd
    return agg.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        mean.alias("mean"),
        sd.alias("sd"),
        g.alias("g_stat"),
    ).orderBy("l_returnflag")


ORACLE["grubbs_test"] = """
WITH agg AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
              AS VARCHAR) AS DOUBLE) AS q,
         MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       s / CAST(n AS DOUBLE) AS mean,
       sqrt((q - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sd,
       GREATEST(s / CAST(n AS DOUBLE) - mn, mx - s / CAST(n AS DOUBLE))
         / sqrt((q - s * s / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1.0)) AS g_stat
FROM agg
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test — is the daily revenue series random
# around its median, or does it cluster (momentum / regime) /
# alternate (overcorrection)? The classic distribution-free
# randomness screen that complements mann_kendall_trend (monotone
# drift) with run-structure sensitivity.
#
# Exactness: daily revenues are exact decimal sums; the median is the
# exact order statistic (average of the two middle values for even
# n); run boundaries are integer sums of boolean lag-compares (order
# within the window is the date order, and integer addition is
# order-free anyway); mu/sigma/z are deterministic double arithmetic
# on integer counts with one sqrt. Rows equal to the median are
# excluded (standard practice). Scale: the series is
# calendar-bounded (~2.4k rows); the lag window over it is the same
# pinned single-partition payload-free exchange as the other ladder
# queries.
# ---------------------------------------------------------------------------
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,10)"))
        .cast("string")
        .cast("double")
        .alias("y")
    )
    wrank = W.orderBy("y", "d")
    ranked = daily.select(
        "d", "y", F.row_number().over(wrank).alias("r")
    )
    nrow = daily.agg(F.count(F.lit(1)).alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(nrow))
        .filter(
            (F.col("r") * 2 == F.col("n") + 1)
            | (F.col("r") * 2 == F.col("n"))
            | (F.col("r") * 2 == F.col("n") + 2)
        )
        .agg((F.sum("y") / F.count(F.lit(1))).alias("med"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("med"))
        .select("d", (F.col("y") > F.col("med")).cast("int").alias("s"))
    )
    wlag = W.orderBy("d")
    runs = signed.select(
        "s", F.lag("s").over(wlag).alias("prev")
    ).agg(
        F.sum(
            (F.col("prev").isNull() | (F.col("s") != F.col("prev"))).cast(
                "int"
            )
        ).alias("n_runs"),
        F.sum("s").alias("n1"),
        F.sum((F.col("s") == 0).cast("int")).alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return runs.select(
        F.col("n_runs").cast("bigint").alias("n_runs"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        mu.alias("expected_runs"),
        ((F.col("n_runs").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


ORACLE["runs_test"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10))) AS VARCHAR)
              AS DOUBLE) AS y
  FROM orders GROUP BY 1
), ranked AS (
  SELECT d, y, ROW_NUMBER() OVER (ORDER BY y, d) AS r,
         COUNT(*) OVER () AS n
  FROM daily
), med AS (
  SELECT SUM(y) / COUNT(*) AS med FROM ranked
  WHERE (r * 2 = n + 1) OR (r * 2 = n) OR (r * 2 = n + 2)
), signed AS (
  SELECT d, CAST(y > med AS INT) AS s
  FROM daily, med WHERE y <> med
), runs AS (
  SELECT SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
           AS n_runs,
         SUM(s) AS n1, SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS n2
  FROM (SELECT s, LAG(s) OVER (ORDER BY d) AS prev FROM signed)
)
SELECT CAST(n_runs AS BIGINT) AS n_runs, CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below,
       2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
         / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0 AS expected_runs,
       (CAST(n_runs AS DOUBLE)
          - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
       / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
              / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))) AS z
FROM runs
"""


# ---------------------------------------------------------------------------
# Cohen's d effect sizes — for every pair of return-flag groups, the
# standardized mean difference in l_quantity with the pooled standard
# deviation: the practical-significance companion to anova_oneway's
# F (which says "some group differs" without saying by how much).
#
# Exactness: group moments come from the same exact decimal power
# sums as anova_oneway; the pair frame is a broadcast self-join of
# the |flags|-row aggregate; every output is deterministic double
# arithmetic with one sqrt. Nothing shuffles beyond the one
# combinable groupBy.
# ---------------------------------------------------------------------------
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(_D38)).cast("string").cast("double").alias("s"),
        F.sum((x * x).cast(_D38)).cast("string").cast("double").alias("q"),
    )
    a = g.select(
        F.col("l_returnflag").alias("flag_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = g.select(
        F.col("l_returnflag").alias("flag_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("q").alias("qb"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    mean_a = F.col("sa") / na
    mean_b = F.col("sb") / nb
    ss_a = F.col("qa") - F.col("sa") * F.col("sa") / na
    ss_b = F.col("qb") - F.col("sb") * F.col("sb") / nb
    pooled = F.sqrt((ss_a + ss_b) / (na + nb - 2.0))
    return (
        a.join(F.broadcast(b), F.col("flag_a") < F.col("flag_b"))
        .select(
            "flag_a",
            "flag_b",
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            ((mean_a - mean_b) / pooled).alias("cohens_d"),
        )
        .orderBy("flag_a", "flag_b")
    )


ORACLE["cohens_d"] = """
WITH g AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
              AS VARCHAR) AS DOUBLE) AS q
  FROM lineitem GROUP BY l_returnflag
)
SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       (a.s / CAST(a.n AS DOUBLE) - b.s / CAST(b.n AS DOUBLE))
         / sqrt(((a.q - a.s * a.s / CAST(a.n AS DOUBLE))
                 + (b.q - b.s * b.s / CAST(b.n AS DOUBLE)))
                / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE) - 2.0))
         AS cohens_d
FROM g a JOIN g b ON a.l_returnflag < b.l_returnflag
ORDER BY flag_a, flag_b
"""


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) test — are the group variances
# equal? The gate anova_oneway's equal-variance assumption needs: a
# one-way ANOVA F computed on z = |x - median_g| instead of x.
#
# Scale + exactness via the BOUNDED-DOMAIN LADDER (the spearman/
# mann-whitney discipline): l_quantity has <= |domain| distinct
# values, so per-group medians come from cumulative counts over the
# (flag, value) ladder — never a rank() window partitioned by a
# 3-value key (parallelism 3 at any cluster size, the round-8
# spearman defect). The ladder also carries the rest: z is exact in
# halves, z^2 in quarters, and the weighted power sums S_g = sum
# cnt*z, Q_g = sum cnt*z^2 are exact decimal folds over ~150 ladder
# rows. The F statistic is then the anova_oneway arithmetic on exact
# aggregates, cross-group term folded in flag order.
# ---------------------------------------------------------------------------
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ladder = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = W.partitionBy("l_returnflag").orderBy("l_quantity").rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy("l_returnflag")
    cum = ladder.select(
        "l_returnflag",
        "l_quantity",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n_g"),
    )
    # median order statistics from the ladder: the value at rank
    # floor((n+1)/2) and at rank floor(n/2)+1 is the one whose
    # cumulative span covers that rank — two filters, no row sort
    r1 = F.floor((F.col("n_g") + 1) / 2)
    r2 = F.floor(F.col("n_g") / 2) + 1
    v1 = cum.filter(
        (F.col("cum") >= r1) & (F.col("cum") - F.col("cnt") < r1)
    ).select("l_returnflag", F.col("l_quantity").alias("v1"))
    v2 = cum.filter(
        (F.col("cum") >= r2) & (F.col("cum") - F.col("cnt") < r2)
    ).select("l_returnflag", F.col("l_quantity").alias("v2"))
    medians = v1.join(v2, "l_returnflag").select(
        "l_returnflag",
        ((F.col("v1") + F.col("v2")) / 2.0).alias("med"),
    )
    z = F.abs(F.col("l_quantity") - F.col("med"))
    zl = ladder.join(F.broadcast(medians), "l_returnflag").select(
        "l_returnflag",
        "cnt",
        z.alias("z"),
    )
    grp = zl.groupBy("l_returnflag").agg(
        F.sum("cnt").alias("n_g"),
        F.sum((F.col("cnt") * F.col("z")).cast(_D38))
        .cast("string")
        .cast("double")
        .alias("s_g"),
        F.sum((F.col("cnt") * F.col("z") * F.col("z")).cast(_D38))
        .cast("string")
        .cast("double")
        .alias("q_g"),
    )
    folded = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "l_returnflag",
                    (
                        F.col("s_g") * F.col("s_g")
                        / F.col("n_g").cast("double")
                    ).alias("t"),
                    F.col("s_g").alias("s"),
                    F.col("q_g").alias("q"),
                )
            )
        ).alias("terms"),
    ).select(
        "k",
        "n",
        F.expr(
            "aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.t)"
        ).alias("ssn"),
        F.expr(
            "aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.s)"
        ).alias("s"),
        F.expr(
            "aggregate(terms, CAST(0 AS DOUBLE), (acc, x) -> acc + x.q)"
        ).alias("q"),
    )
    kk = F.col("k").cast("double")
    nn = F.col("n").cast("double")
    ssb = F.col("ssn") - F.col("s") * F.col("s") / nn
    ssw = F.col("q") - F.col("ssn")
    return folded.select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_total"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        (ssb / (kk - 1.0) / (ssw / (nn - kk))).alias("f_stat"),
    )


ORACLE["levene_test"] = """
WITH ladder AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, l_quantity, cnt,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n_g
  FROM ladder
), v1 AS (
  SELECT l_returnflag, l_quantity AS v1 FROM cum
  WHERE cum >= FLOOR((n_g + 1) / 2) AND cum - cnt < FLOOR((n_g + 1) / 2)
), v2 AS (
  SELECT l_returnflag, l_quantity AS v2 FROM cum
  WHERE cum >= FLOOR(n_g / 2) + 1 AND cum - cnt < FLOOR(n_g / 2) + 1
), medians AS (
  SELECT v1.l_returnflag, (v1 + v2) / 2.0 AS med
  FROM v1 JOIN v2 ON v2.l_returnflag = v1.l_returnflag
), grp AS (
  SELECT ladder.l_returnflag, SUM(cnt) AS n_g,
         CAST(CAST(SUM(CAST(cnt * ABS(l_quantity - med) AS DECIMAL(38,10)))
              AS VARCHAR) AS DOUBLE) AS s_g,
         CAST(CAST(SUM(CAST(cnt * ABS(l_quantity - med)
              * ABS(l_quantity - med) AS DECIMAL(38,10))) AS VARCHAR)
              AS DOUBLE) AS q_g
  FROM ladder JOIN medians ON medians.l_returnflag = ladder.l_returnflag
  GROUP BY 1
), folded AS (
  SELECT COUNT(*) AS k, SUM(n_g) AS n,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'l_returnflag': l_returnflag,
                           't': s_g * s_g / CAST(n_g AS DOUBLE),
                           's': s_g, 'q': q_g})),
           x -> x.t)), (acc, v) -> acc + v) AS ssn,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'l_returnflag': l_returnflag,
                           't': s_g * s_g / CAST(n_g AS DOUBLE),
                           's': s_g, 'q': q_g})),
           x -> x.s)), (acc, v) -> acc + v) AS s,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(
           list_sort(list({'l_returnflag': l_returnflag,
                           't': s_g * s_g / CAST(n_g AS DOUBLE),
                           's': s_g, 'q': q_g})),
           x -> x.q)), (acc, v) -> acc + v) AS q
  FROM grp
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_total,
       ssn - s * s / CAST(n AS DOUBLE) AS ss_between,
       q - ssn AS ss_within,
       (ssn - s * s / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
         / ((q - ssn) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
         AS f_stat
FROM folded
"""
