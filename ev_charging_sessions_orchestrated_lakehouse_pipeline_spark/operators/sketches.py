"""Count-min sketch: mergeable sub-linear frequency summaries.

The engine already surfaces Spark's built-in sketch family
(``approx_count_distinct`` HLL++, ``approx_percentile`` t-digest,
``freqItems`` — see analytics.py); this module adds the one classic
sketch Spark lacks as a public aggregate, the COUNT-MIN SKETCH
(Cormode & Muthukrishnan 2005), built from first principles as a
pure DataFrame aggregation so it is portable, mergeable, and
oracle-checkable:

- The sketch is a D x W counter matrix. Each input row increments
  one bucket per hash row: ``(d, hash_d(key) mod W) += 1``. As a
  DataFrame that is ONE map-side-combinable groupBy over D*W bounded
  keys — at 100 TB the shuffle carries at most D*W*partitions
  partial counts, independent of row count, and two sketches merge
  by adding counters (the property that makes CMS the standard
  frequency summary for streaming/distributed settings).
- Point estimate for a key = min over rows d of its D counters.
  Guarantee: estimate >= true count always (counters only
  over-count), and <= true + eps*N with probability over the hash
  family; the over-count comes from collisions.
- Hashes are the portable seeded md5 family
  (functions/hashing.py:hash60) — byte-identical in DuckDB, so the
  ENTIRE sketch (all D*W counters) and every estimate hash-match the
  oracle exactly; the queries below are fully value-oracled, not
  contract-oracled.

``q_cms_heavy_hitters`` surfaces the end-to-end use: sketch the
events stream's user activity, estimate every candidate user from
the sketch alone, rank, and report estimate vs exact count with the
one-sided error bound asserted per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import hash60, hash60_sql

ORACLE: dict[str, str] = {}

CMS_D = 4
CMS_W = 256
CMS_TOPK = 20


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_fixture

    return read_fixture(spark, sf_dir, name)


def cms_build(keys: DataFrame, key_col: str) -> DataFrame:
    """The D x W counter matrix ``(d, bucket, cnt)`` of a key stream.
    One combinable shuffle over <= D*W group keys."""
    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(hash60(F.col(key_col), seed=d), F.lit(CMS_W)).alias(
                    "bucket"
                ),
            )
            for d in range(CMS_D)
        ]
    )
    return (
        keys.select(F.explode(probes).alias("p"))
        .select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(candidates: DataFrame, key_col: str, sketch: DataFrame) -> DataFrame:
    """Adds ``cms_est``: min over the D probed counters. The sketch
    is tiny (<= D*W rows) and broadcast; estimation never shuffles
    the candidate side."""
    probed = candidates.select(
        key_col,
        *[
            F.pmod(hash60(F.col(key_col), seed=d), F.lit(CMS_W)).alias(
                f"b{d}"
            )
            for d in range(CMS_D)
        ],
    )
    out = probed
    for d in range(CMS_D):
        s = sketch.filter(F.col("d") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("cnt").alias(f"c{d}")
        )
        out = out.join(F.broadcast(s), f"b{d}", "left")
    return out.select(
        key_col,
        F.least(
            *[F.coalesce(F.col(f"c{d}"), F.lit(0)) for d in range(CMS_D)]
        ).alias("cms_est"),
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top users by sketch-estimated event count: estimate from the
    CMS alone, rank on the estimate (exact tie-break by user), and
    report the exact count alongside with the one-sided guarantee
    ``cms_est >= exact`` asserted per row."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user")
    )
    sketch = cms_build(ev, "user")
    exact = ev.groupBy("user").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(exact, "user", sketch)
    return (
        est.join(exact, "user")
        .select(
            F.col("user").cast("bigint").alias("user_id"),
            "cms_est",
            "exact_cnt",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_undercounts"),
        )
        .orderBy(F.col("cms_est").desc(), "user_id")
        .limit(CMS_TOPK)
    )


def _cms_oracle() -> str:
    probe_rows = " UNION ALL ".join(
        f"SELECT user, {d} AS d, "
        f"{hash60_sql('user', seed=d)} % {CMS_W} AS bucket FROM keys"
        for d in range(CMS_D)
    )
    return f"""
WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS user FROM events),
probes AS ({probe_rows}),
sketch AS (
  SELECT d, bucket, COUNT(*) AS cnt FROM probes GROUP BY d, bucket
),
exact AS (SELECT user, COUNT(*) AS exact_cnt FROM keys GROUP BY user),
est AS (
  SELECT e.user, MIN(s.cnt) AS cms_est
  FROM exact e
  JOIN probes p ON p.user = e.user
  JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
  GROUP BY e.user
)
SELECT CAST(est.user AS BIGINT) AS user_id, cms_est, exact_cnt,
       cms_est >= exact_cnt AS never_undercounts
FROM est JOIN exact ON exact.user = est.user
ORDER BY cms_est DESC, user_id
LIMIT {CMS_TOPK}
"""


ORACLE["cms_heavy_hitters"] = _cms_oracle()
