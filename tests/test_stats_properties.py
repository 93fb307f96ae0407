"""Property/invariant tests for operators/stats.py — the structural
guarantees that must hold on ANY data, checked on the fixtures."""

from __future__ import annotations

import math

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    QUERIES,
)


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    def run(name):
        return QUERIES[name](spark, sf_dir).collect()

    return run


def test_benford_shares_form_a_distribution(rows):
    out = rows("benford_profile")
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    assert all(0.0 < r.expected < 0.302 for r in out)
    chi2 = {r.chi2_total for r in out}
    assert len(chi2) == 1 and chi2.pop() >= 0.0


def test_mad_is_bounded_by_range_and_outliers_by_n(rows, spark, sf_dir):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from pyspark.sql import functions as F

    bounds = {
        r.event_type: r
        for r in read_fixture(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows("mad_outliers"):
        b = bounds[r.event_type]
        assert b.lo <= r.med <= b.hi
        assert 0.0 <= r.mad <= (b.hi - b.lo)
        assert 0 <= r.n_outliers <= b.n
        assert r.n == b.n


def test_concurrent_peak_bounds(rows, spark, sf_dir):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from pyspark.sql import functions as F

    counts = {
        r.event_type: r.n
        for r in read_fixture(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = rows("concurrent_peak")
    assert {r.event_type for r in out} == set(counts)
    for r in out:
        # at least one session is active at its own start; never more
        # than every session of the type at once
        assert 1 <= r.peak <= counts[r.event_type]


def test_partition_checksums_are_order_independent(spark, sf_dir):
    """The core promise: reshuffling the physical row order must not
    change a single checksum."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.stats import (
        q_partition_checksums,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    base = {
        (r.month, r.n_rows, r.checksum)
        for r in q_partition_checksums(spark, sf_dir).collect()
    }
    # recompute over a repartitioned/reordered clone of the input
    import ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.stats as stats_mod

    orig = stats_mod._t
    try:
        stats_mod._t = lambda sp, sd, name: read_fixture(
            sp, sd, name
        ).repartition(7)
        again = {
            (r.month, r.n_rows, r.checksum)
            for r in q_partition_checksums(spark, sf_dir).collect()
        }
    finally:
        stats_mod._t = orig
    assert again == base


def test_ewma_lies_within_value_range_and_weights_sum(rows, spark, sf_dir):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.stats import (
        EWMA_K,
    )
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from pyspark.sql import functions as F

    bounds = {
        r.user_id: r
        for r in read_fixture(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows("ewma_value"):
        assert 1 <= r.n_used <= EWMA_K
        b = bounds[r.user_id]
        # a convex combination cannot leave the hull (tolerance for
        # the decimal quantization of the terms)
        assert b.lo - 1e-6 <= r.ewma <= b.hi + 1e-6


def test_burstiness_in_theoretical_range(rows):
    for r in rows("interarrival_burstiness"):
        assert -1.0 <= r.burstiness < 1.0
        assert r.std_gap >= 0.0 and r.mean_gap > 0.0


def test_weighted_median_is_a_data_value(rows, spark, sf_dir):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )

    li = read_fixture(spark, sf_dir, "lineitem")
    prices = {
        r.l_returnflag: set()
        for r in li.select("l_returnflag").distinct().collect()
    }
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        prices[r.l_returnflag].add(r.l_extendedprice)
    for r in rows("weighted_median"):
        assert r.wmedian in prices[r.l_returnflag]


def test_pearson_r_bounded(rows):
    for r in rows("corr_profile"):
        assert -1.0 - 1e-12 <= r.pearson_r <= 1.0 + 1e-12


def test_chi_square_nonnegative_and_dof(rows):
    out = rows("chi_square_assoc")
    assert all(r.chi2 >= 0.0 and r.dof == (5 - 1) * (3 - 1) for r in out)
    assert len(out) == 15


def test_collocation_lift_positive_and_min_count(rows):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.stats import (
        MIN_COLLOC,
    )

    for r in rows("collocation_lift"):
        assert r.lift > 0.0
        assert r.c_xy >= MIN_COLLOC
        assert r.c_x >= r.c_xy and r.c_y >= r.c_xy


def test_ngram_novelty_shares_bounded(rows):
    for r in rows("ngram_novelty"):
        assert 0.0 <= r.min_novelty <= r.mean_novelty <= r.max_novelty <= 1.0
        assert r.n_docs > 0


def test_distinctive_terms_structure(rows):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.text import (
        DISTINCT_TERMS_TOPK,
    )

    per_source: dict = {}
    for r in rows("distinctive_terms"):
        assert r.lift > 0.0
        assert r.c_t >= r.c_ts  # marginal dominates the cell
        per_source.setdefault(r.source, []).append(r.rank)
    for src, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert len(ranks) <= DISTINCT_TERMS_TOPK


def test_longest_streak_bounded_by_user_events(rows, spark, sf_dir):
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources.readers import (
        read_fixture,
    )
    from pyspark.sql import functions as F

    counts = {
        r.user_id: r.n
        for r in read_fixture(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = rows("longest_streak")
    assert {r.user_id for r in out} == set(counts)
    for r in out:
        assert 1 <= r.longest_streak <= counts[r.user_id]


def test_graph_jaccard_in_unit_interval(rows):
    for r in rows("graph_jaccard_link"):
        assert 0.0 <= r.jaccard <= 1.0
        # common neighbors can't exceed either endpoint's OTHER edges
        assert r.common <= min(r.deg_a, r.deg_b) - 1 or r.common == 0


def test_hard_negative_positive_tops_same_label(rows):
    for r in rows("hard_negatives"):
        assert -1.0 <= r.negative_cos <= 1.0 + 1e-9
        assert -1.0 <= r.positive_cos <= 1.0 + 1e-9
        assert r.positive_id != r.hard_negative_id
