"""End-to-end LLM corpus-prep pipeline: funnel consistency between
the one-pass flag aggregation, the survivors frame, and the snapshot
sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.llm_prep import (
    llm_prep,
    q_llm_corpus_prep,
    survivors,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
    snaptable as st,
)


def test_funnel_monotone_and_consistent_with_survivors(spark, sf_dir):
    row = q_llm_corpus_prep(spark, sf_dir).collect()[0]
    counts = [
        row.n_corpus,
        row.n_after_dedup,
        row.n_after_quality,
        row.n_after_decontam,
        row.n_after_mixture,
    ]
    assert counts == sorted(counts, reverse=True)  # each gate only drops
    assert counts[0] > 0
    # the funnel's terminal count IS the survivors frame
    assert survivors(spark, sf_dir).count() == row.n_after_mixture
    # every gate must actually bite on the fixture (non-vacuous funnel)
    assert row.n_after_mixture < row.n_corpus


def test_llm_prep_lands_versioned_snapshot(spark, sf_dir, tmp_path):
    t = str(tmp_path / "prepared_corpus")
    v1, funnel = llm_prep(spark, sf_dir, t)
    assert v1 == 1
    got = st.read_snapshot(spark, t)
    assert got.count() == funnel["n_after_mixture"]
    assert set(got.columns) == {"doc_id", "text", "source"}
    # rerun = new auditable version, same visible state
    v2, _ = llm_prep(spark, sf_dir, t)
    assert v2 == 2
    assert st.read_snapshot(spark, t).count() == funnel["n_after_mixture"]
    assert st.read_snapshot(spark, t, version=1).count() == funnel["n_after_mixture"]
    # survivors are deduped: no two rows share a normalized digest
    n = got.count()
    assert (
        got.select(F.md5(F.expr("trim(regexp_replace(lower(text), ' +', ' '))")))
        .distinct()
        .count()
        == n
    )
