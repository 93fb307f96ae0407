"""Property-based tests (hypothesis) for the DQ framework: the
row-rule annotator and the verification metrics must agree with a
plain-Python recomputation on arbitrary data, including nulls,
negatives, and duplicates — the edge classes Deequ semantics hinge
on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.quality import (
    Check,
    CheckLevel,
    RowRule,
    VerificationSuite,
    annotate_rows,
    split_good_bad,
)

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(rows=ROWS)
@_SETTINGS
def test_annotate_and_split_agree_with_python(spark, rows):
    df = spark.createDataFrame(rows, "x int, y double")
    rules = [
        RowRule("x_null", F.col("x").isNull()),
        RowRule("y_negative", F.col("y") < 0),
    ]
    annotated = annotate_rows(df, rules).collect()
    assert len(annotated) == len(rows)
    for r in annotated:
        expected = []
        if r.x is None:
            expected.append("x_null")
        if r.y is not None and r.y < 0:
            expected.append("y_negative")
        assert list(r.quarantine_reason) == expected, r

    good, bad = split_good_bad(annotate_rows(df, rules), persist=False)
    assert good.count() + bad.count() == len(rows)


@given(rows=ROWS)
@_SETTINGS
def test_verification_metrics_agree_with_python(spark, rows):
    df = spark.createDataFrame(rows, "x int, y double")
    check = (
        Check(CheckLevel.ERROR, "prop")
        .has_completeness("x", lambda v: True)
        .is_non_negative("y")
        .is_unique("x")
    )
    result = VerificationSuite().on_data(df).add_check(check).run()
    by_name = result.to_dict()

    n = len(rows)
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    assert abs(
        by_name["completeness(x)"]["metric"] - sum(x is not None for x in xs) / n
    ) < 1e-12
    # Deequ compliance: nulls coalesce to the passing side
    assert by_name["non_negative(y)"]["passed"] == all(
        y is None or y >= 0 for y in ys
    )
    # Deequ uniqueness: values occurring exactly once / total rows
    uniq = sum(1 for x in xs if xs.count(x) == 1)
    assert abs(by_name["uniqueness(x)"]["metric"] - uniq / n) < 1e-12


_TOKEN = st.sampled_from(["a", "bb", "ccc", "dd", "e", "spark", "x1"])
_DOCS = st.lists(
    st.lists(_TOKEN, min_size=1, max_size=25).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=_DOCS)
@_SETTINGS
def test_token_diversity_matches_python_reference(spark, texts):
    """Fuzz the HOF diversity fold against a direct Python
    computation: exact n_tokens/n_distinct and float-close ttr /
    Simpson (the fold itself is deterministic; vs-Python closeness is
    a semantic check, bit-exactness is the ORACLE's contract)."""
    import ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.text as text_mod
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.operators.text import (
        q_token_diversity,
    )

    probe = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    orig = text_mod._docs
    text_mod._docs = lambda s, d: probe
    try:
        got = {r.doc_id: r for r in q_token_diversity(spark, "unused").collect()}
    finally:
        text_mod._docs = orig
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n, k = len(toks), len(set(toks))
        simpson = 1.0 - sum((toks.count(c) / n) ** 2 for c in set(toks))
        r = got[i]
        assert (r.n_tokens, r.n_distinct) == (n, k), t
        assert abs(r.ttr - k / n) < 1e-12, t
        assert abs(r.simpson - simpson) < 1e-12, t
