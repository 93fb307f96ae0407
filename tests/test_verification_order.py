"""The registry's driver-verification prefix must be derived
mechanically from verification_state.json — never-verified or
stale-evidence queries register first, verified ones last (oldest
round first). Round-3 VERDICT item 2."""

from __future__ import annotations

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.registry import (
    get_oracles,
    get_queries,
)
from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans.verification import (
    load_state,
    source_digest,
    verification_order,
)


def _staleness():
    qs, ors, st = get_queries(), get_oracles(), load_state()
    stale = set()
    for name, fn in qs.items():
        rec = st.get(name)
        if rec is None or rec["digest"] != source_digest(fn, ors.get(name, "")):
            stale.add(name)
    return qs, ors, st, stale


def test_stale_queries_form_the_registry_prefix():
    qs, _, _, stale = _staleness()
    names = list(qs)
    assert set(names[: len(stale)]) == stale, (
        "registry prefix must be exactly the stale/never-verified set"
    )


def test_verified_suffix_ordered_oldest_evidence_first():
    qs, _, st, stale = _staleness()
    names = list(qs)
    verified_rounds = [st[n]["round"] for n in names if n not in stale]
    assert verified_rounds == sorted(verified_rounds)


def test_within_stale_prefix_oracled_queries_come_first():
    qs, ors, _, stale = _staleness()
    names = [n for n in qs if n in stale]
    seen_rows_only = False
    for n in names:
        if n not in ors:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracled stale query {n} sorted after a rows-only one"
            )


def test_state_file_is_well_formed_and_covers_only_registry_queries():
    qs, _, st, _ = _staleness()
    assert st, "verification_state.json missing or empty"
    for name, rec in st.items():
        assert name in qs, f"state records unknown query {name}"
        assert isinstance(rec["round"], int) and rec["round"] >= 1
        assert isinstance(rec["digest"], str) and len(rec["digest"]) == 16
        int(rec["digest"], 16)
        assert rec["mode"] in ("oracled", "rows_only")


def test_order_function_is_deterministic_and_total():
    qs, ors = get_queries(), get_oracles()
    a = verification_order(qs, ors)
    b = verification_order(qs, ors)
    assert a == b
    assert sorted(a) == sorted(qs)
