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
        if rec is None or rec.get("digest") != source_digest(fn, ors.get(name, "")):
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


def test_stale_prefix_is_age_weighted_then_oracled_first():
    """Within the stale prefix: longest-waiting queries first (their
    pending_since / stale-evidence round ascending); within the same
    age, oracled before rows-only; never-seen queries (no record)
    last. Round-4 VERDICT item 3."""
    qs, ors, st, stale = _staleness()

    def age(n):
        rec = st.get(n)
        if rec is None:
            return 1 << 30
        return rec.get("pending_since", rec.get("round", 1 << 30))

    names = [n for n in qs if n in stale]
    keys = [(age(n), 0 if n in ors else 1, n) for n in names]
    assert keys == sorted(keys)


def test_state_file_is_well_formed_and_covers_only_registry_queries():
    qs, _, st, _ = _staleness()
    assert st, "verification_state.json missing or empty"
    for name, rec in st.items():
        assert name in qs, f"state records unknown query {name}"
        if rec["mode"] == "pending":
            assert isinstance(rec["pending_since"], int)
            assert rec["pending_since"] >= 1
            continue
        assert isinstance(rec["round"], int) and rec["round"] >= 1
        assert isinstance(rec["digest"], str) and len(rec["digest"]) == 16
        int(rec["digest"], 16)
        assert rec["mode"] in ("oracled", "rows_only")


def _q_waited_two_rounds(spark, sf_dir):  # pragma: no cover - key only
    return None


def _q_brand_new(spark, sf_dir):  # pragma: no cover - key only
    return None


def _q_fresh_batch_a(spark, sf_dir):  # pragma: no cover - key only
    return None


def test_old_waiter_outranks_alphabetically_earlier_newcomers():
    """The exact round-4 starvation case: a query pending since round
    3 whose name sorts AFTER a big batch of round-4 newcomers must
    still take the first verification slot; a brand-new query with no
    record at all sorts behind every recorded waiter."""
    queries = {
        "unpivot_measures": _q_waited_two_rounds,  # u > a,f alphabetically
        "aaa_new_this_round": _q_fresh_batch_a,
        "fresh_batch_a": _q_fresh_batch_a,
        "brand_new_no_record": _q_brand_new,
    }
    oracles = dict.fromkeys(queries, "SELECT 1")
    state = {
        "unpivot_measures": {"pending_since": 3, "mode": "pending"},
        "aaa_new_this_round": {"pending_since": 4, "mode": "pending"},
        "fresh_batch_a": {"pending_since": 4, "mode": "pending"},
        # brand_new_no_record: absent on purpose
    }
    order = verification_order(queries, oracles, state=state)
    assert order == [
        "unpivot_measures",
        "aaa_new_this_round",
        "fresh_batch_a",
        "brand_new_no_record",
    ]


def test_stale_green_evidence_ages_from_its_recorded_round():
    """A query verified in round 2 whose source then changed competes
    with pending queries at age 2 — ahead of a round-3 waiter."""
    queries = {
        "waiter_r3": _q_waited_two_rounds,
        "edited_after_r2": _q_brand_new,
    }
    oracles = dict.fromkeys(queries, "SELECT 1")
    state = {
        "waiter_r3": {"pending_since": 3, "mode": "pending"},
        "edited_after_r2": {
            "round": 2,
            "digest": "0" * 16,  # never matches the live source
            "mode": "oracled",
        },
    }
    order = verification_order(queries, oracles, state=state)
    assert order == ["edited_after_r2", "waiter_r3"]


def test_order_function_is_deterministic_and_total():
    qs, ors = get_queries(), get_oracles()
    a = verification_order(qs, ors)
    b = verification_order(qs, ors)
    assert a == b
    assert sorted(a) == sorted(qs)


def _write_mod(path, helper_body):
    path.write_text(
        "CONST_EXPR = 'md5(x)'\n"
        f"def helper(v):\n    return {helper_body}\n"
        "def mid(v):\n    return helper(v) + 1\n"
        "def q_fake(spark, sf_dir):\n"
        "    from importlib import import_module  # foreign: ignored\n"
        "    return mid(3), CONST_EXPR\n"
    )


def test_digest_covers_transitive_helpers(tmp_path, monkeypatch):
    """Round-10 VERDICT digest blind spot: editing a helper BELOW the
    q_ body (even two levels down, hash60_sql-style) must change the
    query's digest and re-queue it — while editing an unreferenced
    sibling must NOT."""
    import importlib.util
    import linecache
    import sys

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans import (
        verification as V,
    )

    mod_file = tmp_path / "fake_helpers_mod.py"
    _write_mod(mod_file, "v * 2")

    def load():
        linecache.clearcache()
        # the digest only expands package-local helpers; give the fake
        # module a package-local name
        pkg = V._PKG_PREFIX.rstrip(".")
        name = f"{pkg}.operators.fake_helpers_mod"
        spec = importlib.util.spec_from_file_location(name, mod_file)
        m = importlib.util.module_from_spec(spec)
        sys.modules.pop(name, None)
        spec.loader.exec_module(m)
        return m

    m1 = load()
    labels = [p.split("\x01")[0] for p in V._helper_parts(m1.q_fake)]
    assert "mid" in labels and "helper" in labels and "CONST_EXPR" in labels
    d1 = V.source_digest(m1.q_fake, "SELECT 1")
    # editing the two-levels-down helper changes the digest
    _write_mod(mod_file, "v * 3")
    m2 = load()
    d2 = V.source_digest(m2.q_fake, "SELECT 1")
    assert d2 != d1
    # ... and a stale-vs-state comparison would re-queue it
    state = {"fake": {"round": 5, "digest": d1, "mode": "oracled"}}
    order = verification_order(
        {"fake": m2.q_fake}, {"fake": "SELECT 1"}, state=state
    )
    assert order == ["fake"]  # stale prefix (only member, but key(0...))
    # identical source reproduces the digest (stability)
    _write_mod(mod_file, "v * 2")
    m3 = load()
    assert V.source_digest(m3.q_fake, "SELECT 1") == d1


def test_real_registry_digests_reach_known_helpers():
    """The live chains the VERDICT named: minhash/text queries must
    carry their hashing/normalization helpers in the digest, directly
    or through the baked oracle text."""
    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans import (
        verification as V,
    )

    qs = get_queries()
    labels = {
        name: {p.split("\x01")[0] for p in V._helper_parts(qs[name])}
        for name in ("leakfree_split", "dedup_minhash_signatures")
    }
    assert "hash60" in labels["leakfree_split"]  # q -> split_assign -> hash60
    assert "minhash_signatures_md5" in labels["dedup_minhash_signatures"]
    # hash60_sql edits flow through the ORACLE text itself (f-string
    # baked at import), which source_digest already covers
    ors = get_oracles()
    assert "substr(md5(" in ors["dedup_minhash_signatures"].lower()


def test_digest_disambiguates_same_named_helpers(tmp_path, monkeypatch):
    """Two DISTINCT same-named helpers reachable from one query (its
    own module's and another module's, pulled in through a transitive
    function) must BOTH contribute to the digest — deduping fragments
    by bare name would silently drop the second, re-opening the
    round-10 blind spot for edits to it."""
    import importlib.util
    import linecache
    import sys

    from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.plans import (
        verification as V,
    )

    pkg = V._PKG_PREFIX.rstrip(".")
    b_name = f"{pkg}.operators.fake_collide_b"
    a_name = f"{pkg}.operators.fake_collide_a"
    b_file = tmp_path / "fake_collide_b.py"
    a_file = tmp_path / "fake_collide_a.py"

    def write_b(body):
        b_file.write_text(
            f"def helper(v):\n    return {body}\n"
            "def other_mid(v):\n    return helper(v) + 1\n"
        )

    a_file.write_text(
        f"from {b_name} import other_mid\n"
        "def helper(v):\n    return v * 2\n"
        "def q_fake(spark, sf_dir):\n"
        "    return helper(3), other_mid(4)\n"
    )

    def load():
        linecache.clearcache()
        mods = []
        for name, path in ((b_name, b_file), (a_name, a_file)):
            spec = importlib.util.spec_from_file_location(name, path)
            m = importlib.util.module_from_spec(spec)
            sys.modules[name] = m
            spec.loader.exec_module(m)
            mods.append(m)
        for name in (a_name, b_name):
            sys.modules.pop(name, None)
        return mods[1]

    write_b("v * 5")
    m1 = load()
    parts = V._helper_parts(m1.q_fake)
    helper_srcs = {
        p.split("\x01", 1)[1] for p in parts if p.split("\x01")[0] == "helper"
    }
    assert len(helper_srcs) == 2  # BOTH distinct same-named helpers present
    d1 = V.source_digest(m1.q_fake, "")
    # editing the OTHER module's same-named helper changes the digest
    write_b("v * 7")
    m2 = load()
    assert V.source_digest(m2.q_fake, "") != d1
    # identical source reproduces the digest (stability)
    write_b("v * 5")
    m3 = load()
    assert V.source_digest(m3.q_fake, "") == d1
