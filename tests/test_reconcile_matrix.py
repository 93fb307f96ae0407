"""Exhaustive policy-matrix pin for concurrent-commit reconciliation
(sources/snaptable._try_rebase).

The directed tests in tests/test_snaptable.py exercise the flagship
scenarios one by one; this file closes the space: EVERY ordered
(winner, loser) pair over {append, partition overwrite, DELETE
rewrite, DELETE via deletion vectors, OPTIMIZE} x {same partition,
disjoint partitions} — 41 deterministic interleavings. For each pair
the expected outcome is re-derived here from first principles
(Delta/Iceberg conflict semantics), deliberately NOT by consulting
snaptable's _REBASE_POLICY, so a policy regression cannot hide by
changing both sides:

* the loser COMMITS (auto-rebase, no caller retry) iff its scope is
  logically disjoint from the winner's effect — and then the final
  table must equal the pure-Python serial application winner->loser
  on the row multiset (rebased != merely "did not crash");
* otherwise the loser raises ConcurrentCommit and the table must be
  EXACTLY the winner-only state (no half-applied rebase).

Interleaving is deterministic and thread-free: the loser's _publish
is intercepted to run the whole winner op first (both computed
against the same parent), so the loser always collides and exercises
the rebase machinery.
"""

from __future__ import annotations

import itertools

import pytest

from ev_charging_sessions_orchestrated_lakehouse_pipeline_spark.sources import (
    snaptable as st,
)

from tests.test_snaptable import _interleave, _mk_part_table

SCHEMA = "id int, g string, v int"

#: partial-delete thresholds: each deletes 2 of its partition's 4
#: rows, so DELETE always touches (but never empties) exactly one file
THR = {"A": 20, "B": 60}

PARENT = [(i, "A" if i < 4 else "B", i * 10) for i in range(8)]


def _run_op(spark, table: str, op: str, part: str | None) -> None:
    if op == "app":
        st.append(
            spark.createDataFrame([(900, part, 5)], SCHEMA), table
        )
    elif op == "ovw":
        st.overwrite_partitions(
            spark.createDataFrame([(500, part, 9)], SCHEMA), table
        )
    elif op == "del":
        st.delete_where(
            spark, table, [("g", "=", part), ("v", "<", THR[part])]
        )
    elif op == "dvdel":
        st.delete_where(
            spark,
            table,
            [("g", "=", part), ("v", "<", THR[part])],
            use_dv=True,
        )
    elif op == "opt":
        st.optimize(spark, table)
    else:  # pragma: no cover - parametrization typo guard
        raise AssertionError(op)


def _model(rows: list[tuple], op: str, part: str | None) -> list[tuple]:
    """Row-multiset semantics of each op, independent of snaptable."""
    if op == "app":
        return rows + [(900, part, 5)]
    if op == "ovw":
        return [r for r in rows if r[1] != part] + [(500, part, 9)]
    if op in ("del", "dvdel"):
        return [r for r in rows if not (r[1] == part and r[2] < THR[part])]
    return list(rows)  # optimize: content-identical by contract


def _expect_commit(
    wop: str, wpart: str | None, lop: str, lpart: str | None
) -> bool:
    """First-principles conflict matrix (winner committed first; can
    the loser's commit be proven logically disjoint from file paths,
    file identity, and DV deltas alone?)."""
    if lop == "app":
        # blind append: adds fresh files, removes nothing, reads nothing
        return True
    if lop == "ovw":
        # partition-scoped: safe unless the winner rewrote the whole
        # table (OPTIMIZE replaced the files this commit removes) or
        # touched the overwritten partition (files OR its file's DVs)
        return wop != "opt" and wpart != lpart
    if lop == "opt":
        # content-preserving rewrite of the parent's files: safe only
        # under a winner that left every parent file (and its DV) alone
        return wop == "app"
    # del / dvdel: predicate-scoped — file paths can't prove a
    # winner's new rows fall outside the predicate, so any winner
    # that ADDS files conflicts; only a DV-delete on another
    # partition's file is provably disjoint
    return wop == "dvdel" and wpart != lpart


def _cases():
    parted = ("app", "ovw", "del", "dvdel")
    cases = []
    for wop, lop in itertools.product(parted, parted):
        for rel in ("same", "disj"):
            cases.append((wop, "A", lop, "A" if rel == "same" else "B"))
    for op in parted:  # OPTIMIZE has no partition scope: one case each
        cases.append(("opt", None, op, "A"))
        cases.append((op, "A", "opt", None))
    cases.append(("opt", None, "opt", None))
    return cases


def _fmt(c):
    wop, wpart, lop, lpart = c
    return f"W={wop}({wpart or '*'})-L={lop}({lpart or '*'})"


@pytest.mark.parametrize("case", _cases(), ids=_fmt)
def test_reconcile_policy_matrix(spark, tmp_path, monkeypatch, case):
    wop, wpart, lop, lpart = case
    t = _mk_part_table(spark, tmp_path)

    _interleave(monkeypatch, lambda: _run_op(spark, t, wop, wpart))
    expected = _expect_commit(wop, wpart, lop, lpart)
    if expected:
        _run_op(spark, t, lop, lpart)
        assert st.current_version(t) == 3  # create + winner + rebased loser
        # audit trail: the loser's commit names the parent it was
        # ORIGINALLY computed against before the auto-rebase
        assert st._read_manifest(t, 3).get("rebased_from") == 1
        want = sorted(_model(_model(PARENT, wop, wpart), lop, lpart))
    else:
        with pytest.raises(st.ConcurrentCommit):
            _run_op(spark, t, lop, lpart)
        assert st.current_version(t) == 2  # winner only, no half-rebase
        want = sorted(_model(PARENT, wop, wpart))
    got = sorted(
        (r.id, r.g, r.v) for r in st.read_snapshot(spark, t).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Stale-parent commits (parent_version): an op computed against an
# OLDER snapshot must collide and revalidate even when its publish
# doesn't race — the head simply moved during the caller's compute
# window. merge_into's whole merge (target read, dup probe, id
# allocation) is such a window.
# ---------------------------------------------------------------------------


def test_overwrite_partitions_stale_parent_rebases_disjoint(spark, tmp_path):
    t = _mk_part_table(spark, tmp_path)
    st.append(spark.createDataFrame([(900, "B", 5)], SCHEMA), t)  # v2
    v = st.overwrite_partitions(
        spark.createDataFrame([(500, "A", 9)], SCHEMA), t, parent_version=1
    )
    assert v == 3
    assert st._read_manifest(t, 3).get("rebased_from") == 1
    got = sorted((r.id, r.g, r.v) for r in st.read_snapshot(spark, t).collect())
    want = sorted(
        [r for r in PARENT if r[1] == "B"] + [(900, "B", 5), (500, "A", 9)]
    )
    assert got == want


def test_overwrite_partitions_stale_parent_conflicts_same_partition(
    spark, tmp_path
):
    t = _mk_part_table(spark, tmp_path)
    st.append(spark.createDataFrame([(900, "A", 5)], SCHEMA), t)  # v2, into A
    with pytest.raises(st.ConcurrentCommit):
        st.overwrite_partitions(
            spark.createDataFrame([(500, "A", 9)], SCHEMA), t, parent_version=1
        )
    assert st.current_version(t) == 2  # the appended row survived


def test_overwrite_table_stale_parent_conflicts_with_any_add(spark, tmp_path):
    t = _mk_part_table(spark, tmp_path)
    st.append(spark.createDataFrame([(900, "B", 5)], SCHEMA), t)  # v2
    with pytest.raises(st.ConcurrentCommit):
        st.overwrite_table(
            spark.createDataFrame([(1, "A", 1)], SCHEMA), t, parent_version=1
        )
    assert st.current_version(t) == 2


def _merge_source(spark, rows):
    return spark.createDataFrame(rows, "id int, g string, v int")


def _capture_and_commit_winner(monkeypatch, spark, winner_rows):
    """Wrap overwrite_partitions so a winner append lands INSIDE
    merge_into's compute window — after the merge computed against its
    entry head, before its commit call — and capture the
    parent_version merge_into threads down."""
    orig = st.overwrite_partitions
    seen: dict = {}

    def wrapper(df, table, **kw):
        seen.update(kw)
        if winner_rows is not None:
            st.append(_merge_source(spark, winner_rows), table)
        return orig(df, table, **kw)

    monkeypatch.setattr(st, "overwrite_partitions", wrapper)
    return seen


def test_merge_into_commits_against_entry_head(spark, tmp_path, monkeypatch):
    """merge_into must pass the head it READ (and computed everything
    against) down to the commit, not let it be re-read."""
    t = _mk_part_table(spark, tmp_path)
    seen = _capture_and_commit_winner(monkeypatch, spark, None)
    st.merge_into(spark, t, _merge_source(spark, [(0, "A", 999)]), ["id"])
    assert seen.get("parent_version") == 1


def test_merge_into_mid_window_append_disjoint_rebases(
    spark, tmp_path, monkeypatch
):
    """A winner appending into a partition the merge does NOT rewrite
    lands mid-window: the merge's stale-parent commit collides,
    rebases, and BOTH changes survive."""
    t = _mk_part_table(spark, tmp_path)
    _capture_and_commit_winner(monkeypatch, spark, [(900, "B", 5)])
    st.merge_into(spark, t, _merge_source(spark, [(0, "A", 999)]), ["id"])
    got = sorted((r.id, r.g, r.v) for r in st.read_snapshot(spark, t).collect())
    assert (900, "B", 5) in got  # winner's append not silently dropped
    assert (0, "A", 999) in got  # merge's update applied
    assert st._read_manifest(t, 3).get("rebased_from") == 1


def test_merge_into_mid_window_append_same_partition_conflicts(
    spark, tmp_path, monkeypatch
):
    """A winner appending into a partition the merge REWRITES lands
    mid-window: silently committing would drop the winner's row from
    the rewritten partition (the lost update), so the merge must
    raise instead."""
    t = _mk_part_table(spark, tmp_path)
    _capture_and_commit_winner(monkeypatch, spark, [(900, "A", 5)])
    with pytest.raises(st.ConcurrentCommit):
        st.merge_into(spark, t, _merge_source(spark, [(0, "A", 999)]), ["id"])
    got = sorted((r.id, r.g, r.v) for r in st.read_snapshot(spark, t).collect())
    assert (900, "A", 5) in got  # winner-only state, nothing half-applied
    assert (0, "A", 0) in got  # merge's update NOT applied


def test_merge_into_mid_window_id_allocation_conflicts(
    spark, tmp_path, monkeypatch
):
    """On a row-tracked table, a winner that ALLOCATES row ids inside
    the merge window must conflict — the merge pre-assigned fresh ids
    off the stale high-water mark, and rebasing would re-issue the
    winner's ids (the CDF/identity uniqueness invariant)."""
    t = _mk_part_table(spark, tmp_path)
    st.enable_row_tracking(t)  # v2
    _capture_and_commit_winner(monkeypatch, spark, [(900, "B", 5)])
    with pytest.raises(st.ConcurrentCommit, match="row ids"):
        st.merge_into(
            spark,
            t,
            _merge_source(spark, [(0, "A", 999), (42, "A", 1)]),
            ["id"],
        )


def test_two_concurrent_merges_disjoint_partitions_both_commit(
    spark, tmp_path
):
    """The reference's real multi-job shape (two Glue runs MERGE-ing
    different event_date partitions, gold_etl.py:156, which Iceberg
    absorbs with retry-with-revalidation and Glue otherwise guards
    with max_concurrent_runs=1): two genuinely concurrent merge_into
    writers on DISJOINT partitions, barrier-forced to compute against
    the same parent, must BOTH commit with no caller retry."""
    import threading

    t = _mk_part_table(spark, tmp_path)
    barrier = threading.Barrier(2, timeout=120)
    lock = threading.Lock()
    n = [0]

    def gated(table, version, manifest):
        with lock:
            n[0] += 1
            k = n[0]
        if k <= 2:
            barrier.wait()

    errs: list[BaseException] = []

    def run(rows):
        try:
            st.merge_into(spark, t, _merge_source(spark, rows), ["id"])
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    st.pre_publish_hook = gated
    try:
        threads = [
            threading.Thread(target=run, args=(rows,))
            for rows in ([(0, "A", 999), (100, "A", 1)], [(4, "B", 888)])
        ]
        for x in threads:
            x.start()
        for x in threads:
            x.join(timeout=300)
    finally:
        st.pre_publish_hook = None
    assert errs == []
    assert st.current_version(t) == 3  # create + both merges
    got = sorted((r.id, r.g, r.v) for r in st.read_snapshot(spark, t).collect())
    want = sorted(
        [(0, "A", 999), (100, "A", 1), (4, "B", 888)]
        + [r for r in PARENT if r[0] not in (0, 4)]
    )
    assert got == want
