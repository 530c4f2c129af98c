"""Query-correctness tests vs the DuckDB oracle at sf0.001 (fast) —
the same comparison the driver's gate performs at sf0.01
(tools/check_oracle.py runs the full set; this keeps pytest quick).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from hive_lineage_spark.oracle import duckdb_fingerprint, spark_fingerprint

SF_SMOKE = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_impl_for_oracle():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sfp = spark_fingerprint(QUERIES[name](spark, SF_SMOKE))
    dfp = duckdb_fingerprint(duck, ORACLES[name])
    assert sfp == dfp, f"{name}: spark={sfp} duck={dfp}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_return_rows(spark, name):
    assert QUERIES[name](spark, SF_SMOKE).count() > 0


def test_driver_window_invariants():
    """The external contract: exactly 50 priority entries, every one
    oracle-backed, ordering preserved by all_queries() — a rotation
    mistake here silently costs driver certification rows."""
    from hive_lineage_spark.operators import _DRIVER_PRIORITY

    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50
    assert list(QUERIES)[:50] == _DRIVER_PRIORITY
    missing = [q for q in _DRIVER_PRIORITY if q not in ORACLES]
    assert not missing, f"in-window queries without oracles: {missing}"


def test_readme_query_count_matches_registry():
    """README advertises the registry size in prose ('All N queries
    are value-hash oracle-checked'); it went stale at 121 when the
    122nd query landed. Pin every 'N queries' mention to the registry
    so the count can only change together with the code."""
    import os
    import re

    readme = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    counts = {int(n) for n in re.findall(r"\b(\d+) queries\b", readme)}
    assert counts == {len(QUERIES)}, (
        f"README mentions query counts {sorted(counts)}; registry has {len(QUERIES)}"
    )


def test_no_silent_rotation_debt():
    """Every registered query must either have a green driver
    CORRECTNESS row from some past round (tools/certified.py computes
    this mechanically from CORRECTNESS_r*.json) or sit in the current
    50-slot window (queued for certification this round). A query that
    is neither is rotation debt the hand-written window comments used
    to track — now it fails here instead of accumulating. Queries added
    after a round's window seals go in ROTATION_QUEUE (the declared
    next-round rotation, name -> round that queued it); the queue must
    stay honest too — no already-certified or unregistered names, and
    no entry may survive past one subsequent CORRECTNESS round (the
    round-9 dead round sat on an 8-entry queue for a full round while
    this test stayed green; queue entries now self-expire so a no-op
    round turns the suite red)."""
    from hive_lineage_spark.operators import _DRIVER_PRIORITY, ROTATION_QUEUE
    from tools.certified import latest_round, never_certified

    never = never_certified(set(QUERIES))
    debt = never - set(_DRIVER_PRIORITY[:50]) - set(ROTATION_QUEUE)
    assert not debt, (
        f"registered queries with no driver certification, no window "
        f"slot, and no rotation-queue entry: {sorted(debt)}"
    )
    stale = [q for q in ROTATION_QUEUE if q not in QUERIES or q not in never]
    assert not stale, f"ROTATION_QUEUE entries unregistered or already certified: {stale}"
    current = latest_round()
    expired = [
        (q, queued) for q, queued in ROTATION_QUEUE.items() if current > queued
    ]
    assert not expired, (
        f"ROTATION_QUEUE entries queued at round N must rotate into the "
        f"window before CORRECTNESS_r(N+1) lands; latest driver round is "
        f"r{current:02d} but these are older: {expired}"
    )
    # stronger than expiry (which only reddens AFTER the wasted round):
    # once the queueing round's CORRECTNESS has landed, the entry must
    # ALREADY hold a window slot — queue membership alone must not
    # satisfy this test for a full round (the r11 dd19/dd20 lesson:
    # both sat queued through the r12 window build and would have gone
    # uncertified a second round had the window not been edited)
    window = set(_DRIVER_PRIORITY[:50])
    overdue = [
        (q, queued)
        for q, queued in ROTATION_QUEUE.items()
        if current >= queued and q not in window
    ]
    assert not overdue, (
        f"queued in a round whose CORRECTNESS already landed but still "
        f"not in _DRIVER_PRIORITY[:50]: {overdue}"
    )
    # the round-13 sk05 lesson: never-certified debt was guarded but an
    # op whose SOURCE changed after its last green row slipped through —
    # the green row certifies the code as it was then, not as it is
    # now. tools.certified.changed_since_certified blames each query's
    # defining lines against the epoch its last CORRECTNESS round
    # landed; any changed op must hold a window slot THE ROUND IT
    # CHANGES.
    from tools.certified import changed_debt

    stale_certified = changed_debt(window)
    assert not stale_certified, (
        f"source changed after last green driver row but no window "
        f"slot this round (tools/certified.py --changed): {stale_certified}"
    )


def test_changed_debt_reddens_synthetic_case():
    """changed_debt must report a changed-since-certified op that lacks
    a window slot (the guard test_no_silent_rotation_debt relies on
    this — a helper that silently returned [] would green the suite
    over real debt, exactly the r13 sk05 escape)."""
    from tools.certified import changed_debt

    rows = [
        {"query": "zz98_changed_outside", "last_round": 3, "changed": True},
        {"query": "zz97_changed_inside", "last_round": 3, "changed": True},
        {"query": "zz96_unchanged", "last_round": 3, "changed": False},
        {"query": "zz95_unknown", "last_round": None, "changed": None},
    ]
    window = {"zz97_changed_inside", "zz96_unchanged"}
    assert changed_debt(window, rows=rows) == ["zz98_changed_outside"]
    # in-window changed ops and unchanged ops are not debt
    assert changed_debt({"zz98_changed_outside", "zz97_changed_inside"}, rows=rows) == []
