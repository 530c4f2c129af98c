"""Certification ledger: which registered queries have EVER had a green
driver CORRECTNESS row, computed mechanically from CORRECTNESS_r*.json
instead of hand-tracked window comments.

The driver certifies the first 50 of ``_DRIVER_PRIORITY`` each round;
rotation debt accumulates silently if a newly registered query never
makes it into the window. ``never_certified()`` is consumed by
tests/test_queries.py::test_no_silent_rotation_debt, which fails when a
registered query has no driver row and is not in the current window
(i.e. not queued for certification this round).

CLI: ``python tools/certified.py`` prints the never-certified set and
per-round coverage counts.
"""

from __future__ import annotations

import glob
import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    """A driver row counts as certification only when fully green: rows
    and schema match, no error, and the value hash matches when the
    driver computed one (rows-only checks carry hash_match=None)."""
    return (
        row.get("err") is None
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and row.get("hash_match") is not False
    )


def certified_by_round(repo_root: str = REPO_ROOT) -> dict[str, list[str]]:
    """round label (e.g. 'r07') → sorted list of green query names."""
    out: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        label = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        try:
            rows = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(rows, dict):
            continue
        out[label] = sorted(q for q, row in rows.items() if isinstance(row, dict) and _green(row))
    return out


def ever_certified(repo_root: str = REPO_ROOT) -> set[str]:
    return {q for greens in certified_by_round(repo_root).values() for q in greens}


def never_certified(registered: set[str], repo_root: str = REPO_ROOT) -> set[str]:
    """Registered queries with zero green driver rows across all rounds."""
    return registered - ever_certified(repo_root)


def latest_round(repo_root: str = REPO_ROOT) -> int:
    """Highest round number with a CORRECTNESS_r*.json on disk (0 if
    none). ROTATION_QUEUE entries stamped with an older round have
    missed their rotation — test_no_silent_rotation_debt fails them."""
    rounds = [
        int(label[1:])
        for label in certified_by_round(repo_root)
        if label[1:].isdigit()
    ]
    return max(rounds, default=0)


def main() -> None:
    import sys

    sys.path.insert(0, REPO_ROOT)
    from hive_lineage_spark.operators import _DRIVER_PRIORITY, all_queries

    registered = set(all_queries())
    by_round = certified_by_round()
    for label, greens in by_round.items():
        print(f"{label}: {len(greens)} green driver rows")
    ever = ever_certified()
    never = sorted(never_certified(registered))
    window = set(_DRIVER_PRIORITY[:50])
    print(f"\nregistered: {len(registered)}  ever-certified: {len(registered & ever)}")
    print(f"never-certified: {len(never)}")
    for q in never:
        status = "IN current window (queued)" if q in window else "NOT in window — rotation debt"
        print(f"  {q}: {status}")


if __name__ == "__main__":
    main()
