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


def last_certified_round(query: str, repo_root: str = REPO_ROOT) -> int | None:
    """Highest round with a green driver row for this query, or None."""
    best = None
    for label, greens in certified_by_round(repo_root).items():
        if query in greens and label[1:].isdigit():
            n = int(label[1:])
            best = n if best is None else max(best, n)
    return best


def _git(args: list[str], repo_root: str = REPO_ROOT) -> str:
    import subprocess

    return subprocess.run(
        ["git", "-C", repo_root, *args], capture_output=True, text=True
    ).stdout


def _cert_commit_epoch(round_n: int, repo_root: str = REPO_ROOT) -> int | None:
    """Committer epoch of the commit that ADDED CORRECTNESS_r{N}.json —
    the moment that round's certification became repo state."""
    out = _git(
        ["log", "--diff-filter=A", "--format=%ct", "-1", "--",
         f"CORRECTNESS_r{round_n:02d}.json"],
        repo_root,
    ).strip()
    return int(out) if out.isdigit() else None


def _def_range(fn) -> tuple[str, int, int] | None:
    """(repo-relative file, first line, last line) of a query callable's
    definition — the blame range that decides staleness."""
    import inspect
    import os as _os

    try:
        fn = inspect.unwrap(fn)
        src, start = inspect.getsourcelines(fn)
        path = _os.path.relpath(inspect.getsourcefile(fn), REPO_ROOT)
    except (OSError, TypeError):
        return None
    return path, start, start + len(src) - 1


def _newest_blame_epoch(path: str, lo: int, hi: int, repo_root: str = REPO_ROOT) -> int | None:
    """Newest committer epoch among the blamed lines of [lo, hi]."""
    out = _git(["blame", "-L", f"{lo},{hi}", "--porcelain", "--", path], repo_root)
    epochs = [
        int(line.split()[1])
        for line in out.splitlines()
        if line.startswith("committer-time ")
    ]
    return max(epochs, default=None)


def changed_since_certified(repo_root: str = REPO_ROOT) -> list[dict]:
    """For every registered query: its last green round and whether the
    lines of its defining function changed (per git blame) AFTER that
    round's CORRECTNESS file landed. The rotation policy consumes this:
    window slots go first to queries whose source changed since their
    last green driver row (a green row certifies the code as it was
    THEN, not as it is now), then to the longest-uncertified."""
    import sys

    sys.path.insert(0, repo_root)
    from hive_lineage_spark.operators import all_queries

    rows: list[dict] = []
    cert_epoch_cache: dict[int, int | None] = {}
    for name, fn in all_queries().items():
        last = last_certified_round(name, repo_root)
        rng = _def_range(fn)
        entry = {
            "query": name,
            "last_round": last,
            "def": f"{rng[0]}:{rng[1]}-{rng[2]}" if rng else None,
            "changed": None,
        }
        if last is not None and rng is not None:
            if last not in cert_epoch_cache:
                cert_epoch_cache[last] = _cert_commit_epoch(last, repo_root)
            cert_ts = cert_epoch_cache[last]
            newest = _newest_blame_epoch(*rng, repo_root)
            if cert_ts is not None and newest is not None:
                entry["changed"] = newest > cert_ts
        rows.append(entry)
    rows.sort(key=lambda r: (r["changed"] is not True, r["last_round"] or 0))
    return rows


def changed_debt(window: set[str], rows: list[dict] | None = None,
                 repo_root: str = REPO_ROOT) -> list[str]:
    """Queries whose defining source changed AFTER their last green
    driver row and that hold no slot in the current certification
    window — the round-13 sk05 lesson: a green row certifies the code
    as it was then, so a post-certification edit reopens the debt and
    the op must rotate back in the round it changes. Pure function of
    (rows, window) so the guard test can redden a synthetic case
    without touching git state."""
    if rows is None:
        rows = changed_since_certified(repo_root)
    return sorted(
        r["query"] for r in rows if r["changed"] is True and r["query"] not in window
    )


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
    if "--changed" in sys.argv:
        print("\nchanged-since-certified (rotation priority order):")
        for r in changed_since_certified():
            if r["changed"]:
                mark = "CHANGED since last green row"
            elif r["changed"] is False:
                mark = "unchanged"
            else:
                mark = "no data"
            inwin = " [in window]" if r["query"] in window else ""
            print(
                f"  {r['query']}: last green r{r['last_round'] or 0:02d}, "
                f"{mark}{inwin}  ({r['def']})"
            )


if __name__ == "__main__":
    main()
