"""Golden-file lineage tests (SURVEY.md §5 rebuild plan item b): for each
query, the normalized physical graph and the column→base-column map are
asserted against committed JSON goldens — the asserted version of the
reference's printed trees. Regenerate with the snippet in tests/goldens/
(any intentional change to lineage output must update the goldens).
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entrymod
from hive_lineage_spark.hook import LineageTracker

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
GOLDENS = sorted(f[:-5] for f in os.listdir(GOLDEN_DIR) if f.endswith(".json"))


@pytest.mark.parametrize("name", GOLDENS)
def test_lineage_matches_golden(spark, name):
    # Goldens pin the COLD canonical plan. Earlier tests may have warmed
    # the session-level persisted index frames (dd02 postings / dd03
    # bands / dd05 signatures); lineage then resolves through the
    # InMemoryRelation and prints the equivalent-but-different cached
    # tree. Cache-aware lineage has its own tests (test_lineage.py);
    # here we drop the caches so the capture is order-independent.
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    qs = entrymod.queries()
    df = qs[name](spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name=name)
    doc = ql.result.to_dict()
    doc.pop("notes", None)
    got = {
        "lineage": doc,
        "normalizedGraph": ql.normalized.tree_string(details=False) if ql.normalized else None,
    }
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        want = json.load(f)
    assert got["lineage"] == want["lineage"]
    assert got["normalizedGraph"] == want["normalizedGraph"]
