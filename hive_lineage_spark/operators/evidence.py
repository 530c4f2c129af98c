"""Evidence-leg kill switch — the production/oracle mode split.

Several sketch/ANN operators carry an EXACT "evidence" computation next
to their approximate result (sk01/sk04's ``countDistinct``, sk02's exact
word histogram, sk03's gram-level pair join, ss19/ss20's brute-force
``in_exact`` ground truth). Those legs exist so the DuckDB oracle can
certify the sketch arithmetic end-to-end at test scale — but they are
precisely the corpus-keyed exchanges the sketches exist to AVOID at
100 TB. A deployment drops them.

This module makes that mode a real, tested code path instead of a
docstring claim: each op takes ``evidence: bool | None = None``;
``None`` resolves from the ``SPARK_GRAFT_EVIDENCE`` environment variable
(default ON, so the registry/oracle contract is unchanged — the driver
never sets it). ``evidence=False`` (or ``SPARK_GRAFT_EVIDENCE=0``)
removes the exact legs from the PLAN (plan-pinned in
``tests/test_evidence.py``: the corpus-keyed exchange is absent and the
surviving columns are value-equal to oracle mode), and the evidence
columns from the schema.

Ops where the flag intentionally does NOT exist:

- ``ss09_ann_recall`` — the op IS the evidence: recall@K against the
  exact baseline is its entire output. Production runs it offline per
  corpus snapshot, not per serving query; turning its exact leg off
  would delete the operator.
- ``ss18_ann_matryoshka`` — ``coarse_rank`` is a byproduct of the
  coarse stage the search runs anyway; there is no extra exchange to
  drop.
"""

from __future__ import annotations

import os

ENV_FLAG = "SPARK_GRAFT_EVIDENCE"


_OFF_VALUES = {"0", "false", "off", "no"}


def evidence_enabled(evidence: bool | None = None) -> bool:
    """Resolve an op's ``evidence`` kwarg: explicit argument wins,
    otherwise the env flag (default ON — oracle mode). Every common
    falsey spelling turns the legs off — a deploy setting
    ``SPARK_GRAFT_EVIDENCE=false`` must not silently pay oracle-mode
    cost at scale."""
    if evidence is not None:
        return bool(evidence)
    return os.environ.get(ENV_FLAG, "1").strip().lower() not in _OFF_VALUES
