"""Graph-normalization rules — port of the reference's transform rules
(``hivehook/.../lineage/transform/rules/RemoveOperatorsRule.scala``).

The reference strips Hive-MR execution artifacts from the lineage graph:
shuffle/file sinks (``RemoveSinkOperatorsRule``, :36-43), temp-file
rescans between stages (``RemoveIntermediateTableScansRule``, :45-54) and
map-side partial aggregates (``RemoveMapSideGroupByRule``, :56-68). The
Spark analogs of those artifacts are Exchange nodes, AQE/codegen wrapper
nodes, and partial-mode HashAggregates; after collapsing them the physical
graph matches the logical operator graph — which is the point of the
reference's normalization.

``AttachHashSinkToMapJoinRule`` has no Spark analog: BroadcastExchange is
already a proper child of BroadcastHashJoin (SURVEY.md §4.2) — noted here
for parity, intentionally absent.
"""

from __future__ import annotations

from collections.abc import Callable

from .graph import GNode

Rule = Callable[[GNode], GNode]


def splice_out(pred: Callable[[GNode], bool]) -> Rule:
    """Generic collapse: replace any child matching ``pred`` with that
    child's own (single) child — the reference's abstract RemoveOperatorsRule
    splice (``RemoveOperatorsRule.scala:11-34``). Matching nodes with zero
    or 2+ children are left alone (nothing to splice to)."""

    def rule(n: GNode) -> GNode:
        changed = False
        new_children: list[GNode] = []
        for c in n.children:
            if pred(c) and len(c.children) == 1:
                new_children.append(c.children[0])
                changed = True
            else:
                new_children.append(c)
        return n.with_children(tuple(new_children)) if changed else n

    return rule


# Spark execution artifacts ≈ the reference's REDUCESINK/FILESINK
# (RemoveSinkOperatorsRule): shuffle & broadcast exchanges, shuffle reads,
# AQE stage wrappers, codegen wrappers, write-file wrappers.
_ARTIFACT_KINDS = {
    "ShuffleExchange",
    "BroadcastExchange",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "TableCacheQueryStage",
    "ResultQueryStage",
    "ReusedExchange",
    "WholeStageCodegen",
    "InputAdapter",
    "AdaptiveSparkPlan",
    "ColumnarToRow",
    "RowToColumnar",
    "WriteFiles",
}


def is_exec_artifact(n: GNode) -> bool:
    return n.kind in _ARTIFACT_KINDS


remove_exec_artifacts: Rule = splice_out(is_exec_artifact)


# ≈ RemoveMapSideGroupByRule (modes HASH/PARTIAL1/PARTIAL2/PARTIALS →
# spliced; only MERGEPARTIAL/COMPLETE/FINAL kept) — Spark's partial modes
# are Partial / PartialMerge.
def _is_partial_agg(n: GNode) -> bool:
    return n.kind in ("HashAggregate", "SortAggregate", "ObjectHashAggregate") and dict(
        n.detail
    ).get("mode") in ("Partial", "PartialMerge")


remove_partial_aggregates: Rule = splice_out(_is_partial_agg)


# ≈ RemoveIntermediateTableScansRule: scans of temp/intermediate paths
# (no table, no partitions) — in the rebuild these appear when stitching
# multi-query graphs through scratch directories.
def _is_temp_scan(n: GNode) -> bool:
    d = dict(n.detail)
    return n.kind == "Scan" and not d.get("table") and len(n.children) == 1


remove_intermediate_scans: Rule = splice_out(_is_temp_scan)


def chain(*rules: Rule) -> Rule:
    def rule(n: GNode) -> GNode:
        for r in rules:
            n = r(n)
        return n

    return rule


def normalize(root: GNode) -> GNode:
    """The reference's PostExecHook normalization pipeline
    (``PostExecHook.scala:65-71``) in Spark terms. Rules are applied
    repeatedly until fixpoint because splicing can stack artifacts
    (e.g. WholeStageCodegen over InputAdapter over Exchange)."""
    prev = None
    rule = chain(remove_exec_artifacts, remove_partial_aggregates, remove_intermediate_scans)
    while prev is None or root.tree_string() != prev:
        prev = root.tree_string()
        root = root.transform_up(rule)
    # top-of-tree artifacts have no parent to splice from — peel them
    while root.kind in _ARTIFACT_KINDS and len(root.children) == 1:
        root = root.children[0]
    return root
