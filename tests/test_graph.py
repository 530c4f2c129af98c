"""Graph-engine unit tests — the port of the reference's GraphNodeTest
(``hivehook/src/test/scala/.../lineage/GraphNodeTest.scala:20-43``), which
only printed; here the same semantics are asserted: transform_up rewrites
with changed args, replaces child sequences, memoizes shared DAG nodes.
"""

from __future__ import annotations

from hive_lineage_spark.graph import GNode, node
from hive_lineage_spark.rules import (
    normalize,
    remove_exec_artifacts,
    remove_partial_aggregates,
    splice_out,
)


def test_transform_up_rewrites_bottom_up():
    tree = node("A", (node("B", (node("C"),)),))
    renamed = tree.transform_up(
        lambda n: GNode(kind=n.kind.lower(), detail=n.detail, children=n.children, nid=n.nid)
    )
    assert [n.kind for n in renamed.walk()] == ["a", "b", "c"]


def test_transform_up_memoizes_shared_nodes():
    shared = node("Shared")
    root = node("Root", (node("L", (shared,)), node("R", (shared,))))
    seen: list[int] = []

    def rule(n: GNode) -> GNode:
        seen.append(n.nid)
        return n

    root.transform_up(rule)
    # the shared node is visited by the rule exactly once (DAG memoization,
    # ≈ GraphNode.scala:48-50)
    assert seen.count(shared.nid) == 1


def test_transform_up_preserves_dag_sharing():
    shared = node("Scan")
    root = node("Root", (node("L", (shared,)), node("R", (shared,))))
    out = root.transform_up(
        lambda n: GNode(kind=n.kind + "!", detail=n.detail, children=n.children, nid=n.nid)
    )
    left_child = out.children[0].children[0]
    right_child = out.children[1].children[0]
    assert left_child is right_child  # still one instance after rewrite


def test_splice_out_removes_matching_unary_nodes():
    tree = node("Agg", (node("Exchange", (node("Scan"),)),))
    out = tree.transform_up(splice_out(lambda n: n.kind == "Exchange"))
    assert [n.kind for n in out.walk()] == ["Agg", "Scan"]


def test_splice_keeps_matching_nodes_without_single_child():
    tree = node("Join", (node("Exchange"), node("Scan")))  # Exchange leaf: keep
    out = tree.transform_up(splice_out(lambda n: n.kind == "Exchange"))
    assert [n.kind for n in out.walk()] == ["Join", "Exchange", "Scan"]


def test_remove_partial_aggregates_keeps_final():
    tree = node(
        "HashAggregate",
        (
            node(
                "ShuffleExchange",
                (node("HashAggregate", (node("Scan"),), mode="Partial"),),
            ),
        ),
        mode="Final",
    )
    out = normalize(tree)
    kinds = [n.kind for n in out.walk()]
    assert kinds == ["HashAggregate", "Scan"]
    assert dict(out.detail)["mode"] == "Final"


def test_normalize_strips_stacked_artifacts_to_fixpoint():
    tree = node(
        "AdaptiveSparkPlan",
        (
            node(
                "WholeStageCodegen",
                (node("InputAdapter", (node("AQEShuffleRead", (node("ShuffleExchange", (node("Scan"),)),)),)),),
            ),
        ),
    )
    out = normalize(tree)
    assert [n.kind for n in out.walk()] == ["Scan"]


def test_tree_string_marks_revisited_dag_nodes():
    shared = node("Scan", table="t")
    root = node("Join", (node("Filter", (shared,)), shared))
    s = root.tree_string()
    assert s.count("Scan\n") + s.count("Scan ...") >= 2
    assert "Scan ..." in s  # second visit elided (Node.scala:63-97)


def test_rules_do_not_touch_unrelated_nodes():
    tree = node("Project", (node("Filter", (node("Scan"),)),))
    assert tree.transform_up(remove_exec_artifacts) is not None
    out = normalize(tree)
    assert [n.kind for n in out.walk()] == ["Project", "Filter", "Scan"]


def test_remove_partial_agg_rule_direct():
    t = node("Final", (node("HashAggregate", (node("Scan"),), mode="Partial"),))
    out = t.transform_up(remove_partial_aggregates)
    assert [n.kind for n in out.walk()] == ["Final", "Scan"]
