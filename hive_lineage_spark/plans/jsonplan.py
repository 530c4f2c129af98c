"""Parse Catalyst's ``TreeNode.toJSON`` output into Python plan trees.

``toJSON`` emits one flat JSON array per tree, nodes in pre-order, each
carrying ``num-children``; expression-valued fields are lists of such
pre-order arrays. This module rebuilds both levels. It is the rebuild's
analog of the reference's qinfo wrappers around live Hive plan objects
(``hivehook/.../qinfo/QueryInfo.scala`` / ``OperatorInfo.scala``) — but
over a stable serialized form instead of py4j handles, which is the
"explain/JSON as the stable interface" mitigation from SURVEY.md §7.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def short_class(cls: str) -> str:
    return cls.rsplit(".", 1)[-1]


@dataclass
class PlanNode:
    cls: str
    fields: dict
    children: list["PlanNode"] = field(default_factory=list)

    @property
    def name(self) -> str:
        return short_class(self.cls)

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


def parse_tree(nodes: list[dict]) -> PlanNode:
    """Rebuild one pre-order node array into a tree."""

    def build(pos: int) -> tuple[PlanNode, int]:
        raw = nodes[pos]
        n = PlanNode(
            cls=raw.get("class", "?"),
            fields={k: v for k, v in raw.items() if k not in ("class", "num-children")},
        )
        pos += 1
        for _ in range(int(raw.get("num-children", 0))):
            child, pos = build(pos)
            n.children.append(child)
        return n, pos

    root, end = build(0)
    if end != len(nodes):
        # trailing nodes (shouldn't happen) — attach flat so nothing is lost
        while end < len(nodes):
            extra, end = build(end)
            root.children.append(extra)
    return root


# -- expression-level helpers -------------------------------------------------

ATTR = "org.apache.spark.sql.catalyst.expressions.AttributeReference"
ALIAS = "org.apache.spark.sql.catalyst.expressions.Alias"


def is_expr_trees(value) -> bool:
    """True if a field value is a list of pre-order expression arrays."""
    return (
        isinstance(value, list)
        and len(value) > 0
        and all(
            isinstance(t, list) and len(t) > 0 and isinstance(t[0], dict) and "class" in t[0]
            for t in value
        )
    )


def expr_trees(node: PlanNode, field_name: str) -> list[list[dict]]:
    """Expression trees of a field. ``Seq[Expression]`` fields serialize as
    a list of pre-order arrays; single ``Expression`` fields (e.g.
    Filter/Join ``condition``) as ONE flat pre-order array — normalize both
    to a list of trees."""
    v = node.fields.get(field_name)
    if is_expr_trees(v):
        return v
    if isinstance(v, list) and v and isinstance(v[0], dict) and "class" in v[0]:
        return [v]
    return []


def expr_id(raw: dict) -> tuple[int, str] | None:
    e = raw.get("exprId")
    if isinstance(e, dict) and "id" in e:
        return (int(e["id"]), str(e.get("jvmId", "")))
    return None


def attr_refs(tree: list[dict]) -> list[tuple[tuple[int, str], str]]:
    """All (exprId, name) attribute references in one expression array."""
    out = []
    for raw in tree:
        if raw.get("class") == ATTR:
            eid = expr_id(raw)
            if eid is not None:
                out.append((eid, raw.get("name", "?")))
    return out


def named_output(tree: list[dict]) -> tuple[str, tuple[int, str] | None, list[tuple[int, str]]]:
    """For one output expression: (output name, output exprId, input exprIds).

    Root Alias → (alias name, alias id, referenced attrs below).
    Root AttributeReference → passthrough (name, id, [id]).
    Anything else named-less → ("?", None, refs).
    """
    root = tree[0]
    refs = [eid for eid, _ in attr_refs(tree)]
    cls = root.get("class")
    if cls == ALIAS:
        eid = expr_id(root)
        child_refs = [eid2 for eid2, _ in attr_refs(tree[1:])]
        return (root.get("name", "?"), eid, child_refs)
    if cls == ATTR:
        eid = expr_id(root)
        return (root.get("name", "?"), eid, [eid] if eid else [])
    return ("?", None, refs)


def expr_summary(tree: list[dict], max_len: int = 80) -> str:
    """Compact human string for an expression tree (for operator detail
    blocks, ≈ the reference's getExprString passthrough,
    ``OperatorInfo.scala:114``)."""

    def fmt(pos: int) -> tuple[str, int]:
        raw = tree[pos]
        cls = raw.get("class", "?").rsplit(".", 1)[-1]
        nc = int(raw.get("num-children", 0))
        pos += 1
        args = []
        for _ in range(nc):
            s, pos = fmt(pos)
            args.append(s)
        if cls == "AttributeReference":
            return raw.get("name", "?"), pos
        if cls == "Literal":
            return str(raw.get("value")), pos
        if cls == "Alias":
            return f"{args[0]} AS {raw.get('name', '?')}", pos
        name = cls
        return (f"{name}({', '.join(args)})" if args else name), pos

    try:
        s, _ = fmt(0)
    except Exception:  # noqa: BLE001 — detail strings must never break capture
        s = "<expr>"
    return s if len(s) <= max_len else s[: max_len - 3] + "..."
