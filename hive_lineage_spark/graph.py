"""Immutable lineage-graph nodes with rule-based rewriting.

Port of the reference's hand-rolled TreeNode clone
(``hivehook/.../lineage/GraphNode.scala``):

- DAG-safe traversal with a visited-id set (``GraphNode.scala:19-27``)
- bottom-up ``transform_up`` with per-id memoization so shared subplans
  rewrite once and stay shared (``GraphNode.scala:37-87``)
- ``make_copy`` via ``dataclasses.replace`` (the reference needs runtime
  reflection over Product ctors, ``GraphNode.scala:29-35`` +
  ``reflection/ReflectionUtils.scala``; Python gets it for free)
- cycle-safe indented pretty-print with ``...`` for revisited nodes
  (``hook/Node.scala:63-97``)
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field, replace

_ids = itertools.count(1)


@dataclass(frozen=True)
class GNode:
    """One operator in the lineage graph.

    ``nid`` is the stable node identity used for DAG dedup/memoization —
    it survives ``with_children`` rewrites (a rewritten node is still "the
    same operator"), mirroring the reference's use of Hive operator ids.
    """

    kind: str
    detail: tuple[tuple[str, str], ...] = ()
    children: tuple["GNode", ...] = ()
    nid: int = field(default_factory=lambda: next(_ids))

    # -- traversal ---------------------------------------------------------

    def walk(self) -> Iterator["GNode"]:
        """Pre-order DFS, each node once (DAG-safe) — ≈ Node.traverse."""
        seen: set[int] = set()

        def go(n: GNode) -> Iterator[GNode]:
            if n.nid in seen:
                return
            seen.add(n.nid)
            yield n
            for c in n.children:
                yield from go(c)

        return go(self)

    def collect(self, pred: Callable[["GNode"], bool]) -> list["GNode"]:
        return [n for n in self.walk() if pred(n)]

    def find(self, kind: str) -> list["GNode"]:
        return self.collect(lambda n: n.kind == kind)

    # -- rewriting ---------------------------------------------------------

    def with_children(self, children: tuple["GNode", ...]) -> "GNode":
        if children == self.children:
            return self
        return replace(self, children=children)

    def transform_up(self, rule: Callable[["GNode"], "GNode"]) -> "GNode":
        """Bottom-up rewrite with per-nid memoization: a node shared by
        multiple parents is rewritten once and the rewritten instance is
        reused, preserving DAG sharing (``GraphNode.scala:48-50``)."""
        memo: dict[int, GNode] = {}

        def go(n: GNode) -> GNode:
            hit = memo.get(n.nid)
            if hit is not None:
                return hit
            new_children = tuple(go(c) for c in n.children)
            rewritten = rule(n.with_children(new_children))
            memo[n.nid] = rewritten
            return rewritten

        return go(self)

    # -- printing ----------------------------------------------------------

    def tree_string(self, details: bool = True) -> str:
        """Indented operator tree; revisited DAG nodes print as ``...``
        (``hook/Node.scala:63-97``)."""
        out: list[str] = []
        seen: set[int] = set()

        def go(n: GNode, depth: int) -> None:
            pad = "  " * depth
            if n.nid in seen:
                out.append(f"{pad}{n.kind} ...")
                return
            seen.add(n.nid)
            out.append(f"{pad}{n.kind}")
            if details:
                for k, v in n.detail:
                    out.append(f"{pad}  | {k}: {v}")
            for c in n.children:
                go(c, depth + 1)

        go(self, 0)
        return "\n".join(out)

    def to_dict(self) -> dict:
        """JSON-able structured emit (the reference only pretty-prints;
        structured output is the rebuild's upgrade, SURVEY.md §3 step 6)."""
        seen: set[int] = set()

        def go(n: GNode) -> dict:
            if n.nid in seen:
                return {"ref": n.nid}
            seen.add(n.nid)
            return {
                "id": n.nid,
                "kind": n.kind,
                "detail": dict(n.detail),
                "children": [go(c) for c in n.children],
            }

        return go(self)


def node(kind: str, children: tuple[GNode, ...] = (), **detail: str) -> GNode:
    return GNode(kind=kind, detail=tuple((k, str(v)) for k, v in detail.items()), children=children)


def from_dict(doc: dict) -> GNode:
    """Inverse of GNode.to_dict (shared DAG nodes were emitted once and
    referenced by id afterwards — rebuild preserving the sharing)."""
    by_id: dict[int, GNode] = {}

    def go(d: dict) -> GNode:
        if "ref" in d:
            return by_id[d["ref"]]
        n = GNode(
            kind=d["kind"],
            detail=tuple((k, str(v)) for k, v in d.get("detail", {}).items()),
            children=tuple(go(c) for c in d.get("children", [])),
        )
        by_id[d["id"]] = n
        return n

    return go(doc)
