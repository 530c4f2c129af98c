"""Column-level lineage resolution — the port of the reference's
``SchemaMapping`` (``hivehook/.../hook/qinfo/SchemaMapping.scala:74-135``).

The reference reverse-engineers column identity through Hive's per-operator
RowSchema/columnExprMap (internal ``_col0`` names, reducer KEY./VALUE.
slots, join side indexes) with a "unique column wins" fallback that is
wrong for self-joins (``SchemaMapping.scala:116-121``). Catalyst gives us
stable ``exprId``s instead, so the rebuild resolves lineage exactly — a
documented, intentional divergence (SURVEY.md §7 risks): bottom-up over
the optimized logical plan, every output attribute maps to the set of
base ``(table, column)`` cells it derives from.

Two lineage classes are computed:

- **direct** (value) lineage: base cells whose values flow into the
  output column — what the reference computes.
- **indirect** (control) lineage: base cells referenced by filters, join
  conditions and grouping that influence *which* rows appear — beyond the
  reference, standard in modern lineage tools.

The reference's "not mappable" sentinel ``Column(null,null)``
(``SchemaMapping.scala:128-130``) survives as the ``("?", "?")`` cell.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .plans.jsonplan import PlanNode, attr_refs, expr_id, expr_trees, named_output

Cell = tuple[str, str]  # (table, column)
EId = tuple[int, str]  # Catalyst ExprId (id, jvmId)

UNKNOWN: Cell = ("?", "?")

_LEAF_KINDS = {
    "LogicalRelation",
    "HiveTableRelation",
    "DataSourceV2Relation",
    "DataSourceV2ScanRelation",
    "LocalRelation",
    "OneRowRelation",
    # a .persist()ed subplan: Spark retains only the physical cached plan,
    # so the cache is an honest lineage boundary, named "cache:<n>" by the
    # tracker (≈ the reference's TempFileDef intermediate inputs)
    "InMemoryRelation",
    # localCheckpoint() / RDD-backed data: same boundary, "checkpoint:<n>"
    "LogicalRDD",
    # streaming sources (pre-execution streaming plans; micro-batch plans
    # instead materialize them as LogicalRelation/LocalRelation)
    "StreamingRelation",
    "StreamingRelationV2",
    "StreamingExecutionRelation",
    "StreamingDataSourceV2Relation",
    "StreamingDataSourceV2ScanRelation",
    # physical scan leaves (cached-subplan analysis; Exec suffix stripped)
    "FileSourceScan",
    "RowDataSourceScan",
    "BatchScan",
    "LocalTableScan",
    "InMemoryTableScan",
    # physical scans of (local)checkpointed / foreign RDDs — resolvable
    # through plans.capture.checkpoint_tracked's registry, otherwise an
    # honest checkpoint:<n> boundary
    "RDDScan",
    "ExternalRDDScan",
}

_PASSTHROUGH = {
    "Filter",
    "Sort",
    "GlobalLimit",
    "LocalLimit",
    "Repartition",
    "RepartitionByExpression",
    "SubqueryAlias",
    "Distinct",
    "ResolvedHint",
    "UnresolvedHint",
    "Deduplicate",
    "WithCTE",
    "Offset",
    "Tail",
}


@dataclass
class ColumnLineage:
    name: str
    eid: EId | None
    bases: frozenset[Cell]
    role: str = "direct"  # direct | aggregated | generated


@dataclass
class OperatorMapping:
    """Per-operator schema mapping (≈ one reference SchemaMapping instance,
    forced for every operator in ``OperatorNode._initialize`` pass 3)."""

    kind: str
    depth: int
    outputs: list[tuple[str, frozenset[Cell]]]


@dataclass
class LineageResult:
    columns: list[ColumnLineage]
    input_tables: list[str]
    indirect: frozenset[Cell] = frozenset()
    notes: list[str] = field(default_factory=list)
    operator_mappings: list[OperatorMapping] = field(default_factory=list)

    def column_map(self) -> dict[str, set[Cell]]:
        out: dict[str, set[Cell]] = {}
        for c in self.columns:
            out.setdefault(c.name, set()).update(c.bases)
        return out

    def to_dict(self) -> dict:
        return {
            "columns": [
                {
                    "name": c.name,
                    "role": c.role,
                    "bases": sorted(f"{t}.{col}" for t, col in c.bases),
                }
                for c in self.columns
            ],
            "inputTables": sorted(self.input_tables),
            "indirect": sorted(f"{t}.{c}" for t, c in self.indirect),
            "notes": self.notes,
        }


@dataclass
class _NodeMap:
    """Per-node schema mapping (≈ one SchemaMapping instance)."""

    output: list[tuple[str, EId | None]]
    bases: dict[EId, frozenset[Cell]]


def _leaf_output(p: PlanNode) -> list[tuple[str, EId]]:
    out = []
    trees = (
        expr_trees(p, "output")
        or expr_trees(p, "outputAttrs")
        # physical InMemoryTableScanExec (a nested-cache leaf) carries its
        # output under "attributes"
        or expr_trees(p, "attributes")
    )
    for tree in trees:
        root = tree[0]
        eid = expr_id(root)
        if eid:
            out.append((root.get("name", "?"), eid))
    return out


def analyze(
    plan: PlanNode,
    leaf_tables: list[str],
    declared: dict[str, list[str]] | None = None,
) -> LineageResult:
    """Resolve column lineage of the whole plan (≈ QueryNode._initialize
    pass 3 forcing every operator's schemaMapping,
    ``lineage/OperatorNode.scala:67-100``, but in one bottom-up pass).

    ``declared`` upgrades Python-UDF barriers (mapInPandas & friends,
    where exprIds genuinely do not flow): a mapping of barrier OUTPUT
    column name → the barrier's INPUT column names it derives from, as
    asserted by the operator author (Spark's plan cannot prove it). A
    declared output resolves through the barrier child's lineage with
    role ``"declared"`` — honest provenance: engine-proven edges stay
    ``direct``/``udf``, authored edges are visibly weaker. Undeclared
    fresh outputs keep the not-mappable sentinel, the reference's
    Column(null,null) (``SchemaMapping.scala:128-130``)."""
    leaf_iter = iter(leaf_tables)
    tables: list[str] = []
    loop_anchors: dict[str, _NodeMap] = {}  # UnionLoop id → anchor map
    indirect: set[Cell] = set()
    notes: list[str] = []
    op_mappings: list[OperatorMapping] = []
    roles: dict[EId, str] = {}  # eid -> aggregated | generated | udf

    def refs_bases(trees: list[list[dict]], m: _NodeMap) -> set[Cell]:
        cells: set[Cell] = set()
        for t in trees:
            for eid, name in attr_refs(t):
                cells.update(m.bases.get(eid, frozenset({UNKNOWN})))
        return cells

    def merge(children: list[_NodeMap]) -> dict[EId, frozenset[Cell]]:
        bases: dict[EId, frozenset[Cell]] = {}
        for c in children:
            bases.update(c.bases)
        return bases

    def projectish(p: PlanNode, field_name: str, child: _NodeMap, role_for_alias: str) -> _NodeMap:
        bases = dict(child.bases)
        output: list[tuple[str, EId | None]] = []
        for tree in expr_trees(p, field_name):
            name, eid, in_eids = named_output(tree)
            cells: set[Cell] = set()
            for ie in in_eids:
                cells.update(child.bases.get(ie, frozenset({UNKNOWN})))
            if eid is not None:
                bases[eid] = frozenset(cells)
                if role_for_alias != "direct" and tree[0].get("class") == "org.apache.spark.sql.catalyst.expressions.Alias":
                    roles[eid] = role_for_alias
            output.append((name, eid))
        return _NodeMap(output=output, bases=bases)

    def visit(p: PlanNode, depth: int = 0) -> _NodeMap:
        m = _visit(p, depth)
        op_mappings.append(
            OperatorMapping(
                kind=p.name,
                depth=depth,
                outputs=[
                    (name, m.bases.get(eid, frozenset({UNKNOWN})) if eid else frozenset({UNKNOWN}))
                    for name, eid in m.output
                ],
            )
        )
        return m

    def _visit(p: PlanNode, depth: int) -> _NodeMap:
        # analyze handles BOTH logical plans and physical plans (the latter
        # appear as .persist()ed cached subplans, which Spark retains only
        # physically) — physical node names are canonicalized by stripping
        # the Exec suffix; field-name differences are handled per-branch.
        kind = p.name.removesuffix("Exec") if p.name.endswith("Exec") else p.name

        if kind == "UnionLoop":
            # recursive CTE (WITH RECURSIVE): anchor ∪ recursive step,
            # where the step's UnionLoopRef leaf re-reads the loop's own
            # rows. Visit the ANCHOR first and publish its positional
            # bases so the ref can bind to them — sound for lineage,
            # since iteration adds no base columns the anchor doesn't
            # already carry — then union positionally like Union.
            anchor = visit(p.children[0], depth + 1)
            loop_anchors[str(p.fields.get("id"))] = anchor
            rec = visit(p.children[1], depth + 1) if len(p.children) > 1 else anchor
            bases = {**anchor.bases, **rec.bases}
            output: list[tuple[str, EId | None]] = []
            for pos, raw in enumerate(p.fields.get("outputAttrIds") or []):
                oid = (raw["id"], raw.get("jvmId", "")) if isinstance(raw, dict) and "id" in raw else None
                cells: set[Cell] = set()
                for side in (anchor, rec):
                    if pos < len(side.output):
                        seid = side.output[pos][1]
                        cells.update(side.bases.get(seid, frozenset({UNKNOWN})))
                name = anchor.output[pos][0] if pos < len(anchor.output) else f"col{pos}"
                if oid is not None:
                    bases[oid] = frozenset(cells)
                output.append((name, oid))
            return _NodeMap(output=output, bases=bases)

        if kind == "UnionLoopRef":
            # the recursion's self-reference: occupies a leaf slot (it
            # appears in collectLeaves) but is NOT an input table — its
            # columns bind positionally to the loop anchor's bases.
            next(leaf_iter, None)
            anchor = loop_anchors.get(str(p.fields.get("loopId")))
            out = _leaf_output(p)
            bases = {}
            for pos, (_name, eid) in enumerate(out):
                if anchor is not None and pos < len(anchor.output):
                    aeid = anchor.output[pos][1]
                    bases[eid] = anchor.bases.get(aeid, frozenset({UNKNOWN}))
                else:
                    bases[eid] = frozenset({UNKNOWN})
            return _NodeMap(output=[(n, e) for n, e in out], bases=bases)

        children = [visit(c, depth + 1) for c in p.children]

        if kind in ("HashAggregate", "SortAggregate", "ObjectHashAggregate") and children:
            # physical aggregate: resultExpressions is the output list —
            # but its refs are the aggregate BUFFER attributes
            # (aggregateAttributes), not child columns, so resolve each
            # buffer attr to its aggregate expression's references
            # first. Buffer/expression lists pair positionally for
            # single-buffer functions; on a length mismatch (multi-
            # buffer partials like avg) every buffer maps to the union
            # of all aggregate inputs — over-approximate, never wrong.
            child = children[0]
            indirect.update(refs_bases(expr_trees(p, "groupingExpressions"), child))
            agg_exprs = expr_trees(p, "aggregateExpressions")
            agg_attrs = expr_trees(p, "aggregateAttributes")
            aug = dict(child.bases)
            expr_cells = []
            for tree in agg_exprs:
                cells: set[Cell] = set()
                for ie, _ in attr_refs(tree):
                    cells.update(child.bases.get(ie, frozenset({UNKNOWN})))
                expr_cells.append(frozenset(cells))
            union_cells = frozenset().union(*expr_cells) if expr_cells else frozenset()
            for i, attr_tree in enumerate(agg_attrs):
                eid = expr_id(attr_tree[0])
                if eid is None:
                    continue
                aug[eid] = (
                    expr_cells[i] if len(agg_attrs) == len(agg_exprs) else union_cells
                )
                roles[eid] = "aggregated"
            return projectish(
                p,
                "resultExpressions",
                _NodeMap(output=child.output, bases=aug),
                "aggregated",
            )

        if kind.endswith("Join") and kind != "Join" and len(children) == 2:
            # physical join variants (BroadcastHashJoin, SortMergeJoin, ...)
            bases = merge(children)
            jt = p.fields.get("joinType", {})
            jt_name = (
                jt.get("object", "").rsplit(".", 1)[-1].rstrip("$") if isinstance(jt, dict) else str(jt)
            )
            m = _NodeMap(output=[], bases=bases)
            indirect.update(refs_bases(expr_trees(p, "condition"), m))
            indirect.update(refs_bases(expr_trees(p, "leftKeys"), m))
            indirect.update(refs_bases(expr_trees(p, "rightKeys"), m))
            if jt_name in ("LeftSemi", "LeftAnti"):
                m.output = children[0].output
            else:
                m.output = children[0].output + children[1].output
            return m

        if kind in _LEAF_KINDS:
            table = next(leaf_iter, None) or f"<leaf{len(tables)}>"
            tables.append(table)
            out = _leaf_output(p)
            return _NodeMap(
                output=[(n, e) for n, e in out],
                bases={e: frozenset({(table, n)}) for n, e in out},
            )

        if kind == "Project":
            return projectish(p, "projectList", children[0], "direct")

        if kind == "Aggregate":
            # grouping keys are control lineage (which groups exist)
            indirect.update(refs_bases(expr_trees(p, "groupingExpressions"), children[0]))
            m = projectish(p, "aggregateExpressions", children[0], "aggregated")
            return m

        if kind == "Window":
            child = children[0]
            field_name = "windowExpressions" if expr_trees(p, "windowExpressions") else "windowExpression"
            m = projectish(p, field_name, child, "direct")
            indirect.update(refs_bases(expr_trees(p, "partitionSpec"), child))
            indirect.update(refs_bases(expr_trees(p, "orderSpec"), child))
            return _NodeMap(output=child.output + m.output, bases={**child.bases, **m.bases})

        if kind == "Filter":
            indirect.update(refs_bases(expr_trees(p, "condition"), children[0]))
            return children[0]

        if kind == "Join":
            bases = merge(children)
            jt = p.fields.get("joinType", {})
            jt_name = jt.get("object", "").rsplit(".", 1)[-1].rstrip("$") if isinstance(jt, dict) else str(jt)
            m = _NodeMap(output=[], bases=bases)
            cond_m = _NodeMap(output=[], bases=bases)
            indirect.update(refs_bases(expr_trees(p, "condition"), cond_m))
            if jt_name in ("LeftSemi", "LeftAnti"):
                m.output = children[0].output
            else:
                m.output = children[0].output + children[1].output
            return m

        if kind == "Union":
            # Union.output reuses the first child's exprIds; each output
            # position derives from that position in EVERY child.
            first = children[0]
            bases = merge(children)
            for pos, (name, eid) in enumerate(first.output):
                if eid is None:
                    continue
                cells = set()
                for c in children:
                    if pos < len(c.output):
                        ceid = c.output[pos][1]
                        cells.update(c.bases.get(ceid, frozenset({UNKNOWN})))
                bases[eid] = frozenset(cells)
            return _NodeMap(output=first.output, bases=bases)

        if kind == "Expand":
            # rollup/cube/distinct-agg/unpivot: output attr i ← union
            # over projections of the refs of expression i.
            child = children[0]
            out_attrs = _leaf_output(p)
            projections = p.fields.get("projections")
            bases = dict(child.bases)
            per_pos: list[set[Cell]] = [set() for _ in out_attrs]
            got_any = False
            if isinstance(projections, list):
                for proj in projections:
                    if not isinstance(proj, list):
                        continue
                    for i, tree in enumerate(proj):
                        if i < len(per_pos) and isinstance(tree, list):
                            for eid, _ in attr_refs(tree):
                                got_any = True
                                per_pos[i].update(child.bases.get(eid, frozenset({UNKNOWN})))
            if not got_any:
                # Spark's TreeNode.toJSON emits Seq[Seq[Expression]]
                # fields as null, so Expand's projections are not
                # recoverable from the plan JSON. Fallback, most→least
                # specific: passthrough by exprId; passthrough by NAME
                # (rollup/cube re-alias grouping columns under fresh
                # exprIds but keep names); any remaining synthetic output
                # (unpivot's name/value columns, grouping ids) derives
                # from the child columns that no output name-matches —
                # exactly the melted set for unpivot — or the
                # not-mappable sentinel when the child contributes
                # nothing distinguishable.
                out_names = {n for n, _ in out_attrs}
                consumed: set[Cell] = set()
                for cn, ceid in child.output:
                    if cn not in out_names and ceid in child.bases:
                        consumed |= set(child.bases.get(ceid) or ())
                child_by_name = {n: e for n, e in child.output}
                for i, (name, eid) in enumerate(out_attrs):
                    if eid in child.bases:
                        per_pos[i] = set(child.bases[eid])
                    elif name in child_by_name and child_by_name[name] in child.bases:
                        per_pos[i] = set(child.bases[child_by_name[name]])
                    elif consumed:
                        per_pos[i] = set(consumed)
                    else:
                        per_pos[i] = {UNKNOWN}
            for (name, eid), cells in zip(out_attrs, per_pos):
                bases[eid] = frozenset(cells)
            return _NodeMap(output=[(n, e) for n, e in out_attrs], bases=bases)

        if kind == "Generate":
            child = children[0]
            gen_refs = refs_bases(expr_trees(p, "generator"), child)
            bases = dict(child.bases)
            gen_out = []
            for tree in expr_trees(p, "generatorOutput"):
                root = tree[0]
                eid = expr_id(root)
                if eid:
                    bases[eid] = frozenset(gen_refs)
                    roles[eid] = "generated"
                    gen_out.append((root.get("name", "?"), eid))
            return _NodeMap(output=child.output + gen_out, bases=bases)

        if kind in ("ArrowEvalPython", "BatchEvalPython"):
            # scalar Python/Pandas UDF stage: output = child ++ resultAttrs,
            # and udfs[i]'s argument references give resultAttrs[i]'s true
            # lineage — the UDF itself stays opaque, exactly like the
            # reference rewriting through GenericUDF without interpreting
            # it (SchemaMapping.scala:58-68).
            child = children[0]
            bases = dict(child.bases)
            udf_trees = expr_trees(p, "udfs")
            res_attrs = []
            for tree in expr_trees(p, "resultAttrs"):
                root = tree[0]
                eid = expr_id(root)
                if eid:
                    res_attrs.append((root.get("name", "?"), eid))
            for (name, eid), tree in zip(res_attrs, udf_trees):
                cells: set[Cell] = set()
                for ie, _ in attr_refs(tree):
                    cells.update(child.bases.get(ie, frozenset({UNKNOWN})))
                bases[eid] = frozenset(cells)
                roles[eid] = "udf"
            return _NodeMap(output=child.output + res_attrs, bases=bases)

        if kind in _PASSTHROUGH and len(children) == 1:
            return children[0]

        if len(children) == 1:
            # Python-UDF barriers (mapInPandas & friends) and other schema-
            # changing unary ops: exprIds do not flow through, so their
            # fresh output attrs get the not-mappable sentinel (the
            # reference's Column(null,null), SchemaMapping.scala:128-130),
            # while pass-through attrs keep resolving.
            fresh = _leaf_output(p)
            if fresh:
                child = children[0]
                bases = dict(child.bases)
                child_by_name = {n: e for n, e in child.output if e}
                out: list[tuple[str, EId | None]] = []
                n_declared = 0
                for name, eid in fresh:
                    if eid not in bases:
                        srcs = (declared or {}).get(name)
                        if srcs:
                            cells: set[Cell] = set()
                            for s in srcs:
                                se = child_by_name.get(s)
                                cells.update(
                                    child.bases.get(se, frozenset({UNKNOWN}))
                                    if se
                                    else frozenset({UNKNOWN})
                                )
                            bases[eid] = frozenset(cells)
                            roles[eid] = "declared"
                            n_declared += 1
                        else:
                            bases[eid] = frozenset({UNKNOWN})
                    out.append((name, eid))
                notes.append(
                    f"opaque schema barrier {kind}"
                    + (f" ({n_declared} declared column(s))" if n_declared else "")
                )
                return _NodeMap(output=out, bases=bases)
            # unknown unary op without own output: inherit
            # (≈ SchemaMapping default, :132)
            notes.append(f"pass-through for unknown operator {kind}")
            return children[0]

        if len(children) == 0:
            # unknown leaf: it still occupies a collectLeaves slot — the
            # name iterator must advance or every LATER scan binds to
            # the wrong table (the q47 UnionLoopRef lesson, generalized)
            next(leaf_iter, None)
            notes.append(f"opaque leaf {kind}")
            out = _leaf_output(p)
            return _NodeMap(
                output=[(n, e) for n, e in out],
                bases={e: frozenset({UNKNOWN}) for _, e in out},
            )

        # unknown multi-child: not mappable (≈ SchemaMapping.scala:133 null)
        notes.append(f"unmappable multi-child operator {kind}")
        bases = merge(children)
        out = [(n, e) for c in children for n, e in c.output]
        return _NodeMap(output=out, bases={e: frozenset({UNKNOWN}) for _, e in out if e} | bases)

    root = visit(plan)
    agg_kinds = {"Aggregate"}
    cols = []
    for name, eid in root.output:
        bases = root.bases.get(eid, frozenset({UNKNOWN})) if eid else frozenset({UNKNOWN})
        cols.append(
            ColumnLineage(name=name, eid=eid, bases=bases, role=roles.get(eid, "direct"))
        )
    return LineageResult(
        columns=cols,
        # one entry per distinct table: self-joins and multi-scan plans
        # read the same table through several leaves
        input_tables=sorted(set(tables)),
        indirect=frozenset(indirect),
        notes=notes,
        operator_mappings=list(reversed(op_mappings)),  # root first
    )
