"""Post-execution plan capture — the rebuild of the reference's plan walk
(``hivehook/.../hook/qinfo/QueryInfo.scala:58-111`` GraphWalker +
``hook/OperatorGraphBuilder.scala``).

Where the reference walks a Hive MR task DAG and stitches per-task operator
trees with a sink stack, Spark hands us a single plan tree, so capture is:

1. grab ``df._jdf.queryExecution()`` after the action (the hook moment —
   ≈ ``PostExecHook.run``'s HookContext),
2. parse ``optimizedPlan.toJSON()`` (logical, for column lineage),
3. walk the executed physical plan via py4j — unwrapping
   ``AdaptiveSparkPlanExec.finalPhysicalPlan()`` and recursing through
   QueryStage / ReusedExchange wrappers, the AQE analog of the reference's
   ConditionalTask + ``task.done()`` filtering
   (``qinfo/QueryInfo.scala:28-39``, ``TaskInfo.scala:38-40``),
4. resolve scan leaves to input paths (≈ the ``locationMap`` resolution at
   ``qinfo/TaskInfo.scala:78-104``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..graph import GNode, node
from .jsonplan import PlanNode, expr_summary, expr_trees, parse_tree

# physical class → normalized graph kind (≈ OperatorInfo.apply dispatch,
# qinfo/OperatorInfo.scala:47-58; unmatched classes fall through to their
# simple name, like the reference's generic wrapper at :56)
_PHYS_KIND = {
    "FileSourceScanExec": "Scan",
    "BatchScanExec": "Scan",
    "InMemoryTableScanExec": "Scan",
    "RowDataSourceScanExec": "Scan",
    "FilterExec": "Filter",
    "ProjectExec": "Project",
    "HashAggregateExec": "HashAggregate",
    "SortAggregateExec": "SortAggregate",
    "ObjectHashAggregateExec": "ObjectHashAggregate",
    "BroadcastHashJoinExec": "BroadcastHashJoin",
    "ShuffledHashJoinExec": "ShuffledHashJoin",
    "SortMergeJoinExec": "SortMergeJoin",
    "BroadcastNestedLoopJoinExec": "BroadcastNestedLoopJoin",
    "CartesianProductExec": "CartesianProduct",
    "ShuffleExchangeExec": "ShuffleExchange",
    "BroadcastExchangeExec": "BroadcastExchange",
    "AQEShuffleReadExec": "AQEShuffleRead",
    "ShuffleQueryStageExec": "ShuffleQueryStage",
    "BroadcastQueryStageExec": "BroadcastQueryStage",
    "ResultQueryStageExec": "ResultQueryStage",
    "TableCacheQueryStageExec": "TableCacheQueryStage",
    "ReusedExchangeExec": "ReusedExchange",
    "WholeStageCodegenExec": "WholeStageCodegen",
    "InputAdapter": "InputAdapter",
    "AdaptiveSparkPlanExec": "AdaptiveSparkPlan",
    "ColumnarToRowExec": "ColumnarToRow",
    "RowToColumnarExec": "RowToColumnar",
    "SortExec": "Sort",
    "TakeOrderedAndProjectExec": "TakeOrderedAndProject",
    "CollectLimitExec": "CollectLimit",
    "GlobalLimitExec": "GlobalLimit",
    "LocalLimitExec": "LocalLimit",
    "WindowExec": "Window",
    "WindowGroupLimitExec": "WindowGroupLimit",
    "ExpandExec": "Expand",
    "UnionExec": "Union",
    "GenerateExec": "Generate",
    "WriteFilesExec": "WriteFiles",
    "DataWritingCommandExec": "DataWritingCommand",
    "ExecutedCommandExec": "Command",
}


@dataclass
class Captured:
    """Everything the lineage layer needs from one executed query."""

    logical: PlanNode  # parsed optimizedPlan (exprIds intact)
    physical: GNode | None  # final physical plan as a graph (pre-normalize)
    leaf_paths: list[list[str]]  # per logical leaf, its scan root paths
    logical_str: str = ""
    physical_str: str = ""
    raw_logical: list[dict] = field(default_factory=list)  # toJSON nodes, for save/replay
    cached_plans: dict[int, dict] = field(default_factory=dict)  # leaf idx → cached physical
    # catalog VIEWs the ANALYZED plan traversed (View nodes are gone from
    # the optimized plan — EliminateView inlines them), each a dict of
    # name/db/columns/viewSql/viewSqlExpanded/isTemp (≈ the reference's
    # TableDef.viewSql pair, ConvertHelper.scala:67-73)
    views: list[dict] = field(default_factory=list)
    extras: dict = field(default_factory=dict)

    def save(self, path: str) -> None:
        """Persist the captured plan for offline replay — the rebuild's
        analog of the reference's serialized sample plans
        (``HivePlanUtils.readQueryPlan``, ``hook/HivePlanUtils.scala:40-42``;
        capture recipe in ``BasicTest.scala:8-11``)."""
        import os

        doc = {
            "rawLogical": self.raw_logical,
            "leafPaths": self.leaf_paths,
            "physical": self.physical.to_dict() if self.physical else None,
            "logicalStr": self.logical_str,
            "cachedPlans": {str(k): v for k, v in self.cached_plans.items()},
            "views": self.views,
        }
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(doc, f)


def load_captured(path: str) -> Captured:
    """Offline entry point: rebuild a Captured plan from a saved file and
    run the same analysis pipeline with no SparkSession at all (≈
    ``HivePlanUtils.querPlanToOperatorGraph``, ``HivePlanUtils.scala:44-70``)."""
    from ..graph import from_dict

    with open(path) as f:
        doc = json.load(f)
    return Captured(
        logical=parse_tree(doc["rawLogical"]),
        physical=from_dict(doc["physical"]) if doc.get("physical") else None,
        leaf_paths=doc.get("leafPaths", []),
        logical_str=doc.get("logicalStr", ""),
        raw_logical=doc["rawLogical"],
        cached_plans={int(k): v for k, v in doc.get("cachedPlans", {}).items()},
        views=doc.get("views", []),
    )


def _agg_mode(jnode) -> str:
    """Partial/PartialMerge/Final/Complete of a physical aggregate —
    the Spark analog of Hive GroupBy modes (``OperatorInfo.scala:211-223``)."""
    try:
        exprs = jnode.aggregateExpressions()
        if exprs.size() == 0:
            return "Complete"
        return exprs.apply(0).mode().toString()
    except Exception:  # noqa: BLE001
        return "?"


def _phys_detail(name: str, jnode) -> dict[str, str]:
    d: dict[str, str] = {}
    try:
        if name in ("HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec"):
            d["mode"] = _agg_mode(jnode)
        elif name.endswith("JoinExec"):
            d["joinType"] = jnode.joinType().toString()
        elif name == "FileSourceScanExec":
            loc = jnode.relation().location().rootPaths()
            d["path"] = ",".join(str(loc.apply(i)) for i in range(loc.size()))
            meta = jnode.metadata()
            if meta.contains("PushedFilters"):
                d["pushedFilters"] = str(meta.apply("PushedFilters"))
            if meta.contains("PartitionFilters"):
                pf = str(meta.apply("PartitionFilters"))
                if pf and pf != "[]":
                    d["partitionFilters"] = pf
            d["readSchema"] = str(jnode.requiredSchema().simpleString())[:120]
    except Exception:  # noqa: BLE001 — detail is best-effort, capture must not fail
        pass
    return d


def physical_graph(jplan) -> GNode:
    """py4j walk of a physical plan into a GNode graph, recursing through
    AQE stage wrappers so the *final* (post-replan) operators are captured."""
    simple = jplan.getClass().getSimpleName()
    # unwrap containers that hold their real subtree in a non-children slot
    if simple == "AdaptiveSparkPlanExec":
        try:
            inner = physical_graph(jplan.finalPhysicalPlan())
        except Exception:  # noqa: BLE001 — pre-execution or older API
            inner = physical_graph(jplan.initialPlan())
        return node("AdaptiveSparkPlan", (inner,))
    if simple.endswith("QueryStageExec"):
        kind = _PHYS_KIND.get(simple, simple)
        return node(kind, (physical_graph(jplan.plan()),))
    if simple == "ReusedExchangeExec":
        # a leaf reference to an exchange computed elsewhere — recurse into
        # the reused subtree so the normalized graph keeps real operators
        return node("ReusedExchange", (physical_graph(jplan.child()),))

    kind = _PHYS_KIND.get(simple, simple.removesuffix("Exec"))
    kids = jplan.children()
    children = tuple(physical_graph(kids.apply(i)) for i in range(kids.size()))
    detail = _phys_detail(simple, jplan)
    return GNode(kind=kind, detail=tuple(detail.items()), children=children)


_PATH_RE = re.compile(r"Location: \w+\s*\[([^\]]*)\]")


def leaf_scan_paths(jlogical) -> list[list[str]]:
    """Root paths of every leaf relation, in pre-order leaf order (pairs up
    positionally with the parsed JSON plan's leaves)."""
    out: list[list[str]] = []
    leaves = jlogical.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        paths: list[str] = []
        try:
            loc = leaf.relation().location().rootPaths()
            paths = [str(loc.apply(j)) for j in range(loc.size())]
        except Exception:  # noqa: BLE001 — views/in-memory relations have no path
            # streaming source leaf: the path hides in the DataSource options
            try:
                opt = leaf.dataSource().options().get("path")
                if opt.isDefined():
                    paths = [str(opt.get())]
            except Exception:  # noqa: BLE001
                pass
        out.append(paths)
    return out


# pre-checkpoint plan docs, keyed by the checkpointed RDD's id — stable
# across REPEATED references to the same checkpoint inside one plan
# (self-join deduplication re-aliases the later occurrences' output
# exprIds, so attribute identity is NOT a reliable key; every re-aliased
# RDDScanExec still scans the same RDD instance). Consumed by
# cached_subplans / _capture_cached_physical so lineage resolves THROUGH
# checkpoint:<n> boundaries exactly as it does through cache:<n>.
_CHECKPOINT_REGISTRY: dict[int, dict] = {}
# soft bound for long-lived sessions (iterative operators register one
# doc per superstep per call and nothing evicts between
# clear_postings_cache() calls): oldest entries fall out FIFO, and a
# lookup miss degrades GRACEFULLY to the honest opaque checkpoint:<n>
# boundary — never an error
_CHECKPOINT_REGISTRY_MAX = 1024


def _rdd_key(jnode) -> int | None:
    """id of the RDD behind a LogicalRDD / RDDScanExec / ExternalRDDScan."""
    try:
        return int(jnode.rdd().id())
    except Exception:  # noqa: BLE001 — not an RDD-backed node
        return None


def checkpoint_tracked(df, eager: bool = True):
    """``localCheckpoint`` that stays lineage-resolvable.

    Iterative operators (dd20's Pregel supersteps) MUST truncate the
    logical plan between rounds — persist bounds re-execution but not
    plan size, and a multi-reference round doubles the plan each
    superstep until every action pays seconds of driver-side plan
    processing. ``localCheckpoint`` is the GraphX answer, but Spark
    keeps nothing behind the LogicalRDD, so a plain checkpoint turns
    lineage into an opaque ``checkpoint:<n>`` boundary. This wrapper
    captures the pre-checkpoint physical plan (exprIds intact) and
    registers it under the checkpoint's output exprIds; capture-time
    resolution then stitches through the boundary exactly like a
    persisted cache (``hook._resolve_cache_doc``). At cluster scale the
    same wrapper would call reliable ``checkpoint()`` for executor-loss
    recovery — the registry mechanics are identical."""
    doc = _capture_cached_physical(df._jdf.queryExecution().executedPlan())
    ck = df.localCheckpoint(eager)
    key = _rdd_key(ck._jdf.queryExecution().analyzed())
    if key is not None:
        while len(_CHECKPOINT_REGISTRY) >= _CHECKPOINT_REGISTRY_MAX:
            _CHECKPOINT_REGISTRY.pop(next(iter(_CHECKPOINT_REGISTRY)))
        _CHECKPOINT_REGISTRY[key] = doc
    return ck


def clear_checkpoint_registry() -> None:
    _CHECKPOINT_REGISTRY.clear()


def _capture_cached_physical(jphys, depth: int = 0) -> dict:
    """Capture a cached physical plan as {raw, leafPaths, nested}. A
    persisted frame built ON TOP of another persisted frame (index
    pipelines do this: prefix postings over the postings cache) shows up
    as an InMemoryTableScanExec leaf inside the cached plan — recurse
    into ITS cached plan so lineage still reaches the base tables.
    Depth-capped defensively; real pipelines nest one or two levels."""
    if jphys.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # AQE roots serialize as a single opaque node; the initial
        # plan is a complete tree with identical exprIds (runtime
        # re-planning never changes column identity)
        try:
            jphys = jphys.initialPlan()
        except Exception:  # noqa: BLE001
            jphys = jphys.finalPhysicalPlan()
    raw = json.loads(jphys.toJSON())
    sub_paths: list[list[str]] = []
    nested: dict[int, dict] = {}
    subleaves = jphys.collectLeaves()
    for j in range(subleaves.size()):
        sl = subleaves.apply(j)
        paths: list[str] = []
        try:
            loc = sl.relation().location().rootPaths()
            paths = [str(loc.apply(k)) for k in range(loc.size())]
        except Exception:  # noqa: BLE001
            pass
        if not paths and depth < 8:
            cname = sl.getClass().getSimpleName()
            if cname == "InMemoryTableScanExec":
                try:
                    nested[j] = _capture_cached_physical(
                        sl.relation().cacheBuilder().cachedPlan(), depth + 1
                    )
                except Exception:  # noqa: BLE001 — keep this leaf as a boundary
                    pass
            elif cname in ("RDDScanExec", "ExternalRDDScanExec"):
                # a checkpoint INSIDE a captured plan: registered docs
                # already chain (round k's doc was built while round k-1's
                # was in the registry), so this is a lookup, not a recurse
                ndoc = _CHECKPOINT_REGISTRY.get(_rdd_key(sl))
                if ndoc is not None:
                    nested[j] = ndoc
        sub_paths.append(paths)
    doc = {"raw": raw, "leafPaths": sub_paths}
    if nested:
        doc["nested"] = nested
    return doc


def cached_subplans(jlogical) -> dict[int, dict]:
    """For each InMemoryRelation leaf (a .persist()ed subplan), capture the
    cached PHYSICAL plan — Spark keeps only that — so lineage can resolve
    THROUGH the cache: the relation's output exprIds are identical to the
    cached plan's output exprIds. Returns {leaf_index: {raw, leafPaths,
    nested}} (nested = caches built over caches, resolved recursively)."""
    out: dict[int, dict] = {}
    leaves = jlogical.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        simple = leaf.getClass().getSimpleName()
        if simple == "LogicalRDD":
            # a checkpointed subplan: resolvable iff it was created via
            # checkpoint_tracked (otherwise it stays a checkpoint:<n>
            # boundary, the honest answer for foreign RDD-backed data)
            doc = _CHECKPOINT_REGISTRY.get(_rdd_key(leaf))
            if doc is not None:
                out[i] = doc
            continue
        if simple != "InMemoryRelation":
            continue
        try:
            out[i] = _capture_cached_physical(leaf.cacheBuilder().cachedPlan())
        except Exception:  # noqa: BLE001 — keep the cache as a boundary
            continue
    return out


def view_descriptors(raw_analyzed: list[dict]) -> list[dict]:
    """Extract catalog-view descriptors from an analyzed plan's toJSON
    nodes. Each View node wraps its inlined body and carries the
    CatalogTable, including the (viewOriginalText, viewText) pair — the
    same original/expanded SQL the reference stores on TableDef.viewSql
    (``ConvertHelper.scala:67-73``)."""
    views: list[dict] = []
    for raw in raw_analyzed:
        if not raw.get("class", "").endswith(".View"):
            continue
        desc = raw.get("desc")
        if not isinstance(desc, dict):
            continue
        ident = desc.get("identifier") or {}
        schema = desc.get("schema") or {}
        views.append(
            {
                "name": ident.get("table") or "?",
                "db": ident.get("database") or "default",
                "columns": [
                    [
                        f.get("name", "?"),
                        f.get("type") if isinstance(f.get("type"), str) else str(f.get("type")),
                    ]
                    for f in schema.get("fields", [])
                ],
                "viewSql": desc.get("viewOriginalText") or "",
                "viewSqlExpanded": desc.get("viewText") or "",
                "isTemp": bool(raw.get("isTempView")),
            }
        )
    return views


def capture_write_command(qe) -> dict | None:
    """If this execution is a file-writing command
    (InsertIntoHadoopFsRelationCommand — the inner command that
    ``df.write.save``, ``df.write.saveAsTable`` (CTAS) and
    ``INSERT INTO`` all execute), capture the SOURCE plan and return it
    with the output path / target catalog table; None for any other
    execution. This is the automatic-output half of the reference's
    hook contract: a Hive PostExecHook receives the query's WriteEntity
    outputs in the HookContext (``PostExecHook.scala:18-27``); a Spark
    QueryExecutionListener only gets the QueryExecution, so the output
    is recovered from the command node itself. The command's ``query``
    child is the optimized source plan (exprIds intact — the same plan
    ``capture_qe`` would see for a plain read); views for the catalog
    snapshot come from the analyzed child.

    Returns ``{"cap", "path", "table": (db, name) | None, "columns",
    "target": {"columns", "partition_cols", "location"} | None}`` —
    ``target`` is the TARGET table's own CatalogTable snapshot (declared
    schema incl. partition columns, resolved location) whenever the
    write lands in a catalog table. For INSERT INTO an existing table
    this is authoritative: resolution is by position, so the SOURCE
    plan's column names may legitimately differ from the target's
    declared columns, and the source schema also drops the partition
    spec.
    """
    got = capture_write_commands(qe)
    return got[0] if len(got) == 1 else None


def capture_write_commands(qe) -> list[dict]:
    """All file-writing commands of this execution. A plain INSERT/CTAS
    yields one entry; a Hive-style multi-insert statement
    (``FROM src INSERT INTO t1 ... INSERT INTO t2 ...``) optimizes to a
    ``Union`` of InsertIntoHadoopFsRelationCommand children — the Spark
    analog of the reference's multi-terminal operator DAG, where
    ``terminalOps`` finds several FileSinks fed by one shared scan
    (``OperatorGraphBuilder.scala:30-140``) — and yields one entry per
    sink. Empty list for non-write executions."""
    try:
        jroot = qe.optimizedPlan()
        if jroot.getClass().getSimpleName() == "Union":
            # analyzed plan mirrors the Union shape; pair children by
            # position so each sink's views come from ITS analyzed child
            jan = None
            try:
                cand = qe.analyzed()
                if (
                    cand.getClass().getSimpleName() == "Union"
                    and cand.children().size() == jroot.children().size()
                ):
                    jan = cand
            except Exception:  # noqa: BLE001
                pass
            out = []
            for i in range(jroot.children().size()):
                got = _capture_one_write(
                    jroot.children().apply(i),
                    jan.children().apply(i) if jan is not None else None,
                    qe,
                )
                if got is not None:
                    out.append(got)
            return out
        janalyzed = None
        try:
            janalyzed = qe.analyzed()
        except Exception:  # noqa: BLE001
            pass
        got = _capture_one_write(jroot, janalyzed, qe)
        return [got] if got is not None else []
    except Exception:  # noqa: BLE001 — a hook must never break queries
        return []


def _ident_pair(ident) -> tuple[str, str]:
    db = str(ident.database().get()) if ident.database().isDefined() else "default"
    return (db, str(ident.table()))


def _catalog_table_info(jtbl) -> dict:
    info: dict = {"columns": [], "partition_cols": [], "location": ""}
    try:
        jschema = jtbl.schema()
        for i in range(jschema.size()):
            f = jschema.apply(i)
            info["columns"].append((str(f.name()), str(f.dataType().simpleString())))
    except Exception:  # noqa: BLE001
        pass
    try:
        jp = jtbl.partitionColumnNames()
        info["partition_cols"] = [str(jp.apply(i)) for i in range(jp.size())]
    except Exception:  # noqa: BLE001
        pass
    try:
        jloc = jtbl.storage().locationUri()
        if jloc.isDefined():
            info["location"] = str(jloc.get().toString())
    except Exception:  # noqa: BLE001
        pass
    return info


def _capture_one_write(jcmd, janalyzed, qe) -> dict | None:
    """Capture a single write-command node (see capture_write_commands).
    ``janalyzed`` is the command's analyzed counterpart (or None)."""
    try:
        cls = jcmd.getClass().getSimpleName()
        table: tuple[str, str] | None = None
        target: dict | None = None
        if cls == "InsertIntoHadoopFsRelationCommand":
            out_path = str(jcmd.outputPath().toString())
            try:
                jopt = jcmd.catalogTable()
                if jopt.isDefined():
                    table = _ident_pair(jopt.get().identifier())
                    target = _catalog_table_info(jopt.get())
            except Exception:  # noqa: BLE001
                pass
        elif cls == "CreateDataSourceTableAsSelectCommand":
            # fresh CTAS: the catalog table is on THIS command (the inner
            # insert fires separately with catalogTable=None). The
            # command's own CatalogTable predates metastore registration
            # (location may be unassigned, schema comes from the query),
            # so re-read the registered table from the session catalog —
            # by onSuccess the create has committed.
            jtbl = jcmd.table()
            table = _ident_pair(jtbl.identifier())
            try:
                jmeta = (
                    qe.sparkSession().sessionState().catalog()
                    .getTableMetadata(jtbl.identifier())
                )
                target = _catalog_table_info(jmeta)
            except Exception:  # noqa: BLE001
                target = _catalog_table_info(jtbl)
            out_path = target["location"]
        else:
            return None
        jquery = jcmd.query()
        raw_logical = json.loads(jquery.toJSON())
        try:
            views = view_descriptors(json.loads(janalyzed.query().toJSON()))
        except Exception:  # noqa: BLE001
            views = []
        columns: list[tuple[str, str]] = []
        try:
            jschema = jquery.schema()
            for i in range(jschema.size()):
                f = jschema.apply(i)
                columns.append((str(f.name()), str(f.dataType().simpleString())))
        except Exception:  # noqa: BLE001
            pass
        cap = Captured(
            logical=parse_tree(raw_logical),
            physical=None,
            leaf_paths=leaf_scan_paths(jquery),
            logical_str=jquery.toString(),
            raw_logical=raw_logical,
            cached_plans=cached_subplans(jquery),
            views=views,
        )
        return {
            "cap": cap, "path": out_path, "table": table, "columns": columns,
            "target": target,
        }
    except Exception:  # noqa: BLE001 — a hook must never break queries
        return None


def capture_view_command(qe) -> dict | None:
    """If this execution is a CREATE VIEW command, capture the view's
    DEFINING plan (lineage of the view body at DDL time — a Hive hook
    sees DDL statements too) plus the catalog identity and original
    SQL. None for any other execution."""
    try:
        jcmd = qe.optimizedPlan()
        if jcmd.getClass().getSimpleName() != "CreateViewCommand":
            return None
        ident = jcmd.name()
        db = str(ident.database().get()) if ident.database().isDefined() else "default"
        name = str(ident.table())
        jtext = jcmd.originalText()
        view_sql = str(jtext.get()) if jtext.isDefined() else ""
        jplan = jcmd.plan()  # the ANALYZED defining plan
        raw_logical = json.loads(jplan.toJSON())
        columns: list[tuple[str, str]] = []
        try:
            jschema = jplan.schema()
            for i in range(jschema.size()):
                f = jschema.apply(i)
                columns.append((str(f.name()), str(f.dataType().simpleString())))
        except Exception:  # noqa: BLE001
            pass
        cap = Captured(
            logical=parse_tree(raw_logical),
            physical=None,
            leaf_paths=leaf_scan_paths(jplan),
            logical_str=jplan.toString(),
            raw_logical=raw_logical,
            views=view_descriptors(raw_logical),
        )
        return {"cap": cap, "name": name, "db": db, "viewSql": view_sql, "columns": columns}
    except Exception:  # noqa: BLE001 — a hook must never break queries
        return None


def capture(df: DataFrame) -> Captured:
    """Capture the query execution of ``df`` (after its action has run —
    AQE's final plan only exists post-execution, mirroring the reference
    being a *post*-exec hook)."""
    return capture_qe(df._jdf.queryExecution())


def capture_streaming_def(df: DataFrame) -> Captured:
    """Capture the DEFINITION of a streaming DataFrame (pre-execution):
    streaming plans cannot be optimized/executed outside writeStream, so
    this captures the analyzed plan — exprIds are already assigned there,
    which is all column lineage needs. Leaves are StreamingRelation nodes
    whose source path comes from the DataSource options."""
    qe = df._jdf.queryExecution()
    jlogical = qe.analyzed()
    raw_logical = json.loads(jlogical.toJSON())
    return Captured(
        logical=parse_tree(raw_logical),
        physical=None,
        leaf_paths=leaf_scan_paths(jlogical),
        logical_str=jlogical.toString(),
        raw_logical=raw_logical,
        views=view_descriptors(raw_logical),
    )


def capture_qe(qe) -> Captured:
    """Capture from a py4j QueryExecution handle directly — the form the
    QueryExecutionListener hook receives (≈ PostExecHook.run's HookContext
    parameter)."""
    jlogical = qe.optimizedPlan()
    raw_logical = json.loads(jlogical.toJSON())
    logical = parse_tree(raw_logical)
    leaf_paths = leaf_scan_paths(jlogical)
    cached = cached_subplans(jlogical)
    try:
        # views only survive in the ANALYZED plan (EliminateView inlines
        # them before optimization) — pull their catalog descriptors there
        views = view_descriptors(json.loads(qe.analyzed().toJSON()))
    except Exception:  # noqa: BLE001
        views = []
    try:
        physical = physical_graph(qe.executedPlan())
        physical_str = qe.executedPlan().toString()
    except Exception:  # noqa: BLE001
        physical = None
        physical_str = ""
    return Captured(
        logical=logical,
        physical=physical,
        leaf_paths=leaf_paths,
        logical_str=jlogical.toString(),
        physical_str=physical_str,
        raw_logical=raw_logical,
        cached_plans=cached,
        views=views,
    )


# -- logical plan → operator graph (for printing/normalize parity) -----------

_LOGICAL_KIND = {
    "LogicalRelation": "Scan",
    "InMemoryRelation": "Scan",
    "LogicalRDD": "Scan",
    "HiveTableRelation": "Scan",
    "DataSourceV2Relation": "Scan",
    "DataSourceV2ScanRelation": "Scan",
    "StreamingRelation": "Scan",
    "StreamingRelationV2": "Scan",
    "StreamingExecutionRelation": "Scan",
    "StreamingDataSourceV2Relation": "Scan",
    "StreamingDataSourceV2ScanRelation": "Scan",
    "EventTimeWatermark": "Watermark",
    "LocalRelation": "LocalScan",
    "OneRowRelation": "OneRow",
    "Filter": "Filter",
    "Project": "Project",
    "Aggregate": "Aggregate",
    "Join": "Join",
    "Window": "Window",
    "Sort": "Sort",
    "GlobalLimit": "GlobalLimit",
    "LocalLimit": "LocalLimit",
    "Union": "Union",
    "Expand": "Expand",
    "Generate": "Generate",
    "RepartitionByExpression": "Repartition",
    "Repartition": "Repartition",
}


def logical_graph(plan: PlanNode, leaf_tables: list[str] | None = None) -> GNode:
    """Convert the parsed logical plan into the lineage GNode graph, with
    per-operator detail blocks (≈ the reference's detail renderers,
    ``qinfo/OperatorInfo.scala:102-105,116-118,183-185,200-208,216-222``)."""
    leaf_iter = iter(leaf_tables or [])

    def go(p: PlanNode) -> GNode:
        kind = _LOGICAL_KIND.get(p.name, p.name)
        detail: dict[str, str] = {}
        if kind == "Scan":
            detail["table"] = next(leaf_iter, "")
        elif kind == "Filter":
            ts = expr_trees(p, "condition")
            if ts:
                detail["predicate"] = expr_summary(ts[0])
        elif kind == "Project":
            detail["columns"] = ", ".join(expr_summary(t, 40) for t in expr_trees(p, "projectList"))[:160]
        elif kind == "Aggregate":
            detail["keys"] = ", ".join(expr_summary(t, 30) for t in expr_trees(p, "groupingExpressions"))[:120]
            detail["aggs"] = ", ".join(expr_summary(t, 40) for t in expr_trees(p, "aggregateExpressions"))[:160]
        elif kind == "Join":
            jt = p.fields.get("joinType")
            detail["joinType"] = (
                jt.get("object", "").rsplit(".", 1)[-1].rstrip("$") if isinstance(jt, dict) else str(jt)
            )
            ts = expr_trees(p, "condition")
            if ts:
                detail["condition"] = expr_summary(ts[0])
        children = tuple(go(c) for c in p.children)
        return GNode(kind=kind, detail=tuple(detail.items()), children=children)

    return go(plan)
