"""Query-lineage hook — the rebuild of ``PostExecHook``
(``hivehook/.../hook/PostExecHook.scala:17-81``) and the offline path
(``hook/HivePlanUtils.scala:44-70``).

Pipeline per tracked query (mirrors SURVEY.md §3's six stages):

1. receive: ``track(df)`` after the action ran (post-exec hook moment)
2. catalog snapshot: leaf relations → TableDef/DirectoryDef in a Model
   (≈ ConvertHelper + locationMap, ``PostExecHook.scala:42-61``)
3. plan walk: optimized + final physical plan capture (``plans.capture``)
4. graph build + column lineage (``lineage.analyze``)
5. normalize: collapse exchanges / partial aggs / wrapper stages
   (``rules.normalize``)
6. emit: pretty tree + structured JSON (the reference only prints)

Cross-query stitching: when a tracked query reads a path that an earlier
tracked query wrote, the reader's column lineage composes through the
writer's — the Spark rebirth of the reference's sink-stack cross-task
stitching (``hook/OperatorGraphBuilder.scala:51-80``) keyed by the
location map exactly as ``PostExecHook.scala:43-61`` does.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from types import SimpleNamespace

from pyspark.sql import DataFrame

from .graph import GNode
from .lineage import UNKNOWN, Cell, LineageResult, analyze
from .metadata import DirectoryDef, Model, dir_fqn, table_from_columns
from .plans.capture import Captured, capture, capture_qe, logical_graph
from .rules import normalize


def default_table_resolver(path: str) -> str | None:
    """Map a scan root path to a table name: ``.../<name>.parquet`` →
    ``name`` (the TESTDATA layout), and the registry's µs-normalized
    scratch convention ``.scratch/<sf>/<name>_us/`` → ``name`` (streaming
    sources read that directory, not the file inside it); otherwise None
    (treated as a directory/temp input, like the reference's
    DirectoryDef). Versioned-table data files (``<table>/data/v*/part-*``
    with a ``_vlog`` commit log at the root — sources/vtable.py) resolve
    to the table root's name, checked FIRST so the ``.parquet`` file rule
    doesn't claim the individual part files."""
    local = re.sub(r"^file:/+", "/", path)
    # A path may contain several `/data/` components (a vtable can itself
    # live under a directory named `data`, e.g. /data/wh/t/data/v0/part);
    # the vtable root is the one whose parent holds `_vlog`. Scan
    # right-to-left so the deepest plausible root wins.
    sep_data = f"{os.sep}data{os.sep}"
    marker = local.rfind(sep_data)
    while marker != -1:
        vroot = local[:marker]
        if os.path.isdir(os.path.join(vroot, "_vlog")):
            return os.path.basename(vroot.rstrip(os.sep))
        marker = local.rfind(sep_data, 0, marker)
    base = os.path.basename(path.rstrip("/"))
    if base.endswith(".parquet"):
        return base[: -len(".parquet")]
    # µs-normalized scratch copies carry an optional cache-busting
    # version suffix (`events_us` → `events_us2` when the fixture's
    # layout changed in r16) — strip `_us<digits?>` as one unit
    m = re.match(r"(.+)_us\d*$", base)
    if m and ".scratch" in path:
        return m.group(1)
    # user_id-bucketed scratch layout (r17): `events_bkt32/` is the
    # same µs-normalized events table CLUSTERED BY user_id — strip the
    # `_bkt<buckets>` suffix so scans of the bucketed copy resolve to
    # the base table exactly as the flat copy did
    m = re.match(r"(.+)_bkt\d+$", base)
    if m and ".scratch" in path:
        return m.group(1)
    # the stored IVF index (operators/similarity._ivf_index_stored) is a
    # derived, fingerprint-tagged copy of its source table — the tag
    # encodes that table (`ivf_index_<table>_c..._m..._s..._v...`), so
    # resolve serve scans back to it and ss21's column lineage links the
    # served index to its true source instead of dead-ending at an
    # anonymous .scratch directory (or mis-attributing an index built
    # from a different table to `embeddings`)
    # tag grammar: ivf_index_<table>_c<N>_m<mtime>_s<size>[_<variant>]_v<V>
    # (the optional variant is ss23's base/delta slice — those served
    # scans must resolve to the source table too)
    m = re.match(r"ivf_index_(.+)_c\d+_m\d+_s\d+(?:_[a-z0-9]+)?_v\d+$", base)
    if m and ".scratch" in path:
        return m.group(1)
    # the WARC fixture shards (operators/web._warc_fixture) are the
    # named table re-serialized as WARC containers — resolve the
    # binaryFile scan back to that table so web09's lineage links the
    # ingested records to their source rows
    # tag grammar: warc_<table>_m<mtime>_s<size>_v<V> (the fingerprint
    # segments are the source parquet's snapshot identity — strip them)
    m = re.match(r"warc_(.+)_m\d+_s\d+_v\d+$", base)
    if m and ".scratch" in path:
        return m.group(1)
    return None


def _norm_path(p: str) -> str:
    return re.sub(r"^file:/+", "/", p).rstrip("/")


@dataclass
class QueryLineage:
    name: str
    captured: Captured
    logical: GNode
    physical: GNode | None
    normalized: GNode | None
    result: LineageResult
    output_path: str | None = None
    sql_text: str | None = None  # ≈ PostExecHook printing queryPlan.getQueryStr
    command_type: str = "QUERY"  # ≈ hookContext command type (QUERY/INSERT)
    # versioned-table sink info (set by track_write_vtable): commit
    # version + op, surfaced as OpenLineage datasetVersion/lifecycle
    vtable_version: int | None = None
    vtable_op: str | None = None

    def column_map(self) -> dict[str, set[Cell]]:
        return self.result.column_map()

    def report(self) -> str:
        """≈ PostExecHook's emit (``PostExecHook.scala:73-79``): query name,
        operator tree, normalized graph, and per-column lineage."""
        lines = [f"=== query: {self.name} [{self.command_type}] ==="]
        if self.sql_text:
            lines.append(f"  {self.sql_text.strip()[:200]}")
        lines.append("--- logical operator graph ---")
        lines.append(self.logical.tree_string())
        if self.normalized is not None:
            lines.append("--- normalized physical graph ---")
            lines.append(self.normalized.tree_string(details=False))
        lines.append("--- column lineage ---")
        for c in self.result.columns:
            bases = ", ".join(sorted(f"{t}.{col}" for t, col in c.bases))
            lines.append(f"  {c.name} <- {bases}")
        if self.result.indirect:
            lines.append(
                "  [indirect] "
                + ", ".join(sorted(f"{t}.{c}" for t, c in self.result.indirect))
            )
        if self.output_path:
            lines.append(f"--- output: {self.output_path}")
        return "\n".join(lines)

    def to_json(self) -> str:
        doc = {
            "query": self.name,
            "lineage": self.result.to_dict(),
            "logicalGraph": self.logical.to_dict(),
            "normalizedPhysicalGraph": self.normalized.to_dict() if self.normalized else None,
            "outputPath": self.output_path,
        }
        return json.dumps(doc, indent=2)

    def to_openlineage(self, namespace: str = "spark", model=None) -> dict:
        """Emit the lineage as an OpenLineage-shaped RunEvent dict (the
        open spec at openlineage.io: job + inputs/outputs datasets +
        columnLineage facet), so the analyzer plugs into OL-compatible
        catalogs without translation. Facets carried: column lineage per
        output field (inputFields = this engine's base cells) and the
        unknown-source sentinel dropped (OL has no '?' convention).
        Pass the tracker's ``model`` to also attach each input dataset's
        OL schema facet from its snapshotted TableDef (name + dataType
        per field — the catalog half of the event)."""
        fields = {}
        for c in self.result.columns:
            ins = [
                {"namespace": namespace, "name": t, "field": col}
                for t, col in sorted(c.bases)
                if t != "?"
            ]
            fields[c.name] = {
                "inputFields": ins,
                "transformationType": c.role.upper(),
            }
        inputs = []
        for t in self.result.input_tables:
            ds: dict = {"namespace": namespace, "name": t}
            if model is not None:
                from .metadata import TableDef

                td = model.get(f"default@{t}", TableDef)
                if td is not None and td.columns:
                    ds["facets"] = {
                        "schema": {
                            "fields": [
                                {"name": c.name, "type": c.data_type}
                                for c in td.columns
                            ]
                        }
                    }
            inputs.append(ds)
        outputs = []
        if self.output_path:
            out_facets: dict = {"columnLineage": {"fields": fields}}
            if self.vtable_version is not None:
                # OL datasetVersion facet: a vtable commit IS a concrete
                # dataset version; an overwrite additionally resets the
                # snapshot (lifecycleStateChange has no append value, so
                # plain appends carry the version facet only)
                out_facets["version"] = {"datasetVersion": str(self.vtable_version)}
                if self.vtable_op == "overwrite":
                    out_facets["lifecycleStateChange"] = {
                        "lifecycleStateChange": "OVERWRITE"
                    }
            outputs.append(
                {
                    "namespace": namespace,
                    "name": self.output_path,
                    "facets": out_facets,
                }
            )
        return {
            "eventType": "COMPLETE",
            "job": {"namespace": namespace, "name": self.name},
            "inputs": inputs,
            "outputs": outputs,
            "run": {
                "facets": {
                    "columnLineage": {"fields": fields},
                    "processing_engine": {"name": "hive_lineage_spark"},
                }
            },
        }


class _MergedWriter:
    """Union of multiple tracked commits to the same versioned table:
    reads of a vtable snapshot built from several append commits stitch
    to EVERY contributing writer, not just the last one. Duck-types the
    writer surface the stitchers use (column_map / result.input_tables /
    logical)."""

    def __init__(self, writers: list[QueryLineage]):
        self.writers = writers

    def column_map(self) -> dict[str, frozenset]:
        out: dict[str, frozenset] = {}
        for w in self.writers:
            for c, bases in w.column_map().items():
                out[c] = out.get(c, frozenset()) | bases
        return out

    @property
    def result(self):
        tables = sorted({t for w in self.writers for t in w.result.input_tables})
        return SimpleNamespace(input_tables=tables)

    @property
    def logical(self) -> GNode:
        if len(self.writers) == 1:
            return self.writers[0].logical
        return GNode(kind="Union", detail=(), children=tuple(w.logical for w in self.writers))


@dataclass
class LineageTracker:
    """Driver-side lineage session (≈ the installed PostExecHook)."""

    table_resolver: object = default_table_resolver
    model: Model = field(default_factory=Model)
    queries: list[QueryLineage] = field(default_factory=list)
    # location map: normalized written path (or resolved table name) → the
    # QueryLineage (or _MergedWriter) that wrote it
    location_map: dict[str, QueryLineage] = field(default_factory=dict)
    # versioned-table commit writers by table name, in commit order
    _vtable_writers: dict[str, list[QueryLineage]] = field(default_factory=dict)

    # -- step 2: catalog snapshot -------------------------------------------

    def _leaf_tables(self, cap: Captured) -> list[str]:
        names: list[str] = []
        leaves = [p for p in cap.logical.walk() if not p.children]
        for i, paths in enumerate(cap.leaf_paths):
            name = None
            for p in paths:
                name = self.table_resolver(_norm_path(p))
                if name:
                    break
            if name is None and paths:
                name = _norm_path(paths[0])
            if name is None and i < len(leaves):
                if leaves[i].name == "InMemoryRelation":
                    name = f"cache:{i}"
                elif leaves[i].name == "LogicalRDD":
                    name = f"checkpoint:{i}"
            names.append(name or f"<leaf{i}>")
        return names

    def _snapshot(self, cap: Captured, leaf_tables: list[str]) -> None:
        from .plans.jsonplan import expr_trees

        leaves = [p for p in cap.logical.walk() if not p.children]
        for leaf_plan, name, paths in zip(leaves, leaf_tables, cap.leaf_paths):
            cols = [
                (t[0].get("name", "?"), str(t[0].get("dataType", "?")))
                for t in expr_trees(leaf_plan, "output")
            ]
            location = _norm_path(paths[0]) if paths else ""
            table = table_from_columns(name, location, cols)
            part_cols, parts = self._discover_partitions(name, location)
            if part_cols:
                from dataclasses import replace

                table = replace(table, partition_columns=tuple(part_cols))
                for p in parts:
                    self.model.add(p)
            self.model.add(table)

    def _snapshot_views(self, cap: Captured) -> list[str]:
        """Register every catalog VIEW the query traversed (reference
        parity: ``ConvertHelper.scala:67-73`` stores the
        (viewOriginalText, viewExpandedText) pair on TableDef). The
        descriptors come from the ANALYZED plan's View nodes (captured
        in ``Captured.views`` — the optimizer inlines the view body, so
        column lineage keeps resolving to the BASE tables; the view is a
        catalog entity, not a lineage boundary)."""
        from dataclasses import replace

        names: list[str] = []
        for v in cap.views:
            cols = [(n, t) for n, t in v.get("columns", [])]
            t = table_from_columns(v["name"], location="", cols=cols, db=v.get("db", "default"))
            t = replace(
                t,
                table_type="view",
                view_sql=v.get("viewSql", ""),
                view_sql_expanded=v.get("viewSqlExpanded", ""),
                params=(("isTempView", str(v.get("isTemp", False))),),
            )
            self.model.add(t)
            names.append(v["name"])
        return names

    def _discover_partitions(self, table: str, location: str):
        """Hive-style ``key=value`` partition discovery at the scan root —
        the rebuild of ConvertHelper's db→table→partition cascade
        (``ConvertHelper.scala:144-164``): each partition directory becomes
        a PartitionDef registered in the Model."""
        from .metadata import PartitionDef, partition_fqn

        part_cols: list[str] = []
        parts: list[PartitionDef] = []
        if not location or not os.path.isdir(location):
            return part_cols, parts
        try:
            subdirs = sorted(
                d for d in os.listdir(location)
                if "=" in d and os.path.isdir(os.path.join(location, d))
            )
        except OSError:
            return part_cols, parts
        for d in subdirs:
            key, _, value = d.partition("=")
            if key not in part_cols:
                part_cols.append(key)
            parts.append(
                PartitionDef(
                    fqn=partition_fqn("default", table, d),
                    table_fqn=f"default@{table}",
                    values=(value,),
                    location=os.path.join(location, d),
                )
            )
        return part_cols, parts

    # -- steps 1,3-6 ---------------------------------------------------------

    def track(
        self,
        df: DataFrame,
        name: str = "query",
        sql_text: str | None = None,
        declared: dict[str, list[str]] | None = None,
    ) -> QueryLineage:
        """Capture lineage of an executed DataFrame query. ``declared``
        upgrades Python-UDF barrier outputs with operator-authored
        column mappings (see ``lineage.analyze``) — provenance is marked
        ``declared``, never conflated with engine-proven edges."""
        ql = self.track_captured(capture(df), name, declared=declared)
        ql.sql_text = sql_text
        return ql

    def track_qe(self, jqe, name: str = "query") -> QueryLineage:
        """Track from a py4j QueryExecution handle (what the listener gets)."""
        return self.track_captured(capture_qe(jqe), name)

    def track_write_qe(self, jqe, name: str = "insert") -> QueryLineage | None:
        """Track a file-writing command execution: lineage of the SOURCE
        plan, with the command's output path registered in the location
        map so later tracked reads stitch through it — the automatic
        analog of ``track_write`` (reference parity: PostExecHook gets
        WriteEntity outputs in its HookContext, ``PostExecHook.scala:18-27``).
        Covers ``df.write.save`` to a path, ``saveAsTable`` (CTAS),
        ``INSERT INTO``, and Hive-style multi-insert (``FROM src INSERT
        INTO t1 ... INSERT INTO t2 ...`` — one shared scan, several
        sinks, the reference's multi-terminal DAG where ``terminalOps``
        yields several FileSinks). The latter cases also snapshot each
        TARGET catalog table (name + schema + warehouse location) as a
        TableDef, the WriteEntity→Def conversion of the reference. A
        multi-insert tracks one QueryLineage per sink, suffixed
        ``:sink<i>``; the first is returned. None if the execution isn't
        a write command."""
        from .plans.capture import capture_write_commands

        sinks = capture_write_commands(jqe)
        if not sinks:
            return None
        first: QueryLineage | None = None
        for i, got in enumerate(sinks):
            ql = self.track_captured(
                got["cap"], name if len(sinks) == 1 else f"{name}:sink{i}"
            )
            ql.command_type = "INSERT"
            ql.output_path = _norm_path(got["path"]) if got["path"] else None
            if ql.output_path:
                self.model.add(DirectoryDef(fqn=dir_fqn(ql.output_path), path=ql.output_path))
                self.location_map[ql.output_path] = ql
            if got["table"] is not None:
                from dataclasses import replace

                db, tname = got["table"]
                target = got.get("target") or {}
                # the target's own CatalogTable is authoritative: INSERT
                # INTO resolves by position (source aliases may differ
                # from the declared columns) and the source schema drops
                # the partition spec; the catalog also carries the
                # resolved location.
                loc = _norm_path(target["location"]) if target.get("location") else (ql.output_path or "")
                cols = target.get("columns") or got["columns"]
                t = table_from_columns(tname, loc, cols, db=db)
                if target.get("partition_cols"):
                    t = replace(t, partition_columns=tuple(target["partition_cols"]))
                self.model.add(t)
            first = first or ql
        return first

    def track_stream_write_def(
        self, df: DataFrame, root: str, name: str = "stream-writer"
    ) -> QueryLineage:
        """Register a STREAMING query as the lineage writer of a
        versioned table it sinks into (streaming/events.stream_to_vtable).
        Inside foreachBatch the per-batch DataFrame is RDD-backed — its
        plan bottoms out at a checkpoint boundary, not the stream's
        sources — so the writer lineage comes from the stream DEFINITION,
        whose StreamingRelation leaves resolve to the source tables.
        Later tracked batch reads of the table stitch through it."""
        ql = self.track_stream_def(df, name)
        ql.command_type = "STREAM_INSERT"
        ql.output_path = _norm_path(root)
        key = os.path.basename(ql.output_path)
        self._vtable_writers[key] = [ql]
        self.location_map[key] = ql
        self.model.add(DirectoryDef(fqn=dir_fqn(ql.output_path), path=ql.output_path))
        return ql

    def track_stream_def(self, df: DataFrame, name: str = "stream") -> QueryLineage:
        """Track the DEFINITION of a streaming DataFrame before (or
        without) running it: column lineage from the analyzed plan, with
        StreamingRelation leaves resolved to their source tables. The
        per-micro-batch runtime analog is ``install_streaming``."""
        from .plans.capture import capture_streaming_def

        ql = self.track_captured(capture_streaming_def(df), name)
        ql.command_type = "STREAM"
        return ql

    def track_view_qe(self, jqe, name: str = "create-view") -> QueryLineage | None:
        """Track a CREATE VIEW execution: the view's DEFINING plan is
        analyzed (column provenance of the view body at DDL time) and
        the view registered as a catalog TableDef with its original
        SQL — the DDL half of the reference hook's coverage. None if
        the execution isn't a CREATE VIEW."""
        from dataclasses import replace

        from .plans.capture import capture_view_command

        got = capture_view_command(jqe)
        if got is None:
            return None
        ql = self.track_captured(got["cap"], name)
        ql.command_type = "CREATE_VIEW"
        ql.sql_text = got["viewSql"]
        t = table_from_columns(got["name"], location="", cols=got["columns"], db=got["db"])
        self.model.add(replace(t, table_type="view", view_sql=got["viewSql"]))
        return ql

    # -- live hook: automatic capture of every query -------------------------

    def install(self, spark) -> None:
        """Register this tracker as a real QueryExecutionListener — the
        direct analog of installing the reference as a Hive post-exec hook
        (``PostExecHook`` registered via hive.exec.post.hooks). Every
        successful query on the session is captured automatically; the
        listener bus invokes us asynchronously, so tests should poll
        ``queries``. Implemented from Python via the py4j callback server."""
        from pyspark.java_gateway import ensure_callback_server_started

        ensure_callback_server_started(spark.sparkContext._gateway)
        tracker = self

        class _PyQueryExecutionListener:
            def onSuccess(self, func_name, qe, duration_ns):  # noqa: N802 — Java iface
                try:
                    # commands first: writes register their output path
                    # for stitching, CREATE VIEW snapshots the view def;
                    # everything else is a plain query capture
                    nm = f"auto:{func_name}"
                    if (
                        tracker.track_write_qe(qe, name=nm) is None
                        and tracker.track_view_qe(qe, name=nm) is None
                    ):
                        tracker.track_qe(qe, name=nm)
                except Exception:  # noqa: BLE001 — a hook must never break queries
                    pass

            def onFailure(self, func_name, qe, exception):  # noqa: N802
                pass

            class Java:
                implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

        self._jlistener = _PyQueryExecutionListener()
        spark._jsparkSession.listenerManager().register(self._jlistener)

    def uninstall(self, spark) -> None:
        if getattr(self, "_jlistener", None) is not None:
            spark._jsparkSession.listenerManager().unregister(self._jlistener)
            self._jlistener = None

    def track_stream_query(self, query, name: str = "stream") -> QueryLineage | None:
        """Deterministically capture the LAST COMPLETED micro-batch of a
        streaming query (valid during the run or after stop — the py4j
        handle outlives termination). Each micro-batch's
        IncrementalExecution is a full QueryExecution whose sources are
        materialized as batch relations over that batch's files, so the
        normal capture path applies. Pair with ``trigger(once=True)``
        when "last batch" must mean "the batch with all the data" —
        processAllAvailable and availableNow both follow the data batch
        with an empty watermark-flush batch, which would then be the last
        execution. Returns None before any batch ran."""
        le = query._jsq.streamingQuery().lastExecution()
        if le is None:
            return None
        batch_id = le.currentBatchId()
        ql = self.track_qe(le, name=f"{name}:batch{batch_id}")
        ql.command_type = "STREAM"
        return ql

    def install_streaming(self, spark) -> None:
        """Register a StreamingQueryListener that captures micro-batch
        lineage automatically: batch QueryExecutionListeners never see
        streaming queries, so this is the streaming half of ``install``.
        On each progress event the active query's ``lastExecution`` feeds
        ``track_qe``, tagged ``stream:<query>:batch<actual-batch-id>``.
        The listener bus is asynchronous, so a fast follow-up batch can
        replace ``lastExecution`` before the event is handled — captures
        are per-batch SAMPLES (deduped by batch id), not a guaranteed
        log; use ``track_stream_query`` for a deterministic capture.
        Best-effort by design: a hook must never break the stream."""
        from pyspark.sql.streaming import StreamingQueryListener

        tracker, session = self, spark
        seen: set[tuple[str, int]] = set()

        class _StreamLineageListener(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802
                pass

            def onQueryProgress(self, event):  # noqa: N802
                try:
                    p = event.progress
                    q = session.streams.get(str(p.id))
                    if q is None:
                        return
                    le = q._jsq.streamingQuery().lastExecution()
                    if le is None:
                        return
                    batch_id = le.currentBatchId()
                    key = (str(p.id), batch_id)
                    if key in seen:
                        return
                    seen.add(key)
                    label = p.name or str(p.id)[:8]
                    ql = tracker.track_qe(le, name=f"stream:{label}:batch{batch_id}")
                    ql.command_type = "STREAM"
                except Exception:  # noqa: BLE001 — never break the stream
                    pass

            def onQueryIdle(self, event):  # noqa: N802
                pass

            def onQueryTerminated(self, event):  # noqa: N802
                pass

        self._stream_listener = _StreamLineageListener()
        spark.streams.addListener(self._stream_listener)

    def uninstall_streaming(self, spark) -> None:
        if getattr(self, "_stream_listener", None) is not None:
            spark.streams.removeListener(self._stream_listener)
            self._stream_listener = None

    def track_offline(self, path: str, name: str = "replay") -> QueryLineage:
        """Offline plan replay: analyze a plan saved with Captured.save —
        no SparkSession needed (≈ the reference's plan-replay tests,
        ``BasicTest.scala:14-33``)."""
        from .plans.capture import load_captured

        return self.track_captured(load_captured(path), name)

    def track_captured(
        self,
        cap: Captured,
        name: str = "query",
        declared: dict[str, list[str]] | None = None,
    ) -> QueryLineage:
        leaf_tables = self._leaf_tables(cap)
        self._snapshot(cap, leaf_tables)
        views = self._snapshot_views(cap)

        logical = logical_graph(cap.logical, leaf_tables)
        result = analyze(cap.logical, leaf_tables, declared=declared)
        if views:
            result.notes.append("through views: " + ", ".join(sorted(views)))
        normalized = normalize(cap.physical) if cap.physical is not None else None

        # resolve lineage through .persist() caches (Spark keeps only the
        # cached PHYSICAL plan — exprId-compatible, so analyze() handles it)
        result = self._stitch_caches(result, leaf_tables, cap, declared=declared)
        # cross-query stitching via the location map
        result = self._stitch_columns(result, leaf_tables, cap)
        logical = self._stitch_graph(logical)

        ql = QueryLineage(
            name=name,
            captured=cap,
            logical=logical,
            physical=cap.physical,
            normalized=normalized,
            result=result,
        )
        self.queries.append(ql)
        return ql

    def track_write(
        self, df: DataFrame, path: str, name: str = "insert", fmt: str = "parquet", mode: str = "overwrite", partition_by: list[str] | None = None
    ) -> QueryLineage:
        """Write ``df`` to ``path`` and record it as a lineage sink
        (FileSink analog). Later tracked reads of ``path`` stitch to it."""
        writer = df.write.format(fmt).mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        ql = self.track(df, name=name)
        ql.command_type = "INSERT"
        ql.output_path = _norm_path(path)
        self.model.add(DirectoryDef(fqn=dir_fqn(ql.output_path), path=ql.output_path))
        self.location_map[ql.output_path] = ql
        return ql

    def track_write_vtable(
        self,
        df: DataFrame,
        root: str,
        mode: str = "append",
        stats_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
        name: str = "vtable-commit",
    ) -> QueryLineage:
        """Commit ``df`` to a versioned table (sources/vtable.py) and
        record the commit as a lineage sink. Later tracked reads of the
        table stitch to the UNION of tracked commits (a snapshot built
        from several appends has several writers); an overwrite commit
        resets the writer set, matching snapshot semantics. The map is
        keyed by the resolved table name — the same name
        ``default_table_resolver`` gives the table's data files at read
        time."""
        from .sources.vtable import write_vtable

        version = write_vtable(
            df, root, mode=mode, stats_cols=stats_cols, partition_by=partition_by
        )
        ql = self.track(df, name=f"{name}:v{version}")
        ql.command_type = "INSERT"
        ql.output_path = _norm_path(root)
        ql.vtable_version = version
        ql.vtable_op = mode
        key = os.path.basename(ql.output_path)
        writers = self._vtable_writers.setdefault(key, [])
        if mode == "overwrite":
            writers.clear()
        writers.append(ql)
        self.location_map[key] = (
            ql if len(writers) == 1 else _MergedWriter(list(writers))
        )
        self.model.add(DirectoryDef(fqn=dir_fqn(ql.output_path), path=ql.output_path))
        if partition_by:
            # reference parity: every partition becomes a PartitionDef
            # (ConvertHelper's table→partition cascade). vtable partitions
            # span commit directories, so the def is logical (values, no
            # single location) — the manifest is the location authority.
            from .metadata import PartitionDef, partition_fqn
            from .sources.vtable import _replay

            _, active, _ = _replay(ql.output_path)
            seen: set[str] = set()
            for meta in active.values():
                pv = meta.get("partition")
                if not pv:
                    continue
                part_name = "/".join(f"{k}={pv[k]}" for k in partition_by if k in pv)
                if part_name in seen:
                    continue
                seen.add(part_name)
                self.model.add(
                    PartitionDef(
                        fqn=partition_fqn("default", key, part_name),
                        table_fqn=f"default@{key}",
                        values=tuple(pv[k] for k in partition_by if k in pv),
                        location="",
                    )
                )
        return ql

    # -- stitching ------------------------------------------------------------

    def _resolve_cache_doc(self, doc: dict, declared: dict[str, list[str]] | None = None):
        """Analyze one captured cache doc, recursing into caches built over
        caches (``nested``), so a multi-level persisted index pipeline
        still resolves to base tables. ``declared`` flows into the cached
        subplan's analysis so a Python barrier INSIDE a persisted frame
        (mm21's cached pHash table) resolves exactly as it would
        unpersisted. Returns
        (column_map, ordered output names, input tables, indirect cells) —
        with every nested-cache marker already rewritten away."""
        from .plans.jsonplan import expr_trees, parse_tree

        sub_plan = parse_tree(doc["raw"])
        sub_leaves = [p for p in sub_plan.walk() if not p.children]
        nested = {int(k): v for k, v in (doc.get("nested") or {}).items()}
        sub_tables: list[str] = []
        for j, paths in enumerate(doc.get("leafPaths", [])):
            name = None
            for p in paths:
                name = self.table_resolver(_norm_path(p))
                if name:
                    break
            if name is None and paths:
                name = _norm_path(paths[0])
            if name is None and j in nested:
                name = f"<nestedcache{j}>"
            sub_tables.append(name or f"<cacheleaf{j}>")
        sub_res = analyze(sub_plan, sub_tables, declared=declared)
        colmap = {k: set(v) for k, v in sub_res.column_map().items()}
        ordered = [c.name for c in sub_res.columns]
        declared_names = {
            c.name for c in sub_res.columns if getattr(c, "role", None) == "declared"
        }
        inputs = list(sub_res.input_tables)
        indirect: set[Cell] = set(sub_res.indirect)
        for j, ndoc in nested.items():
            marker = f"<nestedcache{j}>"
            nmap, nordered, ninputs, nindirect, ndeclared = self._resolve_cache_doc(
                ndoc, declared
            )
            # positional mapping, same rationale as the top level: the
            # InMemoryTableScan's output attr names may be re-aliased
            # copies of the nested cached plan's outputs
            leaf_names = []
            if j < len(sub_leaves):
                trees = (
                    expr_trees(sub_leaves[j], "output")
                    or expr_trees(sub_leaves[j], "attributes")
                )
                leaf_names = [t[0].get("name", "?") for t in trees]
            positional = {
                ln: nmap.get(sn, {UNKNOWN}) for ln, sn in zip(leaf_names, nordered)
            }
            lut = {**nmap, **positional}

            def rw(cells: set[Cell]) -> set[Cell]:
                out: set[Cell] = set()
                for t, c in cells:
                    if t == marker:  # noqa: B023 — consumed before next iteration
                        out.update(lut.get(c, {UNKNOWN}))  # noqa: B023
                    else:
                        out.add((t, c))
                return out

            # a sub column fed by a declared nested-cache column is itself
            # only declared-strength provenance
            declared_names |= {
                k for k, v in colmap.items()
                if any(t == marker and c in ndeclared for t, c in v)
            }
            colmap = {k: rw(v) for k, v in colmap.items()}
            indirect = rw(indirect) | set(nindirect)
            inputs = [t for t in inputs if t != marker] + list(ninputs)
        return colmap, ordered, sorted(set(inputs)), frozenset(indirect), declared_names

    def _stitch_caches(
        self,
        result: LineageResult,
        leaf_tables: list[str],
        cap: Captured,
        declared: dict[str, list[str]] | None = None,
    ) -> LineageResult:
        """Replace ``cache:<i>`` base cells with the lineage of the cached
        physical subplan (captured at plan-capture time) — the analog of
        resolving through the reference's intermediate TempFileDef scans."""
        if not cap.cached_plans:
            return result
        from .plans.jsonplan import expr_trees

        leaves = [p for p in cap.logical.walk() if not p.children]
        sub_maps: dict[str, dict[str, set[Cell]]] = {}
        sub_inputs: dict[str, list[str]] = {}
        sub_declared: dict[str, set[str]] = {}
        for idx, doc in cap.cached_plans.items():
            by_name, sub_cols, sub_in, sub_indirect, sub_decl = self._resolve_cache_doc(
                doc, declared
            )
            # map by POSITION: when a cached relation is instantiated twice
            # (self-joins), Spark re-aliases the later occurrence's output
            # attributes, so the leaf names need not match the cached
            # plan's output names — positions always correspond.
            leaf_names = [
                t[0].get("name", "?") for t in expr_trees(leaves[idx], "output")
            ] if idx < len(leaves) else []
            positional = {
                ln: by_name.get(sn, {UNKNOWN})
                for ln, sn in zip(leaf_names, sub_cols)
            }
            # checkpoint_tracked docs live in cached_plans too — their
            # base cells carry the checkpoint:<idx> marker instead
            marker = (
                f"checkpoint:{idx}"
                if idx < len(leaves) and leaves[idx].name == "LogicalRDD"
                else f"cache:{idx}"
            )
            sub_maps[marker] = {**by_name, **positional}
            sub_inputs[marker] = sub_in
            # positional aliases of declared sub columns are declared too
            sub_declared[marker] = sub_decl | {
                ln for ln, sn in zip(leaf_names, sub_cols) if sn in sub_decl
            }
            result.indirect = frozenset(result.indirect | sub_indirect)

        def rewrite(cells: frozenset[Cell]) -> frozenset[Cell]:
            out: set[Cell] = set()
            for t, c in cells:
                if t in sub_maps:
                    out.update(sub_maps[t].get(c, {UNKNOWN}))
                else:
                    out.add((t, c))
            return frozenset(out)

        for col in result.columns:
            # a column fed by a declared edge inside the cached plan is
            # only declared-strength provenance — surface the downgrade
            if any(
                t in sub_declared and c in sub_declared[t] for t, c in col.bases
            ):
                col.role = "declared"
            col.bases = rewrite(col.bases)
        result.indirect = rewrite(result.indirect)
        new_inputs: list[str] = []
        for t in result.input_tables:
            new_inputs.extend(sub_inputs.get(t, [t]))
        result.input_tables = sorted(set(new_inputs))
        result.notes.append("resolved through caches: " + ", ".join(sorted(sub_maps)))
        return result

    def _writer_for_table(self, table: str) -> QueryLineage | None:
        return self.location_map.get(_norm_path(table))

    def _stitch_columns(self, result: LineageResult, leaf_tables: list[str], cap: Captured) -> LineageResult:
        """Compose column lineage through earlier tracked writes: a base
        cell (written_path, col) is replaced by the writer query's own base
        set for ``col`` (≈ FileSink→TableScan edge,
        ``OperatorGraphBuilder.scala:51-80``)."""
        stitched_tables = {t: self._writer_for_table(t) for t in leaf_tables}
        if not any(stitched_tables.values()):
            return result

        def rewrite(cells: frozenset[Cell]) -> frozenset[Cell]:
            out: set[Cell] = set()
            for t, c in cells:
                writer = stitched_tables.get(t)
                if writer is None:
                    out.add((t, c))
                else:
                    out.update(writer.column_map().get(c, {UNKNOWN}))
            return frozenset(out)

        for col in result.columns:
            col.bases = rewrite(col.bases)
        result.indirect = rewrite(result.indirect)
        new_inputs = []
        for t in result.input_tables:
            w = stitched_tables.get(t)
            new_inputs.extend(w.result.input_tables if w else [t])
        result.input_tables = sorted(set(new_inputs))
        result.notes.append(
            "stitched through: " + ", ".join(sorted(t for t, w in stitched_tables.items() if w))
        )
        return result

    def _stitch_graph(self, logical: GNode) -> GNode:
        """Graft the writer query's operator graph under scans of written
        paths, then let normalize() splice the intermediate scan."""

        def rule(n: GNode) -> GNode:
            if n.kind != "Scan":
                return n
            table = dict(n.detail).get("table", "")
            writer = self._writer_for_table(table)
            if writer is None:
                return n
            return GNode(
                kind="Scan",
                detail=(("table", ""), ("stitchedFrom", table)),
                children=(writer.logical,),
            )

        return logical.transform_up(rule)

    # -- emit ------------------------------------------------------------------

    def report(self) -> str:
        return "\n\n".join(q.report() for q in self.queries)
