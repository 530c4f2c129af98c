"""Lineage-analyzer integration tests — the rebuild's replacement for the
reference's print-only plan-replay tests (``BasicTest.scala:13-33``), with
real assertions: per-query column→base-column maps, input tables, graph
normalization parity, and FileSink→TableScan stitching.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_lineage_spark.hook import LineageTracker

SF = "/root/testdata/sf0.001"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "test_lineage")


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def _track(spark, df, name="q"):
    df.collect()
    return LineageTracker().track(df, name=name)


def test_scan_lineage_q1_shape(spark):
    """q1.plan parity: SELECT * FROM t — every output column maps to its
    own base column, input table resolved from the scan path."""
    ql = _track(spark, _t(spark, "region"), "full_scan")
    assert ql.result.input_tables == ["region"]
    cmap = ql.column_map()
    assert cmap["r_regionkey"] == {("region", "r_regionkey")}
    assert cmap["r_name"] == {("region", "r_name")}


def test_project_alias_and_expression_lineage(spark):
    li = _t(spark, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    ql = _track(spark, li)
    cmap = ql.column_map()
    assert cmap["okey"] == {("lineitem", "l_orderkey")}
    assert cmap["net"] == {("lineitem", "l_extendedprice"), ("lineitem", "l_discount")}


def test_filter_contributes_indirect_lineage(spark):
    df = _t(spark, "orders").filter(F.col("o_totalprice") > 1000).select("o_orderkey")
    ql = _track(spark, df)
    assert ("orders", "o_totalprice") in ql.result.indirect
    assert ql.column_map()["o_orderkey"] == {("orders", "o_orderkey")}


def test_join_agg_lineage(spark):
    li, o = _t(spark, "lineitem"), _t(spark, "orders")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ql = _track(spark, df)
    cmap = ql.column_map()
    assert cmap["o_orderstatus"] == {("orders", "o_orderstatus")}
    assert cmap["qty"] == {("lineitem", "l_quantity")}
    assert set(ql.result.input_tables) == {"lineitem", "orders"}
    # join keys are indirect lineage
    assert ("lineitem", "l_orderkey") in ql.result.indirect
    assert ("orders", "o_orderkey") in ql.result.indirect


def test_self_join_lineage_not_confused(spark):
    """The reference's 'unique column wins' heuristic is wrong on
    self-joins (``SchemaMapping.scala:116-121``); exprIds keep the two
    sides apart (documented divergence — SURVEY.md §7)."""
    n1 = _t(spark, "nation").select(F.col("n_nationkey").alias("a"), F.col("n_regionkey").alias("r1"))
    n2 = _t(spark, "nation").select(F.col("n_nationkey").alias("b"), F.col("n_regionkey").alias("r2"))
    df = n1.join(n2, n1.r1 == n2.r2).select("a", "b")
    ql = _track(spark, df)
    cmap = ql.column_map()
    assert cmap["a"] == {("nation", "n_nationkey")}
    assert cmap["b"] == {("nation", "n_nationkey")}
    # input tables are a SET (Hive ReadEntity semantics): a self-join
    # reads nation through two leaves but reports it once
    assert ql.result.input_tables == ["nation"]


def test_union_positionwise_lineage(spark):
    c = _t(spark, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, "supplier").select(F.col("s_nationkey").alias("k"))
    ql = _track(spark, c.union(s))
    assert ql.column_map()["k"] == {("customer", "c_nationkey"), ("supplier", "s_nationkey")}


def test_rollup_expand_lineage(spark):
    li = _t(spark, "lineitem")
    df = li.rollup("l_returnflag").agg(F.sum("l_quantity").alias("sq"))
    ql = _track(spark, df)
    cmap = ql.column_map()
    assert cmap["sq"] == {("lineitem", "l_quantity")}
    assert ("lineitem", "l_returnflag") in cmap["l_returnflag"]


def test_window_lineage(spark):
    from pyspark.sql import Window as W

    o = _t(spark, "orders")
    df = o.select(
        "o_orderkey",
        F.row_number().over(W.partitionBy("o_custkey").orderBy("o_totalprice")).alias("rk"),
    )
    ql = _track(spark, df)
    assert ql.column_map()["o_orderkey"] == {("orders", "o_orderkey")}
    # partition/order columns influence the window result
    assert ("orders", "o_custkey") in ql.result.indirect
    assert ("orders", "o_totalprice") in ql.result.indirect


def test_q27_shape_flagship_lineage(spark):
    """Golden lineage for the flagship query (SURVEY.md §2.4 item 10)."""
    from hive_lineage_spark.operators.relational import q17_q27_shape

    df = q17_q27_shape(spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name="q27_shape")
    cmap = ql.column_map()
    assert cmap["agg1"] == {("lineitem", "l_quantity")}
    assert cmap["agg2"] == {("lineitem", "l_extendedprice")}
    assert cmap["agg3"] == {("lineitem", "l_discount")}
    assert cmap["agg4"] == {("lineitem", "l_tax")}
    assert cmap["p_brand"] == {("part", "p_brand")}
    assert cmap["n_name"] == {("nation", "n_name")}
    assert set(ql.result.input_tables) == {"lineitem", "orders", "customer", "nation", "part"}
    # filter columns are control lineage
    assert ("customer", "c_mktsegment") in ql.result.indirect
    assert ("orders", "o_orderstatus") in ql.result.indirect


def test_normalized_physical_graph_collapses_artifacts(spark):
    li, o = _t(spark, "lineitem"), _t(spark, "orders")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    ql = LineageTracker().track(df)
    kinds = {n.kind for n in ql.normalized.walk()}
    banned = {
        "ShuffleExchange",
        "BroadcastExchange",
        "AQEShuffleRead",
        "ShuffleQueryStage",
        "BroadcastQueryStage",
        "ResultQueryStage",
        "WholeStageCodegen",
        "InputAdapter",
        "AdaptiveSparkPlan",
        "ColumnarToRow",
    }
    assert not (kinds & banned), kinds & banned
    # exactly one aggregate survives (the Final one) — RemoveMapSideGroupBy parity
    aggs = ql.normalized.find("HashAggregate")
    assert len(aggs) == 1
    assert dict(aggs[0].detail)["mode"] == "Final"


def test_reused_exchange_plan_lineage(spark):
    """Shared-subplan identity: a self-join of one aggregation reuses the
    shuffle exchange (AQE emits a ReusedExchangeExec leaf referencing the
    subtree computed elsewhere — the Spark analog of the reference's
    by-id node dedup, ``GraphNode.scala:20-27`` / ``Node.scala:63-97``).
    Capture must recurse INTO the reused subtree so both join inputs
    bottom out at real operators, and column lineage through the reused
    side must be identical to the original side."""
    o = _t(spark, "orders")
    agg = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    j = (
        agg.alias("a")
        .join(agg.alias("b"), F.col("a.o_custkey") == F.col("b.o_custkey"))
        .select(F.col("a.o_custkey"), (F.col("a.s") + F.col("b.s")).alias("ss"))
    )
    j.collect()
    ql = LineageTracker().track(j, name="reuse")
    # the executed plan really contains the reuse leaf, and capture
    # inlined its subtree (real scan operators on BOTH sides)
    assert ql.physical.find("ReusedExchange"), "plan no longer exercises reuse"
    scans = [n for n in ql.normalized.walk() if n.kind == "Scan"]
    assert len(scans) >= 2
    # lineage flows through the reused side exactly like the original
    cmap = ql.column_map()
    assert cmap["o_custkey"] == {("orders", "o_custkey")}
    assert cmap["ss"] == {("orders", "o_totalprice")}
    assert ql.result.input_tables == ["orders"]


def test_write_readback_stitching(spark):
    """SURVEY.md §2.4 item 9: FileSink → TableScan stitch across queries."""
    out = os.path.join(SCRATCH, "stitch_orders")
    tr = LineageTracker()
    o = _t(spark, "orders")
    tr.track_write(
        o.filter(F.col("o_totalprice") > 1000).select("o_orderkey", "o_custkey", "o_totalprice"),
        out,
        name="writer",
    )
    back = spark.read.parquet(out).groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    back.collect()
    ql = tr.track(back, name="reader")
    cmap = ql.column_map()
    # lineage reaches THROUGH the intermediate directory to the base table
    assert cmap["spend"] == {("orders", "o_totalprice")}
    assert cmap["o_custkey"] == {("orders", "o_custkey")}
    assert ql.result.input_tables == ["orders"]
    # and the stitched graph contains the writer's scan of orders
    scans = [dict(n.detail).get("table") for n in ql.logical.find("Scan")]
    assert "orders" in scans


def test_lineage_json_roundtrip(spark):
    import json

    df = _t(spark, "nation").select("n_name")
    ql = _track(spark, df)
    doc = json.loads(ql.to_json())
    assert doc["lineage"]["columns"][0]["name"] == "n_name"
    assert doc["lineage"]["inputTables"] == ["nation"]


def test_offline_plan_replay(spark, tmp_path):
    """Save a captured plan, reload it with a fresh tracker (no Spark
    involvement in the analysis), and get identical lineage — the analog
    of the reference's serialized-plan replay tests (BasicTest.scala)."""
    from pyspark.sql import functions as F2

    li, o = _t(spark, "lineitem"), _t(spark, "orders")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F2.sum("l_quantity").alias("qty"))
    )
    df.collect()
    tr = LineageTracker()
    online = tr.track(df, name="online")
    plan_file = str(tmp_path / "q.plan.json")
    online.captured.save(plan_file)

    replayed = LineageTracker().track_offline(plan_file, name="replay")
    assert replayed.column_map() == online.column_map()
    assert replayed.result.input_tables == online.result.input_tables
    assert replayed.normalized.tree_string() == online.normalized.tree_string()
    assert replayed.logical.tree_string() == online.logical.tree_string()


def test_offline_replay_preserves_view_snapshots(spark, tmp_path):
    """View descriptors ride along in Captured.save / load: an offline
    replay of a view query re-registers the view TableDef."""
    from hive_lineage_spark.metadata import TableDef
    from hive_lineage_spark.operators.sql_extra import q46_view_lineage

    df = q46_view_lineage(spark, SF)
    df.collect()
    online = LineageTracker().track(df, name="online")
    plan_file = str(tmp_path / "view.plan.json")
    online.captured.save(plan_file)

    tr = LineageTracker()
    replayed = tr.track_offline(plan_file, name="replay")
    assert replayed.result.input_tables == ["nation", "region"]
    vt = tr.model.get("default@nation_region_v", TableDef)
    assert vt is not None and vt.table_type == "view" and vt.view_sql


def test_partitioned_scan_lineage_and_partition_defs(spark):
    """Partitioned-table parity (SURVEY §2.4 item 8): the catalog snapshot
    registers PartitionDefs per key=value directory (ConvertHelper cascade)
    and the physical scan records the partition-pruning filter."""
    from hive_lineage_spark.metadata import PartitionDef
    from hive_lineage_spark.operators.relational import q18_partition_pruning

    df = q18_partition_pruning(spark, SF)
    df.collect()
    tr = LineageTracker()
    ql = tr.track(df, name="partitioned")
    # partition defs registered in the model
    parts = tr.model.of_type(PartitionDef)
    assert parts, "no PartitionDefs registered"
    assert any("l_returnflag=R" in p.fqn for p in parts)
    # table def knows its partition column
    tdefs = [t for t in tr.model.defs.values() if getattr(t, "partition_columns", ())]
    assert any("l_returnflag" in t.partition_columns for t in tdefs)
    # physical scan detail carries the partition filter
    scans = ql.physical.find("Scan")
    pf = [dict(s.detail).get("partitionFilters", "") for s in scans]
    assert any("l_returnflag" in x for x in pf), pf


def test_two_hop_stitching_is_transitive(spark):
    """write → read+write → read composes lineage across TWO hops back to
    the base table."""
    tr = LineageTracker()
    p1 = os.path.join(SCRATCH, "hop1")
    p2 = os.path.join(SCRATCH, "hop2")
    o = _t(spark, "orders")
    tr.track_write(
        o.select("o_orderkey", "o_custkey", (F.col("o_totalprice") * 2).alias("dbl")),
        p1,
        name="hop1",
    )
    mid = spark.read.parquet(p1).filter(F.col("dbl") > 1000).select("o_custkey", "dbl")
    tr.track_write(mid, p2, name="hop2")
    final = spark.read.parquet(p2).groupBy("o_custkey").agg(F.sum("dbl").alias("total"))
    final.collect()
    ql = tr.track(final, name="final")
    cmap = ql.column_map()
    assert cmap["total"] == {("orders", "o_totalprice")}
    assert cmap["o_custkey"] == {("orders", "o_custkey")}
    assert ql.result.input_tables == ["orders"]


def test_lineage_of_literal_only_query(spark):
    """SELECT of literals (OneRowRelation) must not crash the analyzer."""
    df = spark.sql("SELECT 1 AS one, 'x' AS tag")
    df.collect()
    ql = LineageTracker().track(df, name="literals")
    assert {c.name for c in ql.result.columns} == {"one", "tag"}
    assert ql.report()


def test_lineage_of_empty_result(spark):
    df = _t(spark, "orders").filter(F.col("o_totalprice") < -1).select("o_orderkey")
    df.collect()
    ql = LineageTracker().track(df, name="empty")
    assert ql.column_map()["o_orderkey"] == {("orders", "o_orderkey")}


def test_per_operator_schema_mappings(spark):
    """Every operator in the plan gets a schema mapping (≈ the reference
    forcing schemaMapping for all operators, OperatorNode.scala:67-100)."""
    li, o = _t(spark, "lineitem"), _t(spark, "orders")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ql = _track(spark, df)
    oms = ql.result.operator_mappings
    kinds = [m.kind for m in oms]
    assert kinds[0] == "Aggregate"  # root first
    assert "Join" in kinds and kinds.count("LogicalRelation") == 2
    # the Join-level mapping already resolves both sides to base columns
    join_m = next(m for m in oms if m.kind == "Join")
    flat = {name: bases for name, bases in join_m.outputs}
    assert flat["l_quantity"] == frozenset({("lineitem", "l_quantity")})
    assert flat["o_orderstatus"] == frozenset({("orders", "o_orderstatus")})


def test_column_roles_distinguish_aggregated_and_direct(spark):
    """Aggregate provenance is tagged — the analog of the reference's
    key-vs-aggregated distinction in the ReduceSink KEY./VALUE. mapping."""
    li = _t(spark, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("qty"))
    ql = _track(spark, df)
    roles = {c.name: c.role for c in ql.result.columns}
    assert roles["qty"] == "aggregated"
    assert roles["l_returnflag"] == "direct"


def test_lineage_resolves_through_persist_cache(spark):
    """.persist() keeps only the cached physical plan; lineage resolves
    THROUGH it (exprIds are preserved across the cache boundary)."""
    li = _t(spark, "lineitem")
    cached = li.select("l_orderkey", (F.col("l_quantity") * 2).alias("dq")).filter(F.col("dq") > 5).persist()
    cached.count()
    df = cached.groupBy("l_orderkey").agg(F.sum("dq").alias("s"))
    df.collect()
    ql = LineageTracker().track(df, name="through_cache")
    assert ql.result.input_tables == ["lineitem"]
    cmap = ql.column_map()
    assert cmap["s"] == {("lineitem", "l_quantity")}
    assert cmap["l_orderkey"] == {("lineitem", "l_orderkey")}
    cached.unpersist()


def test_lineage_resolves_nested_caches(spark):
    """A persisted frame built on top of another persisted frame (index
    pipelines: prefix postings over the postings cache) — lineage must
    recurse through BOTH InMemoryRelation boundaries to the base table."""
    li = _t(spark, "lineitem")
    inner = li.select("l_orderkey", (F.col("l_quantity") * 2).alias("dq")).persist()
    inner.count()
    outer = inner.groupBy("l_orderkey").agg(F.sum("dq").alias("sdq")).persist()
    outer.count()
    df = outer.filter(F.col("sdq") > 10).select("l_orderkey", "sdq")
    df.collect()
    ql = LineageTracker().track(df, name="nested_cache")
    try:
        assert ql.result.input_tables == ["lineitem"]
        cmap = ql.column_map()
        assert cmap["sdq"] == {("lineitem", "l_quantity")}
        assert cmap["l_orderkey"] == {("lineitem", "l_orderkey")}
        from hive_lineage_spark.lineage import UNKNOWN

        for c in ql.result.columns:
            assert UNKNOWN not in c.bases
    finally:
        outer.unpersist()
        inner.unpersist()


def test_dedup_lineage_reaches_documents(spark):
    """The flagship dedup operator's lineage reaches the base table even
    though its shingle index is persisted."""
    import hive_lineage_spark.operators.dedup as dd

    df = dd.dd02_ngram_jaccard(spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name="dd02")
    assert ql.result.input_tables == ["documents"]
    assert ql.column_map()["id_a"] == {("documents", "doc_id")}
    assert ("documents", "text") in ql.result.indirect
    # no unresolved sentinel anywhere (cache reuse re-aliasing is handled)
    from hive_lineage_spark.lineage import UNKNOWN

    assert UNKNOWN not in ql.result.indirect
    for c in ql.result.columns:
        assert UNKNOWN not in c.bases


def test_query_execution_listener_auto_capture(spark):
    """Installed as a real QueryExecutionListener (the PostExecHook
    registration analog), the tracker captures queries automatically."""
    import time

    tr = LineageTracker()
    tr.install(spark)
    try:
        df = _t(spark, "nation").filter(F.col("n_regionkey") == 0).select("n_name")
        df.collect()
        for _ in range(240):  # generous: listener bus is async and the box is shared
            if any(q.name.startswith("auto:") for q in tr.queries):
                break
            time.sleep(0.25)
        autos = [q for q in tr.queries if q.name.startswith("auto:")]
        assert autos, "listener never fired"
        ql = autos[-1]
        assert ql.result.input_tables == ["nation"]
        assert ql.column_map()["n_name"] == {("nation", "n_name")}
        assert ("nation", "n_regionkey") in ql.result.indirect
    finally:
        tr.uninstall(spark)


def test_openlineage_emit_shape(spark):
    """to_openlineage: RunEvent-shaped dict with inputs, job, and a
    columnLineage facet whose inputFields are the base cells."""
    df = (
        _t(spark, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )
    ql = _track(spark, df)
    ev = ql.to_openlineage()
    assert ev["eventType"] == "COMPLETE"
    assert {d["name"] for d in ev["inputs"]} == {"lineitem"}
    f = ev["run"]["facets"]["columnLineage"]["fields"]
    assert f["sum_qty"]["inputFields"] == [
        {"namespace": "spark", "name": "lineitem", "field": "l_quantity"}
    ]
    assert f["sum_qty"]["transformationType"] == "AGGREGATED"
    assert f["l_returnflag"]["inputFields"][0]["field"] == "l_returnflag"
    # with the tracker's catalog model, inputs carry the OL schema facet
    tr = LineageTracker()
    df.collect()
    ql2 = tr.track(df, name="ol_schema")
    ev2 = ql2.to_openlineage(model=tr.model)
    sch = ev2["inputs"][0]["facets"]["schema"]["fields"]
    names = {fld["name"]: fld["type"] for fld in sch}
    assert names.get("l_quantity") == "double"
    assert "l_returnflag" in names


def test_openlineage_vtable_commit_carries_version_facets(spark, tmp_path):
    """A tracked vtable commit emits the OL datasetVersion facet (every
    commit is a concrete version) and, for overwrite, the
    lifecycleStateChange facet; plain appends carry version only."""
    tr = LineageTracker()
    root = str(tmp_path / "nation_vt")
    n = _t(spark, "nation").select("n_nationkey", "n_name")
    ql0 = tr.track_write_vtable(n, root, mode="overwrite")
    ql1 = tr.track_write_vtable(n, root, mode="append")

    out0 = ql0.to_openlineage()["outputs"][0]
    assert out0["facets"]["version"] == {"datasetVersion": "0"}
    assert out0["facets"]["lifecycleStateChange"] == {
        "lifecycleStateChange": "OVERWRITE"
    }
    out1 = ql1.to_openlineage()["outputs"][0]
    assert out1["facets"]["version"] == {"datasetVersion": "1"}
    assert "lifecycleStateChange" not in out1["facets"]
    # a plain (non-vtable) query still emits no version facet
    plain = _track(spark, n)
    assert plain.to_openlineage()["outputs"] == []


def test_view_lineage_resolves_to_base_tables_and_snapshots_viewsql(spark):
    """A query over a persistent catalog VIEW maps columns to the BASE
    tables, and the tracker registers the view as a catalog TableDef
    carrying the (original, expanded) SQL pair — reference parity with
    TableDef.viewSql (``TableDef.scala:12``, ``ConvertHelper.scala:67-73``)."""
    from hive_lineage_spark.metadata import TableDef
    from hive_lineage_spark.operators.sql_extra import q46_view_lineage

    df = q46_view_lineage(spark, SF)
    df.collect()
    tr = LineageTracker()
    ql = tr.track(df, name="view_query")

    # lineage punches through the view to the base tables
    assert ql.result.input_tables == ["nation", "region"]
    cmap = ql.column_map()
    assert cmap["region_name"] == {("region", "r_name")}
    assert cmap["first_nation"] == {("nation", "n_name")}
    assert ("nation", "n_regionkey") in ql.result.indirect
    assert any("nation_region_v" in n for n in ql.result.notes)

    # the view itself is snapshotted as a catalog entity with its SQL
    vt = tr.model.get("default@nation_region_v", TableDef)
    assert vt is not None and vt.table_type == "view"
    assert [c.name for c in vt.columns] == ["n_nationkey", "n_name", "region_name"]
    assert "JOIN" in vt.view_sql and "nation.parquet" in vt.view_sql
    assert vt.view_sql_expanded  # Spark stores original+expanded; both kept
    assert dict(vt.params)["isTempView"] == "False"


def test_listener_auto_captures_writes_and_stitches(spark, tmp_path):
    """An UNTRACKED df.write.parquet under the installed listener must
    register the output path automatically (PostExecHook receives
    WriteEntity outputs, ``PostExecHook.scala:18-27``), so a later read
    of that path stitches column lineage back to the base table with no
    manual track_write call."""
    import time

    tr = LineageTracker()
    tr.install(spark)
    try:
        out = str(tmp_path / "cust_slim")
        df = _t(spark, "customer").select(
            "c_custkey", F.col("c_mktsegment").alias("segment")
        )
        df.write.mode("overwrite").parquet(out)
        for _ in range(240):  # generous: listener bus is async and the box is shared
            if any(q.command_type == "INSERT" for q in tr.queries):
                break
            time.sleep(0.25)
        writes = [q for q in tr.queries if q.command_type == "INSERT"]
        assert writes, "write command never captured"
        assert writes[-1].output_path.endswith("cust_slim")
        assert writes[-1].result.input_tables == ["customer"]

        back = (
            spark.read.parquet(out)
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        back.collect()
        ql = tr.track(back, name="readback")
        assert ql.result.input_tables == ["customer"]
        assert ql.column_map()["segment"] == {("customer", "c_mktsegment")}
    finally:
        tr.uninstall(spark)


def test_listener_auto_captures_ctas_and_table_read_stitches(spark):
    """saveAsTable (CTAS) executes an inner
    InsertIntoHadoopFsRelationCommand carrying the catalog table — the
    listener must register the warehouse path AND snapshot the target
    table, so a later spark.table() read stitches to the base table."""
    import time

    from hive_lineage_spark.metadata import TableDef

    spark.sql("DROP TABLE IF EXISTS nation_ctas_t")
    tr = LineageTracker()
    tr.install(spark)
    try:
        df = _t(spark, "nation").select("n_nationkey", F.col("n_name").alias("nm"))
        df.write.mode("overwrite").saveAsTable("nation_ctas_t")
        # CTAS fires TWO events (the inner path insert + the create-table
        # command carrying the catalog table); the bus is async
        for _ in range(240):  # generous: listener bus is async and the box is shared
            paths = [q.output_path for q in tr.queries if q.output_path]
            if paths and tr.model.get("default@nation_ctas_t") is not None:
                break
            time.sleep(0.25)
        writes = [q for q in tr.queries if q.command_type == "INSERT" and q.output_path]
        assert writes, "CTAS write never captured"
        assert writes[-1].output_path.endswith("nation_ctas_t")

        # the target catalog table is snapshotted with schema + location
        td = tr.model.get("default@nation_ctas_t", TableDef)
        assert td is not None
        assert [c.name for c in td.columns] == ["n_nationkey", "nm"]
        assert td.location == writes[-1].output_path

        back = spark.table("nation_ctas_t").groupBy("nm").agg(
            F.count(F.lit(1)).alias("n")
        )
        back.collect()
        ql = tr.track(back, name="readback")
        assert ql.result.input_tables == ["nation"]
        assert ql.column_map()["nm"] == {("nation", "n_name")}
    finally:
        tr.uninstall(spark)
        spark.sql("DROP TABLE IF EXISTS nation_ctas_t")


def test_insert_into_existing_table_snapshots_target_schema(spark):
    """INSERT INTO an existing table resolves by POSITION, so the source
    plan's aliases can differ from the target's declared columns. The
    listener must snapshot the TARGET's CatalogTable schema (declared
    names, partition spec included) — not the source aliases — and must
    not drop partition_columns on the upsert."""
    import time

    from hive_lineage_spark.metadata import TableDef

    spark.sql("DROP TABLE IF EXISTS nation_part_t")
    spark.sql(
        "CREATE TABLE nation_part_t (nkey BIGINT, nname STRING) "
        "USING parquet PARTITIONED BY (rkey BIGINT)"
    )
    tr = LineageTracker()
    tr.install(spark)
    try:
        src = _t(spark, "nation").select(
            F.col("n_nationkey").alias("src_key"),
            F.col("n_name").alias("src_name"),
            F.col("n_regionkey").alias("src_region"),
        )
        src.write.insertInto("nation_part_t")
        for _ in range(240):  # listener bus is async and the box is shared
            td = tr.model.get("default@nation_part_t", TableDef)
            if td is not None:
                break
            time.sleep(0.25)
        assert td is not None, "INSERT target never snapshotted"
        assert [c.name for c in td.columns] == ["nkey", "nname", "rkey"]
        assert td.partition_columns == ("rkey",)
        assert td.location.endswith("nation_part_t")
    finally:
        tr.uninstall(spark)
        spark.sql("DROP TABLE IF EXISTS nation_part_t")


def test_listener_captures_multi_insert_both_sinks(spark):
    """Hive-style multi-insert (FROM src INSERT INTO t1 ... INSERT INTO
    t2 ...) — one shared scan, several FileSinks: the reference's
    multi-terminal DAG (``terminalOps`` finds every sink,
    ``OperatorGraphBuilder.scala:30-140``). The listener must capture
    BOTH sinks (per-sink QueryLineage with its own source-plan lineage),
    snapshot both target tables, and stitch a later read of each target
    back to the base table."""
    import time

    from hive_lineage_spark.metadata import TableDef

    import shutil

    spark.sql("DROP TABLE IF EXISTS mi_t1")
    spark.sql("DROP TABLE IF EXISTS mi_t2")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("mi_t1", "mi_t2"):  # a crashed prior run can leave the dir
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    spark.sql("CREATE TABLE mi_t1 (nname STRING, nkey BIGINT) USING parquet")
    spark.sql("CREATE TABLE mi_t2 (nname STRING) USING parquet")
    _t(spark, "nation").createOrReplaceTempView("mi_nation_v")
    tr = LineageTracker()
    tr.install(spark)
    try:
        spark.sql(
            """FROM mi_nation_v
               INSERT OVERWRITE TABLE mi_t1 SELECT n_name, n_nationkey WHERE n_regionkey = 0
               INSERT OVERWRITE TABLE mi_t2 SELECT n_name WHERE n_regionkey = 1"""
        )
        for _ in range(240):  # listener bus is async and the box is shared
            inserts = [q for q in tr.queries if q.command_type == "INSERT"]
            if len(inserts) >= 2:
                break
            time.sleep(0.25)
        assert len(inserts) == 2, f"expected 2 sinks, saw {len(inserts)}"
        by_path = {os.path.basename(q.output_path or ""): q for q in inserts}
        assert set(by_path) == {"mi_t1", "mi_t2"}
        # each sink's lineage is the SOURCE plan of that branch; the
        # by-position cast projects onto the TARGET's declared names
        assert by_path["mi_t1"].result.input_tables == ["nation"]
        assert by_path["mi_t1"].column_map()["nname"] == {("nation", "n_name")}
        assert by_path["mi_t1"].column_map()["nkey"] == {("nation", "n_nationkey")}
        assert by_path["mi_t2"].result.input_tables == ["nation"]
        assert by_path["mi_t2"].column_map()["nname"] == {("nation", "n_name")}
        # both targets snapshotted with their declared schemas
        t1 = tr.model.get("default@mi_t1", TableDef)
        t2 = tr.model.get("default@mi_t2", TableDef)
        assert t1 is not None and [c.name for c in t1.columns] == ["nname", "nkey"]
        assert t2 is not None and [c.name for c in t2.columns] == ["nname"]
        # a later read of either target stitches through to the base table
        back = spark.table("mi_t1").select("nname")
        back.collect()
        ql = tr.track(back, name="readback")
        assert ql.result.input_tables == ["nation"]
        assert ql.column_map()["nname"] == {("nation", "n_name")}
    finally:
        tr.uninstall(spark)
        spark.sql("DROP TABLE IF EXISTS mi_t1")
        spark.sql("DROP TABLE IF EXISTS mi_t2")
        spark.catalog.dropTempView("mi_nation_v")


def test_grouping_sets_lineage_through_expand(spark):
    """Expand's projections are nulled by TreeNode.toJSON, so lineage
    uses the name-passthrough fallback: grouping-set output columns must
    still resolve to their base columns (fresh exprIds, same names), and
    the aggregate through the Expand keeps its input lineage."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    df = qs["q34_grouping_sets"](spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name="q34")
    cmap = ql.column_map()
    assert cmap["l_returnflag"] == {("lineitem", "l_returnflag")}
    assert cmap["l_linestatus"] == {("lineitem", "l_linestatus")}
    assert cmap["sum_qty"] == {("lineitem", "l_quantity")}
    # unpivot: synthetic melt columns derive from the melted set
    df48 = qs["q48_unpivot"](spark, SF)
    df48.collect()
    cmap48 = LineageTracker().track(df48, name="q48").column_map()
    melted = {
        ("lineitem", "l_discount"),
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_tax"),
    }
    assert cmap48["amount"] == melted and cmap48["measure"] == melted
    assert cmap48["l_returnflag"] == {("lineitem", "l_returnflag")}


def test_nested_view_lineage_snapshots_both_views(spark):
    """A view defined over another view: lineage resolves through BOTH
    inlined bodies to the base table, and the tracker snapshots each
    view layer as its own catalog TableDef."""
    from hive_lineage_spark.metadata import TableDef

    spark.sql(
        f"""CREATE OR REPLACE VIEW nation_inner_v AS
            SELECT n_nationkey, upper(n_name) AS uname, n_regionkey
            FROM parquet.`{SF}/nation.parquet`"""
    )
    spark.sql(
        """CREATE OR REPLACE VIEW nation_outer_v AS
           SELECT n_regionkey, uname FROM nation_inner_v WHERE n_nationkey > 2"""
    )
    df = spark.sql(
        "SELECT n_regionkey, min(uname) AS first_uname FROM nation_outer_v GROUP BY n_regionkey"
    )
    df.collect()
    tr = LineageTracker()
    ql = tr.track(df, name="nested_view")
    assert ql.result.input_tables == ["nation"]
    assert ql.column_map()["first_uname"] == {("nation", "n_name")}
    assert ("nation", "n_nationkey") in ql.result.indirect
    inner = tr.model.get("default@nation_inner_v", TableDef)
    outer = tr.model.get("default@nation_outer_v", TableDef)
    assert inner is not None and inner.table_type == "view" and "upper" in inner.view_sql
    assert outer is not None and "nation_inner_v" in outer.view_sql


def test_listener_captures_create_view_ddl(spark):
    """CREATE VIEW under the installed listener: the view's defining
    plan is analyzed at DDL time (column provenance to base tables) and
    the view lands in the catalog model with its original SQL.

    The listener bus is ASYNC: CREATE VIEW events posted by a previous
    test (no listener installed then) can be delivered late, into THIS
    test's freshly-installed listener — full-suite runs intermittently
    captured the preceding test's ``nation_outer_v`` (filter on
    n_nationkey → exactly the wrong ``indirect``) because the wait loop
    broke on the first CREATE_VIEW capture of ANY view. Select the
    capture by its defining SQL, not by arrival order."""
    import time

    from hive_lineage_spark.metadata import TableDef

    tr = LineageTracker()
    tr.install(spark)
    try:
        spark.sql(
            f"""CREATE OR REPLACE VIEW ddl_probe_v AS
                SELECT n_nationkey, upper(n_name) AS uname
                FROM parquet.`{SF}/nation.parquet` WHERE n_regionkey = 0"""
        )
        def _mine():
            return [
                q
                for q in tr.queries
                if q.command_type == "CREATE_VIEW"
                and "n_regionkey = 0" in (q.sql_text or "")
            ]

        for _ in range(240):  # generous: listener bus is async and the box is shared
            if _mine():
                break
            time.sleep(0.25)
        ddls = _mine()
        assert ddls, "CREATE VIEW never captured"
        ql = ddls[-1]
        assert ql.result.input_tables == ["nation"]
        assert ql.column_map()["uname"] == {("nation", "n_name")}
        assert ("nation", "n_regionkey") in ql.result.indirect
        vt = tr.model.get("default@ddl_probe_v", TableDef)
        assert vt is not None and vt.table_type == "view"
        assert "upper(n_name)" in vt.view_sql
        assert [c.name for c in vt.columns] == ["n_nationkey", "uname"]
    finally:
        tr.uninstall(spark)
        spark.sql("DROP VIEW IF EXISTS ddl_probe_v")


def test_listener_captures_insert_overwrite_directory(spark, tmp_path):
    """INSERT OVERWRITE DIRECTORY (the Hive-ism the reference's
    WriteEntity outputs cover) executes an inner path-writing command —
    the listener captures it, including through the WriteFiles wrapper
    on the source plan, and later reads stitch."""
    import time

    out = str(tmp_path / "iod_out")
    tr = LineageTracker()
    tr.install(spark)
    try:
        spark.sql(
            f"""INSERT OVERWRITE DIRECTORY '{out}' USING parquet
                SELECT n_nationkey, upper(n_name) AS uname
                FROM parquet.`{SF}/nation.parquet`"""
        )
        for _ in range(240):  # generous: listener bus is async and the box is shared
            if any(q.command_type == "INSERT" for q in tr.queries):
                break
            time.sleep(0.25)
        writes = [q for q in tr.queries if q.command_type == "INSERT" and q.output_path]
        assert writes and writes[-1].output_path == out
        assert writes[-1].column_map()["uname"] == {("nation", "n_name")}

        back = spark.read.parquet(out).select("uname")
        back.collect()
        ql = tr.track(back, name="readback")
        assert ql.result.input_tables == ["nation"]
        assert ql.column_map()["uname"] == {("nation", "n_name")}
    finally:
        tr.uninstall(spark)


def test_checkpoint_tracked_lineage_resolves_through(spark):
    """``plans.capture.checkpoint_tracked``: a localCheckpoint made via
    the wrapper resolves THROUGH the boundary to base cells exactly like
    a persisted cache (the registered pre-checkpoint plan substitutes
    the checkpoint leaf), and CHAINS across stacked checkpoints — the
    mechanism dd20's Pregel supersteps rely on. A RAW localCheckpoint
    keeps the honest opaque ``checkpoint:<n>`` boundary."""
    from hive_lineage_spark.plans.capture import checkpoint_tracked

    base = _t(spark, "region").select(
        F.col("r_regionkey").alias("k"), F.upper(F.col("r_name")).alias("nm")
    )
    ck1 = checkpoint_tracked(base)
    ck2 = checkpoint_tracked(ck1.select("k", F.lower(F.col("nm")).alias("lo")))
    ql = _track(spark, ck2.select("lo"), "ckpt_chain")
    assert ql.column_map()["lo"] == {("region", "r_name")}
    assert ql.result.input_tables == ["region"]

    # a raw localCheckpoint of a never-registered frame (fresh exprIds)
    # stays an honest opaque boundary
    other = _t(spark, "nation").select(F.upper(F.col("n_name")).alias("un"))
    raw = other.localCheckpoint(True).select("un")
    ql2 = _track(spark, raw, "ckpt_opaque")
    assert ql2.column_map()["un"] == {("checkpoint:0", "un")}
    assert ql2.result.input_tables == ["checkpoint:0"]


def test_offline_replay_resolves_through_checkpoints(spark, tmp_path):
    """Checkpoint docs captured via checkpoint_tracked are INLINED into
    Captured.cached_plans (nested to arbitrary depth), so an offline
    replay of a checkpoint-truncated iterative query — dd20's Pregel
    ranks — still resolves every column to documents base cells with no
    SparkSession, no registry, and no live RDDs."""
    import __spark_entry__ as E
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    df = E.queries()["dd20_graph_rank"](spark, SF)
    df.collect()
    online = LineageTracker().track(df, name="online")
    plan_file = str(tmp_path / "dd20.plan.json")
    online.captured.save(plan_file)

    replayed = LineageTracker().track_offline(plan_file, name="replay")
    assert replayed.result.input_tables == ["documents"]
    assert replayed.column_map() == online.column_map()
    cmap = replayed.column_map()
    assert cmap["rank"] == {("documents", "doc_id"), ("documents", "n_chars")}
    clear_postings_cache()
