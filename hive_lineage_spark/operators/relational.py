"""Relational query surface — SURVEY.md §2.4 correctness set.

Every Hive physical operator the reference models
(``hivehook/.../qinfo/OperatorInfo.scala:47-58``: TableScan, Filter,
Select, GroupBy partial/final, the 6 join types, MapJoin/broadcast,
ReduceSink/shuffle, FileSink, Limit, Fetch, order-by) is exercised here
as an idiomatic PySpark DataFrame query with a DuckDB oracle.

Design notes for 100 TB scale (tested at sf0.1 but written for a
1000-executor cluster):

- Scans are ``spark.read.parquet`` + declarative filter/select so
  Catalyst pushes predicates and prunes columns at the parquet reader
  (verify with ``.explain``: PushedFilters / ReadSchema).
- Joins are expressed fact-⋈-dim with the dim on the right; AQE +
  `JoinSelection` broadcast every dimension table (all are ≪ 10 MB per
  1000× scale-up except `orders`, which Spark correctly shuffles).
  `q07_join_broadcast` pins `broadcast()` explicitly, matching the
  reference's MapJoin (`qinfo/OperatorInfo.scala:189-193`).
- Aggregations rely on Spark's automatic partial/final HashAggregate
  split (map-side combine) — the exact split the reference models as
  GroupBy modes HASH/PARTIAL1/FINAL (`OperatorInfo.scala:211-223`).
- Top-k = orderBy+limit → `TakeOrderedAndProject` (no global sort).
- Double aggregates are rounded (2-6 dp) in BOTH engines: Spark's
  partial-agg ordering is nondeterministic, so last-ulp FP noise must
  not flip the oracle value-hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

# Scratch dir for queries that exercise write→read-back (FileSink →
# TableScan stitching, partition pruning). Must stay inside /root/repo.
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _scratch(sf_dir: str, tag: str) -> str:
    from ..sources.registry import scratch_key

    return os.path.join(SCRATCH, scratch_key(sf_dir), tag)


# ---------------------------------------------------------------------------
# 1. scan / project / filter  (q1.plan shape: full scan + fetch)
# ---------------------------------------------------------------------------


def q01_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * FROM region — scan + fetch (reference q1.plan shape,
    ``qinfo/OperatorInfo.scala:60-106``)."""
    return _t(spark, sf_dir, "region")


def q02_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with aliasing + computed expression (Select operator,
    ``qinfo/OperatorInfo.scala:195-209``). Column pruning should reach the
    scan: ReadSchema must list only 4 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.upper("l_returnflag").alias("flag"),
    )


def q03_virtual_rowid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic row-id projection — functional stand-in for Hive's
    virtual ROW__ID struct (FIXTURES.md virtual columns): a total-order
    row_number, which unlike monotonically_increasing_id() is
    oracle-checkable.

    SCALE CAVEAT: the unpartitioned window forces a single-partition
    sort — safe ONLY because it runs on ``nation`` (25 rows, a bounded
    dim table). For a fact table, assign ids per partition instead:
    ``spark_partition_id()`` + per-partition ``row_number`` (or
    zipWithIndex semantics via a partition-offset cumsum), which keeps
    the sort distributed."""
    from pyspark.sql import Window as W

    n = _t(spark, sf_dir, "nation")
    w = W.orderBy("n_nationkey")
    return n.select(F.row_number().over(w).alias("row_id"), "n_nationkey", "n_name")


def q04_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with AND / = / IN / IS NOT NULL (the q27.plan predicate set:
    GenericUDFOPAnd/OPEqual/OPNotNull/In — ``SURVEY.md §2.1``). All four
    predicates must appear in PushedFilters at the parquet scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_custkey").isNotNull()
            & (F.col("o_totalprice") > 1000.0)
        )
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# 2. joins — the 6 Hive join types (+ null-safe, + broadcast MapJoin)
#    reference decode: qinfo/OperatorInfo.scala:121-187
# ---------------------------------------------------------------------------


def q05_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, 2-way (Hive join type 0)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus")
    )


def q06_join_4way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way inner join chain (q27.plan shape) with a grouped count so the
    result stays hashable at any sf. Dim tables broadcast via AQE."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def q07_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast (map) join small⋈big — the reference's MapJoin /
    HashTableSink pair (``qinfo/OperatorInfo.scala:189-193``,
    ``AttachHashSinkToMapJoinRule.scala``). `broadcast(part)` pins
    BroadcastHashJoinExec regardless of stats."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"))
    )


def q08_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (Hive type 1): customers that may have no orders;
    count(o_orderkey) exercises null semantics on the probe side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q09_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (Hive type 2)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"), F.count(F.lit(1)).alias("n_rows"))
    )


def q10_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (Hive type 3) on deliberately partial key overlap."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 3 == 0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(
            "c_custkey",
            "o_orderkey",
            F.coalesce("c_custkey", "o_custkey").alias("anykey"),
        )
    )


def q11_join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (Hive type 5) — EXISTS."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name", "c_mktsegment")


def q12_join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — NOT EXISTS (Spark-native complement of semi; the
    reference's Hive vocabulary lacks it, noted as a free extension)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q13_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join ``<=>`` (the reference decodes Hive's nullsafe
    flag at ``qinfo/OperatorInfo.scala:147``). Keys are made nullable with
    nullif so NULL<=>NULL rows actually appear."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("a_key"), F.nullif(F.col("n_regionkey"), F.lit(2)).alias("a_reg")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("b_key"), F.nullif(F.col("n_regionkey"), F.lit(2)).alias("b_reg")
    )
    return (
        n1.join(n2, n1.a_reg.eqNullSafe(n2.b_reg))
        .groupBy("a_key")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


def q44_unique_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive UNIQUEJOIN (join type 4, decoded by the reference at
    ``qinfo/OperatorInfo.scala:142``) — the one join type with no Spark
    keyword. Semantics per the Hive language manual: all inputs are joined
    on their join key; an input marked PRESERVE keeps its rows even when
    the key matches no other input, while an unmarked input's unmatched
    rows are dropped. Expressed as a composition: full-outer chain on the
    coalesced key + a presence filter (key survives iff it appears in a
    PRESERVE input, or in ≥2 inputs — i.e. a genuine match).

    Inputs here: per-nation customer counts (PRESERVE), per-nation
    supplier counts, region-limited nation names — each side filtered
    differently so all three survive/drop paths are exercised. At scale
    this is N-1 shuffles on the same join key; the repeated key means the
    exchanges reuse one partitioning, and AQE broadcasts any small side.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") % 5 != 0)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") % 3 != 0)
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 3)
    a = c.groupBy(F.col("c_nationkey").alias("key_a")).agg(F.count(F.lit(1)).alias("n_customers"))
    b = s.groupBy(F.col("s_nationkey").alias("key_b")).agg(F.count(F.lit(1)).alias("n_suppliers"))
    d = n.select(F.col("n_nationkey").alias("key_c"), "n_name")
    j = (
        a.join(b, F.col("key_a") == F.col("key_b"), "full_outer")
        .join(d, F.coalesce("key_a", "key_b") == F.col("key_c"), "full_outer")
    )
    in_a = F.col("key_a").isNotNull()
    present = sum(F.col(k).isNotNull().cast("int") for k in ("key_a", "key_b", "key_c"))
    return (
        j.filter(in_a | (present >= 2))  # PRESERVE a; b/c keep only matched keys
        .select(
            F.coalesce("key_a", "key_b", "key_c").alias("nationkey"),
            "n_customers", "n_suppliers", "n_name",
        )
    )


# ---------------------------------------------------------------------------
# 3. aggregation (GroupBy partial/final), distinct, order-by/limit
# ---------------------------------------------------------------------------


def q14_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-key group-by with sum/avg/count — exercises the
    partial+final HashAggregate split the reference models as GroupBy modes
    (``RemoveOperatorsRule.scala:56-68``)."""
    li = _t(spark, sf_dir, "lineitem")
    # l_shipdate is TIMESTAMP_NTZ (naive parquet timestamps), so to_date is
    # a pure field extraction — session-timezone-independent, matching
    # DuckDB's naive CAST(.. AS DATE).
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q15_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) + min/max — distinct-agg rewrite (expand + 2-phase)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q16_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order-by multi-key + limit → TakeOrderedAndProject (the reference's
    ReduceSink-sort + Limit, q27.plan tail). Tie-broken on the unique key so
    the result is deterministic."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .limit(25)
    )


def q17_q27_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q27 analog over TESTDATA (SURVEY.md §2.4 item 10): fact
    (lineitem) joined to 4 dims with constant predicates, 4 avg aggregates,
    group-by + order-by + limit 100. This is the flagship query."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("c_mktsegment") == "BUILDING")
            & F.col("n_name").isin("NATION_1", "NATION_5", "NATION_9", "NATION_13", "NATION_21")
        )
        .groupBy("p_brand", "n_name")
        .agg(
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("agg1"),
            F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("agg2"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("agg3"),
            F.round(F.avg("l_tax") + 1e-9, 4).alias("agg4"),
        )
        .orderBy("p_brand", "n_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# 4. write → read-back (FileSink → TableScan stitch), partition pruning
# ---------------------------------------------------------------------------


def q18_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-table scan with a partition-pruning predicate — the
    reference resolves partitioned scans per-partition via
    pathToPartitionInfo (``qinfo/TaskInfo.scala:78-84``; store_sales
    partitioned by ss_store_sk). We materialize lineitem partitioned by
    l_returnflag once, then scan with a partition filter: .explain must
    show the pruned partition count."""
    path = _scratch(sf_dir, "lineitem_by_flag")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        li = _t(spark, sf_dir, "lineitem")
        li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    part = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return part.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q19_insert_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE DIRECTORY then read back (SURVEY.md §2.4 item 9:
    FileSink → TableScan stitch, ``OperatorGraphBuilder.scala:51-80``).
    The write and the re-read are separate Spark queries whose lineage the
    hook stitches via the location map."""
    path = _scratch(sf_dir, "top_orders")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        o = _t(spark, sf_dir, "orders")
        (
            o.filter(F.col("o_totalprice") > 50000.0)
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
            .write.mode("overwrite")
            .parquet(path)
        )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice") + 1e-9, 4).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# 5. free Spark extensions beyond reference parity (SURVEY §2.1 "not
#    implemented" list): set ops, window, rollup, subqueries, as-of join
# ---------------------------------------------------------------------------


def q20_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c.union(s).distinct()


def q21_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer segment by price — Window + row_number
    (beyond reference parity; standard OLAP top-k-per-group)."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("price"), F.asc("o_orderkey"))
    return j.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


def q22_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


def q23_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price — scalar subquery via SQL."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


def q24_window_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the events stream table (batch view of
    the streaming windowed agg in hive_lineage_spark.streaming): 5-minute
    buckets keyed on integer naive-epoch so both engines bucket identically
    whatever the session time zone (ts is TIMESTAMP_NTZ)."""
    from ..functions import naive_epoch_seconds

    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.floor(naive_epoch_seconds("ts") / 300).cast("long"))
        .groupBy("bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q25_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity): lag + cumulative sum
    over a per-user window; integer naive-epoch seconds so engines agree."""
    from pyspark.sql import Window as W

    from ..functions import naive_epoch_seconds

    e = _t(spark, sf_dir, "events").withColumn("es", naive_epoch_seconds("ts"))
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    sess = (
        e.withColumn("gap", F.col("es") - F.lag("es").over(w))
        .withColumn("is_new", F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


def q26_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props column."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.round(F.avg("k") + 1e-9, 4).alias("avg_k"), F.max("k").alias("max_k"))
    )


def q27_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one — SURVEY §2.1 'not implemented'
    extensions): for each purchase event, the most recent order of the same
    customer at-or-before the event timestamp.

    Union-merge formulation: tag both streams, union them, and run ONE
    window over ``user_id`` ordered by time with ``last(..., ignorenulls)``
    carrying the latest order's attributes forward onto each event row.
    Cost is a single user-keyed shuffle and a sort, linear in
    |events| + |orders| — the inequality-join + per-event window it
    replaces materialized every (event x earlier-order) pair (quadratic on
    a hot user: 1e5 events x 1e4 orders = 1e9 rows for one key) and then
    re-shuffled that inflated intermediate on event_id. Tie semantics
    match the oracle's argmax (max o_orderdate, then max o_orderkey):
    at equal timestamps orders sort before events (an order ON the event
    date is visible to it) and ascending o_orderkey makes ``last`` pick
    the largest key. For 100 TB, pre-bucket both sides on the key; a
    residual hot user costs one in-partition sort, not a pair explosion.
    Merge granularity is whole seconds (``naive_epoch_seconds``) — exact
    here because order timestamps are midnight-aligned; sub-second as-of
    would switch ``t`` to a microsecond epoch."""
    from pyspark.sql import Window as W

    from ..functions import naive_epoch_seconds

    # NULL keys never match in the oracle's inner equi-join, but
    # Window.partitionBy groups them into one partition — reject them
    # up front so NULL user_id/o_custkey rows can't see each other.
    e = (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select(
            F.col("user_id").alias("u"),
            naive_epoch_seconds("ts").alias("t"),
            F.lit(1).alias("kind"),
            "event_id",
            F.lit(None).cast("long").alias("ok"),
            F.lit(None).cast("double").alias("opx"),
        )
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull()).select(
        F.col("o_custkey").alias("u"),
        naive_epoch_seconds("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ok"),
        F.round("o_totalprice", 2).alias("opx"),
    )
    w = (
        W.partitionBy("u")
        .orderBy("t", "kind", "ok")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = e.unionByName(o).select(
        "u", "kind", "event_id",
        F.last("ok", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("opx", ignorenulls=True).over(w).alias("price"),
    )
    return (
        merged.filter((F.col("kind") == 1) & F.col("o_orderkey").isNotNull())
        .select("event_id", F.col("u").alias("user_id"), "o_orderkey", "price")
    )


# ---------------------------------------------------------------------------
# 6. source/sink format coverage: ORC, CSV, JSON round-trips. The reference
#    is ORC-era Hive (q1.plan embeds OrcInputFormat/OrcSerde — SURVEY.md
#    §1.1); these prove the engine reads/writes beyond parquet, with
#    results oracle-checked against the original parquet tables.
# ---------------------------------------------------------------------------


def q28_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a supplier projection as ORC, read it back, aggregate —
    the reference's native storage format (OrcSerde in q1.plan)."""
    path = _scratch(sf_dir, "supplier_orc")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        s = _t(spark, sf_dir, "supplier")
        s.select("s_suppkey", "s_nationkey", "s_acctbal").write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.round(F.sum("s_acctbal"), 2).alias("sum_bal"),
    )


def q29_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema-on-read source (header, explicit schema — no
    inferSchema scan, which would double the read at scale)."""
    path = _scratch(sf_dir, "nation_csv")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        n = _t(spark, sf_dir, "nation")
        n.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", True
    ).csv(path)
    return back.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))


def q30_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink with a nested struct column, read back with an
    explicit schema and a nested-field projection (nested types beyond the
    reference's flat int/double/string surface)."""
    path = _scratch(sf_dir, "customer_json")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        c = _t(spark, sf_dir, "customer")
        nested = c.select(
            "c_custkey",
            F.struct(
                F.col("c_mktsegment").alias("segment"), F.round("c_acctbal", 2).alias("balance")
            ).alias("profile"),
        )
        nested.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "c_custkey long, profile struct<segment:string, balance:double>"
    ).json(path)
    return back.groupBy(F.col("profile.segment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum("profile.balance"), 2).alias("sum_bal"),
    )


def q45_vtable_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-table (sources/vtable.py) time travel: build a nation
    vtable as three commits — v0 overwrite (regions 0-1), v1 append
    (regions 2-4), v2 overwrite (region 0 only) — then compare the v1
    snapshot (full nation) against the latest snapshot per region. The
    log-as-manifest read never lists the data directory; both snapshots
    resolve immutable file sets."""
    import shutil

    from ..sources.vtable import history, read_vtable, write_vtable

    root = _scratch(sf_dir, "nation_vtable")
    # Version numbers are load-bearing (the query reads version=1), so a
    # partially built root (e.g. a crash after one commit) must be torn
    # down, not appended to — appending on top would shift every index.
    # Valid state is EXACTLY the three setup commits, nothing else.
    ops = [c["op"] for c in (history(root) if os.path.isdir(os.path.join(root, "_vlog")) else [])]
    if ops != ["overwrite", "append", "overwrite"]:
        shutil.rmtree(root, ignore_errors=True)
        n = _t(spark, sf_dir, "nation")
        write_vtable(n.filter(F.col("n_regionkey") < 2), root, mode="overwrite")
        write_vtable(n.filter(F.col("n_regionkey") >= 2), root, mode="append")
        write_vtable(n.filter(F.col("n_regionkey") == 0), root, mode="overwrite")
    v1 = read_vtable(spark, root, version=1).groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_v1")
    )
    latest = read_vtable(spark, root).groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_latest")
    )
    return v1.join(latest, "n_regionkey", "left").select(
        "n_regionkey", "n_v1", F.coalesce("n_latest", F.lit(0)).alias("n_latest")
    )


def q50_vtable_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned versioned table: customer committed hive-partitioned
    on a derived segment key (partition values recorded in the
    manifest), then a partition-restricted read — pruned at the MANIFEST
    before Spark builds a file index — aggregated per nation. The
    oracle computes the same restriction as a WHERE; the partition read
    must also re-attach the partition column with its declared type."""
    import shutil

    from ..sources.vtable import history, read_vtable, write_vtable

    root = _scratch(sf_dir, "customer_part_vtable")
    ops = [c["op"] for c in (history(root) if os.path.isdir(os.path.join(root, "_vlog")) else [])]
    if ops != ["overwrite"]:
        shutil.rmtree(root, ignore_errors=True)
        c = _t(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.col("c_mktsegment").alias("segment"),
        )
        write_vtable(c, root, mode="overwrite", partition_by=["segment"])
    part = read_vtable(spark, root, partitions={"segment": "BUILDING"})
    return part.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
        F.min("segment").alias("segment"),
    )


Q50_SQL = """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(c_acctbal), 4) AS sum_bal,
           min(c_mktsegment) AS segment
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------


QUERIES = {
    "q01_full_scan": q01_full_scan,
    "q02_project_alias": q02_project_alias,
    "q03_virtual_rowid": q03_virtual_rowid,
    "q04_filter_predicates": q04_filter_predicates,
    "q05_join_inner": q05_join_inner,
    "q06_join_4way": q06_join_4way,
    "q07_join_broadcast": q07_join_broadcast,
    "q08_join_left_outer": q08_join_left_outer,
    "q09_join_right_outer": q09_join_right_outer,
    "q10_join_full_outer": q10_join_full_outer,
    "q11_join_left_semi": q11_join_left_semi,
    "q12_join_left_anti": q12_join_left_anti,
    "q13_join_nullsafe": q13_join_nullsafe,
    "q44_unique_join": q44_unique_join,
    "q14_agg_tpch_q1": q14_agg_tpch_q1,
    "q15_agg_distinct": q15_agg_distinct,
    "q16_topk": q16_topk,
    "q17_q27_shape": q17_q27_shape,
    "q18_partition_pruning": q18_partition_pruning,
    "q19_insert_readback": q19_insert_readback,
    "q20_union_distinct": q20_union_distinct,
    "q21_window_topk_per_group": q21_window_topk_per_group,
    "q22_rollup": q22_rollup,
    "q23_scalar_subquery": q23_scalar_subquery,
    "q24_window_bucket_agg": q24_window_bucket_agg,
    "q25_sessionization": q25_sessionization,
    "q26_json_extract": q26_json_extract,
    "q27_asof_join": q27_asof_join,
    "q28_orc_roundtrip": q28_orc_roundtrip,
    "q29_csv_roundtrip": q29_csv_roundtrip,
    "q30_json_roundtrip": q30_json_roundtrip,
    "q45_vtable_time_travel": q45_vtable_time_travel,
    "q50_vtable_partitioned": q50_vtable_partitioned,
}


ORACLES = {
    "q01_full_scan": "SELECT * FROM region",
    "q28_orc_roundtrip": """
        SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_supps,
               round(sum(s_acctbal), 2) AS sum_bal
        FROM supplier GROUP BY s_nationkey
    """,
    "q29_csv_roundtrip": """
        SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
        FROM nation GROUP BY n_regionkey
    """,
    "q30_json_roundtrip": """
        SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_custs,
               round(sum(round(c_acctbal, 2)), 2) AS sum_bal
        FROM customer GROUP BY c_mktsegment
    """,
    "q45_vtable_time_travel": """
        WITH v1 AS (
            SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_v1
            FROM nation GROUP BY n_regionkey
        ), latest AS (
            SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_latest
            FROM nation WHERE n_regionkey = 0 GROUP BY n_regionkey
        )
        SELECT v1.n_regionkey, v1.n_v1,
               COALESCE(latest.n_latest, 0) AS n_latest
        FROM v1 LEFT JOIN latest USING (n_regionkey)
    """,
    "q50_vtable_partitioned": Q50_SQL,
    "q02_project_alias": """
        SELECT l_orderkey AS okey, l_linenumber AS lineno,
               round(l_extendedprice * (1 - l_discount), 4) AS net_price,
               upper(l_returnflag) AS flag
        FROM lineitem
    """,
    "q03_virtual_rowid": """
        SELECT row_number() OVER (ORDER BY n_nationkey) AS row_id, n_nationkey, n_name
        FROM nation
    """,
    "q04_filter_predicates": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_custkey IS NOT NULL
          AND o_totalprice > 1000.0
    """,
    "q05_join_inner": """
        SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    "q06_join_4way": """
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q07_join_broadcast": """
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
               round(avg(l_extendedprice) + 1e-9, 4) AS avg_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q08_join_left_outer": """
        SELECT c_custkey, c_name, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "q09_join_right_outer": """
        SELECT c_mktsegment, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q10_join_full_outer": """
        SELECT c_custkey, o_orderkey, coalesce(c_custkey, o_custkey) AS anykey
        FROM (SELECT * FROM customer WHERE c_custkey % 2 = 0) c
        FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey % 3 = 0) o
        ON c.c_custkey = o.o_custkey
    """,
    "q11_join_left_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
    """,
    "q12_join_left_anti": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    """,
    "q13_join_nullsafe": """
        SELECT a.a_key, CAST(count(*) AS BIGINT) AS n_matches
        FROM (SELECT n_nationkey AS a_key, nullif(n_regionkey, 2) AS a_reg FROM nation) a
        JOIN (SELECT n_nationkey AS b_key, nullif(n_regionkey, 2) AS b_reg FROM nation) b
        ON a.a_reg IS NOT DISTINCT FROM b.b_reg
        GROUP BY a.a_key
    """,
    "q44_unique_join": """
        WITH a AS (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_customers
                   FROM customer WHERE c_nationkey % 5 <> 0 GROUP BY 1),
             b AS (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_suppliers
                   FROM supplier WHERE s_nationkey % 3 <> 0 GROUP BY 1),
             c AS (SELECT n_nationkey AS k, n_name FROM nation WHERE n_regionkey < 3),
             j AS (
                 SELECT coalesce(a.k, b.k, c.k) AS nationkey,
                        a.k IS NOT NULL AS in_a,
                        CAST(a.k IS NOT NULL AS INT) + CAST(b.k IS NOT NULL AS INT)
                          + CAST(c.k IS NOT NULL AS INT) AS present,
                        n_customers, n_suppliers, n_name
                 FROM a FULL OUTER JOIN b ON a.k = b.k
                        FULL OUTER JOIN c ON coalesce(a.k, b.k) = c.k
             )
        SELECT nationkey, n_customers, n_suppliers, n_name
        FROM j WHERE in_a OR present >= 2
    """,
    "q14_agg_tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
               round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
               round(avg(l_discount) + 1e-9, 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q15_agg_distinct": """
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "q16_topk": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
    "q17_q27_shape": """
        SELECT p_brand, n_name,
               round(avg(l_quantity) + 1e-9, 4) AS agg1,
               round(avg(l_extendedprice) + 1e-9, 4) AS agg2,
               round(avg(l_discount) + 1e-9, 4) AS agg3,
               round(avg(l_tax) + 1e-9, 4) AS agg4
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE o_orderstatus = 'F' AND c_mktsegment = 'BUILDING'
          AND n_name IN ('NATION_1','NATION_5','NATION_9','NATION_13','NATION_21')
        GROUP BY p_brand, n_name
        ORDER BY p_brand, n_name
        LIMIT 100
    """,
    "q18_partition_pruning": """
        SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_linestatus
    """,
    "q19_insert_readback": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
               round(avg(o_totalprice) + 1e-9, 4) AS avg_price
        FROM orders WHERE o_totalprice > 50000.0
        GROUP BY o_orderpriority
    """,
    "q20_union_distinct": """
        SELECT DISTINCT nkey FROM (
            SELECT c_nationkey AS nkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nkey FROM supplier
        )
    """,
    "q21_window_topk_per_group": """
        SELECT * FROM (
            SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS price,
                   CAST(row_number() OVER (PARTITION BY c_mktsegment
                                           ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC) AS INT) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rk <= 3
    """,
    "q22_rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q23_scalar_subquery": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
    "q24_window_bucket_agg": """
        SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, event_type,
               CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q25_sessionization": """
        WITH e AS (
            SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
        ), g AS (
            SELECT user_id, es,
                   es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap
            FROM e
        ), s AS (
            SELECT user_id,
                   CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS is_new
            FROM g
        )
        SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id
    """,
    "q26_json_extract": """
        SELECT event_type,
               round(avg(CAST(props->>'$.k' AS BIGINT)) + 1e-9, 4) AS avg_k,
               max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
    "q27_asof_join": """
        SELECT event_id, user_id, o_orderkey, price FROM (
            SELECT e.event_id, e.user_id, o.o_orderkey,
                   round(o.o_totalprice, 2) AS price,
                   row_number() OVER (PARTITION BY e.event_id
                                      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
            FROM events e JOIN orders o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
            WHERE e.event_type = 'purchase'
        ) WHERE rk = 1
    """,
}
