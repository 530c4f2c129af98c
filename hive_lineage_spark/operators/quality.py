"""Data-quality gates (Deequ-style): the validation step a training
pipeline runs before consuming a corpus snapshot — column profiles and
declarative constraint checks, each producing a deterministic REPORT
frame (never a pass/fail exception, so the gate's evidence is
queryable and oracle-checkable).

Scale notes: every profile metric is one partial-agg pass (map-side
combine, one slim exchange); referential checks are left-anti joins on
the key — AQE broadcasts the dimension while it fits and degrades to a
shuffle join beyond, never a collect. The report frames are
constraint-count-sized, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

PROFILE_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def dq01_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric column profile of the fact table: per column, row count,
    null count, distinct count, rounded min/max — ONE aggregation pass
    over the scan (all metrics partial-agg'd together), then a map-side
    melt of the single metrics row into per-column report rows."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=True).select(*PROFILE_COLS)
    one = _one_pass_profile(li, PROFILE_COLS)
    melted = one.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"null_{c}").alias("n_null"),
                        F.col(f"dist_{c}").alias("n_distinct"),
                        F.col(f"min_{c}").alias("vmin"),
                        F.col(f"max_{c}").alias("vmax"),
                    )
                    for c in PROFILE_COLS
                ]
            )
        ).alias("m"),
    )
    return melted.select(
        F.col("m.column").alias("column"),
        "n_rows",
        F.col("m.n_null").alias("n_null"),
        F.col("m.n_distinct").alias("n_distinct"),
        F.col("m.vmin").alias("vmin"),
        F.col("m.vmax").alias("vmax"),
    )


DQ01_SQL = f"""
    WITH one AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               {", ".join(
                   f"CAST(count(*) - count({c}) AS BIGINT) AS null_{c}, "
                   f"CAST(count(DISTINCT {c}) AS BIGINT) AS dist_{c}, "
                   f"round(min({c}), 4) AS min_{c}, round(max({c}), 4) AS max_{c}"
                   for c in PROFILE_COLS
               )}
        FROM lineitem
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS column, n_rows, null_{c} AS n_null, dist_{c} AS n_distinct, "
        f"min_{c} AS vmin, max_{c} AS vmax FROM one"
        for c in PROFILE_COLS
    )}
"""


def dq02_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint report: referential integrity (left-anti
    join per foreign key), primary-key uniqueness, and not-null checks —
    one (constraint, n_checked, n_violations) row each. Violations stay
    rows in a frame, not exceptions: the gate's consumer decides the
    policy (block, quarantine, alert)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    e = load_table(spark, sf_dir, "events")

    def fk(name: str, child: DataFrame, key: str, parent: DataFrame, pkey: str) -> DataFrame:
        viol = child.join(
            parent.select(F.col(pkey).alias(key)), key, "left_anti"
        ).groupBy().agg(F.count(F.lit(1)).alias("n_violations"))
        total = child.groupBy().agg(F.count(F.lit(1)).alias("n_checked"))
        return total.crossJoin(viol).select(
            F.lit(name).alias("constraint"), "n_checked", "n_violations"
        )

    uniq = o.groupBy().agg(
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n_violations"),
    ).select(F.lit("unique_orders_pk").alias("constraint"), "n_checked", "n_violations")
    notnull = e.groupBy().agg(
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("n_violations"),
    ).select(F.lit("not_null_events_user").alias("constraint"), "n_checked", "n_violations")
    out = (
        fk("fk_orders_customer", o.select("o_custkey"), "o_custkey", c, "c_custkey")
        .unionByName(fk("fk_lineitem_part", li.select("l_partkey"), "l_partkey", p, "p_partkey"))
        .unionByName(fk("fk_lineitem_orders", li.select("l_orderkey"), "l_orderkey", o, "o_orderkey"))
        .unionByName(uniq)
        .unionByName(notnull)
    )
    return out


DQ02_SQL = """
    SELECT 'fk_orders_customer' AS constraint,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'fk_lineitem_part',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'fk_lineitem_orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'unique_orders_pk',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'not_null_events_user',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(user_id) AS BIGINT)
    FROM events
"""


def _one_pass_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """dq01's single-aggregation profile over ``cols``, as one wide row
    (suffix-free) — callers rename per side before joining snapshots."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
            F.round(F.min(c), 4).alias(f"min_{c}"),
            F.round(F.max(c), 4).alias(f"max_{c}"),
        ]
    return df.groupBy().agg(*aggs)


def dq03_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift gate: profile deltas between two versions of a
    versioned table — the check a training pipeline runs before
    promoting a new corpus snapshot (did row counts jump? did a value
    range shift? did nulls appear?).

    Setup (idempotent, closed-form so the oracle can reproduce both
    snapshots from the source table): v0 = lineitem rows with
    l_linenumber <= 3, v1 appends the rest AND adds a derived
    ship_bucket column — real schema drift. ``schema_history`` drives the gate: it
    reports the added column, and only columns present in BOTH
    snapshots' schemas are profiled (profiling a column one side lacks
    would fabricate 100% nulls as 'drift'). Each snapshot is ONE
    partial-agg pass (dq01's shape); the report is column-count-sized.
    At 100 TB both passes are scans with map-side combine and a
    single-row exchange — and the v0 pass reads only v0's files via the
    manifest, not a full-table time-travel copy."""
    import shutil

    from ..sources.vtable import history, is_vtable, read_vtable, schema_history, write_vtable

    from .relational import _scratch

    root = _scratch(sf_dir, "lineitem_drift_vtable")
    ops = [c["op"] for c in (history(root) if is_vtable(root) else [])]
    if ops != ["overwrite", "append"]:
        shutil.rmtree(root, ignore_errors=True)
        li = load_table(spark, sf_dir, "lineitem")
        v0 = li.filter(F.col("l_linenumber") <= 3).select(*PROFILE_COLS)
        v1 = li.filter(F.col("l_linenumber") > 3).select(
            *PROFILE_COLS, (F.col("l_orderkey") % 8).alias("ship_bucket")
        )
        write_vtable(v0, root, mode="overwrite")
        write_vtable(v1, root, mode="append")

    # columns present in both snapshots (manifest-only work): the full
    # schema timeline, replayed into the v0 and latest column sets
    drift = schema_history(root)
    cols_v0: set[str] = set()
    cols_latest: set[str] = set()
    for d in drift:
        delta = (set(d["added"]), set(d["removed"]))
        if d["version"] == 0:
            cols_v0 = (cols_v0 | delta[0]) - delta[1]
        cols_latest = (cols_latest | delta[0]) - delta[1]
    common = [c for c in PROFILE_COLS if c in cols_v0 and c in cols_latest]

    a = _one_pass_profile(read_vtable(spark, root, version=0), common)
    b = _one_pass_profile(read_vtable(spark, root), common)
    both = a.select([F.col(c).alias(f"a_{c}") for c in a.columns]).crossJoin(
        b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    )
    melted = both.select(
        "a_n_rows",
        "b_n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"a_null_{c}").alias("null_a"),
                        F.col(f"b_null_{c}").alias("null_b"),
                        F.col(f"a_dist_{c}").alias("dist_a"),
                        F.col(f"b_dist_{c}").alias("dist_b"),
                        F.col(f"a_min_{c}").alias("vmin_a"),
                        F.col(f"b_min_{c}").alias("vmin_b"),
                        F.col(f"a_max_{c}").alias("vmax_a"),
                        F.col(f"b_max_{c}").alias("vmax_b"),
                    )
                    for c in common
                ]
            )
        ).alias("m"),
    )
    return melted.select(
        F.col("m.column").alias("column"),
        F.col("a_n_rows").alias("n_rows_a"),
        F.col("b_n_rows").alias("n_rows_b"),
        F.col("m.null_a").alias("n_null_a"),
        F.col("m.null_b").alias("n_null_b"),
        F.col("m.dist_a").alias("n_distinct_a"),
        F.col("m.dist_b").alias("n_distinct_b"),
        F.col("m.vmin_a").alias("vmin_a"),
        F.col("m.vmin_b").alias("vmin_b"),
        F.col("m.vmax_a").alias("vmax_a"),
        F.col("m.vmax_b").alias("vmax_b"),
        (F.col("m.dist_b") - F.col("m.dist_a")).alias("distinct_delta"),
        F.round(F.col("m.vmax_b") - F.col("m.vmax_a"), 4).alias("vmax_delta"),
    )


DQ03_SQL = f"""
    WITH pa AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               {", ".join(
                   f"CAST(count(*) - count({c}) AS BIGINT) AS null_{c}, "
                   f"CAST(count(DISTINCT {c}) AS BIGINT) AS dist_{c}, "
                   f"round(min({c}), 4) AS min_{c}, round(max({c}), 4) AS max_{c}"
                   for c in PROFILE_COLS
               )}
        FROM lineitem WHERE l_linenumber <= 3
    ),
    pb AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               {", ".join(
                   f"CAST(count(*) - count({c}) AS BIGINT) AS null_{c}, "
                   f"CAST(count(DISTINCT {c}) AS BIGINT) AS dist_{c}, "
                   f"round(min({c}), 4) AS min_{c}, round(max({c}), 4) AS max_{c}"
                   for c in PROFILE_COLS
               )}
        FROM lineitem
    )
    {" UNION ALL ".join(
        f"SELECT '{c}' AS column, pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b, "
        f"pa.null_{c} AS n_null_a, pb.null_{c} AS n_null_b, "
        f"pa.dist_{c} AS n_distinct_a, pb.dist_{c} AS n_distinct_b, "
        f"pa.min_{c} AS vmin_a, pb.min_{c} AS vmin_b, "
        f"pa.max_{c} AS vmax_a, pb.max_{c} AS vmax_b, "
        f"pb.dist_{c} - pa.dist_{c} AS distinct_delta, "
        f"round(pb.max_{c} - pa.max_{c}, 4) AS vmax_delta "
        f"FROM pa, pb"
        for c in PROFILE_COLS
    )}
"""


ANOMALY_PCT = 50.0  # |day-over-day change| beyond this flags the day


def dq04_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly gate (Deequ anomaly detection shape): daily
    event counts with the day-over-day percentage change, flagging days
    whose volume moved more than ``ANOMALY_PCT`` % against the previous
    day — the completeness check a pipeline runs before trusting a
    partition (a half-ingested day shows up as a volume cliff long
    before any value-level check fires).

    One partial-agg pass to day granularity, then a lag window over the
    tiny per-day frame (|days| rows, never the corpus). pct compares
    ROUNDED in both engines; the first day has no baseline and is never
    flagged."""
    from ..sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select(F.to_date("ts").alias("day"))
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n_events"))
    return volume_gate(daily)


def volume_gate(daily: DataFrame) -> DataFrame:
    """dq04's finishing stage over a (day, n_events) frame — split out
    so the streaming twin (streaming.events.daily_volume_stream, whose
    complete-mode sink table has exactly this shape) runs the IDENTICAL
    gate; tests/test_streaming.py pins stream-fed ≡ batch dq04."""
    from pyspark.sql import Window

    w = Window.orderBy("day")
    with_prev = daily.withColumn("prev_events", F.lag("n_events").over(w))
    pct = F.round(
        (F.col("n_events") - F.col("prev_events")) * 100.0 / F.col("prev_events") + 1e-9, 4
    )
    return with_prev.select(
        F.col("day").cast("string").alias("day"),
        "n_events",
        F.coalesce("prev_events", F.lit(0)).alias("prev_events"),
        F.coalesce(pct, F.lit(0.0)).alias("pct_change"),
        F.coalesce(F.abs(pct) > ANOMALY_PCT, F.lit(False)).alias("anomalous"),
    )


DQ04_SQL = f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT day, n_events,
               lag(n_events) OVER (ORDER BY day) AS prev_events
        FROM daily
    )
    SELECT day, n_events,
           coalesce(prev_events, 0) AS prev_events,
           coalesce(round((n_events - prev_events) * 100.0 / prev_events + 1e-9, 4),
                    0.0) AS pct_change,
           coalesce(abs(round((n_events - prev_events) * 100.0 / prev_events + 1e-9, 4))
                    > {ANOMALY_PCT}, FALSE) AS anomalous
    FROM lagged
"""


# Row-level expectation rules: name -> the VIOLATION condition, stated
# once and emitted to both engines. Thresholds are tuned so every rule
# splits the fixture corpus both ways (tx14 precedent) — a gate whose
# rules never fire (or always fire) tests nothing.
ROW_RULES = [
    ("disc_max", "l_discount > 0.08"),
    ("price_min", "l_extendedprice < 2000"),
    ("qty_max", "l_quantity > 40"),
    ("tax_max", "l_tax > 0.06"),
]


def dq05_row_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level expectation gate with a QUARANTINE output (the Deequ /
    Great Expectations row-rule shape): every row is checked against
    the declarative ROW_RULES; rows violating at least one rule come
    back labeled with the comma-joined names of every rule they broke —
    the auditable quarantine table a pipeline routes aside, while
    dq01/dq02 stay the aggregate report. Rule order in the label is the
    fixed ROW_RULES order (both engines build the identical list —
    never a sort over rule names at runtime).

    SCALE shape: pure map + filter — the rule CASEs fuse into the scan
    as whole-stage codegen, zero exchanges, output size = violation
    count. The comparisons sit on the data's exact decimal grids
    (discount/tax in hundredths, quantity integral), so the same row
    quarantines in both engines with no rounding contract needed."""
    li = load_table(spark, sf_dir, "lineitem")
    varr = F.array_compact(
        F.array(*[F.when(F.expr(cond), F.lit(name)) for name, cond in ROW_RULES])
    )
    return (
        li.withColumn("varr", varr)
        .filter(F.size("varr") > 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.array_join("varr", ",").alias("violated"),
            F.size("varr").alias("n_violated"),
        )
    )


_RULE_CASES = ", ".join(
    f"CASE WHEN {cond} THEN '{name}' END" for name, cond in ROW_RULES
)
DQ05_SQL = f"""
    WITH v AS (
        SELECT l_orderkey, l_linenumber,
               list_filter([{_RULE_CASES}], x -> x IS NOT NULL) AS varr
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           array_to_string(varr, ',') AS violated,
           CAST(len(varr) AS INT) AS n_violated
    FROM v WHERE len(varr) > 0
"""


# ---------------------------------------------------------------------------
# dq06: freshness / SLA gate — per event type, the lag between the
# stream's watermark (global max ts) and that type's newest event. A
# dead or wedged producer shows up here as a stale TYPE long before
# dq04's day-level volume cliff fires — this is the "data is arriving
# but one source silently stopped" check every ingest SLA dashboard
# runs. All epoch math is the tz-independent naive_epoch_seconds
# contract (functions/time_fns.py), so the lag is exact int64 in both
# engines.
# ---------------------------------------------------------------------------

SLA_LAG_S = 600  # freshness SLA: a type is stale if > 10 min behind the watermark


def dq06_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type freshness report against the stream watermark:
    (n_events, last_epoch, lag_s, stale). The watermark is the global
    max event time — comparing types against it rather than wall-clock
    keeps the gate deterministic and replayable (the production
    variant swaps in processing time; the dataflow is identical).

    SCALE shape: ONE partial-agg pass to type granularity (map-side
    combine on the low-cardinality event_type key), the 1-row
    watermark frame broadcast back — the corpus never shuffles. The
    streaming twin is a max-aggregate over the same keyed state."""
    from ..functions import naive_epoch_seconds
    from ..sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", naive_epoch_seconds("ts").alias("es")
    )
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("es").alias("last_epoch")
    )
    wm = ev.groupBy().agg(F.max("es").alias("wm"))
    return per.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "n_events",
        "last_epoch",
        (F.col("wm") - F.col("last_epoch")).alias("lag_s"),
        (F.col("wm") - F.col("last_epoch") > SLA_LAG_S).alias("stale"),
    )


DQ06_SQL = f"""
    WITH ev AS (
        SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
    ),
    per AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               max(es) AS last_epoch
        FROM ev GROUP BY event_type
    ),
    wm AS (SELECT max(es) AS wm FROM ev)
    SELECT event_type, n_events, last_epoch,
           wm - last_epoch AS lag_s,
           wm - last_epoch > {SLA_LAG_S} AS stale
    FROM per, wm
"""


# ---------------------------------------------------------------------------
# dq07: referential-integrity gate — the cross-table half of a Deequ
# suite (hasReferentialIntegrity): for every declared FK relationship,
# orphan count (child keys absent from the parent), distinct-key
# coverage of the parent, and the pass verdict. A training pipeline
# runs this on every snapshot before joining facts to dims; a single
# silently-dropped dimension partition shows up here first.
# ---------------------------------------------------------------------------

DQ07_RELS = [
    # (name, child table, child key, parent table, parent key)
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events.user_id", "events", "user_id", "customer", "c_custkey"),
]


def dq07_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FK orphan/coverage report over the star schema + events.

    SCALE shape (r17 restructure, guide §2.3/§2.4): per relationship the
    old form scanned the child TWICE (a count/count_distinct aggregate —
    an Expand — plus a left-anti orphan join) and the parent twice (the
    anti-join's distinct build and the parent_rows aggregate), then
    stitched three 1-row aggregates back with broadcast crossJoins —
    ~6 stages per relationship that AQE scheduled serially. Everything
    the report needs is derivable from ONE pass: pre-aggregate the child
    to per-key counts (map-side combine, so the exchange carries distinct
    keys, not rows), FULL-outer-merge with the distinct parent keys (both
    sides arrive hash-partitioned on the key from their own aggregation,
    so the join adds NO exchange), and fold the merged frame to a single
    row — n_rows = Σc, n_distinct_fk = #rows with a child count and a
    non-null key, parent_rows = #parent rows, n_orphans = Σc where no
    parent matched (NULL child keys never match, exactly as the old
    anti-join treated them). Per relationship: one pruned scan per table,
    two key-sized exchanges, zero Expands, zero crossJoins. Output is
    relationship-count-sized. Coverage (distinct child keys / parent
    keys) catches the subtler failure: zero orphans but a parent slice
    nothing references (events cover 10% of customers in the fixture)."""
    out = None
    for name, child, ckey, parent, pkey in DQ07_RELS:
        ck = (
            load_table(spark, sf_dir, child)
            .groupBy(F.col(ckey).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pkd = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        rel = (
            ck.join(pkd, "k", "full")
            .agg(
                F.coalesce(F.sum("c"), F.lit(0)).alias("n_rows"),
                F.count(
                    F.when(F.col("c").isNotNull() & F.col("k").isNotNull(), 1)
                ).alias("n_distinct_fk"),
                F.coalesce(F.sum("hit").cast("long"), F.lit(0)).alias("parent_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("hit").isNull(), F.col("c"))), F.lit(0)
                ).alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("fk"),
                "n_rows",
                "n_distinct_fk",
                "parent_rows",
                "n_orphans",
                F.round(F.col("n_distinct_fk") / F.col("parent_rows") + 1e-9, 4).alias(
                    "coverage"
                ),
                (F.col("n_orphans") == 0).cast("int").alias("ok"),
            )
        )
        out = rel if out is None else out.unionByName(rel)
    return out


def _dq07_rel_sql(name: str, child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
        SELECT '{name}' AS fk,
               (SELECT count(*) FROM {child}) AS n_rows,
               (SELECT count(DISTINCT {ckey}) FROM {child}) AS n_distinct_fk,
               (SELECT count(DISTINCT {pkey}) FROM {parent}) AS parent_rows,
               (SELECT count(*) FROM {child} c
                LEFT JOIN (SELECT DISTINCT {pkey} AS k FROM {parent}) p
                ON c.{ckey} = p.k WHERE p.k IS NULL) AS n_orphans,
               round((SELECT count(DISTINCT {ckey}) FROM {child}) * 1.0
                     / (SELECT count(DISTINCT {pkey}) FROM {parent}) + 1e-9, 4)
                   AS coverage,
               CAST((SELECT count(*) FROM {child} c
                     LEFT JOIN (SELECT DISTINCT {pkey} AS k FROM {parent}) p
                     ON c.{ckey} = p.k WHERE p.k IS NULL) = 0 AS INT) AS ok
    """


DQ07_SQL = " UNION ALL ".join(_dq07_rel_sql(*r) for r in DQ07_RELS)


# ---------------------------------------------------------------------------
# dq08: population-stability-index (PSI) drift gate — the standard
# ML-ops distribution-shift metric (banking scorecards onward):
# PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) between a reference and a
# current slice, with Laplace smoothing so empty bins stay finite.
# dq03 compares profile SUMMARIES (min/max/mean); dq08 compares the
# SHAPE — a mean-preserving redistribution that dq03 misses trips
# PSI. Slices are the dq03 split (l_linenumber ≤ 3 vs > 3), so the
# oracle reproduces both sides closed-form; bins are fixed integer
# grids, so binning is exact in both engines.
# ---------------------------------------------------------------------------

DQ08_PSI_DRIFT = 0.2  # the conventional "significant shift" bar

# (column, integer bin expression valid in BOTH SQL dialects)
DQ08_BIN_SPECS = [
    # floor, not a bare cast: DuckDB CASTs double→BIGINT by rounding
    # while Spark truncates — floor() is identical in both
    ("l_quantity", "CAST(floor((CAST(l_quantity AS BIGINT) - 1) / 5) AS BIGINT)"),
    ("l_discount", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("l_tax", "CAST(round(l_tax * 100) AS BIGINT)"),
]


def dq08_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column PSI between the reference (l_linenumber ≤ 3) and
    current (> 3) slices of the fact table.

    SCALE shape: per column, ONE partial-agg pass per slice to bin
    granularity (map-side combine onto ≤ a dozen grid cells), a
    full-outer join of two bin-count frames, and a sorted fold over
    the bin list for the Σ — every post-scan frame is bin-count-sized.
    Cross-engine FP: the smoothed log-ratio is a left-to-right
    sum/difference of ln of each DOUBLE-CAST factor (never ln of an
    int64 product, which would overflow at 100 TB counts — Spark wraps
    silently, DuckDB promotes to HUGEINT), the fold runs in
    ascending-bin order in both engines, and the result rounds at
    6 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    ref = li.filter(F.col("l_linenumber") <= 3)
    cur = li.filter(F.col("l_linenumber") > 3)
    out = None
    for col, bin_expr in DQ08_BIN_SPECS:
        a = ref.select(F.expr(bin_expr).alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("a")
        )
        b = cur.select(F.expr(bin_expr).alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("b")
        )
        j = (
            a.join(b, "bin", "full_outer")
            .select(
                "bin",
                F.coalesce("a", F.lit(0)).alias("a"),
                F.coalesce("b", F.lit(0)).alias("b"),
            )
        )
        tot = j.groupBy().agg(
            F.sum("a").alias("na"), F.sum("b").alias("nb"),
            F.count(F.lit(1)).alias("nbins"),
        )
        terms = j.crossJoin(F.broadcast(tot)).select(
            "na", "nb", "nbins",
            F.struct(
                "bin",
                (
                    (
                        (F.col("a") + 1) / (F.col("na") + F.col("nbins"))
                        - (F.col("b") + 1) / (F.col("nb") + F.col("nbins"))
                    )
                    * (
                        # ln per FACTOR, never of the int product: at 100 TB
                        # per-bin count × slice total exceeds 2^63 and Spark
                        # would wrap silently (ln(negative) = null PSI) while
                        # DuckDB promotes to HUGEINT — a silent divergence.
                        # Association pinned left-to-right in both engines.
                        F.log(F.col("a") + 1)
                        - F.log(F.col("b") + 1)
                        + F.log(F.col("nb") + F.col("nbins"))
                        - F.log(F.col("na") + F.col("nbins"))
                    )
                ).alias("t"),
            ).alias("bt"),
        )
        rep = terms.groupBy("na", "nb", "nbins").agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("bt")), F.lit(0.0), lambda acc, s: acc + s["t"]
                )
                + 1e-9,
                6,
            ).alias("psi")
        ).select(
            F.lit(col).alias("column"),
            F.col("na").cast("long").alias("n_ref"),
            F.col("nb").cast("long").alias("n_cur"),
            F.col("nbins").cast("int").alias("n_bins"),
            "psi",
            (F.col("psi") > DQ08_PSI_DRIFT).cast("int").alias("drifted"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def _dq08_col_sql(col: str, bin_expr: str) -> str:
    return f"""
        SELECT '{col}' AS "column",
               CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur,
               CAST(nbins AS INT) AS n_bins,
               round(list_reduce(
                   list_prepend(CAST(0 AS DOUBLE), list(t ORDER BY bin)),
                   (acc, x) -> acc + x
               ) + 1e-9, 6) AS psi,
               CAST(round(list_reduce(
                   list_prepend(CAST(0 AS DOUBLE), list(t ORDER BY bin)),
                   (acc, x) -> acc + x
               ) + 1e-9, 6) > {DQ08_PSI_DRIFT} AS INT) AS drifted
        FROM (
            SELECT bin, a, b,
                   sum(a) OVER () AS na, sum(b) OVER () AS nb,
                   count(*) OVER () AS nbins,
                   ((a + 1) * 1.0 / (sum(a) OVER () + count(*) OVER ())
                    - (b + 1) * 1.0 / (sum(b) OVER () + count(*) OVER ()))
                   * (ln(a + 1) - ln(b + 1)
                      + ln(sum(b) OVER () + count(*) OVER ())
                      - ln(sum(a) OVER () + count(*) OVER ())) AS t
            FROM (
                SELECT coalesce(ra.bin, rb.bin) AS bin,
                       coalesce(ra.a, 0) AS a, coalesce(rb.b, 0) AS b
                FROM (SELECT {bin_expr} AS bin, count(*) AS a
                      FROM lineitem WHERE l_linenumber <= 3 GROUP BY 1) ra
                FULL OUTER JOIN
                     (SELECT {bin_expr} AS bin, count(*) AS b
                      FROM lineitem WHERE l_linenumber > 3 GROUP BY 1) rb
                ON ra.bin = rb.bin
            )
        )
        GROUP BY na, nb, nbins
    """


DQ08_SQL = " UNION ALL ".join(_dq08_col_sql(c, e) for c, e in DQ08_BIN_SPECS)


DQ09_GRID = [0.01, 0.25, 0.5, 0.75, 0.99]


def dq09_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column quantile profile + Tukey outlier gate: exact
    percentiles on a fixed grid, IQR, 1.5-IQR fences, and the count of
    rows outside them — the numeric-shape report dq01's min/max/distinct
    profile can't give (a single corrupt batch shifts p99 long before it
    moves the max) and the standard fence check feeding row-quarantine.

    Determinism: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    linear-interpolation semantics on the same doubles (verified
    bit-equal on this data); every quantile rounds at 4 dp (+1e-9) and
    the fences/IQR derive from the ROUNDED values, so the outlier
    comparisons run on identical doubles in both engines.

    SCALE shape: two linear passes — ONE exact-percentile agg (at 100 TB
    this becomes ``approx_percentile``/t-digest, a mergeable partial agg;
    the exact form is the oracle-checkable twin and
    ``dq09_quantile_profile_approx`` below is that production path,
    tested against this op's error bound) and one fence-count agg
    with the 1-row fence frame broadcast. The report is column-count
    sized."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=True).select(*PROFILE_COLS)
    grid = ",".join(str(q) for q in DQ09_GRID)
    one = li.groupBy().agg(
        *[
            F.expr(f"percentile({c}, array({grid}))").alias(f"qs_{c}")
            for c in PROFILE_COLS
        ]
    )
    return _dq09_report(li, one)


def _dq09_report(li: DataFrame, one: DataFrame) -> DataFrame:
    """Shared dq09 report assembly: quantile-grid frame (1 row of
    ``qs_{col}`` double arrays, exact or approximate) -> rounded grid,
    IQR, Tukey fences, broadcast fence-count pass, melt. Identical
    arithmetic for the exact op and the approx production twin, so the
    two differ ONLY in the percentile estimator."""
    fcols = []
    for c in PROFILE_COLS:
        for i, q in enumerate(DQ09_GRID):
            fcols.append(
                F.round(F.col(f"qs_{c}").getItem(i) + 1e-9, 4).alias(
                    f"p{int(q * 100):02d}_{c}"
                )
            )
    fences = one.select(*fcols)
    for c in PROFILE_COLS:
        iqr = F.round(F.col(f"p75_{c}") - F.col(f"p25_{c}") + 1e-9, 4)
        fences = fences.withColumn(f"iqr_{c}", iqr)
        fences = fences.withColumn(
            f"lo_{c}", F.round(F.col(f"p25_{c}") - 1.5 * F.col(f"iqr_{c}") + 1e-9, 4)
        ).withColumn(
            f"hi_{c}", F.round(F.col(f"p75_{c}") + 1.5 * F.col(f"iqr_{c}") + 1e-9, 4)
        )
    counted = (
        li.crossJoin(F.broadcast(fences))
        .groupBy(*fences.columns)
        .agg(
            *[
                F.sum(
                    F.when(
                        (F.col(c) < F.col(f"lo_{c}")) | (F.col(c) > F.col(f"hi_{c}")),
                        1,
                    ).otherwise(0)
                ).alias(f"out_{c}")
                for c in PROFILE_COLS
            ]
        )
    )
    melted = counted.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        *[
                            F.col(f"p{int(q * 100):02d}_{c}").alias(
                                f"p{int(q * 100):02d}"
                            )
                            for q in DQ09_GRID
                        ],
                        F.col(f"iqr_{c}").alias("iqr"),
                        F.col(f"lo_{c}").alias("lo_fence"),
                        F.col(f"hi_{c}").alias("hi_fence"),
                        F.col(f"out_{c}").cast("long").alias("n_outliers"),
                    )
                    for c in PROFILE_COLS
                ]
            )
        ).alias("m")
    )
    return melted.select("m.*")


DQ09_ACCURACY = 10_000  # approx_percentile rank-error bound: n / accuracy


def dq09_quantile_profile_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = DQ09_ACCURACY
) -> DataFrame:
    """The 100 TB production path for dq09: the SAME report frame
    (columns, rounding, fences, outlier counts) with the quantile grid
    estimated by ``approx_percentile`` (Greenwald-Khanna, SPARK-16283)
    instead of exact ``percentile``.

    Why this exists as code and not a docstring: exact ``percentile``
    buffers every value into one per-column multiset merge — a
    corpus-sized single-point state no 1000-executor cluster should
    build. ``approx_percentile``'s summary is a MERGEABLE bounded
    partial aggregate (map-side state is O(accuracy), independent of
    input size) with a hard rank-error guarantee of n/accuracy.
    Plan-pinned in ``tests/test_quality_approx.py``: the plan carries
    ``approx_percentile`` and no exact ``percentile`` agg.

    Guarantee carried to the output: each reported quantile is an
    actual data value whose RANK is within n/accuracy of the target
    rank, i.e. its value lies within the exact-percentile envelope
    [percentile(q - 1/accuracy), percentile(q + 1/accuracy)] — the
    error-bound test asserts exactly that envelope at two scales.
    Fences/IQR/outlier counts inherit the estimator's displacement;
    the exact op (the DuckDB-oracle twin) remains the registry
    default."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=True).select(*PROFILE_COLS)
    grid = ",".join(str(q) for q in DQ09_GRID)
    one = li.groupBy().agg(
        *[
            F.expr(
                f"transform(approx_percentile({c}, array({grid}), {accuracy}),"
                " x -> cast(x as double))"
            ).alias(f"qs_{c}")
            for c in PROFILE_COLS
        ]
    )
    return _dq09_report(li, one)


def _dq09_sql() -> str:
    grid = ",".join(str(q) for q in DQ09_GRID)
    qsel = ", ".join(
        f"quantile_cont({c}, [{grid}]) AS qs_{c}" for c in PROFILE_COLS
    )
    psel = ", ".join(
        f"round(qs_{c}[{i + 1}] + 1e-9, 4) AS p{int(q * 100):02d}_{c}"
        for c in PROFILE_COLS
        for i, q in enumerate(DQ09_GRID)
    )
    isel = ", ".join(
        f"round(p75_{c} - p25_{c} + 1e-9, 4) AS iqr_{c}" for c in PROFILE_COLS
    )
    fsel = ", ".join(
        f"round(p25_{c} - 1.5 * iqr_{c} + 1e-9, 4) AS lo_{c}, "
        f"round(p75_{c} + 1.5 * iqr_{c} + 1e-9, 4) AS hi_{c}"
        for c in PROFILE_COLS
    )
    osel = ", ".join(
        f"CAST(sum(CASE WHEN {c} < lo_{c} OR {c} > hi_{c} THEN 1 ELSE 0 END) AS BIGINT) AS out_{c}"
        for c in PROFILE_COLS
    )
    melt = " UNION ALL ".join(
        f"SELECT '{c}' AS column, "
        + ", ".join(
            f"p{int(q * 100):02d}_{c} AS p{int(q * 100):02d}" for q in DQ09_GRID
        )
        + f", iqr_{c} AS iqr, lo_{c} AS lo_fence, hi_{c} AS hi_fence, "
        f"out_{c} AS n_outliers FROM counted"
        for c in PROFILE_COLS
    )
    return f"""
    WITH one AS (SELECT {qsel} FROM lineitem),
    p AS (SELECT {psel} FROM one),
    i AS (SELECT *, {isel} FROM p),
    f AS (SELECT *, {fsel} FROM i),
    counted AS (
        SELECT f.*, {osel}
        FROM lineitem CROSS JOIN f
        GROUP BY ALL
    )
    {melt}
"""


DQ09_SQL = _dq09_sql()


QUERIES = {
    "dq01_profile": dq01_profile,
    "dq02_constraints": dq02_constraints,
    "dq03_snapshot_drift": dq03_snapshot_drift,
    "dq04_volume_anomaly": dq04_volume_anomaly,
    "dq05_row_expectations": dq05_row_expectations,
    "dq06_freshness_sla": dq06_freshness_sla,
    "dq07_referential_integrity": dq07_referential_integrity,
    "dq08_psi_drift": dq08_psi_drift,
    "dq09_quantile_profile": dq09_quantile_profile,
}

ORACLES = {
    "dq01_profile": DQ01_SQL,
    "dq02_constraints": DQ02_SQL,
    "dq03_snapshot_drift": DQ03_SQL,
    "dq04_volume_anomaly": DQ04_SQL,
    "dq05_row_expectations": DQ05_SQL,
    "dq06_freshness_sla": DQ06_SQL,
    "dq07_referential_integrity": DQ07_SQL,
    "dq08_psi_drift": DQ08_SQL,
    "dq09_quantile_profile": DQ09_SQL,
}
