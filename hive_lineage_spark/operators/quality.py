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
    li = load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
            F.round(F.min(c), 4).alias(f"min_{c}"),
            F.round(F.max(c), 4).alias(f"max_{c}"),
        ]
    one = li.groupBy().agg(*aggs)
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


QUERIES = {
    "dq01_profile": dq01_profile,
    "dq02_constraints": dq02_constraints,
}

ORACLES = {
    "dq01_profile": DQ01_SQL,
    "dq02_constraints": DQ02_SQL,
}
