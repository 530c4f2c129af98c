"""Scale-utility tests: salted joins preserve semantics while splitting
hot keys; bucketed tables join without a shuffle (no Exchange in plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_lineage_spark.functions.skew import bucket_table, salted_join

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", "o_orderkey", n_salt=4)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_splits_hot_key(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    j = salted_join(li, o, "l_orderkey", "o_orderkey", n_salt=4)
    # the salt column is internal — never leaks into the result schema
    assert "__salt" not in j.columns


def test_bucketed_join_has_no_shuffle(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    bl = bucket_table(spark, li, "bt_lineitem", "l_orderkey", n_buckets=4)
    bo = bucket_table(spark, o, "bt_orders", "o_orderkey", n_buckets=4)
    # tiny test tables would auto-broadcast (which disables bucketed reads);
    # hint a merge join — the shape these tables would get at 100 TB
    joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_aggregation_avoids_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    bl = bucket_table(spark, li, "bt_lineitem", "l_orderkey", n_buckets=4)
    agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# Skew-hardened fixture: one pathological hot user (20k events, 2k orders)
# among normal users. The union-merge as-of (q27) and sessionization (q25)
# must stay linear on it — the old inequality-join as-of would have built
# 20k x 2k = 4e7 intermediate rows for the hot key alone.
# ---------------------------------------------------------------------------

from tools.skewfix import HOT_EVENTS, skew_dir as _skew_dir  # noqa: E402


def _duck(sql: str, d: str):
    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_asof_join_survives_hot_user(spark):
    """q27 on the skewed fixture: oracle-identical AND still the single
    user-keyed exchange — no pair explosion on the 20k x 2k hot key."""
    from hive_lineage_spark.operators import relational as R

    d = _skew_dir()
    df = R.q27_asof_join(spark, d)
    got = sorted(map(tuple, df.collect()))
    want = _duck(R.ORACLES["q27_asof_join"], d)
    assert got == want and len(got) > HOT_EVENTS // 2 - 100
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_sessionization_survives_hot_user(spark):
    from hive_lineage_spark.operators import relational as R

    d = _skew_dir()
    got = sorted(map(tuple, R.q25_sessionization(spark, d).collect()))
    want = _duck(R.ORACLES["q25_sessionization"], d)
    assert got == want
    hot = [r for r in got if r[0] == 1]
    assert hot and hot[0][2] == HOT_EVENTS
