"""Demo: run the lineage hook over representative queries and print the
full reports (operator graphs, normalized physical plans, column lineage,
write→read stitching) — the rebuild's equivalent of the reference's
console output (``PostExecHook.scala:73-79``).

Usage: python tools/lineage_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from hive_lineage_spark.hook import LineageTracker
    from hive_lineage_spark.operators.relational import q14_agg_tpch_q1, q17_q27_shape
    from hive_lineage_spark.operators.sql_extra import Q27_SQL_TEXT, q31_q27_sql_text
    from hive_lineage_spark.session import get_spark

    spark = get_spark("lineage_demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    tracker = LineageTracker()

    for name, fn, sql in [
        ("tpch_q1_shape", q14_agg_tpch_q1, None),
        ("tpcds_q27_shape", q17_q27_shape, None),
        ("tpcds_q27_sql", q31_q27_sql_text, Q27_SQL_TEXT),
    ]:
        df = fn(spark, sf_dir)
        df.collect()
        ql = tracker.track(df, name=name, sql_text=sql)
        print(ql.report())
        print()

    # write → read-back stitch
    out = os.path.join(REPO, ".scratch", "demo", "filtered_orders")
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    tracker.track_write(
        o.filter(F.col("o_totalprice") > 50000).select("o_orderkey", "o_custkey", "o_totalprice"),
        out,
        name="insert_filtered_orders",
    )
    back = spark.read.parquet(out).groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    back.collect()
    print(tracker.track(back, name="readback_spend").report())

    spark.stop()


if __name__ == "__main__":
    main()
