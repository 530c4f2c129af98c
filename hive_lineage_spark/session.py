"""SparkSession factory tuned for the local[32] test box but configured
the way a 1000-executor cluster job would be: AQE on (runtime re-plan,
skew-join handling, partition coalescing — the Spark analog of the
reference's ConditionalTask runtime join choice, see
``hivehook/.../qinfo/QueryInfo.scala:28-39``), UTC session time zone so
results are comparable across engines, Arrow enabled for the Pandas-UDF
slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "hive_lineage_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or default_cpus()
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing's 1 MB minPartitionSize floor merges CPU-dense
        # but byte-tiny shuffle partitions (per-pair HOF compares over
        # array columns) down to single-digit task counts; 64 KB keeps
        # those parallel while still merging degenerate fragments. At
        # production shuffle sizes partitions sit far above either floor,
        # so the constant is inert there (r16, guide §2.2/§2.5).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_COALESCE_BYTES", str(64 * 1024)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # File-split sizing (r16, guide §6): Spark sizes scan splits as
        # min(maxPartitionBytes, max(openCostInBytes, bytes/minPartitionNum)).
        # An earlier r16 iteration lowered openCostInBytes to 16 KB to
        # parallelize the small CPU-dense fixture scans, but interleaved
        # A/B showed it taxing every cheap scan (tiny splits → task
        # overhead: q24 +0.25s, q25 +0.6s, mm01 +0.4s) while the decode
        # operators are served better by the split-aware scan fan-out in
        # sources/registry.py. Default (4 MB) retained; env-overridable
        # for experiments.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
