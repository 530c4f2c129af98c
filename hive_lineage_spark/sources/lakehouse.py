"""Lakehouse table-format connectors (Delta Lake, Iceberg, Hudi).

The formats are first-class in the engine design — reads/writes go
through the same ``spark.read.format(...)`` path as parquet/orc, and the
lineage layer resolves their scans by location exactly like file scans —
but their jars are not on this environment's classpath, so each connector
is gated behind an import/classpath probe and raises a clear error
instead of a py4j ClassNotFound stack.

For the lakehouse MECHANICS without external jars, ``vtable.py``
implements the protocol natively (commit-log manifest, snapshot reads,
time travel, compaction, data skipping) — use it where Delta/Iceberg
jars are unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {
    "delta": ("delta", "io.delta:delta-spark"),
    "iceberg": ("iceberg", "org.apache.iceberg:iceberg-spark-runtime"),
    "hudi": ("hudi", "org.apache.hudi:hudi-spark-bundle"),
}


def _probe(spark: SparkSession, fmt: str) -> bool:
    """Can this session load the given data-source format?"""
    try:
        lookup = spark._jvm.org.apache.spark.sql.execution.datasources.DataSource
        lookup.lookupDataSource(fmt, spark._jsparkSession.sessionState().conf())
        return True
    except Exception:  # noqa: BLE001 — ClassNotFound & friends
        return False


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown lakehouse format {fmt!r}; known: {sorted(_FORMATS)}")
    if not _probe(spark, fmt):
        name, coordinate = _FORMATS[fmt]
        raise NotImplementedError(
            f"{fmt} support requires the {coordinate} jars on the Spark "
            f"classpath (add via spark.jars.packages); not available in "
            f"this environment. The read path is spark.read.format({name!r}).load(path)."
        )
    return spark.read.format(fmt).load(path)


def write_table(df: DataFrame, fmt: str, path: str, mode: str = "overwrite") -> None:
    spark = df.sparkSession
    if fmt not in _FORMATS:
        raise ValueError(f"unknown lakehouse format {fmt!r}; known: {sorted(_FORMATS)}")
    if not _probe(spark, fmt):
        _, coordinate = _FORMATS[fmt]
        raise NotImplementedError(
            f"{fmt} support requires the {coordinate} jars on the Spark classpath"
        )
    df.write.format(fmt).mode(mode).save(path)
