"""Table registry over the driver-generated parquet TESTDATA.

The reference resolves scans to catalog entities through a
``path → Def`` location map (``hook/PostExecHook.scala:43-61``,
consumed at ``qinfo/TaskInfo.scala:78-84``). Here the same role is
played by this registry: every query addresses tables by name, the
registry maps names to parquet paths, and the lineage layer
(``hive_lineage_spark.lineage``) maps scan paths back to table names.

Scans stay fully declarative (``spark.read.parquet``) so Catalyst keeps
predicate pushdown / column pruning / partition pruning — at 100 TB the
scan is the dominant cost and pruning is the first-order optimization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def scratch_key(sf_dir: str) -> str:
    """Per-sf_dir key for derived caches under ``.scratch/``: readable
    basename + an abs-path hash, so two distinct dirs sharing a basename
    (/a/sf0.01 vs /b/sf0.01) never reuse each other's derived data."""
    import hashlib

    norm = os.path.abspath(os.path.normpath(sf_dir))
    return (os.path.basename(norm) or "sf") + "-" + hashlib.sha1(norm.encode()).hexdigest()[:8]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark 4's parquet
    reader rejects (PARQUET_TYPE_ILLEGAL). Materialize a µs-normalized copy
    once per sf_dir and scan that — so every downstream plan keeps native
    timestamp pushdown. The conversion is a one-time driver-side pass with
    pyarrow (tiny table); on a real cluster the equivalent is a one-time
    Spark job with ``spark.sql.legacy.parquet.nanosAsLong=true`` +
    ``timestamp_micros(ts div 1000)``, which scales to any size.
    """
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "events_us")
    out_file = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(out_file):
        import pyarrow as pa

        tbl = pq.read_table(table_path(sf_dir, "events"))
        fields = [
            pa.field(f.name, pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
            for f in tbl.schema
        ]
        # safe=False: truncate sub-µs digits — Spark timestamps are µs
        # precision anyway, and no query depends on sub-second ordering.
        tbl = tbl.cast(pa.schema(fields), safe=False)
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out_file)
    return spark.read.parquet(out_file)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every TESTDATA table as a temp view; returns the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
