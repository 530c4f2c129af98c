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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False
) -> DataFrame:
    """``fan_out=True`` is for operators whose PRE-exchange per-row work
    is heavy (gram hashing, rolling hashes, HOF encoders): when the
    source parquet is effectively unsplittable (fewer row groups than
    cores — the driver-generated tables are single-row-group files, so
    every scan is one task no matter the split sizing), insert one
    round-robin repartition right after the scan so the compute
    distributes (guide §2.5's unsplittable-input rule). On inputs with
    enough row groups/files the condition is false and NO exchange is
    added — production corpora ship thousands of splits, so this is a
    no-op there by construction."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        df = load_events(spark, sf_dir)
        path = _events_us_file(sf_dir)
    else:
        path = table_path(sf_dir, name)
        df = spark.read.parquet(path)
    if fan_out:
        df = fan_out_scan(df, spark, path)
    return df


_SPLITTABLE_UNITS: dict[str, int] = {}


def splittable_units(path: str) -> int:
    """Independently readable chunks of a parquet location = row groups
    summed across files (a row group is Spark's atomic scan unit; a
    single-row-group file reads as ONE task regardless of split
    sizing). Footer-metadata only — no data read; cached per path."""
    n = _SPLITTABLE_UNITS.get(path)
    if n is None:
        import glob

        import pyarrow.parquet as pq

        files = (
            [path]
            if os.path.isfile(path)
            else sorted(glob.glob(os.path.join(path, "*.parquet")))
        )
        n = 0
        for f in files:
            try:
                n += pq.ParquetFile(f).metadata.num_row_groups
            except Exception:  # noqa: BLE001 — unreadable footer: count the file
                n += 1
        n = max(n, 1)
        _SPLITTABLE_UNITS[path] = n
    return n


def fan_out_scan(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    """Round-robin repartition AFTER an unsplittable scan, only when the
    input cannot feed at least half the cluster's cores by row-group
    parallelism alone. The repartition exchange moves the table once —
    the price the optimization guide sanctions for single-unsplittable-
    file inputs — and is skipped entirely on well-laid-out inputs."""
    par = spark.sparkContext.defaultParallelism
    if splittable_units(path) * 2 >= par:
        return df
    return df.repartition(par)


def _events_us_file(sf_dir: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, ".scratch", scratch_key(sf_dir), "events_us2", "events.parquet")


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

    out_file = _events_us_file(sf_dir)
    out_dir = os.path.dirname(out_file)
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
        # row-grouped so the scan parallelizes (a single row group is
        # one task no matter how the file is split — r16, guide §6)
        pq.write_table(tbl, tmp, row_group_size=max(1024, tbl.num_rows // 64))
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
