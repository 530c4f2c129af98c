"""Skew- and shuffle-management utilities for 100 TB joins.

- ``salted_join``: the classic hot-key fix — the big side gets a
  deterministic salt in [0, n); the small side is exploded n× so every
  (key, salt) bucket matches. Turns one monster partition into n even
  ones at the cost of replicating the small side n times. (AQE's skew
  join handles moderate skew automatically — the session factory enables
  it; salting is for the pathological single-key case.)

- ``bucket_table``: materialize a DataFrame as a bucketed+sorted table so
  later equi-joins on the bucket key are co-located (no Exchange in the
  join plan). The 100 TB pattern: bucket both fact tables on the join key
  once, join shuffle-free forever after.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys. The salt is derived deterministically
    from xxhash64 of the whole big-side row (uniform, reproducible — no
    rand(), so results and tests are stable)."""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key]) & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")


def bucket_table(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Save ``df`` as a bucketed+sorted managed table (idempotent) and
    return a reader over it. Joins between two tables bucketed on the same
    key with the same bucket count skip the shuffle entirely."""
    if not spark.catalog.tableExists(table_name):
        # with the default in-memory catalog, table metadata dies with the
        # session but the managed location survives — clear orphaned dirs
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table_name)
        if os.path.exists(loc):
            shutil.rmtree(loc)
        (
            df.write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(table_name)
        )
    return spark.table(table_name)
