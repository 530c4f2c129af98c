"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-DS-Q27-shaped query at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-checkable oracles (see
``hive_lineage_spark/operators/``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_lineage_spark.operators import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hive_lineage_spark.operators.relational import q17_q27_shape

    return q17_q27_shape(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; keys without an entry get the
    driver's weaker rows-only check (non-SQL-expressible ops)."""
    return all_oracles()
