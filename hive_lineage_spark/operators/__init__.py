"""Query/operator surface.

Each module exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL equivalents). Keys are
globally unique; ``hive_lineage_spark.operators.all_queries()`` merges them
for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import dedup, multimodal, pandas_ops, pipeline, relational, similarity, sql_extra, text

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from . import dedup, multimodal, pandas_ops, pipeline, relational, similarity, sql_extra, text

    merged: dict[str, str] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops):
        merged.update(mod.ORACLES)
    return merged
