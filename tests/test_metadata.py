"""Catalog metadata model unit tests (Model upsert semantics, fqn scheme
— ``core/.../metadata/Model.scala:5-22``, ``ConvertHelper.scala:10-19``).
"""

from __future__ import annotations

import pytest

from hive_lineage_spark.metadata import (
    ColumnDef,
    DbDef,
    DirectoryDef,
    Model,
    PartitionDef,
    TableDef,
    column_fqn,
    db_fqn,
    dir_fqn,
    partition_fqn,
    table_from_columns,
    table_fqn,
)


def test_fqn_scheme_matches_reference():
    assert db_fqn("tpcds") == "database:tpcds"
    assert table_fqn("tpcds", "item") == "tpcds@item"
    assert partition_fqn("tpcds", "store_sales", "ss_store_sk=1") == "tpcds@store_sales@ss_store_sk=1"
    assert column_fqn("tpcds", "item", "i_item_sk") == "tpcds@item.i_item_sk"
    assert dir_fqn("/tmp/out", is_local=True) == "local:/tmp/out"
    assert dir_fqn("/data/out", is_local=False) == "dfs:/data/out"


def test_model_add_upserts_by_fqn():
    m = Model()
    t1 = table_from_columns("item", "/a", [("i_item_sk", "bigint")])
    t2 = table_from_columns("item", "/b", [("i_item_sk", "bigint"), ("i_brand", "string")])
    m.add(t1)
    m.add(t2)  # same fqn → replaces
    got = m.get("default@item", TableDef)
    assert got.location == "/b"
    assert len(got.columns) == 2


def test_model_typed_get_raises_on_wrong_type():
    m = Model()
    m.add(DbDef(fqn=db_fqn("d"), name="d"))
    with pytest.raises(TypeError):
        m.get("database:d", TableDef)


def test_model_of_type_filters():
    m = Model()
    m.add(DbDef(fqn="database:x", name="x"))
    m.add(DirectoryDef(fqn="local:/tmp", path="/tmp"))
    m.add(PartitionDef(fqn="d@t@p=1", table_fqn="d@t", values=("1",)))
    assert len(m.of_type(DirectoryDef)) == 1
    assert len(m.of_type(PartitionDef)) == 1


def test_table_def_column_lookup():
    t = table_from_columns("item", "/a", [("a", "int"), ("b", "string")])
    assert t.column("b").data_type == "string"
    assert t.column("zzz") is None
    assert isinstance(t.column("a"), ColumnDef)


def test_lakehouse_connectors_fail_cleanly_without_jars(spark):
    """Delta/Iceberg/Hudi are classpath-gated: without their jars the
    connector raises a clear NotImplementedError, not a py4j stack."""
    import pytest as _pytest

    from hive_lineage_spark.sources.lakehouse import read_table

    for fmt in ("delta", "iceberg", "hudi"):
        with _pytest.raises((NotImplementedError, Exception)) as exc:
            read_table(spark, fmt, "/tmp/nonexistent")
        # parquet IS available, so the probe mechanism itself works
    with _pytest.raises(ValueError):
        read_table(spark, "not_a_format", "/tmp/x")


def test_snapshot_ts_upsert_keeps_newest():
    """Per-query snapshots upsert by fqn with a timestamp — the rebuild's
    analog of the reference's lastAccessTime-gated re-convert
    (``ConvertHelper.scala:58,121``): the newest snapshot wins."""
    m = Model()
    t1 = table_from_columns("item", "/a", [("a", "int")])
    t2 = table_from_columns("item", "/a", [("a", "int"), ("b", "string")])
    assert 0 < t1.snapshot_ts <= t2.snapshot_ts
    m.add(t1)
    m.add(t2)
    assert m.get("default@item", TableDef).snapshot_ts == t2.snapshot_ts
