"""Catalog metadata model — the rebuild of the reference's Def/Model layer
(``core/src/main/scala/org/sparklinedata/hive/metadata/*.scala`` and the
metastore conversion in ``hivehook/.../hook/ConvertHelper.scala:8-165``).

FQN conventions follow the reference (``ConvertHelper.scala:10-19``):
``database:<name>``, ``<db>@<table>``, ``<db>@<table>@<partition>``,
``dfs:<path>``, ``local:<path>``, ``temp:<path>``.

Unlike the reference (mutable registry mutated from Def constructors,
``DbDef.scala:11``), these are frozen dataclasses registered explicitly —
same information, Python-idiomatic.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Def:
    fqn: str


@dataclass(frozen=True)
class DbDef(Def):
    name: str = "default"
    description: str = ""
    owner: str = ""
    params: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class ColumnDef(Def):
    table_fqn: str = ""
    name: str = ""
    data_type: str = ""  # Spark simpleString, e.g. "bigint" (≈ ColumnDef.dataType string)
    comment: str = ""


@dataclass(frozen=True)
class TableDef(Def):
    name: str = ""
    db: str = "default"
    table_type: str = "table"  # table | view | path
    location: str = ""
    input_format: str = "parquet"
    columns: tuple[ColumnDef, ...] = ()
    partition_columns: tuple[str, ...] = ()
    # reference parity: TableDef.viewSql : Option[(original, expanded)]
    # (``metadata/TableDef.scala:12``, populated ConvertHelper.scala:67-73
    # from getViewOriginalText/getViewExpandedText). Spark's CatalogTable
    # carries the same pair as viewOriginalText/viewText.
    view_sql: str = ""
    view_sql_expanded: str = ""
    # when this def was snapshotted (epoch seconds) — the staleness
    # analog of the reference's lastAccessTime-gated re-convert
    # (``ConvertHelper.scala:58,121``): Model.add upserts by fqn, so the
    # NEWEST tracked query's schema wins; a table changed by an
    # untracked job is refreshed at the next tracked query over it (and
    # the ``install()`` listener makes same-session writes tracked).
    snapshot_ts: float = 0.0
    params: tuple[tuple[str, str], ...] = ()

    def column(self, name: str) -> ColumnDef | None:
        for c in self.columns:
            if c.name == name:
                return c
        return None


@dataclass(frozen=True)
class PartitionDef(Def):
    table_fqn: str = ""
    values: tuple[str, ...] = ()
    location: str = ""


@dataclass(frozen=True)
class DirectoryDef(Def):
    path: str = ""
    is_local: bool = True


@dataclass(frozen=True)
class TempFileDef(Def):
    """Intermediate/scratch path (≈ ``TaskInfo.scala:134-136``)."""

    path: str = ""


def db_fqn(name: str) -> str:
    return f"database:{name}"


def table_fqn(db: str, table: str) -> str:
    return f"{db}@{table}"


def column_fqn(db: str, table: str, col: str) -> str:
    return f"{db}@{table}.{col}"


def partition_fqn(db: str, table: str, part: str) -> str:
    return f"{db}@{table}@{part}"


def dir_fqn(path: str, is_local: bool = True) -> str:
    return f"{'local' if is_local else 'dfs'}:{path}"


@dataclass
class Model:
    """fqn → Def registry (≈ ``core/.../metadata/Model.scala:5-22``):
    ``add`` upserts by fqn, typed ``get`` looks up."""

    defs: dict[str, Def] = field(default_factory=dict)

    def add(self, d: Def) -> Def:
        self.defs[d.fqn] = d
        return d

    def get(self, fqn: str, cls: type | None = None) -> Def | None:
        d = self.defs.get(fqn)
        if d is not None and cls is not None and not isinstance(d, cls):
            raise TypeError(f"{fqn} is {type(d).__name__}, wanted {cls.__name__}")
        return d

    def of_type(self, cls: type) -> list[Def]:
        return [d for d in self.defs.values() if isinstance(d, cls)]


def snapshot_table(df_schema, name: str, location: str, db: str = "default") -> TableDef:
    """Build a TableDef from a Spark StructType + path (the rebuild's
    ConvertHelper: schemas come from the live DataFrame/catalog instead of
    the Hive metastore, per SURVEY.md §1.3)."""
    return table_from_columns(
        name, location, [(f.name, f.dataType.simpleString()) for f in df_schema.fields], db
    )


def table_from_columns(
    name: str, location: str, cols: list[tuple[str, str]], db: str = "default"
) -> TableDef:
    import time

    fqn = table_fqn(db, name)
    col_defs = tuple(
        ColumnDef(fqn=column_fqn(db, name, n), table_fqn=fqn, name=n, data_type=dt)
        for n, dt in cols
    )
    return TableDef(
        fqn=fqn, name=name, db=db, location=location, columns=col_defs,
        snapshot_ts=time.time(),
    )
