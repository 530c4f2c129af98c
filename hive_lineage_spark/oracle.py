"""Order-insensitive DataFrame↔DuckDB comparison helpers, shared by
tests and tools/check_oracle.py. Mirrors the driver's correctness gate:
row count + column names (sorted) + value hash over normalized cells.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os


def norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        if v == int(v) and abs(v) < 2**53:
            return repr(int(v))  # 3.0 and 3 hash alike across engines
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def duckdb_connection(sf_dir: str):
    """DuckDB connection with every TESTDATA table registered as a view —
    the driver does the same before running oracle SQL."""
    import duckdb

    from .sources.registry import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def spark_fingerprint(df) -> tuple[int, list[str], str]:
    rows = [tuple(r) for r in df.collect()]
    return frame_fingerprint(list(df.columns), rows)


def duckdb_fingerprint(con, sql: str) -> tuple[int, list[str], str]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return frame_fingerprint(cols, res.fetchall())
