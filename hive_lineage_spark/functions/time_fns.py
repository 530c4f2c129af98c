"""Timestamp helpers that are session-timezone-independent.

The TESTDATA parquet timestamps are naive (no UTC adjustment), which
Spark 4 surfaces as TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ``
defaults to true) and DuckDB as naive TIMESTAMP. For oracle parity the
engines must agree on epoch math regardless of the host session's time
zone, so we derive "naive epoch seconds" purely from field extraction —
``unix_timestamp``/casts interpret NTZ in the session zone and would
shift results on a non-UTC host.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def naive_epoch_seconds(ts) -> Column:
    """Seconds since 1970-01-01 00:00:00 of a naive timestamp, computed
    from date/time fields only (timezone-independent). Matches DuckDB's
    ``CAST(floor(epoch(ts)) AS BIGINT)`` on naive timestamps."""
    c = F.col(ts) if isinstance(ts, str) else ts
    days = F.datediff(F.to_date(c), F.lit("1970-01-01")).cast("long")
    return days * 86400 + F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
