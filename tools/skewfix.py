"""Deterministic skewed events/orders fixture: one pathological hot user
(20k events, 2k orders) among 50 normal users, laid out like an sf_dir so
the production queries (q25 sessionization, q27 as-of join) run on it
unchanged.

Shared by ``tests/test_skew_bucketing.py`` (oracle-identical + plan
assertions) and ``bench.py`` (hot-key wall time recorded in BENCH extra
so skew regressions are visible round-over-round).
"""

from __future__ import annotations

import os

HOT_EVENTS, HOT_ORDERS = 20_000, 2_000


def skew_dir() -> str:
    """Generate the fixture once under .scratch/skewfix; return its path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.path.join(repo, ".scratch", "skewfix")
    if os.path.exists(os.path.join(d, "orders.parquet")):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(42)

    def events_rows(user, n, base):
        ts = base + np.sort(rng.integers(0, 90 * 86400, n))
        return user * np.ones(n, dtype=np.int64), ts

    hot_u, hot_ts = events_rows(1, HOT_EVENTS, 0)
    cold = [events_rows(u, 10, 0) for u in range(2, 52)]
    user_id = np.concatenate([hot_u] + [c[0] for c in cold])
    ts_sec = np.concatenate([hot_ts] + [c[1] for c in cold])
    n = len(user_id)
    ev = pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array((np.int64(1704067200) + ts_sec) * 1_000_000, pa.timestamp("us")),
        "user_id": pa.array(user_id, pa.int64()),
        "event_type": pa.array(np.where(np.arange(n) % 2 == 0, "purchase", "view")),
        "value": pa.array(rng.uniform(0, 100, n).round(2), pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(ev, os.path.join(d, "events.parquet"))

    m = HOT_ORDERS + 50 * 5
    cust = np.concatenate([np.ones(HOT_ORDERS, dtype=np.int64),
                           np.repeat(np.arange(2, 52), 5)])
    odays = rng.integers(0, 90, m)
    od = pa.table({
        "o_orderkey": pa.array(np.arange(1, m + 1), pa.int64()),
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderstatus": pa.array(["O"] * m),
        "o_totalprice": pa.array(rng.uniform(100, 9999, m).round(2), pa.float64()),
        "o_orderdate": pa.array((np.int64(1704067200) + odays * 86400) * 1_000_000,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * m),
    })
    pq.write_table(od, os.path.join(d, "orders.parquet"))
    return d
