"""Data-contract assertions the operators rely on but cannot enforce.

q27's union-merge as-of compares at whole-second granularity
(``naive_epoch_seconds``) — exact as long as order timestamps carry no
sub-second component (they are midnight-aligned dates in TESTDATA). If
a future data generator introduces sub-second o_orderdate values, this
test fails loudly instead of q27 silently diverging from its oracle.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", SFS)
def test_order_timestamps_are_second_aligned(sf):
    col = pq.read_table(f"{sf}/orders.parquet", columns=["o_orderdate"]).column("o_orderdate")
    # TESTDATA stores timestamps at ns/µs precision; the as-of contract
    # only needs zero sub-second component
    import numpy as np
    import pyarrow.compute as pc

    epoch = pc.cast(col, "int64").combine_chunks().to_numpy(zero_copy_only=False)
    unit = col.type.unit
    per_sec = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
    assert int(np.abs(epoch % per_sec).max(initial=0)) == 0, (
        "o_orderdate has sub-second components — q27's whole-second merge "
        "granularity (operators/relational.py q27_asof_join) is no longer exact"
    )
