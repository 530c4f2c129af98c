"""Evidence-leg kill switch (``operators/evidence.py``): with
``evidence=False`` (production mode) the exact oracle-evidence legs —
exactly the corpus-keyed exchanges the sketches/ANN serving paths exist
to avoid at 100 TB — must be ABSENT FROM THE PLAN, not just unused; and
the surviving columns must carry the identical values the oracle-mode
run produces (the approximation itself is untouched).
"""

from __future__ import annotations

import re

import pytest

from hive_lineage_spark.operators import sketches as SK
from hive_lineage_spark.operators import similarity as SS
from hive_lineage_spark.operators.dedup import clear_postings_cache
from hive_lineage_spark.operators.evidence import ENV_FLAG, evidence_enabled

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exchange_keys(plan: str) -> list[str]:
    return re.findall(r"Exchange hashpartitioning\(([^)]*?), \d+\)", plan)


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_env_flag_resolution(monkeypatch):
    assert evidence_enabled(None) is True  # default: oracle mode
    assert evidence_enabled(False) is False
    monkeypatch.setenv(ENV_FLAG, "0")
    assert evidence_enabled(None) is False
    assert evidence_enabled(True) is True  # explicit arg beats env


def test_sk01_evidence_off_drops_gram_exchange(spark):
    off = SK.sk01_hll_distinct(spark, SF, evidence=False)
    assert off.columns == ["lang", "hll_est", "n_regs"]
    plan = _plan(off)
    # the exact countDistinct leg is the gram-keyed corpus exchange;
    # with it gone only register-sized keys remain
    assert "gram" not in " | ".join(_exchange_keys(plan)), plan
    assert "count(distinct" not in plan.lower(), plan
    on = SK.sk01_hll_distinct(spark, SF, evidence=True)
    assert _rows(off) == _rows(on, ["lang", "hll_est", "n_regs"])


def test_sk02_evidence_off_probes_watchlist_only(spark):
    wl = ["the", "zz-not-in-corpus"]
    off = SK.sk02_countmin_topk(spark, SF, evidence=False, watchlist=wl)
    assert off.columns == ["word", "cm_est"]
    plan = _plan(off)
    # ONE corpus scan (the capped 2048-cell counter build); the exact
    # full-vocabulary word agg and its top-k are gone
    assert plan.count("Scan parquet") == 1, plan
    assert "TakeOrdered" not in plan, plan
    got = dict(_rows(off))
    assert set(got) == set(wl)
    assert got["zz-not-in-corpus"] == 0  # empty cells probe as 0, not a drop
    # probed estimates agree with the evidence-mode sketch (same cells)
    on = {r["word"]: r["cm_est"] for r in SK.sk02_countmin_topk(spark, SF).collect()}
    for w, est in got.items():
        if w in on:
            assert est == on[w]
    # production mode without a watchlist is an explicit error
    with pytest.raises(ValueError, match="watchlist"):
        SK.sk02_countmin_topk(spark, SF, evidence=False)


def test_sk03_evidence_off_drops_gram_distinct_and_exact_join(spark):
    clear_postings_cache()
    off = SK.sk03_hll_source_overlap(spark, SF, evidence=False)
    assert "exact_inter" not in off.columns
    plan = _plan(off)
    keys = _exchange_keys(plan)
    # no gram-keyed exchange anywhere: no distinct, no pair self-join —
    # every shuffle keys on source/bucket/pair columns (register-sized
    # post map-combine)
    joined = " | ".join(keys)
    assert "gram" not in joined, keys
    assert keys, plan
    on = SK.sk03_hll_source_overlap(spark, SF, evidence=True)
    shared = ["src_a", "src_b", "est_a", "est_b", "est_union", "est_inter",
              "noise_floor", "resolvable"]
    assert _rows(off, shared) == _rows(on, shared)
    clear_postings_cache()


def test_sk04_evidence_off_single_corpus_pass(spark):
    off = SK.sk04_hll_precision_ladder(spark, SF, evidence=False)
    assert off.columns == ["m", "sigma_pct", "hll_est"]
    plan = _plan(off)
    assert "count(distinct" not in plan.lower(), plan
    assert "gram" not in " | ".join(_exchange_keys(plan)), plan
    # ONE corpus pass feeds all three rungs: the shared finest-bucket
    # register agg explodes per m — a single linear plan, one scan
    assert plan.count("Scan parquet") == 1, plan
    on = SK.sk04_hll_precision_ladder(spark, SF, evidence=True)
    assert _plan(on).count("Scan parquet") == 2  # + the exact evidence leg
    assert _rows(off) == _rows(on, ["m", "sigma_pct", "hll_est"])


def test_ss19_evidence_off_drops_exact_leg(spark):
    clear_postings_cache()
    off = SS.ss19_ann_filtered(spark, SF, evidence=False)
    on = SS.ss19_ann_filtered(spark, SF, evidence=True)
    assert off.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    p_off, p_on = _plan(off), _plan(on)
    # the brute-force ground-truth leg re-scans the corpus; serving
    # mode must not touch it
    assert p_off.count("Scan parquet") < p_on.count("Scan parquet"), p_off
    assert _rows(off) == _rows(on, off.columns)
    clear_postings_cache()


def test_ss20_evidence_off_drops_exact_leg(spark):
    clear_postings_cache()
    from hive_lineage_spark.operators.dedup import _POSTINGS_CACHE

    off = SS.ss20_ann_binary(spark, SF, evidence=False)
    # the off path never even builds the exact ground-truth artifact
    assert "ss09_exact" not in {k[2] for k in _POSTINGS_CACHE}
    on = SS.ss20_ann_binary(spark, SF, evidence=True)
    assert off.columns == ["query_id", "neighbor_id", "hamming", "cosine", "rank"]
    p_off, p_on = _plan(off), _plan(on)
    # r16: the exact leg enters the ON plan as the session's
    # CHECKPOINTED shortlist (a leaf scan, no longer a live parquet
    # subtree) — so the old scan-count proxy became a leaf-presence
    # check plus the cache-tag assertion above
    assert "ss09_exact" in {k[2] for k in _POSTINGS_CACHE}
    assert "Scan ExistingRDD" in p_on or "RDDScan" in p_on, p_on
    assert "Scan ExistingRDD" not in p_off and "RDDScan" not in p_off, p_off
    assert _rows(off) == _rows(on, off.columns)
    clear_postings_cache()


def test_sk05_evidence_off_skips_gram_persist(spark):
    clear_postings_cache()
    off = SK.sk05_source_intake_report(spark, SF, evidence=False)
    plan = _plan(off)
    # no persisted gram artifact, no distinct: the vocab registers build
    # from one un-persisted pass; exchanges key on source/bucket/hash
    assert "InMemoryTableScan" not in plan, plan
    assert "gram" not in " | ".join(_exchange_keys(plan)), plan
    on = SK.sk05_source_intake_report(spark, SF, evidence=True)
    assert _rows(off) == _rows(on, off.columns)
    clear_postings_cache()
