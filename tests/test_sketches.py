"""Semantic invariants + plan pins for the sketch operators (sk01-sk03)
— properties the cross-engine oracle cannot express: the HLL estimate
actually lands within its theoretical error band, Count-Min only ever
OVERestimates, register merge dominates its inputs (mergeability), and
the physical plans keep the sketch property (bounded map-side partial
aggs, broadcast-only joins on sketch-sized frames)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hive_lineage_spark.operators import sketches as SK

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# sk01: HLL cardinality
# ---------------------------------------------------------------------------


def test_sk01_hll_within_error_band(spark):
    rows = SK.sk01_hll_distinct(spark, SF).collect()
    assert rows and {r["lang"] for r in rows} >= {"en"}
    for r in rows:
        assert 1 <= r["n_regs"] <= SK.M_HLL
        assert r["hll_est"] > 0
        # 3x the standard error for m=256 (sigma ~ 1.04/sqrt(m) = 6.5%);
        # the linear-counting branch is tighter still
        assert abs(r["hll_est"] - r["n_exact"]) <= max(
            3 * 1.04 / math.sqrt(SK.M_HLL) * r["n_exact"], 3.0
        ), r
        # rel_err_pct is derived from the same rounded estimate
        expect = round((r["hll_est"] - r["n_exact"]) / r["n_exact"] * 100 + 1e-9, 2)
        assert abs(r["rel_err_pct"] - expect) < 1e-9, r


def test_sk01_registers_fold_matches_model(spark):
    """Rebuild the register array in Python from the same house hash and
    check the Spark fold (n_present, s_sparse are internal — verify via
    the published estimate)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("lang", "text").collect()
    regs: dict[str, dict[int, int]] = {}
    for row in docs:
        ws = row["text"].split(" ")
        grams = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)} if len(ws) >= 3 else set()
        for g in grams:
            h = 0
            for ch in g:
                h = (h * 31 + ord(ch)) % SK.MOD
            b, p = h & 255, h >> 8
            rho = SK.W_PAY + 1 - p.bit_length() if p else SK.W_PAY + 1
            cur = regs.setdefault(row["lang"], {})
            cur[b] = max(cur.get(b, 0), rho)
    got = {r["lang"]: r["hll_est"] for r in SK.sk01_hll_distinct(spark, SF).collect()}
    for lang, reg in regs.items():
        s = sum(1 << (30 - m) for m in reg.values()) + (SK.M_HLL - len(reg)) * (1 << 30)
        raw = SK.C_EST / s
        v = SK.M_HLL - len(reg)
        est = SK.M_HLL * math.log(SK.M_HLL / v) if (raw <= 2.5 * SK.M_HLL and v > 0) else raw
        assert abs(got[lang] - round(est + 1e-9, 6)) < 1e-6, lang


def test_sk01_plan_partial_agg_no_joins_before_fold(spark):
    plan = _plan(SK.sk01_hll_distinct(spark, SF))
    # the register build partial-aggregates map-side (sketch property)
    assert plan.count("HashAggregate") >= 4  # partial+final for regs and fold
    assert "CartesianProduct" not in plan
    # the only join is the tiny est<->exact assembly on lang
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# sk02: Count-Min
# ---------------------------------------------------------------------------


def test_sk02_countmin_never_underestimates(spark):
    rows = SK.sk02_countmin_topk(spark, SF).collect()
    assert 1 <= len(rows) <= SK.TOPK_CM
    total = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .count()
    )
    for r in rows:
        assert r["cm_est"] >= r["n_exact"] > 0, r
        assert r["overcount"] == r["cm_est"] - r["n_exact"]
        assert r["cm_est"] <= total  # a counter can never exceed the stream


def test_sk02_estimate_matches_python_model(spark):
    """Exact replay: depth-4 counters from the same hash ladder must
    reproduce every cm_est (integers end to end — no tolerance)."""
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    from collections import Counter

    exact: Counter[str] = Counter()
    cells: Counter[tuple[int, int]] = Counter()

    def phash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % SK.MOD
        return h

    for t in texts:
        for w in t.split(" "):
            exact[w] += 1
            h = phash(w)
            for r in range(SK.D_CM):
                cells[(r, ((h * (2 * r + 3) + (7 * r + 1)) % SK.MOD) & (SK.W_CM - 1))] += 1
    want = {
        w: min(
            cells[(r, ((phash(w) * (2 * r + 3) + (7 * r + 1)) % SK.MOD) & (SK.W_CM - 1))]
            for r in range(SK.D_CM)
        )
        for w in exact
    }
    for row in SK.sk02_countmin_topk(spark, SF).collect():
        assert row["n_exact"] == exact[row["word"]], row
        assert row["cm_est"] == want[row["word"]], row


def test_sk02_plan_broadcasts_counter_table(spark):
    plan = _plan(SK.sk02_countmin_topk(spark, SF))
    assert "BroadcastHashJoin" in plan  # 2048-row counters into 20 keys
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # the top-k evidence leg


# ---------------------------------------------------------------------------
# sk03: HLL merge / overlap
# ---------------------------------------------------------------------------


def test_sk03_merge_dominates_and_inclusion_exclusion(spark):
    rows = SK.sk03_hll_source_overlap(spark, SF).collect()
    srcs = {r["src_a"] for r in rows} | {r["src_b"] for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2  # every unordered pair
    for r in rows:
        assert r["src_a"] < r["src_b"]
        # register max-merge: union registers dominate each input's, so
        # the union estimate can't fall below either single estimate
        # (both sides resolve on the same branch family; tolerance for
        # the raw<->linear-counting crossover)
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-6, r
        assert r["est_inter"] >= 0
        expect = round(max(0.0, r["est_a"] + r["est_b"] - r["est_union"]) + 1e-9, 6)
        assert abs(r["est_inter"] - expect) < 1e-9, r
        assert r["exact_inter"] >= 0
        assert abs(r["noise_floor"] - round(SK.HLL_SIGMA * r["est_union"] + 1e-9, 6)) < 1e-9
        assert r["resolvable"] == int(r["est_inter"] > 2 * r["noise_floor"]), r


def test_sk03_error_within_noise_floor_bound(spark):
    """The real HLL-intersection guarantee: inclusion-exclusion error
    scales with the UNION (sigma x |A u B|), not the intersection — so
    |est - exact| must sit within a few noise floors, and any pair the
    op flags ``resolvable`` must carry genuinely above-floor overlap.
    (A value-accuracy assertion on est_inter itself would be WRONG: at
    this corpus the true overlaps sit below the floor, which is exactly
    what the flag exists to report.)"""
    rows = SK.sk03_hll_source_overlap(spark, SF).collect()
    for r in rows:
        # 3 independent estimates each within ~3 sigma w.h.p. -> 5
        # floors is a generous but non-vacuous bound (floor ~ 6.5% of
        # the union; a broken merge is off by the whole union size)
        assert abs(r["est_inter"] - r["exact_inter"]) <= 5 * r["noise_floor"] + 3, r
    flagged = [r for r in rows if r["resolvable"]]
    for r in flagged:
        assert r["exact_inter"] > 0, r


def test_sk03_pair_stage_is_register_sized(spark):
    df = SK.sk03_hll_source_overlap(spark, SF)
    df.collect()  # warm the persisted gram/register frames
    plan = _plan(SK.sk03_hll_source_overlap(spark, SF))
    # every join is a broadcast: the densify (srcs x 256 buckets), the
    # pair self-join on bucket, and the estimate assembly — no shuffle
    # join anywhere in the pair combinatorics
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the corpus pipeline executes once: every consumer (register build,
    # both pair sides, exact evidence leg) reads the persisted frames —
    # any FileScan text lives only inside InMemoryRelation build prints,
    # nothing scans the corpus live ahead of the first cached relation
    # (the tx12 pin idiom)
    assert plan.count("InMemoryTableScan") >= 4, plan.count("InMemoryTableScan")
    assert "FileScan" not in plan.split("InMemoryRelation")[0], plan


# ---------------------------------------------------------------------------
# dq09 (registered alongside the sketches this round): quantile profile
# ---------------------------------------------------------------------------


def test_dq09_quantile_profile_invariants(spark):
    from hive_lineage_spark.operators.quality import PROFILE_COLS, dq09_quantile_profile

    rows = {r["column"]: r for r in dq09_quantile_profile(spark, SF).collect()}
    assert set(rows) == set(PROFILE_COLS)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    for c, r in rows.items():
        # the grid is monotone and the fences bracket the box
        assert r["p01"] <= r["p25"] <= r["p50"] <= r["p75"] <= r["p99"], r
        assert abs(r["iqr"] - round(r["p75"] - r["p25"] + 1e-9, 4)) < 1e-9
        assert r["lo_fence"] <= r["p25"] and r["hi_fence"] >= r["p75"], r
        # recount outliers independently with the published fences
        recount = li.filter(
            (F.col(c) < r["lo_fence"]) | (F.col(c) > r["hi_fence"])
        ).count()
        assert r["n_outliers"] == recount, (c, r["n_outliers"], recount)
        # Tukey fences at 1.5 IQR should quarantine a small tail, not the bulk
        assert r["n_outliers"] <= 0.1 * n, (c, r["n_outliers"], n)


def test_dq09_plan_two_linear_passes(spark):
    from hive_lineage_spark.operators.quality import dq09_quantile_profile

    plan = _plan(dq09_quantile_profile(spark, SF))
    # the fence frame joins in as a broadcast (1 row), never a shuffle join
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # exactly two scans of the fact table: percentile pass + fence count
    assert plan.count("Scan parquet") == 2, plan.count("Scan parquet")


# ---------------------------------------------------------------------------
# incremental register maintenance (mergeability in time)
# ---------------------------------------------------------------------------


def test_hll_incremental_merge_equals_full_rebuild(spark):
    """Splitting the corpus into two halves, building registers per
    half, and max-merging must give EXACTLY the registers (and hence
    the estimate) of a full rebuild — the lossless-merge property that
    makes per-slice register checkpoints safe to maintain in O(batch)."""
    from hive_lineage_spark.operators.sketches import (
        estimate_from_registers,
        hll_registers_of,
        merge_hll_registers,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "lang", F.explode(SK.word_ngrams("text", 3)).alias("gram"), "doc_id"
    )
    full = hll_registers_of(docs, ["lang"], "gram")
    half_a = hll_registers_of(docs.filter(F.col("doc_id") % 2 == 0), ["lang"], "gram")
    half_b = hll_registers_of(docs.filter(F.col("doc_id") % 2 == 1), ["lang"], "gram")
    merged = merge_hll_registers(half_a, half_b, ["lang"])
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    est_m = {r["lang"]: r["hll_est"] for r in estimate_from_registers(merged, ["lang"]).collect()}
    est_f = {r["lang"]: r["hll_est"] for r in estimate_from_registers(full, ["lang"]).collect()}
    assert est_m == est_f


# ---------------------------------------------------------------------------
# sk04: precision ladder
# ---------------------------------------------------------------------------


def test_sk04_ladder_errors_within_band_and_sigma_monotone(spark):
    from hive_lineage_spark.operators.sketches import SK04_MS, sk04_hll_precision_ladder

    rows = sorted(sk04_hll_precision_ladder(spark, SF).collect(), key=lambda r: r["m"])
    assert [r["m"] for r in rows] == sorted(SK04_MS)
    # one shared exact baseline
    assert len({r["n_exact"] for r in rows}) == 1
    sigmas = [r["sigma_pct"] for r in rows]
    assert sigmas == sorted(sigmas, reverse=True)  # more registers, less error
    for r in rows:
        assert abs(r["sigma_pct"] - round(1.04 / math.sqrt(r["m"]) * 100 + 1e-9, 2)) < 1e-9
        # realized error within 4 sigma of its own ladder rung
        assert abs(r["rel_err_pct"]) <= 4 * r["sigma_pct"] + 0.5, r


def test_sk04_rungs_match_standalone_estimators(spark):
    """Each rung must equal the estimate a standalone m-register build
    would produce from the same hash stream (the ladder is a view, not
    a different estimator)."""
    from hive_lineage_spark.operators.sketches import (
        SK04_MS,
        _hll_est,
        _hll_fold,
        _hll_registers,
        sk04_hll_precision_ladder,
    )
    from hive_lineage_spark.functions.hashing import poly_hash

    g = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(SK.word_ngrams("text", 3)).alias("gram"))
        .select(poly_hash("gram").alias("h"))
    )
    got = {r["m"]: r["hll_est"] for r in sk04_hll_precision_ladder(spark, SF).collect()}
    for m in SK04_MS:
        folded = _hll_fold(_hll_registers(g, [], m), [])
        want = folded.select(
            _hll_est(F.col("n_present"), F.col("s_sparse"), m).alias("e")
        ).collect()[0]["e"]
        assert got[m] == want, (m, got[m], want)


# ---------------------------------------------------------------------------
# sk05: intake report
# ---------------------------------------------------------------------------


def test_sk05_intake_report_consistent_with_components(spark):
    from hive_lineage_spark.operators.sketches import (
        SK05_MAX_DUP_RATE,
        SK05_MIN_VOCAB,
        sk05_source_intake_report,
    )

    rows = {r["source"]: r for r in sk05_source_intake_report(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    totals = docs.groupBy("source").count().collect()
    want_docs = {r["source"]: r["count"] for r in totals}
    for s, r in rows.items():
        assert r["n_docs"] == want_docs[s]
        assert 0 <= r["n_dups"] <= r["n_docs"]
        assert abs(r["dup_rate"] - round(r["n_dups"] / r["n_docs"] + 1e-9, 4)) < 1e-9
        assert r["vocab_est"] > 0 and r["n_langs"] >= 1
        assert r["avg_chars"] > 0
        assert r["accept"] == int(
            r["dup_rate"] <= SK05_MAX_DUP_RATE and r["vocab_est"] >= SK05_MIN_VOCAB
        ), r
    # the fixture corpus is mostly clean: the gate should accept most sources
    assert sum(r["accept"] for r in rows.values()) >= n_sources // 2


def test_sk05_reads_shared_gram_frame(spark):
    """sk05's vocabulary estimate must consume the SAME persisted
    (source, gram) artifact sk03 reads — one tokenize pass for the
    whole source-level layer."""
    from hive_lineage_spark.operators.sketches import sk05_source_intake_report

    df = sk05_source_intake_report(spark, SF)
    df.collect()
    plan = _plan(sk05_source_intake_report(spark, SF))
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan.split("InMemoryRelation")[0]
