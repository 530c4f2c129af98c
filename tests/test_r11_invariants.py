"""Semantic invariants of the round-11 operators — properties the
cross-engine oracle cannot express (it proves Spark ≡ DuckDB, not that
both compute something with the right mathematical shape): mixture
weights form a distribution, PSI is non-negative, retrieval returns
exactly K ranked rows per query, gates are consistent with their own
inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("r11-invariants")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_tp15_weights_form_a_distribution(spark):
    from hive_lineage_spark.operators.pipeline import tp15_doremi_reweight

    rows = tp15_doremi_reweight(spark, SF).collect()
    assert rows
    total_w = sum(r["weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-3, total_w  # 6-dp rounding per source
    assert all(r["weight"] > 0 for r in rows)
    assert all(r["excess"] >= 0 for r in rows)
    # at least one domain sits at the baseline (excess 0) and the update
    # is monotone: higher excess never gets a lower weight
    by_excess = sorted(rows, key=lambda r: r["excess"])
    ws = [r["weight"] for r in by_excess]
    assert ws == sorted(ws), ws


def test_dq08_psi_nonnegative_and_gate_consistent(spark):
    from hive_lineage_spark.operators.quality import DQ08_PSI_DRIFT, dq08_psi_drift

    rows = dq08_psi_drift(spark, SF).collect()
    assert {r["column"] for r in rows} == {"l_quantity", "l_discount", "l_tax"}
    for r in rows:
        # Σ(p−q)·ln(p/q) ≥ 0 term-wise after smoothing (Gibbs)
        assert r["psi"] >= 0, r
        assert r["drifted"] == int(r["psi"] > DQ08_PSI_DRIFT), r
        assert r["n_bins"] >= 2


def test_ss20_topk_shape_and_recall(spark):
    from hive_lineage_spark.operators.similarity import K, N_QUERIES, ss20_ann_binary

    rows = ss20_ann_binary(spark, SF).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q) == N_QUERIES
    for q, rs in per_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, K + 1)), q
        assert all(0 <= r["hamming"] <= 64 for r in rs)
        assert all(r["neighbor_id"] != q for r in rs)
        # rerank orders by exact cosine
        by_rank = sorted(rs, key=lambda r: r["rank"])
        cos = [r["cosine"] for r in by_rank]
        assert cos == sorted(cos, reverse=True), cos
    # the coarse pass must find SOME of the exact neighbors
    assert sum(r["in_exact"] for r in rows) >= 1


def test_mm21_topk_shape(spark):
    from hive_lineage_spark.operators.multimodal import PQS_K, PQS_NQ, mm21_phash_search
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    rows = mm21_phash_search(spark, SF).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    assert len(per_q) == PQS_NQ
    for q, rs in per_q.items():
        assert sorted(r["rk"] for r in rs) == list(range(1, PQS_K + 1)), q
        assert all(0 <= r["dist"] <= 63 for r in rs)  # 63 AC bits
        assert all(r["doc_id"] != q for r in rs)
    clear_postings_cache()


def test_dd18_verdicts_consistent(spark):
    from hive_lineage_spark.operators.text import DUP_WIDTHS, dd18_longest_dup_span
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    rows = dd18_longest_dup_span(spark, SF).collect()
    assert len(rows) == spark.read.parquet(f"{SF}/documents.parquet").count()
    widths = {0, *DUP_WIDTHS}
    for r in rows:
        assert r["max_dup_w"] in widths, r
        assert (r["n_dup_at_max"] == 0) == (r["max_dup_w"] == 0), r
    clear_postings_cache()


def test_mm22_gate_consistent_with_inputs(spark):
    from hive_lineage_spark.operators.multimodal import mm22_audio_quality

    rows = mm22_audio_quality(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["dyn_range"] >= 0
        assert 0 <= r["n_clipped"] <= r["n_frames"]
        assert 0 <= r["longest_quiet"] <= r["n_frames"]
        expect = int(r["n_clipped"] * 100 < r["n_frames"] and r["longest_quiet"] * 4 < r["n_frames"])
        assert r["is_kept"] == expect, r


def test_dq07_report_consistent(spark):
    from hive_lineage_spark.operators.quality import DQ07_RELS, dq07_referential_integrity

    rows = {r["fk"]: r for r in dq07_referential_integrity(spark, SF).collect()}
    assert set(rows) == {name for name, *_ in DQ07_RELS}
    for r in rows.values():
        assert r["n_orphans"] >= 0 and r["ok"] == int(r["n_orphans"] == 0)
        assert 0 < r["n_distinct_fk"] <= r["n_rows"]
        if r["ok"]:
            # no orphans ⇒ every child key exists in the parent
            assert r["n_distinct_fk"] <= r["parent_rows"]
    # the coverage signal: events reference a strict subset of customers
    assert rows["events.user_id"]["coverage"] < 0.5


def test_dd19_containment_dominates_jaccard(spark):
    from hive_lineage_spark.operators.dedup import CONTAIN_T, dd19_containment
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    rows = dd19_containment(spark, SF).collect()
    assert rows  # the planted near-dups must surface
    for r in rows:
        # C(A→B) = |A∩B|/|A| ≥ |A∩B|/|A∪B| = J — always, and the gate held
        assert r["containment"] >= r["jaccard"] - 1e-9, r
        assert r["containment"] >= CONTAIN_T - 1e-9, r
        assert r["id_a"] != r["id_b"]
    # planted full near-dups are mutually containing: both directions present
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert any((b, a) in pairs for a, b in pairs)
    clear_postings_cache()


def test_dd20_rank_smooths_quality(spark):
    from hive_lineage_spark.operators.dedup import dd20_graph_rank, clear_postings_cache

    clear_postings_cache()
    rows = dd20_graph_rank(spark, SF).collect()
    assert rows
    assert all(r["rank"] > 0 and r["p"] > 0 for r in rows)
    # personalization must break clique symmetry: ranks are non-uniform
    assert len({r["rank"] for r in rows}) > 1
    # diffusion is a contraction toward the neighborhood mean: the spread
    # of ranks never exceeds the spread of the raw teleport weights
    ps = [r["p"] for r in rows]
    rk = [r["rank"] for r in rows]
    assert (max(rk) - min(rk)) <= (max(ps) - min(ps)) + 1e-9
    clear_postings_cache()
