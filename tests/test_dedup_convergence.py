"""Convergence tests for duplicate clustering (dd08 / connected_components).

The failure mode these pin down: one-hop min-label propagation advances a
component's minimum ONE edge per iteration, so any fixed iteration count
splits chains longer than it. ``connected_components`` must instead run to
fixpoint (with pointer jumping for logarithmic round counts), which these
tests exercise with chains much longer than any plausible constant.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hive_lineage_spark.operators.dedup import clear_postings_cache, dd02_ngram_jaccard
from hive_lineage_spark.operators.pipeline import connected_components, dd08_dup_clusters


def _chain_edges(spark, n):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    return pairs.union(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))


def test_connected_components_long_chain(spark):
    # a 40-node path: diameter 39 — any fixed-k one-hop loop with k < 39
    # leaves multiple labels; the fixpoint must collapse it to one
    labels = connected_components(_chain_edges(spark, 40)).collect()
    assert len(labels) == 40
    assert {r.label for r in labels} == {0}


def test_connected_components_two_components(spark):
    a = _chain_edges(spark, 12)
    b = _chain_edges(spark, 9).select(
        (F.col("id_a") + 100).alias("id_a"), (F.col("id_b") + 100).alias("id_b")
    )
    labels = connected_components(a.union(b)).collect()
    by_label = {}
    for r in labels:
        by_label.setdefault(r.label, set()).add(r.node)
    assert by_label == {0: set(range(12)), 100: set(range(100, 109))}


@pytest.fixture()
def chain_docs_dir(spark, tmp_path):
    """25 synthetic documents in a similarity CHAIN: doc i is a 42-word
    sliding window (step 10) over a unique-word stream, so adjacent docs
    share 30/50 word-trigrams (Jaccard 0.6 ≥ 0.5) while docs two apart
    share 20/60 (0.33 < 0.5) — the dup graph is exactly a 25-node path."""
    n_docs, step, length = 25, 10, 42
    words = [f"w{p:05d}" for p in range(step * (n_docs - 1) + length)]
    rows = []
    for i in range(n_docs):
        text = " ".join(words[i * step : i * step + length])
        rows.append({"doc_id": i + 1, "text": text, "lang": "en",
                     "source": "synthetic", "n_chars": len(text)})
    table = pa.Table.from_pylist(rows, schema=pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ]))
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    yield str(tmp_path)
    clear_postings_cache()


def test_dd02_chain_docs_pairs_are_a_path(spark, chain_docs_dir):
    pairs = dd02_ngram_jaccard(spark, chain_docs_dir).select("id_a", "id_b").collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(i, i + 1) for i in range(1, 25)}


def test_dd08_long_chain_single_cluster(spark, chain_docs_dir):
    rows = dd08_dup_clusters(spark, chain_docs_dir).collect()
    assert len(rows) == 1, f"chain split into {len(rows)} clusters: {rows}"
    (r,) = rows
    assert (r.label, r.cluster_size, r.min_member, r.max_member) == (1, 25, 1, 25)


def test_dd19_df_cap_contract(spark):
    """dd19's ``df_cap`` (the SCALE.md saturated-corpus escape hatch) is
    a precision-preserving RECALL knob: a cap above the hottest prefix
    df changes nothing; a binding cap yields a strict SUBSET of the
    exact pair set (verification of surviving candidates is exact) and
    sheds probe volume at the prefix frame."""
    from hive_lineage_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    dedup.clear_postings_cache()
    pairs = lambda df: {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}  # noqa: E731
    exact = pairs(dedup.dd19_containment(spark, sf))
    loose = pairs(dedup.dd19_containment(spark, sf, df_cap=10**9))
    assert loose == exact
    capped = pairs(dedup.dd19_containment(spark, sf, df_cap=2))
    assert capped <= exact
    cpre = dedup._persisted("cpre_contain", spark, sf, dedup._containment_prefix)
    full, kept = cpre.count(), cpre.filter(F.col("df") <= 2).count()
    assert kept < full, (kept, full)
    dedup.clear_postings_cache()
