"""Query/operator surface.

Each module exposes ``QUERIES: dict[str, Callable[(spark, sf_dir), DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB ANSI-SQL equivalents). Keys are
globally unique; ``hive_lineage_spark.operators.all_queries()`` merges them
for ``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Registry order is part of the external contract: the correctness harness
# checks the FIRST 50 entries. The priority block therefore front-loads
# (a) the SURVEY §2.4 reference-parity queries q01-q19 + q31/q44,
# (b) the LLM-data-pipeline operator set, and (c) the custom operators
# Spark lacks natively (as-of join, bucketized range join,
# sessionization).
# Round-5 rotation: every query that has NEVER had a driver
# CORRECTNESS row moves IN — the round-4 additions (q46 view lineage,
# q47 date spine, dd09 incremental dedup, dd10 decontamination, tx08
# PII redaction, tp02-tp04 training-prep) AND the round-5 additions
# (tp05 two-phase sample, tp06 curriculum bins, dd11 incremental
# postings, tx09 repetition, ss05 Arrow ANN, tp07 shuffle shards,
# tx10 TF-IDF terms, tx11 span dedup, tp08 temperature mixture).
# Seventeen ops certified green in CORRECTNESS_r04 (or earlier) whose
# semantics are covered by in-window siblings rotate OUT: dd04/dd05
# simhash (dd03 banding stays; dd05 remains a bench headline +
# streaming-equality pin), ss03/ss04 ANN variants (ss01/ss02/ss05
# stay), tx04-tx06, mm02-mm04 (mm01 carries the Arrow plumbing),
# px01/px02 (ss05/mm01 keep the Arrow-Python surface in-window), q25
# sessionization (certified every round since r1; q41 covers the shape
# locally), dd01 exact dedup (certified r4; the tp01 pipeline keeps an
# exact-dedup stage in-window), tx01 token stats (certified r4; tx09/
# tx10 keep the tokenization path in-window), and q27 as-of join + q43
# bucketized range join (both certified r4, unchanged since).
# Beyond the window (the cap is exactly 50): previously-certified
# rotated-out ops, redundant format round-trips (q28-q30), SQL-surface
# variants (q20-q24, q26, q32-q39) whose semantics are covered by
# in-window queries, and three ops with tolerance/canonical-string or
# setup-heavy oracles (q40 sketches, q42 array agg, q45 vtable time
# travel). Every beyond-window query runs the SAME DuckDB oracle
# locally via tests/test_queries.py and tools/check_oracle.py.
# ROUND-6 ROTATION CANDIDATES (added late in round 5, never
# driver-certified): q48_unpivot, q49_rolling_range, ss06_kmeans,
# ss07_ann_ivf_trained, dd12_semdedup, tp09_epoch_upsample,
# dq01_profile, dq02_constraints, tx12_dup_span_profile,
# q50_vtable_partitioned, tp10_three_way_split, dd13_semdedup_arrow.
# Rotate them IN next round against round-5-certified ops whose
# semantics in-window siblings cover.
_DRIVER_PRIORITY = [
    # §2.4 reference parity
    "q01_full_scan", "q02_project_alias", "q03_virtual_rowid",
    "q04_filter_predicates", "q05_join_inner", "q06_join_4way",
    "q07_join_broadcast", "q08_join_left_outer", "q09_join_right_outer",
    "q10_join_full_outer", "q11_join_left_semi", "q12_join_left_anti",
    "q13_join_nullsafe", "q44_unique_join", "q14_agg_tpch_q1",
    "q15_agg_distinct", "q16_topk", "q17_q27_shape",
    "q18_partition_pruning", "q19_insert_readback", "q31_q27_sql_text",
    # lineage/SQL round-4 additions (never driver-certified before r5)
    "q46_view_lineage", "q47_date_spine",
    # deduplication
    "dd02_ngram_jaccard", "dd03_minhash_lsh",
    "dd06_embed_cosine_dup",
    "dd07_near_dedup_apply", "dd08_dup_clusters",
    "dd09_incremental_dedup", "dd10_decontaminate",
    "dd11_incremental_postings",
    # similarity search
    "ss01_ann_bruteforce", "ss02_ann_ivf", "ss05_ann_bruteforce_arrow",
    # text analysis
    "tx02_lang_id", "tx03_quality_score",
    "tx07_bpe_pretokenize", "tx08_redact_pii", "tx09_repetition",
    "tx10_tfidf_terms", "tx11_span_dedup",
    # multimodal plumbing
    "mm01_decode_stub",
    # composed pipeline + training-prep
    "tp01_full_pipeline",
    "tp02_stratified_sample", "tp03_pack_sequences", "tp04_weighted_mixture",
    "tp05_stratified_sample_hc", "tp06_curriculum_bins",
    "tp07_shuffle_shards", "tp08_temperature_mixture",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import (
        dedup, multimodal, pandas_ops, pipeline, quality, relational,
        similarity, sql_extra, text,
    )

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops, quality):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        merged.update(mod.QUERIES)
    missing = [q for q in _DRIVER_PRIORITY if q not in merged]
    if missing:
        raise ValueError(f"_DRIVER_PRIORITY names unknown queries: {missing}")
    ordered = {q: merged[q] for q in _DRIVER_PRIORITY}
    ordered.update({q: fn for q, fn in merged.items() if q not in ordered})
    return ordered


def all_oracles() -> dict[str, str]:
    from . import (
        dedup, multimodal, pandas_ops, pipeline, quality, relational,
        similarity, sql_extra, text,
    )

    merged: dict[str, str] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops, quality):
        merged.update(mod.ORACLES)
    return merged
