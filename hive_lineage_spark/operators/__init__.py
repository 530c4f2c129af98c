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
# Round-6 rotation: the 12 round-5 additions that have NEVER had a
# driver CORRECTNESS row move IN — q48_unpivot, q49_rolling_range,
# q50_vtable_partitioned, ss06_kmeans, ss07_ann_ivf_trained,
# dd12_semdedup, dd13_semdedup_arrow, dq01_profile, dq02_constraints,
# tx12_dup_span_profile, tp09_epoch_upsample, tp10_three_way_split.
# Twelve ops certified green in CORRECTNESS_r05 whose semantics are
# covered by in-window siblings rotate OUT: q46/q47 (SQL-surface;
# q01-q19 parity core stays), dd09/dd10/dd11 (dd02/dd03 keep the
# banding+postings path; dd11 additionally gains a streaming-equality
# pin this round), ss05 (ss01 keeps the exact baseline, dd13 keeps the
# Arrow/BLAS surface in-window), tx08/tx11 (tx12 carries the span-hash
# shape; tx02/tx03/tx07/tx09/tx10 stay), tp02/tp04/tp05/tp07 (tp01
# pipeline + tp03/tp06/tp08 keep sampling/packing/mixture in-window,
# tp09/tp10 come in). After CORRECTNESS_r06, every one of the 100
# registered queries will have been driver-certified at least once.
# Beyond the window (the cap is exactly 50): previously-certified
# rotated-out ops, redundant format round-trips (q28-q30), SQL-surface
# variants (q20-q27, q32-q39) whose semantics are covered by
# in-window queries, and three ops with tolerance/canonical-string or
# setup-heavy oracles (q40 sketches, q42 array agg, q45 vtable time
# travel). Every beyond-window query runs the SAME DuckDB oracle
# locally via tests/test_queries.py and tools/check_oracle.py.
# Round-8 rotation: the 4 post-r7-seal additions with zero driver rows
# (tools/certified.py computes this mechanically from CORRECTNESS_r*)
# move IN — q51_funnel_steps, ss10_ann_pq_rerank, ss11_ann_pq_trained,
# dq04_volume_anomaly. Four multiply-certified ops whose semantics stay
# in-window rotate OUT: q15_agg_distinct + q16_topk (certified r1-r7;
# q14 keeps the multi-agg group-by shape, q17's top-100 keeps the
# ordered-limit shape) and dd07_near_dedup_apply + dd08_dup_clusters
# (certified r6+r7; dd02/dd03 keep the pair-generation path that feeds
# them, their fixpoint clustering stays pinned by pytest + local
# oracle). tests/test_queries.py::test_no_silent_rotation_debt now
# consumes the ledger so a registered query can't sit uncertified
# outside the window unnoticed.
# Queries registered after this round's window sealed, DECLARED for the
# next rotation (tests/test_queries.py::test_no_silent_rotation_debt
# fails if a never-certified query is in neither the window nor this
# queue — rotation debt can't accumulate silently).
ROTATION_QUEUE = [
    "mm09_pair_curation",       # round-8 addition → rotate into the r9 window
    "mm10_video_frame_pixels",  # round-8 addition → rotate into the r9 window
    "tx15_bpe_train",           # round-8 addition → rotate into the r9 window
    "tx16_bigram_xent",         # round-8 addition → rotate into the r9 window
    "ss12_ann_hamming",         # round-8 addition → rotate into the r9 window
    "mm11_audio_features",      # round-8 addition → rotate into the r9 window
    "ss13_ann_ivfpq",           # round-8 addition → rotate into the r9 window
    "mm12_image_dhash",         # round-8 addition → rotate into the r9 window
]

_DRIVER_PRIORITY = [
    # §2.4 reference parity
    "q01_full_scan", "q02_project_alias", "q03_virtual_rowid",
    "q04_filter_predicates", "q05_join_inner", "q06_join_4way",
    "q07_join_broadcast", "q08_join_left_outer", "q09_join_right_outer",
    "q10_join_full_outer", "q11_join_left_semi", "q12_join_left_anti",
    "q13_join_nullsafe", "q44_unique_join", "q14_agg_tpch_q1",
    "q17_q27_shape",
    "q18_partition_pruning", "q19_insert_readback", "q31_q27_sql_text",
    # ordered event funnel (round-7 addition, first certified window r8)
    "q51_funnel_steps",
    # SQL-surface round-5 additions (q48/q49 certified r6, rotated out
    # r7 for dq03/mm08 — their semantics stay oracle-covered locally)
    "q50_vtable_partitioned",
    # deduplication
    "dd02_ngram_jaccard", "dd03_minhash_lsh",
    "dd06_embed_cosine_dup",
    "dd12_semdedup", "dd13_semdedup_arrow",
    # similarity search (ss02/ss06 certified r6, rotated out r7 for
    # ss08/ss09 — ss09's recall oracle embeds ss01+ss02+ss08+ss10+ss11
    # wholesale, ss07's oracle keeps the k-means math in-window)
    "ss01_ann_bruteforce",
    "ss07_ann_ivf_trained", "ss08_ann_pq", "ss09_ann_recall",
    "ss10_ann_pq_rerank", "ss11_ann_pq_trained",
    # text analysis
    "tx02_lang_id",
    # (tx03/tx10 certified r6, rotated out r7 for tx13/tx14 — tx14
    # subsumes tx03's surface-stat shape with the full Gopher rule set,
    # tx13 carries tx10's tf/df machinery)
    "tx07_bpe_pretokenize",
    "tx12_dup_span_profile", "tx13_unigram_logprob", "tx14_gopher_gate",
    # multimodal: real decode + decode→resize chain (round-7 rotation:
    # mm01 stub out — certified r2-r4 and r6, superseded by mm05's real
    # decode; tx09 out — certified r6, span shape covered by tx12 —
    # making room for mm06, the new real-pixel resize chain)
    "mm05_decode_image", "mm06_decode_resize", "mm07_decode_audio",
    "mm08_video_frame_index",
    # composed pipeline + training-prep
    "tp01_full_pipeline",
    "tp03_pack_sequences", "tp06_curriculum_bins",
    # (tp09/tp10 certified r6, rotated out r7 for mm07/tp11 — tp06
    # keeps the histogram-decile machinery in-window, tp01/tp03/tp08
    # keep sampling/packing/mixture)
    "tp08_temperature_mixture",
    "tp11_chunk_overlap",
    # data-quality gates (dq03/dq04: round-7 drift + volume-anomaly)
    "dq01_profile", "dq02_constraints", "dq03_snapshot_drift",
    "dq04_volume_anomaly",
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


def all_declared() -> dict[str, dict[str, list[str]]]:
    """Operator-authored barrier lineage declarations, merged: query
    name → {output column → input columns of the Python barrier}.
    Consumed by ``LineageTracker.track(df, declared=...)``; provenance
    of these edges is marked ``declared`` (engine-unprovable)."""
    from . import dedup, multimodal, pandas_ops, similarity

    merged: dict[str, dict[str, list[str]]] = {}
    for mod in (dedup, similarity, multimodal, pandas_ops):
        merged.update(getattr(mod, "DECLARED", {}))
    return merged


def all_oracles() -> dict[str, str]:
    from . import (
        dedup, multimodal, pandas_ops, pipeline, quality, relational,
        similarity, sql_extra, text,
    )

    merged: dict[str, str] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops, quality):
        merged.update(mod.ORACLES)
    return merged
