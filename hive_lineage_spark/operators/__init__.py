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
# Round-10 rotation (executes the round-9 queue): the 8 never-certified
# round-8 additions move IN — mm09_pair_curation, mm10_video_frame_pixels,
# mm11_audio_features, mm12_image_dhash, tx15_bpe_train, tx16_bigram_xent,
# ss12_ann_hamming, ss13_ann_ivfpq. Eight multiply-certified ops whose
# semantics stay in-window rotate OUT: q01/q02/q03 (scan/project/rowid
# trivia, certified r1-r9; q04's filtered scan + q18's pruned scan keep
# TableScan/Select semantics in-window), dd06 (certified r1-r9; dd12/dd13
# keep embedding-cosine dedup, dd02/dd03 keep pair generation), ss01
# (certified 8x; ss09's recall oracle embeds the exact brute-force
# baseline wholesale), tx02 (certified 8x; tx13/tx14 keep text scoring),
# tx07 (certified 6x; incoming tx15 BPE training exercises the same
# pretokenizer), tp01 (certified 7x; tp03/tp06/tp08/tp11 keep every
# pipeline stage in-window).
#
# Queries registered after this round's window sealed, DECLARED for the
# next rotation: name -> round number that queued it.
# tests/test_queries.py::test_no_silent_rotation_debt fails if a
# never-certified query is in neither the window nor this queue, AND
# fails if a queue entry survives past one subsequent CORRECTNESS round
# (self-expiring: a dead round turns the suite red).
#
# Round-10 mid-round promotion: the round kept producing after the 8
# r9-queue entries rotated in, so the 8 EARLIEST round-10 registrations
# (mm13/mm14/mm15, tx17/tx18/tx19, ss14, dd14 — all local-oracle green
# for most of the round) moved from this queue into the window to halve
# the r11 certification debt. Eight multiply-certified ops rotated out
# for them: mm05/mm07/mm08 (certified r7-r9; mm06 keeps the image
# decode chain, mm10/mm13 decode harder paths, mm11/mm14 keep audio,
# mm10/mm13/mm15 keep the container walk), tx12/tx13 (certified r6+;
# incoming tx17/tx18 carry LM scoring, dd02/dd03 keep the span/pair
# machinery; tx12 also stays a headline bench query), dq01/dq02
# (certified r6-r9; dq03's drift = two dq01 profiles, dq04 keeps the
# gate), tp08 (certified r6+; tp03/tp06/tp11 keep packing/binning/
# chunking in-window).
# Round-10 second promotion: ALL 12 remaining round-10 registrations
# (ss15/ss16/ss17, tp12/tp13, tx20/tx21, dq05, dd15, mm16/mm17/mm18 —
# every one local-oracle green at sf0.001 + sf0.01) move into the
# window so CORRECTNESS_r10 certifies the entire registry (142/142
# ever) and r11 starts with zero rotation debt. Twelve multiply-
# certified ops rotate out, semantics kept in-window:
#   q08/q09 (outer-join mirrors, certified r1-r9; q10 full-outer keeps
#     both null-extension sides, q05/q06/q07 keep inner/multiway/
#     broadcast), q11 (left-semi, certified r1-r9; tx18/tx19's
#     left-semi vocab gates stay, q12 anti stays),
#   q31 (full Q27 SQL text, certified r1-r9; q17 runs the identical
#     Q27 shape, the SQL-text parser surface stays golden-pinned in
#     pytest),
#   dd12 (certified r6-r9; dd13 is its Arrow/dgemm twin with identical
#     semantics), ss07 (certified r6-r9; ss13 composes the trained-IVF
#     probe, incoming ss16 keeps IVF serving), ss08 (certified r5-r9;
#     ss11/ss13 keep PQ/ADC), ss10 (certified r8-r9; ss11/ss13 keep
#     rerank, ss09's in-window recall oracle embeds the ADC+exact legs),
#   tp06 (certified r6-r9; tp03/tp11 keep packing/chunking, incoming
#     tp12/tp13 add sampling/partition planning), dq03 (certified
#     r7-r9; dq03 = two dq01 profiles, dq04 + incoming dq05 keep the
#     quality gates), mm06 (certified r1-r9; mm10/mm13 decode harder
#     paths, incoming mm16/mm17/mm18 all run the real decode chain),
#   tx14 (certified r6-r9; incoming tx20 + dq05 keep rule gating,
#     tx15-tx19 keep text).
# Round-10 third promotion: the four post-second-promotion
# registrations (tp14 water-filling, dd16 CDC dedup, ss18 Matryoshka,
# mm19 patchify — all local-oracle green at both scales) also move
# into the window, so CORRECTNESS_r10 certifies the entire 146-query
# registry and r11 starts with ZERO debt. Four multiply-certified ops
# rotate out, semantics kept in-window:
#   q10 (full outer, certified r1-r9; q44 UNIQUEJOIN executes the
#     documented full-outer mapping in-window),
#   ss11 (certified r8-r9; ss13 composes trained-PQ probing, incoming
#     ss18 keeps the coarse+exact-rerank two-stage shape),
#   tp03 (certified r6-r9; tp11 keeps chunking, incoming tp14 keeps
#     pipeline planning; the packing plan stays pinned in
#     tests/test_plans.py + docs/PLANS.md),
#   dd13 (certified r5-r9; dd02/dd03 keep pair generation, incoming
#     dd16 keeps dedup breadth; the Arrow/dgemm tile path stays
#     plan-pinned and local-oracle covered).
# Round-10 fourth promotion: tx22 (DSIR importance weights, both
# scales green) moves in; dq04 rotates out (certified r8-r9; dq05
# keeps the quality-gate family in-window and dq04's batch≡stream
# equality stays pytest-pinned in the streaming suite).
# Round-10 fifth promotion: ss19 (filtered IVF search, both scales
# green) moves in; tp11 rotates out (certified r8-r9; tp12/tp13/tp14
# keep the training-prep family in-window, and tp11's shuffle-free
# chunking plan stays pinned by tests/test_plans.py::
# test_gate_and_chunking_are_shuffle_free + the local oracle).
# Round-10 sixth promotion: mm20 (fixed-point spectral features, both
# scales green) moves in; ss09 rotates out (certified r8-r9; the
# exact-baseline evidence is in-window via ss18/ss19's inline
# in_exact flags, and the 5-leg recall@K report stays local-oracle
# checked and bench-tracked as an EXTRA).
# Round-11 rotation (executes the r10 queue): dd17_cluster_keep_best +
# dq06_freshness_sla — the only two registry entries with no driver
# row ever — move IN. Two 10x-certified ops rotate out, semantics
# kept in-window: q05_join_inner (certified r1-r10; q06 keeps 4-way
# inner, q07 broadcast inner, q13 null-safe inner) and
# dd02_ngram_jaccard (certified r1-r10; incoming dd17 embeds dd02's
# pair generation WHOLESALE — its Spark op calls dd02_ngram_jaccard
# and its oracle inlines DD02_SQL — and dd03 keeps banded pair
# search; dd02 stays a headline bench query).
# Late round-11 promotion: dq07_referential_integrity (FK orphan/
# coverage gate, local-oracle green both scales) also moves in; q06
# rotates out (4-way join chain, certified r1-r10; q17's 4-dim star
# keeps multiway joins in-window, q07 keeps broadcast inner, q06
# stays a HEADLINE bench query).
# Third round-11 promotion: ss20_ann_binary (sign-bit binary
# quantization + Hamming coarse pass + exact rerank, the modern
# vector-store BQ shape) and dq08_psi_drift (population-stability-
# index distribution-shift gate) — both local-oracle green at both
# scales — move in. Out: q07 (broadcast join, certified r1-r10; q17's
# star is all-BroadcastHashJoin and plan-pinned, q07 stays a HEADLINE
# bench query) and dd03 (MinHash-LSH, certified r1-r10; ss12 keeps
# pigeonhole banding in-window, dd15 keeps signature evidence, dd03
# stays a HEADLINE bench query).
# Round-11 promotion (the r10 pattern: new registrations certify the
# SAME round they land): dd18/tp15/mm21/mm22 — all local-oracle green
# at sf0.001 + sf0.01 — move into the window so CORRECTNESS_r11
# certifies the entire 155-query registry and r12 starts with zero
# debt. Four multiply-certified ops rotate out, semantics kept
# covered: q04 (certified r1-r10; q18's filtered+pruned scan keeps
# scan-filter semantics in-window, pushdown stays plan-pinned in
# tests/test_plans.py + docs/PLANS.md, q04 stays a HEADLINE bench
# query), q12 (anti join, certified r1-r10; tx18/tx19's left-semi
# vocab gates stay in-window, dd07's anti-join apply stays
# local-oracle checked), q13 (null-safe join, certified r1-r10;
# unique semantics stay pytest- and local-oracle-pinned), q51
# (funnel, certified r8-r10; the ordered-step shape stays golden- and
# oracle-covered locally).
# Round-12 promotion: dd19 + dd20 (registered after the r11 window
# sealed — r11's only never-certified pair) move INTO the 50-slot
# window. Out: q44 (UNIQUEJOIN→full-outer, certified r1-r11 = 11
# green rows; unique-join semantics stay pytest- and local-oracle-
# pinned, tests/test_queries + tools/check_oracle) and q14 (TPC-H Q1
# agg, certified r1-r11; the partial/final aggregate split stays
# plan-pinned in tests/test_plans.py + docs/PLANS.md, and q17's
# star-agg keeps grouped aggregation in-window).
ROTATION_QUEUE: dict[str, int] = {
    # empty: tx26_langid_gate (the one r16 registration) holds an r16
    # window slot directly
}

# Round-15 rotation. IN: the five round-15 registrations (web09 WARC
# ingestion, web10 frontier cap, ss23 incremental IVF maintenance,
# tx24/tx25 unigram-LM trainer+encode — certify the round they land,
# the r10-r14 pattern) plus the OLDEST-GREEN tail per the staleness
# policy: q39 (green only r01 — 14 rounds), q40/q42 (r03), and the
# entire r04 cohort (q25/q43/dd01/dd04/dd05/tx05/tx06/ss03/ss04/tx01/
# tx04/mm02/mm03/mm04/px01/px02 — 11 rounds since their last green
# row; re-certifying guards against silent drift). OUT, all
# multiply-certified and unchanged since their last green row
# (tools/certified.py --changed), semantics kept in-window:
#   q20-q24/q26, q28-q30/q41, q32-q38 (re-certified r14 after their
#     r01 rows — now the freshest greens in the registry; the SQL
#     surface stays local-oracle- and pytest-pinned, q24 stays a
#     HEADLINE bench query),
#   q45/q27 (3x r12-r14; vtable time travel re-enters via the vtable
#     pytest suite, as-of join stays skew-benched + local-oracle),
#   tp01 (3x r12-r14; tp15/tp16/tp17 keep the pipeline family),
#   ss09 (3x r12-r14; its exact/IVF/PQ legs are in-window via
#     ss13/ss19-ss23, the recall report stays a bench EXTRA),
#   tx12 (3x r12-r14; dd18/dd21 keep span machinery, tx12 stays a
#     HEADLINE bench query),
#   sk05 (2x r12+r14; sk01-sk04 keep every sketch it composes),
#   web06 (2x r13+r14; web01-web10 keep the crawl ladder, canonical-
#     URL dedup stays local-oracle- and pytest-pinned).
# Round-15 late promotion (the r10-r14 certify-the-round-it-lands
# pattern): web11 (frontier refresh — the freshness gate closing the
# crawl-operations loop, local-oracle green at both scales) moves in;
# out for it: ss13 (5x-certified r8/r10/r12/r13/r14, unchanged —
# ss22 keeps IVFPQ in-window and ss21/ss23 keep composed stored-index
# ANN serving; ss13's composed probe stays local-oracle- and
# pytest-pinned and a bench EXTRA row).
# Round-16 rotation (an OPTIMIZATION round: no new semantics, but the
# r16 performance work — scan fan-out, array-intersect verification,
# shared signature/label artifacts, BPE stage checkpointing, top-cap
# TakeOrderedAndProject — touches the defining lines of 31 certified
# ops; the changed-ops-hold-a-slot rule (test_no_silent_rotation_debt)
# puts ALL of them in the r16 window so the driver re-certifies exactly
# what changed). IN: the 26 changed out-of-window ops, the 5
# changed-in-window holdovers (dd17/mm17/mm22/tp16/dq09), tx26 (the one
# r16 registration, previously queued), and an 18-op oldest-green drain
# (the full remaining r05 cohort, then r06 per the staleness policy).
# OUT, all multiply-certified and UNCHANGED since their last green row:
# the r15 registrations (web09/web10/ss23/tx24/tx25/web11, green r15),
# the r15-drained r01-r04 cohort (q39/q40/q42/q25/q43/dd01/dd04/dd05/
# tx05/tx06/ss03/ss04/tx01/tx04/mm02/mm03/mm04/px01/px02), and
# unchanged holdovers (web04/web05/web07/web08/tx23/dd18/ss19-ss22/
# mm23/tp15/tp17/sk01-sk05/dq07/dq08).
# Late-r16 second optimization pass: dd19 (gram-array verification),
# dd21 (single-pass span profile), ss09 (persisted leg shortlists, one
# joined pipeline), ss17 (shared leg shortlists) change defining lines
# and take slots; the tx24/tx25 checkpoint edit lives in helpers
# outside their certified ranges but both were re-oracled this round.
# OUT for them (drain deferral, all multiply-certified and unchanged):
# tx09/tx10/q48/q49/tx03 — the youngest r06-drain entries; their
# families stay covered (tx12-window span ops, q46/q47 keep the
# sql_extra cohort, tx03 stays a HEADLINE bench query) and all five
# remain local-oracle- and pytest-pinned. tp15 (window-fold normalizer
# rewrite) takes the fifth slot.
# Round-17 rotation (optimization round 2 of 2, no new semantics).
# IN: the four ops whose defining lines changed (dq07 one-pass
# full-outer report, mm23 pair agg, dd14 shared decon grams, tx20
# shared tx13 score — tools/certified.py --changed; tp15/dd10 also
# changed and already hold slots), plus the events family whose SCAN
# source moved to the user_id-bucketed scratch layout (q24/q25/q27/
# q41/q43/q51/dq04/dq06 — a registry-level change the line trigger
# cannot see; dq01/q47 ride it too and already hold slots). OUT, all
# r16-certified green and UNCHANGED in r17, decode-family coverage
# kept in-window via mm01/mm05 (HEADLINE rows) + mm09/mm15/mm17/mm22
# + dq01: mm06/mm07/mm08/mm10/mm11/mm12/mm13/mm14/mm16/mm18/mm19/
# mm20. Registry-level changes (events layout, fan-out floor) are
# additionally certified by a full-registry oracle sweep at sf0.01
# AND sf0.001 on the sealed tree (OPTIMIZATION_r17.md), per the r16
# ADVICE note that line-trigger rotation alone cannot cover them.
# Late-r17 second pass: tp06/tp09 (shared persisted quality-score
# frame) change defining lines and take slots; OUT for them: tp04/tp07
# (r16-certified, unchanged — tp02/tp05/tp16 plus tp06/tp09 keep the
# pipeline family in-window).
_DRIVER_PRIORITY = [
    # r16 registration (from ROTATION_QUEUE)
    "tx26_langid_gate",
    # r17 changed ops (tools/certified.py --changed)
    "dq07_referential_integrity", "mm23_video_near_dup",
    "dd14_bloom_decontaminate", "tx20_ccnet_buckets",
    # r17 events-layout family (scan source changed)
    "q24_window_bucket_agg", "q25_sessionization", "q27_asof_join",
    "q41_session_window", "q43_range_join_bucketized",
    "q51_funnel_steps", "dq04_volume_anomaly", "dq06_freshness_sla",
    # r16 changed ops retained (multiply-certified families)
    "dd09_incremental_dedup", "dd12_semdedup", "tx14_gopher_gate",
    "mm05_decode_image", "dq01_profile",
    "dd02_ngram_jaccard", "dd03_minhash_lsh",
    "tx17_heldout_xent",
    "dd08_dup_clusters", "dd15_minhash_calibration",
    "tx18_backoff_xent", "tx21_kneser_ney_xent",
    "mm09_pair_curation", "mm15_video_shot_detect",
    # changed holdovers already in the r15 window
    "dd17_cluster_keep_best", "mm17_image_phash", "mm22_audio_quality",
    "tp16_token_exact_packing", "dq09_quantile_profile",
    # late-r16 second-pass changes (rotation-priority order)
    "dd19_containment", "ss17_rank_fusion", "ss09_ann_recall",
    "dd21_exact_dup_spans", "tp15_doremi_reweight",
    # oldest-green drain: the remaining r05 cohort...
    "q46_view_lineage", "q47_date_spine", "dd10_decontaminate",
    "dd11_incremental_postings", "tp02_stratified_sample",
    "tp06_curriculum_bins", "tp05_stratified_sample_hc",
    "tp09_epoch_upsample", "tx08_redact_pii", "tx11_span_dedup",
    # ...then the r06 cohort
    "ss02_ann_ivf", "ss06_kmeans", "mm01_decode_stub",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import (
        dedup, multimodal, pandas_ops, pipeline, quality, relational,
        similarity, sketches, sql_extra, text, web,
    )

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops, quality, web, sketches):
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
    from . import dedup, multimodal, pandas_ops, pipeline, similarity, web

    merged: dict[str, dict[str, list[str]]] = {}
    for mod in (dedup, similarity, multimodal, pandas_ops, pipeline, web):
        merged.update(getattr(mod, "DECLARED", {}))
    return merged


def all_oracles() -> dict[str, str]:
    from . import (
        dedup, multimodal, pandas_ops, pipeline, quality, relational,
        similarity, sketches, sql_extra, text, web,
    )

    merged: dict[str, str] = {}
    for mod in (relational, sql_extra, dedup, pipeline, similarity, text, multimodal, pandas_ops, quality, web, sketches):
        merged.update(mod.ORACLES)
    return merged
