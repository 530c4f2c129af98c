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
ROTATION_QUEUE: dict[str, int] = {}

_DRIVER_PRIORITY = [
    # §2.4 reference parity (q01/q02/q03 rotated out r10 — certified
    # r1-r9, scan/project semantics kept by q04/q18; q08/q09/q11/q31
    # rotated out in the r10 second promotion, see ROTATION_QUEUE
    # comment)
    # q04/q12/q13/q51 rotated out r11 (certified r1-r10 / r8-r10; see
    # the promotion note above); q44/q14 rotated out r12 for dd19/dd20
    # (see the ROTATION_QUEUE note).
    # Round-12 changed-since-certified rotation (tools/certified.py
    # --changed; policy in README): slots go FIRST to queries whose
    # defining source changed after their last green driver row — a
    # green row certifies the code as it was THEN. In: q45 (changed
    # r3→, vtable time travel, §2.4), q27 (changed r4→, as-of join),
    # ss05 (changed r5→, Arrow brute-force), dd07/dd08 (changed r7→,
    # pair-cache consumers), tp01/ss09/tx12 (changed r9→, incl. the
    # r11 exchange-reuse fix tx12 and this round's shared-exact-leg
    # ss09). Out, all UNCHANGED since their last green row: q17/q18/
    # q19 (11x certified; star-broadcast, pruning, and insert-readback
    # stay plan-/listener-pinned in tests/test_plans.py +
    # tests/test_lineage.py), q50 (6x; vtable semantics re-enter via
    # q45), mm10 (2x; mm13/mm15 keep the MJPEG decode chain), mm12
    # (2x; mm17 keeps perceptual hashing), tx16 (2x; tx17/tx18/tx21
    # keep the LM ladder), ss12 (2x; ss13/ss20 keep Hamming banding).
    # Round-13 rotation: the 9 r12-certified ops whose defining source
    # changed this round (tools/certified.py --changed: ss09/ss18/ss19/
    # ss20 evidence-flag + docstring edits, sk01-sk04 evidence flag +
    # sk04 single-pass restructure, dq09 report-assembly refactor) STAY
    # in-window per the changed-since-certified policy. In: the three
    # round-13 registrations web04/web05 (HTML->text extraction) and
    # tx23 (fastText-shape classifier gate). Out, all unchanged
    # multiply-certified with sibling coverage: ss05 (r5+r12; the exact
    # brute-force baseline is embedded wholesale in in-window ss09's
    # oracle, the Arrow batch surface stays via the mm decode chain +
    # pytest), dd07 (r6/r7/r12; in-window dd17 applies cluster
    # keep-best over the same pair cache, dd02/dd03 pair generation
    # stays local-oracle-pinned), dd08 (r6/r7/r12; in-window dd20
    # ranks the same dup-cluster graph, dd17 keeps the apply path).
    # web06 (URL-canonical dedup) lands later in round 13 and certifies
    # the same round; out for it: dd14 (certified r10+r12, unchanged —
    # in-window sk02 keeps bounded-sketch membership semantics, dd10's
    # decontamination join stays local-oracle- and pytest-pinned).
    # Completing the r12-VERDICT item-6 prescription: the six UNCHANGED
    # r12-certified newcomers rotate out (dd19/dd20 — dd15-dd18 keep the
    # dedup family in-window, their plan/scale pins stay in pytest;
    # web01/web02/web03 — incoming web04/web05/web06 exercise the same
    # synthesize->parse machinery plus extraction/dedup on top; sk05 —
    # sk01-sk04 keep every sketch mechanism it composes), and the freed
    # slots refill OLDEST-GREEN-FIRST with the r01-certified SQL-surface
    # ops q20/q21/q22/q23/q24/q26 (12 rounds since their last green row
    # — re-certifying guards against silent drift; q24 is also a
    # headline bench query).
    "q45_vtable_time_travel", "q27_asof_join",
    "tp01_full_pipeline", "ss09_ann_recall", "tx12_dup_span_profile",
    "web04_html_extract", "web05_boilerplate_gate", "tx23_fasttext_gate",
    "web06_url_canonical_dedup",
    "q20_union_distinct", "q21_window_topk_per_group", "q22_rollup",
    "q23_scalar_subquery", "q24_window_bucket_agg", "q26_json_extract",
    # Round-14 rotation, part 1 (VERDICT r13 items 1+7). In FIRST:
    # sk05 — the r13 crack: its source changed (commit 8078349,
    # evidence-flag extension) AFTER its r12 green row sealed, so its
    # CURRENT code is driver-uncertified; changed-since-certified ops
    # now redden test_no_silent_rotation_debt until they hold a slot.
    # Then the oldest-green tail: q28/q29/q30/q41, r01-certified only,
    # 13 rounds since their green row (ORC/CSV/JSON roundtrips +
    # session window). Out, all 4x-certified (r10-r13) and unchanged:
    # dd15 (dd16/dd17/dd18 keep the dedup family; its MinHash estimate
    # vs exact-Jaccard calibration stays local-oracle- and
    # pytest-pinned), ss16 (ss13/ss21 keep IVF serving, ss15's
    # norm-augment reduction it composes stays pytest-pinned), ss17
    # (ss19/ss20 keep multi-leg retrieve+rerank shapes), tx15 (incoming
    # tp16 embeds the BPE trainer+encode map wholesale in its oracle),
    # tx18 (tx21's Kneser-Ney keeps the held-out LM ladder in-window).
    "sk05_source_intake_report",
    "q28_orc_roundtrip", "q29_csv_roundtrip", "q30_json_roundtrip",
    "q41_session_window",
    # Round-14 seventh registration: web08 (per-host crawl-politeness
    # frontier scheduling — the step after web03/web07's gates)
    # certifies the round it lands; out for it: dd16 (4x-certified
    # r10-r13, unchanged — dd17/dd18/dd21 keep the dedup family
    # in-window, the content-defined-chunking profile stays
    # local-oracle- and pytest-pinned).
    "web08_politeness_schedule",
    # deduplication (dd06 rotated out r10 — certified r1-r9, cosine
    # dedup kept by dd12/dd13; dd12 out in the second promotion, dd13
    # is its Arrow twin; dd02 out r11 — dd17 embeds its pair
    # generation wholesale; dd15/dd16 out r14, see above)
    "dd17_cluster_keep_best",
    "dd18_longest_dup_span",
    # similarity search (ss01 rotated out r10 — certified 8x, exact
    # baseline embedded wholesale in ss09's recall oracle; ss07/ss08/
    # ss10 out in the second promotion — ss09/ss11/ss13 keep
    # IVF/PQ/rerank in-window; ss15/ss16/ss17 in from the r10 queue)
    # ss21 (stored-index IVF serving via dynamic partition pruning)
    # lands late in round 13 and certifies the same round; out for it:
    # ss14 (certified r10+r12, unchanged — ss13/ss16/ss17 keep composed
    # ANN serving in-window, the JL-projection path stays local-oracle-
    # and pytest-pinned).
    "ss13_ann_ivfpq",
    "ss21_ann_ivf_partitioned",
    "ss19_ann_filtered", "ss20_ann_binary",
    # text analysis (tx02/tx07 rotated out r10 — certified 8x/6x;
    # tx12/tx13 rotated out mid-r10, tx14 out in the second promotion;
    # tx15/tx16 in from the r9 queue, tx17-tx21 are the round-10 LM
    # ladder; tx15/tx18 out r14, see the round-14 note above). Round-14
    # second registration: web07 (robots/licence/opt-out compliance
    # gate) certifies the round it lands; out for it: tx20
    # (4x-certified r10-r13, unchanged — tx21 keeps held-out LM
    # scoring and tx22/tx23 keep model-based gating in-window, the
    # per-lang tertile machinery stays local-oracle- and pytest-pinned).
    "web07_robots_compliance_gate",
    # Round-14 third registration: dd21 (exact maximal duplicated
    # spans, true Lee et al. 2022 semantics over dd18's fixed probe
    # grid) certifies the round it lands; out for it: mm09
    # (4x-certified r10-r13, unchanged — mm16/mm17/mm21/mm22 keep
    # multimodal gating/search in-window, the CLIP-score pair gate
    # stays local-oracle- and pytest-pinned).
    "dd21_exact_dup_spans",
    # Round-14 fourth registration: ss22 (residual-encoded IVFPQ,
    # FAISS's by_residual default; measured next to ss13 by ss09's new
    # ivfpq_res leg) certifies the round it lands; out for it: mm11
    # (4x-certified r10-r13, unchanged — mm18/mm20/mm22 keep the audio
    # chain in-window, the windowed energy/ZCR features stay
    # local-oracle- and pytest-pinned).
    "ss22_ann_ivfpq_residual",
    # Round-14 rotation, part 2 (VERDICT item 7's "+ q32-q38 as slots
    # allow"): the rest of the r01-certified-only SQL-surface tail
    # rotates in — pivot / set ops / grouping sets / EXISTS-IN
    # subqueries / CTE chain / lateral explode / scalar functions, all
    # 13 rounds since their single green row, all unchanged (re-certify
    # against silent drift). Out, all 4x-certified (r10-r13) unchanged
    # with sibling coverage: mm15 (mm21/mm22 keep decode-chain
    # consumers; the MJPEG cut detector stays local-oracle- and
    # pytest-pinned), mm16 (mm17 keeps image feature gating), mm18 +
    # mm20 (mm22's clip gate keeps the audio chain certified; VAD and
    # DFT-bin powers stay pytest-pinned), tx21 + tx22 (tx23's
    # classifier gate keeps model-based text scoring in-window; the KN
    # ladder and DSIR weights stay local-oracle- and pytest-pinned),
    # dq06 (dq07/dq08/dq09 keep the data-quality gate family).
    "q32_pivot", "q33_set_ops", "q34_grouping_sets",
    "q35_exists_in_subqueries", "q36_cte_chain", "q37_lateral_explode",
    "q38_scalar_functions",
    # multimodal: mm05/mm06/mm07/mm08 rotated out during r10 (mm10/mm13
    # decode harder paths; incoming mm16/mm17/mm18 run the real decode
    # chain)
    # Round-14 sixth registration: mm23 (cross-video near-dup via
    # per-frame pHash + banded Hamming — the video-corpus analog of
    # dd02/dd05) certifies the round it lands; out for it: mm21
    # (3x-certified r11-r13, unchanged — mm17 keeps the pHash
    # computation in-window and mm23 now exercises banded Hamming over
    # pHashes end-to-end; the query-by-image top-K path stays
    # local-oracle- and pytest-pinned).
    "mm17_image_phash",
    "mm23_video_near_dup", "mm22_audio_quality",
    # composed pipeline + training-prep (tp01 rotated out r10 —
    # certified 7x; tp06/tp08 rotated out during r10, tp03/tp11 keep
    # packing/chunking; tp12/tp13 in from the r10 queue). Round-14:
    # tp16 (token-exact packing — tx19's BPE encode counts driving
    # tp03's layout) lands and certifies the same round; out for it:
    # tp13 (4x-certified r10-r13, unchanged — tp15/tp16 keep the
    # planning/packing family in-window, the range-partition balance
    # audit stays local-oracle- and pytest-pinned).
    "tp15_doremi_reweight",
    "tp16_token_exact_packing",
    # Round-14 fifth registration: tp17 (no-split next-fit-decreasing
    # packing — the applyInPandas capacity-reset recurrence, recursive-
    # CTE oracle) certifies the round it lands; out for it: ss18
    # (4x-certified r10-r13, unchanged — ss13/ss21/ss22 keep composed
    # ANN serving in-window, the Matryoshka prefix+rerank path stays
    # local-oracle- and pytest-pinned).
    "tp17_no_split_packing",
    # data-quality gates (dq01/dq02/dq03 rotated out during r10 —
    # dq03's drift is two dq01 profiles; dq04 keeps the volume gate,
    # dq05 in from the r10 queue)
    # round-12 registrations (host/URL curation) certify the same
    # round they land, per the r10/r11 pattern. Out for them, all
    # unchanged 2x-certified with sibling coverage: mm14 (mm11/mm18/
    # mm20/mm22 keep audio), ss15 (ss16 composes the same norm-augment
    # inside IVF-MIPS), tp14 (tp12/tp13/tp15 keep sampling/planning).
    # round-12 second registration (mergeable sketches — HLL / Count-Min)
    # certifies the same round it lands, per the web/r10/r11 pattern.
    # Out for them, all unchanged 2x-certified with sibling coverage:
    # mm13 (mm15 keeps the MJPEG 4:2:0 decode chain in-window), mm19
    # (mm16/mm17/mm21 keep image feature extraction), tx17 (tx18/tx21
    # keep the held-out cross-entropy ladder).
    # sk04 (precision ladder) lands with them; out: tx19 (2x-certified,
    # unchanged — tx15 keeps the BPE family in-window, the encode path
    # stays pytest- and local-oracle-pinned).
    # sk05 (intake report) composes dd01/web02/sk01's signals; out for
    # it: tp12 (2x-certified, unchanged — tp13/tp15 keep sampling and
    # budget planning in-window).
    "sk01_hll_distinct", "sk02_countmin_topk", "sk03_hll_source_overlap",
    "sk04_hll_precision_ladder",
    # dq09 (quantile/fence profile) also lands round-12; out: dq05
    # (2x-certified, unchanged — dq02's constraint report keeps
    # row-rule semantics certified, dq07/dq08/dq09 keep the gate
    # family in-window).
    "dq09_quantile_profile",
    "dq07_referential_integrity", "dq08_psi_drift",
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
