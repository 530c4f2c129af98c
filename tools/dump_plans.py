"""Generate docs/PLANS.md: the executed physical plans of representative
queries, as evidence for the optimization claims in SCALE.md (pushdown,
pruning, broadcast selection, partial/final aggregation, top-k operator,
AQE final plans).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


SHOW = [
    ("q04_filter_predicates", "all four predicates in PushedFilters"),
    ("q02_project_alias", "ReadSchema pruned to the referenced columns"),
    ("q17_q27_shape", "every dimension broadcast; no SortMergeJoin"),
    ("q14_agg_tpch_q1", "partial + final HashAggregate split"),
    ("q16_topk", "TakeOrderedAndProject, no global sort"),
    ("q18_partition_pruning", "PartitionFilters prune directories"),
    ("q25_sessionization", "events served from the user_id-bucketed scratch layout (r17): the per-user window rides the bucket partitioning — ZERO exchanges, an in-partition sort only"),
    ("q43_range_join_bucketized", "both self-join sides read the bucketed events layout (r17): the (user, bucket) join is bucket-local; the only exchange left is the output distinct"),
    ("dd03_minhash_lsh", "broadcast dictionary; band join on longs"),
    ("dd06_embed_cosine_dup", "tile join rebalanced; dgemm inside mapInPandas"),
    ("dd09_incremental_dedup", "one-directional band join; 1-row split broadcast"),
    ("tx08_redact_pii", "zero exchanges — pure codegen regexp chain"),
    ("tp02_stratified_sample", "single class-key exchange; 2-column ReadSchema"),
    ("q46_view_lineage", "view inlined by the optimizer — plan equals the base join"),
    ("q47_date_spine", "UnionLoop recursion + broadcast join onto the spine"),
    ("dd10_decontaminate", "benchmark grams broadcast; training grams never shuffle"),
    ("tp03_pack_sequences", "single shard-key exchange; windowed cumsum in one stage"),
    ("dd07_near_dedup_apply", "anti-join on the drop list carries NO pinned hint — AQE picks the strategy from runtime stats"),
    ("ss02_ann_ivf", "cell assignment is a pure map over a broadcast 1-row centroid array — no window partitioned by vec_id, no exchange of vector-carrying corpus rows"),
    ("tp06_curriculum_bins", "no ntile over the corpus: one partial-agg groupBy onto the 4-dp value grid (read from the SESSION-PERSISTED quality-score frame, r17 — shared with tp09; tx03 still builds live), then the window runs over the tiny histogram"),
    ("tp05_stratified_sample_hc", "two rank phases: windows partition by (lang, bkt) then by lang over ≤K·buckets survivors — no class-wide single-partition sort"),
    ("dd11_incremental_postings", "drop-list anti-join + union with the batch-only postings build — no full-corpus rebuild"),
    ("ss05_ann_bruteforce_arrow", "one-row query block broadcast to B corpus blocks; ArrowEvalPython tile; the rank window reads B·K slim rows"),
    ("tp07_shuffle_shards", "no ORDER BY rand(): one hash exchange on the shard key, per-shard window sort; scan reads only doc_id"),
    ("tx10_tfidf_terms", "top-K via WindowGroupLimit Partial/Final; tf and df both partial-agg; tf⋈df join unpinned (AQE-chosen)"),
    ("tx11_span_dedup", "rank-1 on the span hash via WindowGroupLimit Partial/Final — repeats shed map-side before the exchange; reassembly is one partial ObjectHashAggregate"),
    ("tp08_temperature_mixture", "per-source counts partial-agg; pow-sum is a single-row agg of the vocabulary-sized frame; quota join AQE-chosen"),
    ("ss07_ann_ivf_trained", "k-means rounds as broadcast-joined map stages (no collect between rounds); probe = equi-join on cell; rank window sees only pruned candidates"),
    ("q27_asof_join", "union-merge as-of: exactly ONE Exchange (hashpartitioning on u) feeding one Window — no inequality join, no pair inflation, no event_id re-shuffle"),
    ("ss08_ann_pq", "PQ/ADC: codebook and query distance tables broadcast; corpus codes never shuffle; the only hash exchange is the final rank window"),
    ("mm06_decode_resize", "decode→resize→stats is ONE narrow MapInPandas stage over the fixture scan — no exchange; scale by adding input splits"),
    ("tx13_unigram_logprob", "tf partial-agg; unigram table join AQE-chosen; per-doc sum folds a word-sorted list (FP association pinned), corpus total is a 1-row broadcast"),
    ("dq03_snapshot_drift", "both snapshot profiles are single partial-agg passes feeding 1-row exchanges; the v0 read plans only v0's files (manifest time travel)"),
    ("mm09_pair_curation", "caption feature-hash encoder fused into the documents scan; ONLY the pair-id equi-join moves data; cosine/gate all JVM codegen"),
    ("mm10_video_frame_pixels", "AVI walk + JPEG decode + pixel stats in ONE narrow MapInPandas stage — no exchange; scale by adding input splits"),
    ("ss09_ann_recall", "r16: ONE joined pipeline over the session's checkpointed per-variant shortlists (Scan ExistingRDD leaves) and the exact baseline; no live search or PQ scoring tree inside the recall plan"),
    ("mm13_video_420_pixels", "4:2:0 MJPEG decode shares mm10's shape: ONE narrow MapInPandas stage, no exchange — subsampling/DRI cost lives inside the Python batch, not the plan"),
    ("tx17_heldout_xent", "r16: model tables read from the shared persisted train-side core (InMemoryTableScan), LEFT-broadcast into the scored slice; the warm plan's only corpus pass is the held-out tf aggregation"),
    ("tx18_backoff_xent", "three vocabulary-capped model tables (bigram/head/unigram, r16: derived from the shared persisted cnt2/vocab core) all BroadcastHashJoin LEFT into the scored bigram stream inside ONE codegen stage"),
    ("ss14_ann_random_projection", "the 16 projection folds fuse into the embeddings scan as pure whole-stage codegen — no exchange before the rank window, no UDF"),
    ("mm15_video_shot_detect", "decode-every-frame + consecutive-diff is ONE narrow MapInPandas stage — no exchange; the cut flag is an integer compare, no float ratio"),
    ("tx19_bpe_apply", "encode via the trained vocab cache: word-level BroadcastHashJoin onto the posexploded corpus, ONE doc_id exchange for the per-doc partial agg"),
    ("dd14_bloom_decontaminate", "k=4 bloom probes are broadcast LEFT joins against one persisted <=2^16-row bit set; the probe stream reads the SESSION-PERSISTED decon 5-gram index (r17 — shared with dd10, no per-run re-tokenize); the per-doc verdict agg rides the cached frame's doc_id partitioning in the executed plan"),
    ("ss16_mips_ivf", "norm augmentation fuses into the corpus scan (max-norm = broadcast 1-row agg); cell assignment keeps ss02's map-only shape; candidates = ONE BroadcastHashJoin on cell id; top-K via WindowGroupLimit"),
    ("tp12_weighted_sample", "global weighted-WOR cutoff is TakeOrderedAndProject — per-partition top-N heaps, no window, no exchange after the key map"),
    ("tx20_ccnet_buckets", "reads tx13's SESSION-MATERIALIZED per-doc score (r17, InMemoryTableScan; tx13's own row still builds live) + exactly ONE lang-keyed exchange for the tertile rank/count window"),
    ("dq05_row_expectations", "rule CASEs fuse into the fact scan as whole-stage codegen — zero exchanges; output is violation-count-sized"),
    ("tp13_range_partition", "boundary array BROADCAST into the full scan; part_id assignment is a shuffle-free codegen map; rank window only over the 1-in-20 sample"),
    ("tx21_kneser_ney_xent", "four vocabulary-capped KN model tables (r16: all aggregated from the shared persisted cnt2 core, InMemoryTableScan) broadcast LEFT into the shuffle-free zip_with bigram stream"),
    ("dd16_cdc_chunks", "content-defined chunking entirely in scan-stage codegen (window hashes, boundary filter, chunk slicing); the only exchanges key on the 8-byte chunk hash, never the text"),
    ("ss18_ann_matryoshka", "coarse pass joins only 8-dim prefixes; WindowGroupLimit prunes to C per query map-side; full vectors rejoin only for the C·n_queries rerank rows"),
    ("ss19_ann_filtered", "predicate lands on the index side BEFORE the cell join (pre-filter semantics); disqualified vectors never enter the candidate stream"),
    ("tx12_dup_span_profile", "the (w,gh)-partitioned gram index is PERSISTED: both consumers (frequency count + frequency join probe) read InMemoryTableScan of ONE relation — the corpus tokenize/vocab/window pipeline executes once, where the unpersisted r10 plan ran it twice (8 FileScans, 0 reuse)"),
    ("dd02_ngram_jaccard", "persisted prefix-postings index (InMemoryTableScan on every consumer); prefix filter sheds candidates BEFORE the pair join; positional upper-bound filter in codegen; no cartesian product anywhere"),
    ("dd12_semdedup", "ONE cell-id exchange partitions the corpus; the within-cell self-join is the only SMJ (Σ|cell|² work, never n²); the cosine pair filter runs in whole-stage codegen before any pair materializes"),
    ("dd18_longest_dup_span", "reads the SAME persisted tx12 gram index (InMemoryTableScan, no second tokenize); cf>1 filters the vocabulary-sized count table before the doc-side join; per-doc verdict is partial-agg + one left join"),
    ("tp15_doremi_reweight", "reads tx13's SESSION-MATERIALIZED per-doc score (r17); everything above it is domain-sized — the baseline and normalizer are single-partition window folds (r16), not crossJoined 1-row aggregates"),
    ("mm21_phash_search", "pHash frame computed once (persisted; the 8-row query side is a broadcast slice, not a second decode pass); distance scan is corpus × constant rows; top-K via per-query rank window"),
    ("mm22_audio_quality", "one narrow MapInPandas stage over the fixture scan — no exchange; clipping/DC/range/quiet-run all inside the Python batch, one row per clip out"),
    ("dq07_referential_integrity", "per FK (r17): child pre-aggregated to per-key counts, FULL-outer-merged with the distinct parent keys — both sides arrive key-partitioned from their own aggregation, so the join adds NO exchange — one fold emits the report row; no Expand, no anti-join second scan, no crossJoin stitching"),
    ("ss20_ann_binary", "sign-code build fused into the embeddings scan (codegen folds, no Python); coarse Hamming vs BROADCAST query codes; exact-flag join broadcast — no SortMergeJoin anywhere"),
    ("dq08_psi_drift", "per column: two partial-agg passes to bin granularity, a bin-sized full-outer join, and the PSI fold over a sorted bin list — every post-scan frame is bin-count-sized"),
    ("dd19_containment", "contained side joins only its RAREST-gram containment prefix (low df by construction) against the full postings; verification is one array_intersect projection over the persisted gram-array index (r16); all shuffle keys 8-byte hashes"),
    ("dd20_graph_rank", "shown: ONE Pregel superstep (the returned frame itself is a flat checkpoint scan). One BroadcastHashJoin (msg ⋈ ranks on the sender) + one partial/final ObjectHashAggregate on the destination; BOTH inputs are checkpoint scans (Scan ExistingRDD) — no live corpus pipeline inside a round, linear plan growth via checkpoint_tracked (lineage still resolves to documents)"),
    ("web01_url_parse", "the whole URL synthesize→parse→registrable-domain chain is ONE WholeStageCodegen span over the documents scan — zero exchanges, zero Python; ReadSchema reads only (doc_id, lang, source)"),
    ("web02_host_dup_rate", "the only exchanges key on the 8-byte text hash (dup detection, partial-agg combined) and the registrable domain (host-count-sized rollup); the dup-flag join is AQE-chosen"),
    ("sk01_hll_distinct", "the register build is a partial/final HashAggregate pair on (lang, bucket) — every map partition emits ≤ 5×256 rows no matter how many shingles it scanned — then one lang-keyed fold; the only corpus-keyed exchange is the exact-countDistinct evidence leg evidence=False drops (absence plan-pinned in tests/test_evidence.py)"),
    ("sk02_countmin_topk", "the counter build partial-aggregates onto ≤ 4×512 cells per map partition (the sketch property as a plan shape); probes are a BroadcastHashJoin of the 2048-row counter table into 20 keys; the exact candidate list is TakeOrderedAndProject"),
    ("sk03_hll_source_overlap", "the distinct-gram and dense-register frames are PERSISTED (every consumer reads InMemoryTableScan; no live corpus scan ahead of the first cached relation); densify, the pair self-join on bucket, estimate assembly and the exact-evidence join are ALL broadcast — no shuffle join anywhere in the 190-pair combinatorics"),
    ("dq09_quantile_profile", "two linear passes: one exact-percentile agg (the 100 TB swap is approx_percentile — a mergeable partial agg) and one fence-count agg with the 1-row fence frame broadcast; report is column-count-sized"),
    ("sk04_hll_precision_ladder", "ONE corpus aggregation pass feeds all three ladders: the finest-bucket register agg (partial-agg capped at 1024 rows per map partition) explodes into (m, bucket, mj) rungs re-aggregated register-sized — a single linear plan, one documents scan plus the exact-leg scan evidence=False drops"),
    ("web04_html_extract", "the whole HTML synthesize→strip→anchor-account→ratio chain is ONE WholeStageCodegen span over the documents scan — zero exchanges, zero Python (web01's precedent, now over markup)"),
    ("web05_boilerplate_gate", "jusText block extraction with NO explode/groupBy: segment/score/gate/reassemble all run inside one row via transform/filter/aggregate over the block array — one codegen map fused into the scan, zero exchanges"),
    ("ss21_ann_ivf_partitioned", "the serve scan reads the STORED cell-partitioned index with PartitionFilters carrying a dynamicpruning expression — the probe list prunes index files before any IO; the corpus-sized embeddings scan appears only in the one-time index build, not here"),
    ("tp16_token_exact_packing", "vocab BroadcastHashJoin onto the exploded corpus; ONE doc_id agg exchange + ONE shard-key window exchange — token-exact lengths without a corpus-keyed word shuffle"),
    ("web07_robots_compliance_gate", "the whole robots/licence/opt-out gate — rule derivation, longest-match resolution, verdict — is ONE codegen span fused into the scan; zero exchanges, zero joins"),
    ("dd21_exact_dup_spans", "dup-gram filter prunes the vocab-sized count table BEFORE the self-join; pair stream keyed on the 8-byte anchor hash, ONE run window on (id_a,id_b,delta) feeding a single-pass profile (r16) — no text column ever shuffles"),
    ("ss22_ann_ivfpq_residual", "residual ADC: probe frame carries N_QUERIES*N_PROBE per-cell tables (broadcast); codes artifact joins map-side; the only wide exchange is the per-query top-K"),
    ("tp17_no_split_packing", "ONE exchange on the shard key feeding FlatMapGroupsInPandas — the capacity-reset recurrence runs per shard inside an Arrow batch; scan reads only doc_id + text"),
    ("mm23_video_near_dup", "ONE narrow decode+hash Arrow pass (persisted, both join sides read it); candidates from the 8-bit band equi-join, never all frame pairs; Hamming gate in codegen before the pair agg — which is collect_set sizes in ONE ObjectHashAggregate pass (r17), not a double-countDistinct Expand"),
    ("web08_politeness_schedule", "web07's compliance gate composed as a codegen Filter BEFORE the reg_domain rank-window exchange (only the allowed frontier shuffles); delay/worker derivation + schedule arithmetic all codegen over the scan"),
    ("tx23_fasttext_gate", "THE MODEL is one persisted B-row frame (both class counts, one corpus pass — train once, serve from the table) broadcast-LEFT-joined into the shuffle-free bigram feature stream with the totals folded off the same frame; the only corpus-sized exchange is the per-doc score agg (doc_id-keyed, map-side combined) — the fastText forward pass as a plan"),
    ("sk05_source_intake_report", "one text-hash pass (partial-agg combined), the SHARED persisted (source, gram) frame (InMemoryTableScan — same artifact sk03 reads), register-sized HLL folds, source-count-sized rollups; the dup-flag join is AQE-chosen (web02's pattern)"),
    ("web09_warc_extract", "binaryFile scan (path+content pruned) feeding ONE MapInPandas record walk; the extraction metrics (octet_length/regexp) are a codegen Project ON TOP of the barrier — no shuffle anywhere in the plan"),
    ("web10_frontier_cap", "WindowGroupLimit PARTIAL below the single reg_domain Exchange, FINAL above — every map task sheds rows past rank H before the shuffle (the mega-host shed); the compliance gate stays a codegen Filter before both"),
    ("ss23_ann_ivf_incremental", "TWO stored-index scans (base + delta cell-partitioned parquet), EACH with its own dynamicpruning PartitionFilter from the broadcast probe join; tombstones a BroadcastHashJoin LeftAnti on the candidate stream; embeddings appears only for centroids/probes/tombstones (constant-size frames)"),
    ("tx24_unigram_lm_train", "ONE corpus exchange (the persisted word-frequency agg); both EM rounds are vocab-sized and CHECKPOINTED (r16) — the trainer's plan is a piece-count agg over a leaf scan, no nested Viterbi-DP tree; no UDF, no barrier"),
    ("web11_frontier_refresh", "the whole refresh policy — compliance gate, host-class/change-class TTLs, age derivation, due verdict — is ONE codegen span fused into the scan; zero exchanges, zero joins (web07's shape)"),
    ("tx26_langid_gate", "tx23's train-once-serve-from-the-table shape at K classes: the persisted ≤B×K model + vocab/total/prior folds broadcast into the deduped (doc, feature) stream (BroadcastHashJoin ×3 — no SortMergeJoin anywhere); corpus exchanges are the (doc, f) pre-agg (map-side combined) and the K-rows-per-doc argmax window"),
]


def _dd20_superstep_frame(spark, sf_dir):
    """dd20's returned frame is (by design) a flat scan of the final
    checkpoint — the plan worth showing is one superstep, rebuilt here
    from the session-pinned msg and penultimate-round frames."""
    from hive_lineage_spark.operators import dedup

    app = spark.sparkContext.applicationId
    msg = dedup._POSTINGS_CACHE[(app, sf_dir, "dd20_msg")]
    prev = dedup._POSTINGS_CACHE[(app, sf_dir, f"dd20_ranks_r{dedup.PR_ITERS - 1}")]
    return dedup._dd20_superstep(msg, prev)


# queries whose evidence plan is not the returned frame's own plan
SPECIAL_PLAN = {"dd20_graph_rank": _dd20_superstep_frame}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from hive_lineage_spark.session import get_spark

    spark = get_spark("dump_plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    lines = [
        "# PLANS — executed physical plans of representative queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` (AQE final plans",
        "after execution). This is the evidence behind SCALE.md's claims.",
        "",
    ]
    MAX_PLAN_LINES = 160  # deep union DAGs (ss09) print thousands of lines
    for name, why in SHOW:
        df = qs[name](spark, sf_dir)
        df.collect()
        if name in SPECIAL_PLAN:
            df = SPECIAL_PLAN[name](spark, sf_dir)
            df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().rstrip()
        plines = plan.splitlines()
        if len(plines) > MAX_PLAN_LINES:
            plan = "\n".join(plines[:MAX_PLAN_LINES]) + (
                f"\n... truncated ({len(plines)} lines total; the evidence "
                "for the claim above is in the shown prefix)"
            )
        lines += [f"## {name}", "", f"*What to look for: {why}.*", "", "```", plan, "```", ""]

    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    out = os.path.join(REPO, "docs", "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
