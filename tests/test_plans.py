"""Physical-plan quality assertions — the encoded ``.explain`` review.

These pin the optimizations that matter at 100 TB: predicate pushdown
reaching the parquet scan, column pruning in ReadSchema, broadcast joins
for dimension tables, the partial/final aggregate split, top-k as
TakeOrderedAndProject, and partition pruning on partitioned data.
"""

from __future__ import annotations

import pytest

from hive_lineage_spark.operators import relational as R

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_predicates_are_pushed_to_scan(spark):
    plan = _plan(R.q04_filter_predicates(spark, SF))
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for token in ("o_orderstatus", "o_totalprice", "In(o_orderpriority"):
        assert token in pushed, f"{token} not pushed down: {pushed}"


def test_projection_prunes_columns_at_scan(spark):
    plan = _plan(R.q02_project_alias(spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 referenced columns are read, not all 11
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_returnflag"):
        assert col in read_schema
    for col in ("l_shipdate", "l_quantity", "l_tax", "l_suppkey"):
        assert col not in read_schema, f"{col} should be pruned: {read_schema}"


def test_explicit_broadcast_join_is_broadcast(spark):
    plan = _plan(R.q07_join_broadcast(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_dimension_joins_auto_broadcast(spark):
    """AQE/stats should broadcast every dimension in the flagship query —
    no sort-merge join should survive for sub-10MB dims."""
    df = R.q17_q27_shape(spark, SF)
    df.collect()  # AQE final plan
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregate_has_partial_and_final_split(spark):
    plan = _plan(R.q14_agg_tpch_q1(spark, SF))
    # map-side combine: both modes present (keys=[...] twice with functions
    # partial_/final or two HashAggregate occurrences)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_topk_uses_take_ordered_and_project(spark):
    plan = _plan(R.q16_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan  # no global sort + limit


def test_partition_pruning_reads_single_partition(spark):
    df = R.q18_partition_pruning(spark, SF)
    df.collect()
    # the filter must land in PartitionFilters (directory pruning), not as
    # a data filter — inputFiles() ignores pruning, so assert on the plan
    plan = _plan(df)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "l_returnflag" in pf and "= R" in pf, pf
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_returnflag" not in pushed, f"should prune dirs, not row-filter: {pushed}"


def test_whole_stage_codegen_covers_agg_pipeline(spark):
    df = R.q14_agg_tpch_q1(spark, SF)
    df.collect()  # codegen spans only appear in the AQE final plan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    import re

    # '*(n)' prefixes mark WholeStageCodegen spans; both agg stages must be in one
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:400]


def test_semi_join_not_expanded_to_inner(spark):
    plan = _plan(R.q11_join_left_semi(spark, SF))
    assert "LeftSemi" in plan


def test_postings_dictionary_join_is_broadcast(spark):
    """The shingle-hash dictionary join must broadcast (tiny dict side)."""
    import hive_lineage_spark.operators.dedup as dd

    po = dd._hashed_postings(spark, SF)
    plan = _plan(po)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_dedup_apply_anti_join_is_unpinned(spark):
    """dd07 removes the drop-list with an anti-join that carries NO
    broadcast hint: at test scale AQE may still choose broadcast, but the
    drop list is corpus-proportional at web scale so the plan must not
    pin it. Assert the join is LeftAnti and the pairs side has no
    user-supplied ResolvedHint/broadcast pin in the analyzed plan."""
    import hive_lineage_spark.operators.pipeline as pl

    import hive_lineage_spark.operators.dedup as dd

    df = pl.dd07_near_dedup_apply(spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan
    # dd02's vocabulary broadcast (sublinear, legitimate) is the ONLY
    # hint allowed — dd07 itself must not add one on the drop list.
    n_hints = lambda d: d._jdf.queryExecution().analyzed().toString().count("ResolvedHint")
    assert n_hints(df) == n_hints(dd.dd02_ngram_jaccard(spark, SF))


def test_ivf_centroid_assignment_is_map_only(spark):
    """ss02's cell assignment must be a pure map over a broadcast one-row
    centroid array: no window partitioned by vec_id (the old design
    exploded every vector ×K and exchanged the replicated vector table).
    The only row_number window left is the final per-query rank."""
    import hive_lineage_spark.operators.similarity as ss

    df = ss.ss02_ann_ivf(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "windowspecdefinition(vec_id" not in plan


def test_embed_cosine_has_no_driver_collect(spark, monkeypatch):
    """dd06's build side must be tiled distributively — constructing AND
    executing it must never pull the embeddings table to the driver."""
    from pyspark.sql import DataFrame

    import hive_lineage_spark.operators.dedup as dd

    def _boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("driver-side collect in dd06's plan path")

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toLocalIterator", _boom)
    # sf0.001 has no pairs at the production threshold; lower it so the
    # count job has real work end-to-end
    monkeypatch.setattr(dd, "COSINE_T", 0.3)
    monkeypatch.setattr(dd, "TILE_ROWS", 128)
    n = dd.dd06_embed_cosine_dup(spark, SF).count()
    assert n == 920  # exact pair count from the DuckDB oracle at t=0.3


def test_asof_join_single_user_shuffle_no_inflation(spark):
    """q27's union-merge as-of must cost exactly ONE exchange, keyed on the
    user column, feeding one window — the old inequality-join design
    materialized every (event x earlier-order) pair and re-shuffled the
    inflated intermediate on event_id (quadratic on a hot user)."""
    df = R.q27_asof_join(spark, SF)
    df.collect()  # AQE final plan
    # toString includes the pre-AQE "Initial Plan" section too — the
    # executed plan is the part before it
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+),", plan)
    assert len(exchanges) == 1, exchanges
    assert exchanges[0].startswith("u#"), exchanges
    assert "windowspecdefinition(event_id" not in plan


def test_embed_cosine_multi_tile_matches_single_tile(spark, monkeypatch):
    """Shrinking the tile size (500 rows → 4 blocks → 10 tiles) must not
    change the pair set: every unordered pair lands in exactly one tile."""
    import hive_lineage_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "COSINE_T", 0.3)

    def rows(df):
        return {(r.id_a, r.id_b, r.cosine) for r in df.collect()}

    single = rows(dd.dd06_embed_cosine_dup(spark, SF))
    monkeypatch.setattr(dd, "TILE_ROWS", 128)
    multi = rows(dd.dd06_embed_cosine_dup(spark, SF))
    assert single == multi and len(single) == 920


def test_pq_ann_broadcasts_codebook_and_queries(spark):
    """ss08's joins must ALL be broadcast (1-row codebook, n_queries-row
    distance tables) with exactly one hash exchange — the final rank
    window on query_id. A shuffle of the corpus codes, or a cartesian
    product, would break the PQ scale story (corpus-sized artifact is
    the codes table only)."""
    import re

    import hive_lineage_spark.operators.similarity as ss

    # pin the UNCACHED scoring core: ss08/ss10 serve slices of the
    # persisted depth-PQ_RERANK frame this core builds
    df = ss._pq_adc_ranked(spark, SF, ss.K)
    df.collect()
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+),", plan)
    assert len(exchanges) == 1 and exchanges[0].startswith("query_id"), exchanges


def test_bpe_train_vocab_sized_iterations(spark):
    """tx15: ONE corpus-sized shuffle (the word-frequency groupBy, with
    map-side combine); each merge iteration's pair count is a
    partial/final agg over the vocab-sized symbol table, the argmax is
    TakeOrdered (1 row), and the merge application is a broadcast-join
    pure map — no SortMergeJoin, no cartesian product anywhere."""
    import hive_lineage_spark.operators.text as tx
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    df = tx.tx15_bpe_train(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    best1 = tx._bpe_best(spark, SF, 1)
    p1 = _plan(best1)
    assert "partial_sum" in p1 or "partial_" in p1, p1
    assert "TakeOrderedAndProject" in p1, p1
    clear_postings_cache()


def test_tx12_gram_index_cached_single_pipeline(spark):
    """tx12's frequency count and frequency join both consume the
    persisted (w, gh)-partitioned gram index: the executed plan reads
    InMemoryTableScan on both branches and the corpus tokenize/vocab/
    window pipeline appears ONLY inside the single cached-relation
    build — not as two live FileScan subtrees (the r10 regression:
    repartition alone did not canonicalize to a ReusedExchange, so the
    heaviest bench query ran its corpus pipeline twice)."""
    import hive_lineage_spark.operators.text as tx
    from hive_lineage_spark.operators.dedup import _POSTINGS_CACHE, clear_postings_cache

    import re

    clear_postings_cache()
    df = tx.tx12_dup_span_profile(spark, SF)
    df.collect()
    plan = _plan(df)
    assert plan.count("InMemoryTableScan") >= 2, plan
    # every document scan lives under an InMemoryRelation build print;
    # nothing scans live ahead of the first cached relation
    assert "FileScan" not in plan.split("InMemoryRelation")[0], plan
    # one shared build: the (w, gh) REPARTITION_BY_COL exchange occurs
    # as ONE final + ONE initial physical node however often the cached
    # relation is printed (r10's broken plan had two live exchanges —
    # four distinct plan_ids — and zero InMemoryTableScans)
    ids = set(re.findall(r"REPARTITION_BY_COL, \[plan_id=(\d+)\]", plan))
    assert len(ids) <= 2, ids
    assert "tx12_grams" in {k[2] for k in _POSTINGS_CACHE}
    clear_postings_cache()


def test_ss20_code_build_codegen_no_smj(spark):
    """ss20: the sign-code build fuses into the embeddings scan (pure
    codegen folds — no Python stage), the coarse pass joins corpus
    codes against BROADCAST query codes (never a SortMergeJoin or
    shuffled cartesian), and both rank phases run as windows over
    candidate-sized frames."""
    from hive_lineage_spark.operators import similarity as ss

    df = ss.ss20_ann_binary(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_mm21_single_decode_pass(spark):
    """mm21: the pHash table is persisted and the 8-row query side is
    a broadcast slice of the SAME cached frame — exactly one decode
    barrier builds the cache; the live plan reads InMemoryTableScan
    on both sides of the distance scan."""
    from hive_lineage_spark.operators import multimodal as mm
    from hive_lineage_spark.operators.dedup import _POSTINGS_CACHE, clear_postings_cache

    clear_postings_cache()
    df = mm.mm21_phash_search(spark, SF)
    df.collect()
    plan = _plan(df)
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "FileScan" not in plan.split("InMemoryRelation")[0], plan
    assert "mm21_phash" in {k[2] for k in _POSTINGS_CACHE}
    clear_postings_cache()


def test_tp15_single_pipeline_window_normalizers(spark):
    """tp15 (r16): base_xent and Z are single-partition WINDOW folds
    over the domain-sized per-source frame — one linear pipeline, no
    1-row aggregate branches crossJoined back (the pre-r16 shape made
    three consumers of the corpus tf pipeline; exchange reuse covered
    the exchanges but the per-source folds above them re-ran per
    branch). The window exchanges move ≤ #sources rows."""
    from hive_lineage_spark.operators.pipeline import tp15_doremi_reweight

    df = tp15_doremi_reweight(spark, SF)
    df.collect()
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    # the normalizers ride windows (1-3 nodes depending on how the
    # optimizer merges same-spec window exprs); the two 1-row-aggregate
    # crossJoin branches (base_xent, Z) are gone — any remaining
    # BroadcastNestedLoopJoin cross belongs to tx13's model subplan
    assert 1 <= final.count("Window") <= 3, final
    assert final.count("BroadcastNestedLoopJoin") <= 1, final


def test_dq07_single_pass_full_outer(spark):
    """dq07 (r17): each relationship is ONE pass — child pre-aggregated
    to per-key counts, FULL-outer-merged with the distinct parent keys,
    folded to a single report row. No Expand (the old count_distinct),
    no anti-join second child scan, no 1-row-aggregate crossJoin
    stitching, and nothing degrades to a cartesian/nested-loop."""
    from hive_lineage_spark.operators.quality import DQ07_RELS, dq07_referential_integrity

    df = dq07_referential_integrity(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Expand" not in plan, plan
    assert plan.count("FullOuter") >= len(DQ07_RELS), plan


def test_dq08_post_scan_frames_bin_sized(spark):
    """dq08: after the two slice scans, every exchange carries bin- or
    1-row-sized frames — no corpus-sized shuffle, no join strategy
    other than the bin-count full-outer (at most sort-merge over ≤ a
    dozen rows) and the broadcast of the totals."""
    from hive_lineage_spark.operators.quality import dq08_psi_drift

    df = dq08_psi_drift(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the only hash exchanges key on the bin column or are partial-agg
    # 1-row collects; no exchange keys on a row-id or doc-sized column
    import re

    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    # "bin" = the full-outer bin join; "na" = the PSI fold's group key
    # over the bin-sized term frame (constant per column, 1 group)
    assert keys <= {"bin", "na"}, keys


def test_pair_curation_single_join_no_python(spark, monkeypatch):
    """mm09: the caption encoder must fuse into the documents scan (pure
    map) and the only data movement is the pair-id equi-join of the two
    corpus-sized sides — no cartesian, no Python stage, and at most the
    join's own exchanges (broadcast at test SF leaves zero). Pinned with
    the r16 scan fan-out disabled: the pin asserts the PRODUCTION shape,
    where thousands of input splits make the conditional fan-out a no-op
    by construction (test fixtures are single-row-group files, so the
    fan-out would add its one repartition here)."""
    import re

    from hive_lineage_spark.operators import multimodal as mm

    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "0")
    df = mm.mm09_pair_curation(spark, SF)
    df.collect()
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Join" in plan
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+),", plan)
    assert len(exchanges) <= 2 and all(e.startswith("pair_id") for e in exchanges), exchanges


def test_ss09_consumes_checkpointed_shortlists_one_pipeline(spark):
    """ss09 (r16 form): the six evaluated legs and the exact baseline
    are session-persisted CHECKPOINT leaves (``_leg_topk_cached`` /
    ``_exact_topk_cached``) consumed by ONE joined pipeline — stacked
    shortlists ⋈ exact, one agg, one universe left-join. No live
    corpus pipeline and no PQ scoring tree inside the recall plan (the
    pre-r16 six-pipeline union re-analyzed every leg's full plan per
    run: 8341 explain lines → ~200), and the legs' own builds still
    create the shared PQ artifacts."""
    import hive_lineage_spark.operators.similarity as ss
    from hive_lineage_spark.operators.dedup import _POSTINGS_CACHE, clear_postings_cache

    clear_postings_cache()
    df = ss.ss09_ann_recall(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan or "RDDScan" in plan, plan
    assert "FileScan" not in plan, plan
    tags = {k[2] for k in _POSTINGS_CACHE}
    assert {"ss09_exact", "pq_codes", "pq_trained_cb", "pq_trained_codes"} <= tags, tags
    assert {f"leg_topk_{m}" for m in (
        "ivf", "ivfpq", "ivfpq_res", "pq", "pq_rerank", "pq_trained"
    )} <= tags, tags
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert len(analyzed) < 30_000, f"ss09 analyzed plan regrew: {len(analyzed)} chars"
    clear_postings_cache()


def test_ss17_fuses_checkpointed_shortlists(spark):
    """ss17 (r16): fusion consumes the same session-persisted leg
    shortlists as ss09 (tags shared — leg_topk_ivf is built once for
    both), so the warm plan is a K-row full-outer join + one window
    over two checkpoint leaves; no live IVF/LSH search inside."""
    import hive_lineage_spark.operators.similarity as ss
    from hive_lineage_spark.operators.dedup import _POSTINGS_CACHE, clear_postings_cache

    clear_postings_cache()
    df = ss.ss17_rank_fusion(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan or "RDDScan" in plan, plan
    assert "FileScan" not in plan, plan
    tags = {k[2] for k in _POSTINGS_CACHE}
    assert {"leg_topk_ivf", "leg_topk_lsh"} <= tags, tags
    clear_postings_cache()


def test_dd19_verification_uses_gram_arrays(spark):
    """dd19 (r16): exact containment verification computes
    |A∩B| = size(array_intersect) from the persisted per-doc gram-array
    index in one codegen projection over the candidate frame — the two
    corpus-sized postings joins of the pre-r16 form are gone (the
    ``_verify_pairs`` rewrite, ported)."""
    from hive_lineage_spark.operators import dedup as dd

    dd.clear_postings_cache()
    df = dd.dd19_containment(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "array_intersect" in plan, plan
    tags = {k[2] for k in dd._POSTINGS_CACHE}
    assert "gram_arrays" in tags, tags
    dd.clear_postings_cache()


def test_dd21_profile_is_single_anchor_pass(spark):
    """dd21 (r16): the (max_span, n_partners) profile folds in ONE pass
    over the run stream — per-pair maxima then a per-doc window — so
    the gaps-and-islands row_number window appears exactly once in the
    executed plan (the pre-r16 form consumed ``runs`` twice and
    re-executed the whole anchor-match + window pipeline per
    consumer)."""
    from hive_lineage_spark.operators import text as tx
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    df = tx.dd21_exact_dup_spans(spark, SF)
    df.collect()
    # AQE prints the final plan followed by "== Initial Plan ==" — count
    # windows in the final plan only
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("row_number()") == 1, plan
    clear_postings_cache()


def test_lm_ladder_shares_persisted_train_core(spark):
    """tx17/tx18/tx21 (r16): the held-out LM ladder's model tables come
    from three shared session-persisted train-side artifacts — the
    top-cap vocabulary (w, u), the train token total, and the
    vocab-capped bigram-count core (construction-identical in tx18 and
    tx21, so ONE frame serves both) — and every derived table (tx18's
    cnt1, tx21's head/cont/btot) aggregates the ≤cap² cached frame.
    Warm runs pay only the held-out scoring pass: the scored plan reads
    InMemoryTableScan for the model side, and building tx21 after tx18
    adds NO new cnt2 build (shared tag)."""
    import hive_lineage_spark.operators.text as tx
    from hive_lineage_spark.operators.dedup import _POSTINGS_CACHE, clear_postings_cache

    clear_postings_cache()
    tx.tx18_backoff_xent(spark, SF).collect()
    tags = {k[2] for k in _POSTINGS_CACHE}
    assert {"lm_vocab16", "lm_tot", "lm_cnt2_16"} <= tags, tags
    n_before = len(_POSTINGS_CACHE)
    df21 = tx.tx21_kneser_ney_xent(spark, SF)
    df21.collect()
    assert len(_POSTINGS_CACHE) == n_before, "tx21 rebuilt a shared model frame"
    plan = _plan(df21)
    assert "InMemoryTableScan" in plan, plan
    tx.tx17_heldout_xent(spark, SF).collect()
    assert len(_POSTINGS_CACHE) == n_before, "tx17 rebuilt a shared model frame"
    clear_postings_cache()


def test_tx24_round_boundary_checkpointed(spark):
    """tx24 (r16): both EM-round artifacts materialize through the
    lineage-tracked checkpoint (the tx15/tx19 BPE-stage discipline), so
    the trainer's final plan is piece-count aggregation over a leaf
    scan — no nested Viterbi-DP HOF tree re-analyzed per consumer
    (3571 explain lines → ~126; the DP's ``aggregate(`` HOF fold must
    not appear in the final plan)."""
    from hive_lineage_spark.operators import text as tx
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    df = tx.tx24_unigram_lm_train(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan or "RDDScan" in plan, plan
    assert "aggregate(" not in plan, plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert len(analyzed) < 10_000, f"tx24 analyzed plan regrew: {len(analyzed)} chars"
    clear_postings_cache()


def test_real_decode_ops_are_single_python_stage(spark, monkeypatch):
    """mm05/mm06/mm07 are one narrow mapInPandas stage over the fixture
    scan: no exchange, no join — the shape that scales by adding input
    splits. Pinned with the r16 scan fan-out disabled (production inputs
    ship enough splits that the conditional fan-out is a no-op there by
    construction); a second pass pins that WITH fan-out enabled the only
    added node is the one distribute-the-decode repartition exchange."""
    from hive_lineage_spark.operators import multimodal as mm

    ops = (
        mm.mm05_decode_image,
        mm.mm06_decode_resize,
        mm.mm07_decode_audio,
        mm.mm10_video_frame_pixels,
        mm.mm11_audio_features,
        mm.mm12_image_dhash,
    )
    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "0")
    for q in ops:
        plan = _plan(q(spark, SF))
        assert "Exchange" not in plan, (q.__name__, plan)
        assert "MapInPandas" in plan, (q.__name__, plan)
    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "1")
    for q in ops[:1]:  # one representative: the fan-out is shared code
        plan = _plan(q(spark, SF))
        assert plan.count("Exchange") <= 1, (q.__name__, plan)
        assert "MapInPandas" in plan, (q.__name__, plan)


def test_unigram_logprob_has_partial_agg_and_no_pinned_join(spark):
    """tx13: the tf pass must map-side combine, and the tf⋈cnt join must
    carry no user hint (vocabulary is sublinear but corpus-proportional
    in the limit — AQE decides)."""
    from hive_lineage_spark.operators import text as tx

    df = tx.tx13_unigram_logprob(spark, SF)
    plan = _plan(df)
    assert "partial_" in plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1  # the 1-row corpus total only


def test_ivfpq_probe_join_is_broadcast_no_cartesian(spark):
    """ss13: the probe/distance-table side must broadcast into the
    codes join (hash join on cell — the corpus side never shuffles its
    code stream), every crossJoin must be a single-row broadcast (no
    CartesianProduct), and the per-query top-K must push down."""
    from hive_lineage_spark.operators import similarity as ss

    plan = _plan(ss.ss13_ann_ivfpq(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_mips_ivf_assignment_map_only_and_probe_hash_join(spark):
    """ss16: the norm-augmented cell assignment must stay a pure map
    over broadcast one-row frames (no window partitioned by corpus
    vec_id — only the final per-query rank windows), the candidate
    probe must be a hash join on cell id (no CartesianProduct, no
    SortMergeJoin — probes broadcast, the corpus code stream never
    shuffles), and the per-query top-K must push down as
    WindowGroupLimit partial/final."""
    from hive_lineage_spark.operators import similarity as ss

    plan = _plan(ss.ss16_mips_ivf(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "windowspecdefinition(vec_id" not in plan


def test_weighted_sample_is_distributed_topn(spark):
    """tp12: the global weighted-sample cutoff must be
    TakeOrderedAndProject (per-partition top-N heaps merged on the
    driver) — never a row_number window over a single partition, and
    the key expression (hash fold + ln) must stay whole-stage codegen
    with no exchange before the top-N."""
    from hive_lineage_spark.operators import pipeline as tp

    plan = _plan(tp.tp12_weighted_sample(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[1]


def test_row_expectations_gate_is_exchange_free(spark):
    """dq05: the quarantine gate must be a pure map + filter fused into
    the fact scan — zero exchanges, zero joins, zero windows; the rule
    CASEs all evaluate in the scan stage."""
    from hive_lineage_spark.operators import quality as dq

    plan = _plan(dq.dq05_row_expectations(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "windowspecdefinition" not in plan


def test_hamming_ann_broadcasts_queries_and_pushes_topk(spark):
    """ss12: the query-band side must broadcast (corpus side is one map
    pass — no shuffle of the exploded band stream), the first-match
    dedup must fuse into the join condition (no distinct()), and the
    per-query top-K must use WindowGroupLimit partial/final so only K
    rows per query reach the single query_id exchange."""
    from hive_lineage_spark.operators import similarity as ss

    plan = _plan(ss.ss12_ann_hamming(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "partial" in plan.lower()


def test_bigram_xent_extraction_is_map_only(spark):
    """tx16: bigram extraction must be a zip_with map over the token
    array (no posexplode + self-join — that shape shuffles the whole
    token stream on (doc_id, pos)), and the count passes must map-side
    combine like tx13's."""
    from hive_lineage_spark.operators import text as tx

    df = tx.tx16_bigram_xent(spark, SF)
    plan = _plan(df)
    assert "zip_with" in plan and "posexplode" not in plan
    assert "partial_count" in plan and "partial_collect_list" in plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # AQE decides the model joins


def test_gate_and_chunking_are_shuffle_free(spark):
    """tx14 (Gopher gate) and tp11 (overlap chunking) are pure maps —
    no Exchange anywhere; they fuse into the scan and scale by input
    splits alone."""
    from hive_lineage_spark.operators import pipeline as pl
    from hive_lineage_spark.operators import text as tx

    for q in (tx.tx14_gopher_gate, pl.tp11_chunk_overlap):
        plan = _plan(q(spark, SF))
        assert "Exchange" not in plan, (q.__name__, plan)
        assert "FileScan parquet" in plan


def test_bloom_decontaminate_probes_stay_map_side(spark):
    """dd14: the k bloom probes must each be a broadcast LEFT join (the
    bit set is ≤ 2^16 rows by construction — never a shuffle side), and
    the training gram stream must meet them without SortMergeJoin or
    CartesianProduct. The final per-doc aggregate rides the gram
    window's doc_id partitioning — Catalyst must not insert a fresh
    exchange between the last probe join and the count."""
    from hive_lineage_spark.operators import dedup as dd

    df = dd.dd14_bloom_decontaminate(spark, SF)
    # executed plan, not the pre-run AQE plan: the probe now reads the
    # session-persisted 5-gram index (r17), and until that cache is
    # materialized its partitioning is unknown to the initial planner,
    # which conservatively stages an exchange AQE then elides at runtime
    df.write.format("noop").mode("overwrite").save()
    plan = _plan(df)
    assert plan.count("], LeftOuter, BuildRight") == dd.BLOOM_K
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # probe path: vocab distinct + doc window only; the doc_id agg must
    # reuse the window exchange (probe side of the first LeftOuter join
    # up to the output contains no further hashpartitioning exchange)
    head = plan.split(", LeftOuter, BuildRight")[0]
    assert "Exchange hashpartitioning" not in head


def test_range_partition_assignment_is_broadcast_map(spark):
    """tp13: the full-table part_id assignment must be a broadcast of
    the boundary array into the scan (no hash exchange of the data
    before the 8-key audit agg), the sample filter must reach the scan
    as a DataFilter with a 1-column ReadSchema, and the rank window
    must sort only the sampled rows (exactly one SinglePartition
    exchange per sample pass, never of the unfiltered table)."""
    from hive_lineage_spark.operators import pipeline as pl

    df = pl.tp13_range_partition(spark, SF)
    df.collect()  # AQE final plan
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan
    assert "% 20) = 0" in plan  # sample gate in the scan's DataFilters
    # assignment side: boundaries broadcast, then straight to the
    # partial agg — the only hashpartitioning exchange keys on part_id
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(part_id" in plan
    assert "partial_count" in plan
    # every SinglePartition exchange carries the sample filter's plan
    # subtree, never the full scan
    for seg in plan.split("Exchange SinglePartition")[1:]:
        head = seg.split("FileScan")[0] + seg.split("FileScan")[1][:400]
        assert "% 20) = 0" in head or "HashAggregate" in head


def test_dd20_superstep_checkpoint_single_pipeline(spark):
    """dd20: each Pregel superstep's pre-checkpoint plan is ONE
    BroadcastHashJoin (msg ⋈ prev ranks) feeding ONE partial/final
    ObjectHashAggregate over the destination, and reads BOTH inputs as
    checkpoint scans (RDDScanExec) — no live corpus pipeline inside a
    superstep, no SortMergeJoin, no cartesian product, and no plan
    duplication (the r11 defect: the two-reference round doubled the
    logical plan per superstep until every action paid ~15 s of
    driver-side plan processing). Both checkpoint leaves carry nested
    registry docs (plans.capture.checkpoint_tracked), so column lineage
    still resolves through every round to the documents base table."""
    from hive_lineage_spark.operators import dedup
    from hive_lineage_spark.operators.dedup import clear_postings_cache
    from hive_lineage_spark.plans import capture as cap

    clear_postings_cache()
    df = dedup.dd20_graph_rank(spark, SF)
    df.collect()
    ck = dedup._POSTINGS_CACHE[
        (spark.sparkContext.applicationId, SF, f"dd20_ranks_r{dedup.PR_ITERS}")
    ]
    doc = cap._CHECKPOINT_REGISTRY[
        cap._rdd_key(ck._jdf.queryExecution().analyzed())
    ]
    names = [n.get("class", "").rsplit(".", 1)[-1] for n in doc["raw"]]
    assert names.count("BroadcastHashJoinExec") == 1, names
    assert names.count("ObjectHashAggregateExec") == 2, names  # partial+final
    assert names.count("RDDScanExec") == 2, names  # msg + previous round
    for bad in ("SortMergeJoinExec", "CartesianProductExec", "FileSourceScanExec"):
        assert bad not in names, names
    # both checkpoint inputs resolve through the registry
    assert set(map(int, (doc.get("nested") or {}).keys())) == {0, 1}
    # the returned frame is plan-flat: actions scan the final checkpoint
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan or "RDDScan" in plan, plan
    assert "FileScan" not in plan, plan
    # the r11 failure mode, pinned by SIZE: the two-reference round grew
    # the ANALYZED plan to 3.5 MB by round 3 (~15 s of driver-side plan
    # processing per action); the checkpointed formulation keeps it flat
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert len(analyzed) < 10_000, f"dd20 analyzed plan regrew: {len(analyzed)} chars"
    clear_postings_cache()


def test_web_ops_scan_fused_codegen(spark):
    """web01/web03: the whole URL synthesize→parse→gate chain fuses into
    the documents scan as whole-stage codegen — ZERO exchanges, zero
    Python (the RefinedWeb pre-text stage is free at 100 TB beyond the
    scan itself). web02's only exchanges key on the 8-byte text hash
    and the registrable domain — never a corpus-sized wide row."""
    from hive_lineage_spark.operators import web

    for name in ("web01_url_parse", "web03_url_blocklist",
                 "web04_html_extract", "web05_boilerplate_gate",
                 "web07_robots_compliance_gate"):
        df = web.QUERIES[name](spark, SF)
        df.collect()
        plan = _plan(df)
        assert "Exchange" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, name
        assert "*(1)" in plan, name  # one whole-stage-codegen span over the scan
    df = web.web02_host_dup_rate(spark, SF)
    df.collect()
    plan = _plan(df)
    import re

    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and set(keys) <= {"th", "reg_domain"}, keys
    assert "ReadSchema: struct<doc_id:bigint,text:string" in plan or "text" in plan.split("ReadSchema:")[1].splitlines()[0]
    # web06: canonicalization fuses into the scan; every exchange keys
    # on the 8-byte canonical-URL hash, never the URL string
    df = web.web06_url_canonical_dedup(spark, SF)
    df.collect()
    plan = _plan(df)
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and set(keys) <= {"ch"}, keys
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_ss21_serves_from_partition_pruned_index(spark):
    """ss21: the stored IVF index is a cell-partitioned parquet table and
    the serve join prunes it via DYNAMIC PARTITION PRUNING — the probe
    list becomes a partition filter, so only the probed cells' files are
    read (the 100 TB mechanism: N_PROBE/N_CENTROIDS of the index per
    query batch, never the corpus)."""
    from hive_lineage_spark.operators import similarity as SS

    df = SS.ss21_ann_ivf_partitioned(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower(), plan
    assert "ivf_index_embeddings_c" in plan, plan  # the stored, fingerprint-tagged index
    # results are bit-identical to the inline ss02 computation
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, SS.ss02_ann_ivf(spark, SF).collect()))
    assert got == want


def test_ss21_algo_version_invalidates_stored_index(spark, monkeypatch):
    """Stale-tag simulation: the stored index's cache tag must include
    the assignment-algorithm version, so a code change (simulated by
    bumping _IVF_INDEX_ALGO_V) BUILDS A NEW INDEX instead of silently
    serving stale cell assignments from the existing .scratch dir —
    the (mtime, size) fingerprint only tracks the data."""
    import os
    import shutil

    from hive_lineage_spark.operators import similarity as SS
    from hive_lineage_spark.sources.registry import scratch_key

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = os.path.join(repo, ".scratch", scratch_key(SF))
    SS._ivf_index_stored(spark, SF).count()  # current-version index exists
    monkeypatch.setattr(SS, "_IVF_INDEX_ALGO_V", 999)
    v999 = [d for d in os.listdir(scratch) if d.startswith("ivf_index_") and d.endswith("_v999")]
    assert not v999  # nothing stale can satisfy the bumped version
    try:
        SS._ivf_index_stored(spark, SF).count()
        v999 = [d for d in os.listdir(scratch) if d.startswith("ivf_index_") and d.endswith("_v999")]
        assert len(v999) == 1, v999  # the bump forced a fresh build
    finally:
        for d in v999:
            shutil.rmtree(os.path.join(scratch, d), ignore_errors=True)


def test_ss23_incremental_index_equals_rebuild(spark):
    """The maintained index contents — (base ∖ tombstones) ∪ delta —
    must equal a batch rebuild of the final snapshot, vector for
    vector. Cell assignment is per-vector independent under the frozen
    quantizer, so the FULL stored index restricted to the snapshot IS
    that rebuild; any drift here (a delta assigned against different
    centroids, a tombstone leak) breaks the equality."""
    from pyspark.sql import functions as F

    from hive_lineage_spark.operators import similarity as SS

    late = F.pmod(F.col("vec_id"), F.lit(SS.SS23_LATE_MOD)) == SS.SS23_LATE_REM
    dropped = (~late) & (F.pmod(F.col("vec_id"), F.lit(SS.SS23_DEL_MOD)) == SS.SS23_DEL_REM)
    base = SS._ivf_index_stored(spark, SF, variant="base", pred=~late)
    delta = SS._ivf_index_stored(spark, SF, variant="delta", pred=late)
    maintained = (
        base.filter(~dropped).select("vec_id", "cell")
        .unionByName(delta.select("vec_id", "cell"))
    )
    rebuild = SS._ivf_index_stored(spark, SF).filter(~dropped).select("vec_id", "cell")
    got = sorted(map(tuple, maintained.collect()))
    want = sorted(map(tuple, rebuild.collect()))
    assert got == want and got
    # the tombstones actually retired something
    assert len(got) < SS._ivf_index_stored(spark, SF).count()


def test_ss23_serves_both_indexes_partition_pruned(spark):
    """ss23's serve plan must dynamic-partition-prune BOTH stored
    indexes (base + delta) — the probe list becomes a partition filter
    on each scan, so a query batch reads N_PROBE cells of each, never
    either corpus."""
    from hive_lineage_spark.operators import similarity as SS

    df = SS.ss23_ann_ivf_incremental(spark, SF)
    df.collect()
    plan = _plan(df)
    assert plan.lower().count("dynamicpruning") >= 2, plan
    read = set(df.inputFiles())
    assert any("_base_v" in p for p in read), read
    assert any("_delta_v" in p for p in read), read
    # both variant-tagged index scans resolve to the source table —
    # the maintained index is fully lineage'd, like ss21's
    from hive_lineage_spark.hook import LineageTracker

    ql = LineageTracker().track(df, name="ss23")
    assert ql.result.input_tables == ["embeddings"], ql.result.input_tables
    assert ql.column_map()["neighbor_id"] == {("embeddings", "vec_id")}


def test_ss21_lineage_resolves_index_to_embeddings(spark):
    """The served index scan must NOT dead-end lineage at the anonymous
    .scratch ivf_index_* directory: default_table_resolver maps it back
    to `embeddings` (the index is a derived copy of that table), so
    ss21's input tables and column lineage link the serve path to the
    source corpus — a lineage framework's flagship op must itself be
    fully lineage'd."""
    from hive_lineage_spark.hook import LineageTracker, default_table_resolver
    from hive_lineage_spark.operators import similarity as SS

    df = SS.ss21_ann_ivf_partitioned(spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name="ss21")
    assert ql.result.input_tables == ["embeddings"], ql.result.input_tables
    # neighbor ids come from the index side; the resolver ties them to
    # the embeddings table, not a scratch directory
    assert ql.column_map()["neighbor_id"] == {("embeddings", "vec_id")}
    # the resolver rule itself: the SOURCE TABLE is parsed out of the
    # tag (an index built from another table must resolve to THAT table,
    # never blanket-attributed to embeddings), and non-scratch paths
    # never match
    assert default_table_resolver("/r/.scratch/sf0.001/ivf_index_embeddings_c8_m1_s2_v1") == "embeddings"
    assert default_table_resolver("/r/.scratch/sf0.001/ivf_index_documents_c8_m1_s2_v1") == "documents"
    # ss23's slice variants carry a tag segment between _s and _v —
    # their served scans must resolve to the source table too
    assert default_table_resolver("/r/.scratch/sf0.001/ivf_index_embeddings_c8_m1_s2_base_v1") == "embeddings"
    assert default_table_resolver("/r/.scratch/sf0.001/ivf_index_embeddings_c8_m1_s2_delta_v1") == "embeddings"
    assert default_table_resolver("/r/x/sf1/ivf_index_embeddings_c8_m1_s2_v1") is None  # not scratch


def test_fanout_floor_caps_width_on_tiny_inputs(spark, monkeypatch):
    """r17 fan-out width floor (guide §2.5): the post-scan repartition is
    capped at one partition per SPARK_GRAFT_FANOUT_FLOOR input bytes, so
    a KB-scale table never pays a full-core-count exchange. documents at
    sf0.001 (~64 KB) caps at 2 partitions under the 32 KB default floor;
    customer (~7 KB) caps at 1 = what split packing already yields, so
    the exchange is skipped entirely; floor=0 restores the uncapped
    core-count fan-out."""
    from hive_lineage_spark.sources.registry import load_table

    monkeypatch.setenv("SPARK_GRAFT_FANOUT", "1")
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_FLOOR", str(32 * 1024))
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, SF, "documents", fan_out=True)
    assert docs.rdd.getNumPartitions() == 2
    cust = load_table(spark, SF, "customer", fan_out=True)
    assert "Exchange" not in _plan(cust.select("c_custkey"))
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_FLOOR", "0")
    docs0 = load_table(spark, SF, "documents", fan_out=True)
    assert docs0.rdd.getNumPartitions() == par


def test_bpe_stage_plans_stay_truncated(spark):
    """tx15/tx19/tp16 (r16 checkpoint discipline, pinned r17): the BPE
    merge stages materialize through lineage-tracked checkpoints, so no
    consumer ever re-analyzes the recursively-doubled merge tree (the
    pre-r16 pathology was a 122,424-line explain). Analyzed-plan sizes
    sit at ~1-6 KB today; the bounds allow ~10x growth before failing."""
    from hive_lineage_spark.operators import pipeline as pl
    from hive_lineage_spark.operators import text as tx
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    clear_postings_cache()
    for name, fn, bound in (
        ("tx15", tx.tx15_bpe_train, 60_000),
        ("tx19", tx.tx19_bpe_apply, 20_000),
        ("tp16", pl.tp16_token_exact_packing, 30_000),
    ):
        df = fn(spark, SF)
        df.collect()
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert len(analyzed) < bound, (
            f"{name} analyzed plan regrew: {len(analyzed)} chars (bound {bound})"
        )
    clear_postings_cache()


def test_events_bucketed_layout_drops_window_shuffle(spark):
    """r17 events layout (guide §2.4's bucketed-table rule): events
    serves from the user_id-CLUSTERED scratch copy, so q25's per-user
    window rides the bucket partitioning — ZERO shuffle exchanges in
    the executed plan (an in-partition sort only) — and q43's
    (user, bucket) self-join is bucket-local (its single remaining
    exchange belongs to the output distinct)."""
    from hive_lineage_spark.operators.relational import q25_sessionization
    from hive_lineage_spark.operators.sql_extra import q43_range_join_bucketized

    df = q25_sessionization(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    plan = _plan(df)
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    df43 = q43_range_join_bucketized(spark, SF)
    df43.write.format("noop").mode("overwrite").save()
    p43 = _plan(df43)
    assert p43.count("Exchange hashpartitioning") <= 1, p43


def test_events_bucketed_rows_identical_to_flat(spark):
    """The bucketed scratch layout is the SAME table: row-for-row equal
    to the flat µs-normalized copy it was built from (sorted collect —
    sf0.001 is 1,000 rows)."""
    from hive_lineage_spark.sources import registry

    flat = spark.read.parquet(registry._events_us(spark, SF))
    bkt = registry.load_events(spark, SF)
    assert bkt.schema == flat.schema
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, bkt.collect())) == sorted(map(key, flat.collect()))
