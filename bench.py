"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

STDOUT LINE BUDGET (round-8 contract): the driver captures only the
LAST 2,000 characters of stdout, so the JSON line must stay comfortably
under that or the head truncates and the parse fails (this silently
broke BENCH_r07). The stdout line therefore carries ONLY
metric/value/unit/queries/sf/runs_per_query/detail (per-query values at
2 dp); the full payload — spread, cold, extra, skew — goes to the
sidecar file named by "detail" (BENCH_LOCAL.json next to this script).
tests/test_bench_contract.py pins the serialized line < 1,800 chars.

Each query executes via a noop-format write so timing covers the full
distributed plan without driver-side collection costs (the realistic
sink shape at scale).

Each query runs $SPARK_GRAFT_BENCH_N times (default 5); the reported
per-query number is the MEDIAN and "value" is the sum of medians —
single runs on a shared box carry ±15% noise (BASELINE.md), which has
masqueraded as regressions in past rounds. "spread" carries per-query
[min, max] so noise stays visible, and "cold" carries each query's
FIRST-run time in this session: for cache-bearing queries (dd02/dd03/
dd05 persisted postings/signature indexes) the median is a warm-cache
number that excludes the one-time index build, so the cold column is
the honest apples-to-apples figure against single-run baselines.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q04_filter_predicates",   # pushed-down scan filter
    "q14_agg_tpch_q1",         # multi-agg group-by (TPC-H Q1 shape)
    "q06_join_4way",           # 4-way join chain + agg
    "q17_q27_shape",           # flagship: 4-dim star join + 4 avgs + top-100
    "q16_topk",                # TakeOrderedAndProject
    "q24_window_bucket_agg",   # time-bucket agg over events
    "q25_sessionization",      # window functions
    "dd02_ngram_jaccard",      # shingle inverted-index join
    "dd03_minhash_lsh",        # minhash signatures + band join + verify
    "dd05_simhash_pairs",      # simhash + banded hamming join
    "dd06_embed_cosine_dup",   # tiled BLAS matrix product
    "ss01_ann_bruteforce",     # cosine top-k
    "ss02_ann_ivf",            # pruned (IVF) top-k
    "tx03_quality_score",      # regex/array codegen pipeline
    "mm01_decode_stub",        # Arrow mapInPandas path
    # Promoted from EXTRA in round 7 (judge ask: heavies must be in the
    # tracked round-over-round set). Reference medians from BENCH_r06:
    # tx12 5.47, dd12 3.17, dd13 0.96, ss07 1.25. Cross-round totals are
    # comparable from r7 onward; vs r5/r6 compare per-query medians.
    "tx12_dup_span_profile",   # 3-width sliding gram passes
    "dd12_semdedup",           # within-cell semantic pairs (HOF cosine)
    "dd13_semdedup_arrow",     # same, blocked-dgemm kernel per cell
    "ss07_ann_ivf_trained",    # trained-quantizer IVF probe
    "mm05_decode_image",       # real BMP/PPM decode (mapInPandas)
]

# Newer/secondary ops, timed separately (median of 3) so new-op perf is
# visible without growing the headline total every round.
EXTRA = [
    "tx11_span_dedup",         # C4 span dedup (WindowGroupLimit)
    "ss06_kmeans",             # 2 Lloyd rounds + assignment
    "tp09_epoch_upsample",     # histogram bin + epoch explode
    "tp10_three_way_split",    # hash split + checksum agg
    "mm06_decode_resize",      # real decode→resize chain (round 7)
    "dq03_snapshot_drift",     # two-snapshot profile drift (round 7)
    "mm07_decode_audio",       # real WAV decode (round 7)
    "mm08_video_frame_index",  # real AVI container walk (round 7)
    "ss08_ann_pq",             # PQ/ADC scoring (round 7)
    "tx13_unigram_logprob",    # unigram cross-entropy scoring (round 7)
    "tx14_gopher_gate",        # Gopher-rules quality gate (round 7)
    "tp11_chunk_overlap",      # sliding-window chunking (round 7)
    "ss09_ann_recall",         # recall@K of IVF/PQ vs exact (round 7)
    "mm09_pair_curation",      # CLIP-score image-text gate (round 8)
    "mm10_video_frame_pixels", # AVI -> JPEG decode -> pixel stats (round 8)
    "tx15_bpe_train",          # BPE merge learning from word freqs (round 8)
    "tx16_bigram_xent",        # bigram-LM cross-entropy scoring (round 8)
    "ss12_ann_hamming",        # SimHash Hamming ANN, banded (round 8)
    "ss13_ann_ivfpq",          # IVF+PQ composed ANN (round 8)
    "mm11_audio_features",     # windowed energy/ZCR on real WAV (round 8)
    "mm12_image_dhash",        # perceptual dHash on decoded pixels (round 8)
    "mm13_video_420_pixels",   # 4:2:0 MJPEG decode end-to-end (round 10)
    "mm14_audio_resample",     # mono downmix + boxcar decimation (round 10)
    "mm15_video_shot_detect",  # consecutive-frame cut detection (round 10)
    "ss14_ann_random_projection",  # JL sign-matrix projected search (round 10)
    "tx17_heldout_xent",       # held-out closed-vocab LM scoring (round 10)
    "tx18_backoff_xent",       # stupid-backoff bigram scoring (round 10)
    "tx19_bpe_apply",          # corpus encode via trained BPE vocab (round 10)
    "dd14_bloom_decontaminate",  # fixed-size bloom membership decon (round 10)
    "ss15_mips_norm_augment",  # MIPS via norm-augmentation reduction (round 10)
    "ss16_mips_ivf",           # IVF-served MIPS, cell-pruned (round 10)
    "ss17_rank_fusion",        # RRF fusion of IVF+LSH retriever legs (round 10)
    "tp12_weighted_sample",    # Efraimidis-Spirakis weighted WOR top-N (round 10)
    "tx20_ccnet_buckets",      # CCNet per-lang perplexity tertiles (round 10)
    "dq05_row_expectations",   # row-level quarantine gate, pure map (round 10)
    "dd15_minhash_calibration",  # MinHash estimate vs exact Jaccard (round 10)
    "mm16_image_entropy",      # byte-histogram entropy image gate (round 10)
    "mm17_image_phash",        # fixed-point DCT perceptual hash (round 10)
    "tx21_kneser_ney_xent",    # interpolated Kneser-Ney held-out scoring (round 10)
    "mm18_audio_vad",          # energy-gate VAD segment extraction (round 10)
    "tp13_range_partition",    # range-partition plan + balance audit (round 10)
    "tp14_budget_waterfill",   # max-min-fair token-budget allocation (round 10)
    "dd16_cdc_chunks",         # content-defined chunking dedup profile (round 10)
    "ss18_ann_matryoshka",     # MRL prefix search + full-dim rerank (round 10)
    "mm19_vit_patches",        # ViT patch grid + per-patch luma stats (round 10)
    "tx22_dsir_logweight",     # DSIR hashed-bigram importance weights (round 10)
    "ss19_ann_filtered",       # pre-filtered IVF search + exact-recall flag (round 10)
    "mm20_audio_spectral",     # fixed-point DFT-bin window powers (round 10)
    "dd17_cluster_keep_best",  # cluster canonical-representative dedup apply (round 10)
    "dq06_freshness_sla",      # per-type freshness/SLA gate vs watermark (round 10)
    "dd18_longest_dup_span",   # per-doc longest duplicated span (round 11)
    "tp15_doremi_reweight",    # DoReMi mixture reweighting step (round 11)
    "mm21_phash_search",       # query-by-image pHash Hamming top-K (round 11)
    "mm22_audio_quality",      # audio clip quality gate (round 11)
    "dq07_referential_integrity",  # FK orphan/coverage gate (round 11)
    "ss20_ann_binary",         # sign-bit BQ + Hamming coarse + exact rerank (round 11)
    "dq08_psi_drift",          # PSI distribution-shift gate (round 11)
    "dd19_containment",        # asymmetric containment dedup (round 11)
    "dd20_graph_rank",         # quality-personalized PageRank over dup graph (round 11)
    "web01_url_parse",         # URL synth+parse, registrable domain (round 12)
    "web02_host_dup_rate",     # per-host exact-dup mirror detector (round 12)
    "web03_url_blocklist",     # URL-pattern blocklist gate (round 12)
    "sk01_hll_distinct",       # HLL shingle cardinality per lang (round 12)
    "sk02_countmin_topk",      # Count-Min heavy-hitter estimates (round 12)
    "sk03_hll_source_overlap", # merged-HLL pairwise source overlap (round 12)
    "dq09_quantile_profile",   # exact-quantile grid + Tukey fence gate (round 12)
    "sk04_hll_precision_ladder",  # HLL m=64/256/1024 calibration (round 12)
    "sk05_source_intake_report",  # per-source intake QA verdict (round 12)
    "web04_html_extract",      # HTML->text extraction metrics, zero-exchange (round 13)
    "tp16_token_exact_packing",  # BPE-token-exact sequence packing (round 14)
    "web07_robots_compliance_gate",  # robots/licence/opt-out gate, zero-exchange (round 14)
    "dd21_exact_dup_spans",    # exact maximal cross-doc spans via aligned runs (round 14)
    "ss22_ann_ivfpq_residual",  # residual-encoded IVFPQ (FAISS by_residual) (round 14)
    "tp17_no_split_packing",   # no-split next-fit packing (applyInPandas) (round 14)
    "mm23_video_near_dup",     # cross-video pHash near-dup, banded Hamming (round 14)
    "web08_politeness_schedule",  # per-host crawl-delay frontier schedule (round 14)
    "web05_boilerplate_gate",  # jusText block gate inside HOFs, zero-exchange (round 13)
    "tx23_fasttext_gate",      # fastText-shape linear quality classifier (round 13)
    "web06_url_canonical_dedup",  # canonical-URL variant dedup, hash-keyed (round 13)
    "ss21_ann_ivf_partitioned",  # stored-index IVF serving, DPP-pruned scan (round 13)
    "web09_warc_extract",      # WARC record walk -> extraction metrics (round 15)
    "web10_frontier_cap",      # capped politeness schedule, WindowGroupLimit (round 15)
    "ss23_ann_ivf_incremental",  # base+delta stored-index serving, tombstones (round 15)
    "tx24_unigram_lm_train",   # unigram-LM hard-EM trainer (HOF Viterbi) (round 15)
    "tx25_unigram_encode",     # corpus encode under the unigram vocab (round 15)
    "web11_frontier_refresh",  # freshness-class refetch gate, zero-exchange (round 15)
    "tx26_langid_gate",        # trained K-class NB language-ID gate (round 16)
]


def machine_load_evidence() -> dict:
    """Box-load evidence so a driver-band miss can self-adjudicate
    (r8<->r9 A/A: identical code produced 24.31 s then 23.56 s with
    +-30-50% per-query swings — pure environment noise the record could
    not distinguish from regression). Two signals: the 1/5/15-min
    loadavg, and a fixed-work single-thread spin calibration — on an
    idle core the loop takes a stable ~wall time; CPU contention
    inflates it roughly in proportion to oversubscription. The spin is
    the MIN of 3 short bursts — a single long spin is itself subject to
    the scheduler jitter it is trying to measure; the min of several
    short ones recovers the uncontended per-iteration cost."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(700_000):
            acc = (acc * 1103515245 + i) & 0xFFFFFFFF
        best = min(best, time.perf_counter() - t0)
    spin_ms = round(best * 1000.0 * (2_000_000 / 700_000), 1)
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    return {"load": load, "spin_ms": spin_ms, "cpus": os.cpu_count()}


def execute(df) -> int:
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:  # noqa: BLE001 — fall back if noop sink unavailable
        return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or "0.1"
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "5")))

    from hive_lineage_spark.session import get_spark

    import __spark_entry__ as entrymod

    env_start = machine_load_evidence()

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the events µs-normalized scratch copy outside timed sections
    from hive_lineage_spark.sources.registry import load_events

    load_events(spark, sf_dir)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        runs: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            execute(qs[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
        cold[name] = round(runs[0], 3)

    extra: dict[str, float] = {}
    extra_cold: dict[str, float] = {}
    for name in EXTRA:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            execute(qs[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        extra[name] = round(statistics.median(runs), 3)
        # cache-bearing ops (ss08 serves a slice of the persisted ADC
        # frame; ss09 persists its baseline) are near-free warm — the
        # first-run column keeps the honest uncached cost visible
        extra_cold[name] = round(runs[0], 3)

    # hot-key wall time: q25/q27 on the 20k-event/2k-order hot-user
    # fixture (tools/skewfix.py) — a skew regression (e.g. the as-of
    # join reverting to a pair-inflating plan) shows up here long
    # before it would at uniform sf0.1.
    from tools.skewfix import skew_dir

    # evidence=False production twins (operators/evidence.py): same op
    # minus the exact oracle-evidence leg — the corpus-keyed exchange a
    # deployment drops. Timed next to the registry (evidence-on) rows so
    # the drop is a recorded number, not a docstring claim.
    from hive_lineage_spark.operators import sketches as _sk
    from hive_lineage_spark.operators import similarity as _ss
    from hive_lineage_spark.operators.dedup import clear_postings_cache

    # drop the registry runs' persisted frames first: the evidence-off
    # cold number must include its own (smaller) build work, not ride a
    # warm cache the evidence-on run paid for
    clear_postings_cache()
    for name, fn in (
        ("sk03_hll_source_overlap[ev=off]",
         lambda s, d: _sk.sk03_hll_source_overlap(s, d, evidence=False)),
        ("sk04_hll_precision_ladder[ev=off]",
         lambda s, d: _sk.sk04_hll_precision_ladder(s, d, evidence=False)),
        ("ss20_ann_binary[ev=off]",
         lambda s, d: _ss.ss20_ann_binary(s, d, evidence=False)),
        # round-14 (r13-VERDICT item 6): the remaining flagged ops, so
        # every droppable evidence leg has a measured cost
        ("sk01_hll_distinct[ev=off]",
         lambda s, d: _sk.sk01_hll_distinct(s, d, evidence=False)),
        ("sk02_countmin_topk[ev=off]",
         # production mode REQUIRES a caller watchlist (the exact
         # candidate agg is the evidence leg); a fixed 4-word probe
         # keeps the timed work the sketch build, as deployed
         lambda s, d: _sk.sk02_countmin_topk(
             s, d, evidence=False,
             watchlist=["the", "data", "spark", "zz-not-in-corpus"])),
        ("ss19_ann_filtered[ev=off]",
         lambda s, d: _ss.ss19_ann_filtered(s, d, evidence=False)),
    ):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            execute(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        extra[name] = round(statistics.median(runs), 3)
        extra_cold[name] = round(runs[0], 3)

    skew = skew_dir()
    for name in ("q25_sessionization", "q27_asof_join"):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            execute(qs[name](spark, skew))
            runs.append(time.perf_counter() - t0)
        extra[f"skew_{name}"] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    line, sidecar = build_payloads(
        timings, total, sf, n_runs, spread, cold, extra, env_start
    )
    sidecar["extra_cold"] = extra_cold
    sidecar["env_end"] = machine_load_evidence()
    sidecar_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    with open(sidecar_path, "w") as fh:
        json.dump(sidecar, fh, indent=1)
    print(json.dumps(line))
    spark.stop()


def build_payloads(
    timings: dict[str, float],
    total: float,
    sf: str,
    n_runs: int,
    spread: dict[str, list[float]],
    cold: dict[str, float],
    extra: dict[str, float],
    env: dict | None = None,
) -> tuple[dict, dict]:
    """Split the bench result into the compact stdout line (must stay
    under the driver's 2,000-char tail capture — see module docstring)
    and the full sidecar payload. Pure so the line-length contract is
    unit-testable without a Spark run. ``env`` is the bench-start
    machine_load_evidence() snapshot; it rides the stdout line so the
    recorded BENCH_r{N}.json carries proof of box state."""
    line = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": float(sf),
        "runs_per_query": n_runs,
        "env": env,
        "detail": "BENCH_LOCAL.json",
    }
    sidecar = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "runs_per_query": n_runs,
        "env": env,
        "spread": spread,
        "cold": cold,
        "extra": extra,
    }
    return line, sidecar


if __name__ == "__main__":
    main()
