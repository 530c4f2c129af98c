"""Empirical scaling probe: time selected queries at two scale factors
and report the measured ratio next to the operator's expected complexity
— the evidence behind SCALE.md's "would this survive 100×?" table.

Usage: python tools/scaling_probe.py [sf_small] [sf_big]
(defaults /root/testdata/sf0.01 → /root/testdata/sf0.1, 10× rows).

Warm-path medians (n=3 after one warmup run): session-persisted indexes
are cleared between scale factors so each sf pays its own index build in
the warmup, not in the timed runs.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, expected scaling at 10× rows)
PROBE = [
    ("q04_filter_predicates", "linear scan"),
    ("q17_q27_shape", "linear fact scan, dims broadcast"),
    ("dd02_ngram_jaccard", "~linear postings + prefix-filtered pairs"),
    ("dd03_minhash_lsh", "linear signatures, banded pairs"),
    ("dd06_embed_cosine_dup", "QUADRATIC pair space (100×) via dgemm tiles"),
    ("ss02_ann_ivf", "linear assignment map + pruned probe"),
    ("ss05_ann_bruteforce_arrow", "linear corpus blocks × fixed queries"),
    ("tx09_repetition", "linear gram multiset"),
    ("tp05_stratified_sample_hc", "linear two-phase rank"),
    ("tp06_curriculum_bins", "linear histogram, bounded grid"),
    ("tx11_span_dedup", "linear span rows; WindowGroupLimit sheds repeats map-side"),
    ("tx10_tfidf_terms", "linear tf; vocabulary-sized df"),
    ("tx12_dup_span_profile", "3 linear gram passes; hash-to-hash joins"),
    ("ss06_kmeans", "linear per round: broadcast assign + C*dim update agg"),
    ("dd12_semdedup", "pair space bounded to within-cell; one cell shuffle"),
    ("ss08_ann_pq", "linear encode + ADC scan (fixed queries); codes-only corpus artifact"),
    ("tx13_unigram_logprob", "linear tf pass; vocabulary-sized unigram join"),
    ("mm06_decode_resize", "linear single Python stage (per-image constant work)"),
    ("mm07_decode_audio", "linear single Python stage"),
    ("dq03_snapshot_drift", "two linear profile passes, 1-row exchanges"),
    ("ss18_ann_matryoshka", "linear coarse pass on 8-dim prefixes; rerank bounded to C*queries"),
    ("ss19_ann_filtered", "linear pre-filtered index scan; candidates shrink with selectivity"),
    ("dd16_cdc_chunks", "linear rolling-hash pass; chunk-hash joins only"),
    ("tp13_range_partition", "linear assignment map; rank window over the 1-in-20 sample"),
    ("dd18_longest_dup_span", "linear gram-index consumer; dup filter before the doc join"),
    ("tp15_doremi_reweight", "linear tf pass; everything after domain-sized"),
    ("mm21_phash_search", "linear decode once + corpus x 8 broadcast distance scan"),
    ("mm22_audio_quality", "linear single Python stage"),
    ("dq07_referential_integrity", "per FK linear key scan + anti join"),
    ("ss20_ann_binary", "linear code scan x fixed queries; rerank candidate-bounded"),
    ("dq08_psi_drift", "two linear partial-agg passes; bins fixed"),
    ("dd19_containment", "prefix-bounded candidates; rare grams only probe"),
    ("sk01_hll_distinct", "linear shingle scan; post-scan frames register-sized (langs x 256)"),
    ("sk02_countmin_topk", "linear token scan; counters capped at 4x512 cells"),
    ("sk03_hll_source_overlap", "linear scan into sketches; pair stage register-sized (exact evidence leg ~quadratic in overlap)"),
    ("dq09_quantile_profile", "one exact-percentile agg (sort-based; approx_percentile at scale) + one broadcast fence-count pass"),
    ("sk04_hll_precision_ladder", "ONE shared register agg pass + register-sized rung re-aggs + one exact baseline"),
    ("sk05_source_intake_report", "one hash pass + shared gram frame + register folds; rollups source-count-sized"),
    ("web04_html_extract", "linear codegen string map fused into the scan; zero exchanges"),
    ("web05_boilerplate_gate", "linear block HOF pipeline inside each row; zero exchanges"),
    ("tx23_fasttext_gate", "linear bigram pass; B-row broadcast weight table; one doc-keyed score agg"),
    ("web06_url_canonical_dedup", "linear canonicalization map; hash-keyed group agg + join back"),
    ("ss21_ann_ivf_partitioned", "DPP-pruned index scan: N_PROBE/N_CENTROIDS of the stored index per batch"),
    ("tp16_token_exact_packing", "linear encode join (vocab broadcast) + per-shard cumsum window"),
    ("web07_robots_compliance_gate", "linear codegen gate fused into the scan; zero exchanges"),
    ("dd21_exact_dup_spans", "one tokenize pass; pair stream ~ true duplicated-text volume (df_cap escape hatch)"),
    ("ss22_ann_ivfpq_residual", "linear encode pass (persisted) + pruned ADC scan; probe tables query-sized"),
    ("tp17_no_split_packing", "one shard exchange + linear per-shard Arrow pass"),
    ("mm23_video_near_dup", "linear decode+hash pass; banded candidates ~ true near-dup volume"),
    ("web08_politeness_schedule", "linear codegen gate+map; only the allowed frontier enters the host-keyed rank window"),
    ("web09_warc_extract", "linear container walk (one Arrow pass per file) + codegen extraction"),
    ("web10_frontier_cap", "web08's gate+map; WindowGroupLimit sheds past rank H map-side"),
    ("ss23_ann_ivf_incremental", "probe-pruned reads of base+delta indexes; index builds amortized"),
    ("tx24_unigram_lm_train", "one corpus word agg; EM rounds vocab-sized (fixed here)"),
    ("tx25_unigram_encode", "linear word stream + broadcast vocab join + doc agg"),
    ("web11_frontier_refresh", "linear codegen gate+policy map; zero exchanges"),
    ("tx26_langid_gate", "one (doc,feature) pre-agg exchange; broadcast NB model; K-row/doc window"),
]


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])  # optional query-name filter
    probe = [(n, e) for n, e in PROBE if not only or n in only]

    import __spark_entry__ as entrymod
    from hive_lineage_spark.operators.dedup import clear_postings_cache
    from hive_lineage_spark.session import get_spark

    spark = get_spark("scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(sf_dir: str) -> dict[str, float]:
        clear_postings_cache()
        out = {}
        for name, _ in probe:
            fn = qs[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            out[name] = statistics.median(runs)
        return out

    a, b = run(small), run(big)
    print(f"| query | {os.path.basename(small)} s | {os.path.basename(big)} s | ratio | expected |")
    print("|---|---|---|---|---|")
    for name, expect in probe:
        print(f"| {name} | {a[name]:.3f} | {b[name]:.3f} | {b[name] / a[name]:.1f}× | {expect} |")
    spark.stop()


if __name__ == "__main__":
    main()
