"""End-to-end training-data pipeline operators: applying dedup decisions,
clustering duplicates, deterministic sampling, and source mixing — the
"what do I actually run over the corpus" layer on top of the sketch
operators in ``dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import MOD, poly_hash, poly_hash_sql
from ..sources.registry import load_table
from .text import QUALITY_SQL
from .dedup import dd02_pairs_cached


def dd07_near_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply near-dedup to the corpus: drop every document that appears as
    the higher-id member of a ≥0.5-Jaccard pair (keep-first-occurrence
    policy — deterministic, order-free). Returns the retained corpus
    stats per source. The drop list is corpus-proportional at web scale
    (20-50% of doc ids is normal), so no broadcast hint: AQE picks
    broadcast vs shuffle anti-join from the runtime size of the pair
    side, which stays safe when the list outgrows executor memory."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd02_pairs_cached(spark, sf_dir).select(F.col("id_b").alias("doc_id")).distinct()
    kept = d.join(pairs, "doc_id", "left_anti")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


DD07_SQL = None  # filled below (needs the dd02 pair SQL)


def connected_components(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """Connected components over an undirected edge list ``(id_a, id_b)``
    (both directions present) → ``(node, label)`` where label = the
    minimum node id reachable from ``node``.

    Min-label propagation run to FIXPOINT: each iteration takes the min
    over neighbor labels, then pointer-jumps (label ← label(label)) so
    labels race down already-discovered paths — one-hop propagation alone
    moves a component's minimum a single edge per iteration (a k-node
    chain would need k rounds), while the jump step gives logarithmic
    convergence. Termination is detected by counting changed labels (one
    cheap agg per round on the checkpointed label table), not guessed
    with a fixed round count. Each step checkpoints — iterative
    DataFrame algorithms must truncate lineage or planning cost compounds
    per round — via ``plans.capture.checkpoint_tracked``, which registers
    each pre-checkpoint plan so column lineage still resolves through
    every round to the base tables (dd20's superstep discipline)."""
    from ..plans.capture import checkpoint_tracked

    edges = checkpoint_tracked(edges)
    nodes = edges.select(F.col("id_a").alias("node")).distinct()
    labels = checkpoint_tracked(nodes.withColumn("label", F.col("node")))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.id_b == labels.node)
            .groupBy(F.col("id_a").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neighbor_min, labels.node == F.col("node2"), "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("mid"),
        )
        # pointer jump: every label value is itself a node in the label
        # table, so label(label) is a self-join — path doubling
        jump = labels.select(F.col("node").alias("jnode"), F.col("label").alias("jlabel"))
        new_labels = (
            stepped.join(jump, stepped.mid == jump.jnode, "left")
            .select(
                "node",
                "old_label",
                F.least(F.col("mid"), F.coalesce(F.col("jlabel"), F.col("mid"))).alias("label"),
            )
        )
        new_labels = checkpoint_tracked(new_labels)
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            # fixpoint: label(u) == label(v) across every edge, and labels
            # only ever decrease toward the component min — done
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def _dup_labels_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component labels of the verified near-dup pair graph, persisted
    per (session, sf_dir) like ``dd02_pairs_cached`` one level below:
    the label table is the cluster-decision artifact BOTH dd08 (cluster
    stats) and dd17 (keep-best apply) consume — unshared, each ran the
    full multi-round pointer-jumping fixpoint (~8 checkpointed jobs)
    per execution (r16, guide §2.4)."""
    from .dedup import _persisted

    def build(s: SparkSession, d: str) -> DataFrame:
        pairs = dd02_pairs_cached(s, d).select("id_a", "id_b")
        edges = pairs.union(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        return connected_components(edges)

    return _persisted("dup_cc_labels", spark, sf_dir, build)


def dd08_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the near-dup pair
    graph (``connected_components`` fixpoint propagation), reported as
    per-cluster stats. Deterministic, so the oracle replays it with a
    recursive CTE."""
    labels = _dup_labels_cached(spark, sf_dir)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("node").alias("min_member"),
        F.max("node").alias("max_member"),
    )


def tx05_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling (≈10%): a doc is kept iff
    poly_hash(text) % 100 < 10. Unlike rand()/sampleBy this is stable
    across runs, engines, partitionings and scale — the property a
    reproducible training-data pipeline needs."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("h", poly_hash("text") % 100)
        .filter(F.col("h") < 10)
        .select("doc_id", "source", "lang", "n_chars")
    )


TX05_SQL = f"""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE ({poly_hash_sql('text')}) % 100 < 10
"""


def tx06_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing with per-source caps: top-5 docs per source by
    (quality proxy = n_chars, tie-broken on doc_id) — the 'compose the
    training mix' operator. Window top-k per group keys the shuffle on
    source, so it scales with the number of sources, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "n_chars", "rk")
    )


TX06_SQL = """
    SELECT source, doc_id, n_chars, rk FROM (
        SELECT source, doc_id, n_chars,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rk
        FROM documents
    ) WHERE rk <= 5
"""


# dd07 oracle: retained corpus per source, where dropped = id_b side of the
# exact-Jaccard pair set (same pair SQL as dd02's oracle).
from .dedup import DD02_SQL  # noqa: E402

DD07_SQL = f"""
    WITH pairs AS ({DD02_SQL}),
    dropped AS (SELECT DISTINCT id_b AS doc_id FROM pairs)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY source
"""

# dd08 oracle: the same min-label propagation as a recursive reachability
# closure — label(v) = min(node reachable from v), then cluster stats.
DD08_SQL = f"""
    WITH RECURSIVE pairs AS ({DD02_SQL}),
    edges AS (
        SELECT id_a, id_b FROM pairs
        UNION ALL
        SELECT id_b AS id_a, id_a AS id_b FROM pairs
    ),
    reach(src, dst) AS (
        SELECT id_a AS src, id_a AS dst FROM edges
        UNION
        SELECT r.src, e.id_b AS dst
        FROM reach r JOIN edges e ON r.dst = e.id_a
    ),
    labels AS (SELECT src AS node, min(dst) AS label FROM reach GROUP BY src)
    SELECT label, CAST(count(*) AS BIGINT) AS cluster_size,
           min(node) AS min_member, max(node) AS max_member
    FROM labels GROUP BY label
"""


def tp01_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as one composed dataflow:

        quality filter → near-dedup (keep-first) → deterministic 50%
        content-hash sample → per-source cap (top-8 by length) → stats

    Each stage is an operator proven individually (tx03, dd02, tx05,
    tx06); composing them keeps everything in one Catalyst plan, so
    filters still push down into the scan and the only shuffles are the
    dedup-pair join and the final per-source window. This is the query a
    real corpus build runs nightly."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("double")
    alpha_ratio = F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("double") / n
    quality_ok = d.filter(alpha_ratio >= 0.7)

    # No broadcast hint on the drop list: it is corpus-proportional at
    # web scale, so AQE must be free to fall back to a shuffle anti-join.
    drop = dd02_pairs_cached(spark, sf_dir).select(F.col("id_b").alias("doc_id")).distinct()
    deduped = quality_ok.join(drop, "doc_id", "left_anti")

    sampled = deduped.filter((poly_hash("text") % 100) < 50)

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    capped = sampled.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 8)

    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
    )


TP01_SQL = f"""
    WITH pairs AS ({DD02_SQL}),
    dropped AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
    quality AS (
        SELECT * FROM documents
        WHERE CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE) >= 0.7
    ),
    deduped AS (
        SELECT * FROM quality WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    sampled AS (
        SELECT * FROM deduped WHERE ({poly_hash_sql('text')}) % 100 < 50
    ),
    capped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY source
                                         ORDER BY n_chars DESC, doc_id ASC) AS rk
            FROM sampled
        ) WHERE rk <= 8
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars, min(doc_id) AS min_doc
    FROM capped GROUP BY source
"""


SAMPLE_PER_CLASS = 40


def tp02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced deterministic sampling: EXACTLY K documents per
    language (or all of an underfull class) — the class-rebalancing
    primitive of a training-data mix. Rank rows inside each class by
    md5(doc_id) (a content-free deterministic shuffle both engines
    compute identically) and keep rank ≤ K; unlike
    ``df.sample(fraction)`` the per-class count is exact and
    reproducible under any parallelism.

    SCALE CAVEAT: the per-class window sorts each class within one
    shuffle partition — parallelism is bounded by #classes. Fine for
    language-count-sized strata; for high-cardinality strata use
    ``tp05_stratified_sample_hc`` (identical output, two-phase rank:
    per-(class, hash-bucket) quotas, then a bounded merge-rank of the
    K·buckets survivors)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_PER_CLASS)
        .select("doc_id", "lang", "rk")
    )


TP02_SQL = f"""
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM (
        SELECT doc_id, lang, row_number() OVER (
            PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ) AS rk
        FROM documents
    ) WHERE rk <= {SAMPLE_PER_CLASS}
"""


SAMPLE_BUCKETS = 16


def tp05_stratified_sample_hc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-cardinality-strata variant of tp02: the same exact
    K-per-class sample computed in TWO rank phases so no window ever
    sorts a whole class in one partition.

    Phase 1 ranks inside (class, hash-bucket) — parallelism is
    #classes × SAMPLE_BUCKETS, and each bucket keeps its own top-K:
    a member of the class-global top-K has per-bucket rank ≤ its global
    rank ≤ K, so the survivors are a guaranteed superset of the answer.
    Phase 2 merge-ranks the ≤ K·buckets survivors per class — bounded
    work independent of corpus size, unlike tp02's class-wide sort
    (whose parallelism is capped at #classes and whose per-partition
    sort grows with the class). Output is IDENTICAL to tp02 by
    construction, so it shares tp02's oracle."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    srt = F.md5(F.col("doc_id").cast("string"))
    w1 = Window.partitionBy("lang", "bkt").orderBy("srt", "doc_id")
    survivors = (
        d.select("doc_id", "lang", srt.alias("srt"),
                 F.pmod(F.xxhash64("doc_id"), F.lit(SAMPLE_BUCKETS)).alias("bkt"))
        .withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= SAMPLE_PER_CLASS)
    )
    w2 = Window.partitionBy("lang").orderBy("srt", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= SAMPLE_PER_CLASS)
        .select("doc_id", "lang", "rk")
    )


PACK_BUDGET = 2048  # tokens per packed training sequence
PACK_SHARDS = 8


def tp03_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the last step of a pretraining data pipeline:
    lay documents head-to-tail into fixed token-budget sequences.
    Documents are sharded (doc_id mod S — the unit of parallelism),
    ordered deterministically inside each shard (tokens desc, id), and
    a windowed cumulative sum assigns each doc its sequence number
    ``floor(prev_cumsum / budget)`` and byte-offset within it; a doc
    straddling the boundary records the overflow so a downstream
    splitter can cut it.

    Scale shape: one shuffle on the shard key; the cumsum window runs
    per shard, so parallelism = S (pick S ≈ cluster cores at scale —
    packing is embarrassingly parallel across shards by construction).
    All-integer arithmetic → bit-identical in the DuckDB oracle."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    d = d.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    csum = F.sum("n_tokens").over(w)
    start = (csum - F.col("n_tokens")).cast("long")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / PACK_BUDGET).cast("long").alias("seq_id"),
        F.pmod(start, F.lit(PACK_BUDGET)).cast("long").alias("offset"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.pmod(start, F.lit(PACK_BUDGET)) + F.col("n_tokens") - PACK_BUDGET).cast("long"),
        ).alias("overflow"),
    )


TP03_SQL = f"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(doc_id % {PACK_SHARDS} AS INT) AS shard
        FROM documents
    ), c AS (
        SELECT doc_id, shard, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY n_tokens DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS start
        FROM d
    )
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start / {PACK_BUDGET}) AS BIGINT) AS seq_id,
           CAST(start % {PACK_BUDGET} AS BIGINT) AS offset,
           CAST(greatest(0, start % {PACK_BUDGET} + n_tokens - {PACK_BUDGET}) AS BIGINT) AS overflow
    FROM c
"""


# Target mixture proportions (per mille) — the "data mixing" recipe a
# pretraining corpus is built from. Integers so quota arithmetic is exact.
MIX_WEIGHTS = {"en": 500, "de": 150, "es": 150, "fr": 100, "zh": 100}
MIX_TOTAL = 200  # documents in the mixed sample


def tp04_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling — build a training mix to a recipe:
    each class (language here; source/domain in production) gets
    ``floor(weight‰ · total / 1000)`` slots, filled deterministically
    by md5 rank (same rank construction as tp02, so the mix is
    reproducible under any parallelism). An underfull class yields
    what it has — the shortfall is visible by comparing n_taken to the
    quota rather than silently rebalanced.

    Scale shape: the weight table is a literal (broadcast by
    definition); one exchange on the class key for the rank window;
    integer quotas → bit-identical DuckDB oracle."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        [(k, v) for k, v in sorted(MIX_WEIGHTS.items())], "lang string, w int"
    )
    quota = weights.select(
        "lang", F.floor(F.col("w") * MIX_TOTAL / 1000).cast("long").alias("quota")
    )
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quota), "lang")
        .filter(F.col("rk") <= F.col("quota"))
        .groupBy("lang", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select("lang", "quota", "n_taken", "first_doc", "last_doc")
    )


TP04_SQL = f"""
    WITH weights(lang, w) AS (
        VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(MIX_WEIGHTS.items()))}
    ), quota AS (
        SELECT lang, CAST(floor(w * {MIX_TOTAL} / 1000) AS BIGINT) AS quota FROM weights
    ), ranked AS (
        SELECT doc_id, lang, row_number() OVER (
            PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ) AS rk
        FROM documents
    )
    SELECT r.lang, q.quota,
           CAST(count(*) AS BIGINT) AS n_taken,
           min(r.doc_id) AS first_doc, max(r.doc_id) AS last_doc
    FROM ranked r JOIN quota q ON r.lang = q.lang
    WHERE r.rk <= q.quota
    GROUP BY r.lang, q.quota
"""


N_BINS = 10  # curriculum deciles


def _quality_scored_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, q) — the 4-dp quality score per document,
    persisted once per (session, sf_dir) for the pipeline consumers
    (tp06's histogram binning and tp09's upsampling each re-ran the
    regex/HOF scoring scan per run; tp09 ran it TWICE — the histogram
    branch and the per-doc branch share no exchange). tx03, the
    registered query that ADVERTISES the scoring pass, does not read
    this cache (the tx13/tx20 discipline, r17)."""
    from .dedup import _persisted
    from .text import quality_expr

    return _persisted(
        "quality_scored",
        spark,
        sf_dir,
        lambda s, d: load_table(s, d, "documents").select(
            "doc_id", "n_chars", quality_expr().alias("q")
        ),
    )


def tp06_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: assign every document an exact quality decile
    and report per-bin corpus stats — the sort-by-difficulty step of a
    curriculum-training data build — WITHOUT a global sort.

    The naive plan (``ntile(10) OVER (ORDER BY quality)``) funnels the
    whole corpus through ONE window partition. Instead: the quality
    score is rounded to a bounded 4-dp grid (≤ 10⁴+1 distinct values
    regardless of corpus size — see ``text.quality_expr``), so binning
    is a VALUE-histogram problem: one partial-agg groupBy onto the
    grid, a cumulative window over that tiny table (bounded work, never
    corpus-sized), bin = ceil(N_BINS·cdf) per VALUE, then per-bin
    aggregation. Ties share a value and therefore a bin, so the split
    is deterministic in both engines. Docs with the same rounded score
    land together (value-based deciles, not row-split — the honest
    semantics when the score grid is coarse)."""
    from pyspark.sql import Window

    d = _quality_scored_cached(spark, sf_dir)
    hist = d.groupBy("q").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n_chars").alias("ch"),
    )
    total = hist.groupBy().agg(F.sum("c").alias("total"))
    # single-partition window is fine HERE: the histogram is grid-bounded
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    binned = (
        hist.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("c").over(w))
        .withColumn(
            "bin",
            F.ceil(F.lit(N_BINS) * F.col("cum") / F.col("total")).cast("bigint"),
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("c").alias("n_docs"),
            F.min("q").alias("q_min"),
            F.max("q").alias("q_max"),
            F.sum("ch").alias("total_chars"),
        )
        .select("bin", "n_docs", "q_min", "q_max", "total_chars")
    )


TP06_SQL = f"""
    WITH s AS (
        SELECT doc_id, n_chars, {QUALITY_SQL} AS q
        FROM documents
    ),
    hist AS (
        SELECT q, CAST(count(*) AS BIGINT) AS c, CAST(sum(n_chars) AS BIGINT) AS ch
        FROM s GROUP BY q
    ),
    binned AS (
        SELECT q, c, ch,
               CAST(ceil({N_BINS} * (sum(c) OVER (ORDER BY q
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                         * 1.0 / (SELECT sum(c) FROM hist)) AS BIGINT) AS bin
        FROM hist
    )
    SELECT bin, CAST(sum(c) AS BIGINT) AS n_docs,
           min(q) AS q_min, max(q) AS q_max,
           CAST(sum(ch) AS BIGINT) AS total_chars
    FROM binned GROUP BY bin
"""


def tp09_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-tiered epoch upsampling — the data-mix rule that trains
    multiple epochs over the highest-quality tier and one epoch over the
    rest (the Llama-style "books get N passes, web gets 1" recipe), made
    deterministic: each doc's quality decile comes from tp06's
    value-histogram binning (no global sort), and the epoch count is a
    pure function of the bin (3 passes for deciles 9–10, 2 for 7–8,
    1 otherwise). The doc explodes into its epoch copies — the manifest
    a training reader consumes.

    Scale shape: the value→bin map is grid-bounded (≤ 10⁴+1 rows at ANY
    corpus size, cf. tp06), so the per-doc bin lookup is a broadcast
    join, and the explode is a map-side sequence — zero corpus-sized
    exchanges in the whole operator."""
    from pyspark.sql import Window

    d = _quality_scored_cached(spark, sf_dir).select("doc_id", "q")
    hist = d.groupBy("q").agg(F.count(F.lit(1)).alias("c"))
    total = hist.groupBy().agg(F.sum("c").alias("total"))
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    bins = (
        hist.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("c").over(w))
        .select(
            "q",
            F.ceil(F.lit(N_BINS) * F.col("cum") / F.col("total")).cast("bigint").alias("bin"),
        )
    )
    per_doc = d.join(F.broadcast(bins), "q")
    epochs = (
        F.lit(1)
        + (F.col("bin") > 6).cast("int")
        + (F.col("bin") > 8).cast("int")
    ).cast("bigint")
    return per_doc.select(
        "doc_id",
        "bin",
        epochs.alias("epochs"),
        F.explode(F.sequence(F.lit(1).cast("bigint"), epochs)).alias("epoch_no"),
    )


_TP09_Q_SQL = f"""
        SELECT doc_id, {QUALITY_SQL} AS q
        FROM documents
"""

TP09_SQL = f"""
    WITH s AS ({_TP09_Q_SQL}),
    hist AS (SELECT q, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY q),
    bins AS (
        SELECT q,
               CAST(ceil({N_BINS} * (sum(c) OVER (ORDER BY q
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                         * 1.0 / (SELECT sum(c) FROM hist)) AS BIGINT) AS bin
        FROM hist
    ),
    per_doc AS (
        SELECT s.doc_id, bins.bin,
               CAST(1 + CASE WHEN bins.bin > 6 THEN 1 ELSE 0 END
                      + CASE WHEN bins.bin > 8 THEN 1 ELSE 0 END AS BIGINT) AS epochs
        FROM s JOIN bins USING (q)
    )
    SELECT doc_id, bin, epochs, CAST(i AS BIGINT) AS epoch_no
    FROM per_doc, UNNEST(range(1, epochs + 1)) t(i)
"""


SPLIT_SALT = "split0"
SPLIT_BOUNDS = (900, 950)  # ‰ boundaries: train < 900 ≤ val < 950 ≤ test


def tp10_three_way_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split — the assignment every corpus
    needs exactly once, done the reproducible way: the doc's salted md5
    picks its bucket in ‰ (train 90% / val 5% / test 5%), so membership
    is stable across runs, engines, partitionings and corpus growth
    (new docs never move old ones — rand()-based splits reshuffle
    everything on every change). Output is per-split stats with a
    bit_xor membership checksum: two engines (or two runs) agreeing on
    (n_docs, xor of ids) agree on the exact member SET, not just sizes.

    The two-hex-char hash (cf. tp07) mod 1000 carries a <2% modulo
    bias across buckets — irrelevant for split QUALITY (boundaries are
    conventions, membership determinism is the contract) and noted so
    nobody mistakes the ‰ bounds for exact percentages."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(SPLIT_SALT), F.lit(":"), F.col("doc_id").cast("string")))
    h = F.pmod(
        F.ascii(F.substring(key, 1, 1)) * 256 + F.ascii(F.substring(key, 2, 1)),
        F.lit(1000),
    )
    lo, hi = SPLIT_BOUNDS
    split = (
        F.when(h < lo, F.lit("train")).when(h < hi, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("bit_xor(doc_id)").alias("xor_ids"),
        )
    )


TP10_SQL = f"""
    WITH s AS (
        SELECT doc_id, n_chars,
               (ascii(substr(md5('{SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 1)) * 256
                + ascii(substr(md5('{SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 2, 1))) % 1000 AS h
        FROM documents
    )
    SELECT CASE WHEN h < {SPLIT_BOUNDS[0]} THEN 'train'
                WHEN h < {SPLIT_BOUNDS[1]} THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(bit_xor(doc_id) AS BIGINT) AS xor_ids
    FROM s GROUP BY 1
"""


SHUFFLE_SHARDS = 8
SHUFFLE_SALT = "ep0"  # new salt per epoch → a fresh permutation


def tp07_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle WITHOUT a global sort: every
    document gets a pseudo-random but reproducible (shard, position) in
    the training order — the step that turns a curated corpus into
    shuffled training shards.

    The naive plan (``ORDER BY rand()``) is a global range sort whose
    sampling + full exchange dominate at corpus scale and whose output
    isn't reproducible. Instead the md5 of (salt, doc_id) drives both
    decisions: two hex chars pick the shard (one hash exchange), and the
    remaining digest orders documents INSIDE each shard (per-shard
    window — parallelism = #shards, each partition sorts corpus/S rows).
    Readers consume shards round-robin, so the interleaved stream is
    uniformly shuffled; a new salt re-permutes everything for the next
    epoch. At 100 TB, S is chosen so a shard ≈ one training file
    (1–4 GB), making the per-shard sort the file-write unit of work."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(SHUFFLE_SALT), F.lit(":"), F.col("doc_id").cast("string")))
    # portable hex→int: two ascii codes of the first md5 chars (both
    # engines agree on ascii/substr; avoids conv/from_hex divergence)
    shard = F.pmod(
        F.ascii(F.substring(key, 1, 1)) * 256 + F.ascii(F.substring(key, 2, 1)),
        F.lit(SHUFFLE_SHARDS),
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return (
        d.select("doc_id", key.alias("key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    )


TP07_SQL = f"""
    WITH k AS (
        SELECT doc_id,
               md5('{SHUFFLE_SALT}:' || CAST(doc_id AS VARCHAR)) AS key
        FROM documents
    )
    SELECT doc_id,
           CAST((ascii(substr(key, 1, 1)) * 256 + ascii(substr(key, 2, 1)))
                % {SHUFFLE_SHARDS} AS BIGINT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY (ascii(substr(key, 1, 1)) * 256 + ascii(substr(key, 2, 1)))
                            % {SHUFFLE_SHARDS}
               ORDER BY key, doc_id
           ) AS BIGINT) AS pos
    FROM k
"""


MIX_TEMP_ALPHA = 0.7  # temperature exponent (UNIMAX/mT5-style flattening)
MIX_TEMP_TOTAL = 200  # documents in the temperature-mixed sample


def tp08_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture — quotas DERIVED from corpus
    statistics instead of tp04's hand-written recipe: each source's
    share ∝ n_docs^α (α < 1 flattens the natural distribution so small
    sources are upsampled relative to their size — the multilingual
    sampling rule of mT5/UNIMAX, Xue et al. 2021 §3.1). Slots are then
    filled by the same deterministic md5 rank as tp02/tp04, so the mix
    is reproducible under any parallelism.

    Scale shape: per-source counts are one partial-agg groupBy — the
    frame is source-vocabulary-sized (sublinear), and its pow-sum is a
    single-row aggregate of THAT small frame, never a second corpus
    pass. Quotas join back on the source key unpinned (AQE broadcasts
    while the source list fits). Shares round at 6 dp with the
    repo-standard +1e-9 nudge before the floor, so both engines floor
    identical doubles; quota is capped at n_docs so an over-allocated
    small source yields what it has (visible, like tp04's shortfall)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    powsum = counts.groupBy().agg(
        F.sum(F.pow("n_docs", F.lit(MIX_TEMP_ALPHA))).alias("psum")
    )
    quota = counts.crossJoin(F.broadcast(powsum)).select(
        "source",
        "n_docs",
        F.round(F.pow("n_docs", F.lit(MIX_TEMP_ALPHA)) / F.col("psum") + 1e-9, 6).alias("share"),
        F.least(
            F.col("n_docs"),
            F.floor(
                MIX_TEMP_TOTAL
                * F.round(F.pow("n_docs", F.lit(MIX_TEMP_ALPHA)) / F.col("psum") + 1e-9, 6)
            ),
        ).cast("long").alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select("source", "doc_id").withColumn("rk", F.row_number().over(w))
    return (
        ranked.join(quota, "source")
        .filter(F.col("rk") <= F.col("quota"))
        .groupBy("source", "n_docs", "share", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.min("doc_id").alias("first_doc"),
        )
        .select("source", "n_docs", "share", "quota", "n_taken", "first_doc")
    )


TP08_SQL = f"""
    WITH counts AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), ps AS (
        SELECT sum(pow(n_docs, {MIX_TEMP_ALPHA})) AS psum FROM counts
    ), quota AS (
        SELECT source, n_docs,
               round(pow(n_docs, {MIX_TEMP_ALPHA}) / psum + 1e-9, 6) AS share,
               CAST(least(n_docs,
                    floor({MIX_TEMP_TOTAL}
                          * round(pow(n_docs, {MIX_TEMP_ALPHA}) / psum + 1e-9, 6)))
                    AS BIGINT) AS quota
        FROM counts CROSS JOIN ps
    ), ranked AS (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT q.source, q.n_docs, q.share, q.quota,
           count(*) AS n_taken, min(r.doc_id) AS first_doc
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rk <= q.quota
    GROUP BY q.source, q.n_docs, q.share, q.quota
"""


CHUNK_W, CHUNK_S = 64, 48  # window words, stride (overlap = W - S = 16)


def tp11_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap — the long-document step of
    a pretraining pipeline (HF tokenizers' return_overflowing_tokens
    shape): each document yields chunks of ``CHUNK_W`` words starting
    every ``CHUNK_S`` words, so consecutive chunks share ``W − S`` words
    of context; the final chunk is the (possibly shorter) tail so no
    word is dropped. Each chunk carries its md5 (both engines' md5 of
    the identical substring) so the oracle pins the exact chunk TEXT,
    not just offsets.

    Scale shape: pure map — tokenize, sequence+posexplode of the chunk
    starts, slice/join per chunk. No shuffle at all; scales by input
    splits. Chunk inflation is ~n/S rows per doc, the same factor the
    real pipeline pays."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    n = F.size("ws")
    last_k = F.ceil(F.greatest(n - CHUNK_W, F.lit(0)) / F.lit(float(CHUNK_S))).cast("int")
    d2 = d.select(
        "doc_id", "ws", n.alias("n"),
        F.posexplode(F.sequence(F.lit(0), last_k)).alias("chunk_no", "k"),
    )
    start = F.col("k") * CHUNK_S
    ln = F.least(F.lit(CHUNK_W), F.col("n") - start)
    chunk = F.array_join(F.slice("ws", start + 1, ln), " ")
    return d2.select(
        "doc_id",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        start.cast("long").alias("start_word"),
        ln.cast("long").alias("n_words"),
        F.md5(F.encode(chunk, "utf-8")).alias("chunk_md5"),
    )


TP11_SQL = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, ws, n, CAST(t.k AS INT) AS chunk_no,
               t.k * {CHUNK_S} AS start
        FROM d, unnest(range(0, 1 + CAST(ceil(greatest(n - {CHUNK_W}, 0)
                                              / ({CHUNK_S} * 1.0)) AS BIGINT))) t(k)
    )
    SELECT doc_id, chunk_no,
           CAST(start AS BIGINT) AS start_word,
           CAST(least({CHUNK_W}, n - start) AS BIGINT) AS n_words,
           md5(array_to_string(ws[start + 1 : start + least({CHUNK_W}, n - start)], ' ')) AS chunk_md5
    FROM c
"""


ES_SAMPLE_N = 100   # global sample size
ES_SALT = "es1"     # salts the hash so the draw is independent of tx05/tp07


def tp12_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis & Spirakis
    2006 exponential keys: each doc draws a deterministic uniform
    u ∈ (0,1] from its salted poly-hash and ranks by ``ln(u)/w``
    (monotone in u^(1/w)); the global top-N IS an exact weighted
    sample without replacement — the length-proportional corpus
    subsampling step of a data mix, reproducible under any parallelism
    (unlike ``df.sample``, which draws per-partition with a seed that
    moves with the split layout). Weight = n_chars (zero-weight docs
    can never be drawn, exactly as the algorithm specifies).

    SCALE shape: the key is pure whole-stage codegen fused into the
    scan (hash fold + one log), and the global top-N is
    TakeOrderedAndProject — per-partition heaps of N, no global sort,
    no single-partition window (plan-pinned in tests/test_plans.py).
    FP contract: u is an exact integer ratio; the only transcendental
    is one ``ln`` per row, and the key is rounded to 12 dp BEFORE
    ranking in both engines so a last-ulp libm disagreement cannot
    reorder the cutoff (ties then break on doc_id identically)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = poly_hash(F.concat(F.lit(ES_SALT + ":"), F.col("doc_id").cast("string")))
    u = (h + 1).cast("double") / F.lit(float(MOD + 1))
    key = F.round(F.log(u) / F.col("n_chars").cast("double"), 12)
    return (
        d.select(
            "doc_id", "source",
            F.col("n_chars").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(ES_SAMPLE_N)
        .select("doc_id", "source", "weight", F.round("es_key", 6).alias("es_key"))
    )


_ES_HASH = poly_hash_sql(f"'{ES_SALT}:' || CAST(doc_id AS VARCHAR)")
TP12_SQL = f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars AS weight,
               round(ln(CAST(({_ES_HASH}) + 1 AS DOUBLE) / CAST({MOD + 1} AS DOUBLE))
                     / CAST(n_chars AS DOUBLE), 12) AS es_key
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, weight, round(es_key, 6) AS es_key FROM (
        -- rank on the 12-dp key; the 6-dp round is display-only (an
        -- es_key alias in this scope would shadow keyed.es_key in
        -- ORDER BY and re-rank on the coarser value)
        SELECT * FROM keyed ORDER BY es_key DESC, doc_id ASC LIMIT {ES_SAMPLE_N}
    )
"""


def dd17_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup APPLY with a quality policy: dd08's
    connected components pick the duplicate clusters, then each
    cluster keeps its BEST member — longest document (n_chars), ties
    to the lowest doc_id — instead of dd07's order-based
    keep-first-occurrence. This is the canonical-representative
    selection production dedup actually runs (keep the highest-quality
    copy, not an arbitrary one); the output is the per-clustered-doc
    verdict (label, kept flag, the cluster's representative) that
    joins back as a drop list.

    SCALE shape: the component fixpoint is dd08's pointer-jumping
    propagation (O(log diameter) joins over EDGE-sized frames —
    near-dup graphs are sparse); the representative choice is one
    window over label-keyed clustered docs (parallelism = #clusters),
    and only clustered doc_ids — duplicate-sized, not corpus-sized —
    ever shuffle. Deterministic, so the oracle replays components with
    a recursive CTE and the policy with the same window."""
    labels = _dup_labels_cached(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"), "n_chars"
    )
    w = Window.partitionBy("label").orderBy(F.desc("n_chars"), F.asc("node"))
    ranked = labels.join(d, "node").withColumn("rk", F.row_number().over(w))
    reps = ranked.filter(F.col("rk") == 1).select(
        "label", F.col("node").alias("rep_id")
    )
    return (
        ranked.join(reps, "label")
        .select(
            F.col("node").alias("doc_id"),
            "label",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.when(F.col("rk") == 1, 1).otherwise(0).cast("int").alias("is_kept"),
            "rep_id",
        )
    )


# dd17 oracle: dd08's recursive reachability labels + the same
# quality-policy window (longest n_chars, ties to lowest doc_id).
DD17_SQL = f"""
    WITH RECURSIVE pairs AS ({DD02_SQL}),
    edges AS (
        SELECT id_a, id_b FROM pairs
        UNION ALL
        SELECT id_b AS id_a, id_a AS id_b FROM pairs
    ),
    reach(src, dst) AS (
        SELECT id_a AS src, id_a AS dst FROM edges
        UNION
        SELECT r.src, e.id_b AS dst
        FROM reach r JOIN edges e ON r.dst = e.id_a
    ),
    labels AS (SELECT src AS node, min(dst) AS label FROM reach GROUP BY src),
    ranked AS (
        SELECT l.node, l.label, d.n_chars,
               row_number() OVER (PARTITION BY l.label
                                  ORDER BY d.n_chars DESC, l.node ASC) AS rk
        FROM labels l JOIN documents d ON d.doc_id = l.node
    ),
    reps AS (SELECT label, node AS rep_id FROM ranked WHERE rk = 1)
    SELECT r.node AS doc_id, r.label,
           CAST(r.n_chars AS BIGINT) AS n_chars,
           CAST(CASE WHEN r.rk = 1 THEN 1 ELSE 0 END AS INT) AS is_kept,
           reps.rep_id
    FROM ranked r JOIN reps USING (label)
"""


# ---------------------------------------------------------------------------
# tp13: range-partition planning — the TeraSort / Spark-RangePartitioner
# primitive behind every distributed global sort: SAMPLE the key column,
# cut the sampled key space into equal-frequency boundaries, ASSIGN every
# row its range-partition id, and AUDIT the plan (rows + key range per
# partition — the skew report you read before committing a 100 TB sort).
# The sample gate is a deterministic modular hash of the key (stable
# across runs/engines/partitionings), not a reservoir, so the oracle can
# replay the entire plan exactly.
# ---------------------------------------------------------------------------

RP_NPART = 8        # target range partitions
RP_SAMPLE_MOD = 20  # deterministic 1-in-20 key sample


def tp13_range_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition plan + balance audit over ``orders.o_orderkey``:
    keep keys where ``((k·31+7) mod 1e9+7) mod 20 == 0`` (exact int64
    for any k < 3e17), rank the sample, take boundaries at ranks
    ``(i·n) div NPART`` (i = 1..NPART−1), assign every row
    ``part_id = #{boundaries < key}``, and report per-partition row
    count and key range.

    SCALE shape: the whole point of the sample is that the boundary
    computation touches n/20 keys — the rank window here runs
    single-partition over the SAMPLE only (production swaps in tp05's
    two-phase distributed rank unchanged); the NPART−1 boundaries then
    BROADCAST into the full scan as one array column, so row assignment
    is a shuffle-free map (size(filter(bs, b -> b < k)) in codegen) and
    the audit is one partial-agg pass keyed on NPART values. This is
    exactly how a 1000-executor engine plans a 100 TB sort exchange:
    sample → boundaries → broadcast → assign, never a global sort of
    the data itself."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    samp = o.filter(((F.col("k") * 31 + 7) % MOD) % RP_SAMPLE_MOD == 0)
    ranked = samp.withColumn("rk", F.row_number().over(Window.orderBy("k")))
    n = samp.groupBy().agg(F.count(F.lit(1)).alias("n"))
    targets = (
        spark.range(1, RP_NPART)
        .crossJoin(F.broadcast(n))
        .select(F.expr(f"(id * n) div {RP_NPART}").alias("trk"))
    )
    bnds = (
        ranked.join(F.broadcast(targets), ranked.rk == targets.trk)
        .groupBy()
        .agg(F.sort_array(F.collect_list("k")).alias("bs"))
    )
    assigned = o.crossJoin(F.broadcast(bnds)).select(
        "k",
        F.size(F.filter("bs", lambda b: b < F.col("k"))).alias("part_id"),
    )
    return assigned.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


TP13_SQL = f"""
    WITH samp AS (
        SELECT o_orderkey AS k FROM orders
        WHERE ((o_orderkey * 31 + 7) % {MOD}) % {RP_SAMPLE_MOD} = 0
    ),
    n AS (SELECT count(*) AS n FROM samp),
    ranked AS (SELECT k, row_number() OVER (ORDER BY k) AS rk FROM samp),
    bnd AS (
        SELECT ranked.k AS b
        FROM ranked, n, unnest(range(1, {RP_NPART})) i(i)
        WHERE ranked.rk = (i.i * n.n) // {RP_NPART}
    ),
    assigned AS (
        SELECT o.o_orderkey AS k,
               (SELECT count(*) FROM bnd WHERE bnd.b < o.o_orderkey) AS pid
        FROM orders o
    )
    SELECT CAST(pid AS INT) AS part_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(k) AS min_key,
           max(k) AS max_key
    FROM assigned GROUP BY pid
"""


# ---------------------------------------------------------------------------
# tp14: token-budget water-filling — the data-mixing allocation step a
# pretraining run does once per mix: distribute a global token budget
# across sources proportionally to mixture weights, but never give a
# source more than it has (the epoch cap). This is exact max-min
# fairness (the classic water-filling of Bertsekas & Gallager 1992
# §6.5.2, the same allocation DoReMi/Llama-style mixes compute before
# tp04/tp08 draw the actual rows): saturate the sources whose cap sits
# below the water level, split the remainder among the rest by weight.
# Every breakpoint test is CROSS-MULTIPLIED so the whole plan is
# integer-exact — no float water level ever materializes.
# ---------------------------------------------------------------------------

TP14_SCALE = 1 << 20  # fixed-point sort key: (cap·SCALE) div w


def tp14_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filled token-budget allocation over ``documents.source``:
    per source, availability cap = Σ n_chars (1-epoch cap) and mixture
    weight = poly_hash(source) % 9 + 1 (a deterministic stand-in for a
    configured mix); global budget B = ⌊2·Σcap/3⌋. Sources sort by the
    fixed-point rate ``(cap·2^20) div w``; the breakpoint k* is the
    first position where the remaining budget spread over the
    remaining weight no longer exceeds the next source's cap — tested
    as ``(B − C_{k})·w ≤ cap·W_{>k}`` with integer cross-
    multiplication, never a float division. Rows ≤ k* saturate at cap;
    the rest get ``⌊(B − C_{k*})·w / W_{>k*}⌋``.

    SCALE shape: ONE partial-agg corpus pass builds the per-source
    table; everything after runs over #sources rows (the windows here
    are single-partition over that model-sized frame, exactly like
    tp08's quota table), and the 1-row level/budget frames broadcast
    back. At 100 TB the corpus pass is the only thing that grows.
    FP contract: allocations are exact int64; the only double is the
    display-only fill_frac, rounded at 4 dp with the midpoint nudge in
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    src = (
        d.groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("cap"))
        .withColumn("w", poly_hash("source") % 9 + 1)
    )
    b = src.groupBy().agg(F.expr("(2 * sum(cap)) div 3").alias("b"))
    nsrc = src.groupBy().agg(F.count(F.lit(1)).alias("nsrc"))
    order = [F.expr(f"(cap * {TP14_SCALE}) div w"), F.col("source")]
    w_run = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        src.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
        .withColumn("cpre", F.sum("cap").over(w_run))
        .withColumn("wpre", F.sum("w").over(w_run))
        .withColumn("wtot", F.sum("w").over(Window.partitionBy()))
    )
    brk = (
        ranked.crossJoin(F.broadcast(b))
        .filter(
            (F.col("b") - (F.col("cpre") - F.col("cap"))) * F.col("w")
            <= F.col("cap") * (F.col("wtot") - (F.col("wpre") - F.col("w")))
        )
        .groupBy()
        .agg(F.min("rn").alias("minrn"))
    )
    lvl = (
        brk.crossJoin(F.broadcast(nsrc))
        .select(F.coalesce(F.col("minrn") - 1, F.col("nsrc")).alias("kstar"))
        .join(
            ranked.select(F.col("rn").alias("krn"), F.col("cpre").alias("csat"), F.col("wpre").alias("wsat")),
            F.col("kstar") == F.col("krn"),
            "left",
        )
        .select(
            "kstar",
            F.coalesce("csat", F.lit(0)).alias("csat"),
            F.coalesce("wsat", F.lit(0)).alias("wsat"),
        )
    )
    alloc = F.when(F.col("rn") <= F.col("kstar"), F.col("cap")).otherwise(
        F.expr("((b - csat) * w) div (wtot - wsat)")
    )
    return (
        ranked.crossJoin(F.broadcast(lvl))
        .crossJoin(F.broadcast(b))
        .select(
            "source",
            F.col("cap").alias("avail_tokens"),
            F.col("w").alias("weight"),
            F.col("rn").cast("int").alias("rn"),
            F.when(F.col("rn") <= F.col("kstar"), 1).otherwise(0).cast("int").alias("saturated"),
            alloc.alias("alloc_tokens"),
        )
        .withColumn(
            "fill_frac",
            F.round(F.col("alloc_tokens") / F.col("avail_tokens") + 1e-9, 4),
        )
    )


_TP14_W = f"CAST(({poly_hash_sql('source')}) % 9 + 1 AS BIGINT)"
TP14_SQL = f"""
    WITH src AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS cap, {_TP14_W} AS w
        FROM documents GROUP BY source
    ),
    tot AS (SELECT (2 * sum(cap)) // 3 AS b FROM src),
    ord AS (
        SELECT source, cap, w,
               row_number() OVER (ORDER BY (cap * {TP14_SCALE}) // w, source) AS rn,
               sum(cap) OVER (ORDER BY (cap * {TP14_SCALE}) // w, source
                              ROWS UNBOUNDED PRECEDING) AS cpre,
               sum(w) OVER (ORDER BY (cap * {TP14_SCALE}) // w, source
                            ROWS UNBOUNDED PRECEDING) AS wpre,
               sum(w) OVER () AS wtot
        FROM src
    ),
    brk AS (
        SELECT coalesce(min(rn) - 1, (SELECT count(*) FROM src)) AS kstar
        FROM ord, tot
        WHERE (b - (cpre - cap)) * w <= cap * (wtot - (wpre - w))
    ),
    lvl AS (
        SELECT kstar,
               coalesce((SELECT cpre FROM ord WHERE rn = kstar), 0) AS csat,
               coalesce((SELECT wpre FROM ord WHERE rn = kstar), 0) AS wsat
        FROM brk
    ),
    alloc AS (
        SELECT o.source, o.cap, o.w, o.rn,
               CASE WHEN o.rn <= l.kstar THEN 1 ELSE 0 END AS saturated,
               CASE WHEN o.rn <= l.kstar THEN o.cap
                    ELSE ((t.b - l.csat) * o.w) // (o.wtot - l.wsat) END AS alloc
        FROM ord o, lvl l, tot t
    )
    SELECT source,
           cap AS avail_tokens,
           w AS weight,
           CAST(rn AS INT) AS rn,
           CAST(saturated AS INT) AS saturated,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           round(alloc * 1.0 / cap + 1e-9, 4) AS fill_frac
    FROM alloc
"""


# ---------------------------------------------------------------------------
# tp15: DoReMi-style domain reweighting — one multiplicative-weights
# update of the source mixture from per-domain excess loss (Xie et al.
# 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
# Pretraining"). The loss proxy is tx13's corpus-trained unigram
# cross-entropy (a real LM drops in by replacing the per-doc score);
# domains whose average loss exceeds the corpus baseline gain weight
# ∝ exp(η·excess), then weights renormalize to a mixture.
# ---------------------------------------------------------------------------

TP15_ETA = 4.0  # multiplicative-weights step size


def tp15_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi reweighting step over ``documents.source``.

    Scale shape: the per-doc scoring is tx13's plan (one tf partial-agg
    pass, vocabulary-sized model join); everything after is
    DOMAIN-sized (≤ #sources rows): two tiny folds (per-source sums,
    then the normalizer) and broadcast joins of 1-row aggregates. The
    cross-engine FP contract is tx13's: every multi-term double sum is
    a fold over an explicitly sorted list in BOTH engines, excess is a
    difference of 6-dp-gridded values (exact in IEEE), and exp's
    engine-libm wobble is absorbed by the final 6-dp rounding."""
    from .text import _tx13_scored_cached

    # r17: the per-doc scoring rides the session-materialized tx13 frame
    # (same plan, persisted once — tx13's own row still times the build)
    per_doc = _tx13_scored_cached(spark, sf_dir).select("doc_id", "xent")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    g = (
        per_doc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("doc_id", "xent"))),
                F.lit(0.0),
                lambda a, s: a + s["xent"],
            ).alias("sx"),
        )
        .withColumn("avg_xent", F.round(F.col("sx") / F.col("n_docs") + 1e-9, 6))
    )
    # r16: the normalizer scalars (base_xent, Z) were 1-row aggregates
    # crossJoined back — three consumers of ``g``, so the corpus-sized
    # tx13 scoring pipeline above it re-executed per consumer. They are
    # now single-partition WINDOW folds over the domain-sized frame
    # (≤ #sources rows — the exchange moves a handful of rows), with the
    # same explicitly-sorted lists folded in the same order, so every
    # double is bit-identical and ``g`` executes once.
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    we = (
        g.withColumn("sxs", F.collect_list(F.struct("source", "sx")).over(w_all))
        .withColumn("nn", F.sum("n_docs").over(w_all))
        .withColumn(
            "base_xent",
            F.round(
                F.aggregate(
                    F.array_sort("sxs"), F.lit(0.0), lambda a, s: a + s["sx"]
                )
                / F.col("nn")
                + 1e-9,
                6,
            ),
        )
        .withColumn("excess", F.greatest(F.col("avg_xent") - F.col("base_xent"), F.lit(0.0)))
        .withColumn("e", F.exp(F.lit(TP15_ETA) * F.col("excess")))
    )
    zd = we.withColumn(
        "es", F.collect_list(F.struct("source", "e")).over(w_all)
    ).withColumn(
        "z",
        F.aggregate(F.array_sort("es"), F.lit(0.0), lambda a, s: a + s["e"]),
    )
    return (
        zd
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            "avg_xent",
            F.round(F.col("excess") + 1e-9, 6).alias("excess"),
            F.round(F.col("e") / F.col("z") + 1e-9, 6).alias("weight"),
            F.round(F.round(F.col("e") / F.col("z") + 1e-9, 6) * 1e6, 0)
            .cast("long")
            .alias("tokens_per_million"),
        )
    )


TP15_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
    cnt AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT count(*) AS t FROM tok),
    per_doc AS (
        SELECT doc_id,
               round(ln(t) - list_reduce(
                   list_prepend(CAST(0 AS DOUBLE), list(tf * ln(cnt) ORDER BY w)),
                   (a, c) -> a + c
               ) / sum(tf) + 1e-9, 6) AS xent
        FROM tf JOIN cnt USING (w), tot
        GROUP BY doc_id, t
    ),
    g AS (
        SELECT d.source,
               count(*) AS n_docs,
               list_reduce(
                   list_prepend(CAST(0 AS DOUBLE), list(p.xent ORDER BY p.doc_id)),
                   (a, c) -> a + c
               ) AS sx
        FROM per_doc p JOIN documents d USING (doc_id)
        GROUP BY d.source
    ),
    ga AS (SELECT *, round(sx / n_docs + 1e-9, 6) AS avg_xent FROM g),
    base AS (
        SELECT round(
            list_reduce(
                list_prepend(CAST(0 AS DOUBLE), list(sx ORDER BY source)),
                (a, c) -> a + c
            ) / sum(n_docs) + 1e-9, 6) AS base_xent
        FROM ga
    ),
    we AS (
        SELECT ga.*, greatest(avg_xent - base_xent, 0.0) AS excess,
               exp({TP15_ETA} * greatest(avg_xent - base_xent, 0.0)) AS e
        FROM ga, base
    ),
    z AS (
        SELECT list_reduce(
            list_prepend(CAST(0 AS DOUBLE), list(e ORDER BY source)),
            (a, c) -> a + c
        ) AS z
        FROM we
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           avg_xent,
           round(excess + 1e-9, 6) AS excess,
           round(e / z + 1e-9, 6) AS weight,
           CAST(round(round(e / z + 1e-9, 6) * 1e6, 0) AS BIGINT) AS tokens_per_million
    FROM we, z
"""


def tp16_token_exact_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-EXACT sequence packing — tp03's layout driven by the
    TOKENIZER's counts instead of whitespace word counts, which is what
    a production pretraining pipeline actually packs by (HF packing
    operates on tokenized lengths; a word-count budget over- or
    under-fills sequences by the corpus's tokens-per-word ratio).

    Composition, not retraining: the per-doc token count comes from the
    tx15-trained BPE vocabulary exactly as tx19 computes it — the final
    symbol table IS a word→token-count map (``_bpe_stage``'s persisted
    frame, built once per session and shared with tx19), each document
    folds to ``Σ n_tok(word)`` through one broadcast hash join on the
    distinct-word vocabulary, and tp03's sharded windowed-cumsum then
    lays those exact lengths head-to-tail into ``PACK_BUDGET``-token
    sequences (seq_id / offset / overflow, all-integer arithmetic).

    Scale shape: the vocabulary join is map-side (vocab ≪ corpus); one
    corpus-sized exchange for the per-doc partial agg and one on the
    shard key for the cumsum window — parallelism = PACK_SHARDS by
    construction, same as tp03; nothing new materializes per query.

    Reference: n/a (LLM-pipeline scope; trainer = tx15 / Sennrich et
    al. 2016, packing = tp03's layout)."""
    from .text import BPE_MERGES, _bpe_stage

    stage = _bpe_stage(spark, sf_dir, BPE_MERGES)
    vocab = stage.select(
        F.array_join("syms", "").alias("w"), F.size("syms").alias("n_tok")
    )
    toks = (
        load_table(spark, sf_dir, "documents", fan_out=True)
        .select("doc_id", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"))
        .join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_tok").cast("int").alias("n_tokens"))
    )
    d = toks.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / PACK_BUDGET).cast("long").alias("seq_id"),
        F.pmod(start, F.lit(PACK_BUDGET)).cast("long").alias("offset"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.pmod(start, F.lit(PACK_BUDGET)) + F.col("n_tokens") - PACK_BUDGET).cast("long"),
        ).alias("overflow"),
    )


def _tp16_sql() -> str:
    from .text import BPE_MERGES, _bpe_chain_sql

    return (
        _bpe_chain_sql()
        + f""",
    vocab AS (
        SELECT array_to_string(syms, '') AS w, len(syms) AS n_tok
        FROM s{BPE_MERGES}
    ),
    wds AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id, CAST(sum(n_tok) AS INT) AS n_tokens,
               CAST(doc_id % {PACK_SHARDS} AS INT) AS shard
        FROM wds JOIN vocab USING (w)
        GROUP BY doc_id
    ),
    c AS (
        SELECT doc_id, shard, n_tokens,
               CAST(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY n_tokens DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS start
        FROM tok
    )
    SELECT doc_id, shard, n_tokens,
           CAST(floor(start / {PACK_BUDGET}) AS BIGINT) AS seq_id,
           CAST(start % {PACK_BUDGET} AS BIGINT) AS offset,
           CAST(greatest(0, start % {PACK_BUDGET} + n_tokens - {PACK_BUDGET}) AS BIGINT) AS overflow
    FROM c
"""
    )


TP16_SQL = _tp16_sql()


def tp17_no_split_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-SPLIT sequence packing (next-fit decreasing): tp03/tp16 lay
    documents head-to-tail and SPLIT the doc straddling each budget
    boundary (offset/overflow); many trainers forbid splits — every
    sequence holds whole documents and the boundary gap is padding.
    Per shard: order docs by (tokens desc, id), keep a running bin
    fill, and open a new bin whenever the next doc would overflow;
    emit (bin_id, offset) per doc plus a truncated flag for docs
    longer than the budget (they occupy a bin alone).

    WHY applyInPandas (the documented escape hatch, px02's pattern):
    the bin fill is a CAPACITY-RESET recurrence — fill resets to zero
    at data-dependent positions — which no window/cumsum combination
    expresses (contrast tp03's pure running sum). The sequential loop
    runs per shard inside one Arrow batch; shards are the unit of
    parallelism exactly as in tp03/tp16 (PACK_SHARDS ≈ cluster cores
    at scale), so the Python stage is one narrow pass after one
    exchange on the shard key. All-integer arithmetic → bit-identical
    DuckDB oracle, which replays the same recurrence as a recursive
    CTE (one row per shard per step).

    Reference: n/a (LLM-pipeline scope; next-fit-decreasing is the
    standard streaming bin-packing baseline, 2-competitive)."""
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
            F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("int").alias("shard"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bin_id, offset, fill = [], [], 0
        cur = -1
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur < 0 or fill + n > PACK_BUDGET:
                cur += 1
                fill = 0
            bin_id.append(cur)
            offset.append(fill)
            fill += n
        pdf["bin_id"] = pd.Series(bin_id, dtype="int64")
        pdf["offset"] = pd.Series(offset, dtype="int64")
        pdf["truncated"] = (pdf["n_tokens"] > PACK_BUDGET).astype("int32")
        return pdf[["doc_id", "shard", "n_tokens", "bin_id", "offset", "truncated"]]

    return d.groupBy("shard").applyInPandas(
        pack,
        schema="doc_id long, shard int, n_tokens int, bin_id long, offset long, truncated int",
    )


TP17_SQL = f"""
    WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(doc_id % {PACK_SHARDS} AS INT) AS shard
        FROM documents
    ),
    r AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY shard ORDER BY n_tokens DESC, doc_id ASC
        ) AS INT) AS rk
        FROM d
    ),
    rec AS (
        SELECT shard, rk, doc_id, n_tokens,
               CAST(0 AS BIGINT) AS bin_id,
               CAST(0 AS BIGINT) AS off,
               CAST(n_tokens AS BIGINT) AS fill
        FROM r WHERE rk = 1
        UNION ALL
        SELECT r.shard, r.rk, r.doc_id, r.n_tokens,
               CASE WHEN rec.fill + r.n_tokens > {PACK_BUDGET}
                    THEN rec.bin_id + 1 ELSE rec.bin_id END,
               CASE WHEN rec.fill + r.n_tokens > {PACK_BUDGET}
                    THEN 0 ELSE rec.fill END,
               CASE WHEN rec.fill + r.n_tokens > {PACK_BUDGET}
                    THEN CAST(r.n_tokens AS BIGINT) ELSE rec.fill + r.n_tokens END
        FROM rec JOIN r ON r.shard = rec.shard AND r.rk = rec.rk + 1
    )
    SELECT doc_id, shard, n_tokens, bin_id, off AS offset,
           CAST(n_tokens > {PACK_BUDGET} AS INT) AS truncated
    FROM rec
"""


QUERIES = {
    "tp01_full_pipeline": tp01_full_pipeline,
    "tp02_stratified_sample": tp02_stratified_sample,
    "tp05_stratified_sample_hc": tp05_stratified_sample_hc,
    "tp03_pack_sequences": tp03_pack_sequences,
    "tp04_weighted_mixture": tp04_weighted_mixture,
    "tp06_curriculum_bins": tp06_curriculum_bins,
    "tp07_shuffle_shards": tp07_shuffle_shards,
    "tp08_temperature_mixture": tp08_temperature_mixture,
    "tp09_epoch_upsample": tp09_epoch_upsample,
    "tp10_three_way_split": tp10_three_way_split,
    "tp11_chunk_overlap": tp11_chunk_overlap,
    "tp12_weighted_sample": tp12_weighted_sample,
    "tp13_range_partition": tp13_range_partition,
    "tp14_budget_waterfill": tp14_budget_waterfill,
    "tp15_doremi_reweight": tp15_doremi_reweight,
    "tp16_token_exact_packing": tp16_token_exact_packing,
    "tp17_no_split_packing": tp17_no_split_packing,
    "dd07_near_dedup_apply": dd07_near_dedup_apply,
    "dd08_dup_clusters": dd08_dup_clusters,
    "dd17_cluster_keep_best": dd17_cluster_keep_best,
    "tx05_hash_sample": tx05_hash_sample,
    "tx06_source_mix": tx06_source_mix,
}

ORACLES = {
    "tp01_full_pipeline": TP01_SQL,
    "tp02_stratified_sample": TP02_SQL,
    # tp05 computes the identical sample two-phase; same oracle by design
    "tp05_stratified_sample_hc": TP02_SQL,
    "tp03_pack_sequences": TP03_SQL,
    "tp04_weighted_mixture": TP04_SQL,
    "tp06_curriculum_bins": TP06_SQL,
    "tp07_shuffle_shards": TP07_SQL,
    "tp08_temperature_mixture": TP08_SQL,
    "tp09_epoch_upsample": TP09_SQL,
    "tp10_three_way_split": TP10_SQL,
    "tp11_chunk_overlap": TP11_SQL,
    "tp12_weighted_sample": TP12_SQL,
    "tp13_range_partition": TP13_SQL,
    "tp14_budget_waterfill": TP14_SQL,
    "tp15_doremi_reweight": TP15_SQL,
    "tp16_token_exact_packing": TP16_SQL,
    "tp17_no_split_packing": TP17_SQL,
    "dd07_near_dedup_apply": DD07_SQL,
    "dd08_dup_clusters": DD08_SQL,
    "dd17_cluster_keep_best": DD17_SQL,
    "tx05_hash_sample": TX05_SQL,
    "tx06_source_mix": TX06_SQL,
}


# Operator-authored lineage through tp17's applyInPandas barrier
# (lineage.analyze ``declared``, px02's pattern): the shard key and
# carried columns pass through; bin_id/offset/truncated derive from the
# token counts (which derive from text).
DECLARED = {
    # bases name the BARRIER'S INPUT columns (lineage.analyze resolves
    # them through the child's engine-proven lineage — n_tokens/shard
    # themselves resolve to documents.text/doc_id upstream)
    "tp17_no_split_packing": {
        "doc_id": ["doc_id"],
        "shard": ["shard"],
        "n_tokens": ["n_tokens"],
        "bin_id": ["n_tokens", "doc_id"],
        "offset": ["n_tokens", "doc_id"],
        "truncated": ["n_tokens"],
    },
}
