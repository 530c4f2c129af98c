"""Deduplication operators over the ``documents`` / ``embeddings`` tables
— the training-data-pipeline surface (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

Every operator is built from JVM-side DataFrame primitives (explode /
join / groupBy / higher-order array functions) — no Python UDFs — and is
oracle-checked: the deterministic cross-engine polynomial hash
(``functions.hashing``) makes even MinHash signatures bit-identical
between Spark and DuckDB.

Scale design (the sf0.1 test is a stand-in for ~100 TB):

- exact dedup groups on md5(text), never on the raw text → shuffle keys
  are 32 bytes regardless of document size.
- n-gram Jaccard uses PREFIX FILTERING (AllPairs): under a global
  rarity order, sets with Jaccard ≥ t must share a shingle within their
  first |d|-⌈t·|d|⌉+1 shingles, so only those prefixes are indexed and
  self-joined; hot (high-df) shingles land in the suffix and never
  generate candidates. Exact verification follows, so the output stays
  exact — this turns the Σdf² inverted-index blowup into something that
  survives 100 TB.
- MinHash+LSH replaces the all-pairs shingle join with a band-bucket
  join: k=32 hashes, b=16 bands × r=2 rows → P(candidate | j=0.5) ≈ 99%,
  P(candidate | j=0.95) ≈ 1-1e-16; candidates are verified with exact
  Jaccard so the OUTPUT equals the exact operator's (LSH is a pruning
  strategy, not an approximation, at these parameters).
- SimHash pairs use 4-band pigeonhole bucketing (hamming ≤ 3 over 32
  bits ⇒ at least one of 4 bytes equal), again exact after verification.
- embedding cosine is brute-force at test scale; the scale path is the
  IVF variant in ``similarity.py`` (same cells, partition-pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    MOD,
    MULT,
    minhash_perm,
    minhash_perm_sql,
    poly_hash_sql,
    word_ngrams_sql,
)
from ..sources.registry import load_table, table_path

N_HASHES = 32
N_BANDS = 16  # × 2 rows per band
JACCARD_T = 0.5
COSINE_T = 0.5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: dedup's pre-exchange work (shingle walks, rolling hashes,
    # signature perms) is the dominant per-row cost — distribute it when
    # the source is an unsplittable single-row-group file (r16, guide
    # §2.5; no-op on well-split inputs)
    return load_table(spark, sf_dir, "documents", fan_out=True)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dd01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one representative (min doc_id) per
    distinct text; group key is md5(text) so the shuffle moves 32-byte
    keys, not document bodies."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


DD01_SQL = """
    SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup ground truth)
# ---------------------------------------------------------------------------


def _word_powers(w):
    """M^len(w) mod M' — per distinct word, via the same char-walk the
    hash uses (vocab-sized work). split('','') yields [''], so the empty
    word needs the explicit M^0 = 1 branch."""
    walk = F.aggregate(
        F.split(w, ""), F.lit(1).cast("long"), lambda acc, _ch: (acc * MULT) % MOD
    )
    return F.when(F.length(w) == 0, F.lit(1).cast("long")).otherwise(walk)


def _hashed_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gh) postings of the TESTDATA documents table (see
    ``postings_of`` for the frame-level transform)."""
    return postings_of(_docs(spark, sf_dir))


def postings_of(d: DataFrame) -> DataFrame:
    """(doc_id, gh) postings: distinct poly-hashed word trigrams per doc.

    Scale-minded choices:
    - shingles are built with posexplode + window ``lead`` (pure
      whole-stage codegen; one shuffle on doc_id) instead of array
      higher-order functions, whose per-element interpreted eval is ~10×
      slower at corpus scale;
    - the char-level polynomial hash runs once per DISTINCT WORD (the
      vocabulary — sublinear in the corpus per Heaps' law, so its
      broadcast stays small at any scale), then each trigram's hash is
      composed arithmetically from its word hashes via Horner
      concatenation H(x‖y) = H(x)·M^len(y) + H(y) (mod M'), factored so
      the only powers needed are the per-word M^len carried in the
      vocabulary — the per-gram expression is a handful of multiply/mods
      (codegen; no conditionals, no modpow, no literal arrays — both
      alternatives measured slower: a 20-level conditional chain paid
      ~12 s of first-run JIT, a plan-literal power array rebuilt the
      array per row). The gram STRING is never
      materialized: no gram dictionary at all — the previous design
      broadcast a DISTINCT-SHINGLE dictionary, which grows ~linearly
      with the corpus (broadcast OOM at 100 TB); the word vocabulary is
      the only broadcast this path needs. Values are bit-identical to
      hashing the concatenated gram (tests/test_property.py)."""
    return hashed_ngrams_of(d, 3)


def hashed_ngrams_of(d: DataFrame, n: int, distinct: bool = True) -> DataFrame:
    """(doc_id, gh) hashed word n-grams for any n ≥ 2, same
    construction as ``postings_of``: vocabulary-only hash broadcast,
    window leads, and a Horner left fold
    H(x‖' '‖w) = ((H(x)·M + 32) mod M') · M^len(w) + H(w)  (mod M')
    — every factor stays < M' ≈ 1e9, so each two-term product fits a
    long. Bit-identical to char-hashing the joined gram string
    (tests/test_property.py checks n=3 and n=5). ``distinct=False``
    keeps every occurrence (the multiset repetition analysis needs)."""
    from pyspark.sql import Window

    tok = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    vocab = tok.select("w").distinct().select(
        "w", _poly_hash_expr(F.col("w")).alias("h"), _word_powers(F.col("w")).alias("p")
    )
    tk = tok.join(F.broadcast(vocab), "w").select("doc_id", "pos", "h", "p")
    win = Window.partitionBy("doc_id").orderBy("pos")
    acc = F.col("h")
    last_p = F.lit(1)
    for i in range(1, n):
        hi, pi = F.lead("h", i).over(win), F.lead("p", i).over(win)
        acc = (((acc * MULT + 32) % MOD) * pi % MOD + hi) % MOD
        last_p = pi
    out = (
        tk.select("doc_id", acc.alias("gh"), last_p.alias("_has"))
        .filter(F.col("_has").isNotNull())
        .select("doc_id", "gh")
    )
    return out.distinct() if distinct else out


_POSTINGS_CACHE: dict = {}


def _persisted(
    tag: str, spark: SparkSession, sf_dir: str, builder, ckpt: bool = False
) -> DataFrame:
    """Persist a derived index once per (session, sf_dir, tag) — exactly
    as a production pipeline materializes its shingle/signature indexes.
    Long-lived sessions must release via ``clear_postings_cache()``
    (bench and tests do) — persisted RDDs otherwise pin executor
    storage for the life of the session.

    ``ckpt=True`` materializes through the lineage-tracked
    ``localCheckpoint`` instead of ``persist``: same storage semantics,
    but the frame's logical plan is TRUNCATED to a leaf. Required for
    recursively built indexes (the BPE merge stages) whose composed
    plan otherwise grows exponentially with depth — persist bounds
    re-execution but every downstream query still re-analyzes the full
    plan tree (guide §3.3's materialize-to-truncate rule). Checkpointed
    frames are released by dropping the reference (ContextCleaner), so
    ``clear_postings_cache``'s unpersist guard stays correct."""
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    if key not in _POSTINGS_CACHE:
        if ckpt:
            from ..plans.capture import checkpoint_tracked

            _POSTINGS_CACHE[key] = checkpoint_tracked(builder(spark, sf_dir))
        else:
            from pyspark.storagelevel import StorageLevel

            _POSTINGS_CACHE[key] = builder(spark, sf_dir).persist(
                StorageLevel.MEMORY_AND_DISK
            )
    return _POSTINGS_CACHE[key]


def _postings_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shingle index is consumed several times per query (sizes, both
    join sides, verification) — see ``_persisted``."""
    return _persisted("postings", spark, sf_dir, _hashed_postings)


def clear_postings_cache() -> None:
    """Unpersist and drop every cached derived index (all sessions/dirs).
    Checkpointed frames (dd20's supersteps) are released by dropping the
    reference — ContextCleaner frees the checkpoint RDD on GC — and their
    registered pre-checkpoint plan docs are cleared with them."""
    for df in _POSTINGS_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _POSTINGS_CACHE.clear()
    from ..plans.capture import clear_checkpoint_registry

    clear_checkpoint_registry()


def _gram_arrays_of(po: DataFrame) -> DataFrame:
    """(doc_id, ghs) per-doc gram-set arrays from a DISTINCT (doc_id,
    gh) postings frame — the verification-side layout: one corpus
    groupBy instead of the per-verification postings exchanges."""
    return po.groupBy("doc_id").agg(F.sort_array(F.collect_list("gh")).alias("ghs"))


def _gram_arrays_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc gram arrays persisted per (session, sf_dir) — the
    read-side twin of the postings index that every verification
    consumes (dd02/dd03), so the corpus-sized array build runs once."""
    return _persisted(
        "gram_arrays", spark, sf_dir, lambda s, d: _gram_arrays_of(_postings_cached(s, d))
    )


def _verify_pairs(
    cand: DataFrame, po: DataFrame, arrays: DataFrame | None = None
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (shared by the
    prefix-filter, LSH and incremental paths). r16 rewrite (guide §2.3
    /§2.4): the old form joined the candidate set against the postings
    TWICE — two corpus-sized exchanges plus a candidate×grams
    intermediate per run. Verification only needs each pair's two gram
    SETS side by side, so it now joins the (pair-count-sized) candidate
    frame with a per-doc gram-ARRAY table and computes
    |A∩B| = size(array_intersect) in one codegen projection; the gram
    arrays are a persisted session index (``_gram_arrays_cached``) on
    the TESTDATA paths, an inline aggregation otherwise. n_grams =
    size(ghs) exactly (postings are distinct), so jaccard is the same
    integer ratio as before, rounded identically."""
    if arrays is None:
        arrays = _gram_arrays_of(po)
    aa = arrays.select(F.col("doc_id").alias("id_a"), F.col("ghs").alias("ghs_a"))
    ab = arrays.select(F.col("doc_id").alias("id_b"), F.col("ghs").alias("ghs_b"))
    inter = F.size(F.array_intersect("ghs_a", "ghs_b"))
    return (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("ghs_a") + F.size("ghs_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def _prefix_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gh, rk) prefix postings under the global (df, hash)
    shingle order: each doc keeps only its first n-⌈t·n⌉+1 rarest
    shingles (the AllPairs prefix — see dd02)."""
    from pyspark.sql import Window

    po = _postings_cached(spark, sf_dir)
    dfreq = po.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    sizes = po.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gh"))
    ranked = po.join(dfreq, "gh").withColumn("rk", F.row_number().over(w)).join(sizes, "doc_id")
    return ranked.filter(
        F.col("rk") <= F.col("n_grams") - F.ceil(F.col("n_grams") * JACCARD_T) + 1
    ).select("doc_id", "gh", "rk")


def _sizes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams) per-doc gram counts, persisted per (session,
    sf_dir): consumed by dd02's positional filter AND every
    verification's Jaccard denominator — one corpus-count-sized frame
    instead of a fresh aggregation of the postings per query."""
    return _persisted(
        "sizes",
        spark,
        sf_dir,
        lambda s, d: _postings_cached(s, d)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams")),
    )


def _prefix_postings_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix postings persisted per (session, sf_dir): the frame feeds
    BOTH sides of dd02's self-join (exchange reuse does not cover it),
    and dd07/tp01 re-derive dd02 per run — unpersisted, the df-count +
    rank-window pipeline would run twice per execution and again every
    run. Same lifecycle as the postings/signature caches."""
    return _persisted("pp_prefix", spark, sf_dir, _prefix_postings)


def dd02_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFIED near-dup pair set, persisted per (session, sf_dir)
    — the dedup decision artifact a production pipeline materializes
    once and every downstream apply step (drop lists, clustering,
    calibration) reads. dd02 itself stays uncached so its bench entry
    keeps timing real pair generation; the five consumers
    (dd07/dd08/dd15/dd17/tp01) share this frame instead of re-deriving
    the prefix-join + verification per query."""
    return _persisted("dd02_pairs", spark, sf_dir, dd02_ngram_jaccard)


def dd02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard pairs ≥ t=0.5 via prefix filtering
    (AllPairs): under a global (document-frequency, hash) shingle order, a
    doc of n shingles indexes only its first n-⌈t·n⌉+1 — any pair with
    Jaccard ≥ t must collide inside these prefixes, so candidates come
    from a prefix-only self-join and are then verified exactly. Hot
    shingles land in suffixes and never generate candidates, which is what
    turns the Σdf² inverted-index blowup into something that survives a
    100 TB corpus."""
    po = _postings_cached(spark, sf_dir)
    sizes = _sizes_cached(spark, sf_dir)
    prefix = _prefix_postings_cached(spark, sf_dir)
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin positional filter: under the global order, every shared
    # element other than the first shared prefix gram is ordered after it,
    # so overlap ≤ 1 + min(|A|-rkA, |B|-rkB) at the minimal shared ranks;
    # pairs whose bound can't reach α = ⌈t/(1+t)·(|A|+|B|)⌉ are pruned
    # before the (expensive) exact verification. Doc sizes are joined onto
    # the (much smaller) post-groupBy candidate set rather than carried
    # through the prefix self-join shuffle — prefix rows stay 3 longs wide.
    cand0 = (
        a.join(b, (F.col("a.gh") == F.col("b.gh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.min("a.rk").alias("min_ra"), F.min("b.rk").alias("min_rb"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"))
    cand = (
        cand0.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            1 + F.least(F.col("na") - F.col("min_ra"), F.col("nb") - F.col("min_rb"))
            >= F.ceil((F.col("na") + F.col("nb")) * (JACCARD_T / (1 + JACCARD_T)))
        )
        .select("id_a", "id_b")
    )
    return _verify_pairs(cand, po, arrays=_gram_arrays_cached(spark, sf_dir))


DD02_SQL = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {word_ngrams_sql('ws', 3)} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, gh
        FROM (SELECT doc_id, {poly_hash_sql('unnest(grams)')} AS gh FROM g)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM po GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM po a JOIN po b ON a.gh = b.gh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n_grams + sb.n_grams - inter) >= {JACCARD_T}
"""


# ---------------------------------------------------------------------------
# dd19: asymmetric CONTAINMENT dedup — the case symmetric Jaccard
# structurally misses: a short document quoted wholesale inside a long
# one scores C(A→B) = |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| (tiny when
# sizes are skewed), so dd02/dd03's t=0.5 gate never fires. Production
# dedup runs both gates; containment also powers quote/boilerplate
# attribution. The prefix-filter trick carries over ASYMMETRICALLY:
# C(A→B) ≥ τ needs ≥⌈τ·|A|⌉ shared grams, so A must share one of its
# first |A|−⌈τ·|A|⌉+1 RAREST grams with B — index only that (short)
# prefix on the contained side and probe the FULL postings on the
# container side; hot shingles sit in A's suffix and never probe.
# ---------------------------------------------------------------------------

CONTAIN_T = 0.8  # directional containment threshold


def _containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, gh) containment prefix under the global (df, hash)
    order: each doc's first n−⌈τ·n⌉+1 rarest grams — the asymmetric
    analog of ``_prefix_postings``, persisted per (session, sf_dir)
    because the df-count + rank-window pipeline would otherwise rerun
    per query (the pp_prefix rationale)."""
    from pyspark.sql import Window

    po = _postings_cached(spark, sf_dir)
    dfreq = po.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gh"))
    return (
        po.join(dfreq, "gh")
        .withColumn("rk", F.row_number().over(w))
        .join(_sizes_cached(spark, sf_dir), "doc_id")
        .filter(F.col("rk") <= F.col("n_grams") - F.ceil(F.col("n_grams") * CONTAIN_T) + 1)
        .select("doc_id", "gh", "df")
    )


def dd19_containment(
    spark: SparkSession, sf_dir: str, df_cap: int | None = None
) -> DataFrame:
    """Directional containment pairs (id_a contained in id_b) with the
    exact containment and the symmetric Jaccard next to it.

    Scale shape: candidate volume is Σ_{g ∈ cprefix(A)} df(g) — the
    containment prefix holds each doc's RAREST grams (low df by
    construction), so hot shingles never generate probes; the exact
    verification computes |A∩B| from the persisted per-doc gram-ARRAY
    index (``_gram_arrays_cached``, the r16 ``_verify_pairs`` layout —
    shared with dd02/dd03/dd09/dd11) in one codegen projection over the
    pair-count-sized candidate frame, instead of the two corpus-sized
    postings joins the pre-r16 form ran per execution; na/nb are
    size(ghs) = the exact distinct-gram counts. All shuffle keys are
    8-byte hashes.

    ``df_cap``: the saturated-corpus escape hatch (SCALE.md round-12
    probe: on a vocabulary-saturated corpus every gram's df grows with
    N and probe volume goes ~N²). With a cap, prefix grams with
    df > df_cap generate no probes — probe volume becomes
    O(Σ min(df, cap)) — at a RECALL cost stated honestly: a contained
    doc whose entire prefix is hotter than the cap is missed;
    verification of surviving candidates stays exact, so precision is
    unaffected. Default None = exact (the registered oracle contract).
    On natural (Heaps-law) corpora rare-gram dfs stay O(1) and the cap
    never binds."""
    po = _postings_cached(spark, sf_dir)
    cpre = _persisted("cpre_contain", spark, sf_dir, _containment_prefix)
    if df_cap is not None:
        cpre = cpre.filter(F.col("df") <= df_cap)
    cand = (
        cpre.alias("a")
        .join(po.alias("b"), (F.col("a.gh") == F.col("b.gh")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ga = _gram_arrays_cached(spark, sf_dir)
    aa = ga.select(F.col("doc_id").alias("id_a"), F.col("ghs").alias("ghs_a"))
    ab = ga.select(F.col("doc_id").alias("id_b"), F.col("ghs").alias("ghs_b"))
    return (
        cand.join(aa, "id_a")
        .join(ab, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ghs_a", "ghs_b")))
        .withColumn("na", F.size("ghs_a"))
        .withColumn("nb", F.size("ghs_b"))
        .filter(F.col("inter") / F.col("na") >= CONTAIN_T)
        .select(
            "id_a",
            "id_b",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.round(F.col("inter") / F.col("na"), 4).alias("containment"),
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4).alias(
                "jaccard"
            ),
        )
    )


DD19_SQL = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {word_ngrams_sql('ws', 3)} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, gh
        FROM (SELECT doc_id, {poly_hash_sql('unnest(grams)')} AS gh FROM g)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM po GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM po a JOIN po b ON a.gh = b.gh AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(sa.n_grams AS BIGINT) AS na, CAST(sb.n_grams AS BIGINT) AS nb,
           round(inter * 1.0 / sa.n_grams, 4) AS containment,
           round(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter * 1.0 / sa.n_grams >= {CONTAIN_T}
"""


# ---------------------------------------------------------------------------
# dd20: PERSONALIZED PageRank over the near-dup graph — the message-
# passing iterative shape (contrast dd08/dd17's label-propagation
# fixpoint and ss06's k-means): 3 synchronous power-iteration rounds
# of r ← 0.15·p + 0.85·Σ_in r/outdeg over dd02's verified pair graph,
# with the teleport vector p ∝ document length (graph-normalized so
# Σp = |V|). Plain PageRank is SIGNAL-FREE here — near-dup components
# are symmetric cliques, so uniform rank is the fixed point; the
# quality-personalized teleport makes dd20 the diffusion policy
# production canonical-selection actually wants: each member's score
# blends its own quality with its duplicates' (robust to one noisy
# length), the smoothed-quality analog of dd17's hard argmax.
# Cross-engine FP contract: each round's in-neighbor sum folds a
# neighbor-id-sorted list in BOTH engines and re-rounds to the 9-dp
# grid, so iteration k+1 consumes bit-identical inputs; the oracle
# unrolls the same 3 rounds as chained CTEs.
# ---------------------------------------------------------------------------

PR_ITERS = 3      # unrolled in both engines
PR_DAMP = 0.85    # the canonical damping factor


def _dd20_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative core of dd20: one join + one groupBy per superstep,
    with EXACTLY ONE reference to the previous round's frame.

    The naive Pregel round (contrib = edges ⋈ ranks → agg; new ranks =
    ranks ⟕ contrib) references ``ranks`` twice, so the LOGICAL plan
    doubles per round — persist bounds re-execution but not plan size,
    and by round 3 the analyzed plan was 3.5 MB of text (optimized
    print 165 MB): every action then pays ~15 s of driver-side plan
    processing (canonicalization for cache lookup, AQE stage creation,
    plan-description strings for listeners), the r11 sidecar's 10.3 s.
    Fix: fold the receiver's own (p, outdeg) into the message stream as
    a marker self-loop row per node, so a round is

        msg ⋈ ranks (on sender) → groupBy dst:
            p/outdeg from the self row, Σ contributions from the rest

    — one ``ranks`` reference, one ``msg`` reference, LINEAR plan
    growth. Contribution fold order (struct(src, c), array_sort, left
    fold) is bit-identical to the oracle's ORDER BY src fold; self rows
    are excluded via when()→null, which collect_list drops.

    Each round's node-sized frame is eagerly checkpoint-truncated via
    ``plans.capture.checkpoint_tracked`` (the GraphX-per-superstep
    discipline): the next round's plan starts from a LogicalRDD leaf, so
    plan size per action is O(one round) REGARDLESS of round count,
    while the registered pre-checkpoint plan keeps column lineage
    resolvable through every superstep down to the base tables. Frames
    are registered in ``_POSTINGS_CACHE`` so ``clear_postings_cache``
    drops the references."""
    from ..plans.capture import checkpoint_tracked

    app = spark.sparkContext.applicationId

    def _pin(tag: str, df: DataFrame) -> DataFrame:
        # superstep truncation that lineage can still see through
        df = checkpoint_tracked(df)
        _POSTINGS_CACHE[(app, sf_dir, tag)] = df
        return df

    # checkpoint the pair frame FIRST: every downstream frame (edges,
    # degrees, teleport weights, messages, rounds) then references one
    # tiny LogicalRDD leaf instead of the full PPJoin tree — the cold
    # build pays the big plan's canonicalization exactly once
    pairs = _pin(
        "dd20_pairs", dd02_pairs_cached(spark, sf_dir).select("id_a", "id_b")
    )
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = edges.groupBy(F.col("id_a").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    q = _docs(spark, sf_dir).select(F.col("doc_id").alias("node"), "n_chars")
    nd = deg.join(q, "node")
    tot = nd.groupBy().agg(
        F.sum("n_chars").alias("sc"), F.count(F.lit(1)).alias("nv")
    )
    nd = nd.crossJoin(F.broadcast(tot)).select(
        "node",
        "outdeg",
        F.round(F.col("n_chars") * F.col("nv") / F.col("sc") + 1e-12, 9).alias("p"),
    )
    msg = _pin(
        "dd20_msg",
        edges.select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            F.lit(False).alias("is_self"),
        ).unionByName(
            nd.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(True).alias("is_self"),
            )
        ),
    )
    ranks = _pin(
        "dd20_ranks_r0", nd.select("node", "outdeg", "p", F.col("p").alias("rank"))
    )
    for _round in range(PR_ITERS):
        ranks = _pin(f"dd20_ranks_r{_round + 1}", _dd20_superstep(msg, ranks))
    return ranks


def _dd20_superstep(msg: DataFrame, ranks: DataFrame) -> DataFrame:
    """One Pregel round: ONE edge-keyed join (msg ⋈ ranks on the sender)
    and ONE destination groupBy — the self-loop marker row delivers the
    receiver's own (p, outdeg), contributions fold neighbor-id-sorted
    (bit-identical to the oracle's ORDER BY src fold; self rows become
    nulls, which collect_list drops)."""
    return (
        msg.join(ranks, msg.src == ranks.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(
            F.max(F.when(F.col("is_self"), F.col("outdeg"))).alias("outdeg"),
            F.max(F.when(F.col("is_self"), F.col("p"))).alias("p"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_self"),
                            F.struct(
                                F.col("src"),
                                (F.col("rank") / F.col("outdeg")).alias("c"),
                            ),
                        )
                    )
                ),
                F.lit(0.0),
                lambda a, s: a + s["c"],
            ).alias("s"),
        )
        .select(
            "node",
            "outdeg",
            "p",
            F.round(
                F.lit(1 - PR_DAMP) * F.col("p") + F.lit(PR_DAMP) * F.col("s") + 1e-12,
                9,
            ).alias("rank"),
        )
    )


def dd20_graph_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round quality-personalized PageRank over the undirected
    near-dup pair graph.

    SCALE shape: per round, ONE edge-keyed join (contributions =
    rank/outdeg shipped along edges, the receiver's own (p, outdeg)
    riding a marker self-loop row) and one partial-agg groupBy on the
    destination — the classic Pregel superstep as DataFrame ops; frames
    are EDGE-sized (near-dup graphs are sparse), never corpus-sized.
    Each superstep references its predecessor exactly once and is
    eagerly materialized (see ``_dd20_ranks``), the standard Pregel
    discipline: PR_ITERS tiny driver-coordinated jobs over node-sized
    frames, with LINEAR logical-plan growth instead of the naive
    two-reference round's exponential one. The final rank frame is
    session-persisted per (session, sf_dir) like the postings/band
    indexes. The teleport weights need one broadcast 1-row total. At a
    diameter-heavy 100 TB graph the round count is the knob; each extra
    round is one more join+agg stage over edge-/node-sized frames, and
    the local ``persist`` swaps to reliable ``checkpoint`` storage for
    executor-loss recovery."""
    ranks = _persisted("dd20_ranks", spark, sf_dir, _dd20_ranks)
    return ranks.select(
        "node", F.col("outdeg").cast("long").alias("outdeg"), "p", "rank"
    )


def _dd20_round_sql(prev: str, k: int) -> str:
    return f"""
    r{k} AS (
        SELECT d.node, d.outdeg, d.p,
               round({1 - PR_DAMP} * d.p + {PR_DAMP} * coalesce(c.s, 0.0) + 1e-12, 9) AS rank
        FROM nd d LEFT JOIN (
            SELECT e.id_b AS dst,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                                    list(p.rank / p.outdeg ORDER BY e.id_a)),
                       (a, c) -> a + c
                   ) AS s
            FROM edges e JOIN {prev} p ON p.node = e.id_a
            GROUP BY e.id_b
        ) c ON c.dst = d.node
    )"""


DD20_SQL = f"""
    WITH pairs AS ({DD02_SQL}),
    edges AS (
        SELECT id_a, id_b FROM pairs
        UNION ALL
        SELECT id_b AS id_a, id_a AS id_b FROM pairs
    ),
    deg AS (SELECT id_a AS node, count(*) AS outdeg FROM edges GROUP BY id_a),
    nd AS (
        SELECT deg.node, deg.outdeg,
               round(d.n_chars * (SELECT count(*) FROM deg)
                     / (SELECT sum(d2.n_chars) FROM deg g2
                        JOIN documents d2 ON d2.doc_id = g2.node) + 1e-12, 9) AS p
        FROM deg JOIN documents d ON d.doc_id = deg.node
    ),
    r0 AS (SELECT node, outdeg, p, p AS rank FROM nd),
    {",".join(_dd20_round_sql(f"r{k}", k + 1) for k in range(PR_ITERS))}
    SELECT node, CAST(outdeg AS BIGINT) AS outdeg, p, rank FROM r{PR_ITERS}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_sig(po: DataFrame) -> DataFrame:
    """(doc_id, m0..m31) MinHash signatures: 32 plain min-aggregates
    over the hashed postings (pure codegen — no array folds)."""
    return po.groupBy("doc_id").agg(
        *[F.min(minhash_perm(F.col("gh"), i)).alias(f"m{i}") for i in range(N_HASHES)]
    )


def _minhash_sig_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus signature table persisted per (session, sf_dir): the
    materialized artifact dd03's bands are cut from and dd15's
    calibration reads back — without it dd15 re-ran the corpus-sized
    32-min aggregation every execution (r16, guide §2.4: two operators
    keyed the same way share one materialization)."""
    return _persisted(
        "mh_sig", spark, sf_dir, lambda s, d: _minhash_sig(_postings_cached(s, d))
    )


def _minhash_bands_from_sig(sig: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH bucket rows banded 16×2 from a
    (doc_id, m0..m31) signature frame — a pure projection."""
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_", F.col(f"m{2 * b}").cast("string"), F.col(f"m{2 * b + 1}").cast("string")
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _minhash_bands(po: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH bucket rows: 32 min-aggregate MinHash
    signatures (pure codegen — no array folds) banded 16×2."""
    return _minhash_bands_from_sig(_minhash_sig(po))


def _minhash_bands_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash bucket rows, persisted per (session, sf_dir) like
    the postings and SimHash signatures: the band frame feeds BOTH sides
    of dd03's self-join (and dd09's split probe), and Spark's exchange
    reuse does not cover it — unpersisted, the full groupBy-32-mins over
    the postings would run twice per execution and again every run. In
    production this is the materialized bands table next to the postings
    index (the thing dd11 maintains incrementally)."""
    return _persisted(
        "mh_bands", spark, sf_dir,
        # cut the bands from the persisted signature table (not the raw
        # postings) so the 32-min agg is computed once per session and
        # shared with dd15's calibration read (r16)
        lambda s, d: _minhash_bands_from_sig(_minhash_sig_cached(s, d)),
    )


def dd03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs ≥ 0.5 Jaccard.

    Signatures are 32 plain min-aggregates over the hashed postings (pure
    codegen — no array folds), banded 16×2 into bucket keys; the band
    self-join yields candidates, which are verified with an exact
    intersection count over the postings. Verification makes the output
    exact; LSH only prunes the pair space — at 100 TB the band join
    shuffles O(n·bands) small keys instead of O(n²) comparisons."""
    po = _postings_cached(spark, sf_dir)
    bands = _minhash_bands_cached(spark, sf_dir)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # exact verification of candidates via the shared postings verifier
    return _verify_pairs(cand, po, arrays=_gram_arrays_cached(spark, sf_dir))


def _poly_hash_expr(g):
    codes = F.transform(F.split(g, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % MOD)


# Oracle: the exact-Jaccard pair set (LSH with verification must equal it —
# at j≥0.5 with 16 bands × 2 rows, miss probability ≤ (1-0.25)^16 ≈ 1%,
# and the planted near-dups sit at j≈0.95 where it is ~1e-16).
DD03_SQL = DD02_SQL


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from word-level polynomial hashes:
    bit j of the signature is the sign of Σ_tokens (±1 by bit j of h(token)).
    Word hashes are computed once per DISTINCT word (tiny dictionary,
    broadcast back onto the token stream) — the token explode then carries
    only (doc_id, long)."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dictionary = tok.select("w").distinct().withColumn("h", _poly_hash_expr(F.col("w")))
    tok = tok.join(F.broadcast(dictionary), "w")
    aggs = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << j)) > 0, 1).otherwise(-1)).alias(f"s{j}")
        for j in range(32)
    ]
    per_doc = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for j in range(32):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        sim = term if sim is None else sim + term
    return per_doc.select("doc_id", sim.alias("simhash"))


def dd04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash signature (near-dup sketch); shares
    the persisted signature frame with dd05."""
    return _persisted("simhash", spark, sf_dir, _simhash)


def _simhash_sql_core() -> str:
    sums = ",\n           ".join(
        f"sum(CASE WHEN (h & {1 << j}) > 0 THEN 1 ELSE -1 END) AS s{j}" for j in range(32)
    )
    bits = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), hashed AS (
        SELECT doc_id, {poly_hash_sql('w')} AS h FROM tok
    ), sums AS (
        SELECT doc_id, {sums}
        FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums
"""


DD04_SQL = _simhash_sql_core()


def dd05_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3 over 32 bits) via 4-band
    pigeonhole bucketing: if two signatures differ in ≤3 bits, at least one
    of their 4 bytes is identical — so the band join has 100% recall and
    the hamming filter makes the result exact. At scale this is a shuffle
    on (band, byte) keys instead of an n² bit comparison.

    A pair whose signatures agree on k bands would surface k times; both
    signatures ride along in the joined row, so each pair is kept only at
    its FIRST matching band (filter: every earlier band's byte differs) —
    exactly-once output with a codegen filter instead of a second
    shuffle (`distinct`) over the whole candidate set.

    The signature frame is persisted before the self-join: Spark's
    exchange reuse does not fire here (the build side sits under a
    BroadcastExchange with different partitioning), so an unpersisted
    plan would run the whole scan→dictionary→32-sum pipeline TWICE."""
    sim = _persisted("simhash", spark, sf_dir, _simhash)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 8).bitwiseAND(F.lit(255)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(_no_earlier_band_match())
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


def _no_earlier_band_match():
    """True iff no band BEFORE the joined one has equal bytes — dedups
    multi-band matches to the first matching band, pair-exactly-once."""
    cond = F.lit(True)
    for bp in range(4):
        byte_a = F.shiftright(F.col("a.simhash"), bp * 8).bitwiseAND(F.lit(255))
        byte_b = F.shiftright(F.col("b.simhash"), bp * 8).bitwiseAND(F.lit(255))
        cond = cond & ((F.col("a.band") <= F.lit(bp)) | (byte_a != byte_b))
    return cond


DD05_SQL = f"""
    WITH sims AS ({_simhash_sql_core()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


TILE_ROWS = 2048  # rows per block: 2048 × 64 doubles ≈ 1 MB per side per task


def dd06_embed_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.5) as a DISTRIBUTED tiled
    matrix product: embeddings are packed into row blocks (groupBy on
    vec_id mod B), the block table is self-joined on block_a ≤ block_b
    (upper triangle — each unordered pair of vectors lands in exactly
    one tile), and each tile row is multiplied with one BLAS dgemm
    inside Arrow-batched ``mapInPandas``. No driver collect anywhere:
    the quadratic work is spread over B·(B+1)/2 tiles with
    ≤ 2·TILE_ROWS×dim doubles held per task, so the operator survives a
    build side that no longer fits one machine.

    B is sized by BOTH constraints: blocks small enough for per-task
    memory (TILE_ROWS cap) AND enough tiles to saturate the cluster
    (B·(B+1)/2 ≥ 2·defaultParallelism — without this floor a corpus
    smaller than one tile runs as a single task, which is exactly what
    regressed the sf0.1 bench when n=2000 ≤ TILE_ROWS). The ≤-join is a
    broadcast nested-loop whose output is striped by blk_a (strip for
    blk_a=0 has B tiles, strip for blk_a=B-1 has one), so tiles are
    round-robin repartitioned before the dgemm to even out that
    triangular skew. Row count comes from the parquet footer
    (driver-side metadata read, no scan job); at warehouse scale the
    same number comes from catalog stats. (All-pairs cosine is the
    documented exactness baseline; at corpus scale the pruning path is
    the IVF variant ``similarity.ss02`` over the same kernel.)"""
    import math

    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    try:
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(table_path(sf_dir, "embeddings")).metadata.num_rows
    except Exception:
        n_rows = e.count()
    par = max(1, spark.sparkContext.defaultParallelism)
    b_mem = math.ceil(n_rows / TILE_ROWS)
    b_par = math.ceil((math.sqrt(1 + 16 * par) - 1) / 2)  # B(B+1)/2 >= 2*par
    n_blocks = max(1, b_mem, b_par)
    n_tiles = n_blocks * (n_blocks + 1) // 2
    packed = (
        e.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vec_id", "v")).alias("rows"))
    )
    tiles = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a.blk") <= F.col("b.blk"))
        .select(
            F.col("a.blk").alias("blk_a"),
            F.col("a.rows").alias("rows_a"),
            F.col("b.blk").alias("blk_b"),
            F.col("b.rows").alias("rows_b"),
        )
        .repartition(min(n_tiles, 2 * par))
    )

    from ..functions.dgemm import threshold_pairs, unpack_block

    def tile(batches):
        for pdf in batches:
            for blk_a, blk_b, rows_a, rows_b in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"]
            ):
                ida, mata = unpack_block(rows_a)
                idb, matb = unpack_block(rows_b)
                lo, hi, cos = threshold_pairs(
                    ida, mata, idb, matb, COSINE_T, same_block=blk_a == blk_b
                )
                yield pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos})

    return tiles.mapInPandas(tile, schema="id_a long, id_b long, cosine double")


DD06_SQL = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                                (a, b) -> a + b)) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_reduce(list_transform(range(1, len(a.v) + 1),
                                            i -> a.v[i] * b.v[i]),
                             (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                      (x, y) -> x + y) / (a.nrm * b.nrm) >= {COSINE_T}
"""


# ---------------------------------------------------------------------------
# incremental (batch-vs-index) near-dedup
# ---------------------------------------------------------------------------


def dd09_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: match each INCOMING document (doc_id ≥
    split, the arriving batch) against the already-INDEXED corpus
    (doc_id < split) and emit the best match per incoming doc — the
    shape every continuously-ingesting training pipeline needs (dedup
    the new batch against the index, never the corpus against itself).

    The band join is one-directional (indexed side × incoming side), so
    its cost is O(batch · bands), not O(corpus²); at production scale
    the indexed bands/postings are a materialized table and an arriving
    batch only computes ITS OWN signatures and probes the buckets. The
    split scalar is a 1-row broadcast, never a driver collect. Exact
    Jaccard verification (shared ``_verify_pairs``) keeps the output
    exact; best match = highest (rounded) jaccard, ties to the lowest
    indexed id."""
    from pyspark.sql import Window

    po = _postings_cached(spark, sf_dir)
    split = _docs(spark, sf_dir).groupBy().agg(
        F.floor(F.max("doc_id") / 2).cast("long").alias("split_id")
    )
    bands = _minhash_bands_cached(spark, sf_dir).crossJoin(F.broadcast(split))
    old = bands.filter(F.col("doc_id") < F.col("split_id"))
    new = bands.filter(F.col("doc_id") >= F.col("split_id"))
    cand = (
        old.alias("a")
        .join(
            new.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ver = _verify_pairs(cand, po, arrays=_gram_arrays_cached(spark, sf_dir))
    w = Window.partitionBy("id_b").orderBy(F.desc("jaccard"), F.asc("id_a"))
    return (
        ver.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("id_b").alias("new_id"),
            F.col("id_a").alias("match_id"),
            "jaccard",
        )
    )


def incremental_dedup_frames(new_docs: DataFrame, indexed_docs: DataFrame) -> DataFrame:
    """Frame-level incremental near-dedup: best indexed match (MinHash
    band probe + exact Jaccard ≥ t, ties to lowest id) for each doc in
    ``new_docs`` against ``indexed_docs`` — the reusable core behind
    dd09, for callers whose "arriving batch" is an arbitrary DataFrame
    (e.g. a vtable change feed; see the CDC test in test_vtable.py).
    Both frames need (doc_id, text); doc_ids must be disjoint. dd09
    itself stays on the single-table/split form to reuse the persisted
    postings index."""
    from pyspark.sql import Window

    po_idx = postings_of(indexed_docs)
    po_new = postings_of(new_docs)
    cand = (
        _minhash_bands(po_idx).alias("a")
        .join(
            _minhash_bands(po_new).alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ver = _verify_pairs(cand, po_idx.unionByName(po_new))
    w = Window.partitionBy("id_b").orderBy(F.desc("jaccard"), F.asc("id_a"))
    return (
        ver.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("id_b").alias("new_id"), F.col("id_a").alias("match_id"), "jaccard")
    )


# Oracle: exact cross-split Jaccard pairs, best match per incoming doc.
# (Same LSH-recall argument as DD03: verification makes survivors exact,
# and the planted near-dups sit at j≈0.95 where band-miss is ~1e-16.)
DD09_SQL = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {word_ngrams_sql('ws', 3)} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, gh
        FROM (SELECT doc_id, {poly_hash_sql('unnest(grams)')} AS gh FROM g)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_grams FROM po GROUP BY doc_id),
    sp AS (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) AS split_id FROM documents),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM po a JOIN po b ON a.gh = b.gh
        WHERE a.doc_id < (SELECT split_id FROM sp)
          AND b.doc_id >= (SELECT split_id FROM sp)
        GROUP BY 1, 2
    ),
    ver AS (
        SELECT id_a, id_b,
               round(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 4) AS jaccard
        FROM pairs
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n_grams + sb.n_grams - inter) >= {JACCARD_T}
    )
    SELECT id_b AS new_id, id_a AS match_id, jaccard
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY id_b ORDER BY jaccard DESC, id_a ASC
        ) AS rk FROM ver
    ) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# incremental postings-index maintenance
# ---------------------------------------------------------------------------

LATE_MOD, LATE_REM = 4, 3  # doc_id % 4 == 3 → the stand-in "arriving batch"
DEL_MOD, DEL_REM = 10, 7  # doc_id % 10 == 7 (of the base) → retired docs


def apply_postings_changes(
    postings: DataFrame,
    inserted_docs: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
) -> DataFrame:
    """Maintain a (doc_id, gh) postings index under change-data-capture
    instead of rebuilding it: retire deleted docs with an anti-join on
    the drop list and append the postings of the arriving batch —
    computed from the BATCH ONLY, so maintenance cost is O(batch), not
    O(corpus). This is how the dd02/dd03/dd09 index survives a
    continuously-ingesting corpus: the cold build (the slowest path in
    the bench) runs once, then each vtable change-feed commit flows
    through here. Algebra: postings_of is per-doc independent, so
    (index ∖ deleted) ∪ postings_of(inserted) == postings_of(snapshot)
    exactly — pinned by the vtable CDC test and the dd11 oracle."""
    out = postings
    if deleted_ids is not None:
        out = out.join(deleted_ids.select("doc_id"), "doc_id", "left_anti")
    if inserted_docs is not None:
        out = out.unionByName(postings_of(inserted_docs))
    return out


def dd11_incremental_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained postings index, fingerprinted per doc:
    start from the base corpus's index (doc_id % 4 != 3), retire the
    drop-list (doc_id % 10 == 7 of the base), append the arriving batch
    (doc_id % 4 == 3) via ``apply_postings_changes``, then emit
    (doc_id, n_grams, gh_xor) — count plus order-free XOR of the gram
    hashes. The DuckDB oracle computes the same fingerprint from a
    BATCH-BUILT index of the final snapshot, so a green row proves
    incremental maintenance ≡ full rebuild, row for row."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    late = F.pmod(F.col("doc_id"), F.lit(LATE_MOD)) == LATE_REM
    base = d.filter(~late)
    arriving = d.filter(late)
    deletes = base.filter(F.pmod(F.col("doc_id"), F.lit(DEL_MOD)) == DEL_REM)
    maintained = apply_postings_changes(
        postings_of(base), inserted_docs=arriving, deleted_ids=deletes
    )
    return maintained.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.expr("bit_xor(gh)").alias("gh_xor"),
    )


# Oracle: batch-build the index of the FINAL snapshot (everything except
# the retired base docs) and fingerprint it identically.
DD11_SQL = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        WHERE NOT (doc_id % {LATE_MOD} <> {LATE_REM} AND doc_id % {DEL_MOD} = {DEL_REM})
    ),
    g AS (SELECT doc_id, {{ngrams}} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, {{ph}} AS gh
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, bit_xor(gh) AS gh_xor
    FROM po GROUP BY doc_id
""".format(ngrams=word_ngrams_sql("ws", 3), ph=poly_hash_sql("gram"))


# ---------------------------------------------------------------------------
# test-set decontamination
# ---------------------------------------------------------------------------

DECON_N = 5  # decontamination n-gram length (longer than dedup's trigrams)
BENCH_MOD = 20  # doc_id % 20 == 0 → the stand-in "benchmark/eval" split


def _decon_grams_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, gh) hashed 5-gram postings persisted once per
    (session, sf_dir) — the decontamination family's shared index
    (dd10's exact join and dd14's bloom probe/bit-set both stream the
    SAME gram set; before r17 each run re-tokenized and re-hashed the
    corpus). Same ``_persisted`` registry/release discipline as the
    trigram postings; dd14's bench cold column carries the build."""
    return _persisted(
        "decon_grams",
        spark,
        sf_dir,
        lambda s, d: hashed_ngrams_of(_docs(s, d).select("doc_id", "text"), DECON_N),
    )


def dd10_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag TRAINING documents that share any
    hashed word 5-gram with the BENCHMARK split (doc_id % 20 == 0, the
    stand-in for an eval set) — the contamination check every serious
    training corpus runs before training. Per contaminated doc: the
    number of distinct shared 5-grams and of benchmark docs hit.

    Scale shape: a REAL eval set is fixed-size (thousands of docs no
    matter how big the corpus grows), so its gram set broadcasts and the
    training grams never shuffle. The ``doc_id % 20`` split here is a
    test-scale stand-in only — it is corpus-PROPORTIONAL, so the
    explicit broadcast below is justified by the fixed-size-eval-table
    assumption, not by this synthetic split; feeding a proportional
    split at 100 TB would need the hint dropped (AQE then picks a
    shuffle join). Grams are the same
    vocabulary-composed hashes as dd02's (no gram strings
    materialized); 5-grams instead of trigrams make matches specific
    enough to mean real overlap."""
    grams = _decon_grams_cached(spark, sf_dir)
    bench = grams.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "gh"
    )
    train = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gh").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


DD10_SQL = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {{ngrams}} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, {{ph}} AS gh
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
    ),
    bench AS (SELECT doc_id AS bench_id, gh FROM po WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT doc_id, gh FROM po WHERE doc_id % {BENCH_MOD} <> 0)
    SELECT t.doc_id,
           CAST(count(DISTINCT t.gh) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
    FROM train t JOIN bench b ON t.gh = b.gh
    GROUP BY t.doc_id
""".format(ngrams=word_ngrams_sql("ws", DECON_N), ph=poly_hash_sql("gram"))


BLOOM_M = 1 << 16  # bloom bitmap size in bits (fixed regardless of corpus)
BLOOM_K = 4  # hash functions per gram
_BLOOM_PERM_BASE = 101  # minhash_perm indices 101..104 — disjoint from LSH's 0..31


def _bloom_pos(h, j: int):
    """j-th bloom bit position of an already-poly-hashed gram."""
    return minhash_perm(h, _BLOOM_PERM_BASE + j) % BLOOM_M


def dd14_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the shape the big corpora actually
    deploy (AI2's ``bff`` for Dolma, RedPajama-v2): the benchmark
    split's 5-gram hashes are folded into a FIXED-SIZE bit set
    (m = 2^16 bits, k = 4 positions per gram via the minhash_perm
    family), and every training gram is probed against it map-side — a
    gram is bloom-positive iff all k of its positions are set. Per
    training doc: gram count, bloom-positive count, their ratio, and a
    contaminated verdict at the Dolma-style 5% threshold (integer
    compare ``20·n_flagged ≥ n_grams`` — no FP in the gate). Unlike
    dd10's exact join this admits false positives (a clean gram whose k
    positions are all set by different benchmark grams) — the price of
    a membership structure whose size is INDEPENDENT of the eval set;
    the verdict column is the filter's real output, the counts are its
    diagnostics.

    Scale shape: the bit set is ≤ m rows no matter how large benchmark
    or corpus get, so each of the k probes is a broadcast LEFT join
    that stays inside the training grams' map stage — the only shuffle
    in the whole operator is the final per-doc aggregation (dd10's
    broadcast needs the fixed-size-eval assumption; the bloom makes it
    unconditional). Arithmetic is integer-only (poly-hash →
    (a·h+b) mod p → mod m), bit-exact across engines.

    Reference: n/a (LLM-pipeline scope; Bloom 1970, Soldaini et al.
    2024 Dolma §2)."""
    grams = _decon_grams_cached(spark, sf_dir)
    # Persisted: each of the k probe joins broadcasts this frame — without
    # the persist, Spark re-derives the benchmark gram pipeline per join.
    bits = _persisted(
        "bloom_bits",
        spark,
        sf_dir,
        lambda s, d: _decon_grams_cached(s, d)
        .filter(F.col("doc_id") % BENCH_MOD == 0)
        .select(
            F.explode(
                F.array(*[_bloom_pos(F.col("gh"), j) for j in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct(),
    )
    probe = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    for j in range(BLOOM_K):
        bj = bits.select(F.col("pos").alias(f"bp{j}"))
        probe = probe.join(
            F.broadcast(bj), _bloom_pos(F.col("gh"), j) == F.col(f"bp{j}"), "left"
        )
    flagged = F.lit(True)
    for j in range(BLOOM_K):
        flagged = flagged & F.col(f"bp{j}").isNotNull()
    return (
        probe.select("doc_id", flagged.cast("int").alias("flagged"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("flagged").cast("long").alias("n_flagged"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_flagged",
            F.round(F.col("n_flagged") / F.col("n_grams") + 1e-9, 4).alias("flag_frac"),
            (F.col("n_flagged") * 20 >= F.col("n_grams")).cast("int").alias("contaminated"),
        )
    )


def _bloom_pos_sql(expr: str, j: int) -> str:
    return f"({minhash_perm_sql(expr, _BLOOM_PERM_BASE + j)}) % {BLOOM_M}"


DD14_SQL = (
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {{ngrams}} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, {{ph}} AS gh
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
    ),
    bits AS (
        SELECT DISTINCT pos FROM (
"""
    + "\n            UNION ALL\n".join(
        f"            SELECT {_bloom_pos_sql('gh', j)} AS pos FROM po WHERE doc_id % {BENCH_MOD} = 0"
        for j in range(BLOOM_K)
    )
    + f"""
        )
    ),
    probe AS (
        SELECT t.doc_id,
               CASE WHEN """
    + " AND ".join(f"h{j}.pos IS NOT NULL" for j in range(BLOOM_K))
    + f""" THEN 1 ELSE 0 END AS flagged
        FROM (SELECT doc_id, gh FROM po WHERE doc_id % {BENCH_MOD} <> 0) t
"""
    + "\n".join(
        f"        LEFT JOIN bits h{j} ON {_bloom_pos_sql('t.gh', j)} = h{j}.pos"
        for j in range(BLOOM_K)
    )
    + """
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(flagged) AS BIGINT) AS n_flagged,
           round(sum(flagged) * 1.0 / count(*) + 1e-9, 4) AS flag_frac,
           CAST(sum(flagged) * 20 >= count(*) AS INT) AS contaminated
    FROM probe
    GROUP BY doc_id
"""
).format(ngrams=word_ngrams_sql("ws", DECON_N), ph=poly_hash_sql("gram"))


# ---------------------------------------------------------------------------
# dd15: MinHash estimator calibration — the dedup analog of ss09's ANN
# recall eval. For every exact near-dup pair (dd02's verified ≥0.5
# Jaccard set), report the 32-hash signature's Jaccard ESTIMATE
# (matching-component fraction, the Broder 1997 unbiased estimator)
# next to the exact value and the absolute error. This is the
# measurement that justifies a signature width before a 100 TB run:
# stddev of the estimator is sqrt(j(1-j)/32) ≈ 0.09 at j=0.5, and the
# per-pair evidence shows exactly where the banding threshold sits
# relative to it. Reference has no dedup ops — LLM-pipeline scope.
# ---------------------------------------------------------------------------


def dd15_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair signature-estimate vs exact-Jaccard report over dd02's
    verified pair set. The signature is the SAME 32 min-aggregates
    dd03 bands (one persisted postings pass, pure codegen); the match
    count is a 32-term integer sum in one projection.

    SCALE shape: adds two signature joins onto the verified pair frame
    — pair-set-sized, not corpus-sized; the signature table is the
    already-persisted index dd03/dd09/dd11 maintain. est_j is an exact
    binary rational (k/32), so no FP contract is needed beyond dd02's
    4-dp jaccard round."""
    pairs = dd02_pairs_cached(spark, sf_dir)
    # read the session-persisted signature table (shared with dd03's
    # bands) instead of re-aggregating the postings per run: the warm
    # cost drops to two pair-set-sized joins (r16)
    sig = _minhash_sig_cached(spark, sf_dir)
    sa = sig.select(F.col("doc_id").alias("id_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_HASHES)])
    sb = sig.select(F.col("doc_id").alias("id_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_HASHES)])
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(N_HASHES)
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_j", matches.cast("double") / F.lit(float(N_HASHES)))
        .select(
            "id_a", "id_b", "jaccard",
            F.col("est_j"),
            F.round(F.abs(F.col("est_j") - F.col("jaccard")), 6).alias("abs_err"),
        )
    )


_SIG_MINS = ", ".join(
    f"min({minhash_perm_sql('gh', i)}) AS m{i}" for i in range(N_HASHES)
)
_SIG_MATCHES = " + ".join(
    f"CAST(sa.m{i} = sb.m{i} AS INT)" for i in range(N_HASHES)
)
DD15_SQL = f"""
    WITH pairs AS ({DD02_SQL}),
    d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {word_ngrams_sql('ws', 3)} AS grams FROM d),
    po AS (
        SELECT DISTINCT doc_id, gh
        FROM (SELECT doc_id, {poly_hash_sql('unnest(grams)')} AS gh FROM g)
    ),
    sig AS (SELECT doc_id, {_SIG_MINS} FROM po GROUP BY doc_id)
    SELECT p.id_a, p.id_b, p.jaccard,
           CAST({_SIG_MATCHES} AS DOUBLE) / {float(N_HASHES)} AS est_j,
           round(abs(CAST({_SIG_MATCHES} AS DOUBLE) / {float(N_HASHES)} - p.jaccard), 6) AS abs_err
    FROM pairs p
    JOIN sig sa ON p.id_a = sa.doc_id
    JOIN sig sb ON p.id_b = sb.doc_id
"""


# ---------------------------------------------------------------------------
# dd16: content-defined chunking (CDC) dedup profile — the rsync/LBFS
# (Muthitacharoen et al. 2001) boundary trick at training-data scale:
# chunk boundaries are declared wherever a W-char window's hash hits
# 0 mod DIV, so boundaries move WITH the content — an insertion shifts
# at most one chunk instead of re-aligning every fixed-width block
# (the failure mode of tx11's fixed spans). Duplicated chunks across
# documents are then an alignment-robust shared-content signal. The
# window hash is the house polynomial hash recomputed per window
# (O(n·W), W=8 constant — exactly replayable in SQL; a production
# chunker swaps in the O(n) incremental Rabin update inside
# mapInPandas, boundaries unchanged).
# ---------------------------------------------------------------------------

CDC_W = 8    # boundary window, chars
CDC_DIV = 32  # boundary divisor → mean chunk ≈ 32 chars

# the text is split to codepoints ONCE per document (the `cs` column);
# each window then folds a cheap integer slice instead of re-running
# substring+split per position (8x less string work, identical values)
_CDC_WINHASH = (
    f"aggregate(slice(cs, i + 1, {CDC_W}), 0L, "
    f"(acc, x) -> (acc * {MULT} + x) % {MOD})"
)
_CDC_BOUNDS = (
    f"array_sort(array_distinct(concat(array(0), "
    f"transform(filter(CASE WHEN size(cs) < {CDC_W} THEN array() "
    f"ELSE sequence(0, size(cs) - {CDC_W}) END, "
    f"i -> {_CDC_WINHASH} % {CDC_DIV} = 0), i -> i + {CDC_W}), "
    f"array(size(cs)))))"
)
_CDC_CHUNKS = (
    f"CASE WHEN size(bs) < 2 THEN array() "
    f"ELSE transform(sequence(0, size(bs) - 2), "
    f"j -> substring(text, element_at(bs, j + 1) + 1, "
    f"element_at(bs, j + 2) - element_at(bs, j + 1))) END"
)


def dd16_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-chunk profile under content-defined
    chunking: per chunk hash shared by ≥ 2 documents, how many
    documents and occurrences carry it (plus min_doc / chunk_len as
    identity evidence). Boundary rule: a chunk ends after any W=8 char
    window whose polynomial hash ≡ 0 (mod 32); document start/end
    close the first/last chunk.

    SCALE shape: chunking is pure whole-stage codegen fused into the
    scan (window hashing, boundary filter and chunk slicing are all
    higher-order array functions — no Python, no shuffle); the only
    exchange is the groupBy on the 8-byte chunk hash, never the chunk
    text, and the ≥2-docs filter makes the output duplicate-sized, not
    corpus-sized. At 100 TB this is one map + one partial-agg shuffle —
    the same shape as dd01 exact dedup, with boundaries that survive
    byte insertions."""
    from ..functions.hashing import poly_hash  # house hash (Column form)

    d = _docs(spark, sf_dir)
    chunks = (
        d.select("doc_id", "text")
        .withColumn("cs", F.expr("transform(split(text, ''), ch -> ascii(ch))"))
        .withColumn("bs", F.expr(_CDC_BOUNDS))
        .select("doc_id", F.explode(F.expr(_CDC_CHUNKS)).alias("chunk"))
    )
    hashed = chunks.select(
        "doc_id",
        poly_hash("chunk").alias("chash"),
        F.length("chunk").cast("long").alias("clen"),
    )
    return (
        hashed.groupBy("chash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("total_occ"),
            F.min("doc_id").alias("min_doc"),
            F.min("clen").alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= 2)
    )


_CDC_WINHASH_SQL = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(string_split(substring(text, i + 1, {CDC_W}), ''), "
    f"ch -> CAST(greatest(unicode(ch), 0) AS BIGINT))), "
    f"(acc, x) -> (acc * {MULT} + x) % {MOD})"
)
DD16_SQL = f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    marks AS (
        SELECT doc_id, text, n,
               list_transform(
                   list_filter(
                       CASE WHEN n >= {CDC_W} THEN range(0, n - {CDC_W} + 1) ELSE [] END,
                       i -> ({_CDC_WINHASH_SQL}) % {CDC_DIV} = 0),
                   i -> i + {CDC_W}) AS mk
        FROM d
    ),
    bounds AS (
        SELECT doc_id, text,
               list_sort(list_distinct(list_concat(list_concat([0], mk), [n]))) AS bs
        FROM marks
    ),
    chunks AS (
        SELECT doc_id,
               unnest(CASE WHEN len(bs) < 2 THEN []
                      ELSE list_transform(range(0, len(bs) - 1),
                           j -> substring(text, bs[j + 1] + 1, bs[j + 2] - bs[j + 1])) END) AS chunk
        FROM bounds
    ),
    hashed AS (
        SELECT doc_id, {poly_hash_sql('chunk')} AS chash,
               CAST(length(chunk) AS BIGINT) AS clen
        FROM chunks
    )
    SELECT chash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS total_occ,
           min(doc_id) AS min_doc,
           min(clen) AS chunk_len
    FROM hashed GROUP BY chash HAVING count(DISTINCT doc_id) >= 2
"""


QUERIES = {
    "dd01_exact_dedup": dd01_exact_dedup,
    "dd02_ngram_jaccard": dd02_ngram_jaccard,
    "dd03_minhash_lsh": dd03_minhash_lsh,
    "dd04_simhash": dd04_simhash,
    "dd05_simhash_pairs": dd05_simhash_pairs,
    "dd06_embed_cosine_dup": dd06_embed_cosine_dup,
    "dd09_incremental_dedup": dd09_incremental_dedup,
    "dd10_decontaminate": dd10_decontaminate,
    "dd11_incremental_postings": dd11_incremental_postings,
    "dd14_bloom_decontaminate": dd14_bloom_decontaminate,
    "dd15_minhash_calibration": dd15_minhash_calibration,
    "dd16_cdc_chunks": dd16_cdc_chunks,
    "dd19_containment": dd19_containment,
    "dd20_graph_rank": dd20_graph_rank,
}

# Operator-authored lineage through dd06's tile barrier (lineage.analyze
# ``declared``): ids and scores all derive from the packed block columns.
DECLARED = {
    "dd06_embed_cosine_dup": {
        "id_a": ["rows_a", "rows_b"],
        "id_b": ["rows_a", "rows_b"],
        "cosine": ["rows_a", "rows_b"],
    },
}

ORACLES = {
    "dd10_decontaminate": DD10_SQL,
    "dd01_exact_dedup": DD01_SQL,
    "dd02_ngram_jaccard": DD02_SQL,
    "dd03_minhash_lsh": DD03_SQL,
    "dd04_simhash": DD04_SQL,
    "dd05_simhash_pairs": DD05_SQL,
    "dd06_embed_cosine_dup": DD06_SQL,
    "dd09_incremental_dedup": DD09_SQL,
    "dd11_incremental_postings": DD11_SQL,
    "dd14_bloom_decontaminate": DD14_SQL,
    "dd15_minhash_calibration": DD15_SQL,
    "dd16_cdc_chunks": DD16_SQL,
    "dd19_containment": DD19_SQL,
    "dd20_graph_rank": DD20_SQL,
}
