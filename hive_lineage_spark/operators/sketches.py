"""Mergeable-sketch operators — the bounded-memory profiling layer a
100 TB curation pipeline runs where exact aggregation stops fitting:
HyperLogLog cardinality (per-slice and merged across slices) and a
Count-Min frequency sketch with an exact evidence leg.

Why sketches are first-class here: ``dq01_profile``'s exact
``count(DISTINCT ...)`` shuffles every distinct value; at 100 TB that
is a corpus-sized exchange per column. An HLL register array is 256
bytes per slice REGARDLESS of input size, partial-aggregates map-side
(``max`` per bucket is commutative), and — unlike exact distinct counts
— MERGES: registers from two slices combine with an elementwise
``greatest`` to give the union's cardinality without touching the raw
data again (``sk03`` demonstrates exactly that, estimating pairwise
source overlap from 20 sketch frames instead of 190 corpus joins).

Cross-engine determinism (the repo-standard recipe): every register is
built from the house polynomial hash (``functions.hashing``, bit-equal
in both engines) with INTEGER-ONLY bucket/rank arithmetic — bucket is
``h & 255``, the HLL rank comes from ``length(bin(h >> 8))`` (both
engines print minimal-width binary), and the register SUM is taken over
exact integers ``1 << (30 - M_j)`` — so even the "approximate" estimates
are bit-identical: the only floating-point steps are one division, one
optional ``ln``, and the house ``round(x + 1e-9, k)``. Count-Min is
integers end to end.

Estimator: Flajolet et al. 2007 (HyperLogLog, AofA), with the
small-range linear-counting correction (E <= 2.5m and V > 0). Count-Min:
Cormode & Muthukrishnan 2005, J. Algorithms 55(1). Hash family is the
same ``(a*h + b) mod p`` ladder MinHash uses (``minhash_perm``).

Production notes, called out per-op: the exact legs (``n_exact``,
``exact_inter``) exist purely as oracle evidence at test scale — they
are precisely the computations the sketches replace at 100 TB, and a
deployment drops them (the ss18/ss19/ss20 ``in_exact`` pattern).

Reference parity note: the reference (hbutani/hive-lineage) models no
sketch layer — these extend the LLM-pipeline surface per the build
mission, alongside dd/tx/tp/dq/web.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    MOD,
    minhash_perm,
    poly_hash,
    poly_hash_sql,
    word_ngrams,
    word_ngrams_sql,
)
from ..sources.registry import load_table
from .evidence import evidence_enabled

M_HLL = 256  # registers = 2^8; bucket = h & 255
# W_PAY / C_EST are derived from the generic helpers BELOW their
# definitions (assigned after them) so they track M_HLL — hard-coded
# m=256 values went silently stale if the register count changed.
# C_EST is alpha_m * m^2 * 2^30 — the fixed numerator of the raw
# estimate, computed once in Python and INLINED (repr) into both
# engines so the double literal is parsed, not re-derived:
# E = C_EST / sum(1 << (30-Mj)). (A power-of-two scale — exact in IEEE.)

HLL_SIGMA = 0.065  # 1.04 / sqrt(M_HLL): the standard-error coefficient

D_CM = 4  # Count-Min depth (hash rows)
W_CM = 512  # Count-Min width; col = perm_r(h) & 511
TOPK_CM = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: every sketch op's dominant cost is the pre-exchange gram
    # explode + hash (the partial aggs ship only register/counter-sized
    # state) — on a single-row-group source that all runs in ONE task
    # without the scan fan-out (r16, guide §2.5 unsplittable input)
    return load_table(spark, sf_dir, "documents", fan_out=True)


# ---------------------------------------------------------------------------
# shared HLL register machinery (Spark + DuckDB twins)
# ---------------------------------------------------------------------------


def _b_bits(m: int) -> int:
    b = m.bit_length() - 1
    assert 1 << b == m, "register count must be a power of two"
    return b


def _w_pay(m: int) -> int:
    """Payload bits above the bucket: MOD < 2^30, so h >> b fits in
    30 - b bits (22 for the default m=256)."""
    return 30 - _b_bits(m)


def _alpha(m: int) -> float:
    """Flajolet 2007's bias-correction constants (exact small-m values,
    the asymptotic formula from m=128 up)."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )


def _c_est(m: int) -> float:
    """alpha * m^2 * 2^30 (the raw-estimate numerator); the *2^(b+b+30)
    scale is a power of two — exact in IEEE, no rounding."""
    return _alpha(m) * float(1 << (2 * _b_bits(m) + 30))


# default-m constants, derived so they track M_HLL (consumed by the
# tests' independent Python model)
W_PAY = _w_pay(M_HLL)
C_EST = _c_est(M_HLL)


def _hll_rho(h: Column, m: int = M_HLL) -> Column:
    """HLL rank of an already-poly-hashed value: 1 + leading zeros of
    the payload ``h >> b`` in a ``_w_pay(m)``-bit window. Integer-only:
    ``length(bin(p))`` is the bit length (both engines print
    minimal-width binary), so rho = W + 1 - bitlen(p); the all-zero
    payload maxes out at W + 1."""
    w = _w_pay(m)
    p = F.shiftright(h, _b_bits(m))
    return (
        F.when(p == 0, F.lit(w + 1))
        .otherwise(F.lit(w + 1) - F.length(F.bin(p)))
        .cast("long")
    )


def _rho_sql(m: int = M_HLL) -> str:
    b, w = _b_bits(m), _w_pay(m)
    return (
        f"CASE WHEN (h >> {b}) = 0 THEN {w + 1} "
        f"ELSE {w + 1} - length(bin(h >> {b})) END"
    )


_RHO_SQL = _rho_sql()


def _hll_registers(hashed: DataFrame, keys: list[str], m: int = M_HLL) -> DataFrame:
    """Sparse HLL registers per key tuple: groupBy(keys, bucket) max-agg
    — Spark executes this with a map-side partial ``max``, so each map
    partition emits at most |keys| x m rows no matter how many items
    it scanned: the sketch property, expressed as a partial agg."""
    return (
        hashed.select(
            *keys,
            F.col("h").bitwiseAND(F.lit(m - 1)).alias("bucket"),
            _hll_rho(F.col("h"), m).alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("mj"))
    )


def _hll_fold(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Fold sparse registers into (n_present, s_sparse) per key tuple.
    Absent buckets are folded in arithmetically (V empty buckets each
    contribute 2^30 to the register sum), so no densifying join is
    needed for single-slice estimates."""
    return regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - mj AS INT))")).alias(
            "s_sparse"
        ),
    )


def _hll_est(n_present: Column, s_sparse: Column, m: int = M_HLL) -> Column:
    """HLL estimate from the folded registers, rounded at 6 dp. The
    register sum S is an exact integer; the raw estimate is ONE double
    division of inlined literals, and the linear-counting branch is one
    ``ln`` of a double ratio of integers — identical in both engines
    (the dq08 FP discipline)."""
    v = F.lit(m) - n_present
    s = s_sparse + v * F.lit(1 << 30)
    raw = F.lit(_c_est(m)) / s
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return F.round(est + 1e-9, 6)


def _hll_est_sql(n_present: str, s_sparse: str, m: int = M_HLL) -> str:
    v = f"({m} - {n_present})"
    s = f"({s_sparse} + {v} * (CAST(1 AS BIGINT) << 30))"
    raw = f"({_c_est(m)!r} / {s})"
    return (
        f"round(CASE WHEN {raw} <= {2.5 * m!r} AND {v} > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / {v}) "
        f"ELSE {raw} END + 1e-9, 6)"
    )


# ---------------------------------------------------------------------------
# sk01: HLL distinct-shingle cardinality per language
# ---------------------------------------------------------------------------


def sk01_hll_distinct(
    spark: SparkSession, sf_dir: str, evidence: bool | None = None
) -> DataFrame:
    """Per-language distinct 3-gram cardinality by HyperLogLog — the
    sizing pass a dedup stage runs BEFORE choosing MinHash/LSH
    parameters (dd15's calibration consumes exactly this estimate):
    how many distinct shingles does each language slice carry?

    Scale shape: shingle explode -> hash -> TWO narrow partial aggs
    (max per (lang, bucket) caps every map partition at 5x256 rows,
    then one fold to 5 rows). Nothing post-scan is corpus-sized; the
    shuffle moves registers, not shingles. ``n_exact`` (an exact
    countDistinct — the corpus-sized exchange HLL exists to avoid) and
    ``rel_err_pct`` are the oracle-evidence leg; ``evidence=False``
    (or SPARK_GRAFT_EVIDENCE=0) is the production mode that drops them
    — plan-pinned: no gram-keyed exchange remains. ``rel_err_pct`` is
    derived from the ALREADY-ROUNDED estimate, so both engines divide
    identical doubles."""
    g = _docs(spark, sf_dir).select(
        "lang", F.explode(word_ngrams("text", 3)).alias("gram")
    )
    hashed = g.select("lang", poly_hash("gram").alias("h"))
    folded = _hll_fold(_hll_registers(hashed, ["lang"]), ["lang"])
    est = folded.select(
        "lang",
        F.col("n_present").cast("int").alias("n_regs"),
        _hll_est(F.col("n_present"), F.col("s_sparse")).alias("hll_est"),
    )
    if not evidence_enabled(evidence):
        return est.select("lang", "hll_est", "n_regs")
    exact = g.groupBy("lang").agg(F.countDistinct("gram").alias("n_exact"))
    return est.join(exact, "lang").select(
        "lang",
        "n_exact",
        "hll_est",
        "n_regs",
        F.round((F.col("hll_est") - F.col("n_exact")) / F.col("n_exact") * 100 + 1e-9, 2).alias(
            "rel_err_pct"
        ),
    )


SK01_SQL = f"""
    WITH d AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT lang, unnest({word_ngrams_sql('ws', 3)}) AS gram FROM d),
    hh AS (SELECT lang, {poly_hash_sql('gram')} AS h FROM g),
    regs AS (
        SELECT lang, (h & 255) AS bucket, CAST(max({_RHO_SQL}) AS BIGINT) AS mj
        FROM hh GROUP BY 1, 2
    ),
    folded AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_present,
               CAST(sum(CAST(1 AS BIGINT) << CAST(30 - mj AS INT)) AS BIGINT) AS s_sparse
        FROM regs GROUP BY lang
    ),
    ex AS (SELECT lang, CAST(count(DISTINCT gram) AS BIGINT) AS n_exact FROM g GROUP BY lang)
    SELECT lang, n_exact, hll_est, n_regs,
           round((hll_est - n_exact) / n_exact * 100 + 1e-9, 2) AS rel_err_pct
    FROM (
        SELECT lang, n_exact, CAST(n_present AS INT) AS n_regs,
               {_hll_est_sql('n_present', 's_sparse')} AS hll_est
        FROM folded JOIN ex USING (lang)
    )
"""


# ---------------------------------------------------------------------------
# sk02: Count-Min heavy hitters
# ---------------------------------------------------------------------------


def sk02_countmin_topk(
    spark: SparkSession,
    sf_dir: str,
    evidence: bool | None = None,
    watchlist: list[str] | None = None,
) -> DataFrame:
    """Count-Min frequency estimates for the corpus's top-{TOPK_CM}
    words: the bounded-memory token-frequency profile (stopword-ratio
    gates, vocabulary drift alarms) that replaces an exact
    groupBy(word) at 100 TB. Depth {D_CM} x width {W_CM} counters; the
    estimate for a word is min over rows of its counter — an
    overestimate by construction (collisions only ADD), so
    ``overcount = cm_est - n_exact >= 0`` always; integers end to end.

    Scale shape: the counter build is ONE partial agg whose map-side
    output is capped at {D_CM}x{W_CM} = 2048 cells per partition
    regardless of corpus size (the sketch property); the probe side
    broadcasts the 2048-row counter table into a map-side join against
    {TOPK_CM} keys. The exact word agg feeding ``n_exact`` (and the
    candidate list) is the evidence leg: ``evidence=False`` is the
    production mode — candidates come from the caller's ``watchlist``
    (an external keyword list / per-partition local top-k), only the
    sketch is probed (output: word, cm_est), and the word-keyed
    corpus exchange disappears from the plan (pinned)."""
    occ = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    hashed = occ.select("word", poly_hash("word").alias("h"))

    def _cols(prefix: DataFrame) -> DataFrame:
        rc = F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    minhash_perm(F.col("h"), r).bitwiseAND(F.lit(W_CM - 1)).alias("c"),
                )
                for r in range(D_CM)
            ]
        )
        return prefix.select(
            *[c for c in prefix.columns if c != "h"], F.explode(rc).alias("rc")
        ).select(*[c for c in prefix.columns if c != "h"], "rc.r", "rc.c")

    cells = _cols(hashed).groupBy("r", "c").agg(F.count(F.lit(1)).alias("cnt"))
    if not evidence_enabled(evidence):
        if not watchlist:
            raise ValueError(
                "sk02 with evidence=False probes an external watchlist — "
                "pass watchlist=[...] (production supplies its keyword "
                "list; the exact candidate agg is the evidence leg)"
            )
        wl = spark.createDataFrame([(w,) for w in watchlist], "word string")
        keys = _cols(wl.select("word", poly_hash("word").alias("h")))
        # LEFT join: a watchlist word may hash to an all-empty cell —
        # its Count-Min estimate is 0, not a dropped row
        return (
            keys.join(F.broadcast(cells), ["r", "c"], "left")
            .groupBy("word")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_est"))
        )
    topk = (
        occ.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("word"))
        .limit(TOPK_CM)
    )
    keys = _cols(topk.select("word", "n_exact", poly_hash("word").alias("h")))
    return (
        keys.join(F.broadcast(cells), ["r", "c"])
        .groupBy("word", "n_exact")
        .agg(F.min("cnt").alias("cm_est"))
        .select(
            "word",
            "n_exact",
            "cm_est",
            (F.col("cm_est") - F.col("n_exact")).alias("overcount"),
        )
    )


def _cm_cols_sql(src: str, keep: str) -> str:
    """(r, c) probe keys for each of the D_CM hash rows — the same
    ``(a*h + b) mod p`` ladder as minhash_perm, masked to the width."""
    return (
        f"SELECT {keep}, r, (((h * (2*r + 3) + (7*r + 1)) % {MOD}) & {W_CM - 1}) AS c "
        f"FROM ({src}) CROSS JOIN (SELECT unnest(range({D_CM})) AS r) rs"
    )


SK02_SQL = f"""
    WITH occ AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    hh AS (SELECT word, {poly_hash_sql('word')} AS h FROM occ),
    cells AS (
        SELECT r, c, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_cm_cols_sql('SELECT word, h FROM hh', 'word')})
        GROUP BY r, c
    ),
    topk AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n_exact FROM occ
        GROUP BY word ORDER BY n_exact DESC, word LIMIT {TOPK_CM}
    ),
    keys AS (
        {_cm_cols_sql(f"SELECT word, n_exact, {poly_hash_sql('word')} AS h FROM topk",
                      'word, n_exact')}
    )
    SELECT word, n_exact, CAST(min(cnt) AS BIGINT) AS cm_est,
           CAST(min(cnt) - n_exact AS BIGINT) AS overcount
    FROM keys JOIN cells USING (r, c)
    GROUP BY word, n_exact
"""


# ---------------------------------------------------------------------------
# sk03: pairwise source overlap by HLL register merge
# ---------------------------------------------------------------------------


def _source_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (source, gram) frame, persisted per (session, sf_dir) —
    shared by sk03 (register build + exact evidence leg) and sk05 (the
    per-source vocabulary estimate): one corpus tokenize/dedup pass
    feeds every source-level consumer."""
    from .dedup import _persisted

    return _persisted(
        "sk03_grams",
        spark,
        sf_dir,
        lambda s, d: _docs(s, d)
        .select("source", F.explode(word_ngrams("text", 3)).alias("gram"))
        .distinct(),
    )


def sk03_hll_source_overlap(
    spark: SparkSession, sf_dir: str, evidence: bool | None = None
) -> DataFrame:
    """Pairwise content overlap between sources, from MERGED HLL
    sketches — the crawl-dump / feed overlap triage (how much of src_b
    is already in src_a?) that decides which sources to dedup jointly.
    Union registers are the elementwise ``greatest`` of the two
    sources' registers (the defining mergeability property exact
    distinct counts lack); the intersection comes from
    inclusion-exclusion on the ROUNDED estimates, clamped at 0.

    Precision honesty: HLL inclusion-exclusion error scales with the
    UNION size (sigma = 1.04/sqrt(m) of |A u B|), not the intersection
    — small overlaps between large sources drown in sketch noise. The
    output therefore carries its own ``noise_floor`` (sigma x
    est_union) and a ``resolvable`` flag (est_inter > 2 x floor):
    downstream dedup planning trusts the estimate only when flagged,
    and falls back to the exact pair join (or a bigger m) otherwise.

    Scale shape: the corpus is touched ONCE to build 20 sketch frames
    (the sk01 partial-agg shape); all 190-pair combinatorics then run
    on a <= 20x256-row register frame — densify (broadcast bucket
    range), self-join on bucket, fold. Both shared artifacts persist
    per (session, sf_dir) — the distinct (source, gram) frame feeds
    the register build AND the exact evidence leg, and the dense
    register frame has three consumers (singles + both pair sides) —
    so the corpus tokenize/hash pipeline executes once, not per
    consumer (the tx12/dd02 exchange-reuse lesson; plan-pinned). At
    100 TB the pair stage costs the same as at 1 GB. ``exact_inter``
    (a gram-level self-join across source pairs — the quadratic join
    the sketches replace) is the oracle-evidence leg; ``evidence=False``
    is the production mode that drops it AND the gram distinct+persist
    with it — the registers then build from ONE un-persisted corpus
    pass (HLL max-aggregation is duplicate-insensitive, so the distinct
    was only ever for the exact leg's benefit), and the only exchange
    left is (source, bucket)-keyed: capped at |sources| x m rows
    post-map-combine regardless of corpus size (plan-pinned)."""
    ev = evidence_enabled(evidence)

    def _gram_stream(s: SparkSession, d: str) -> DataFrame:
        # production register feed: no distinct, no persist — dups
        # cannot move a max-aggregated register
        return _docs(s, d).select(
            "source", F.explode(word_ngrams("text", 3)).alias("gram")
        )

    po = _source_grams(spark, sf_dir) if ev else None

    def _build_dense(s: SparkSession, d: str) -> DataFrame:
        grams = po if ev else _gram_stream(s, d)
        hashed = grams.select("source", poly_hash("gram").alias("h"))
        regs = _hll_registers(hashed, ["source"])
        # densify so absent buckets merge as 0 (register frames are
        # tiny: |sources| x 256 rows — broadcast everywhere).
        buckets = s.range(M_HLL).select(F.col("id").cast("long").alias("bucket"))
        srcs = regs.select("source").distinct()
        return (
            srcs.crossJoin(F.broadcast(buckets))
            .join(F.broadcast(regs), ["source", "bucket"], "left")
            .select("source", "bucket", F.coalesce("mj", F.lit(0)).alias("mj"))
        )

    from .dedup import _persisted

    dense = _persisted("sk03_regs_dense", spark, sf_dir, _build_dense)
    singles = (
        dense.filter(F.col("mj") > 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_present"), F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - mj AS INT))")
        ).alias("s_sparse"))
        .select("source", _hll_est(F.col("n_present"), F.col("s_sparse")).alias("est"))
    )
    a, b = dense.alias("a"), F.broadcast(dense).alias("b")
    merged = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.source") < F.col("b.source")))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            F.greatest("a.mj", "b.mj").alias("mj"),
        )
        .filter(F.col("mj") > 0)
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_present"), F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - mj AS INT))")
        ).alias("s_sparse"))
        .select(
            "src_a",
            "src_b",
            _hll_est(F.col("n_present"), F.col("s_sparse")).alias("est_union"),
        )
    )
    ea = F.broadcast(singles.withColumnRenamed("source", "src_a").withColumnRenamed("est", "est_a"))
    eb = F.broadcast(singles.withColumnRenamed("source", "src_b").withColumnRenamed("est", "est_b"))
    est_cols = [
        F.col("src_a"),
        F.col("src_b"),
        F.col("est_a"),
        F.col("est_b"),
        F.col("est_union"),
        F.round(
            F.greatest(
                F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
            )
            + 1e-9,
            6,
        ).alias("est_inter"),
        F.round(F.lit(HLL_SIGMA) * F.col("est_union") + 1e-9, 6).alias(
            "noise_floor"
        ),
    ]
    joined = merged.join(ea, "src_a").join(eb, "src_b")
    if not ev:
        assembled = joined.select(*est_cols)
    else:
        pa, pb = po.alias("pa"), po.alias("pb")
        exact = (
            pa.join(
                pb,
                (F.col("pa.gram") == F.col("pb.gram"))
                & (F.col("pa.source") < F.col("pb.source")),
            )
            .groupBy(F.col("pa.source").alias("src_a"), F.col("pb.source").alias("src_b"))
            .agg(F.count(F.lit(1)).alias("exact_inter"))
        )
        assembled = joined.join(F.broadcast(exact), ["src_a", "src_b"], "left").select(
            *est_cols,
            F.coalesce(F.col("exact_inter"), F.lit(0)).cast("long").alias("exact_inter"),
        )
    return assembled.withColumn(
        "resolvable",
        (F.col("est_inter") > 2 * F.col("noise_floor")).cast("int"),
    )


SK03_SQL = f"""
    WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
    g AS (
        SELECT DISTINCT source, gram FROM (
            SELECT source, unnest({word_ngrams_sql('ws', 3)}) AS gram FROM d
        )
    ),
    hh AS (SELECT source, {poly_hash_sql('gram')} AS h FROM g),
    regs AS (
        SELECT source, (h & 255) AS bucket, CAST(max({_RHO_SQL}) AS BIGINT) AS mj
        FROM hh GROUP BY 1, 2
    ),
    dense AS (
        SELECT s.source, b.bucket, coalesce(r.mj, 0) AS mj
        FROM (SELECT DISTINCT source FROM regs) s
        CROSS JOIN (SELECT unnest(range({M_HLL})) AS bucket) b
        LEFT JOIN regs r ON r.source = s.source AND r.bucket = b.bucket
    ),
    singles AS (
        SELECT source, {_hll_est_sql('n_present', 's_sparse')} AS est
        FROM (
            SELECT source, CAST(count(*) AS BIGINT) AS n_present,
                   CAST(sum(CAST(1 AS BIGINT) << CAST(30 - mj AS INT)) AS BIGINT) AS s_sparse
            FROM dense WHERE mj > 0 GROUP BY source
        )
    ),
    merged AS (
        SELECT src_a, src_b, {_hll_est_sql('n_present', 's_sparse')} AS est_union
        FROM (
            SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_present,
                   CAST(sum(CAST(1 AS BIGINT) << CAST(30 - mj AS INT)) AS BIGINT) AS s_sparse
            FROM (
                SELECT a.source AS src_a, b.source AS src_b,
                       greatest(a.mj, b.mj) AS mj
                FROM dense a JOIN dense b
                ON a.bucket = b.bucket AND a.source < b.source
            ) WHERE mj > 0 GROUP BY src_a, src_b
        )
    ),
    exact AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, est_a, est_b, est_union, est_inter, noise_floor,
           exact_inter,
           CAST(est_inter > 2 * noise_floor AS INT) AS resolvable
    FROM (
        SELECT src_a, src_b, ea.est AS est_a, eb.est AS est_b, est_union,
               round(greatest(0.0, ea.est + eb.est - est_union) + 1e-9, 6) AS est_inter,
               round({HLL_SIGMA!r} * est_union + 1e-9, 6) AS noise_floor,
               CAST(coalesce(x.exact_inter, 0) AS BIGINT) AS exact_inter
        FROM merged
        JOIN singles ea ON ea.source = src_a
        JOIN singles eb ON eb.source = src_b
        LEFT JOIN exact x USING (src_a, src_b)
    )
"""


# ---------------------------------------------------------------------------
# sk04: HLL precision ladder (calibration)
# ---------------------------------------------------------------------------

SK04_MS = [64, 256, 1024]


def sk04_hll_precision_ladder(
    spark: SparkSession, sf_dir: str, evidence: bool | None = None
) -> DataFrame:
    """HLL precision calibration: the corpus-level distinct-shingle
    count estimated at m = 64 / 256 / 1024 registers side by side, with
    the theoretical error coefficient and the realized error — the
    memory-vs-accuracy table a deployment reads before fixing the
    register size per slice (dd15's calibration role, for cardinality
    instead of Jaccard). 8x the memory buys half the standard error
    (sigma = 1.04/sqrt(m)); the sketch is 64 B–1 KiB per slice either
    way, so the real constraint at 100 TB is slice COUNT x m.

    Scale shape: ONE corpus aggregation pass feeds all three ladders
    (a union of three per-m passes gets column-pruned per branch, so
    exchange reuse never fires — the r12 ADVICE finding; this is the
    structural fix). Because every m divides the finest
    (bucket_64 = bucket_1024 & 63), the shared pass groups by the
    FINEST bucket and max-aggregates the three per-m ranks side by
    side; the <= 1024-row shared register frame then EXPLODES into
    (m, bucket_m, mj) rows and one register-sized re-agg per the max
    associativity folds each rung — a single linear plan whose only
    corpus-sized stage is the first partial agg (plan-pinned: ONE
    documents scan with evidence off). The exact leg (one
    countDistinct — the corpus-keyed exchange the ladder exists to
    size-replace) is the evidence baseline; ``evidence=False`` is the
    production mode that drops it."""
    g = _docs(spark, sf_dir).select(F.explode(word_ngrams("text", 3)).alias("gram"))
    hashed = g.select(poly_hash("gram").alias("h"))
    fine = max(SK04_MS)
    shared = (
        hashed.select(
            F.col("h").bitwiseAND(F.lit(fine - 1)).alias("bucket"),
            *[_hll_rho(F.col("h"), m).alias(f"rho_{m}") for m in SK04_MS],
        )
        .groupBy("bucket")
        .agg(*[F.max(f"rho_{m}").alias(f"mj_{m}") for m in SK04_MS])
    )
    rungs = shared.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.col("bucket").bitwiseAND(F.lit(m - 1)).alias("bucket"),
                        F.col(f"mj_{m}").alias("mj"),
                    )
                    for m in SK04_MS
                ]
            )
        ).alias("x")
    ).select("x.*")
    folded = _hll_fold(rungs.groupBy("m", "bucket").agg(F.max("mj").alias("mj")), ["m"])

    def _per_m(make) -> Column:
        e = None
        for m in SK04_MS:
            e = (e.when if e is not None else F.when)(F.col("m") == m, make(m))
        return e

    out = folded.select(
        F.col("m").cast("int").alias("m"),
        _per_m(
            lambda m: F.round(F.lit(1.04) / F.sqrt(F.lit(float(m))) * 100 + 1e-9, 2)
        ).alias("sigma_pct"),
        _per_m(
            lambda m: _hll_est(F.col("n_present"), F.col("s_sparse"), m)
        ).alias("hll_est"),
    )
    if not evidence_enabled(evidence):
        return out
    exact = g.select(F.countDistinct("gram").alias("n_exact"))
    return (
        out.crossJoin(F.broadcast(exact))
        .select(
            "m",
            "sigma_pct",
            "hll_est",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(
                (F.col("hll_est") - F.col("n_exact")) / F.col("n_exact") * 100 + 1e-9,
                2,
            ).alias("rel_err_pct"),
        )
    )


def _sk04_sql() -> str:
    ladders = " UNION ALL ".join(
        f"""
        SELECT {m} AS m,
               round(1.04 / sqrt({float(m)!r}) * 100 + 1e-9, 2) AS sigma_pct,
               {_hll_est_sql('n_present', 's_sparse', m)} AS hll_est
        FROM (
            SELECT CAST(count(*) AS BIGINT) AS n_present,
                   CAST(sum(CAST(1 AS BIGINT) << CAST(30 - mj AS INT)) AS BIGINT) AS s_sparse
            FROM (
                SELECT (h & {m - 1}) AS bucket, CAST(max({_rho_sql(m)}) AS BIGINT) AS mj
                FROM hh GROUP BY 1
            )
        )"""
        for m in SK04_MS
    )
    return f"""
    WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT unnest({word_ngrams_sql('ws', 3)}) AS gram FROM d),
    hh AS (SELECT {poly_hash_sql('gram')} AS h FROM g),
    ex AS (SELECT CAST(count(DISTINCT gram) AS BIGINT) AS n_exact FROM g),
    ladder AS ({ladders})
    SELECT m, sigma_pct, hll_est, n_exact,
           round((hll_est - n_exact) / n_exact * 100 + 1e-9, 2) AS rel_err_pct
    FROM ladder CROSS JOIN ex
"""


SK04_SQL = _sk04_sql()


# ---------------------------------------------------------------------------
# sk05: per-source intake report (the round's layers composed)
# ---------------------------------------------------------------------------

SK05_MAX_DUP_RATE = 0.2
SK05_MIN_VOCAB = 100.0


def sk05_source_intake_report(
    spark: SparkSession, sf_dir: str, evidence: bool | None = None
) -> DataFrame:
    """Per-source intake QA report — the one-page verdict a data team
    reads before ACCEPTING a crawl dump / feed into the corpus: volume
    (docs, languages, mean length), exact-duplicate rate (dd01's
    corpus-wide text-hash signal rolled up per source, web02's shape at
    the source level), estimated vocabulary (the sk01 HLL off the
    SHARED persisted (source, gram) frame — one tokenize pass feeds
    sk03 and this report), and a fixed-threshold accept verdict
    (dup_rate <= {SK05_MAX_DUP_RATE}, vocab >= {SK05_MIN_VOCAB:g}).

    ``evidence=False`` (the sk03 contract): the gram distinct+persist —
    an artifact of sk03's exact-evidence leg — is skipped and the vocab
    registers build from one un-persisted corpus pass (duplicate grams
    cannot move a max-aggregated register, so values are identical;
    plan-pinned). The dup-rate leg is the op's OWN signal, not
    evidence, and runs in both modes.

    SCALE shape: one text-hash pass (map-side combined), one corpus
    scan into the shared gram frame, register-sized HLL folds, and
    source-count-sized rollups; the dup-flag join is AQE-chosen (the
    web02 pattern — at 100 TB the dup set may outgrow a broadcast).
    Mean length divides two exact integers (sum, count) so the double
    is identical cross-engine."""
    d = _docs(spark, sf_dir).select("source", "lang", "text", "n_chars")
    th = d.select("source", F.md5("text").alias("h"))
    dup = (
        th.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("h", F.lit(1).alias("is_dup"))
    )
    dups = (
        th.join(dup, "h", "left")
        .groupBy("source")
        .agg(F.sum(F.coalesce("is_dup", F.lit(0))).cast("long").alias("n_dups"))
    )
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    if evidence_enabled(evidence):
        grams = _source_grams(spark, sf_dir)
    else:
        grams = _docs(spark, sf_dir).select(
            "source", F.explode(word_ngrams("text", 3)).alias("gram")
        )
    vocab = (
        _hll_fold(_hll_registers(grams.select("source", poly_hash("gram").alias("h")), ["source"]), ["source"])
        .select("source", _hll_est(F.col("n_present"), F.col("s_sparse")).alias("vocab_est"))
    )
    rep = (
        base.join(dups, "source")
        .join(F.broadcast(vocab), "source")
        .select(
            "source",
            "n_docs",
            "n_langs",
            F.round(F.col("sum_chars").cast("double") / F.col("n_docs") + 1e-9, 2).alias(
                "avg_chars"
            ),
            "n_dups",
            F.round(F.col("n_dups") / F.col("n_docs") + 1e-9, 4).alias("dup_rate"),
            "vocab_est",
        )
    )
    return rep.withColumn(
        "accept",
        (
            (F.col("dup_rate") <= SK05_MAX_DUP_RATE)
            & (F.col("vocab_est") >= SK05_MIN_VOCAB)
        ).cast("int"),
    )


SK05_SQL = f"""
    WITH d AS (SELECT source, lang, text, n_chars FROM documents),
    th AS (SELECT source, md5(text) AS h FROM d),
    dup AS (SELECT h, 1 AS is_dup FROM th GROUP BY h HAVING count(*) > 1),
    dups AS (
        SELECT source,
               CAST(sum(CASE WHEN x.is_dup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
        FROM th LEFT JOIN dup x USING (h) GROUP BY source
    ),
    base AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM d GROUP BY source
    ),
    ws AS (SELECT source, string_split(text, ' ') AS ws FROM d),
    g AS (
        SELECT DISTINCT source, gram FROM (
            SELECT source, unnest({word_ngrams_sql('ws', 3)}) AS gram FROM ws
        )
    ),
    hh AS (SELECT source, {poly_hash_sql('gram')} AS h FROM g),
    regs AS (
        SELECT source, (h & 255) AS bucket, CAST(max({_RHO_SQL}) AS BIGINT) AS mj
        FROM hh GROUP BY 1, 2
    ),
    vocab AS (
        SELECT source, {_hll_est_sql('n_present', 's_sparse')} AS vocab_est
        FROM (
            SELECT source, CAST(count(*) AS BIGINT) AS n_present,
                   CAST(sum(CAST(1 AS BIGINT) << CAST(30 - mj AS INT)) AS BIGINT) AS s_sparse
            FROM regs GROUP BY source
        )
    )
    SELECT source, n_docs, n_langs,
           round(CAST(sum_chars AS DOUBLE) / n_docs + 1e-9, 2) AS avg_chars,
           n_dups,
           round(n_dups * 1.0 / n_docs + 1e-9, 4) AS dup_rate,
           vocab_est,
           CAST(round(n_dups * 1.0 / n_docs + 1e-9, 4) <= {SK05_MAX_DUP_RATE!r}
                AND vocab_est >= {SK05_MIN_VOCAB!r} AS INT) AS accept
    FROM base JOIN dups USING (source) JOIN vocab USING (source)
"""


# ---------------------------------------------------------------------------
# incremental register maintenance (mergeability in TIME; sk03 is
# mergeability in SPACE) — library surface, exercised by tests and the
# streaming monitor rather than an oracle query (the estimates it
# produces are sk01's, already oracle-certified).
# ---------------------------------------------------------------------------


def hll_registers_of(df: DataFrame, keys: list[str], item: str) -> DataFrame:
    """Public register builder: (keys..., bucket, mj) from a string
    item column — the artifact a pipeline CHECKPOINTS per slice/commit
    instead of raw distinct sets."""
    return _hll_registers(df.select(*keys, poly_hash(item).alias("h")), keys)


def merge_hll_registers(old: DataFrame, batch: DataFrame, keys: list[str]) -> DataFrame:
    """O(batch) incremental maintenance: max-merge a stored register
    frame with the arriving batch's registers — the sketch-layer
    analogue of dd11's postings maintenance (never a corpus rebuild).
    Union + one partial-agg max per (keys, bucket); both inputs are
    register-sized, so maintenance cost is independent of history
    length. The merged frame estimates the UNION of everything ever
    observed (inserts only — HLL cannot retract; retiring a slice means
    re-merging the surviving slices' checkpointed registers, which is
    why production keeps them per slice)."""
    return (
        old.unionByName(batch)
        .groupBy(*keys, "bucket")
        .agg(F.max("mj").alias("mj"))
    )


def estimate_from_registers(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Fold any register frame (stored, merged, or streamed) into
    per-key cardinality estimates — one estimator for the whole layer."""
    folded = _hll_fold(regs, keys)
    return folded.select(
        *keys, _hll_est(F.col("n_present"), F.col("s_sparse")).alias("hll_est")
    )


QUERIES = {
    "sk01_hll_distinct": sk01_hll_distinct,
    "sk02_countmin_topk": sk02_countmin_topk,
    "sk03_hll_source_overlap": sk03_hll_source_overlap,
    "sk04_hll_precision_ladder": sk04_hll_precision_ladder,
    "sk05_source_intake_report": sk05_source_intake_report,
}

ORACLES = {
    "sk01_hll_distinct": SK01_SQL,
    "sk02_countmin_topk": SK02_SQL,
    "sk03_hll_source_overlap": SK03_SQL,
    "sk04_hll_precision_ladder": SK04_SQL,
    "sk05_source_intake_report": SK05_SQL,
}
