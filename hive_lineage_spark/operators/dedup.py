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
- n-gram Jaccard is the classic shingle-inverted-index join: explode
  distinct shingles, self-join on shingle, count per pair. At 100 TB the
  hot shingles dominate the join — drop shingles above a document-
  frequency cap (stop-shingle pruning) before the join; the candidate
  count drops superlinearly and recall at high thresholds is unaffected.
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
    minhash_perm,
    minhash_perm_sql,
    poly_hash,
    poly_hash_sql,
    word_ngrams,
    word_ngrams_sql,
)
from ..sources.registry import load_table

N_HASHES = 32
N_BANDS = 16  # × 2 rows per band
JACCARD_T = 0.5
COSINE_T = 0.5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


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


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", word_ngrams("text", 3).alias("grams"))


def dd02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard pairs ≥ 0.5: shingle inverted-index
    self-join → per-pair intersection counts → |A∩B|/(|A|+|B|-|A∩B|).
    Jaccard is emitted as round(x, 4): intersections/sizes are integers so
    the division is identical in both engines."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("grams").alias("n_grams"))
    ex = sh.select("doc_id", F.explode("grams").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


DD02_SQL = f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, {word_ngrams_sql('ws', 3)} AS grams FROM d),
    sizes AS (SELECT doc_id, len(grams) AS n_grams FROM g),
    ex AS (SELECT doc_id, unnest(grams) AS gr FROM g),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM ex a JOIN ex b ON a.gr = b.gr AND a.doc_id < b.doc_id
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
# MinHash + LSH
# ---------------------------------------------------------------------------


def dd03_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs ≥ 0.5 Jaccard: shingle → poly-hash →
    32 permutations → min per permutation (signature) → 16 bands of 2 →
    band-bucket self-join for candidates → exact-Jaccard verification.
    Verification makes the output exact (and oracle-checkable); LSH only
    prunes the pair space — the property that matters at 100 TB, where the
    band join shuffles O(n·b) tiny keys instead of O(n²) comparisons."""
    sh = _shingles(spark, sf_dir)
    hashed = sh.select(
        "doc_id",
        F.transform(F.col("grams"), lambda g: _poly_hash_expr(g)).alias("hs"),
        F.size("grams").alias("n_grams"),
    )
    sig = hashed.select(
        "doc_id",
        "n_grams",
        F.array(
            *[F.array_min(F.transform(F.col("hs"), lambda h: minhash_perm(h, i))) for i in range(N_HASHES)]
        ).alias("sig"),
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws("_", F.slice(F.col("sig"), b * 2 + 1, 2)).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
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
    # exact verification of candidates
    g = sh.select(F.col("doc_id"), F.col("grams"))
    verified = (
        cand.join(g.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga")), "id_a")
        .join(g.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn("jaccard", F.col("inter") / (F.size("ga") + F.size("gb") - F.col("inter")))
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


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
    bit j of the signature is the sign of Σ_tokens (±1 by bit j of h(token))."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tok = tok.withColumn("h", _poly_hash_expr(F.col("w")))
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
    """Per-document 32-bit SimHash signature (near-dup sketch)."""
    return _simhash(spark, sf_dir)


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
    on (band, byte) keys instead of an n² bit comparison."""
    sim = _simhash(spark, sf_dir)
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
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


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


def dd06_embed_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.5), computed with JVM
    higher-order functions (zip_with dot product) over double-cast vectors.
    Brute-force n² at test scale; the 100 TB path is the IVF/LSH-bucketed
    variant (similarity.ss02) which prunes the pair space by cell."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e = e.withColumn(
        "norm", F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dot",
            F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x),
        )
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= COSINE_T)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


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


QUERIES = {
    "dd01_exact_dedup": dd01_exact_dedup,
    "dd02_ngram_jaccard": dd02_ngram_jaccard,
    "dd03_minhash_lsh": dd03_minhash_lsh,
    "dd04_simhash": dd04_simhash,
    "dd05_simhash_pairs": dd05_simhash_pairs,
    "dd06_embed_cosine_dup": dd06_embed_cosine_dup,
}

ORACLES = {
    "dd01_exact_dedup": DD01_SQL,
    "dd02_ngram_jaccard": DD02_SQL,
    "dd03_minhash_lsh": DD03_SQL,
    "dd04_simhash": DD04_SQL,
    "dd05_simhash_pairs": DD05_SQL,
    "dd06_embed_cosine_dup": DD06_SQL,
}
