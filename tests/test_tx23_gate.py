"""tx23 fastText-shape classifier gate invariants: the closed-form
naive-Bayes weights must separate the training slices (positives score
higher on average than negatives), the verdict must be exactly the
log-odds sign, and the feature count must equal the bigram count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_lineage_spark.operators.text import tx23_fasttext_gate
from hive_lineage_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_tx23_covers_corpus_and_verdict_is_sign(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    rep = tx23_fasttext_gate(spark, SF)
    assert rep.count() == docs.count()  # every doc has >= 2 words here
    bad = rep.filter(
        ((F.col("score") > 0) & (F.col("keep") != 1))
        | ((F.col("score") <= 0) & (F.col("keep") != 0))
    )
    assert bad.count() == 0
    joined = rep.join(
        docs.select("doc_id", (F.size(F.split("text", " ")) - 1).alias("n_bigrams")),
        "doc_id",
    )
    assert joined.filter(F.col("n_feats") != F.col("n_bigrams")).count() == 0


def test_tx23_empty_training_slice_stays_finite(spark, tmp_path):
    """Reddens the pre-r14 unsmoothed prior: a corpus where one training
    slice is EMPTY (here: no negatives — every doc_id % 3 is 0 or 1)
    used to turn the prior's F.log(0) into NULL scores and NULL keep
    verdicts in Spark while DuckDB's ln(0) diverged. The Laplace-
    smoothed prior (ln(np+1) − ln(nn+1)) must keep every score finite
    and every verdict non-null on exactly that corpus."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            # doc_ids 0,1,3,4,6,7: slices {0, 1} only — the negative
            # training slice (% 3 == 2) is empty
            "doc_id": pa.array([0, 1, 3, 4, 6, 7], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma", "beta gamma delta", "alpha beta",
                 "gamma delta", "beta beta gamma", "delta alpha beta"]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    rows = tx23_fasttext_gate(spark, str(tmp_path)).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["score"] is not None and math.isfinite(r["score"]), r
        assert r["keep"] in (0, 1), r


def test_tx23_separates_training_slices(spark):
    rep = tx23_fasttext_gate(spark, SF).withColumn("slice", F.col("doc_id") % 3)
    means = {
        r["slice"]: r["m"]
        for r in rep.groupBy("slice").agg(F.avg("score").alias("m")).collect()
    }
    # positives (slice 1) must out-score negatives (slice 2); unseen
    # docs (slice 0) land strictly between the training extremes on
    # average (no fallback disjunct — a weight-rule regression that
    # pushes the held-out slice outside the training envelope must
    # redden this, not slip past an abs() escape hatch)
    assert means[1] > means[2]
    assert means[2] < means[0] < means[1], means
