"""tx24/tx25 unigram-LM tokenizer invariants: the trained segmentation
must be a real tokenization (pieces concatenate back to every word,
every word covered), the vocabulary must be self-consistent (counts
from the final segmentation, probabilities normalized), and the encode
composition must agree with the trainer's segmentation exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hive_lineage_spark.operators.text import (
    TX24_P_MAX,
    _tx24_final_seg,
    _tx24_words,
    tx24_unigram_lm_train,
    tx25_unigram_encode,
)

SF = "/root/testdata/sf0.001"


def test_tx24_segmentation_reconstructs_every_word(spark):
    words = _tx24_words(spark, SF)
    seg = _tx24_final_seg(spark, SF)
    assert seg.count() == words.count()  # total coverage: no word dropped
    bad = seg.filter(
        (F.concat_ws("", F.col("ps")) != F.col("word"))
        | (F.size("ps") != F.col("np"))
        | (F.col("np") < 1)
    )
    assert bad.count() == 0
    # no piece exceeds the segmenter's window
    too_long = seg.select(F.explode("ps").alias("p")).filter(
        F.length("p") > TX24_P_MAX
    )
    assert too_long.count() == 0


def test_tx24_vocab_is_normalized_final_counts(spark):
    rows = tx24_unigram_lm_train(spark, SF).collect()
    assert rows
    total = sum(r["cnt"] for r in rows)
    for r in rows:
        assert r["cnt"] >= 1
        want = round(math.log(r["cnt"]) - math.log(total) + 1e-9, 6)
        assert abs(r["logp"] - want) < 1e-9, r
    # probabilities normalize: sum of exp(ln c - ln T) == 1 by construction
    assert abs(sum(r["cnt"] / total for r in rows) - 1.0) < 1e-12
    # EM actually refines: the final vocab is smaller than the seed
    # (round-1 segmentation abandons most candidate substrings)
    from hive_lineage_spark.operators.text import TX24_SEED_MIN, _tx24_subs

    seed = (
        _tx24_subs(_tx24_words(spark, SF))
        .groupBy("piece").agg(F.sum("f").alias("c"))
        .filter((F.col("c") >= TX24_SEED_MIN) | (F.length("piece") == 1))
    )
    assert len(rows) < seed.count()


def test_tx25_encode_agrees_with_trainer_segmentation(spark):
    enc = {r["doc_id"]: r for r in tx25_unigram_encode(spark, SF).collect()}
    seg_np = {r["word"]: r["np"] for r in _tx24_final_seg(spark, SF).collect()}
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    assert len(enc) == len(docs)
    for d in docs:
        ws = d["text"].split(" ")
        r = enc[d["doc_id"]]
        assert r["n_words"] == len(ws)
        assert r["n_tokens"] == sum(seg_np[w] for w in ws), d["doc_id"]
        assert 1.0 <= r["tokens_per_word"] <= float(max(len(w) for w in ws))
