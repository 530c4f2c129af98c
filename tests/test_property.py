"""Property-based tests (hypothesis) for the graph engine and the
cross-engine hash — the class of testing the reference lacks entirely
(SURVEY.md §5: no property tests, no assertions).
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_lineage_spark.graph import GNode, from_dict, node
from hive_lineage_spark.rules import _ARTIFACT_KINDS, normalize

_KINDS = ["Scan", "Filter", "Project", "HashAggregate", "Join"] + sorted(_ARTIFACT_KINDS)


@st.composite
def trees(draw, depth=0):
    kind = draw(st.sampled_from(_KINDS))
    if depth >= 4:
        return node(kind)
    n_children = draw(st.integers(min_value=0, max_value=2 if depth < 2 else 1))
    children = tuple(draw(trees(depth + 1)) for _ in range(n_children))
    detail = {}
    if kind == "HashAggregate":
        detail["mode"] = draw(st.sampled_from(["Partial", "PartialMerge", "Final", "Complete"]))
    return node(kind, children, **detail)


@given(trees())
@settings(max_examples=200, deadline=None)
def test_normalize_removes_all_removable_artifacts(t):
    out = normalize(t)
    for n in out.walk():
        # an artifact may only survive if it had no single child to splice
        # to (leaf or multi-child) — unary artifacts are always removed
        if n.kind in _ARTIFACT_KINDS:
            assert len(n.children) != 1


@given(trees())
@settings(max_examples=200, deadline=None)
def test_normalize_is_idempotent(t):
    once = normalize(t)
    twice = normalize(once)
    assert once.tree_string() == twice.tree_string()


@given(trees())
@settings(max_examples=200, deadline=None)
def test_identity_transform_preserves_structure(t):
    out = t.transform_up(lambda n: n)
    assert out.tree_string() == t.tree_string()


@given(trees())
@settings(max_examples=100, deadline=None)
def test_to_dict_from_dict_roundtrip(t):
    assert from_dict(t.to_dict()).tree_string() == t.tree_string()


def _preserved(n: GNode) -> bool:
    # operators normalize may legitimately remove: artifacts, partial-mode
    # aggregates, and unary table-less Scans (temp-scan collapse rule)
    if n.kind in _ARTIFACT_KINDS or n.kind == "HashAggregate":
        return False
    if n.kind == "Scan" and len(n.children) == 1 and not dict(n.detail).get("table"):
        return False
    return True


@given(trees())
@settings(max_examples=100, deadline=None)
def test_normalize_never_loses_non_artifact_operators(t):
    before = [n.kind for n in t.walk() if _preserved(n)]
    after = [n.kind for n in normalize(t).walk() if _preserved(n)]
    assert sorted(before) == sorted(after)


# -- cross-engine hash parity -------------------------------------------------


def _py_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    return h


@given(st.text(alphabet=string.ascii_lowercase + " .,!?", min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_duckdb_poly_hash_matches_python_model(s):
    """The DuckDB emission of the polynomial hash equals the reference
    Python model on arbitrary ASCII strings (the Spark emission is checked
    against the same model in test_hash_spark_side below)."""
    import duckdb

    from hive_lineage_spark.functions.hashing import poly_hash_sql

    con = duckdb.connect()
    got = con.execute(f"SELECT {poly_hash_sql('?')}", [s]).fetchone()[0]
    want = _py_poly_hash(s)
    assert (got or 0) == want, (s, got, want)


def test_hash_spark_side_matches_python_model(spark):
    """Spark emission vs the Python model over a batch of tricky strings
    (one Spark job for the whole batch — hypothesis drives the SQL side)."""
    import string as _string

    from pyspark.sql import functions as F

    from hive_lineage_spark.functions.hashing import poly_hash

    samples = [
        "",
        "a",
        " ",
        "abc def",
        _string.ascii_lowercase,
        "the quick brown fox! jumps? over, the. lazy dog",
        "x" * 200,
        "a b " * 50,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", poly_hash("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == _py_poly_hash(s), s


def test_composed_gram_hash_equals_char_hash(spark):
    """dd02's arithmetic Horner composition of word hashes (no gram
    string, no gram dictionary) must be bit-identical to char-hashing
    the concatenated trigram — over documents with tricky token shapes
    (empty tokens from double spaces, punctuation, long words)."""
    import os

    from pyspark.sql import functions as F

    from hive_lineage_spark.functions.hashing import poly_hash
    from hive_lineage_spark.operators import dedup

    texts = [
        "a b c d e",
        "one two three",
        "x  y z w",          # double space -> empty token
        "p q r",
        ("w" * 120 + " " + "v" * 95 + " tail more tokens here"),
        "sym! bo? ls, and. punct u ation",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    real_docs = dedup._docs
    dedup._docs = lambda _spark, _sf: df
    try:
        got = {tuple(r) for r in dedup._hashed_postings(spark, "ignored").collect()}
    finally:
        dedup._docs = real_docs

    from pyspark.sql import Window

    tok = df.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.select(
            "doc_id",
            F.concat_ws(
                " ", "w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)
            ).alias("g"),
            F.lead("w", 2).over(win).alias("_w2"),
        )
        .filter(F.col("_w2").isNotNull())
    )
    want = {
        tuple(r)
        for r in grams.select("doc_id", poly_hash(F.col("g")).alias("gh")).distinct().collect()
    }
    assert got == want


def test_deterministic_ops_invariant_under_repartitioning(spark):
    """Operators documented as 'reproducible under any parallelism'
    (tp02 stratified sample, tx05 hash sample, dd09 best-match) must
    return the identical row set when the input arrives with a
    different partitioning — rank/tie-break logic may not depend on
    physical row order."""
    from hive_lineage_spark.operators.dedup import dd09_incremental_dedup
    from hive_lineage_spark.operators.pipeline import (
        tp02_stratified_sample,
        tp03_pack_sequences,
        tp05_stratified_sample_hc,
        tx05_hash_sample,
    )

    from hive_lineage_spark.operators.dedup import dd11_incremental_postings
    from hive_lineage_spark.operators.pipeline import (
        tp06_curriculum_bins,
        tp07_shuffle_shards,
        tp08_temperature_mixture,
        tp09_epoch_upsample,
        tp10_three_way_split,
    )
    from hive_lineage_spark.operators.text import (
        tx09_repetition,
        tx10_tfidf_terms,
        tx11_span_dedup,
    )

    sf = "/root/testdata/sf0.001"
    for op in (
        tp02_stratified_sample,
        tp05_stratified_sample_hc,
        tp03_pack_sequences,
        tp06_curriculum_bins,
        tp07_shuffle_shards,
        tx05_hash_sample,
        tp08_temperature_mixture,
        tp09_epoch_upsample,
        tx09_repetition,
        tx10_tfidf_terms,
        tx11_span_dedup,
        dd09_incremental_dedup,
        dd11_incremental_postings,
    ):
        base = {tuple(r) for r in op(spark, sf).collect()}
        shuffled = {
            tuple(r)
            for r in op(spark, sf).repartition(7).collect()
        }
        assert base == shuffled, op.__name__
        again = {tuple(r) for r in op(spark, sf).collect()}
        assert base == again, f"{op.__name__} not run-to-run stable"


def test_tp05_two_phase_sample_equals_tp02(spark):
    """The high-cardinality two-phase sampler must produce row-for-row
    the same result as tp02's single-window sampler (the superset
    argument: per-bucket top-K contains every class-global top-K
    member), at more than one scale."""
    from hive_lineage_spark.operators.pipeline import (
        tp02_stratified_sample,
        tp05_stratified_sample_hc,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        a = {tuple(r) for r in tp02_stratified_sample(spark, sf).collect()}
        b = {tuple(r) for r in tp05_stratified_sample_hc(spark, sf).collect()}
        assert a == b, sf


def test_composed_ngram_hash_equals_char_hash_n5(spark):
    """The generalized Horner fold (hashed_ngrams_of, used by dd10's
    5-gram decontamination) must stay bit-identical to char-hashing the
    joined 5-gram string."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hive_lineage_spark.functions.hashing import poly_hash
    from hive_lineage_spark.operators.dedup import hashed_ngrams_of

    texts = [
        "a b c d e f g",
        "one two three four five",
        "x  y z w v u",  # double space -> empty token
        "short doc",      # < n words -> no grams
        "sym! bo? ls, and. punct u ation longer",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {tuple(r) for r in hashed_ngrams_of(df, 5).collect()}

    tok = df.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    grams = tok.select(
        "doc_id",
        F.concat_ws(" ", "w", *[F.lead("w", i).over(win) for i in range(1, 5)]).alias("g"),
        F.lead("w", 4).over(win).alias("_w4"),
    ).filter(F.col("_w4").isNotNull())
    want = {
        tuple(r)
        for r in grams.select("doc_id", poly_hash(F.col("g")).alias("gh")).distinct().collect()
    }
    assert got == want


def test_composed_ngram_hash_equals_char_hash_n16(spark):
    """tx12 runs the fold at width 16 — the deepest lead chain in the
    repo — so pin the n=16 composition against char-hashing the joined
    16-gram too (multiset, distinct=False, as tx12 consumes it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hive_lineage_spark.functions.hashing import poly_hash
    from hive_lineage_spark.operators.dedup import hashed_ngrams_of

    texts = [
        " ".join(f"w{i % 7}" for i in range(40)),   # repeats → multiset matters
        " ".join(f"t{i}" for i in range(16)),        # exactly n words → 1 gram
        "too short for sixteen",
        "a  b " * 12,                                  # empty tokens inside
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = sorted(tuple(r) for r in hashed_ngrams_of(df, 16, distinct=False).collect())

    tok = df.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    grams = tok.select(
        "doc_id",
        F.concat_ws(" ", "w", *[F.lead("w", i).over(win) for i in range(1, 16)]).alias("g"),
        F.lead("w", 15).over(win).alias("_wl"),
    ).filter(F.col("_wl").isNotNull())
    want = sorted(
        tuple(r) for r in grams.select("doc_id", poly_hash(F.col("g")).alias("gh")).collect()
    )
    assert got == want


def test_frame_level_ops_handle_empty_and_tiny_inputs(spark):
    """Library-surface hardening: the reusable frame-level cores must not
    crash (or invent rows) on empty frames, single docs, or docs shorter
    than the gram width — the shapes a production caller's edge batches
    actually contain."""
    from hive_lineage_spark.operators.dedup import (
        apply_postings_changes,
        hashed_ngrams_of,
        incremental_dedup_frames,
        postings_of,
    )
    from hive_lineage_spark.operators.pipeline import connected_components

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    one_doc = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    short_doc = spark.createDataFrame([(1, "a b")], "doc_id long, text string")

    assert postings_of(empty_docs).count() == 0
    assert hashed_ngrams_of(short_doc, 5).count() == 0  # doc shorter than n
    assert postings_of(one_doc).count() == 2  # "a b c d" → 2 trigrams
    # maintenance with no changes is the identity
    po = postings_of(one_doc)
    assert apply_postings_changes(po).count() == po.count()
    # an empty arriving batch matches nothing
    assert incremental_dedup_frames(empty_docs, one_doc).count() == 0
    empty_edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty_edges).count() == 0


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(1, 3)),
            st.tuples(st.just("overwrite"), st.integers(1, 3)),
            st.tuples(st.just("compact"), st.just(0)),
            st.tuples(st.just("expire"), st.integers(1, 4)),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_vtable_log_protocol_matches_model(tmp_path_factory, ops):
    """The commit-log protocol (replay, overwrite/compact removes,
    expire horizon) against a brute-force in-memory model, over random
    commit sequences — no Spark, pure manifest logic: time travel to
    every retained version yields exactly the model's active file set,
    expired versions raise, and no file referenced by a retained
    snapshot is ever deleted from disk."""
    import json as _json
    import os as _os

    from hive_lineage_spark.sources.vtable import (
        _replay,
        _write_commit,
        expire_snapshots,
    )

    root = str(tmp_path_factory.mktemp("vt_model"))
    _os.makedirs(_os.path.join(root, "_vlog"))
    _os.makedirs(_os.path.join(root, "data"))

    model_versions: list[set[str]] = []  # active rel-paths per version
    horizon = 0
    fileno = 0

    def _touch(rels):
        for rel in rels:
            p = _os.path.join(root, rel)
            _os.makedirs(_os.path.dirname(p), exist_ok=True)
            open(p, "w").write("x")

    for op, arg in ops:
        version = len(model_versions)
        prev = model_versions[-1] if model_versions else set()
        if op == "expire":
            if not model_versions:
                continue
            got = expire_snapshots(root, keep_last=arg)
            horizon = max(horizon, got["expire_before"])
            model_versions.append(set(prev))
            continue
        if op in ("append", "overwrite"):
            adds = [f"data/v{version:08d}/f{fileno + i}.parquet" for i in range(arg)]
            fileno += arg
            _touch(adds)
            remove = [] if op == "append" else sorted(prev)
            active = (set() if op == "overwrite" else set(prev)) | set(adds)
        else:  # compact: rewrite current actives into one file
            adds = [f"data/v{version:08d}/f{fileno}.parquet"]
            fileno += 1
            _touch(adds)
            remove = sorted(prev)
            active = set(adds)
        _write_commit(
            root,
            version,
            {
                "version": version,
                "ts": float(version),
                "op": op if op != "compact" else "compact",
                "schema": "{}",
                "add": [{"path": p, "stats": None} for p in adds],
                "remove": remove,
            },
        )
        model_versions.append(active)

    if not model_versions:
        return
    latest = len(model_versions) - 1
    for v, want in enumerate(model_versions):
        if v < horizon:
            with pytest.raises(ValueError, match="expired"):
                _replay(root, version=v)
            continue
        _, active, _ = _replay(root, version=v)
        assert set(active) == want, f"v{v}"
        # every file a retained snapshot references must exist on disk
        for rel in want:
            assert _os.path.exists(_os.path.join(root, rel)), f"v{v} lost {rel}"
    # unreferenced-by-any-retained-version files are exactly the
    # vacuum candidates; one more expire(keep_last=huge) deletes none
    from hive_lineage_spark.sources.vtable import expire_snapshots as _exp

    assert _exp(root, keep_last=10_000)["n_deleted"] == 0


# ---------------------------------------------------------------------------
# codec round-trips on ARBITRARY pixel/sample content — the fixture's
# closed-form bytes only cover one byte pattern per (w, h); these drive
# random content through every encoder/decoder pair.
# ---------------------------------------------------------------------------


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=12))
    rgb = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    return w, h, rgb


@given(images())
@settings(max_examples=80, deadline=None)
def test_png_roundtrip_random_pixels(img):
    from hive_lineage_spark.operators.multimodal import _decode_png, encode_png

    w, h, rgb = img
    m = _decode_png(encode_png(w, h, rgb))
    assert (m["width"], m["height"], m["pixels"]) == (w, h, rgb)


@given(images())
@settings(max_examples=80, deadline=None)
def test_bmp_ppm_roundtrip_random_pixels(img):
    from hive_lineage_spark.operators.multimodal import (
        decode_image_real,
        encode_bmp,
        encode_ppm,
    )

    w, h, rgb = img
    assert decode_image_real(encode_bmp(w, h, rgb))["pixels"] == rgb
    # PPM's header tokenizer treats a leading '#' comment char in data
    # fine (data follows exactly one whitespace byte) — random bytes
    # exercise that boundary
    assert decode_image_real(encode_ppm(w, h, rgb))["pixels"] == rgb


@given(
    st.integers(min_value=1, max_value=2),
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300),
)
@settings(max_examples=80, deadline=None)
def test_wav_roundtrip_random_samples(ch, vals):
    from hive_lineage_spark.operators.multimodal import decode_audio_real, encode_wav

    if len(vals) % ch:
        vals = vals[: len(vals) - (len(vals) % ch)] or vals * ch
    m = decode_audio_real(encode_wav(ch, 8000, vals))
    assert m["n_channels"] == ch and m["samples"] == list(vals)


@given(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=16))
@settings(max_examples=120, deadline=None)
def test_fit_box_invariants(w, h, box):
    """fit_box never upsizes, preserves which side dominates, respects
    the box, and is the identity when the image already fits."""
    from hive_lineage_spark.operators.multimodal import fit_box

    tw, th, resized = fit_box(w, h, box)
    assert 1 <= tw and 1 <= th
    if max(w, h) <= box:
        assert (tw, th, resized) == (w, h, False)
    else:
        assert resized and max(tw, th) == box and tw <= w and th <= h
        if w >= h:
            assert tw >= th or th == 1


# --- JPEG codec properties (functions/jpeg.py) -------------------------------

@st.composite
def _jpeg_cases(draw):
    w = draw(st.integers(min_value=8, max_value=40))
    h = draw(st.integers(min_value=8, max_value=32))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    sub = draw(st.sampled_from(["444", "422", "420"]))
    ri = draw(st.sampled_from([0, 1, 2, 5]))
    return w, h, seed, sub, ri


@given(_jpeg_cases())
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_property(case):
    """For ANY dims / content / supported subsampling / restart
    interval: decode(encode(x)) stays within DCT-rounding tolerance of
    the reference computation (pinned color conversion of the chroma-
    processed planes), and restart framing never changes a pixel."""
    import numpy as np

    from hive_lineage_spark.functions.jpeg import (
        _box_downsample, decode_jpeg, encode_jpeg,
    )

    w, h, seed, sub, ri = case
    rng = np.random.RandomState(seed)
    y, cb, cr = (rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(3))

    m = decode_jpeg(encode_jpeg(w, h, y, cb, cr, subsampling=sub, restart_interval=ri))
    assert (m["width"], m["height"]) == (w, h)
    px = np.frombuffer(m["pixels"], np.uint8).reshape(h, w, 3).astype(np.int64)

    # reference: chroma through the same pinned downsample+replicate
    if sub == "444":
        rcb, rcr = cb, cr
    else:
        fy, fx = (2, 2) if sub == "420" else (1, 2)
        up = lambda p: np.repeat(  # noqa: E731
            np.repeat(_box_downsample(p, fy, fx), fy, 0), fx, 1
        )[:h, :w].astype(np.uint8)
        rcb, rcr = up(cb), up(cr)
    yf, cbf, crf = (p.astype(np.float64) for p in (y, rcb, rcr))
    r = np.clip(np.floor(yf + 1.402 * (crf - 128) + 0.5), 0, 255)
    g = np.clip(np.floor(yf - 0.344136 * (cbf - 128) - 0.714136 * (crf - 128) + 0.5), 0, 255)
    b = np.clip(np.floor(yf + 1.772 * (cbf - 128) + 0.5), 0, 255)
    ref = np.stack([r, g, b], -1).astype(np.int64)
    assert np.abs(px - ref).max() <= 4

    if ri:  # restart markers are framing, not signal
        plain = decode_jpeg(encode_jpeg(w, h, y, cb, cr, subsampling=sub))
        assert m["pixels"] == plain["pixels"]


def test_ss20_sign_code_matches_numpy_model(spark):
    """ss20's codegen sign-code fold vs a direct numpy model over
    adversarial vectors: zeros (strictly NOT set — the > 0 gate),
    negatives, sign-bit boundaries at both halves, and mixed values."""
    import numpy as np
    from pyspark.sql import functions as F

    from hive_lineage_spark.operators.similarity import _sign_code_half

    cases = [
        np.zeros(64),                                   # all zero -> code 0
        np.ones(64),                                    # all set
        -np.ones(64),                                   # none set
        np.array([1.0 if i % 2 == 0 else -1.0 for i in range(64)]),
        np.array([0.0] * 31 + [5.0] + [0.0] * 31 + [5.0]),  # top bit each half
        np.random.RandomState(7).randn(64),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(cases)],
        "i int, v array<double>",
    )
    got = {
        r["i"]: (r["hi"], r["lo"])
        for r in df.select(
            "i",
            _sign_code_half(F.col("v"), 0).alias("hi"),
            _sign_code_half(F.col("v"), 1).alias("lo"),
        ).collect()
    }
    for i, v in enumerate(cases):
        hi = int(sum(1 << j for j in range(32) if v[j] > 0))
        lo = int(sum(1 << j for j in range(32) if v[32 + j] > 0))
        assert got[i] == (hi, lo), (i, got[i], (hi, lo))


def test_tp16_token_exact_packing_invariants(spark):
    """tp16 packs by the TOKENIZER's counts: (1) its per-doc n_tokens
    must equal tx19's BPE encode count exactly (the composition is the
    op's whole point — a drift here means it silently packs by some
    other length); (2) within a shard, documents tile the token line
    contiguously: ordered by global start = seq_id*B + offset, each
    start is the previous start + previous n_tokens, and overflow is
    exactly the part that crosses the B boundary; (3) the vocabulary
    join must be broadcast (map-side) — the corpus never shuffles on
    the word key."""
    from pyspark.sql import functions as F

    from hive_lineage_spark.operators.pipeline import (
        PACK_BUDGET,
        tp16_token_exact_packing,
    )
    from hive_lineage_spark.operators.text import tx19_bpe_apply

    sf = "/root/testdata/sf0.001"
    rep = tp16_token_exact_packing(spark, sf)
    rows = rep.collect()
    tx = {r["doc_id"]: r["n_tokens"] for r in tx19_bpe_apply(spark, sf).collect()}
    assert len(rows) == len(tx)
    for r in rows:
        assert r["n_tokens"] == tx[r["doc_id"]], r
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["seq_id"] * PACK_BUDGET + r["offset"])
        pos = 0
        for r in rs:
            start = r["seq_id"] * PACK_BUDGET + r["offset"]
            assert start == pos, (shard, r, pos)
            assert r["overflow"] == max(0, r["offset"] + r["n_tokens"] - PACK_BUDGET), r
            pos += r["n_tokens"]
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dd21_exact_spans_match_text_ground_truth(spark, duck):
    """dd21's whole point is TRUE Lee-et-al. semantics, so pin it to a
    TEXT-exact ground truth: re-run the identical run-detection pipeline
    in DuckDB keyed on the raw gram STRING instead of the polynomial
    hash — any anchor-hash collision that corrupted a span would show
    here (dd18's fixed-width probe is measurably collision-inflated on
    this corpus: a 2^30 hash space over ~25k grams collides; runs of
    consecutive aligned anchors make dd21 robust, and this test proves
    the fixture is collision-clean end-to-end). Also pins the dd18
    relationship one-sided — dd18's max_dup_w is >= the largest probe
    width <= dd21's exact max_span (text-true spans always flag dd18;
    the reverse direction can be hash-inflated) — and that the fixture
    exercises span lengths between and beyond the {4,8,16} probe grid
    (otherwise dd21 adds nothing over dd18 here)."""
    from hive_lineage_spark.operators.text import (
        DD21_W0,
        DUP_WIDTHS,
        dd18_longest_dup_span,
        dd21_exact_dup_spans,
    )

    sf = "/root/testdata/sf0.001"
    spans = {r["doc_id"]: r for r in dd21_exact_dup_spans(spark, sf).collect()}
    truth_sql = f"""
    WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
    g AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(ws[CAST(i+1 AS INT):CAST(i+{DD21_W0} AS INT)], ' ') AS gram
      FROM d, unnest(range(len(ws) - {DD21_W0 - 1})) t(i)
    ),
    keep AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
    dg AS (SELECT g.* FROM g JOIN keep USING (gram)),
    m AS (
      SELECT a.doc_id id_a, b.doc_id id_b, CAST(a.pos-b.pos AS INT) delta, a.pos pos
      FROM dg a JOIN dg b ON a.gram=b.gram AND a.doc_id<>b.doc_id
    ),
    runs AS (
      SELECT id_a, id_b, delta, grp, count(*)+{DD21_W0 - 1} AS span FROM (
        SELECT id_a,id_b,delta,pos,
               pos - row_number() OVER (PARTITION BY id_a,id_b,delta ORDER BY pos) grp
        FROM m
      ) GROUP BY 1,2,3,4
    ),
    md AS (SELECT id_a, max(span) max_span FROM runs GROUP BY 1),
    np AS (SELECT r.id_a, count(DISTINCT r.id_b) n FROM runs r
           JOIN md USING(id_a) WHERE r.span=md.max_span GROUP BY 1)
    SELECT d0.doc_id, coalesce(md.max_span,0), coalesce(np.n,0)
    FROM documents d0 LEFT JOIN md ON d0.doc_id=md.id_a
    LEFT JOIN np ON d0.doc_id=np.id_a
    """
    truth = {int(r[0]): (int(r[1]), int(r[2])) for r in duck.execute(truth_sql).fetchall()}
    assert set(spans) == set(truth)
    for doc_id, row in spans.items():
        assert (row["max_span"], row["n_partners"]) == truth[doc_id], (
            doc_id, tuple(row), truth[doc_id],
        )
        assert row["max_span"] == 0 or row["max_span"] >= DD21_W0, row
    d18 = {r["doc_id"]: r["max_dup_w"] for r in dd18_longest_dup_span(spark, sf).collect()}
    for doc_id, row in spans.items():
        want_w = max([w for w in DUP_WIDTHS if w <= row["max_span"]], default=0)
        assert d18[doc_id] >= want_w, (doc_id, row["max_span"], d18[doc_id])
    lens = {r["max_span"] for r in spans.values()}
    assert any(l not in (0, 4, 8, 16) for l in lens), sorted(lens)
    assert max(lens) > 16, sorted(lens)


def test_tp17_no_split_packing_invariants(spark):
    """tp17: (1) NO doc is ever split — offset + n_tokens <= budget for
    every non-truncated doc, and a truncated doc (longer than the
    budget) sits alone at offset 0; (2) bins tile contiguously: within
    each (shard, bin), docs ordered by offset are gap-free; (3) the
    assignment IS next-fit-decreasing — a pure-Python replay of the
    recurrence over the same (tokens desc, id) order reproduces every
    (bin_id, offset); (4) the doc set and token counts match tp03's
    (same corpus, same lengths — only the layout policy differs)."""
    from hive_lineage_spark.operators.pipeline import (
        PACK_BUDGET,
        tp03_pack_sequences,
        tp17_no_split_packing,
    )

    sf = "/root/testdata/sf0.001"
    rows = tp17_no_split_packing(spark, sf).collect()
    tp03 = {r["doc_id"]: r["n_tokens"] for r in tp03_pack_sequences(spark, sf).collect()}
    assert {r["doc_id"] for r in rows} == set(tp03)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["n_tokens"] == tp03[r["doc_id"]]
        if r["truncated"]:
            assert r["n_tokens"] > PACK_BUDGET and r["offset"] == 0, r
        else:
            assert r["offset"] + r["n_tokens"] <= PACK_BUDGET, r
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (-r["n_tokens"], r["doc_id"]))
        cur, fill = -1, 0
        for r in rs:
            if cur < 0 or fill + r["n_tokens"] > PACK_BUDGET:
                cur += 1
                fill = 0
            assert (r["bin_id"], r["offset"]) == (cur, fill), (shard, r, cur, fill)
            fill += r["n_tokens"]
        # contiguity per bin
        bins: dict[int, list] = {}
        for r in rs:
            bins.setdefault(r["bin_id"], []).append(r)
        for b, docs in bins.items():
            docs.sort(key=lambda r: r["offset"])
            pos = 0
            for r in docs:
                assert r["offset"] == pos, (shard, b, r)
                pos += r["n_tokens"]


# ---------------------------------------------------------------------------
# WARC codec properties (functions/warc.py): arbitrary record streams
# round-trip, arbitrary truncations fail loudly — the two contracts the
# web09 walker stands on.
# ---------------------------------------------------------------------------

_uri_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?&=.-_%",
    min_size=1, max_size=60,
)
_bodies = st.binary(max_size=300)


@given(
    recs=st.lists(st.tuples(_uri_chars, _bodies), min_size=1, max_size=8),
    with_info=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_arbitrary_records(recs, with_info):
    from hive_lineage_spark.functions.warc import (
        encode_response_record,
        encode_warcinfo,
        split_http_response,
        walk_warc,
    )

    blobs = [encode_warcinfo()] if with_info else []
    blobs += [
        encode_response_record(f"https://{u}", f"<urn:hls:doc:{i}>", b)
        for i, (u, b) in enumerate(recs)
    ]
    data = b"".join(blobs)
    got = list(walk_warc(data))
    assert len(got) == len(blobs)
    off = 0
    for g, raw in zip(got, blobs):
        assert (g["offset"], g["length"]) == (off, len(raw))
        off += len(raw)
    assert off == len(data)
    resp = [g for g in got if g["type"] == "response"]
    assert len(resp) == len(recs)
    for g, (u, b) in zip(resp, recs):
        status, body = split_http_response(g["block"])
        assert status == 200 and body == b
        assert g["headers"]["warc-target-uri"] == f"https://{u}"


@given(
    uri=_uri_chars, body=st.binary(min_size=1, max_size=200),
    cut=st.integers(min_value=1, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_warc_any_truncation_raises(uri, body, cut):
    """Cutting ANY suffix off a valid record must raise — never yield a
    silently short parse (offsets feeding downstream range reads)."""
    from hive_lineage_spark.functions.warc import encode_response_record, walk_warc

    rec = encode_response_record(f"https://{uri}", "<urn:hls:doc:0>", body)
    cut = min(cut, len(rec) - 1)
    with pytest.raises(ValueError):
        leftover = list(walk_warc(rec[: len(rec) - cut]))
        # a cut that lands exactly between records can't happen for a
        # single record — anything short of full length must raise
        raise AssertionError(f"parsed {len(leftover)} records from a truncated stream")


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi property: the HOF DP must equal a direct Python
# reference (enumerate every segmentation, same cost model, same
# (cost, np, lens) tie order) on arbitrary corpora — the same identity
# the DuckDB oracle pins, but against an INDEPENDENT implementation and
# on adversarial words (repeats, shared substrings, single chars).
# ---------------------------------------------------------------------------


def _py_unigram_reference(word_freqs: dict[str, int]):
    """Pure-python replay of tx24's two hard-EM rounds."""
    import math

    P, SEED_MIN = 4, 2

    def subs_of(w):
        return [
            (e, j, w[e - j : e])
            for e in range(1, len(w) + 1)
            for j in range(1, min(P, e) + 1)
        ]

    def best_seg(w, model, total):
        cands = []

        def rec(pos, cost, lens, ps):
            if pos == len(w):
                cands.append((cost, len(ps), lens, ps))
                return
            for j in range(1, min(P, len(w) - pos) + 1):
                p = w[pos : pos + j]
                if p in model:
                    rec(pos + j, cost + (math.log(total) - math.log(model[p])),
                        lens + str(j), ps + [p])

        rec(0, 0.0, "", [])
        return min(cands, key=lambda c: (c[0], c[1], c[2]))

    c0: dict[str, int] = {}
    for w, f in word_freqs.items():
        for _, _, p in subs_of(w):
            c0[p] = c0.get(p, 0) + f
    m0 = {p: c for p, c in c0.items() if c >= SEED_MIN or len(p) == 1}
    t0 = sum(m0.values())
    c1: dict[str, int] = {}
    for w, f in word_freqs.items():
        for p in best_seg(w, m0, t0)[3]:
            c1[p] = c1.get(p, 0) + f
    t1 = sum(c1.values())
    out = {}
    for w, f in word_freqs.items():
        seg = best_seg(w, c1, t1)
        out[w] = (seg[1], seg[3])
    return out


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=7), min_size=1, max_size=8
    ),
    reps=st.lists(st.integers(min_value=1, max_value=4), min_size=8, max_size=8),
)
@settings(max_examples=12, deadline=None)
def test_tx24_viterbi_matches_python_reference(spark, tmp_path_factory, words, reps):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_lineage_spark.operators.text import _tx24_final_seg

    freqs: dict[str, int] = {}
    for w, r in zip(words, reps):
        freqs[w] = freqs.get(w, 0) + r
    docs = []
    for i, (w, f) in enumerate(sorted(freqs.items())):
        docs.extend([w] * f)
    # one doc carrying the whole stream (word order irrelevant)
    tmp = tmp_path_factory.mktemp("tx24prop")
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([" ".join(docs)])}),
        str(tmp / "documents.parquet"),
    )
    try:
        got = {
            r["word"]: (r["np"], list(r["ps"]))
            for r in _tx24_final_seg(spark, str(tmp)).collect()
        }
    finally:
        # every hypothesis example uses a fresh sf_dir — release the
        # session-scoped persisted frames (_persisted's contract)
        from hive_lineage_spark.operators.dedup import clear_postings_cache

        clear_postings_cache()
    want = _py_unigram_reference(freqs)
    assert got == want
