"""Lineage smoke across the ENTIRE query surface: the tracker must
capture, analyze, normalize, and emit every registered query without
error — the rebuild's analog of pointing the reference hook at arbitrary
production plans. Pandas-UDF stages (mapInPandas) legitimately produce
the not-mappable sentinel; everything else must resolve.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from hive_lineage_spark.hook import LineageTracker
from hive_lineage_spark.lineage import UNKNOWN

SF = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()

# queries whose plan contains a Python-UDF barrier (no exprId flow through
# mapInPandas) — lineage degrades to the sentinel there, by design
PYTHON_BARRIER = {
    "mm01_decode_stub",
    "mm04_resize_stub",
    "mm05_decode_image",
    "mm06_decode_resize",
    "mm07_decode_audio",
    "mm08_video_frame_index",
    "mm10_video_frame_pixels",
    "mm11_audio_features",
    "mm12_image_dhash",
    "mm13_video_420_pixels",
    "mm14_audio_resample",
    "mm15_video_shot_detect",
    "mm16_image_entropy",
    "mm17_image_phash",
    "mm18_audio_vad",
    "mm19_vit_patches",
    "mm20_audio_spectral",
    "mm21_phash_search",
    "mm22_audio_quality",
    "dd06_embed_cosine_dup",
    "tp17_no_split_packing",
    "mm23_video_near_dup",
    "web09_warc_extract",
    "px02_grouped_zscore",
    "ss05_ann_bruteforce_arrow",
    "dd13_semdedup_arrow",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_lineage_capture_on_query(spark, name):
    df = QUERIES[name](spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name=name)
    # emit paths never crash
    assert ql.report()
    assert ql.to_json()
    # every output column of the query is accounted for in the lineage
    lineage_cols = {c.name for c in ql.result.columns}
    assert set(df.columns) <= lineage_cols, set(df.columns) - lineage_cols
    if name not in PYTHON_BARRIER:
        # all columns resolve to real base cells (no sentinel)
        for c in ql.result.columns:
            assert UNKNOWN not in c.bases, f"{name}.{c.name} unmappable"
        assert ql.result.input_tables, name
    # normalized physical graph exists and contains no execution artifacts
    if ql.normalized is not None:
        from hive_lineage_spark.rules import _ARTIFACT_KINDS

        kinds = {n.kind for n in ql.normalized.walk()}
        assert not (kinds & _ARTIFACT_KINDS), kinds & _ARTIFACT_KINDS


DECLARED = __import__(
    "hive_lineage_spark.operators", fromlist=["all_declared"]
).all_declared()


@pytest.mark.parametrize("name", sorted(DECLARED))
def test_declared_lineage_resolves_barrier_columns(spark, name):
    """With operator-authored declarations, every barrier output column
    resolves to real base cells with role 'declared' — the sentinel
    disappears exactly where (and only where) the author asserted the
    mapping; engine-proven edges keep their stronger roles."""
    df = QUERIES[name](spark, SF)
    df.collect()
    ql = LineageTracker().track(df, name=name, declared=DECLARED[name])
    by_name = {c.name: c for c in ql.result.columns}
    # declarations attach at the BARRIER's output names; a downstream
    # projection may drop some (mm21 keeps only doc_id + derived cols),
    # so check the declared columns that survive to the result — and
    # that the survivors plus everything derived from them resolve
    checked = 0
    for out_col in DECLARED[name]:
        c = by_name.get(out_col)
        if c is None:
            continue
        checked += 1
        assert UNKNOWN not in c.bases, f"{name}.{out_col} still unmappable"
        assert c.bases, (name, out_col)
    declared_roles = {
        c.name for c in ql.result.columns if getattr(c, "role", None) == "declared"
    }
    if checked:
        # the report must surface the weaker provenance on the
        # surviving declared columns themselves
        assert set(DECLARED[name]) & declared_roles, declared_roles
    else:
        # barrier output fully consumed downstream (mm23: the per-frame
        # pHash frame feeds joins/aggs and none of its names survive):
        # the declarations must still be doing real work — some result
        # column must carry the propagated 'declared' role
        assert declared_roles, (
            f"{name}: no declared name survives AND nothing propagated "
            f"with role declared — the declarations are vacuous"
        )
    for c in ql.result.columns:
        assert UNKNOWN not in c.bases, f"{name}.{c.name} still unmappable"
    assert ql.result.input_tables, name
