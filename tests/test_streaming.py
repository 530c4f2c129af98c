"""Structured Streaming tests: a static parquet source drives a streaming
query to completion via the memory sink; results must equal the batch
computation (replay equivalence), and the stateful sessionizer must agree
with the batch window-function sessionization (relational.q25).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_lineage_spark.sources.registry import load_events
from hive_lineage_spark.streaming.events import (
    batch_windowed_counts,
    daily_volume_stream,
    dedup_stream,
    enrich_stream,
    events_stream,
    run_stream_to_memory,
    sessionize_stateful,
    user_tiers,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_agg_stream_equals_batch(spark):
    """Append mode emits exactly the windows the watermark has closed:
    everything the batch query produces except windows still open when
    the source exhausts (watermark = max event time - 10 min)."""
    import datetime

    stream = events_stream(spark, SF)
    agg = windowed_counts(stream, window="5 minutes", watermark="10 minutes")
    run_stream_to_memory(agg, "win_counts", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect()}
    want = {tuple(r) for r in batch_windowed_counts(load_events(spark, SF)).collect()}
    assert got <= want  # the stream never invents rows
    assert len(got) > 0
    max_ts = max(r[0] for r in want)
    watermark_cutoff = max_ts - datetime.timedelta(minutes=10)
    closed = {
        r for r in want if r[0] + datetime.timedelta(minutes=5) <= watermark_cutoff
    }
    assert closed <= got  # every watermark-closed window was emitted
    still_open = want - got
    assert all(r[0] + datetime.timedelta(minutes=10) > watermark_cutoff for r in still_open)


def test_streaming_volume_anomaly_equals_batch_dq04(spark):
    """The dq04 ingest-volume gate fed by the STREAM-maintained daily
    counts must equal the batch operator row-for-row: complete-mode
    replay of the full source reproduces the batch daily frame, and the
    gate itself is shared code (operators.quality.volume_gate)."""
    from hive_lineage_spark.operators.quality import dq04_volume_anomaly, volume_gate

    agg = daily_volume_stream(events_stream(spark, SF))
    run_stream_to_memory(agg, "daily_volume", output_mode="complete")
    got = sorted(
        tuple(r) for r in volume_gate(spark.table("daily_volume")).collect()
    )
    want = sorted(tuple(r) for r in dq04_volume_anomaly(spark, SF).collect())
    assert got == want and len(got) > 0


def test_stateful_sessionization_matches_batch(spark):
    from hive_lineage_spark.operators.relational import q25_sessionization

    stream = events_stream(spark, SF)
    sess = sessionize_stateful(stream)
    run_stream_to_memory(sess, "sessions", output_mode="update")
    # update mode emits one row per user per batch; last row per user wins
    rows = spark.sql("SELECT * FROM sessions").collect()
    got = {}
    for r in rows:
        got[r.user_id] = (r.n_sessions, r.n_events)
    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q25_sessionization(spark, SF).collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark):
    """Union the stream with itself so every event arrives twice; the
    watermarked dedup must emit each (user_id, event_type, ts) exactly
    once — i.e. the batch distinct count."""
    stream = events_stream(spark, SF)
    doubled = stream.union(stream)
    deduped = dedup_stream(doubled, watermark="10 minutes")
    run_stream_to_memory(deduped, "dedup_stream_out", output_mode="append")
    got = spark.sql("SELECT count(*) AS n FROM dedup_stream_out").collect()[0].n
    want = load_events(spark, SF).select("user_id", "event_type", "ts").distinct().count()
    assert got == want


def test_stream_static_enrich_equals_batch(spark):
    stream = events_stream(spark, SF)
    tiers = user_tiers(spark, SF)
    run_stream_to_memory(enrich_stream(stream, tiers), "enriched", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM enriched").collect()}
    want = {tuple(r) for r in enrich_stream(load_events(spark, SF), tiers).collect()}
    assert got == want
    assert len(got) == 1000  # every event matched the dimension


def test_watermark_is_attached(spark):
    stream = events_stream(spark, SF)
    agg = windowed_counts(stream, watermark="10 minutes")
    assert agg.isStreaming
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_streaming_lineage_of_definition(spark):
    """Column lineage of the windowed-counts STREAM definition must
    resolve through window()/watermark to the events source columns —
    no execution required."""
    from hive_lineage_spark.hook import LineageTracker

    tracker = LineageTracker()
    wc = windowed_counts(events_stream(spark, SF))
    ql = tracker.track_stream_def(wc, "windowed_counts")
    assert ql.command_type == "STREAM"
    cm = ql.column_map()
    assert cm["win_start"] == {("events", "ts")}
    assert cm["event_type"] == {("events", "event_type")}
    assert cm["sum_value"] == {("events", "value")}
    # grouping on the window (derived from ts) and event_type is control
    # lineage
    assert ("events", "ts") in ql.result.indirect
    assert ql.result.input_tables == ["events"]


def test_streaming_lineage_of_single_batch_run(spark):
    """Deterministic micro-batch lineage: with a single-batch trigger the
    last execution IS the batch that read all the data, and its column
    lineage must resolve to the events source columns."""
    from hive_lineage_spark.hook import LineageTracker

    tracker = LineageTracker()
    wc = windowed_counts(events_stream(spark, SF))
    # Trigger.Once (not availableNow): exactly ONE micro-batch — available-
    # now follows the data batch with an empty watermark-flush batch, which
    # would then be the "last execution"
    q = (
        wc.writeStream.outputMode("append")
        .format("memory")
        .queryName("wc_once")
        .trigger(once=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    ql = tracker.track_stream_query(q, "stream:wc_once")
    assert ql is not None and ql.command_type == "STREAM"
    assert "events" in ql.result.input_tables, ql.result.input_tables
    cm = ql.column_map()
    assert cm["win_start"] == {("events", "ts")}
    assert cm["event_type"] == {("events", "event_type")}
    assert cm["sum_value"] == {("events", "value")}
    assert ("events", "ts") in ql.result.indirect


def test_streaming_lineage_listener_captures_micro_batches(spark):
    """install_streaming must capture micro-batch lineage automatically
    through a real StreamingQueryListener. The bus is asynchronous, so
    captures are samples — assert that sampling happened and that every
    sample analyzed cleanly, not that a specific batch was seen."""
    import time

    from hive_lineage_spark.hook import LineageTracker

    tracker = LineageTracker()
    tracker.install_streaming(spark)
    try:
        wc = windowed_counts(events_stream(spark, SF))
        run_stream_to_memory(wc, "wc_lineage_probe", output_mode="append")
        deadline = time.time() + 30
        caps = []
        while time.time() < deadline and not caps:
            caps = [q for q in tracker.queries if q.name.startswith("stream:wc_lineage_probe")]
            time.sleep(0.5)
        assert caps, "listener captured no micro-batches"
        for ql in caps:
            assert ql.command_type == "STREAM"
            names = {c.name for c in ql.result.columns}
            assert {"win_start", "event_type", "n_events", "sum_value"} <= names
    finally:
        tracker.uninstall_streaming(spark)


def test_stream_stream_interval_join_equals_batch(spark):
    """Watermarked stream-stream interval join (view→purchase
    attribution) must produce exactly the batch join's pairs once the
    source is exhausted — for an inner join, rows the watermark has
    finalized are emitted and none are invented. A time-bound join
    condition is what lets Spark expire buffered state; the planner
    rejects the unbounded variant in append mode."""
    from hive_lineage_spark.streaming.events import (
        batch_view_purchase_join,
        view_purchase_join,
    )

    stream = events_stream(spark, SF)
    joined = view_purchase_join(stream, watermark="10 minutes", within="30 minutes")
    assert joined.isStreaming
    run_stream_to_memory(joined, "vp_join", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM vp_join").collect()}
    want = {tuple(r) for r in batch_view_purchase_join(load_events(spark, SF)).collect()}
    assert got <= want  # never invents pairs
    # the watermark only holds back pairs near the end of the input: every
    # pair whose purchase precedes (max event time - watermark - within)
    # must have been emitted
    assert len(want) > 0
    import datetime

    max_ts = max(r[2] for r in want)
    horizon = max_ts - datetime.timedelta(minutes=40)
    settled = {r for r in want if r[2] <= horizon}
    assert settled <= got
    assert len(got) >= len(settled) > 0


def test_stream_stream_join_definition_lineage(spark):
    """Column lineage of the stream-stream join definition: both join
    sides resolve to the same events source; value→amount and the two
    timestamps map to events.ts."""
    from hive_lineage_spark.hook import LineageTracker
    from hive_lineage_spark.streaming.events import view_purchase_join

    ql = LineageTracker().track_stream_def(
        view_purchase_join(events_stream(spark, SF)), "vp_join"
    )
    cm = ql.column_map()
    assert cm["amount"] == {("events", "value")}
    assert cm["view_ts"] == {("events", "ts")}
    assert cm["purchase_ts"] == {("events", "ts")}
    assert cm["user_id"] == {("events", "user_id")}
    assert ql.result.input_tables == ["events"]


def test_stream_vtable_incremental_dedup_end_to_end(spark, tmp_path):
    """The full continuous-ingest composition: documents arrive as a
    STREAM, land in a versioned table commit-per-micro-batch
    (stream_to_vtable), and each commit's change feed is near-dedup
    probed against the v0-indexed snapshot. The union of per-commit
    matches must equal the batch operator's split-by-id semantics
    (dd09's DuckDB-checked definition) — probing per micro-batch loses
    nothing because each new doc's best match depends only on (doc,
    index)."""
    import os

    from hive_lineage_spark.operators.dedup import (
        dd09_incremental_dedup,
        incremental_dedup_frames,
    )
    from hive_lineage_spark.sources.vtable import (
        history,
        read_vtable,
        read_vtable_changes,
        write_vtable,
    )
    from hive_lineage_spark.streaming.events import stream_to_vtable

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    split = docs.groupBy().agg(
        F.floor(F.max("doc_id") / 2).cast("long").alias("s")
    ).collect()[0][0]
    root = str(tmp_path / "docs_vt")
    write_vtable(docs.filter(F.col("doc_id") < split), root, mode="overwrite")

    # stage the arriving half as 3 files → 3 micro-batches → 3 commits
    staging = str(tmp_path / "arriving")
    docs.filter(F.col("doc_id") >= split).repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staging)
    q = stream_to_vtable(stream, root)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    versions = [c["version"] for c in history(root) if c["version"] >= 1]
    assert len(versions) >= 2, "stream must have produced multiple commits"
    indexed = read_vtable(spark, root, version=0)
    got = set()
    for v in versions:
        arriving = read_vtable_changes(spark, root, from_version=v, to_version=v).select(
            "doc_id", "text"
        )
        got |= {tuple(r) for r in incremental_dedup_frames(arriving, indexed).collect()}
    want = {tuple(r) for r in dd09_incremental_dedup(spark, SF).collect()}
    assert got == want and got


def test_streaming_simhash_dedup_equals_batch_dd05(spark, tmp_path):
    """The stateful streaming near-dup (per-bucket GroupState signature
    index) must produce, across arbitrary micro-batch boundaries, the
    exact pair set of the batch dd05 operator."""
    from hive_lineage_spark.operators.dedup import dd04_simhash, dd05_simhash_pairs
    from hive_lineage_spark.streaming.events import streaming_simhash_dedup

    # stage the signatures as 3 files → 3 micro-batches through state
    staging = str(tmp_path / "sigs")
    sigs = dd04_simhash(spark, SF)
    sigs.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(sigs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staging)

    q = (
        streaming_simhash_dedup(stream)
        .writeStream.format("memory")
        .queryName("sim_pairs")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        tuple(r)
        for r in spark.sql("SELECT DISTINCT id_a, id_b, hamming FROM sim_pairs").collect()
    }
    want = {tuple(r) for r in dd05_simhash_pairs(spark, SF).collect()}
    assert got == want and got


def test_streaming_simhash_dedup_definition_lineage(spark, tmp_path):
    """Definition-time lineage of the stateful operator: the
    applyInPandasWithState stage is a Python barrier, so columns carry
    the documented not-mappable sentinel — but capture must not crash,
    and the stream's file source must resolve as the input."""
    from hive_lineage_spark.hook import LineageTracker
    from hive_lineage_spark.lineage import UNKNOWN
    from hive_lineage_spark.operators.dedup import dd04_simhash
    from hive_lineage_spark.streaming.events import streaming_simhash_dedup

    staging = str(tmp_path / "sigs")
    sigs = dd04_simhash(spark, SF)
    sigs.write.parquet(staging)
    stream = spark.readStream.schema(sigs.schema).parquet(staging)
    ql = LineageTracker().track_stream_def(streaming_simhash_dedup(stream), "sd")
    assert ql.report() and ql.to_json()
    assert {c.name for c in ql.result.columns} == {"id_a", "id_b", "hamming"}
    for c in ql.result.columns:
        assert c.bases == frozenset({UNKNOWN})
    assert ql.result.input_tables, "stream source must resolve"


def test_streaming_span_dedup_equals_batch_winner_set(spark, tmp_path):
    """The stateful streaming span dedup, fed micro-batches in ascending
    doc order, must keep exactly the batch tx11 winner set (first corpus
    occurrence of every span) across micro-batch boundaries."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window

    from hive_lineage_spark.operators.text import span_segments
    from hive_lineage_spark.streaming.events import streaming_span_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    # batch winner set: rank-1 per span hash, the tx11 window (same
    # shared segmentation the operator itself uses)
    segs = span_segments(docs)
    w = Window.partitionBy(F.xxhash64("seg")).orderBy("doc_id", "seg_no")
    want = {
        (r["doc_id"], r["seg_no"])
        for r in segs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "seg_no")
        .collect()
    }

    # stage 3 doc-ordered micro-batches: range-split, path-named, mtimes
    # strictly increasing so the file source delivers them in order
    staging = tmp_path / "docs_stream"
    staging.mkdir()
    split = [170, 340]
    parts = [
        docs.filter(F.col("doc_id") < split[0]),
        docs.filter((F.col("doc_id") >= split[0]) & (F.col("doc_id") < split[1])),
        docs.filter(F.col("doc_id") >= split[1]),
    ]
    for i, part in enumerate(parts):
        tmp_out = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(tmp_out)
        src = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        dst = staging / f"{i:02d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(staging))
    q = (
        streaming_span_dedup(stream)
        .writeStream.format("memory")
        .queryName("span_keep")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    res = spark.sql("SELECT doc_id, seg_no, kept FROM span_keep").collect()
    got_kept = {(r["doc_id"], r["seg_no"]) for r in res if r["kept"]}
    # every span got a decision, and the kept set is the batch winner set
    assert len(res) == segs.count()
    assert got_kept == want and got_kept


def test_streaming_span_dedup_definition_lineage(spark, tmp_path):
    """Definition-time lineage of the streaming span dedup: the
    applyInPandasWithState stage is a Python barrier (documented
    sentinel), capture must not crash, and the stream's file source
    resolves as the input."""
    from hive_lineage_spark.hook import LineageTracker
    from hive_lineage_spark.lineage import UNKNOWN
    from hive_lineage_spark.streaming.events import streaming_span_dedup

    staging = str(tmp_path / "docs")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    docs.write.parquet(staging)
    stream = spark.readStream.schema(docs.schema).parquet(staging)
    ql = LineageTracker().track_stream_def(streaming_span_dedup(stream), "spand")
    assert ql.report() and ql.to_json()
    assert {c.name for c in ql.result.columns} == {"doc_id", "seg_no", "kept"}
    for c in ql.result.columns:
        assert c.bases == frozenset({UNKNOWN})
    assert ql.result.input_tables, "stream source must resolve"


def test_streaming_postings_maintenance_equals_batch_rebuild(spark, tmp_path):
    """Round-5 ask #6: the postings index maintained by a STREAM (each
    arriving micro-batch appended as one postings-vtable commit via
    postings_maintenance_stream) plus the batch-side retire-list
    application must fingerprint identically to dd11's incrementally
    maintained index — which the DuckDB oracle already pins equal to a
    full batch rebuild of the final snapshot. Chain closed:
    stream-maintained ≡ dd11 ≡ batch rebuild."""
    from hive_lineage_spark.operators.dedup import (
        DEL_MOD,
        DEL_REM,
        LATE_MOD,
        LATE_REM,
        apply_postings_changes,
        dd11_incremental_postings,
    )
    from hive_lineage_spark.sources.vtable import history, read_vtable, write_vtable
    from hive_lineage_spark.streaming.events import postings_maintenance_stream

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    late = F.pmod(F.col("doc_id"), F.lit(LATE_MOD)) == LATE_REM
    docs_root = str(tmp_path / "docs_vt")
    # commit 0: the base corpus; commits 1..3: the arriving batch in thirds
    write_vtable(docs.filter(~late), docs_root, mode="overwrite")
    arriving = docs.filter(late).withColumn("third", F.pmod("doc_id", F.lit(3)))
    for t in range(3):
        write_vtable(
            arriving.filter(F.col("third") == t).drop("third"), docs_root, mode="append"
        )

    from hive_lineage_spark.sources.vtable import read_vtable_stream

    postings_root = str(tmp_path / "postings_vt")
    stream = read_vtable_stream(spark, docs_root)
    q = postings_maintenance_stream(stream, postings_root)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(history(postings_root)) >= 1  # at least one streamed commit

    deletes = docs.filter(~late).filter(F.pmod(F.col("doc_id"), F.lit(DEL_MOD)) == DEL_REM)
    maintained = apply_postings_changes(
        read_vtable(spark, postings_root), deleted_ids=deletes
    )
    got = {
        tuple(r)
        for r in maintained.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.expr("bit_xor(gh)").alias("gh_xor"))
        .collect()
    }
    want = {tuple(r) for r in dd11_incremental_postings(spark, SF).collect()}
    assert got == want and got


def test_streaming_real_decode_equals_batch_mm05(spark):
    """The real-codec decode stage composes with Structured Streaming
    unchanged: mm05's mapInPandas worker over a file-source stream of
    the image fixture produces exactly the batch operator's rows — the
    shape of a continuously-ingesting multimodal pipeline (decode is a
    stateless narrow stage, so stream/batch equality is exact)."""
    import os

    from hive_lineage_spark.operators.multimodal import (
        DECODE_REAL_SCHEMA,
        _decode_real_batches,
        _image_fixture,
        mm05_decode_image,
    )
    from hive_lineage_spark.streaming.events import run_stream_to_memory

    fixture = _image_fixture(SF)
    batch_df = spark.read.parquet(fixture)
    stream = spark.readStream.schema(batch_df.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(os.path.dirname(fixture))
    decoded = stream.mapInPandas(_decode_real_batches, schema=DECODE_REAL_SCHEMA)
    run_stream_to_memory(decoded, "mm05_stream")
    got = {tuple(r) for r in spark.sql("SELECT * FROM mm05_stream").collect()}
    want = {tuple(r) for r in mm05_decode_image(spark, SF).collect()}
    assert got == want and got


def test_streaming_hll_registers_equal_batch_and_estimate_lands(spark):
    """The streaming HLL register build (bounded 256-rows-per-window
    state) must replay-match the batch twin on watermark-closed windows,
    and the folded estimate must land within the m=256 error band of the
    exact per-window distinct-user count."""
    import math

    from hive_lineage_spark.streaming.events import (
        batch_windowed_hll_registers,
        fold_hll_registers,
        windowed_hll_registers,
    )

    stream = windowed_hll_registers(events_stream(spark, SF))
    run_stream_to_memory(stream, "hll_regs", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM hll_regs").collect()}
    assert got, "no closed windows emitted"
    batch_regs = batch_windowed_hll_registers(load_events(spark, SF))
    want = {tuple(r) for r in batch_regs.collect()}
    assert got <= want  # the stream never invents register rows
    # per closed window: ALL of that window's registers were emitted
    closed_windows = {r[0] for r in got}
    want_closed = {r for r in want if r[0] in closed_windows}
    assert got == want_closed
    # fold the streamed registers and compare against exact distincts
    ests = {
        r["win_start"]: r["hll_users"]
        for r in fold_hll_registers(spark.sql("SELECT * FROM hll_regs")).collect()
    }
    ev = load_events(spark, SF).withColumn("ts", F.col("ts").cast("timestamp"))
    exact = {
        r["win_start"]: r["n"]
        for r in ev.groupBy(
            F.window("ts", "5 minutes").alias("win")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
        .collect()
    }
    for w, est in ests.items():
        band = max(3 * 1.04 / math.sqrt(256) * exact[w], 3.0)
        assert abs(est - exact[w]) <= band, (w, est, exact[w])


def test_streaming_countmin_equals_batch_and_probe_overestimates(spark):
    """The streaming Count-Min counters (bounded 2048-rows-per-window
    state) must replay-match the batch twin on closed windows; the
    watchlist probe must never underestimate a user's true per-window
    event count and must report 0 for users with no events whose cells
    didn't all materialize."""
    from hive_lineage_spark.streaming.events import (
        batch_windowed_countmin,
        probe_countmin,
        windowed_countmin,
    )

    stream = windowed_countmin(events_stream(spark, SF))
    run_stream_to_memory(stream, "cm_counters", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM cm_counters").collect()}
    assert got, "no closed windows emitted"
    want = {tuple(r) for r in batch_windowed_countmin(load_events(spark, SF)).collect()}
    assert got <= want
    closed = {r[0] for r in got}
    assert got == {r for r in want if r[0] in closed}
    # probe the 5 busiest users + one id not in the table
    ev = load_events(spark, SF).withColumn("ts", F.col("ts").cast("timestamp"))
    busy = [r["user_id"] for r in ev.groupBy("user_id").count()
            .orderBy(F.desc("count"), F.asc("user_id")).limit(5).collect()]
    absent_id = ev.agg(F.max("user_id")).collect()[0][0] + 999
    users = spark.createDataFrame([(u,) for u in busy + [absent_id]], ["user_id"])
    est = {
        (r["win_start"], r["user_id"]): r["cm_est"]
        for r in probe_countmin(spark.sql("SELECT * FROM cm_counters"), users).collect()
    }
    exact = {
        (r["win_start"], r["user_id"]): r["n"]
        for r in ev.groupBy(F.window("ts", "5 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "user_id", "n")
        .collect()
    }
    assert any(u == busy[0] for (_, u) in est), "busiest user never probed"
    for (w, u), e in est.items():
        if w not in closed:
            continue
        true_n = exact.get((w, u), 0)
        assert e >= true_n or e == 0, (w, u, e, true_n)
        if true_n > 0:
            assert e >= true_n, (w, u, e, true_n)  # seen users: proper overestimate


def test_streaming_quantile_monitor_matches_batch_envelope(spark):
    """The streaming per-window approx-quantile monitor must (a) emit
    exactly the closed windows with exact n_events, and (b) produce
    quantiles whose RANK is within the GK guarantee of the target:
    value in [sorted[floor((q - eps)(n-1))], sorted[ceil((q + eps)(n-1))]]
    with eps = 1/accuracy + 2/n (2 rows of implementation slack — GK
    targets ceil(q*n) while interpolation targets 1 + q*(n-1), and
    per-partition summaries merge). Bounds are order statistics, NOT a
    value-relative slack — a window with one huge outlier must not widen
    (or fail) the check. Bit-equality with the batch twin is NOT the
    contract (summary compression is merge-order-dependent)."""
    import math

    from hive_lineage_spark.streaming.events import (
        QUANTILE_ACCURACY,
        QUANTILE_GRID,
        batch_windowed_value_quantiles,
        windowed_value_quantiles,
    )

    stream = windowed_value_quantiles(events_stream(spark, SF))
    run_stream_to_memory(stream, "value_quants", output_mode="append")
    got = {r["win_start"]: r for r in spark.sql("SELECT * FROM value_quants").collect()}
    assert got, "no closed windows emitted"
    batch = {
        r["win_start"]: r
        for r in batch_windowed_value_quantiles(load_events(spark, SF)).collect()
    }
    assert set(got) <= set(batch)  # the stream never invents windows
    ev = load_events(spark, SF).withColumn("ts", F.col("ts").cast("timestamp"))
    sorted_vals = {
        r["w"]: r["vals"]
        for r in ev.groupBy(F.window("ts", "5 minutes").alias("win"))
        .agg(F.array_sort(F.collect_list("value")).alias("vals"))
        .select(F.col("win.start").alias("w"), "vals")
        .collect()
    }
    for w, row in got.items():
        vals = sorted_vals[w]
        n = len(vals)
        assert row["n_events"] == batch[w]["n_events"] == n
        eps = 1.0 / QUANTILE_ACCURACY + 2.0 / n
        for q in QUANTILE_GRID:
            lo_i = max(0, math.floor((q - eps) * (n - 1)))
            hi_i = min(n - 1, math.ceil((q + eps) * (n - 1)))
            lo, hi = vals[lo_i], vals[hi_i]
            for src in (row, batch[w]):
                got_q = src[f"p{int(q * 100):02d}"]
                # 1e-4 absorbs the report's 4-dp rounding of the value
                assert lo - 1e-4 <= got_q <= hi + 1e-4, (w, q, got_q, lo, hi)


def test_streaming_compliance_gate_equals_batch_web07(spark, tmp_path):
    """web07's gate is one stateless codegen map, so its streaming face
    must emit EXACTLY the batch rows across arbitrary micro-batch
    boundaries — no state, no watermark, no reordering effects."""
    from hive_lineage_spark.operators.web import web07_robots_compliance_gate
    from hive_lineage_spark.streaming.events import streaming_compliance_gate

    staging = str(tmp_path / "docs")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "lang")
    )
    docs.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staging)

    q = (
        streaming_compliance_gate(stream)
        .writeStream.format("memory")
        .queryName("web07_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in spark.sql("SELECT * FROM web07_stream").collect()}
    want = {tuple(r) for r in web07_robots_compliance_gate(spark, SF).collect()}
    assert got == want and got


def test_streaming_warc_extract_equals_batch_web09(spark):
    """web09's record walk is per-container stateless, so its streaming
    face (containers landing as a binaryFile stream, one per trigger)
    must emit EXACTLY the batch rows — framing offsets included."""
    from hive_lineage_spark.operators.web import _warc_fixture, web09_warc_extract
    from hive_lineage_spark.streaming.events import streaming_warc_extract

    fdir = _warc_fixture(SF)
    # file streams need an explicit schema; binaryFile's is fixed
    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", "1")
        .load(fdir)
    )
    q = (
        streaming_warc_extract(stream)
        .writeStream.format("memory")
        .queryName("web09_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM web09_stream").collect()}
    want = {tuple(r) for r in web09_warc_extract(spark, SF).collect()}
    assert got == want and got
