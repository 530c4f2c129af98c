"""Structured Streaming operators over the events table.

The reference has no streaming concept (SURVEY.md §2.1 'not implemented'
list: no watermarks, no state) — this module is part of the engine's
beyond-parity surface. Patterns: file-source readStream → watermarked
windowed aggregation → memory sink (for tests; swap the source/sink for
Kafka + a real sink in production — the query graph is unchanged), plus
a stateful custom operator via ``applyInPandasWithState``.

Scale notes: watermark + append mode bounds state; the windowed agg
state is partitioned by (window, event_type) — the same shuffle keys the
batch query uses, so capacity planning carries over.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import _events_us


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the (µs-normalized) events parquet. The
    loader materializes the scratch copy; readStream needs an explicit
    schema. Streams read the FLAT µs copy, not the bucketed batch
    layout (r17): a file stream gains nothing from bucket metadata
    (micro-batches are planned per arriving file), and the flat copy's
    directory is what the lineage resolver maps back to ``events``."""
    us_file = _events_us(spark, sf_dir)
    schema = spark.read.parquet(us_file).schema
    return spark.readStream.schema(schema).parquet(os.path.dirname(us_file))


def windowed_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (the canonical
    streaming aggregation; late rows beyond the watermark are dropped).
    ts arrives as TIMESTAMP_NTZ from parquet; event-time semantics
    (watermarks) require TIMESTAMP, so cast first."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def batch_windowed_counts(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """The same aggregation on a batch DataFrame — used to assert
    stream/batch equivalence (complete replay ⇒ identical results)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )


def windowed_hll_registers(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming HLL register build: approximate distinct-USER
    cardinality per tumbling window with BOUNDED state — at most 256
    register rows per open window instead of a per-window distinct-user
    set (the state that explodes at 100 TB/day). ``max(rho)`` is
    associative and commutative, so the register build is exactly the
    kind of aggregation incremental processing can maintain; late rows
    beyond the watermark are dropped like any windowed agg.

    The register->estimate fold is NOT chained here: a second streaming
    aggregation over the first is unsupported (and unnecessary) —
    production folds the 256-row register frame in the sink/dashboard
    (``fold_hll_registers``), the registers themselves ARE the
    streaming state and the mergeable hand-off artifact (same property
    ``operators.sketches`` demonstrates across sources)."""
    from ..functions.hashing import poly_hash
    from ..operators.sketches import _hll_rho

    h = poly_hash(F.col("user_id").cast("string"))
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("bucket", h.bitwiseAND(F.lit(255)))
        .withColumn("rho", _hll_rho(h))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "bucket")
        .agg(F.max("rho").alias("mj"))
        .select(F.col("win.start").alias("win_start"), "bucket", "mj")
    )


def batch_windowed_hll_registers(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """The same register build on a batch DataFrame (replay-equivalence
    twin of :func:`windowed_hll_registers`)."""
    from ..functions.hashing import poly_hash
    from ..operators.sketches import _hll_rho

    h = poly_hash(F.col("user_id").cast("string"))
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("bucket", h.bitwiseAND(F.lit(255)))
        .withColumn("rho", _hll_rho(h))
        .groupBy(F.window("ts", window).alias("win"), "bucket")
        .agg(F.max("rho").alias("mj"))
        .select(F.col("win.start").alias("win_start"), "bucket", "mj")
    )


def fold_hll_registers(regs: DataFrame) -> DataFrame:
    """Fold (win_start, bucket, mj) register rows into per-window
    cardinality estimates — the batch-side consumer of the streaming
    register state (run over the sink table after each micro-batch).
    Reuses the sketch estimator wholesale, so the streaming monitor and
    the batch profiling layer share one set of HLL mechanics."""
    from ..operators.sketches import _hll_est

    folded = regs.groupBy("win_start").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - mj AS INT))")).alias(
            "s_sparse"
        ),
    )
    return folded.select(
        "win_start",
        _hll_est(F.col("n_present"), F.col("s_sparse")).alias("hll_users"),
    )


QUANTILE_GRID = (0.5, 0.95, 0.99)
QUANTILE_ACCURACY = 10_000


def _quantile_agg_cols(grid=QUANTILE_GRID, accuracy: int = QUANTILE_ACCURACY):
    qs = F.expr(
        f"approx_percentile(value, array({','.join(str(q) for q in grid)}), {accuracy})"
    )
    return qs


def _quantile_out_cols(grid=QUANTILE_GRID):
    return [
        F.round(F.col("qs").getItem(i) + 1e-9, 4).alias(f"p{int(q * 100):02d}")
        for i, q in enumerate(grid)
    ]


def windowed_value_quantiles(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    accuracy: int = QUANTILE_ACCURACY,
) -> DataFrame:
    """Streaming value-distribution monitor: per-window p50/p95/p99 of
    the event ``value`` via ``approx_percentile`` — the third monitor
    next to the HLL (distinct users) and Count-Min (hot keys) ones, and
    the streaming face of dq09's production estimator
    (``dq09_quantile_profile_approx``): a latency/amount tail shifting
    long before the mean moves is THE canonical streaming quality
    alarm.

    Why this state is streamable: the Greenwald-Khanna summary is a
    MERGEABLE bounded partial aggregate — per open window the state is
    O(accuracy) regardless of event volume (an exact per-window
    percentile would buffer every value into state, the dq09 scale
    trap). Contract: quantiles carry the summary's rank-error
    guarantee (n/accuracy), asserted against the exact batch envelope
    in the replay test, NOT bit-equality — summary compression is
    merge-order-dependent, so stream and batch may legitimately pick
    adjacent values."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            _quantile_agg_cols(accuracy=accuracy).alias("qs"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *_quantile_out_cols(),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def batch_windowed_value_quantiles(
    events: DataFrame, window: str = "5 minutes", accuracy: int = QUANTILE_ACCURACY
) -> DataFrame:
    """Replay-equivalence twin of :func:`windowed_value_quantiles` on a
    batch DataFrame (same estimator, same rounding)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            _quantile_agg_cols(accuracy=accuracy).alias("qs"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *_quantile_out_cols(),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def windowed_countmin(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming Count-Min counters per tumbling window: per-user event
    RATES under BOUNDED state — ≤ D_CM x W_CM (2048) counter rows per
    open window, however many distinct users the stream carries. The
    probe side (``probe_countmin``) runs sink-side against a watchlist:
    monitoring suspected-bot request rates without keeping per-user
    state is exactly what the sketch buys at 100 TB/day."""
    from ..functions.hashing import minhash_perm, poly_hash
    from ..operators.sketches import D_CM, W_CM

    h = poly_hash(F.col("user_id").cast("string"))
    rc = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                minhash_perm(h, r).bitwiseAND(F.lit(W_CM - 1)).alias("c"),
            )
            for r in range(D_CM)
        ]
    )
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("rc", F.explode(rc))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "rc.r", "rc.c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "r", "c", "cnt")
    )


def batch_windowed_countmin(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Replay-equivalence twin of :func:`windowed_countmin`."""
    from ..functions.hashing import minhash_perm, poly_hash
    from ..operators.sketches import D_CM, W_CM

    h = poly_hash(F.col("user_id").cast("string"))
    rc = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                minhash_perm(h, r).bitwiseAND(F.lit(W_CM - 1)).alias("c"),
            )
            for r in range(D_CM)
        ]
    )
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("rc", F.explode(rc))
        .groupBy(F.window("ts", window).alias("win"), "rc.r", "rc.c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "r", "c", "cnt")
    )


def probe_countmin(counters: DataFrame, users: DataFrame) -> DataFrame:
    """Sink-side watchlist probe: per (window, user) the Count-Min rate
    estimate — min over the D_CM rows' counters; an overestimate by
    construction (missing cells mean the user was NOT seen in that
    window: estimate 0). ``users`` carries a ``user_id`` column."""
    from ..functions.hashing import minhash_perm, poly_hash
    from ..operators.sketches import D_CM, W_CM

    h = poly_hash(F.col("user_id").cast("string"))
    keys = users.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        minhash_perm(h, r).bitwiseAND(F.lit(W_CM - 1)).alias("c"),
                    )
                    for r in range(D_CM)
                ]
            )
        ).alias("rc"),
    ).select("user_id", "rc.r", "rc.c")
    # a missing (r, c) counter row means that cell is ZERO for the
    # window — the sparse-counter equivalent of min(..., 0): a user
    # whose cells didn't all materialize has estimate 0 (cannot have
    # been seen, since their own events would have populated exactly
    # those cells).
    return (
        counters.join(F.broadcast(keys), ["r", "c"])
        .groupBy("win_start", "user_id")
        .agg(F.min("cnt").alias("mn"), F.count(F.lit(1)).alias("n_matched"))
        .select(
            "win_start",
            "user_id",
            F.when(F.col("n_matched") == D_CM, F.col("mn"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cm_est"),
        )
    )


def daily_volume_stream(events: DataFrame) -> DataFrame:
    """Streaming side of the dq04 ingest-volume gate: daily event counts
    as a complete-mode aggregation (state = |days| rows — bounded by the
    calendar, not the corpus; no watermark needed because day buckets
    only ever grow until the source is exhausted). The sink table has
    the (day, n_events) shape ``operators.quality.volume_gate`` expects,
    so the anomaly rule itself is shared code with the batch dq04 —
    run the gate over the sink after each micro-batch (or on demand)
    for a continuously-updated completeness report."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drive a streaming query to completion over the static file source
    (memory sink + processAllAvailable — the local test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def stream_to_vtable(
    stream_df: DataFrame,
    root: str,
    tracker=None,
    name: str = "stream_sink",
    partition_by: list[str] | None = None,
):
    """Streaming sink into a versioned table via ``foreachBatch``: each
    micro-batch becomes one atomic vtable commit, so downstream batch
    readers get snapshot isolation over the stream's output and
    ``read_vtable_changes`` replays it per batch. With a ``tracker``
    (LineageTracker), the STREAM DEFINITION is registered as the table's
    lineage writer (inside foreachBatch the batch DataFrame is
    RDD-backed, so per-batch plans bottom out at a checkpoint boundary —
    the definition plan is the one whose leaves resolve to the real
    sources); batch reads of the table then stitch column lineage
    through it, closing the stream→table→batch chain. Returns the
    StreamingQuery; caller drives/stops it.

    Exactly-once caveat: foreachBatch is at-least-once on retry; a
    production deployment would record the batch id in the commit entry
    and skip an already-committed id (the Delta idempotent-sink recipe).

    ``partition_by`` commits each micro-batch hive-partitioned with
    partition values in the manifest, so partition-restricted batch
    reads of the streaming table prune before planning — the streamed
    analog of the partitioned write path.
    """
    from ..sources.vtable import write_vtable

    if tracker is not None:
        tracker.track_stream_write_def(stream_df, root, name=f"{name}:definition")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_vtable(batch_df, root, mode="append", partition_by=partition_by)

    return stream_df.writeStream.foreachBatch(sink).outputMode("append").start()


def postings_maintenance_stream(docs_stream: DataFrame, postings_root: str):
    """Streaming maintenance of the dedup postings index: each arriving
    micro-batch of documents contributes ``postings_of(batch)`` as one
    atomic commit to a postings vtable — the insert path of
    ``dedup.apply_postings_changes`` driven by a stream, where the
    index ∪ batch union is realized by the vtable's append commit
    instead of a DataFrame union. Maintenance cost per batch is
    O(batch) (the batch's own shingles; no corpus rescan), and the
    index is snapshot-isolated for concurrent batch readers (dd02/dd03/
    dd09 probe a consistent version while the stream appends).

    Deletions cannot flow through a file stream (file sources only add);
    retire-lists apply on read via ``apply_postings_changes(read_vtable(
    root), deleted_ids=...)`` — or compact periodically with the anti-
    join materialized. Pinned stream ≡ batch-rebuild (dd11's count +
    bit_xor fingerprint) in tests/test_streaming.py. Returns the
    StreamingQuery; caller drives/stops it."""
    from ..operators.dedup import postings_of
    from ..sources.vtable import write_vtable

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_vtable(postings_of(batch_df), postings_root, mode="append")

    return docs_stream.writeStream.foreachBatch(sink).outputMode("append").start()


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup — the streaming half of the batch dedup
    surface (operators/dedup.dd01): ``dropDuplicatesWithinWatermark`` on
    the event identity keys. State holds only keys younger than the
    watermark, so memory is bounded by (arrival rate × watermark) rather
    than stream lifetime — the property that makes exact dedup viable on
    an unbounded 100 TB/day feed, where plain ``dropDuplicates`` would
    accumulate state forever."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "ts"])
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension with no streaming state at all; Spark plans the
    static side as a broadcast hash join, so at scale this is a map-side
    lookup per batch — the standard shape for attaching catalog metadata
    to a firehose."""
    return (
        events.join(F.broadcast(dim), "user_id")
        .select("user_id", "event_type", "ts", "value", "tier")
    )


def user_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small static dimension for enrich_stream: a deterministic per-user
    tier derived from the customer table."""
    from ..sources.registry import load_table

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("user_id"),
        (F.col("c_custkey") % 3).cast("int").alias("tier"),
    )


def view_purchase_join(
    events: DataFrame,
    watermark: str = "10 minutes",
    within: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join: attribute each purchase
    to a preceding view by the same user within ``within``. Both sides
    carry a watermark and the join condition bounds purchase_ts relative
    to view_ts, so Spark can expire buffered view-state once the
    purchase watermark passes view_ts + within — without the time bound
    the state would grow forever (the planner rejects an append-mode
    inner stream-stream join lacking one). State is keyed by user_id —
    the same shuffle key as the batch as-of join (q27), so skew/capacity
    planning carries over."""
    ts = F.col("ts").cast("timestamp")
    views = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), ts.alias("view_ts"))
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            ts.alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("v_user").alias("user_id"), "view_ts", "purchase_ts", "amount"
    )


def batch_view_purchase_join(events: DataFrame, within: str = "30 minutes") -> DataFrame:
    """Batch-equivalence oracle for view_purchase_join: identical logic
    over the same events as a static DataFrame (watermarks only bound
    state, never change the join result when all data is on time)."""
    ts = F.col("ts").cast("timestamp")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), ts.alias("view_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), ts.alias("purchase_ts"), F.col("value").alias("amount")
    )
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
    ).select(F.col("v_user").alias("user_id"), "view_ts", "purchase_ts", "amount")


def sessionize_stateful(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session counting with an explicit state schema (the streaming analog
    of the batch sessionization in relational.q25)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_sessions long, n_events long"
    state_schema = "last_ts long, n_sessions long, n_events long"

    def fn(key, pdfs, state: GroupState):
        last_ts, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
        rows = []
        for pdf in pdfs:
            es = (pdf["ts"].astype("int64") // 1_000_000_000).sort_values()
            for t in es:
                if last_ts is None or t - last_ts > gap_s:
                    n_sessions += 1
                n_events += 1
                last_ts = int(t)
        state.update((last_ts, n_sessions, n_events))
        rows.append((key[0], n_sessions, n_events))
        yield pd.DataFrame(rows, columns=["user_id", "n_sessions", "n_events"])

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_simhash_dedup(sigs: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: SimHash near-dup pairs over a
    continuously-arriving corpus. Each arriving (doc_id, simhash) row is
    exploded into its 4 pigeonhole band buckets (the same banding as the
    batch ``dedup.dd05_simhash_pairs`` — hamming ≤ 3 over 32 bits ⇒ at
    least one identical byte, 100% recall); per-bucket GroupState holds
    every signature seen in that bucket, and an arriving doc emits
    (lo, hi, hamming) against each stored signature within hamming ≤ 3.

    The union over buckets equals the batch dd05 pair set regardless of
    arrival order or micro-batch boundaries (pairs normalize to lo/hi;
    a pair matching in k bands surfaces k times — the consumer dedups,
    streaming state cannot see other buckets' output). State per bucket
    is the bucket's doc list — the streaming analog of dd05's banded
    index, sized by bucket occupancy, never the corpus. Pinned equal to
    dd05 end-to-end in tests/test_streaming.py."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    banded = sigs.select(
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

    out_schema = "id_a long, id_b long, hamming int"
    state_schema = "ids array<long>, sigs array<long>"

    def fn(key, pdfs, state: GroupState):
        ids, stored = state.get if state.exists else ([], [])
        ids, stored = list(ids), list(stored)
        rows = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["simhash"]):
                doc_id, sig = int(doc_id), int(sig)
                for prev_id, prev_sig in zip(ids, stored):
                    if prev_id == doc_id:
                        continue
                    d = (sig ^ prev_sig).bit_count()
                    if d <= 3:
                        lo, hi = min(doc_id, prev_id), max(doc_id, prev_id)
                        rows.append((lo, hi, d))
                ids.append(doc_id)
                stored.append(sig)
        state.update((ids, stored))
        yield pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    return banded.groupBy("band", "key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_span_dedup(docs: DataFrame, seg_w: int = 8) -> DataFrame:
    """Stateful streaming counterpart of the batch C4-style span dedup
    (``text.tx11_span_dedup``): documents arrive continuously, each is
    cut into ``seg_w``-word spans, and per-span-hash GroupState records
    the FIRST occurrence — the arriving span is kept iff it is (or
    matches) that owner. Output is the per-span keep/drop decision
    stream (doc_id, seg_no, kept); reassembly is the consumer's
    aggregation, exactly as tx11's final groupBy.

    State per group is ONE (owner_doc, owner_seg) pair keyed by the
    64-bit span hash — the streaming dedup index grows with the number
    of DISTINCT spans, never with arrivals (re-arrivals of boilerplate
    hit existing state and emit drops). Within a micro-batch the group
    processes spans in (doc_id, seg_no) order, so intra-batch ties
    resolve to the lowest key; across batches first-arrival wins —
    feed batches in ascending doc order and the kept set equals the
    batch tx11 winner set (pinned in tests/test_streaming.py)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.text import span_segments

    segs = span_segments(docs.select("doc_id", "text"), seg_w).select(
        "doc_id", "seg_no", F.xxhash64("seg").alias("gh")
    )

    out_schema = "doc_id long, seg_no int, kept boolean"
    state_schema = "owner_doc long, owner_seg int"

    def fn(key, pdfs, state: GroupState):
        owner = tuple(state.get) if state.exists else None
        arrivals = []
        for pdf in pdfs:
            arrivals += [
                (int(d), int(s)) for d, s in zip(pdf["doc_id"], pdf["seg_no"])
            ]
        rows = []
        for doc_id, seg_no in sorted(arrivals):
            if owner is None:
                owner = (doc_id, seg_no)
            rows.append((doc_id, seg_no, (doc_id, seg_no) == owner))
        state.update(owner)
        yield pd.DataFrame(rows, columns=["doc_id", "seg_no", "kept"])

    return segs.groupBy("gh").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_warc_extract(files: DataFrame) -> DataFrame:
    """Streaming face of web09's WARC ingestion: containers land as a
    binaryFile STREAM (the shape of a live crawl writing shards into a
    landing prefix), each micro-batch walks its containers' records and
    projects the same extraction metrics — the walk is per-container
    stateless (one Arrow pass, no cross-file state), so batch and
    stream emit identical rows across arbitrary micro-batch boundaries
    (pinned equal in tests, the web07-gate precedent)."""
    from ..operators.web import warc_extract_cols, warc_records

    return warc_extract_cols(warc_records(files))


def streaming_compliance_gate(docs: DataFrame) -> DataFrame:
    """Streaming face of web07's robots/licence/opt-out gate: the
    batch op is ONE stateless whole-stage-codegen map fused into the
    scan (zero exchanges), so the identical expression tree gates a
    document STREAM with no watermark, no state and no changes — the
    crawl-frontier deployment shape (score each candidate URL as it is
    discovered, before fetch). Per arriving doc: licence class, robots
    verdict, opt-out flag, allowed verdict and fixed-order reasons,
    exactly the batch columns (pinned equal in tests)."""
    from ..operators.web import compliance_gate_cols

    return compliance_gate_cols(docs.select("doc_id", "source", "lang"))
