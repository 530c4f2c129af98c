"""Versioned parquet table (sources/vtable.py): commit log as manifest,
snapshot reads, time travel, overwrite semantics, compaction, min/max
data skipping, commit exclusivity, and lineage resolution of vtable data
files back to the table root."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hive_lineage_spark.sources.vtable import (
    compact,
    expire_snapshots,
    history,
    is_vtable,
    read_vtable,
    read_vtable_changes,
    read_vtable_stream,
    write_vtable,
    _write_commit,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "events_vt")


def _nation(spark):
    return spark.read.parquet(os.path.join(SF, "nation.parquet"))


def test_append_accumulates_and_overwrite_replaces(spark, root):
    n = _nation(spark)
    v = write_vtable(n.filter("n_regionkey < 2"), root, mode="overwrite")
    assert v == 0 and is_vtable(root)
    write_vtable(n.filter("n_regionkey >= 2"), root, mode="append")
    assert read_vtable(spark, root).count() == n.count()
    # overwrite drops every earlier file from the snapshot
    write_vtable(n.filter("n_regionkey = 0"), root, mode="overwrite")
    got = read_vtable(spark, root)
    assert got.count() == n.filter("n_regionkey = 0").count()
    assert got.select("n_regionkey").distinct().collect()[0][0] == 0


def test_time_travel_by_version_and_timestamp(spark, root):
    n = _nation(spark)
    write_vtable(n.filter("n_regionkey < 2"), root, mode="overwrite")
    write_vtable(n.filter("n_regionkey >= 2"), root, mode="append")
    write_vtable(n.filter("n_regionkey = 0"), root, mode="overwrite")
    assert read_vtable(spark, root, version=0).count() == n.filter("n_regionkey < 2").count()
    assert read_vtable(spark, root, version=1).count() == n.count()
    # timestamp travel: as-of v1's commit time sees v1
    ts_v1 = history(root)[1]["ts"]
    assert read_vtable(spark, root, timestamp=ts_v1).count() == n.count()
    with pytest.raises(ValueError, match="does not exist"):
        read_vtable(spark, root, version=9)


def test_history_records_ops(spark, root):
    n = _nation(spark)
    write_vtable(n, root, mode="overwrite")
    write_vtable(n.limit(3), root, mode="append")
    compact(spark, root, num_files=1)
    h = history(root)
    assert [c["op"] for c in h] == ["overwrite", "append", "compact"]
    assert [c["version"] for c in h] == [0, 1, 2]
    assert h[2]["n_removed"] > 0


def test_compact_preserves_content_and_old_versions(spark, root):
    n = _nation(spark)
    write_vtable(n.repartition(4), root, mode="overwrite")
    before = {tuple(r) for r in read_vtable(spark, root).collect()}
    n_files_before = len(read_vtable(spark, root).inputFiles())
    compact(spark, root, num_files=1)
    after_df = read_vtable(spark, root)
    assert {tuple(r) for r in after_df.collect()} == before
    assert len(after_df.inputFiles()) == 1 < n_files_before
    # pre-compaction snapshot still resolves the original files
    assert len(read_vtable(spark, root, version=0).inputFiles()) == n_files_before


def test_stats_prune_skips_files(spark, root):
    # range-partitioned write → disjoint per-file key ranges → pruning
    # must hand Spark strictly fewer files, same filtered content
    e = (
        spark.read.parquet(os.path.join(SF, "customer.parquet"))
        .select("c_custkey", "c_acctbal")
        .repartitionByRange(4, "c_custkey")
    )
    write_vtable(e, root, mode="overwrite", stats_cols=["c_custkey"])
    full = read_vtable(spark, root)
    pruned = read_vtable(spark, root, prune=("c_custkey", 1, 10))
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    want = {tuple(r) for r in full.filter("c_custkey BETWEEN 1 AND 10").collect()}
    got = {tuple(r) for r in pruned.filter("c_custkey BETWEEN 1 AND 10").collect()}
    assert got == want


def test_commit_is_create_exclusive(spark, root):
    write_vtable(_nation(spark), root, mode="overwrite")
    with pytest.raises(FileExistsError):
        _write_commit(root, 0, {"version": 0, "ts": 0, "op": "append", "schema": "{}", "add": []})


def test_empty_snapshot_keeps_schema(spark, root):
    n = _nation(spark)
    write_vtable(n.filter("n_regionkey < 0"), root, mode="overwrite")
    got = read_vtable(spark, root)
    assert got.count() == 0
    assert got.columns == n.columns


def test_lineage_resolves_vtable_scan_to_table_root(spark, root):
    from hive_lineage_spark.hook import LineageTracker

    shutil.rmtree(root, ignore_errors=True)
    root_named = os.path.join(os.path.dirname(root), "nation_versioned")
    write_vtable(_nation(spark), root_named, mode="overwrite")
    df = (
        read_vtable(spark, root_named)
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    ql = LineageTracker().track(df, name="vt")
    assert ql.result.input_tables == ["nation_versioned"]
    assert ql.column_map()["n_regionkey"] == {("nation_versioned", "n_regionkey")}


def test_resolver_picks_vtable_root_under_data_ancestor(spark, tmp_path):
    """A vtable whose root lives UNDER a directory named `data`
    (e.g. /data/wh/t/data/v0/part) must resolve to the table root with
    the `_vlog`, not to the first `/data/` component in the path."""
    from hive_lineage_spark.hook import default_table_resolver

    vt_root = str(tmp_path / "data" / "wh" / "t")
    write_vtable(_nation(spark), vt_root, mode="overwrite")
    part = read_vtable(spark, vt_root).inputFiles()[0]
    assert default_table_resolver(part) == "t"
    # no _vlog anywhere on the path: falls through to the file-name rule
    no_vlog = str(tmp_path / "data" / "x" / "data" / "v0" / "p.parquet")
    assert default_table_resolver(no_vlog) == "p"


def test_q45_rebuilds_partial_scratch_root(spark, duck):
    """q45's scratch vtable setup must detect a partially built root
    (crash after one commit) and rebuild from scratch — appending the
    three setup commits on top would shift version indices and break
    the version=1 read."""
    from hive_lineage_spark.operators.relational import (
        _scratch,
        q45_vtable_time_travel,
        ORACLES,
    )
    from hive_lineage_spark.oracle import duckdb_fingerprint, spark_fingerprint

    vt_root = _scratch(SF, "nation_vtable")
    shutil.rmtree(vt_root, ignore_errors=True)
    # simulate a crash after the first setup commit
    write_vtable(_nation(spark).limit(3), vt_root, mode="overwrite")
    assert [c["op"] for c in history(vt_root)] == ["overwrite"]
    sfp = spark_fingerprint(q45_vtable_time_travel(spark, SF))
    dfp = duckdb_fingerprint(duck, ORACLES["q45_vtable_time_travel"])
    assert sfp == dfp
    assert [c["op"] for c in history(vt_root)] == ["overwrite", "append", "overwrite"]


def test_change_feed_delivers_per_commit_inserts(spark, root):
    n = _nation(spark)
    write_vtable(n.filter("n_regionkey = 0"), root, mode="overwrite")
    write_vtable(n.filter("n_regionkey = 1"), root, mode="append")
    write_vtable(n.filter("n_regionkey = 2"), root, mode="append")
    compact(spark, root)
    ch = read_vtable_changes(spark, root, from_version=1)
    got = {(r["n_regionkey"], r["_commit_version"]) for r in ch.collect()}
    # commits 1 and 2 only — compaction (v3) rewrites are not re-delivered
    assert got == {(1, 1), (2, 2)}
    assert read_vtable_changes(spark, root, from_version=1, to_version=1).count() == n.filter(
        "n_regionkey = 1"
    ).count()


def test_streaming_source_picks_up_new_commits(spark, root):
    n = _nation(spark)
    write_vtable(n.filter("n_regionkey < 2"), root, mode="append")
    stream = read_vtable_stream(spark, root)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("vt_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.table("vt_stream").count()
        assert first == n.filter("n_regionkey < 2").count()
        write_vtable(n.filter("n_regionkey >= 2"), root, mode="append")
        q.processAllAvailable()
        assert spark.table("vt_stream").count() == n.count()
    finally:
        q.stop()


def test_write_read_stitches_through_union_of_commits(spark, root):
    """Reads of a snapshot built from several tracked append commits
    must stitch column lineage to EVERY contributing writer query."""
    from hive_lineage_spark.hook import LineageTracker

    tracker = LineageTracker()
    c = (
        spark.read.parquet(os.path.join(SF, "customer.parquet"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    tracker.track_write_vtable(c.filter("c_custkey % 2 = 0"), root, mode="overwrite")
    tracker.track_write_vtable(c.filter("c_custkey % 2 = 1"), root, mode="append")
    df = (
        read_vtable(spark, root)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )
    df.collect()
    ql = tracker.track(df, name="readback")
    assert ql.result.input_tables == ["customer"]
    assert ql.column_map()["sum_bal"] == {("customer", "c_acctbal")}
    assert ql.column_map()["c_mktsegment"] == {("customer", "c_mktsegment")}
    # an overwrite commit resets the writer set to just itself
    tracker.track_write_vtable(c.limit(5), root, mode="overwrite")
    vt = os.path.basename(root)
    assert len(tracker._vtable_writers[vt]) == 1


def test_stream_to_vtable_commits_batches_and_stitches_lineage(spark, root):
    """foreachBatch → vtable: micro-batches land as atomic commits; the
    content equals the batch projection, and a tracked batch read
    stitches column lineage through the STREAMING writer back to the
    events source."""
    from hive_lineage_spark.hook import LineageTracker
    from hive_lineage_spark.sources.registry import load_events
    from hive_lineage_spark.streaming.events import events_stream, stream_to_vtable

    tracker = LineageTracker()
    root_named = os.path.join(os.path.dirname(root), "event_values")
    stream = events_stream(spark, SF).select("event_id", "user_id", "event_type", "value")
    q = stream_to_vtable(stream, root_named, tracker=tracker)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    h = history(root_named)
    assert len(h) >= 1 and all(c["op"] == "append" for c in h)
    got = read_vtable(spark, root_named)
    want = load_events(spark, SF).select("event_id", "user_id", "event_type", "value")
    assert got.count() == want.count()
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    df = got.groupBy("event_type").agg(F.round(F.sum("value"), 2).alias("total"))
    df.collect()
    ql = tracker.track(df, name="readback")
    assert ql.result.input_tables == ["events"]
    assert ql.column_map()["total"] == {("events", "value")}
    assert ql.column_map()["event_type"] == {("events", "event_type")}


def test_schema_evolution_on_append(spark, root):
    """Appending with an extra column evolves the snapshot schema (the
    latest commit's schema wins); rows from pre-evolution files read the
    new column as NULL — Delta-style additive evolution."""
    n = _nation(spark).select("n_nationkey", "n_name")
    write_vtable(n, root, mode="overwrite")
    evolved = _nation(spark).select(
        "n_nationkey", "n_name", F.col("n_regionkey").alias("region")
    )
    write_vtable(evolved, root, mode="append")
    got = read_vtable(spark, root)
    assert got.columns == ["n_nationkey", "n_name", "region"]
    assert got.count() == 2 * n.count()
    assert got.filter(F.col("region").isNull()).count() == n.count()
    # pre-evolution snapshot still reads with the old schema
    assert read_vtable(spark, root, version=0).columns == ["n_nationkey", "n_name"]


def test_change_feed_maintains_postings_index(spark, root):
    """Incremental index maintenance from the change feed: the postings
    index built at v0, updated per-commit with apply_postings_changes
    (arriving batch from read_vtable_changes + a retirement drop list),
    must equal the index batch-built from the final snapshot — the
    'never rebuild the cold index' production story behind dd11."""
    from hive_lineage_spark.operators.dedup import apply_postings_changes, postings_of

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("doc_id", "text")
    late = F.pmod(F.col("doc_id"), F.lit(4)) == 3
    write_vtable(docs.filter(~late), root, mode="overwrite")
    write_vtable(docs.filter(late), root, mode="append")

    idx0 = postings_of(read_vtable(spark, root, version=0))
    arriving = read_vtable_changes(spark, root, from_version=1).select("doc_id", "text")
    deletes = read_vtable(spark, root, version=0).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 7
    ).select("doc_id")
    maintained = apply_postings_changes(idx0, inserted_docs=arriving, deleted_ids=deletes)

    snapshot = read_vtable(spark, root).join(deletes, "doc_id", "left_anti")
    want = {tuple(r) for r in postings_of(snapshot).collect()}
    got = {tuple(r) for r in maintained.collect()}
    assert got == want and got, "maintained index must equal a full rebuild"


def test_change_feed_drives_incremental_dedup(spark, root):
    """The CDC production story: documents land in a versioned table
    commit by commit; each arriving commit (via the change feed) is
    near-dedup-probed against the previously indexed snapshot. The
    result must equal the batch operator's split-by-id semantics
    (dd09's DuckDB-checked definition)."""
    from hive_lineage_spark.operators.dedup import (
        dd09_incremental_dedup,
        incremental_dedup_frames,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select("doc_id", "text")
    split = docs.groupBy().agg(F.floor(F.max("doc_id") / 2).cast("long").alias("s")).collect()[0][0]
    write_vtable(docs.filter(F.col("doc_id") < split), root, mode="overwrite")
    write_vtable(docs.filter(F.col("doc_id") >= split), root, mode="append")

    arriving = read_vtable_changes(spark, root, from_version=1).select("doc_id", "text")
    indexed = read_vtable(spark, root, version=0)
    got = {
        tuple(r) for r in incremental_dedup_frames(arriving, indexed).collect()
    }
    want = {tuple(r) for r in dd09_incremental_dedup(spark, SF).collect()}
    assert got == want and got, "CDC-driven dedup must equal the batch split operator"


def test_merge_vtable_upserts_atomically(spark, root):
    """MERGE shape: update matching keys, insert new ones, one atomic
    version; time travel still sees the pre-merge snapshot and the
    change feed delivers the merge like any commit."""
    from hive_lineage_spark.sources.vtable import merge_vtable

    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    write_vtable(n, root, mode="overwrite")

    updates = spark.createDataFrame(
        [(0, "RENAMED", 9), (999, "BRAND_NEW", 9)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    v = merge_vtable(spark, root, updates, key="n_nationkey")
    assert v == 1 and history(root)[-1]["op"] == "merge"

    got = {tuple(r) for r in read_vtable(spark, root).collect()}
    want = {tuple(r) for r in n.filter("n_nationkey <> 0").collect()} | {
        (0, "RENAMED", 9),
        (999, "BRAND_NEW", 9),
    }
    assert got == want
    # pre-merge snapshot untouched
    pre = {tuple(r) for r in read_vtable(spark, root, version=0).collect()}
    assert pre == {tuple(r) for r in n.collect()}
    # the merge commit's adds arrive on the change feed
    ch = read_vtable_changes(spark, root, from_version=1)
    assert ch.filter("n_nationkey IN (0, 999)").count() == 2


def test_self_referential_vtable_rewrite_stitches_to_base(spark, root):
    """INSERT OVERWRITE t ... SELECT FROM t — the self-referential
    rewrite. On plain parquet paths Spark itself fails this (overwrite
    deletes the files mid-read); through the versioned table it is safe
    (new files + atomic log swap), and lineage stitching must TERMINATE
    and resolve through both writer generations to the original base
    table."""
    from hive_lineage_spark.hook import LineageTracker

    root_named = os.path.join(os.path.dirname(root), "nation_selfref")
    n = _nation(spark).select("n_nationkey", "n_name")
    tr = LineageTracker()
    tr.track_write_vtable(n, root_named, mode="overwrite", name="w0")
    cur = read_vtable(spark, root_named).withColumn("n_name", F.upper("n_name"))
    tr.track_write_vtable(cur, root_named, mode="overwrite", name="w1")

    assert read_vtable(spark, root_named).count() == n.count()
    back = read_vtable(spark, root_named).groupBy("n_name").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    back.collect()
    ql = tr.track(back, name="readback")
    assert ql.result.input_tables == ["nation"]
    assert ql.column_map()["n_name"] == {("nation", "n_name")}


def test_expire_snapshots_vacuums_unreferenced_files(spark, root):
    """expire_snapshots keeps the retained window readable, deletes data
    files no retained snapshot references, and makes expired versions
    fail loudly (replay + change feed) instead of returning partial
    data."""
    n = _nation(spark)
    write_vtable(n.filter("n_regionkey = 0"), root, mode="append")   # v0
    write_vtable(n.filter("n_regionkey = 1"), root, mode="overwrite")  # v1 — v0 files inactive
    write_vtable(n.filter("n_regionkey = 2"), root, mode="append")   # v2

    def disk_files():
        out = []
        for dirpath, _, names in os.walk(os.path.join(root, "data")):
            out += [os.path.join(dirpath, f) for f in names if f.endswith(".parquet")]
        return set(out)

    before = disk_files()
    want_latest = read_vtable(spark, root).count()
    got = expire_snapshots(root, keep_last=2)  # retain v1, v2
    assert got["expire_before"] == 1 and got["n_deleted"] >= 1
    after = disk_files()
    assert after < before  # v0's overwritten files are physically gone
    # retained window still reads, latest content unchanged
    assert read_vtable(spark, root).count() == want_latest
    assert read_vtable(spark, root, version=1).count() == n.filter("n_regionkey = 1").count()
    # expired version fails loudly
    with pytest.raises(ValueError, match="expired"):
        read_vtable(spark, root, version=0)
    with pytest.raises(ValueError, match="horizon"):
        read_vtable_changes(spark, root, from_version=0)
    # the change feed from the horizon still works
    assert set(
        r["_commit_version"]
        for r in read_vtable_changes(spark, root, from_version=1).select("_commit_version").distinct().collect()
    ) == {1, 2}
    # history shows the audit commit; horizons are monotone
    assert history(root)[-1]["op"] == "expire"
    again = expire_snapshots(root, keep_last=10)
    assert again["expire_before"] == 1 and again["n_deleted"] == 0


def test_expire_after_compact_bounds_storage(spark, root):
    """The compaction + expire pair is the storage-bounding loop of a
    continuously ingesting table: compact rewrites the active set,
    expire deletes the pre-compaction generation."""
    n = _nation(spark)
    for rk in range(3):
        write_vtable(n.filter(F.col("n_regionkey") == rk), root, mode="append")
    total = read_vtable(spark, root).count()
    compact(spark, root, num_files=1)  # v3
    got = expire_snapshots(root, keep_last=1)
    assert got["n_deleted"] >= 3  # all three pre-compaction commits' files
    assert read_vtable(spark, root).count() == total
    with pytest.raises(ValueError, match="expired"):
        read_vtable(spark, root, version=2)


def test_clustered_compaction_restores_skipping(spark, root):
    """Appends interleave key ranges, so per-file min/max stats stop
    pruning; compact(cluster_by=...) range-partitions the rewrite and a
    pruned read touches strictly fewer files again — Delta OPTIMIZE
    ZORDER's 1-D analog."""
    c = spark.read.parquet(os.path.join(SF, "customer.parquet")).select(
        "c_custkey", "c_acctbal"
    )
    # three appends, each spanning the WHOLE key range (interleaved)
    for m in range(3):
        write_vtable(
            c.filter(F.col("c_custkey") % 3 == m), root,
            mode="append", stats_cols=["c_custkey"],
        )
    before = read_vtable(spark, root, prune=("c_custkey", 1, 10))
    assert len(before.inputFiles()) == len(read_vtable(spark, root).inputFiles())
    want = {tuple(r) for r in read_vtable(spark, root).filter("c_custkey BETWEEN 1 AND 10").collect()}

    compact(spark, root, num_files=4, cluster_by="c_custkey")
    full = read_vtable(spark, root)
    pruned = read_vtable(spark, root, prune=("c_custkey", 1, 10))
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    got = {tuple(r) for r in pruned.filter("c_custkey BETWEEN 1 AND 10").collect()}
    assert got == want


def test_partitioned_vtable_write_read_and_prune(spark, root):
    """write_vtable(partition_by=...): hive-layout commit with partition
    values in the manifest; full read round-trips (partition columns
    re-attached), partitions={...} prunes at the manifest, and stats +
    partition pruning compose."""
    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    write_vtable(n, root, mode="overwrite",
                 partition_by=["n_regionkey"], stats_cols=["n_nationkey"])
    # round trip: same rows, partition column restored with its type
    got = read_vtable(spark, root)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in n.collect()}
    assert dict(got.dtypes)["n_regionkey"] == dict(n.dtypes)["n_regionkey"]
    # manifest-level partition pruning: only that partition's files
    one = read_vtable(spark, root, partitions={"n_regionkey": "2"})
    assert len(one.inputFiles()) < len(got.inputFiles())
    assert {r["n_nationkey"] for r in one.collect()} == {
        r["n_nationkey"] for r in n.filter("n_regionkey = 2").collect()
    }
    # appends extend partitions; time travel still resolves v0 only
    write_vtable(n.withColumn("n_nationkey", F.col("n_nationkey") + 100),
                 root, mode="append", partition_by=["n_regionkey"])
    assert read_vtable(spark, root).count() == 2 * n.count()
    assert read_vtable(spark, root, version=0).count() == n.count()
    both = read_vtable(spark, root, partitions={"n_regionkey": "2"},
                       prune=("n_nationkey", 0, 99))
    assert {r["n_nationkey"] for r in both.filter("n_nationkey < 100").collect()} == {
        r["n_nationkey"] for r in n.filter("n_regionkey = 2").collect()
    }


def test_partitioned_vtable_registers_partition_defs(spark, root):
    """track_write_vtable(partition_by=...) registers one PartitionDef
    per partition value (ConvertHelper's table->partition cascade on the
    lakehouse path) and write->read lineage still stitches."""
    from hive_lineage_spark.hook import LineageTracker
    from hive_lineage_spark.metadata import PartitionDef

    root_named = os.path.join(os.path.dirname(root), "nation_part_vt")
    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    tr = LineageTracker()
    tr.track_write_vtable(n, root_named, mode="overwrite",
                          partition_by=["n_regionkey"], name="w")
    parts = [p for p in tr.model.of_type(PartitionDef)
             if p.table_fqn == "default@nation_part_vt"]
    assert len(parts) == n.select("n_regionkey").distinct().count()
    assert {p.values for p in parts} == {
        (str(r["n_regionkey"]),) for r in n.select("n_regionkey").distinct().collect()
    }
    back = read_vtable(spark, root_named).groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("cnt"))
    back.collect()
    ql = tr.track(back, name="rb")
    assert ql.result.input_tables == ["nation"]


def test_partitioned_maintenance_and_change_feed(spark, root):
    """The review-found corruption vectors, pinned: (a) the change feed
    must deliver REAL partition values (not NULLs); (b) compact and
    merge must preserve the partition spec so partition-restricted
    reads stay correct after routine maintenance; (c) expire must
    remove the emptied partitioned commit dirs; (d) streaming a
    partitioned table refuses loudly; (e) unknown partition keys raise;
    (f) escaped partition values round-trip."""
    from hive_lineage_spark.sources.vtable import expire_snapshots, merge_vtable

    n = _nation(spark).select("n_nationkey", "n_name", "n_regionkey")
    write_vtable(n, root, mode="overwrite", partition_by=["n_regionkey"])
    # (a) change feed with real partition values
    ch = read_vtable_changes(spark, root, from_version=0)
    assert ch.filter(F.col("n_regionkey").isNull()).count() == 0
    assert {r["n_regionkey"] for r in ch.collect()} == {0, 1, 2, 3, 4}
    # (b) compact keeps the spec; restricted read stays exact
    compact(spark, root, num_files=1)
    one = read_vtable(spark, root, partitions={"n_regionkey": "2"})
    assert {r["n_nationkey"] for r in one.collect()} == {
        r["n_nationkey"] for r in n.filter("n_regionkey = 2").collect()
    }
    # merge keeps the spec too
    upd = n.filter("n_nationkey = 3").withColumn("n_name", F.lit("X"))
    merge_vtable(spark, root, upd, key="n_nationkey")
    after = read_vtable(spark, root, partitions={"n_regionkey": "3"})
    assert after.filter("n_nationkey = 3").collect()[0]["n_name"] == "X"
    assert {r["n_regionkey"] for r in after.collect()} == {3}
    # (c) expire removes the emptied pre-compaction partition dirs
    got = expire_snapshots(root, keep_last=1)
    assert got["n_deleted"] >= 1
    vdirs = [d for d in os.listdir(os.path.join(root, "data"))]
    for d in vdirs:
        full = os.path.join(root, "data", d)
        assert os.listdir(full), f"empty commit dir left behind: {d}"
    # (d) streaming refuses partitioned tables
    with pytest.raises(ValueError, match="partitioned"):
        read_vtable_stream(spark, root)
    # (e) unknown partition key raises instead of silent-empty
    with pytest.raises(ValueError, match="unknown partition"):
        read_vtable(spark, root, partitions={"n_regionky": "2"})


def test_partitioned_escaped_values_roundtrip(spark, root):
    """Partition values containing hive-escaped characters ('=', ':')
    must round-trip through the directory encoding: the manifest holds
    the LOGICAL value, matching and re-attachment use it."""
    df = spark.createDataFrame(
        [(1, "a=b"), (2, "c:d"), (3, "plain")], "id long, seg string"
    )
    write_vtable(df, root, mode="overwrite", partition_by=["seg"])
    full = read_vtable(spark, root)
    assert {r["seg"] for r in full.collect()} == {"a=b", "c:d", "plain"}
    one = read_vtable(spark, root, partitions={"seg": "a=b"})
    assert [r["id"] for r in one.collect()] == [1]


def test_schema_history_reports_drift(spark, root):
    """schema_history: only drifting commits appear, with the exact
    added/removed/retyped column sets."""
    from hive_lineage_spark.sources.vtable import schema_history

    n = _nation(spark).select("n_nationkey", "n_name")
    write_vtable(n, root, mode="overwrite")                      # v0: base
    write_vtable(n, root, mode="append")                         # v1: same schema
    write_vtable(                                                # v2: +col
        n.withColumn("extra", F.lit(1)), root, mode="append"
    )
    write_vtable(                                                # v3: retype+drop
        n.withColumn("n_nationkey", F.col("n_nationkey").cast("long")),
        root, mode="overwrite",
    )
    h = schema_history(root)
    assert [e["version"] for e in h] == [0, 2, 3]
    assert h[1]["added"] == ["extra"] and not h[1]["removed"]
    assert h[2]["removed"] == ["extra"] and h[2]["retyped"] == ["n_nationkey"]


def test_stream_to_partitioned_vtable(spark, root, tmp_path):
    """Streaming micro-batches committed hive-partitioned: partition-
    restricted batch reads of the streamed table prune at the manifest
    and return exactly that partition across all commits; the change
    feed delivers real partition values per batch."""
    from hive_lineage_spark.streaming.events import stream_to_vtable

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "lang", "n_chars"
    )
    staging = str(tmp_path / "arriving")
    docs.repartition(3).write.parquet(staging)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staging)
    q = stream_to_vtable(stream, root, partition_by=["lang"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    want = docs.filter(F.col("lang") == langs[0]).count()
    got = read_vtable(spark, root, partitions={"lang": langs[0]})
    assert got.count() == want
    assert {r["lang"] for r in got.collect()} == {langs[0]}
    full = read_vtable(spark, root)
    assert len(got.inputFiles()) < len(full.inputFiles())
    ch = read_vtable_changes(spark, root, from_version=0)
    assert ch.filter(F.col("lang").isNull()).count() == 0


def test_dq03_drift_gate_time_travel(spark):
    """dq03's setup is a real two-version vtable: schema_history reports
    the ship_bucket addition at v1, version-0 time travel returns only
    the l_linenumber <= 3 rows, and the drift frame's row counts equal
    the two snapshots' counts."""
    from hive_lineage_spark.operators.quality import dq03_snapshot_drift
    from hive_lineage_spark.operators.relational import _scratch
    from hive_lineage_spark.sources.vtable import read_vtable, schema_history

    sf = "/root/testdata/sf0.001"
    rows = {r["column"]: r for r in (r.asDict() for r in dq03_snapshot_drift(spark, sf).collect())}
    root = _scratch(sf, "lineitem_drift_vtable")

    drift = schema_history(root)
    assert [d["version"] for d in drift] == [0, 1]
    assert drift[1]["added"] == ["ship_bucket"] and not drift[1]["removed"]

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    n_v0 = li.filter("l_linenumber <= 3").count()
    assert read_vtable(spark, root, version=0).count() == n_v0
    assert read_vtable(spark, root).count() == li.count()
    assert rows["l_quantity"]["n_rows_a"] == n_v0
    assert rows["l_quantity"]["n_rows_b"] == li.count()
    # schema drift never fabricates null-drift: only common columns profiled
    assert "ship_bucket" not in rows


def test_change_feed_maintains_ivf_index(spark, root):
    """ss23's lifecycle driven by the ACTUAL vtable change feed (not the
    deterministic stand-ins): embeddings land commit by commit; the
    arriving commit is read via read_vtable_changes, assigned against
    the FROZEN centroids with the same ivf_assign the stored-index
    builder uses, and (base ∖ tombstones) ∪ assign(arriving) must equal
    a full assignment of the final snapshot — cell for cell."""
    from hive_lineage_spark.operators.similarity import (
        cent_arr_of,
        ivf_assign,
        vectors_of,
    )

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    late = F.pmod(F.col("vec_id"), F.lit(4)) == 3
    write_vtable(emb.filter(~late), root, mode="overwrite")
    write_vtable(emb.filter(late), root, mode="append")

    # frozen quantizer: centroids from the FULL table, never recomputed
    cent_arr = cent_arr_of(vectors_of(emb))
    base_idx = ivf_assign(vectors_of(read_vtable(spark, root, version=0)), cent_arr)
    arriving = read_vtable_changes(spark, root, from_version=1).select(
        "vec_id", "embedding"
    )
    drops = read_vtable(spark, root, version=0).filter(
        F.pmod(F.col("vec_id"), F.lit(10)) == 7
    ).select("vec_id")
    maintained = (
        base_idx.join(drops, "vec_id", "left_anti")
        .unionByName(ivf_assign(vectors_of(arriving), cent_arr))
        .select("vec_id", "cell")
    )
    snapshot = read_vtable(spark, root).join(drops, "vec_id", "left_anti")
    want = {
        tuple(r)
        for r in ivf_assign(vectors_of(snapshot), cent_arr).select("vec_id", "cell").collect()
    }
    got = {tuple(r) for r in maintained.collect()}
    assert got == want and got, "maintained vector index must equal a full rebuild"
