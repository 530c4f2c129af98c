"""Versioned parquet table ("vtable") — a native, jar-free lakehouse
format with the core Delta-Lake-style mechanics the gated connectors in
``lakehouse.py`` would provide: an append-only JSON commit log that IS
the file manifest, snapshot-isolated reads, time travel (by version or
timestamp), table history, compaction, and per-file min/max column stats
for data skipping.

Layout::

    <root>/_vlog/00000000.json     one commit per file, monotonically
    <root>/_vlog/00000001.json     numbered; created with O_EXCL so a
    ...                            losing concurrent writer fails cleanly
    <root>/data/v<version>-<uuid>/part-*.parquet   immutable data files

Commit entry::

    {"version": n, "ts": epoch, "op": "overwrite"|"append"|"compact",
     "schema": <Spark schema json>,
     "add":    [{"path": rel, "stats": {col: [min, max]} | null}, ...],
     "remove": [rel, ...]}

Why this scales (the same reasons Delta/Iceberg do):

- **The log is the manifest.** A read replays O(commits) small JSON
  files and never LISTs the data directory — on an object store that
  turns an O(files) LIST storm into a few GETs.
- **Immutable data files + atomic log append** give snapshot isolation:
  a reader that resolved version N keeps a consistent file set even
  while writers commit N+1.
- **Data skipping**: per-file min/max stats recorded at write time let
  ``read_vtable(..., prune=(col, lo, hi))`` drop non-overlapping files
  BEFORE Spark plans the scan — the scan's file index never sees them
  (complementing row-group pushdown inside the files that survive).
- Reads hand Spark an explicit file list with an explicit schema, so
  column pruning and predicate pushdown work exactly as for any parquet
  scan, and the lineage layer resolves the files back to the table root
  (``hook.default_table_resolver``).

Single-writer-per-commit is assumed (O_EXCL create on local/HDFS
semantics; an object-store port would use a conditional PUT — the same
protocol point Delta's LogStore abstracts).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG_DIR = "_vlog"


def _strip_scheme(path: str) -> str:
    return path[5:] if path.startswith("file:") else path


def _log_dir(root: str) -> str:
    return os.path.join(_strip_scheme(root), LOG_DIR)


def _commit_files(root: str) -> list[str]:
    d = _log_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".json"))


def is_vtable(root: str) -> bool:
    return bool(_commit_files(root))


def _write_commit(root: str, version: int, entry: dict) -> None:
    """Atomic create-exclusive commit: a concurrent writer that lost the
    race to this version number gets FileExistsError instead of silently
    clobbering history."""
    final = os.path.join(_log_dir(root), f"{version:08d}.json")
    with open(final, "x") as f:
        json.dump(entry, f)


def _load_commits(root: str) -> list[dict]:
    """Parse the whole commit log ONCE (each commit is one small JSON;
    on an object store every read is a GET, so callers reuse this list
    rather than re-reading per snapshot)."""
    files = _commit_files(root)
    if not files:
        raise FileNotFoundError(f"not a vtable (no {LOG_DIR}/ commits): {root}")
    commits = []
    for fname in files:
        with open(os.path.join(_log_dir(root), fname)) as f:
            commits.append(json.load(f))
    return commits


def _replay(root: str, version: int | None = None, timestamp: float | None = None):
    """Replay the log to the requested snapshot. Returns
    (schema_json, {rel_path: {"stats", "partition"}}, effective_version)."""
    return _replay_commits(_load_commits(root), version, timestamp)


def _replay_commits(
    commits: list[dict], version: int | None = None, timestamp: float | None = None
):
    # expired snapshots are unreadable: their data files may be deleted
    # (expire_snapshots), so resolving below the horizon must fail
    # loudly, never return a partial file set
    horizon = max((c.get("expire_before", 0) for c in commits), default=0)
    if timestamp is not None:
        commits = [c for c in commits if c["ts"] <= timestamp]
        if not commits:
            raise ValueError(f"no commit at or before timestamp {timestamp}")
    if version is not None:
        if version >= len(commits):
            raise ValueError(f"version {version} does not exist (latest: {len(commits) - 1})")
        commits = commits[: version + 1]
    if commits[-1]["version"] < horizon:
        raise ValueError(
            f"version {commits[-1]['version']} has been expired "
            f"(retention horizon: {horizon}); expire_snapshots removed its files"
        )
    active: dict[str, dict] = {}
    for c in commits:
        if c["op"] == "overwrite":
            active = {}
        for rel in c.get("remove", []):
            active.pop(rel, None)
        for add in c["add"]:
            active[add["path"]] = {
                "stats": add.get("stats"),
                "partition": add.get("partition"),
            }
    return commits[-1]["schema"], active, commits[-1]["version"]


def _collect_stats(spark: SparkSession, data_dir: str, stats_cols: list[str]) -> dict:
    """Per-file min/max for the given columns — one aggregation over the
    freshly written files, O(#files) result rows (not data) at the
    driver. ``_metadata.file_path`` is the engine-provided file identity;
    keys are paths RELATIVE to ``data_dir`` (a partitioned write reuses
    basenames across partition directories, so basenames don't identify)."""
    df = spark.read.parquet(data_dir).select(
        F.col("_metadata.file_path").alias("__file"), *stats_cols
    )
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    prefix = "file:" + os.path.abspath(data_dir) + "/"
    out = {}
    for r in df.groupBy("__file").agg(*aggs).collect():
        key = r["__file"]
        key = key[len(prefix):] if key.startswith(prefix) else os.path.basename(key)
        out[key] = {c: [r[f"__min_{c}"], r[f"__max_{c}"]] for c in stats_cols}
    return out


def _unescape_partition_value(v: str) -> str | None:
    """Hive directory names percent-encode special chars ('=', '/', ':',
    '%', ...) and spell NULL as a sentinel; the MANIFEST records the
    logical value, so matching and re-attachment use real data values,
    not path tokens."""
    if v == "__HIVE_DEFAULT_PARTITION__":
        return None
    from urllib.parse import unquote

    return unquote(v)


def write_vtable(
    df: DataFrame,
    root: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    _op: str | None = None,
    _remove: list[str] | None = None,
) -> int:
    """Commit ``df`` as a new table version; returns the version number.
    ``mode`` is ``append`` or ``overwrite``; ``stats_cols`` opts columns
    into per-file min/max stats for read-time data skipping.

    ``partition_by`` writes the commit hive-partitioned (``k=v``
    directories) and records each file's partition VALUES in the
    manifest — the Iceberg-partition-spec analog: ``read_vtable(...,
    partitions={...})`` then prunes at the manifest, so a partition-
    restricted scan never lists or plans the other partitions' files.
    The spec is per-commit metadata; all commits of a table are expected
    to share it (first commit fixes the convention, as in every table
    format)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    root = _strip_scheme(root)
    os.makedirs(_log_dir(root), exist_ok=True)
    version = len(_commit_files(root))
    data_rel = os.path.join("data", f"v{version:08d}-{uuid.uuid4().hex[:8]}")
    data_dir = os.path.join(root, data_rel)
    if partition_by:
        df.write.mode("error").partitionBy(*partition_by).parquet(data_dir)
    else:
        df.write.mode("error").parquet(data_dir)
    part_files = []  # rel-to-data_dir paths, partition dirs included
    for dirpath, _dirs, names in sorted(os.walk(data_dir)):
        rel_dir = os.path.relpath(dirpath, data_dir)
        for f in sorted(n for n in names if n.endswith(".parquet")):
            part_files.append(f if rel_dir == "." else os.path.join(rel_dir, f))
    stats = (
        _collect_stats(df.sparkSession, data_dir, stats_cols) if stats_cols and part_files else {}
    )

    def _pvals(rel: str) -> dict | None:
        vals = {}
        for seg in rel.split(os.sep)[:-1]:
            k, _, v = seg.partition("=")
            vals[k] = _unescape_partition_value(v)
        return vals or None

    entry = {
        "version": version,
        "ts": time.time(),
        "op": _op or mode,
        "schema": df.schema.json(),
        "add": [
            {
                "path": f"{data_rel}/{f}",
                "stats": stats.get(f),
                **({"partition": _pvals(f)} if partition_by else {}),
            }
            for f in part_files
        ],
        "remove": _remove or [],
    }
    if partition_by:
        entry["partition_by"] = list(partition_by)
    _write_commit(root, version, entry)
    return version


def read_vtable(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    timestamp: float | None = None,
    prune: tuple[str, object, object] | None = None,
    partitions: dict[str, str] | None = None,
) -> DataFrame:
    """Snapshot read. ``version``/``timestamp`` time-travel; ``prune``
    = (col, lo, hi) drops files whose recorded [min, max] cannot
    intersect [lo, hi] before Spark ever plans the scan (files without
    stats are conservatively kept) — an optimization only; apply the
    real filter on the returned DataFrame as usual.

    ``partitions`` = {col: value} restricts a hive-partitioned table
    (``write_vtable(partition_by=...)``) to matching partitions and IS a
    semantic filter: manifest pruning drops the other partitions' files
    before Spark ever builds a file index, and a residual equality
    filter covers any conservatively-kept file whose manifest entry
    lacks partition values (e.g. a commit written without the spec) —
    the result equals a WHERE on the partition columns regardless of
    manifest completeness. Unknown partition keys raise (a typo would
    otherwise read as an empty partition).

    Partition columns live in directory names, not the files, so the
    read re-attaches them as per-group literals: one scan per distinct
    partition tuple, unioned. #groups = #selected partitions (a
    partition spec is low-cardinality by design; a production source
    would hand Spark basePath-style discovery instead)."""
    root = _strip_scheme(root)
    commits = _load_commits(root)
    schema_json, active, _ = _replay_commits(commits, version, timestamp)
    schema = StructType.fromJson(json.loads(schema_json))
    rels = sorted(active)
    if partitions:
        known: set[str] = set()
        for c in commits:
            known.update(c.get("partition_by") or [])
        unknown = set(partitions) - known
        if unknown:
            raise ValueError(
                f"unknown partition column(s) {sorted(unknown)}; "
                f"this table is partitioned by {sorted(known) or 'nothing'}"
            )
        rels = [
            rel
            for rel in rels
            if (pv := active[rel].get("partition")) is None
            or all(pv.get(k) == str(v) for k, v in partitions.items())
        ]
    if prune is not None:
        col, lo, hi = prune
        kept = []
        for rel in rels:
            st = active[rel].get("stats")
            if st is None or col not in st or st[col][0] is None:
                kept.append(rel)
                continue
            mn, mx = st[col]
            if not (mx < lo or mn > hi):
                kept.append(rel)
        rels = kept
    if not rels:
        return spark.createDataFrame([], schema)
    out = _read_with_partitions(spark, root, rels, active, schema)
    if partitions:
        # residual semantic filter (see docstring): a no-op on files the
        # manifest already pruned, the real predicate on conservative keeps
        for k, v in partitions.items():
            out = out.filter(F.col(k).cast("string") == F.lit(str(v)))
    return out


def _read_with_partitions(spark, root, rels, active, schema) -> DataFrame:
    """Read manifest files re-attaching partition columns (recorded in
    the manifest, absent from the files) as typed per-group literals.
    Non-partitioned tables form one group."""
    groups: dict[tuple, list[str]] = {}
    for rel in rels:
        pv = active[rel].get("partition") or {}
        groups.setdefault(tuple(sorted(pv.items())), []).append(rel)
    parts_out = []
    # key=str: a NULL partition value (None) is not orderable against str
    for pv_items, grp in sorted(groups.items(), key=lambda kv: str(kv[0])):
        pv = dict(pv_items)
        data_schema = StructType([f for f in schema.fields if f.name not in pv])
        part = spark.read.schema(data_schema).parquet(
            *[os.path.join(root, r) for r in grp]
        )
        for f in schema.fields:
            if f.name in pv:
                part = part.withColumn(f.name, F.lit(pv[f.name]).cast(f.dataType))
        parts_out.append(part.select(*[f.name for f in schema.fields]))
    out = parts_out[0]
    for p in parts_out[1:]:
        out = out.unionByName(p)
    return out


def read_vtable_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental (CDC-style) read: the rows INSERTED by each commit in
    ``[from_version, to_version]``, tagged with a ``_commit_version``
    column — the consumer-side contract of Delta's change feed for
    append pipelines. Compaction commits are skipped (their adds are
    rewrites of already-delivered rows, not new data); an overwrite
    commit's adds are delivered as inserts (removals are not replayed —
    this is the insert feed, not a full row-level diff). Partitioned
    commits re-attach their manifest partition values exactly as
    ``read_vtable`` does — the feed delivers real column values, never
    NULLs for partition columns."""
    root = _strip_scheme(root)
    commits = _load_commits(root)
    horizon = max((c.get("expire_before", 0) for c in commits), default=0)
    if from_version < horizon:
        raise ValueError(
            f"change feed from version {from_version} is below the retention "
            f"horizon {horizon}: expire_snapshots removed those commits' files"
        )
    out = None
    for c in commits:
        v = c["version"]
        if v < from_version or (to_version is not None and v > to_version):
            continue
        if c["op"] == "compact" or not c["add"]:
            continue
        schema = StructType.fromJson(json.loads(c["schema"]))
        adds = {
            a["path"]: {"stats": a.get("stats"), "partition": a.get("partition")}
            for a in c["add"]
        }
        part = _read_with_partitions(
            spark, root, sorted(adds), adds, schema
        ).withColumn("_commit_version", F.lit(v))
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    if out is None:
        schema = StructType.fromJson(json.loads(commits[-1]["schema"])).add(
            "_commit_version", "int"
        )
        return spark.createDataFrame([], schema)
    return out


def read_vtable_stream(spark: SparkSession, root: str) -> DataFrame:
    """Treat the table as a Structured Streaming source: the file stream
    monitors the immutable data directory, so each new commit's files
    arrive as a micro-batch — a native incremental pipeline over the
    table with watermarks/stateful ops downstream. Suitable for
    APPEND-ONLY tables: file sources cannot subtract, so overwrite or
    compaction commits would re-deliver rewritten rows (Delta's streaming
    source has the same restriction unless rewrites are explicitly
    ignored). Partitioned tables are refused: the file stream cannot
    re-attach manifest partition values, so those columns would stream
    as NULLs — use ``read_vtable_changes`` per commit instead."""
    commits = _load_commits(_strip_scheme(root))
    if any(c.get("partition_by") for c in commits):
        raise ValueError(
            "read_vtable_stream cannot stream a partitioned vtable "
            "(partition columns live in the manifest, not the files); "
            "consume read_vtable_changes per commit instead"
        )
    schema_json, _, _ = _replay_commits(commits)
    schema = StructType.fromJson(json.loads(schema_json))
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(_strip_scheme(root), "data", "*"))
    )


def history(root: str) -> list[dict]:
    """Commit history, oldest first: version, ts, op, files added/removed."""
    root = _strip_scheme(root)
    out = []
    for fname in _commit_files(root):
        with open(os.path.join(_log_dir(root), fname)) as f:
            c = json.load(f)
        out.append(
            {
                "version": c["version"],
                "ts": c["ts"],
                "op": c["op"],
                "n_added": len(c["add"]),
                "n_removed": len(c.get("remove", [])),
            }
        )
    return out


def schema_history(root: str) -> list[dict]:
    """Schema drift across commits (pure manifest work): for every
    commit whose schema differs from its predecessor's, the added /
    removed / retyped columns — the audit a pipeline consults before
    trusting ``allowMissingColumns`` unions of old and new data."""
    commits = _load_commits(_strip_scheme(root))
    out = []
    prev: dict[str, str] = {}
    for c in commits:
        fields = {
            f["name"]: str(f["type"])
            for f in json.loads(c["schema"]).get("fields", [])
        }
        if fields != prev:
            out.append(
                {
                    "version": c["version"],
                    "added": sorted(set(fields) - set(prev)),
                    "removed": sorted(set(prev) - set(fields)),
                    "retyped": sorted(
                        n for n in set(fields) & set(prev) if fields[n] != prev[n]
                    ),
                }
            )
        prev = fields
    return out


def merge_vtable(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
    stats_cols: list[str] | None = None,
) -> int:
    """Key-based upsert (the MERGE INTO shape: update matching rows,
    insert the rest) committed as ONE atomic version: the new snapshot
    is (current snapshot ∖ update keys) ∪ updates. Readers see either
    the pre- or post-merge snapshot, never a torn state; time travel to
    pre-merge versions still resolves the old (immutable) files, and
    the change feed delivers the merge's adds like any commit.

    Scale note, honestly: this rewrites the WHOLE active snapshot in
    the merge commit. Delta/Iceberg prune untouched files via per-file
    key stats and rewrite only files that may contain matching keys —
    with ``stats_cols=[key]`` maintained, the same pruning could reuse
    ``read_vtable(prune=...)``'s min/max machinery; left full-rewrite
    here because the commit log's remove unit (the file) is what this
    vtable models, not a deficiency of the log format."""
    root = _strip_scheme(root)
    commits = _load_commits(root)
    _, active, _ = _replay_commits(commits)
    cur = read_vtable(spark, root)
    merged = cur.join(updates.select(key).distinct(), key, "left_anti").unionByName(updates)
    # commit = add the merged snapshot, remove every prior active file
    # (compact's mechanism — the log replays removes regardless of op,
    # so the op label stays an honest "merge" for history/consumers).
    # The rewrite PRESERVES the table's partition spec: dropping it
    # would strip manifest partition values and break partition-
    # restricted reads of everything the merge rewrote.
    return write_vtable(
        merged,
        root,
        mode="append",
        stats_cols=stats_cols,
        partition_by=_latest_partition_by(commits),
        _op="merge",
        _remove=sorted(active),
    )


def compact(
    spark: SparkSession,
    root: str,
    num_files: int = 1,
    stats_cols: list[str] | None = None,
    cluster_by: str | None = None,
) -> int:
    """Rewrite the current active file set into ``num_files`` files
    (small-file compaction, ≈ Delta OPTIMIZE): one commit that adds the
    rewritten files and removes every prior active file. Content is
    bit-identical; time travel to pre-compaction versions still resolves
    the old (immutable) files.

    ``cluster_by`` range-partitions the rewrite on that column (the 1-D
    analog of OPTIMIZE ZORDER BY): each output file covers a disjoint
    key range, so the per-file min/max stats recorded via ``stats_cols``
    become maximally selective — a post-compaction ``read_vtable(...,
    prune=(col, lo, hi))`` touches ~1 file per range instead of all of
    them. Appends interleave key ranges over time; the compact+cluster
    pass is what restores skipping selectivity, exactly as in
    Delta/Iceberg maintenance. Implies recording stats for the cluster
    key (added to ``stats_cols`` if absent).

    A partitioned table keeps its partition spec through compaction
    (``num_files`` then applies per partition via the partitioned write)
    — dropping the spec would strip manifest partition values and make
    partition-restricted reads return other partitions' rows."""
    root = _strip_scheme(root)
    commits = _load_commits(root)
    _, active, _ = _replay_commits(commits)
    current = read_vtable(spark, root)
    if cluster_by is not None:
        rewritten = current.repartitionByRange(num_files, cluster_by)
        stats_cols = sorted(set(stats_cols or []) | {cluster_by})
    else:
        rewritten = current.coalesce(num_files)
    return write_vtable(
        rewritten,
        root,
        mode="append",
        stats_cols=stats_cols,
        partition_by=_latest_partition_by(commits),
        _op="compact",
        _remove=sorted(active),
    )


def _latest_partition_by(commits: list[dict]) -> list[str] | None:
    """The table's partition spec: the most recent commit that recorded
    one (rewrites carry it forward, so in a well-formed log this is also
    the first one)."""
    for c in reversed(commits):
        if c.get("partition_by"):
            return list(c["partition_by"])
    return None


def expire_snapshots(root: str, keep_last: int = 1) -> dict:
    """Retention: keep time travel for the last ``keep_last`` versions
    and physically delete data files no retained snapshot references —
    Iceberg's ``expireSnapshots`` + Delta's ``VACUUM`` in one atomic
    commit. Without it, every overwrite/compact/merge leaves its removed
    files on disk forever (time travel needs them); with it, storage is
    bounded by the retained window.

    Mechanics: the retention horizon (first retained version) is
    recorded in an ``expire`` commit (``expire_before``); files that
    appear in the log but in NO retained snapshot's active set are
    deleted from disk. Replay refuses to resolve snapshots below the
    horizon (loud error, never a partial file set), and the change feed
    refuses ``from_version`` below it. The commit JSONs themselves stay
    (tiny, and the log must replay from 0); the expire commit lists the
    deleted files for audit. Horizons are monotone: a later expire can
    only raise one. Returns {"version", "expire_before", "n_deleted"}.

    Scale note: referenced-set computation replays O(keep_last)
    snapshots of an O(commits) log — manifest work, data never read.
    Deletion is O(#doomed files) driver-side unlinks, the same shape as
    every table format's vacuum; an object-store port would batch
    deletes. The one-commit-ahead race Delta documents (a reader that
    resolved an expiring snapshot mid-vacuum) is out of scope exactly
    as it is there: retention windows are chosen >> reader lifetimes."""
    root = _strip_scheme(root)
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    commits = _load_commits(root)
    latest = commits[-1]["version"]
    prior_horizon = max((c.get("expire_before", 0) for c in commits), default=0)
    horizon = max(latest - keep_last + 1, prior_horizon, 0)
    referenced: set[str] = set()
    for v in range(horizon, latest + 1):
        _, active, _ = _replay_commits(commits, v)
        referenced.update(active)
    ever_added = {a["path"] for c in commits for a in c["add"]}
    deleted = []
    for rel in sorted(ever_added - referenced):
        p = os.path.join(root, rel)
        if os.path.exists(p):
            os.remove(p)
            deleted.append(rel)
    data_dir = os.path.join(root, "data")
    if os.path.isdir(data_dir):
        # bottom-up so a vacuumed PARTITIONED commit dir (k=v subdirs
        # emptied first) is removed too, not just single-level dirs
        for dirpath, dirnames, filenames in os.walk(data_dir, topdown=False):
            if dirpath != data_dir and not dirnames and not filenames:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass  # concurrently repopulated — leave it
            elif dirpath != data_dir and not filenames:
                # children may have just been removed in this walk
                if not os.listdir(dirpath):
                    try:
                        os.rmdir(dirpath)
                    except OSError:
                        pass
    version = len(commits)
    _write_commit(
        root,
        version,
        {
            "version": version,
            "ts": time.time(),
            "op": "expire",
            "schema": commits[-1]["schema"],
            "add": [],
            "remove": [],
            "expire_before": horizon,
            "deleted": deleted,
        },
    )
    return {"version": version, "expire_before": horizon, "n_deleted": len(deleted)}
