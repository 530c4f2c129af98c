"""binaryFile source: manifest rows must agree with os.stat / raw bytes
(no SQL oracle possible — the oracle runner resolves registered table
views only), and the manifest plan must prune `content` when the query
doesn't need it."""

from __future__ import annotations

import hashlib
import os

from hive_lineage_spark.sources.binary import (
    local_expected_manifest,
    manifest_of_dir,
    read_binary_dir,
)

SF = "/root/testdata/sf0.001"


def test_manifest_matches_os_stat_and_md5(spark):
    rows = {r["file"]: r for r in manifest_of_dir(spark, SF, "*.parquet").collect()}
    want = local_expected_manifest(SF, ".parquet")
    assert rows.keys() == want.keys() and len(rows) >= 5
    for name, r in rows.items():
        assert r["n_bytes"] == want[name], name
        assert r["magic_hex"] == "50415231", r  # "PAR1"
        assert r["kind"] == "parquet"
        with open(os.path.join(SF, name), "rb") as fh:
            assert r["content_md5"] == hashlib.md5(fh.read()).hexdigest(), name


def test_manifest_without_content_prunes_file_bodies(spark):
    """Column pruning applies to binaryFile like any FileFormat: a
    size-only manifest must not carry `content` into the scan schema."""
    df = read_binary_dir(spark, SF, "*.parquet").select("path", "length")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "content" not in read_schema, read_schema
    assert "path" in read_schema and "length" in read_schema
