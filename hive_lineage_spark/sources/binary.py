"""Binary-file ingestion — the standard entry path for image/audio/video
corpora (Spark's ``binaryFile`` source): each file becomes one row of
(path, modificationTime, length, content), which the multimodal decode
operators (`operators/multimodal.py`) then consume as opaque binary
columns with typed metadata.

No DuckDB oracle: the oracle runner resolves table NAMES against
pre-registered parquet views and has no filesystem substitution, so this
source is pinned by tests instead (sizes and magic bytes re-derived with
os.stat / open(); the streaming-surface precedent for non-SQL-expressible
components).

Scale notes: binaryFile is a proper FileFormat scan — files split across
tasks by size (``maxPartitionBytes``), paths/glob pushed to the file
index, and column pruning applies (a manifest query that drops
``content`` never reads file bodies ... except length, served from the
file status). The 2 GiB-per-file JVM byte-array limit is the documented
boundary; production shards oversized blobs upstream (or reads framed
container formats via mapInPandas, as the AVI walker does).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# file-type magic prefixes the manifest classifies (HEX of the leading
# bytes — parquet's is ASCII "PAR1"); extend freely.
MAGIC = {
    "50415231": "parquet",
    "89504E47": "png",
    "424D": "bmp",
    "52494646": "riff",  # WAV/AVI share the RIFF container
}


def read_binary_dir(
    spark: SparkSession, directory: str, glob: str = "*"
) -> DataFrame:
    """All files matching ``glob`` under ``directory`` as binary rows."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(directory)
    )


def binary_manifest(files: DataFrame) -> DataFrame:
    """Ingestion manifest: basename, byte length, hex magic, detected
    type, and a content fingerprint — the audit frame a multimodal
    pipeline materializes before any decode work. Pure codegen over the
    binary scan (substring/hex/md5 all JVM-side)."""
    magic = F.upper(F.hex(F.substring(F.col("content"), 1, 4)))
    # shortest-first so each longer (more specific) prefix wraps the
    # previous expression and is therefore evaluated FIRST: adding e.g.
    # a RIFF-subtype magic "52494646AABB" must shadow plain "52494646"
    detected = F.lit("unknown")
    for prefix, name in sorted(MAGIC.items(), key=lambda kv: len(kv[0])):
        detected = F.when(magic.startswith(prefix.upper()), name).otherwise(detected)
    # element_at on a split path is portable across local/HDFS/object-store URIs
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    return files.select(
        base.alias("file"),
        F.col("length").cast("long").alias("n_bytes"),
        magic.alias("magic_hex"),
        detected.alias("kind"),
        F.md5(F.col("content")).alias("content_md5"),
    )


def manifest_of_dir(
    spark: SparkSession, directory: str, glob: str = "*"
) -> DataFrame:
    return binary_manifest(read_binary_dir(spark, directory, glob))


def local_expected_manifest(directory: str, glob_suffix: str) -> dict[str, int]:
    """Test helper: {basename: size} via os.stat for cross-checking."""
    out = {}
    for name in os.listdir(directory):
        if name.endswith(glob_suffix):
            out[name] = os.stat(os.path.join(directory, name)).st_size
    return out
