"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions
(``mapInPandas``) — the pattern a 100 TB multimodal pipeline uses for
decode / feature-extract / resize / frame-sample.

The container has no image/audio libraries, so the *codec* step is
stubbed (``decode_image_real`` raises NotImplementedError; the wired-in
``decode_image_fake`` is a deterministic byte-level stand-in). Everything
Spark-side is real and tested: binary column creation, Arrow batch
transfer in/out of ``mapInPandas``, output schema/typing, and a pure-JVM
frame-sampling operator. ``mm01``'s fake decode is deterministic, so even
the Pandas-UDF path is oracle-checked against DuckDB byte functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

DECODE_SCHEMA = "doc_id long, n_bytes long, sha16 string, width int, height int"


def decode_image_real(payload: bytes) -> dict:
    """The real decode step — requires an image codec (PIL / libjpeg),
    which is NOT available in this environment. STUB (by design):
    replace the body with ``PIL.Image.open(io.BytesIO(payload))`` when a
    codec is present; the Spark plumbing around it does not change."""
    raise NotImplementedError("image codec not available in this container")


def decode_image_fake(payload: bytes) -> dict:
    """Deterministic stand-in for the codec: metadata derived purely from
    the bytes, so the full Arrow/mapInPandas pipeline stays testable."""
    import hashlib

    n = len(payload)
    return {
        "n_bytes": n,
        "sha16": hashlib.sha256(payload).hexdigest()[:16],
        "width": (n % 64) + 16,
        "height": ((n // 64) % 64) + 16,
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode a batch of binary payloads. Per-batch
    vectorized-ish loop — the Arrow transfer amortizes the Python cost;
    this is the '10-100× over row UDFs' slow path used only where JVM
    expressions genuinely cannot (codecs)."""
    for pdf in batches:
        metas = [decode_image_fake(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def mm01_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column → mapInPandas decode → typed metadata. The payload is
    the utf-8 encoding of the document text (stand-in for image bytes)."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


MM01_SQL = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substr(sha256(text), 1, 16) AS sha16,
           CAST((octet_length(encode(text)) % 64) + 16 AS INT) AS width,
           CAST(((octet_length(encode(text)) // 64) % 64) + 16 AS INT) AS height
    FROM documents
"""


def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video analog): emit up to 4 evenly spaced
    'frame offsets' per payload — pure JVM sequence/explode, no Python.
    With a real codec the offset list drives a mapInPandas frame decode."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("long")
    step = F.greatest(F.floor(n / 4).cast("long"), F.lit(1).cast("long"))
    offsets = F.slice(F.sequence(F.lit(0).cast("long"), n - 1, step), 1, 4)
    return (
        d.select("doc_id", F.posexplode(offsets).alias("frame_no", "byte_offset"))
        .select("doc_id", F.col("frame_no").cast("int").alias("frame_no"), "byte_offset")
    )


MM02_SQL = """
    WITH d AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
               greatest(CAST(length(text) // 4 AS BIGINT), 1) AS step
        FROM documents
    ),
    frames AS (
        SELECT doc_id,
               list_slice(range(0, n, step), 1, 4) AS offs
        FROM d
    )
    SELECT doc_id,
           CAST(t.i - 1 AS INT) AS frame_no,
           CAST(offs[t.i] AS BIGINT) AS byte_offset
    FROM frames, unnest(range(1, len(offs) + 1)) AS t(i)
"""


def mm03_audio_window_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-windowing plumbing: fixed-size 'sample windows' over the
    payload with per-window byte checksums — JVM-side chunking + an
    integer checksum (stand-in for an FFT/feature UDF)."""
    d = load_table(spark, sf_dir, "documents")
    win = 64
    n = F.length("text")
    n_win = F.ceil(n / win).cast("int")
    d2 = d.select("doc_id", "text", F.posexplode(F.sequence(F.lit(1), n_win)).alias("pos", "w"))
    chunk = F.substring(F.col("text"), (F.col("w") - 1) * win + 1, win)
    codes = F.transform(F.split(chunk, ""), lambda ch: F.ascii(ch).cast("long"))
    checksum = F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: (a + x) % 65536)
    return d2.select(
        "doc_id",
        (F.col("w") - 1).cast("int").alias("window_no"),
        F.length(chunk).cast("int").alias("n_bytes"),
        checksum.alias("checksum"),
    )


MM03_SQL = """
    WITH d AS (SELECT doc_id, text, CAST(ceil(length(text) / 64.0) AS INT) AS n_win FROM documents),
    w AS (
        SELECT doc_id, text, CAST(uw.w - 1 AS INT) AS window_no,
               substr(text, (uw.w - 1) * 64 + 1, 64) AS chunk
        FROM d, unnest(range(1, n_win + 1)) AS uw(w)
    )
    SELECT doc_id, window_no,
           CAST(length(chunk) AS INT) AS n_bytes,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    list_transform(string_split(chunk, ''),
                                                   ch -> CAST(unicode(ch) AS BIGINT))),
                       (a, x) -> (a + x) % 65536) AS checksum
    FROM w
"""


RESIZE_SCHEMA = "doc_id long, width int, height int, tgt_w int, tgt_h int, resized boolean"
_MAX_DIM = 32


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode (fake codec) then compute the
    aspect-preserving fit into a MAX_DIM box with INTEGER-ONLY math
    (exactly reproducible in SQL — no float scale factors). With a real
    codec the same worker would call Image.resize((tgt_w, tgt_h))."""
    rows = []
    for pdf in batches:
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_fake(payload)
            w, h = m["width"], m["height"]
            if max(w, h) <= _MAX_DIM:
                tw, th, resized = w, h, False
            elif w >= h:
                tw, th, resized = _MAX_DIM, max(1, (h * _MAX_DIM) // w), True
            else:
                tw, th, resized = max(1, (w * _MAX_DIM) // h), _MAX_DIM, True
            rows.append((doc_id, w, h, tw, th, resized))
        out = pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "tgt_w", "tgt_h", "resized"]
        )
        rows = []
        yield out


def mm04_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (the decode→resize stage of an image pipeline):
    binary payload → Arrow mapInPandas → aspect-preserving target dims.
    The codec is the documented stub; the batch shape, schema, and
    integer resize arithmetic are real."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


MM04_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               CAST((octet_length(encode(text)) % 64) + 16 AS INT) AS width,
               CAST(((octet_length(encode(text)) // 64) % 64) + 16 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(CASE WHEN greatest(width, height) <= {_MAX_DIM} THEN width
                     WHEN width >= height THEN {_MAX_DIM}
                     ELSE greatest(1, (width * {_MAX_DIM}) // height) END AS INT) AS tgt_w,
           CAST(CASE WHEN greatest(width, height) <= {_MAX_DIM} THEN height
                     WHEN width >= height THEN greatest(1, (height * {_MAX_DIM}) // width)
                     ELSE {_MAX_DIM} END AS INT) AS tgt_h,
           greatest(width, height) > {_MAX_DIM} AS resized
    FROM m
"""


QUERIES = {
    "mm01_decode_stub": mm01_decode_stub,
    "mm02_frame_sample": mm02_frame_sample,
    "mm03_audio_window_stub": mm03_audio_window_stub,
    "mm04_resize_stub": mm04_resize_stub,
}

ORACLES = {
    "mm01_decode_stub": MM01_SQL,
    "mm02_frame_sample": MM02_SQL,
    "mm03_audio_window_stub": MM03_SQL,
    "mm04_resize_stub": MM04_SQL,
}
