"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions
(``mapInPandas``) — the pattern a 100 TB multimodal pipeline uses for
decode / feature-extract / resize / frame-sample.

The container has no image/audio *libraries*, but uncompressed container
formats need none: ``decode_image_real`` is a real pure-Python decoder
for 24-bit BMP (bottom-up padded BGR rows) and binary PPM (P6), exercised
end-to-end by ``mm05_decode_image`` over generated fixture images whose
pixel bytes follow a closed form the DuckDB oracle recomputes — the
oracle never sees the encoded bytes, so padding/row-order/channel-order
bugs fail the value-hash. Compressed codecs (JPEG/PNG) keep the honest
NotImplementedError path. ``decode_image_fake`` remains the byte-level
stand-in used by mm01/mm04 to pin the Arrow plumbing contract.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

DECODE_SCHEMA = "doc_id long, n_bytes long, sha16 string, width int, height int"


def decode_image_real(payload: bytes) -> dict:
    """Real image decode for the uncompressed formats a pure-Python
    decoder can handle: 24-bit uncompressed BMP and binary PPM (P6).
    Returns ``{"fmt", "width", "height", "pixels"}`` with ``pixels`` the
    top-down row-major RGB bytes. Compressed formats (JPEG/PNG/...)
    need a codec library that is NOT available in this container — they
    keep the honest NotImplementedError path; with PIL present the
    fallthrough becomes ``PIL.Image.open(io.BytesIO(payload))`` and the
    Spark plumbing around it does not change."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise NotImplementedError(
        "no pure-Python decoder for this format (JPEG/PNG need a codec "
        "library not present in this container)"
    )


def _decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): little-endian header,
    rows padded to 4 bytes, stored bottom-up (positive height) in BGR —
    reordered here to top-down RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3  # each row padded to a 4-byte boundary
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = off + src_row * stride
        line = payload[base : base + w * 3]
        dst = row * w * 3
        # BGR -> RGB per pixel
        out[dst : dst + w * 3 : 3] = line[2::3]
        out[dst + 1 : dst + w * 3 : 3] = line[1::3]
        out[dst + 2 : dst + w * 3 : 3] = line[0::3]
    return {"fmt": "bmp", "width": w, "height": h, "pixels": bytes(out)}


def _decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6): ASCII header of three tokens (width, height,
    maxval) with ``#`` comments, one whitespace byte, then raw top-down
    RGB rows — no padding."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM")
    return {"fmt": "ppm", "width": w, "height": h, "pixels": payload[pos : pos + w * h * 3]}


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


# ---------------------------------------------------------------------------
# mm05: REAL image decode (round-6). Pure-Python BMP/PPM encoders build a
# deterministic fixture (pixel bytes are a closed-form function of doc_id),
# the decoder parses the real container formats — bottom-up padded BGR rows
# for BMP, comment-bearing ASCII header for PPM — and the DuckDB oracle
# recomputes the expected dimensions/checksums from the same closed form.
# A decoder that mishandles padding, row order, or channel order fails the
# value-hash; nothing is circular because the oracle never sees the bytes.
# ---------------------------------------------------------------------------


def _pixel_bytes(doc_id: int, w: int, h: int) -> bytes:
    """Top-down RGB pixel bytes, byte i = (doc_id*31 + i*7) % 256."""
    return bytes((doc_id * 31 + i * 7) % 256 for i in range(w * h * 3))


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (BITMAPINFOHEADER,
    bottom-up, 4-byte padded rows, BGR) — the standard layout."""
    import struct

    stride = (width * 3 + 3) & ~3
    img_size = stride * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray(img_size)
    for row in range(height):
        src = (height - 1 - row) * width * 3  # bottom-up
        base = row * stride
        line = rgb[src : src + width * 3]
        body[base : base + width * 3 : 3] = line[2::3]  # B
        body[base + 1 : base + width * 3 : 3] = line[1::3]  # G
        body[base + 2 : base + width * 3 : 3] = line[0::3]  # R
    return header + dib + bytes(body)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM writer, with a comment line so the decoder's header
    tokenizer is exercised on real-world input."""
    return b"P6\n# fixture\n%d %d\n255\n" % (width, height) + rgb


def _image_fixture(sf_dir: str) -> str:
    """Generate the image fixture parquet once per sf_dir (same one-time
    driver-side pattern as ``sources.registry.load_events``): one image
    per document — even doc_ids as BMP, odd as PPM, dimensions varying
    with doc_id so BMP row padding takes multiple values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.registry import table_path

    from ..sources.registry import scratch_key

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "images")
    out_file = os.path.join(out_dir, "images.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        payloads = []
        for d in doc_ids:
            w, h = (d % 13) + 4, (d % 7) + 4
            rgb = _pixel_bytes(d, w, h)
            payloads.append(encode_bmp(w, h, rgb) if d % 2 == 0 else encode_ppm(w, h, rgb))
        tbl = pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())})
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out_file)
    return out_file


DECODE_REAL_SCHEMA = (
    "doc_id long, fmt string, width int, height int, n_pixels long, "
    "checksum long, sum_r long, sum_g long, sum_b long"
)


def _decode_real_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker over real image bytes: parse the container,
    then position-weighted checksum + per-channel sums via numpy — the
    checksum is order-sensitive, so a decoder that flips row order,
    channel order, or swallows padding produces a different value."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_real(bytes(payload))
            px = np.frombuffer(m["pixels"], dtype=np.uint8).astype(np.int64)
            checksum = int(((np.arange(len(px)) + 1) * px).sum())
            rows.append(
                (
                    doc_id, m["fmt"], m["width"], m["height"], len(px) // 3,
                    checksum, int(px[0::3].sum()), int(px[1::3].sum()), int(px[2::3].sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "fmt", "width", "height", "n_pixels",
                "checksum", "sum_r", "sum_g", "sum_b",
            ],
        )


def mm05_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: binary BMP/PPM payloads → Arrow
    ``mapInPandas`` → pure-Python container parsing → typed pixel stats.
    Scale shape is identical to mm01 (one narrow Python stage, no
    shuffle); only the codec inside the worker changed from a stand-in
    to a real parser."""
    imgs = spark.read.parquet(_image_fixture(sf_dir))
    return imgs.mapInPandas(_decode_real_batches, schema=DECODE_REAL_SCHEMA)


MM05_SQL = """
    WITH m AS (
        SELECT doc_id,
               (doc_id % 13) + 4 AS w,
               (doc_id % 7) + 4 AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, t.i AS i,
               (doc_id * 31 + t.i * 7) % 256 AS v
        FROM m, unnest(range(0, w * h * 3)) t(i)
    )
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS fmt,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           CAST(any_value(w) * any_value(h) AS BIGINT) AS n_pixels,
           CAST(sum((i + 1) * v) AS BIGINT) AS checksum,
           CAST(sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
"""


QUERIES = {
    "mm01_decode_stub": mm01_decode_stub,
    "mm02_frame_sample": mm02_frame_sample,
    "mm03_audio_window_stub": mm03_audio_window_stub,
    "mm04_resize_stub": mm04_resize_stub,
    "mm05_decode_image": mm05_decode_image,
}

ORACLES = {
    "mm01_decode_stub": MM01_SQL,
    "mm02_frame_sample": MM02_SQL,
    "mm03_audio_window_stub": MM03_SQL,
    "mm04_resize_stub": MM04_SQL,
    "mm05_decode_image": MM05_SQL,
}
