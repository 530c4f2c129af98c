"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions
(``mapInPandas``) — the pattern a 100 TB multimodal pipeline uses for
decode / feature-extract / resize / frame-sample.

The container has no image/audio *libraries*, but stdlib-decodable
formats need none: ``decode_image_real`` is a real pure-Python decoder
for 24-bit BMP (bottom-up padded BGR rows), binary PPM (P6), and 8-bit
truecolor PNG (zlib inflate + all five scanline unfilters), exercised
end-to-end by ``mm05_decode_image`` over generated fixture images whose
pixel bytes follow a closed form the DuckDB oracle recomputes — the
oracle never sees the encoded bytes, so padding/row-order/channel-order/
unfilter bugs fail the value-hash. JPEG (DCT entropy coding) keeps the
honest NotImplementedError path. ``decode_image_fake`` remains the
byte-level stand-in used by mm01/mm04 to pin the Arrow plumbing contract.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def _read_fixture(spark: SparkSession, path: str) -> DataFrame:
    """Fixture scan with the conditional split-aware fan-out: decode
    operators do all their work (mapInPandas/mapInArrow codecs) right on
    the scan output, and the fixtures are single small files Spark packs
    into one or two splits — the repartition (hash on doc_id, no
    round-robin pre-sort) distributes the decode; a no-op on inputs with
    enough splits (r16, guide §2.5)."""
    from ..sources.registry import fan_out_scan

    return fan_out_scan(spark.read.parquet(path), spark, path, key="doc_id")


DECODE_SCHEMA = "doc_id long, n_bytes long, sha16 string, width int, height int"


def decode_image_real(payload: bytes) -> dict:
    """Real image decode for the formats a pure-Python/stdlib decoder
    can handle: 24-bit uncompressed BMP, binary PPM (P6), 8-bit
    truecolor PNG (``zlib`` is stdlib; PNG is inflate + per-row
    unfilter), and — since round 8 — baseline sequential 4:4:4 JPEG
    (``functions/jpeg.py``: full marker walk, canonical Huffman, AC
    run/size entropy decode, dequant, float IDCT, pinned YCbCr→RGB).
    Returns ``{"fmt", "width", "height", "pixels"}`` with ``pixels``
    the top-down row-major RGB bytes. Progressive JPEG / chroma
    subsampling keep honest NotImplementedError paths; with PIL present
    the fallthrough becomes ``PIL.Image.open(io.BytesIO(payload))`` and
    the Spark plumbing around it does not change."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(payload)  # baseline sequential 4:4:4
    raise NotImplementedError(
        "no pure-Python decoder for this format (GIF/TIFF/WebP need "
        "codec libraries not present in this container)"
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick whichever of left (a),
    above (b), upper-left (c) is closest to a + b - c, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode for 8-bit truecolor (color type 2), no
    interlace: chunk walk with CRC verification, zlib inflate of the
    concatenated IDAT stream, then per-scanline unfilter — all five
    filter types (None/Sub/Up/Average/Paeth) reconstructed against the
    raw (already-reconstructed) neighbors, per the spec."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, w, h = 8, bytearray(), None, None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"only 8-bit truecolor non-interlaced PNG "
                    f"(got depth={depth} ctype={ctype} interlace={inter})"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(h * stride)
    prior = bytes(stride)
    p = 0
    for y in range(h):
        ft = raw[p]
        line = raw[p + 1 : p + 1 + stride]
        p += 1 + stride
        recon = bytearray(stride)
        if ft == 0:
            recon[:] = line
        elif ft == 1:  # Sub
            for x in range(stride):
                recon[x] = (line[x] + (recon[x - bpp] if x >= bpp else 0)) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                recon[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                recon[x] = (line[x] + _paeth(a, prior[x], c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = recon
        prior = bytes(recon)
    return {"fmt": "png", "width": w, "height": h, "pixels": bytes(out)}


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


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Stdlib PNG writer (8-bit truecolor, non-interlaced). Each
    scanline is filtered with type ``row % 5`` — cycling None, Sub, Up,
    Average, Paeth — so fixture PNGs exercise every unfilter path in the
    decoder, not just the trivial None case."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    bpp, stride = 3, width * 3
    filtered = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ft = y % 5
        filtered.append(ft)
        if ft == 0:
            filtered += row
        elif ft == 1:  # Sub
            filtered += bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF for x in range(stride)
            )
        elif ft == 2:  # Up
            filtered += bytes((row[x] - prior[x]) & 0xFF for x in range(stride))
        elif ft == 3:  # Average
            filtered += bytes(
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prior[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            filtered += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - bpp] if x >= bpp else 0,
                        prior[x],
                        prior[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def _image_fixture(sf_dir: str) -> str:
    """Generate the image fixture parquet once per sf_dir (same one-time
    driver-side pattern as ``sources.registry.load_events``): one image
    per document — doc_id % 3 selects BMP / PPM / PNG, dimensions varying
    with doc_id so BMP row padding and PNG filter cycling take multiple
    values. The dir is versioned: a layout change bumps the suffix so a
    stale cache from an older layout can never satisfy the new oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "images_v3")
    out_file = os.path.join(out_dir, "images.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        encoders = {0: encode_bmp, 1: encode_ppm, 2: encode_png}
        payloads = []
        for d in doc_ids:
            w, h = (d % 13) + 4, (d % 7) + 4
            payloads.append(encoders[d % 3](w, h, _pixel_bytes(d, w, h)))
        tbl = pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())})
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(64, tbl.num_rows // 64))
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
    imgs = _read_fixture(spark, _image_fixture(sf_dir))
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
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' ELSE 'png' END AS fmt,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           CAST(any_value(w) * any_value(h) AS BIGINT) AS n_pixels,
           CAST(sum((i + 1) * v) AS BIGINT) AS checksum,
           CAST(sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# mm06: the multimodal pipeline end-to-end on REAL pixels — decode (BMP/
# PPM/PNG via decode_image_real) → aspect-preserving nearest-neighbor
# resize with integer-only index math → pixel stats on the RESIZED image.
# The oracle recomputes everything from the closed form: resized pixel
# (y, x, c) is source pixel (y*h//th, x*w//tw, c), and source byte j is
# (doc_id*31 + j*7) % 256 — so a resampler that rounds instead of
# flooring, swaps axes, or resizes before BGR→RGB fails the value-hash.
# ---------------------------------------------------------------------------

MM06_MAX_DIM = 8  # fixture dims run 4..16 x 4..10, so most images resize

RESIZE_REAL_SCHEMA = (
    "doc_id long, fmt string, width int, height int, tgt_w int, tgt_h int, "
    "resized boolean, checksum long, sum_r long, sum_g long, sum_b long"
)


def fit_box(w: int, h: int, max_dim: int) -> tuple[int, int, bool]:
    """Aspect-preserving fit into a max_dim box with integer-only math
    (mm04's formula, shared with the mm06 real resize)."""
    if max(w, h) <= max_dim:
        return w, h, False
    if w >= h:
        return max_dim, max(1, (h * max_dim) // w), True
    return max(1, (w * max_dim) // h), max_dim, True


def _resize_real_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real decode, nearest-neighbor resize via
    integer floor index maps (src = dst * src_dim // tgt_dim), then the
    same position-weighted checksum as mm05 over the RESIZED pixels."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_real(bytes(payload))
            w, h = m["width"], m["height"]
            tw, th, resized = fit_box(w, h, MM06_MAX_DIM)
            px = np.frombuffer(m["pixels"], dtype=np.uint8).reshape(h, w, 3)
            sy = (np.arange(th) * h) // th
            sx = (np.arange(tw) * w) // tw
            out = px[sy][:, sx].astype(np.int64).ravel()
            checksum = int(((np.arange(len(out)) + 1) * out).sum())
            rows.append(
                (
                    doc_id, m["fmt"], w, h, tw, th, resized,
                    checksum, int(out[0::3].sum()), int(out[1::3].sum()), int(out[2::3].sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "fmt", "width", "height", "tgt_w", "tgt_h",
                "resized", "checksum", "sum_r", "sum_g", "sum_b",
            ],
        )


def mm06_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → resize → stats on real pixels, one narrow Python stage
    over the image fixture — the shape a 100 TB image-preprocessing job
    takes (no shuffle; scale by adding input splits)."""
    imgs = _read_fixture(spark, _image_fixture(sf_dir))
    return imgs.mapInPandas(_resize_real_batches, schema=RESIZE_REAL_SCHEMA)


MM06_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               (doc_id % 13) + 4 AS w,
               (doc_id % 7) + 4 AS h
        FROM documents
    ),
    dims AS (
        SELECT doc_id, w, h,
               CASE WHEN greatest(w, h) <= {MM06_MAX_DIM} THEN w
                    WHEN w >= h THEN {MM06_MAX_DIM}
                    ELSE greatest(1, (w * {MM06_MAX_DIM}) // h) END AS tw,
               CASE WHEN greatest(w, h) <= {MM06_MAX_DIM} THEN h
                    WHEN w >= h THEN greatest(1, (h * {MM06_MAX_DIM}) // w)
                    ELSE {MM06_MAX_DIM} END AS th
        FROM m
    ),
    px AS (
        SELECT doc_id, w, h, tw, th, t.i AS i,
               (doc_id * 31
                + (((((t.i // 3) // tw) * h // th) * w
                    + (((t.i // 3) % tw) * w // tw)) * 3 + t.i % 3) * 7) % 256 AS v
        FROM dims, unnest(range(0, tw * th * 3)) t(i)
    )
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' ELSE 'png' END AS fmt,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           CAST(any_value(tw) AS INT) AS tgt_w,
           CAST(any_value(th) AS INT) AS tgt_h,
           greatest(any_value(w), any_value(h)) > {MM06_MAX_DIM} AS resized,
           CAST(sum((i + 1) * v) AS BIGINT) AS checksum,
           CAST(sum(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(sum(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(sum(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# mm07: REAL audio decode — RIFF/WAVE PCM needs no codec library (it is
# struct unpacking), so like BMP/PPM/PNG it gets a genuine pure-Python
# parser: a proper chunk walk (odd-size pad bytes, unknown chunks such
# as LIST skipped), fmt validation, and interleaved int16 frames. The
# fixture writes mono and stereo WAVs whose samples follow a closed
# form the DuckDB oracle recomputes — an interleaving, endianness, or
# chunk-walk bug fails the value-hash.
# ---------------------------------------------------------------------------

AUDIO_RATE = 8000


def _sample_vals(doc_id: int, n_vals: int) -> list[int]:
    """Closed-form int16 sample stream: value j = ((doc_id*37 + j*11)
    % 4001) - 2000 over the FLATTENED interleaved stream."""
    return [((doc_id * 37 + j * 11) % 4001) - 2000 for j in range(n_vals)]


def encode_wav(n_channels: int, rate: int, samples: list[int]) -> bytes:
    """Minimal RIFF/WAVE writer: PCM fmt chunk + a LIST (INFO) chunk —
    present so decoders must actually walk chunks, not seek to a fixed
    offset — + the interleaved little-endian int16 data chunk."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    info = b"INFOISFT" + struct.pack("<I", 8) + b"fixture\x00"
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, rate, rate * n_channels * 2, n_channels * 2, 16
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(info)) + info
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_audio_real(payload: bytes) -> dict:
    """Pure-stdlib WAV decode (16-bit PCM): walk the RIFF chunk list —
    chunks are word-aligned, so odd sizes carry a pad byte — validate
    the fmt chunk (PCM, 16-bit), and unpack the data chunk's
    little-endian int16 interleaved stream. Compressed audio (MP3/AAC/
    FLAC) needs codec libraries not present in this container and keeps
    the honest NotImplementedError path."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "no pure-Python decoder for this audio format (MP3/AAC/FLAC "
            "need codec libraries not present in this container)"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # word alignment: odd sizes pad
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only 16-bit PCM WAV (got format={audio_format}, bits={bits})")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))
    return {
        "fmt": "wav",
        "n_channels": n_channels,
        "rate": rate,
        "samples": samples,  # flattened interleaved stream
    }


def _audio_fixture(sf_dir: str) -> str:
    """One WAV per document: even doc_ids mono, odd stereo; frame count
    varies with doc_id so chunk sizes (and the odd-size pad path) take
    multiple values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "audio_v2")
    out_file = os.path.join(out_dir, "audio.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        payloads = []
        for d in doc_ids:
            ch = 1 + (d % 2)
            n_frames = (d % 50) + 20
            payloads.append(encode_wav(ch, AUDIO_RATE, _sample_vals(d, n_frames * ch)))
        tbl = pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())})
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(64, tbl.num_rows // 64))
        os.replace(tmp, out_file)
    return out_file


DECODE_AUDIO_SCHEMA = (
    "doc_id long, n_channels int, rate int, n_frames long, "
    "peak int, sum_sq long, checksum long, sum_ch0 long"
)


def _decode_audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: parse the WAV container, then integer-exact
    stats via numpy — the position-weighted checksum runs over the
    interleaved stream (channel-order-sensitive), sum_ch0 de-interleaves
    channel 0, and sum_sq is the energy (exact in int64)."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_audio_real(bytes(payload))
            s = np.asarray(m["samples"], dtype=np.int64)
            ch = m["n_channels"]
            rows.append(
                (
                    doc_id, ch, m["rate"], len(s) // ch,
                    int(np.abs(s).max(initial=0)), int((s * s).sum()),
                    int(((np.arange(len(s)) + 1) * s).sum()), int(s[0::ch].sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_channels", "rate", "n_frames",
                "peak", "sum_sq", "checksum", "sum_ch0",
            ],
        )


def mm07_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: binary WAV payloads → Arrow
    ``mapInPandas`` → pure-stdlib RIFF parsing → typed sample stats.
    Same scale shape as mm05: one narrow Python stage, no shuffle."""
    wavs = _read_fixture(spark, _audio_fixture(sf_dir))
    return wavs.mapInPandas(_decode_audio_batches, schema=DECODE_AUDIO_SCHEMA)


MM07_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               1 + (doc_id % 2) AS ch,
               (doc_id % 50) + 20 AS n_frames
        FROM documents
    ),
    sv AS (
        SELECT doc_id, ch, n_frames, t.j AS j,
               ((doc_id * 37 + t.j * 11) % 4001) - 2000 AS v
        FROM m, unnest(range(0, n_frames * ch)) t(j)
    )
    SELECT doc_id,
           CAST(ch AS INT) AS n_channels,
           CAST({AUDIO_RATE} AS INT) AS rate,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(max(abs(v)) AS INT) AS peak,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(sum((j + 1) * v) AS BIGINT) AS checksum,
           CAST(sum(CASE WHEN j % ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_ch0
    FROM sv GROUP BY doc_id, ch, n_frames
"""


AUDIO_WIN = 16  # feature-window length in frames (fixture clips are 20-69 frames)

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_windows int, zcr int, loud_window int, "
    "loud_energy long, win_checksum long"
)


def _audio_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: WAV container parse, de-interleave channel 0,
    then vectorized frame-window features — all integer-exact in int64.
    zcr counts strict sign flips (product of adjacent samples < 0, the
    standard zero-crossing rule with zeros never counted); loud_window
    is the FIRST window achieving the max energy (np.argmax contract);
    win_checksum position-weights every window's energy so the oracle
    pins the whole energy profile, not just its max."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_audio_real(bytes(payload))
            s = np.asarray(m["samples"], dtype=np.int64)
            c0 = s[0 :: m["n_channels"]]
            zcr = int(((c0[:-1] * c0[1:]) < 0).sum())
            nw = (len(c0) + AUDIO_WIN - 1) // AUDIO_WIN
            padded = np.zeros(nw * AUDIO_WIN, dtype=np.int64)
            padded[: len(c0)] = c0
            e = (padded * padded).reshape(nw, AUDIO_WIN).sum(axis=1)
            rows.append(
                (
                    doc_id, nw, zcr, int(e.argmax()), int(e.max()),
                    int(((np.arange(nw) + 1) * e).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_windows", "zcr", "loud_window",
                "loud_energy", "win_checksum",
            ],
        )


def mm11_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-window audio features on REAL decoded WAV: per clip, the
    zero-crossing count of channel 0 plus per-window (AUDIO_WIN frames)
    energies reduced to (count, argmax, max, position-weighted
    checksum). This is the speech/music activity-detection front end of
    an audio curation pipeline (VAD thresholds on window energy, ZCR
    separating voiced/unvoiced) — the stage after mm07's raw decode and
    before any model-based scorer.

    Scale shape: identical to mm05/mm07 — ONE narrow Arrow-batched
    Python stage fused over the scan, no shuffle, no driver collect;
    features are O(samples) per clip and the output is a fixed 6-column
    row per clip. The decode and the feature fold share one pass so
    sample arrays never leave the worker. Reference has no audio ops
    (hivehook/ is lineage-only) — LLM-pipeline scope."""
    wavs = _read_fixture(spark, _audio_fixture(sf_dir))
    return wavs.mapInPandas(_audio_feature_batches, schema=AUDIO_FEATURES_SCHEMA)


MM11_SQL = f"""
    WITH m AS (
        SELECT doc_id, 1 + (doc_id % 2) AS ch, (doc_id % 50) + 20 AS n_frames
        FROM documents
    ),
    c0 AS (
        SELECT doc_id, t.f AS f,
               ((doc_id * 37 + (t.f * ch) * 11) % 4001) - 2000 AS v
        FROM m, unnest(range(0, n_frames)) t(f)
    ),
    zc AS (
        SELECT doc_id, sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS zcr
        FROM (SELECT doc_id, v * lag(v) OVER (PARTITION BY doc_id ORDER BY f) AS prod
              FROM c0)
        GROUP BY doc_id
    ),
    we AS (
        SELECT doc_id, f // {AUDIO_WIN} AS w, sum(v * v) AS e
        FROM c0 GROUP BY doc_id, f // {AUDIO_WIN}
    ),
    agg AS (
        SELECT doc_id,
               count(*) AS n_windows,
               max(e) AS loud_energy,
               min(CASE WHEN is_max THEN w END) AS loud_window,
               sum((w + 1) * e) AS win_checksum
        FROM (SELECT *, e = max(e) OVER (PARTITION BY doc_id) AS is_max FROM we)
        GROUP BY doc_id
    )
    SELECT a.doc_id, CAST(n_windows AS INT) AS n_windows, CAST(zcr AS INT) AS zcr,
           CAST(loud_window AS INT) AS loud_window,
           CAST(loud_energy AS BIGINT) AS loud_energy,
           CAST(win_checksum AS BIGINT) AS win_checksum
    FROM agg a JOIN zc USING (doc_id)
"""


DHASH_W, DHASH_H = 9, 8  # dHash grid: 9×8 luma samples → 8×8 gradient bits

DHASH_SCHEMA = "doc_id long, width int, height int, dhash_hi long, dhash_lo long"


def _dhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real decode (BMP/PPM/PNG/JPEG), luma proxy =
    r+g+b per pixel (monotone in mean luminance, division-free so both
    engines compare identical integers), nearest-neighbor sample onto
    the 9×8 dHash grid with mm06's integer floor maps, then the 64
    horizontal-gradient bits g[x+1,y] > g[x,y]. Emitted as two 32-bit
    halves (rows 0-3 / rows 4-7) so neither engine touches the int64
    sign bit."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_real(bytes(payload))
            w, h = m["width"], m["height"]
            px = np.frombuffer(m["pixels"], dtype=np.uint8).astype(np.int64)
            luma = px.reshape(h, w, 3).sum(axis=2)
            xs = (np.arange(DHASH_W) * w) // DHASH_W
            ys = (np.arange(DHASH_H) * h) // DHASH_H
            g = luma[ys][:, xs]  # DHASH_H rows × DHASH_W cols
            bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)  # 8×8
            half = DHASH_H // 2
            shifts = np.arange(half)[:, None] * (DHASH_W - 1) + np.arange(DHASH_W - 1)[None, :]
            hi = int((bits[:half] << shifts).sum())
            lo = int((bits[half:] << shifts).sum())
            rows.append((doc_id, w, h, hi, lo))
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "dhash_hi", "dhash_lo"])


def mm12_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image fingerprinting (dHash, the LAION-style image
    near-dup key): decode real pixels, sample a 9×8 luma grid, emit the
    64 horizontal-gradient bits as two 32-bit halves. Two images whose
    hashes sit within a small Hamming distance are visual near-dups —
    downstream pair search is EXACTLY the dd05/ss12 machinery (band the
    64 bits, pigeonhole-join, `bit_count(xor)` verify), so this operator
    completes the image half of the sketch-dedup path the text side
    already has (dd04 SimHash → dd05 pairs).

    Scale shape: one narrow Arrow-batched Python stage fused over the
    scan (decode + grid sample + 64 comparisons share the pass), fixed
    5-int output per image, no shuffle — scales by input splits alone.
    The gradient bits are resolution-invariant by construction (the
    floor maps always land on the same 9×8 grid), which is what makes
    the hash a near-dup key rather than a byte checksum."""
    imgs = _read_fixture(spark, _image_fixture(sf_dir))
    return imgs.mapInPandas(_dhash_batches, schema=DHASH_SCHEMA)


def _mm12_sql() -> str:
    # luma at dHash grid cell (x, y): source pixel (sx, sy) via integer
    # floor maps; byte i of the fixture image is (doc_id*31 + i*7) % 256
    g = (
        "(SELECT sum((doc_id * 31 + (((({y} * h) // {H}) * w + (({x} * w) // {W})) * 3 + c.c) * 7) % 256)"
        " FROM unnest(range(0, 3)) c(c))"
    )
    return f"""
    WITH m AS (
        SELECT doc_id, (doc_id % 13) + 4 AS w, (doc_id % 7) + 4 AS h
        FROM documents
    ),
    grid AS (
        SELECT doc_id, w, h, x.x AS x, y.y AS y,
               {g.format(x='x.x', y='y.y', W=DHASH_W, H=DHASH_H)} AS g0,
               {g.format(x='(x.x + 1)', y='y.y', W=DHASH_W, H=DHASH_H)} AS g1
        FROM m, unnest(range(0, {DHASH_W - 1})) x(x), unnest(range(0, {DHASH_H})) y(y)
    )
    SELECT doc_id,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           CAST(sum(CASE WHEN y < {DHASH_H // 2} AND g1 > g0
                         THEN 1 << (y * {DHASH_W - 1} + x) ELSE 0 END) AS BIGINT) AS dhash_hi,
           CAST(sum(CASE WHEN y >= {DHASH_H // 2} AND g1 > g0
                         THEN 1 << ((y - {DHASH_H // 2}) * {DHASH_W - 1} + x) ELSE 0 END) AS BIGINT) AS dhash_lo
    FROM grid GROUP BY doc_id
"""


MM12_SQL = _mm12_sql()


# ---------------------------------------------------------------------------
# mm08: REAL video container walk — AVI is RIFF (like WAV), so frame
# INDEXING needs no codec: walk RIFF('AVI ') → LIST('hdrl') for the
# main header (frame count, dimensions) → LIST('movi') for the '00dc'
# frame chunks. The op emits every Nth frame's (offset, size, checksum)
# — the frame-sampling stage of a video pipeline, with the expensive
# per-frame pixel decode left to a downstream decoder (MJPEG frames are
# JPEG — honestly not decodable here). Fixture AVIs carry closed-form
# frame payloads the oracle recomputes.
# ---------------------------------------------------------------------------

FRAME_STEP = 3  # emit frames 0, 3, 6, ... (the "every Nth frame" sample)


def _frame_bytes(doc_id: int, frame_no: int, size: int) -> bytes:
    """Closed-form fake frame payload: byte i = (doc_id*13 + frame_no*7
    + i*3) % 256."""
    return bytes((doc_id * 13 + frame_no * 7 + i * 3) % 256 for i in range(size))


def encode_avi(width: int, height: int, frames: list[bytes]) -> bytes:
    """Minimal RIFF/AVI writer: avih main header inside LIST('hdrl'),
    a LIST('INFO') chunk decoders must skip, then LIST('movi') with one
    '00dc' chunk per frame (odd sizes pad to word alignment, as RIFF
    requires)."""
    import struct

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        33333,  # µs per frame (~30 fps)
        0, 0, 0,
        len(frames),  # dwTotalFrames
        0, 1,  # streams
        0, width, height, 0, 0, 0, 0,
    )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih))
    info = list_chunk(b"INFO", chunk(b"ISFT", b"fixture\x00"))
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + info + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(payload: bytes) -> dict:
    """Pure-stdlib AVI container walk: validate RIFF('AVI '), read the
    avih main header out of LIST('hdrl'), then index every '00dc' frame
    chunk inside LIST('movi') — (absolute offset, size) per frame,
    without touching the frame bytes. Word-aligned chunk stepping, as
    in the WAV decoder. Frame PIXEL decoding (MJPEG = a baseline JPEG
    per '00dc' chunk) is real since round 8 — mm10 feeds the sampled
    frame slices through ``functions/jpeg.py``."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "no pure-Python parser for this video container (MP4/MKV need "
            "full demuxers; only RIFF/AVI is supported here)"
        )
    n_frames = width = height = None
    frames: list[tuple[int, int]] = []  # (abs offset of frame bytes, size)

    def walk(pos: int, end: int) -> None:
        nonlocal n_frames, width, height
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                kind = payload[body_start : body_start + 4]
                if kind in (b"hdrl", b"movi"):
                    walk(body_start + 4, body_start + size)
            elif tag == b"avih":
                vals = struct.unpack_from("<IIIIIIIIII", payload, body_start)
                n_frames, width, height = vals[4], vals[8], vals[9]
            elif tag == b"00dc":
                frames.append((body_start, size))
            pos = body_start + size + (size % 2)

    walk(12, len(payload))
    if n_frames is None:
        raise ValueError("AVI missing avih header")
    if n_frames != len(frames):
        raise ValueError(f"avih declares {n_frames} frames, movi has {len(frames)}")
    return {"fmt": "avi", "width": width, "height": height, "frames": frames}


def _video_fixture(sf_dir: str) -> str:
    """One AVI per document: frame count and frame size vary with doc_id
    (odd frame sizes exercise the RIFF pad byte)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "video_v2")
    out_file = os.path.join(out_dir, "video.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        payloads = []
        for d in doc_ids:
            n_frames = (d % 12) + 3
            fsize = (d % 9) + 5  # 5..13 bytes — odd sizes hit the pad path
            w, h = (d % 13) + 4, (d % 7) + 4
            payloads.append(
                encode_avi(w, h, [_frame_bytes(d, f, fsize) for f in range(n_frames)])
            )
        tbl = pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())})
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(64, tbl.num_rows // 64))
        os.replace(tmp, out_file)
    return out_file


FRAME_SCHEMA = (
    "doc_id long, n_frames int, width int, height int, "
    "frame_no int, byte_offset long, n_bytes int, checksum long"
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: walk the container, emit every FRAME_STEPth
    frame's offset/size plus a position-weighted checksum of the frame
    BYTES (reading only the sampled frames' slices — the I/O shape of
    real frame sampling)."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            m = parse_avi_frames(payload)
            for f, (off, size) in enumerate(m["frames"]):
                if f % FRAME_STEP:
                    continue
                b = np.frombuffer(payload[off : off + size], dtype=np.uint8).astype(np.int64)
                rows.append(
                    (
                        doc_id, len(m["frames"]), m["width"], m["height"],
                        f, off, size, int(((np.arange(size) + 1) * b).sum()),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "width", "height",
                "frame_no", "byte_offset", "n_bytes", "checksum",
            ],
        )


def mm08_video_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container frame sampling: AVI payloads → RIFF walk →
    every Nth frame's (offset, size, byte checksum). Same narrow
    one-stage shape as mm05/mm07; a production pipeline hands the
    sampled (offset, size) slices to the frame decoder."""
    vids = _read_fixture(spark, _video_fixture(sf_dir))
    return vids.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA)


# Oracle: reproduce the container layout arithmetic in closed form.
# Layout offsets (from encode_avi): RIFF header 12 + hdrl LIST 76
# (8 + 4 + (8 + 56-byte avih)) + INFO LIST 28 (8 + 4 + (8 + 8-byte
# ISFT)) + movi LIST header 12 (8 + 'movi') = 128 bytes to the first
# '00dc' tag; each frame chunk occupies 8 + fsize + (fsize % 2) bytes;
# frame byte offset = tag offset + 8.
MM08_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               (doc_id % 12) + 3 AS n_frames,
               (doc_id % 9) + 5 AS fsize,
               (doc_id % 13) + 4 AS w,
               (doc_id % 7) + 4 AS h
        FROM documents
    ),
    fr AS (
        SELECT doc_id, n_frames, fsize, w, h, CAST(t.f AS INT) AS frame_no,
               128 + t.f * (8 + fsize + (fsize % 2)) + 8 AS byte_offset
        FROM m, unnest(range(0, n_frames)) t(f)
        WHERE t.f % {FRAME_STEP} = 0
    )
    SELECT doc_id,
           CAST(n_frames AS INT) AS n_frames,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           frame_no,
           CAST(byte_offset AS BIGINT) AS byte_offset,
           CAST(fsize AS INT) AS n_bytes,
           CAST((
               SELECT sum((t.i + 1) * ((doc_id * 13 + frame_no * 7 + t.i * 3) % 256))
               FROM unnest(range(0, fsize)) t(i)
           ) AS BIGINT) AS checksum
    FROM fr
"""



# ---------------------------------------------------------------------------
# mm10: the video path REAL end-to-end — AVI (MJPEG) container walk →
# every-Nth frame sample → baseline JPEG decode of each sampled frame
# (functions/jpeg.py: Huffman + dequant + IDCT + pinned YCbCr→RGB) →
# per-frame pixel stats. Retires the last multimodal stub: mm08 indexed
# frames it could not decode; mm10 decodes them. Fixture frames encode
# YCbCr planes that are UNIFORM per 8x8 block, which a quant=1 baseline
# JPEG reproduces bit-exactly (a constant block's DCT is DC-only), so
# the DuckDB oracle recomputes every output pixel from the closed-form
# block values + the pinned floor(x+0.5) color conversion — it never
# sees the encoded bytes, and a Huffman/zigzag/IDCT/crop bug fails the
# position-weighted value hash. The general (lossy) AC path is pinned
# by round-trip tests in tests/test_multimodal_codecs.py.
# ---------------------------------------------------------------------------

MJPEG_STEP = FRAME_STEP  # sample every Nth frame, as mm08


def _mjpeg_block_planes(doc_id: int, frame_no: int, w: int, h: int):
    """Closed-form uniform-per-8x8-block YCbCr planes for fixture frame
    (doc_id, frame_no) — the formulas the oracle SQL replicates."""
    import numpy as np

    bh, bw = (h + 7) // 8, (w + 7) // 8
    by, bx = np.meshgrid(np.arange(bh), np.arange(bw), indexing="ij")
    yv = (doc_id * 37 + frame_no * 41 + by * 17 + bx * 29) % 256
    cb = (doc_id * 19 + frame_no * 31 + by * 7 + bx * 11) % 256
    cr = (doc_id * 23 + frame_no * 43 + by * 13 + bx * 3) % 256
    expand = lambda p: np.repeat(np.repeat(p, 8, 0), 8, 1)[:h, :w].astype("uint8")  # noqa: E731
    return expand(yv), expand(cb), expand(cr)


def _mjpeg_fixture(sf_dir: str) -> str:
    """One MJPEG AVI per document: real baseline JPEG frames inside
    '00dc' chunks, dimensions NOT multiples of 8 so the decoder's
    pad-and-crop path is exercised."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.jpeg import encode_jpeg
    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "mjpeg_v2")
    out_file = os.path.join(out_dir, "mjpeg.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        payloads = []
        for d in doc_ids:
            n_frames = (d % 4) + 2
            w, h = (d % 9) + 8, (d % 5) + 8
            frames = [
                encode_jpeg(w, h, *_mjpeg_block_planes(d, f, w, h))
                for f in range(n_frames)
            ]
            payloads.append(encode_avi(w, h, frames))
        tbl = pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())}
        )
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(64, tbl.num_rows // 64))
        os.replace(tmp, out_file)
    return out_file


FRAME_PIXEL_SCHEMA = (
    "doc_id long, n_frames int, width int, height int, frame_no int, "
    "n_pixels long, checksum long, sum_r long, sum_g long, sum_b long"
)


def _frame_pixel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: AVI walk, then DECODE every sampled frame's
    JPEG slice and emit stats on the decoded RGB — the full
    container→codec→pixels path in one narrow Python stage."""
    import numpy as np

    from ..functions.jpeg import decode_jpeg

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            m = parse_avi_frames(payload)
            for f, (off, size) in enumerate(m["frames"]):
                if f % MJPEG_STEP:
                    continue
                img = decode_jpeg(payload[off : off + size])
                px = np.frombuffer(img["pixels"], dtype=np.uint8).astype(np.int64)
                rows.append(
                    (
                        doc_id, len(m["frames"]), img["width"], img["height"], f,
                        len(px) // 3, int(((np.arange(len(px)) + 1) * px).sum()),
                        int(px[0::3].sum()), int(px[1::3].sum()), int(px[2::3].sum()),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "width", "height", "frame_no",
                "n_pixels", "checksum", "sum_r", "sum_g", "sum_b",
            ],
        )


def mm10_video_frame_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MJPEG video decode end-to-end: AVI container walk → every
    Nth frame slice → baseline JPEG decode → per-frame pixel stats.
    Same narrow one-Python-stage shape as mm05/mm08 (no shuffle — the
    op scales by adding input splits); only the codec work per row grew
    from byte checksums to a real entropy-decode + IDCT."""
    vids = _read_fixture(spark, _mjpeg_fixture(sf_dir))
    return vids.mapInPandas(_frame_pixel_batches, schema=FRAME_PIXEL_SCHEMA)


# Oracle: recompute each sampled frame's pixels from the closed-form
# block values (uniform 8x8 blocks survive a quant=1 baseline JPEG
# bit-exactly) + the decoder's PINNED color conversion floor(x+0.5).
MM10_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               (doc_id % 4) + 2 AS n_frames,
               (doc_id % 9) + 8 AS w,
               (doc_id % 5) + 8 AS h
        FROM documents
    ),
    fr AS (
        SELECT doc_id, n_frames, w, h, CAST(t.f AS INT) AS frame_no
        FROM m, unnest(range(0, n_frames)) t(f)
        WHERE t.f % {FRAME_STEP} = 0
    ),
    px AS (
        SELECT doc_id, n_frames, w, h, frame_no, t.p AS p,
               (doc_id * 37 + frame_no * 41 + ((t.p // w) // 8) * 17 + ((t.p % w) // 8) * 29) % 256 AS yv,
               (doc_id * 19 + frame_no * 31 + ((t.p // w) // 8) * 7 + ((t.p % w) // 8) * 11) % 256 AS cbv,
               (doc_id * 23 + frame_no * 43 + ((t.p // w) // 8) * 13 + ((t.p % w) // 8) * 3) % 256 AS crv
        FROM fr, unnest(range(0, w * h)) t(p)
    ),
    rgb AS (
        SELECT doc_id, n_frames, w, h, frame_no, p,
               least(greatest(floor(yv + 1.402 * (crv - 128) + 0.5), 0), 255) AS r,
               least(greatest(floor(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5), 0), 255) AS g,
               least(greatest(floor(yv + 1.772 * (cbv - 128) + 0.5), 0), 255) AS b
        FROM px
    )
    SELECT doc_id,
           CAST(any_value(n_frames) AS INT) AS n_frames,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           frame_no,
           CAST(any_value(w) * any_value(h) AS BIGINT) AS n_pixels,
           CAST(sum((3 * p + 1) * r + (3 * p + 2) * g + (3 * p + 3) * b) AS BIGINT) AS checksum,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM rgb GROUP BY doc_id, frame_no
"""


# ---------------------------------------------------------------------------
# mm09: image-text pair curation gate — the CLIP-score filter every
# multimodal corpus runs (LAION's curation shape: score each
# image-caption pair with the cosine of their embeddings, keep pairs
# above a threshold, report the evidence per pair for auditing).
# Pair model: embeddings.vec_id is the image embedding of the document
# with the same id; the caption embedding is a deterministic
# feature-hashing text encoder (Weinberger et al. 2009: each word hashes
# to one of DIM buckets with a ±1 sign) so the whole gate is
# oracle-checkable without a model forward pass — swap the encoder
# column for real CLIP text embeddings without changing the dataflow.
# ---------------------------------------------------------------------------

MM09_DIM = 64  # caption feature-hash dimension == image embedding dim
MM09_THRESHOLD = 0.05  # keeps ~1/3 of the sf0.01 corpus — splits both ways


def mm09_pair_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair curation gate: encode captions map-side (feature
    hashing: bucket = poly_hash(word) % DIM, sign = ±1 from the next
    hash bit), join each caption vector with its image embedding on the
    pair id, cosine-score, and gate at ``MM09_THRESHOLD`` — keep/drop
    plus the per-pair audit evidence (word count, both norms, score).

    Scale shape: the encoder is a pure map fused into the documents
    scan (O(L + DIM·L) int ops per caption — same order as the DIM-dot
    product itself for short captions; a real CLIP encoder is a model
    forward pass here, the plumbing is identical). The ONLY shuffle is
    the pair-id equi-join of two corpus-sized sides — sort-merge at
    100 TB, broadcast at test SF — and all arithmetic is JVM
    higher-order functions, no Python. ``keep`` compares the ROUNDED
    score (the tx14 lesson) so both engines decide boundaries on
    identical doubles."""
    from ..functions.hashing import poly_hash

    docs = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id", "text")
    ws = F.split("text", " ")
    # per word: (bucket, sign) from one polynomial hash — sign is bit 6
    # of the hash ((h // DIM) % 2), expressed integer-only as h % 2DIM
    bs = F.transform(
        ws,
        lambda w: F.struct(
            (poly_hash(w) % MM09_DIM).cast("int").alias("b"),
            F.when(poly_hash(w) % (2 * MM09_DIM) < MM09_DIM, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )
    # ONE fold with an array accumulator — NOT 64 per-bucket folds: a
    # transform(sequence(0, 63), i -> aggregate(bs, ...)) inlines the
    # bs sub-expression (poly_hash per word) into each of the 64 fold
    # branches after projection collapse, turning the encoder into
    # O(64·L·|word|) per doc (~35 s at sf0.1, measured). The array-
    # accumulator fold evaluates bs once and costs O(64·L) comparisons.
    # The two-arg transform lambda receives (element, index) — here the
    # index IS the bucket number being matched.
    cv = F.aggregate(
        bs,
        F.array_repeat(F.lit(0.0), MM09_DIM),
        lambda acc, e: F.transform(
            acc, lambda x, i: x + F.when(e["b"] == i, e["s"]).otherwise(F.lit(0.0))
        ),
    )
    cap = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.size(ws).alias("n_caption_words"),
        cv.alias("cv"),
    )
    img = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").cast("array<double>").alias("iv"),
    )

    def _norm(col):
        return F.sqrt(
            F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )

    dot = F.aggregate(
        F.zip_with("cv", "iv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        cap.join(img, "pair_id")
        .withColumn("cn", _norm("cv"))
        .withColumn("inm", _norm("iv"))
        .withColumn(
            "clip_score",
            F.round(
                F.when(F.col("cn") * F.col("inm") == 0, F.lit(0.0)).otherwise(
                    dot / (F.col("cn") * F.col("inm"))
                ),
                6,
            ),
        )
    )
    return scored.select(
        "pair_id",
        "n_caption_words",
        F.round("cn", 6).alias("caption_norm"),
        F.round("inm", 6).alias("image_norm"),
        "clip_score",
        (F.col("clip_score") >= MM09_THRESHOLD).alias("keep"),
    )


def _mm09_sql() -> str:
    from ..functions.hashing import poly_hash_sql

    dim = MM09_DIM
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    hv AS (SELECT doc_id, len(ws) AS n_caption_words,
                  list_transform(ws, w -> {poly_hash_sql('w')}) AS hs FROM d),
    c AS (SELECT doc_id, n_caption_words,
                 list_transform(range(0, {dim}), i ->
                     list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         list_transform(hs, h -> CASE WHEN h % {dim} = i
                             THEN (CASE WHEN h % {2 * dim} < {dim} THEN 1.0 ELSE -1.0 END)
                             ELSE 0.0 END)),
                       (a, x) -> a + x)) AS cv
          FROM hv),
    i AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS iv FROM embeddings),
    s AS (SELECT c.doc_id, n_caption_words,
                 sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS cn,
                 sqrt(list_reduce(list_transform(iv, x -> x * x), (a, b) -> a + b)) AS inm,
                 list_reduce(list_transform(range(1, {dim} + 1), j -> cv[j] * iv[j]),
                             (x, y) -> x + y) AS dot
          FROM c JOIN i USING (doc_id))
    SELECT doc_id AS pair_id,
           CAST(n_caption_words AS INT) AS n_caption_words,
           round(cn, 6) AS caption_norm,
           round(inm, 6) AS image_norm,
           round(CASE WHEN cn * inm = 0 THEN 0.0 ELSE dot / (cn * inm) END, 6) AS clip_score,
           round(CASE WHEN cn * inm = 0 THEN 0.0 ELSE dot / (cn * inm) END, 6)
               >= {MM09_THRESHOLD} AS keep
    FROM s
"""


MM09_SQL = _mm09_sql()


# ---------------------------------------------------------------------------
# mm13: the mm10 video path on 4:2:0 chroma-subsampled MJPEG — the
# sampling real-world cameras/MJPEG overwhelmingly emit. Same AVI walk
# → every-Nth-frame sample → JPEG decode → per-frame pixel stats, but
# the frames are encoded with Y at 2x2 sampling and 2x2-box-downsampled
# chroma, so the decode exercises the interleaved 6-blocks-per-MCU
# entropy order, the half-resolution chroma planes, and the PINNED
# replication upsample. Fixture frames keep Y uniform per 8x8 block and
# chroma uniform per 16x16 PIXEL block (uniform per 2x2 cell → the box
# downsample is exact; uniform per chroma 8x8 block → DC-only survives
# quant=1; replication upsample reconstructs the original plane
# bit-exactly), so the DuckDB oracle recomputes every output pixel from
# the closed-form block values without ever seeing the encoded bytes —
# an MCU-ordering/upsample/crop bug fails the position-weighted hash.
# Frame dims are NOT multiples of 16, so MCU padding + odd-dimension
# chroma edge-padding are exercised on every document.
# ---------------------------------------------------------------------------


def _mjpeg420_block_planes(doc_id: int, frame_no: int, w: int, h: int):
    """Closed-form planes for 4:2:0 fixture frame (doc_id, frame_no):
    Y uniform per 8x8 block, Cb/Cr uniform per 16x16 block — the
    formulas MM13_SQL replicates."""
    import numpy as np

    by, bx = np.meshgrid(np.arange((h + 7) // 8), np.arange((w + 7) // 8), indexing="ij")
    yv = (doc_id * 37 + frame_no * 41 + by * 17 + bx * 29) % 256
    cy, cx = np.meshgrid(np.arange((h + 15) // 16), np.arange((w + 15) // 16), indexing="ij")
    cb = (doc_id * 19 + frame_no * 31 + cy * 7 + cx * 11) % 256
    cr = (doc_id * 23 + frame_no * 43 + cy * 13 + cx * 3) % 256
    ex8 = lambda p: np.repeat(np.repeat(p, 8, 0), 8, 1)[:h, :w].astype("uint8")  # noqa: E731
    ex16 = lambda p: np.repeat(np.repeat(p, 16, 0), 16, 1)[:h, :w].astype("uint8")  # noqa: E731
    return ex8(yv), ex16(cb), ex16(cr)


def _mjpeg420_fixture(sf_dir: str) -> str:
    """One 4:2:0 MJPEG AVI per document; dimensions not multiples of
    16 so MCU padding, odd-dim chroma downsampling, and the replication
    upsample's crop are all on the decode path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.jpeg import encode_jpeg
    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "mjpeg420_v3")
    out_file = os.path.join(out_dir, "mjpeg420.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )
        payloads = []
        for d in doc_ids:
            n_frames = (d % 3) + 2
            w, h = (d % 11) + 10, (d % 7) + 9
            # restart_interval=2 puts RSTn framing on every fixture
            # frame — DRI decode is exercised in-pipeline, and the
            # oracle is unaffected because restart framing decodes to
            # identical pixels (pinned by the codec tests)
            frames = [
                encode_jpeg(
                    w, h, *_mjpeg420_block_planes(d, f, w, h),
                    subsampling="420", restart_interval=2,
                )
                for f in range(n_frames)
            ]
            payloads.append(encode_avi(w, h, frames))
        tbl = pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())}
        )
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(64, tbl.num_rows // 64))
        os.replace(tmp, out_file)
    return out_file


def mm13_video_420_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 MJPEG decode end-to-end: AVI walk → every Nth frame →
    chroma-subsampled baseline JPEG decode (interleaved MCU order,
    half-res chroma, pinned replication upsample) → per-frame pixel
    stats. Same narrow no-shuffle mapInPandas shape as mm10 — scales
    by input splits."""
    vids = _read_fixture(spark, _mjpeg420_fixture(sf_dir))
    return vids.mapInPandas(_frame_pixel_batches, schema=FRAME_PIXEL_SCHEMA)


MM13_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               (doc_id % 3) + 2 AS n_frames,
               (doc_id % 11) + 10 AS w,
               (doc_id % 7) + 9 AS h
        FROM documents
    ),
    fr AS (
        SELECT doc_id, n_frames, w, h, CAST(t.f AS INT) AS frame_no
        FROM m, unnest(range(0, n_frames)) t(f)
        WHERE t.f % {FRAME_STEP} = 0
    ),
    px AS (
        SELECT doc_id, n_frames, w, h, frame_no, t.p AS p,
               (doc_id * 37 + frame_no * 41 + ((t.p // w) // 8) * 17 + ((t.p % w) // 8) * 29) % 256 AS yv,
               (doc_id * 19 + frame_no * 31 + ((t.p // w) // 16) * 7 + ((t.p % w) // 16) * 11) % 256 AS cbv,
               (doc_id * 23 + frame_no * 43 + ((t.p // w) // 16) * 13 + ((t.p % w) // 16) * 3) % 256 AS crv
        FROM fr, unnest(range(0, w * h)) t(p)
    ),
    rgb AS (
        SELECT doc_id, n_frames, w, h, frame_no, p,
               least(greatest(floor(yv + 1.402 * (crv - 128) + 0.5), 0), 255) AS r,
               least(greatest(floor(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5), 0), 255) AS g,
               least(greatest(floor(yv + 1.772 * (cbv - 128) + 0.5), 0), 255) AS b
        FROM px
    )
    SELECT doc_id,
           CAST(any_value(n_frames) AS INT) AS n_frames,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           frame_no,
           CAST(any_value(w) * any_value(h) AS BIGINT) AS n_pixels,
           CAST(sum((3 * p + 1) * r + (3 * p + 2) * g + (3 * p + 3) * b) AS BIGINT) AS checksum,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b
    FROM rgb GROUP BY doc_id, frame_no
"""


# ---------------------------------------------------------------------------
# mm14: audio resample — THE standard speech-corpus preprocessing step
# (ASR/speech-LM pipelines normalize everything to 16 kHz/8 kHz mono
# before feature extraction). Real DSP on real decoded PCM: channel
# downmix (mean across channels) then integer-factor decimation with a
# boxcar (moving-average) anti-alias filter — out[k] = mean of D
# consecutive mono frames. All arithmetic is PINNED floor() at each
# stage so the DuckDB oracle recomputes every output sample exactly
# from the closed-form fixture stream; the tail partial window is
# dropped (standard decimator behavior).
# ---------------------------------------------------------------------------

RESAMPLE_FACTOR = 4  # 8000 Hz fixture -> 2000 Hz output

RESAMPLE_SCHEMA = (
    "doc_id long, rate_in int, rate_out int, n_in long, n_out long, "
    "peak_out int, sum_out long, checksum_out long"
)


def _resample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: WAV decode → floor-mean mono downmix →
    boxcar decimation by RESAMPLE_FACTOR → typed output-sample stats
    (peak / sum / position-weighted checksum)."""
    import numpy as np

    D = RESAMPLE_FACTOR
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_audio_real(bytes(payload))
            s = np.asarray(m["samples"], dtype=np.int64)
            ch = m["n_channels"]
            mono = np.floor_divide(s.reshape(-1, ch).sum(axis=1), ch)
            n_out = len(mono) // D
            out = np.floor_divide(mono[: n_out * D].reshape(-1, D).sum(axis=1), D)
            rows.append(
                (
                    doc_id, m["rate"], m["rate"] // D, len(mono), n_out,
                    int(np.abs(out).max(initial=0)), int(out.sum()),
                    int(((np.arange(n_out) + 1) * out).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "rate_in", "rate_out", "n_in", "n_out",
                "peak_out", "sum_out", "checksum_out",
            ],
        )


def mm14_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resampling end-to-end: WAV decode → mono downmix →
    boxcar decimation to rate/4. Same narrow no-shuffle mapInPandas
    shape as mm07 — the DSP cost rides inside the Python batch and the
    op scales by input splits; a polyphase/sinc resampler drops in by
    replacing the kernel, dataflow unchanged."""
    wavs = _read_fixture(spark, _audio_fixture(sf_dir))
    return wavs.mapInPandas(_resample_batches, schema=RESAMPLE_SCHEMA)


# Oracle: recompute each output sample from the closed-form interleaved
# stream — frame mono value = floor(channel sum / ch), output sample =
# floor(window sum / D) — floor division floors toward -inf in BOTH
# engines here because we pin floor(x / d) on doubles (exact at these
# magnitudes).
MM14_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               1 + (doc_id % 2) AS ch,
               (doc_id % 50) + 20 AS n_frames
        FROM documents
    ),
    sv AS (
        SELECT doc_id, ch, n_frames, t.j AS j,
               ((doc_id * 37 + t.j * 11) % 4001) - 2000 AS v
        FROM m, unnest(range(0, n_frames * ch)) t(j)
    ),
    mono AS (
        SELECT doc_id, ch, n_frames, j // ch AS i,
               CAST(floor(sum(v) / ch) AS BIGINT) AS mv
        FROM sv GROUP BY doc_id, ch, n_frames, j // ch
    ),
    outp AS (
        SELECT doc_id, ch, n_frames, i // {RESAMPLE_FACTOR} AS k,
               CAST(floor(sum(mv) / {RESAMPLE_FACTOR}) AS BIGINT) AS ov
        FROM mono
        WHERE i < (n_frames // {RESAMPLE_FACTOR}) * {RESAMPLE_FACTOR}
        GROUP BY doc_id, ch, n_frames, i // {RESAMPLE_FACTOR}
    )
    SELECT doc_id,
           CAST({AUDIO_RATE} AS INT) AS rate_in,
           CAST({AUDIO_RATE} // {RESAMPLE_FACTOR} AS INT) AS rate_out,
           CAST(any_value(n_frames) AS BIGINT) AS n_in,
           CAST(count(*) AS BIGINT) AS n_out,
           CAST(max(abs(ov)) AS INT) AS peak_out,
           CAST(sum(ov) AS BIGINT) AS sum_out,
           CAST(sum((k + 1) * ov) AS BIGINT) AS checksum_out
    FROM outp GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# mm15: video shot-boundary detection — the sampling front end of every
# video-training pipeline (pick one frame per shot instead of every Nth
# frame). Real signal path: decode EVERY frame of the MJPEG AVI (the
# mm10 fixture), compute the mean-free absolute-difference score
# between consecutive decoded frames (sum |px_f - px_{f-1}| over all
# RGB values), and flag a cut where the score clears a pinned
# per-pixel threshold. The oracle recomputes both frames' pixels from
# the closed-form block values, so a decode or frame-ordering bug
# flips cut flags.
# ---------------------------------------------------------------------------

SHOT_THRESHOLD = 66  # mean abs diff per RGB value that counts as a cut (median of the fixture distribution - splits both ways at every SF)

SHOT_SCHEMA = (
    "doc_id long, frame_no int, abs_diff long, n_vals long, is_cut boolean"
)


def _shot_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: AVI walk → decode every frame → consecutive
    |diff| sums; is_cut compares the TOTAL against threshold * n_vals
    (integer compare — no float ratio crosses the engines)."""
    import numpy as np

    from ..functions.jpeg import decode_jpeg

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            m = parse_avi_frames(payload)
            prev = None
            for f, (off, size) in enumerate(m["frames"]):
                img = decode_jpeg(payload[off : off + size])
                px = np.frombuffer(img["pixels"], dtype=np.uint8).astype(np.int64)
                if prev is not None:
                    diff = int(np.abs(px - prev).sum())
                    rows.append(
                        (doc_id, f, diff, len(px), diff > SHOT_THRESHOLD * len(px))
                    )
                prev = px
        yield pd.DataFrame(
            rows, columns=["doc_id", "frame_no", "abs_diff", "n_vals", "is_cut"]
        )


def mm15_video_shot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REAL decoded MJPEG frames: per
    consecutive frame pair, the absolute-difference score and the cut
    flag. Narrow no-shuffle mapInPandas over the video scan (mm10's
    fixture and shape); at 100 TB the op scales by input splits and
    the per-shot frame sampler consumes is_cut downstream."""
    vids = _read_fixture(spark, _mjpeg_fixture(sf_dir))
    return vids.mapInPandas(_shot_batches, schema=SHOT_SCHEMA)


# Oracle: both frames' pixels recomputed from the closed-form uniform
# 8x8 block values + the pinned color conversion (as MM10_SQL), joined
# per pixel position, |diff| summed.
MM15_SQL = f"""
    WITH m AS (
        SELECT doc_id,
               (doc_id % 4) + 2 AS n_frames,
               (doc_id % 9) + 8 AS w,
               (doc_id % 5) + 8 AS h
        FROM documents
    ),
    fr AS (
        SELECT doc_id, n_frames, w, h, CAST(t.f AS INT) AS frame_no
        FROM m, unnest(range(0, n_frames)) t(f)
    ),
    px AS (
        SELECT doc_id, w, h, frame_no, t.p AS p,
               (doc_id * 37 + frame_no * 41 + ((t.p // w) // 8) * 17 + ((t.p % w) // 8) * 29) % 256 AS yv,
               (doc_id * 19 + frame_no * 31 + ((t.p // w) // 8) * 7 + ((t.p % w) // 8) * 11) % 256 AS cbv,
               (doc_id * 23 + frame_no * 43 + ((t.p // w) // 8) * 13 + ((t.p % w) // 8) * 3) % 256 AS crv
        FROM fr, unnest(range(0, w * h)) t(p)
    ),
    rgb AS (
        SELECT doc_id, w, h, frame_no, p,
               least(greatest(floor(yv + 1.402 * (crv - 128) + 0.5), 0), 255) AS r,
               least(greatest(floor(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5), 0), 255) AS g,
               least(greatest(floor(yv + 1.772 * (cbv - 128) + 0.5), 0), 255) AS b
        FROM px
    ),
    d AS (
        SELECT a.doc_id, a.frame_no,
               sum(abs(a.r - b.r) + abs(a.g - b.g) + abs(a.b - b.b)) AS abs_diff,
               count(*) * 3 AS n_vals
        FROM rgb a
        JOIN rgb b ON a.doc_id = b.doc_id AND a.p = b.p AND b.frame_no = a.frame_no - 1
        GROUP BY a.doc_id, a.frame_no
    )
    SELECT doc_id, frame_no,
           CAST(abs_diff AS BIGINT) AS abs_diff,
           CAST(n_vals AS BIGINT) AS n_vals,
           abs_diff > {SHOT_THRESHOLD} * n_vals AS is_cut
    FROM d
"""


# ---------------------------------------------------------------------------
# mm16: byte-histogram Shannon entropy — the "is this image degenerate"
# quality feature of an image-curation pipeline (flat/solid-color or
# synthetic-banded images score low; natural images high). LAION-style
# pipelines gate on exactly this class of cheap decoded-pixel statistic
# before paying for a model forward pass. Reference has no multimodal
# ops — LLM-pipeline scope.
# ---------------------------------------------------------------------------

ENTROPY_BINS = 16  # 256/16 = 16 byte values per bin
ENTROPY_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, "
    "mode_bin int, mode_count long, entropy double"
)


def _entropy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real decode, 16-bin histogram over ALL pixel
    bytes (bin = byte >> 4), Shannon entropy in nats. FP contract with
    the oracle: the entropy accumulates in ascending-bin order, zero
    bins skipped (absent from both engines' folds), p = count/total in
    double, one ln per nonzero bin; `a - x` is IEEE-identical to
    `a + (-x)`, which is the oracle's fold. Mode ties break to the
    lowest bin (np.argmax first-hit == the oracle's rank order)."""
    import math

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_real(bytes(payload))
            px = np.frombuffer(m["pixels"], dtype=np.uint8)
            bins = np.bincount(px >> 4, minlength=ENTROPY_BINS)
            total = int(px.size)
            ent = 0.0
            for b in range(ENTROPY_BINS):
                c = int(bins[b])
                if c:
                    p = c / total
                    ent -= p * math.log(p)
            mode_bin = int(np.argmax(bins))
            rows.append(
                (
                    doc_id, m["width"], m["height"], total,
                    mode_bin, int(bins[mode_bin]), round(ent + 1e-9, 6),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "n_bytes",
                "mode_bin", "mode_count", "entropy",
            ],
        )


def mm16_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image byte-histogram entropy + mode-bin evidence over REAL
    decoded pixels (BMP/PPM/PNG mixed fixture). Scale shape: identical
    to mm05/mm12 — ONE narrow Arrow-batched Python stage over the image
    scan, fixed 7-column output per image, no shuffle; scales by input
    splits alone. The oracle recomputes the histogram from the
    fixture's closed-form byte stream and folds the same entropy sum in
    SQL."""
    imgs = _read_fixture(spark, _image_fixture(sf_dir))
    return imgs.mapInPandas(_entropy_batches, schema=ENTROPY_SCHEMA)


def _mm16_sql() -> str:
    # fixture byte i of image doc_id is (doc_id*31 + i*7) % 256; bin =
    # byte // 16. Entropy folds -(c/n)·ln(c/n) in ascending-bin order
    # over the PRESENT bins only (groupBy never emits zero counts).
    return f"""
    WITH m AS (
        SELECT doc_id, (doc_id % 13) + 4 AS w, (doc_id % 7) + 4 AS h
        FROM documents
    ),
    bytes AS (
        SELECT doc_id, w, h, w * h * 3 AS n,
               ((doc_id * 31 + i.i * 7) % 256) // 16 AS bin
        FROM m, unnest(range(0, w * h * 3)) i(i)
    ),
    hist AS (
        SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
               any_value(n) AS n, bin, count(*) AS c
        FROM bytes GROUP BY doc_id, bin
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, bin ASC) AS rk
        FROM hist
    ),
    ent AS (
        SELECT doc_id, any_value(w) AS w, any_value(h) AS h, any_value(n) AS n,
               list_reduce(
                   list_prepend(
                       CAST(0 AS DOUBLE),
                       list(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) ORDER BY bin)
                   ),
                   (a, x) -> a + x
               ) AS entropy
        FROM hist GROUP BY doc_id
    )
    SELECT e.doc_id,
           CAST(e.w AS INT) AS width, CAST(e.h AS INT) AS height,
           CAST(e.n AS BIGINT) AS n_bytes,
           CAST(r.bin AS INT) AS mode_bin,
           CAST(r.c AS BIGINT) AS mode_count,
           round(e.entropy + 1e-9, 6) AS entropy
    FROM ent e JOIN ranked r ON e.doc_id = r.doc_id AND r.rk = 1
"""


MM16_SQL = _mm16_sql()


# ---------------------------------------------------------------------------
# mm17: DCT perceptual hash (pHash) — the frequency-domain image
# fingerprint (stronger than mm12's gradient dHash against resize /
# mild recompression, the standard key for image near-dup at LAION
# scale). The DCT is FIXED-POINT: the 32×32 type-II cosine basis is
# rounded to 15-bit integers ONCE in Python and embedded as literals in
# both engines, so the whole transform is exact int64 arithmetic — no
# trig and no float crosses the engine boundary (worst case
# 32·765·2¹⁵·32·2¹⁵ ≈ 8.4e14 ≪ 2⁶³). Reference has no multimodal ops
# — LLM-pipeline scope.
# ---------------------------------------------------------------------------

PHASH_G = 32        # DCT grid (classic pHash geometry)
PHASH_K = 8         # low-frequency block kept
PHASH_SCALE = 32768  # 15-bit fixed-point basis

import math as _math  # noqa: E402

# C[x][u] = round(cos((2x+1)·u·π/(2G)) · SCALE) — shared verbatim by the
# numpy worker and (as literals) the SQL oracle.
_PHASH_C = [
    [
        round(_math.cos((2 * x + 1) * u * _math.pi / (2 * PHASH_G)) * PHASH_SCALE)
        for u in range(PHASH_G)
    ]
    for x in range(PHASH_G)
]

PHASH_SCHEMA = "doc_id long, width int, height int, median_ac long, phash_hi long, phash_lo long"


def _phash_of_luma(luma, C):
    """Shared pHash core (mm17 + mm23's per-frame twin): 32x32
    nearest-neighbor grid -> exact int64 separable DCT -> top-left 8x8
    block, DC dropped -> bit k = coef > lower median of the 63 AC
    coefficients. One implementation so the hash RULES cannot drift
    between the image and video workers (both oracles replay these
    exact rules)."""
    import numpy as np

    h, w = luma.shape
    xs = (np.arange(PHASH_G) * w) // PHASH_G
    ys = (np.arange(PHASH_G) * h) // PHASH_G
    g = luma[ys][:, xs]  # 32x32, g[y][x]
    # m1[u][y] = SUM_x g[y][x]*C[x][u];  coef[u][v] = SUM_y m1[u][y]*C[y][v]
    m1 = C.T @ g.T
    coef = m1 @ C
    block = coef[:PHASH_K, :PHASH_K]
    ac = np.array(
        [block[u, v] for v in range(PHASH_K) for u in range(PHASH_K) if (u, v) != (0, 0)],
        dtype=np.int64,
    )
    med = int(np.sort(ac)[(len(ac) - 1) // 2])  # lower median of 63
    bits = (ac > med).astype(np.int64)
    hi = int((bits[:31] << np.arange(31)).sum())
    lo = int((bits[31:] << np.arange(32)).sum())
    return med, hi, lo


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real decode → luma → the shared
    ``_phash_of_luma`` rules. All-integer, so engine parity is exact
    with no FP contract."""
    import numpy as np

    C = np.array(_PHASH_C, dtype=np.int64)  # [x][u]
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_real(bytes(payload))
            w, h = m["width"], m["height"]
            px = np.frombuffer(m["pixels"], dtype=np.uint8).astype(np.int64)
            luma = px.reshape(h, w, 3).sum(axis=2)
            med, hi, lo = _phash_of_luma(luma, C)
            rows.append((doc_id, w, h, med, hi, lo))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "median_ac", "phash_hi", "phash_lo"]
        )


def mm17_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual DCT hash per image over REAL decoded pixels. Scale
    shape: identical to mm12 — ONE narrow Arrow-batched Python stage
    over the image scan (decode + grid + two 32×32 integer matmuls per
    image), fixed 6-column output, no shuffle; downstream pair search
    is the dd05/ss12 banded-Hamming machinery on (phash_hi, phash_lo).
    The oracle replays the grid, the separable fixed-point DCT, the
    median cut and the bit packing in closed form from the fixture's
    byte formula."""
    imgs = _read_fixture(spark, _image_fixture(sf_dir))
    return imgs.mapInPandas(_phash_batches, schema=PHASH_SCHEMA)


def _mm17_sql() -> str:
    flat_c = ", ".join(str(c) for row in _PHASH_C for c in row)  # row-major [x][u]
    g_expr = (
        "(SELECT sum((doc_id * 31 + (((({y} * h) // {H}) * w + (({x} * w) // {W})) * 3 + c.c) * 7) % 256)"
        " FROM unnest(range(0, 3)) c(c))"
    ).format(x="x.x", y="y.y", W=PHASH_G, H=PHASH_G)
    return f"""
    WITH dctc AS (
        SELECT t.i // {PHASH_G} AS x, t.i % {PHASH_G} AS u,
               ([{flat_c}])[t.i + 1] AS c
        FROM unnest(range(0, {PHASH_G * PHASH_G})) t(i)
    ),
    m AS (
        SELECT doc_id, (doc_id % 13) + 4 AS w, (doc_id % 7) + 4 AS h
        FROM documents
    ),
    grid AS (
        SELECT doc_id, x.x AS x, y.y AS y, {g_expr} AS g
        FROM m, unnest(range(0, {PHASH_G})) x(x), unnest(range(0, {PHASH_G})) y(y)
    ),
    m1 AS (
        SELECT grid.doc_id, d.u AS u, grid.y AS y, sum(grid.g * d.c) AS s
        FROM grid JOIN dctc d ON d.x = grid.x
        WHERE d.u < {PHASH_K}
        GROUP BY grid.doc_id, d.u, grid.y
    ),
    coef AS (
        SELECT m1.doc_id, m1.u AS u, d.u AS v, sum(m1.s * d.c) AS s
        FROM m1 JOIN dctc d ON d.x = m1.y
        WHERE d.u < {PHASH_K}
        GROUP BY m1.doc_id, m1.u, d.u
    ),
    ac AS (
        SELECT doc_id, (v * {PHASH_K} + u) - 1 AS k, s
        FROM coef WHERE NOT (u = 0 AND v = 0)
    ),
    med AS (
        SELECT doc_id, s AS median_ac FROM (
            SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY s ASC) AS rk
            FROM ac
        ) WHERE rk = {(PHASH_K * PHASH_K - 1 - 1) // 2 + 1}
    )
    SELECT a.doc_id,
           CAST(max(m.w) AS INT) AS width,
           CAST(max(m.h) AS INT) AS height,
           CAST(max(med.median_ac) AS BIGINT) AS median_ac,
           CAST(sum(CASE WHEN a.k < 31 AND a.s > med.median_ac
                         THEN CAST(1 AS BIGINT) << a.k ELSE 0 END) AS BIGINT) AS phash_hi,
           CAST(sum(CASE WHEN a.k >= 31 AND a.s > med.median_ac
                         THEN CAST(1 AS BIGINT) << (a.k - 31) ELSE 0 END) AS BIGINT) AS phash_lo
    FROM ac a
    JOIN med ON a.doc_id = med.doc_id
    JOIN m ON a.doc_id = m.doc_id
    GROUP BY a.doc_id
"""


MM17_SQL = _mm17_sql()


# ---------------------------------------------------------------------------
# mm18: energy-gate voice-activity detection (VAD) — the front-end an
# ASR/TTS data-curation pipeline runs before any model scorer (the
# energy half of WebRTC-VAD / ITU-T G.729B annex-B shape): window the
# clip, gate each window against the clip's mean energy, and emit the
# maximal runs of active windows as SEGMENTS (the utterance spans that
# get cut, transcribed, and packed). New output shape for the mm
# family: variable rows per clip (one per segment), found by
# gaps-and-islands run-length grouping. All-integer: a window is
# active iff e·n_windows > Σe (strict), so both engines compare exact
# int64 products. Reference has no audio ops — LLM-pipeline scope.
# ---------------------------------------------------------------------------

VAD_SCHEMA = (
    "doc_id long, seg_idx int, start_w int, end_w int, n_win int, seg_energy long"
)


def _vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: WAV parse, de-interleave channel 0, window
    energies as mm11 (AUDIO_WIN frames, zero-padded tail), then the
    integer mean-energy gate and numpy run detection. A clip whose
    windows all carry identical energy emits no segments (strict >
    against the mean is false everywhere) — the silence-drop case."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_audio_real(bytes(payload))
            s = np.asarray(m["samples"], dtype=np.int64)
            c0 = s[0 :: m["n_channels"]]
            nw = (len(c0) + AUDIO_WIN - 1) // AUDIO_WIN
            padded = np.zeros(nw * AUDIO_WIN, dtype=np.int64)
            padded[: len(c0)] = c0
            e = (padded * padded).reshape(nw, AUDIO_WIN).sum(axis=1)
            idx = np.nonzero(e * nw > e.sum())[0]
            if len(idx) == 0:
                continue
            runs = np.split(idx, np.nonzero(np.diff(idx) != 1)[0] + 1)
            for si, run in enumerate(runs, 1):
                rows.append(
                    (
                        doc_id, si, int(run[0]), int(run[-1]),
                        len(run), int(e[run].sum()),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "seg_idx", "start_w", "end_w", "n_win", "seg_energy"],
        )


def mm18_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segments over REAL decoded WAV: per clip, window
    energies gated against the clip mean (exact integers — active iff
    ``e·n_windows > Σe``), maximal active runs emitted as (seg_idx,
    start_w, end_w, n_win, seg_energy) rows.

    Scale shape: one narrow Arrow-batched Python stage fused over the
    scan — the gate threshold is PER-CLIP (its own mean), so no global
    statistics pass and no shuffle anywhere; output is bounded by
    ⌈n_windows/2⌉ segments per clip. The oracle replays the windowing,
    the gate and the run grouping as SQL gaps-and-islands (island id =
    w − row_number), pinning segment boundaries exactly."""
    wavs = _read_fixture(spark, _audio_fixture(sf_dir))
    return wavs.mapInPandas(_vad_batches, schema=VAD_SCHEMA)


MM18_SQL = f"""
    WITH m AS (
        SELECT doc_id, 1 + (doc_id % 2) AS ch, (doc_id % 50) + 20 AS n_frames
        FROM documents
    ),
    c0 AS (
        SELECT doc_id, t.f AS f,
               ((doc_id * 37 + (t.f * ch) * 11) % 4001) - 2000 AS v
        FROM m, unnest(range(0, n_frames)) t(f)
    ),
    we AS (
        SELECT doc_id, f // {AUDIO_WIN} AS w, sum(v * v) AS e
        FROM c0 GROUP BY doc_id, f // {AUDIO_WIN}
    ),
    tot AS (SELECT doc_id, count(*) AS nw, sum(e) AS te FROM we GROUP BY doc_id),
    act AS (
        SELECT we.doc_id, w, e
        FROM we JOIN tot USING (doc_id)
        WHERE e * nw > te
    ),
    isl AS (
        SELECT doc_id, w, e,
               w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
        FROM act
    ),
    seg AS (
        SELECT doc_id, grp, min(w) AS start_w, max(w) AS end_w,
               count(*) AS n_win, sum(e) AS seg_energy
        FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_w) AS INT) AS seg_idx,
           CAST(start_w AS INT) AS start_w,
           CAST(end_w AS INT) AS end_w,
           CAST(n_win AS INT) AS n_win,
           CAST(seg_energy AS BIGINT) AS seg_energy
    FROM seg
"""


# ---------------------------------------------------------------------------
# mm19: ViT patchification (Dosovitskiy et al. 2020) — the tensor-prep
# step every vision-language training pipeline runs between decode and
# the model: crop the image to a multiple of the patch size, cut the
# P×P grid, and emit per-patch statistics (here integer luma
# sum/min/max — the patch-level degenerate-content evidence a curation
# pass gates on before paying for embeddings). Reference has no
# multimodal ops — LLM-pipeline scope.
# ---------------------------------------------------------------------------

PATCH_P = 4  # patch edge, pixels (fixture images are 4-16 × 4-10)

PATCH_SCHEMA = (
    "doc_id long, py int, px int, luma_sum long, luma_min long, luma_max long"
)


def _patch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: real decode → integer luma (r+g+b) →
    crop to ⌊w/P⌋·P × ⌊h/P⌋·P (ViT's resize-to-multiple, exact here) →
    one reshape gives every patch; sums/mins/maxs are single vectorized
    reductions over the (hp, P, wp, P) tensor."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_image_real(bytes(payload))
            w, h = m["width"], m["height"]
            pxb = np.frombuffer(m["pixels"], dtype=np.uint8).astype(np.int64)
            luma = pxb.reshape(h, w, 3).sum(axis=2)
            hp, wp = h // PATCH_P, w // PATCH_P
            t = luma[: hp * PATCH_P, : wp * PATCH_P].reshape(hp, PATCH_P, wp, PATCH_P)
            sums, mins, maxs = t.sum(axis=(1, 3)), t.min(axis=(1, 3)), t.max(axis=(1, 3))
            for py in range(hp):
                for px in range(wp):
                    rows.append(
                        (doc_id, py, px, int(sums[py, px]), int(mins[py, px]), int(maxs[py, px]))
                    )
        yield pd.DataFrame(
            rows, columns=["doc_id", "py", "px", "luma_sum", "luma_min", "luma_max"]
        )


def mm19_vit_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P×P patch grid over REAL decoded pixels with per-patch integer
    luma stats — variable rows per image (⌊h/P⌋·⌊w/P⌋ patches).

    Scale shape: identical to mm05-mm18's narrow-map contract — ONE
    Arrow-batched Python stage fused over the image scan, no shuffle;
    per-image cost is one reshape + three vectorized reductions, and
    output is patch-count-sized, which is what the downstream
    embedding batcher (tp03-style packing over patches) consumes. The
    oracle replays crop, grid and stats in closed form from the
    fixture's byte formula."""
    imgs = _read_fixture(spark, _image_fixture(sf_dir))
    return imgs.mapInPandas(_patch_batches, schema=PATCH_SCHEMA)


MM19_SQL = f"""
    WITH m AS (
        SELECT doc_id, (doc_id % 13) + 4 AS w, (doc_id % 7) + 4 AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, x.x AS x, y.y AS y,
               (SELECT sum((doc_id * 31 + ((y.y * w + x.x) * 3 + c.c) * 7) % 256)
                FROM unnest(range(0, 3)) c(c)) AS luma
        FROM m,
             unnest(range(0, (w // {PATCH_P}) * {PATCH_P})) x(x),
             unnest(range(0, (h // {PATCH_P}) * {PATCH_P})) y(y)
    )
    SELECT doc_id,
           CAST(y // {PATCH_P} AS INT) AS py,
           CAST(x // {PATCH_P} AS INT) AS px,
           CAST(sum(luma) AS BIGINT) AS luma_sum,
           CAST(min(luma) AS BIGINT) AS luma_min,
           CAST(max(luma) AS BIGINT) AS luma_max
    FROM px GROUP BY doc_id, y // {PATCH_P}, x // {PATCH_P}
"""


# ---------------------------------------------------------------------------
# mm20: fixed-point spectral features — per-window DFT-bin energies
# over the decoded PCM, the filterbank step between mm11's
# time-domain features and any model-based audio scorer (tone /
# hum / DTMF detection, the narrowband-noise gate of an ASR curation
# pass). Same exactness trick as mm17's DCT: the 16-sample cos/sin
# bases for bins k=1..4 round ONCE to 15-bit integers and embed as
# literals in both engines, so every bin power is exact int64
# (|x|≤2000, |C|≤2^15, 16 terms → |re| ≤ 1.05e9; re²+im² ≤ 2.2e18 <
# 2^63). Reference has no audio ops — LLM-pipeline scope.
# ---------------------------------------------------------------------------

SPEC_BINS = 4  # DFT bins k = 1..4 over the AUDIO_WIN=16 window

_SPEC_C = [
    [round(_math.cos(2 * _math.pi * k * n / AUDIO_WIN) * PHASH_SCALE) for n in range(AUDIO_WIN)]
    for k in range(1, SPEC_BINS + 1)
]
_SPEC_S = [
    [round(_math.sin(2 * _math.pi * k * n / AUDIO_WIN) * PHASH_SCALE) for n in range(AUDIO_WIN)]
    for k in range(1, SPEC_BINS + 1)
]

SPEC_SCHEMA = (
    "doc_id long, w int, p1 long, p2 long, p3 long, p4 long, dom int"
)


def _spectral_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: WAV parse, de-interleave channel 0, window
    as mm11/mm18 (zero-padded tail), then two (nw,16)x(16,4) integer
    matmuls give every window's re/im per bin; power = re² + im².
    dom = first bin achieving the max power (1-based, ties → lower
    bin)."""
    import numpy as np

    C = np.array(_SPEC_C, dtype=np.int64).T  # [n][k]
    S = np.array(_SPEC_S, dtype=np.int64).T
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_audio_real(bytes(payload))
            s = np.asarray(m["samples"], dtype=np.int64)
            c0 = s[0 :: m["n_channels"]]
            nw = (len(c0) + AUDIO_WIN - 1) // AUDIO_WIN
            padded = np.zeros(nw * AUDIO_WIN, dtype=np.int64)
            padded[: len(c0)] = c0
            wmat = padded.reshape(nw, AUDIO_WIN)
            re, im = wmat @ C, wmat @ S
            p = re * re + im * im  # exact int64 (bound in module comment)
            dom = p.argmax(axis=1) + 1  # first max, 1-based
            for w in range(nw):
                rows.append(
                    (doc_id, w, int(p[w, 0]), int(p[w, 1]), int(p[w, 2]), int(p[w, 3]), int(dom[w]))
                )
        yield pd.DataFrame(rows, columns=["doc_id", "w", "p1", "p2", "p3", "p4", "dom"])


def mm20_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window fixed-point DFT-bin powers (k=1..4 of a 16-sample
    window) + dominant bin over REAL decoded WAV.

    Scale shape: the mm-family narrow-map contract — one Arrow-batched
    Python stage over the scan, per-clip cost two small integer
    matmuls, output nw rows per clip, zero exchanges. The oracle
    replays the window slicing and both embedded integer bases in
    closed form from the fixture's sample formula, so the bin powers
    are bit-identical — a float FFT could not promise that across
    engines."""
    wavs = _read_fixture(spark, _audio_fixture(sf_dir))
    return wavs.mapInPandas(_spectral_batches, schema=SPEC_SCHEMA)


def _mm20_sql() -> str:
    flat_c = ", ".join(str(c) for row in _SPEC_C for c in row)  # [k][n] row-major
    flat_s = ", ".join(str(c) for row in _SPEC_S for c in row)
    terms = {}
    for k in range(1, SPEC_BINS + 1):
        terms[f"re{k}"] = f"sum(v * ([{flat_c}])[{(k - 1) * AUDIO_WIN} + n + 1])"
        terms[f"im{k}"] = f"sum(v * ([{flat_s}])[{(k - 1) * AUDIO_WIN} + n + 1])"
    powers = ",\n               ".join(
        f"CAST({terms[f're{k}']} * {terms[f're{k}']} + {terms[f'im{k}']} * {terms[f'im{k}']} AS BIGINT) AS p{k}"
        for k in range(1, SPEC_BINS + 1)
    )
    return f"""
    WITH m AS (
        SELECT doc_id, 1 + (doc_id % 2) AS ch, (doc_id % 50) + 20 AS n_frames
        FROM documents
    ),
    c0 AS (
        SELECT doc_id, t.f AS f,
               ((doc_id * 37 + (t.f * ch) * 11) % 4001) - 2000 AS v
        FROM m, unnest(range(0, n_frames)) t(f)
    ),
    win AS (
        SELECT doc_id, f // {AUDIO_WIN} AS w, f % {AUDIO_WIN} AS n, v FROM c0
    ),
    pw AS (
        SELECT doc_id, w,
               {powers}
        FROM win GROUP BY doc_id, w
    )
    SELECT doc_id, CAST(w AS INT) AS w, p1, p2, p3, p4,
           CAST(CASE greatest(p1, p2, p3, p4)
                WHEN p1 THEN 1 WHEN p2 THEN 2 WHEN p3 THEN 3 ELSE 4 END AS INT) AS dom
    FROM pw
"""


MM20_SQL = _mm20_sql()


# ---------------------------------------------------------------------------
# mm21: query-by-image retrieval over pHashes — the "find images like
# these flagged ones" tool a curation pipeline runs after mm17: a
# FIXED set of query images scans the corpus pHash table and returns
# each query's top-K nearest by Hamming distance (ties to the lowest
# doc_id). Composes the real decode chain (mm17) with ss01's
# exact-retrieval shape: corpus-linear work × a constant query set.
# ---------------------------------------------------------------------------

PQS_NQ = 8  # query images: doc_id < 8
PQS_K = 5   # neighbors returned per query


def mm21_phash_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K pHash Hamming retrieval for a fixed query-image set.

    Scale shape: the pHash table is computed ONCE (persisted via the
    session index cache — the query side is a broadcast 8-row slice of
    the same frame, not a second decode pass); the distance scan is a
    BroadcastNestedLoop of corpus × 8 constant rows — linear in the
    corpus, exactly ss01's exact-baseline contract — and the top-K is
    a per-query rank window (WindowGroupLimit sheds non-contenders
    map-side). The banded-Hamming index path (ss12) is the scale
    escape when the query set itself becomes corpus-sized."""
    from .dedup import _persisted

    ph = _persisted(
        "mm21_phash", spark, sf_dir,
        lambda s, d: mm17_image_phash(s, d).select("doc_id", "phash_hi", "phash_lo"),
    )
    q = ph.filter(F.col("doc_id") < PQS_NQ).select(
        F.col("doc_id").alias("q_id"),
        F.col("phash_hi").alias("q_hi"),
        F.col("phash_lo").alias("q_lo"),
    )
    dist = (
        F.bit_count(F.col("phash_hi").bitwiseXOR(F.col("q_hi")))
        + F.bit_count(F.col("phash_lo").bitwiseXOR(F.col("q_lo")))
    ).cast("int")
    pairs = (
        ph.crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != F.col("q_id"))
        .select("q_id", "doc_id", dist.alias("dist"))
    )
    w = Window.partitionBy("q_id").orderBy("dist", "doc_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PQS_K)
        .select("q_id", "doc_id", "dist", F.col("rk").cast("int").alias("rk"))
    )


MM21_SQL = f"""
    WITH ph AS ({MM17_SQL}),
    q AS (
        SELECT doc_id AS q_id, phash_hi AS q_hi, phash_lo AS q_lo
        FROM ph WHERE doc_id < {PQS_NQ}
    ),
    pairs AS (
        SELECT q.q_id, ph.doc_id,
               CAST(bit_count(xor(ph.phash_hi, q.q_hi))
                    + bit_count(xor(ph.phash_lo, q.q_lo)) AS INT) AS dist
        FROM ph, q WHERE ph.doc_id <> q.q_id
    )
    SELECT q_id, doc_id, dist, CAST(rk AS INT) AS rk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dist, doc_id) AS rk
        FROM pairs
    ) WHERE rk <= {PQS_K}
"""


# ---------------------------------------------------------------------------
# mm22: audio clip quality gate — the signal-hygiene screen an ASR/TTS
# curation pipeline runs BEFORE any model scorer: clipping (samples
# pinned near full scale ⇒ distorted recording), DC offset (bad mic /
# bias ⇒ wasted dynamic range), dynamic range (flat clips carry no
# speech), and the longest quiet run (dead air dominating the clip).
# All-integer over channel 0, so both engines compare exact int64s;
# the keep verdict is two strict integer cross-products (no ratios).
# Reference has no audio ops — LLM-pipeline scope.
# ---------------------------------------------------------------------------

AQ_CLIP_T = 1900   # |v| at/above this counts as clipped (fixture peak 2000)
AQ_QUIET_T = 150   # |v| below this counts as quiet (dead air)

AQ_SCHEMA = (
    "doc_id long, n_frames int, n_clipped int, dc_sum long, "
    "dyn_range int, longest_quiet int, is_kept int"
)


def _audio_quality_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: WAV parse, de-interleave channel 0, then
    numpy counts/extrema and mm18's run detection for the longest
    quiet stretch. Keep iff clipped samples stay under 1% of frames
    AND the longest quiet run stays under a quarter of the clip —
    both as exact integer cross-multiplications."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_audio_real(bytes(payload))
            s = np.asarray(m["samples"], dtype=np.int64)
            c0 = s[0 :: m["n_channels"]]
            nf = len(c0)
            n_clip = int((np.abs(c0) >= AQ_CLIP_T).sum())
            quiet = np.abs(c0) < AQ_QUIET_T
            longest = 0
            if quiet.any():
                idx = np.nonzero(quiet)[0]
                runs = np.split(idx, np.nonzero(np.diff(idx) != 1)[0] + 1)
                longest = max(len(r) for r in runs)
            kept = int(n_clip * 100 < nf and longest * 4 < nf)
            rows.append(
                (
                    doc_id, nf, n_clip, int(c0.sum()),
                    int(c0.max() - c0.min()), longest, kept,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "n_clipped", "dc_sum",
                "dyn_range", "longest_quiet", "is_kept",
            ],
        )


def mm22_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio clip quality gate over REAL decoded WAV: clipping count,
    DC-offset sum, dynamic range, longest quiet run, and the integer
    keep verdict. Scale shape: the mm-family narrow-map contract — one
    Arrow-batched Python stage over the fixture scan, one output row
    per clip, zero exchanges; scale by adding input splits. The oracle
    replays channel-0 extraction, thresholds, and the quiet-run
    gaps-and-islands in closed form from the fixture's sample formula."""
    wavs = _read_fixture(spark, _audio_fixture(sf_dir))
    return wavs.mapInPandas(_audio_quality_batches, schema=AQ_SCHEMA)


MM22_SQL = f"""
    WITH m AS (
        SELECT doc_id, 1 + (doc_id % 2) AS ch, (doc_id % 50) + 20 AS n_frames
        FROM documents
    ),
    c0 AS (
        SELECT doc_id, t.f AS f,
               ((doc_id * 37 + (t.f * ch) * 11) % 4001) - 2000 AS v
        FROM m, unnest(range(0, n_frames)) t(f)
    ),
    runs AS (
        SELECT doc_id, count(*) AS rl
        FROM (
            SELECT doc_id, f,
                   f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
            FROM c0 WHERE abs(v) < {AQ_QUIET_T}
        ) GROUP BY doc_id, grp
    ),
    lq AS (SELECT doc_id, max(rl) AS longest_quiet FROM runs GROUP BY doc_id),
    agg AS (
        SELECT doc_id,
               count(*) AS nf,
               sum(CASE WHEN abs(v) >= {AQ_CLIP_T} THEN 1 ELSE 0 END) AS n_clipped,
               sum(v) AS dc_sum,
               max(v) - min(v) AS dyn_range
        FROM c0 GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(nf AS INT) AS n_frames,
           CAST(n_clipped AS INT) AS n_clipped,
           CAST(dc_sum AS BIGINT) AS dc_sum,
           CAST(dyn_range AS INT) AS dyn_range,
           CAST(coalesce(lq.longest_quiet, 0) AS INT) AS longest_quiet,
           CAST(CASE WHEN n_clipped * 100 < nf
                      AND coalesce(lq.longest_quiet, 0) * 4 < nf
                     THEN 1 ELSE 0 END AS INT) AS is_kept
    FROM agg a LEFT JOIN lq USING (doc_id)
"""


# ---------------------------------------------------------------------------
# mm23: cross-video near-duplicate detection — the video-corpus analog
# of dd02/dd05: per-frame perceptual hashes (mm17's fixed-point DCT
# pHash over REAL decoded MJPEG frames), banded-Hamming candidate
# generation across videos (dd05/ss12's pigeonhole bands), and a
# per-video-pair matched-frame verdict. This is what catches
# re-encoded / brightness-shifted video copies that byte- or
# text-hash dedup (dd01's shape) can never see: the fixture's clone
# pairs are DIFFERENT JPEG bytes (a uniform chroma shift re-encoded)
# whose luma pHashes still collide because the DC term is dropped.
#
# Fixture (`mjpeg_clones_v4`): one AVI per doc; docs (2k, 2k+1) share
# base pattern k — same geometry and Y/Cr planes, the odd twin's Cb
# plane shifted +5 (mod-251 base keeps the shift wrap-free). A uniform
# chroma shift moves the decoded luma nearly uniformly, which lands in
# the dropped DC coefficient: measured at the fixture, clone frames
# hash at Hamming 0 (87% of frames; JPEG-quantization/clamp edge cases
# tail higher), unrelated frames at ~24 of 63.
# ---------------------------------------------------------------------------

MM23_T = 6  # frame-match Hamming threshold (measured: clone frames 99% <= 6, unrelated min 8, mean ~31)
MM23_MIN_FRAMES = 2  # minimum matched frames per side: one freak frame
# collision must never flag a pair (measured: every false positive at
# min=1 was a single-frame match on a 2-frame video)
VPHASH_SCHEMA = "doc_id long, frame_no int, phash_hi long, phash_lo long"


def _clone_mjpeg_fixture(sf_dir: str) -> str:
    """One MJPEG AVI per document with clone PAIRS: docs (2k, 2k+1)
    encode the same base-k pattern, the odd twin with a +5 Cb shift —
    real re-encoded near-duplicates, byte-distinct, perceptually equal."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.jpeg import encode_jpeg
    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out_dir = os.path.join(repo, ".scratch", scratch_key(sf_dir), "mjpeg_clones_v4")
    out_file = os.path.join(out_dir, "mjpeg_clones.parquet")
    if not os.path.exists(out_file):
        doc_ids = (
            pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id"])
            .column("doc_id")
            .to_pylist()
        )

        def planes(doc_id: int, frame_no: int, w: int, h: int):
            base = doc_id // 2
            cbd = (doc_id % 2) * 5
            # per-video gradient multipliers decorrelate the luma
            # STRUCTURE across videos (a shared gradient differs only
            # by a constant offset, which the dropped DC term erases —
            # measured: it left unrelated hashes clustered)
            gy, gx = 17 * (1 + base % 5), 29 * (1 + base % 7)
            bh, bw = (h + 7) // 8, (w + 7) // 8
            by, bx = np.meshgrid(np.arange(bh), np.arange(bw), indexing="ij")
            yv = (base * 37 + frame_no * 41 + by * gy + bx * gx) % 256
            cb = ((base * 19 + frame_no * 31 + by * 7 + bx * 11) % 251) + cbd
            cr = (base * 23 + frame_no * 43 + by * 13 + bx * 3) % 256
            ex = lambda p: np.repeat(np.repeat(p, 8, 0), 8, 1)[:h, :w].astype("uint8")  # noqa: E731
            return ex(yv), ex(cb), ex(cr)

        payloads = []
        for d in doc_ids:
            base = d // 2
            n_frames = (base % 4) + 2
            # 21..61 x 19..43 px (not multiples of 8): enough 8x8 blocks
            # per frame that the DCT carries structure — at the mm10
            # fixture's 8..16 px the hashes are degenerate and unrelated
            # frames collide at Hamming <= 8 (measured r14)
            w, h = (base % 6) * 8 + 21, (base % 4) * 8 + 19
            frames = [
                encode_jpeg(w, h, *planes(d, f, w, h)) for f in range(n_frames)
            ]
            payloads.append(encode_avi(w, h, frames))
        tbl = pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "payload": pa.array(payloads, pa.binary())}
        )
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_file + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(64, tbl.num_rows // 64))
        os.replace(tmp, out_file)
    return out_file


def _vphash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: AVI walk → decode every frame → the SHARED
    ``_phash_of_luma`` rules per frame (one implementation with mm17,
    keyed by (doc_id, frame_no))."""
    import numpy as np

    from ..functions.jpeg import decode_jpeg

    C = np.array(_PHASH_C, dtype=np.int64)
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            m = parse_avi_frames(payload)
            for f, (off, size) in enumerate(m["frames"]):
                img = decode_jpeg(payload[off : off + size])
                w, h = img["width"], img["height"]
                px = np.frombuffer(img["pixels"], dtype=np.uint8).astype(np.int64)
                luma = px.reshape(h, w, 3).sum(axis=2)
                _, hi, lo = _phash_of_luma(luma, C)
                rows.append((doc_id, f, hi, lo))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "phash_hi", "phash_lo"])


def _vphash_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame pHash frame persisted per (session, sf_dir): both
    sides of mm23's band join and the per-video frame counts read ONE
    decode pass (the mm21_phash lifecycle)."""
    from .dedup import _persisted

    def build(s: SparkSession, d: str) -> DataFrame:
        vids = _read_fixture(s, _clone_mjpeg_fixture(d))
        return vids.mapInPandas(_vphash_batches, schema=VPHASH_SCHEMA)

    return _persisted("mm23_vphash", spark, sf_dir, build)


def mm23_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video near-duplicate detection: per unordered video pair
    that shares at least one 8-bit pHash band AND a frame pair within
    Hamming ≤ {MM23_T}, the matched-frame counts on both sides and a
    majority verdict (``near_dup`` = at least half of EACH video's
    frames have a qualifying partner frame).

    Scale shape: one narrow Arrow decode+hash pass (persisted), then
    the dd05/ss12 machinery — frames explode to 8 pigeonhole bands
    of 8 bits (candidate generation COMPLETE for Hamming <= 7,
    covering the T={MM23_T} gate exactly),
    candidates come from the band equi-join (never all pairs), a
    multi-band match is kept only at its FIRST matching band so no
    distinct() shuffle is needed, the Hamming gate runs in codegen
    before any aggregation, and the pair agg is matched-pair-sized.
    All shuffle keys are small integers; verdict arithmetic is
    all-integer (2·matched ≥ n_frames)."""
    ph = _vphash_cached(spark, sf_dir)
    nf = ph.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("n_frames"))

    def bands(df: DataFrame, p: str) -> DataFrame:
        # 8 bands of 8 bits: the pigeonhole guarantee covers Hamming
        # <= 7 >= MM23_T, so band candidate generation is COMPLETE for
        # the advertised threshold (4x16-bit bands only guaranteed
        # <= 3 — a qualifying pair could hide its diffs in all four)
        keys = [
            F.shiftright("phash_hi", 8 * b).bitwiseAND(F.lit(255)) for b in range(4)
        ] + [
            F.shiftright("phash_lo", 8 * b).bitwiseAND(F.lit(255)) for b in range(4)
        ]
        return df.select(
            F.col("doc_id").alias(f"{p}_id"),
            F.col("frame_no").alias(f"{p}_f"),
            F.col("phash_hi").alias(f"{p}_hi"),
            F.col("phash_lo").alias(f"{p}_lo"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), k.alias("key"))
                        for b, k in enumerate(keys)
                    ]
                )
            ).alias("bk"),
        ).select(f"{p}_id", f"{p}_f", f"{p}_hi", f"{p}_lo", "bk.band", "bk.key")

    a, b = bands(ph, "a"), bands(ph, "b")

    def band_key(p: str, i: int):
        src = f"{p}_hi" if i < 4 else f"{p}_lo"
        return F.shiftright(src, 8 * (i % 4)).bitwiseAND(F.lit(255))

    first_match = F.lit(True)
    for i in range(7):
        first_match = first_match & (
            (F.col("band") <= F.lit(i)) | (band_key("a", i) != band_key("b", i))
        )
    cand = (
        a.join(b, ["band", "key"])
        .filter((F.col("a_id") < F.col("b_id")) & first_match)
        .withColumn(
            "hamming",
            F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
            + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo"))),
        )
        .filter(F.col("hamming") <= MM23_T)
    )
    # r17 (guide §2.3): two countDistinct over one grouping planned as an
    # Expand — every candidate row duplicated per distinct column before
    # the exchange. collect_set sizes compute the same two counts in ONE
    # ObjectHashAggregate pass (frame counts per video are bounded, so
    # the per-group sets stay tiny); frame numbers are never null, so
    # size(collect_set(x)) == countDistinct(x) exactly.
    pair = cand.groupBy("a_id", "b_id").agg(
        F.size(F.collect_set("a_f")).alias("matched_a"),
        F.size(F.collect_set("b_f")).alias("matched_b"),
    )
    nfa = nf.select(F.col("doc_id").alias("a_id"), F.col("n_frames").alias("n_frames_a"))
    nfb = nf.select(F.col("doc_id").alias("b_id"), F.col("n_frames").alias("n_frames_b"))
    return (
        pair.join(nfa, "a_id")
        .join(nfb, "b_id")
        .select(
            F.col("a_id").alias("vid_a"),
            F.col("b_id").alias("vid_b"),
            "n_frames_a",
            "n_frames_b",
            "matched_a",
            "matched_b",
            (
                (F.col("matched_a") * 2 >= F.col("n_frames_a"))
                & (F.col("matched_b") * 2 >= F.col("n_frames_b"))
                & (F.col("matched_a") >= MM23_MIN_FRAMES)
                & (F.col("matched_b") >= MM23_MIN_FRAMES)
            ).cast("int").alias("near_dup"),
        )
    )


def _mm23_sql() -> str:
    flat_c = ", ".join(str(c) for row in _PHASH_C for c in row)  # row-major [x][u]
    share = " OR ".join(
        f"(({side} >> {8 * (i % 4)}) & 255) = (({side.replace('a.', 'b.')} >> {8 * (i % 4)}) & 255)"
        for i, side in enumerate(["a.hi"] * 4 + ["a.lo"] * 4)
    )
    return f"""
    WITH dctc AS (
        SELECT t.i // {PHASH_G} AS x, t.i % {PHASH_G} AS u,
               ([{flat_c}])[t.i + 1] AS c
        FROM unnest(range(0, {PHASH_G * PHASH_G})) t(i)
    ),
    m AS (
        SELECT doc_id, doc_id // 2 AS base,
               ((doc_id // 2) % 4) + 2 AS n_frames,
               ((doc_id // 2) % 6) * 8 + 21 AS w,
               ((doc_id // 2) % 4) * 8 + 19 AS h,
               (doc_id % 2) * 5 AS cbd
        FROM documents
    ),
    fr AS (
        SELECT doc_id, base, cbd, w, h, CAST(t.f AS INT) AS frame_no
        FROM m, unnest(range(0, n_frames)) t(f)
    ),
    -- only the PHASH_G x PHASH_G SAMPLED pixels are ever computed (the
    -- grid's nearest-neighbor maps), not all w*h: one closed-form
    -- block-value + color-conversion evaluation per grid cell
    grid AS (
        SELECT doc_id, frame_no, x, y,
               least(greatest(floor(yv + 1.402 * (crv - 128) + 0.5), 0), 255)
             + least(greatest(floor(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5), 0), 255)
             + least(greatest(floor(yv + 1.772 * (cbv - 128) + 0.5), 0), 255) AS g
        FROM (
            SELECT f.doc_id, f.frame_no, x.x AS x, y.y AS y,
                   (base * 37 + frame_no * 41
                    + (((y.y * f.h) // {PHASH_G}) // 8) * 17 * (1 + base % 5)
                    + (((x.x * f.w) // {PHASH_G}) // 8) * 29 * (1 + base % 7)) % 256 AS yv,
                   ((base * 19 + frame_no * 31
                    + (((y.y * f.h) // {PHASH_G}) // 8) * 7
                    + (((x.x * f.w) // {PHASH_G}) // 8) * 11) % 251) + cbd AS cbv,
                   (base * 23 + frame_no * 43
                    + (((y.y * f.h) // {PHASH_G}) // 8) * 13
                    + (((x.x * f.w) // {PHASH_G}) // 8) * 3) % 256 AS crv
            FROM fr f,
                 unnest(range(0, {PHASH_G})) x(x),
                 unnest(range(0, {PHASH_G})) y(y)
        )
    ),
    m1 AS (
        SELECT grid.doc_id, grid.frame_no, d.u AS u, grid.y AS y, sum(grid.g * d.c) AS s
        FROM grid JOIN dctc d ON d.x = grid.x
        WHERE d.u < {PHASH_K}
        GROUP BY grid.doc_id, grid.frame_no, d.u, grid.y
    ),
    coef AS (
        SELECT m1.doc_id, m1.frame_no, m1.u AS u, d.u AS v, sum(m1.s * d.c) AS s
        FROM m1 JOIN dctc d ON d.x = m1.y
        WHERE d.u < {PHASH_K}
        GROUP BY m1.doc_id, m1.frame_no, m1.u, d.u
    ),
    ac AS (
        SELECT doc_id, frame_no, (v * {PHASH_K} + u) - 1 AS k, s
        FROM coef WHERE NOT (u = 0 AND v = 0)
    ),
    med AS (
        SELECT doc_id, frame_no, s AS median_ac FROM (
            SELECT doc_id, frame_no, s,
                   row_number() OVER (PARTITION BY doc_id, frame_no ORDER BY s ASC) AS rk
            FROM ac
        ) WHERE rk = {(PHASH_K * PHASH_K - 1 - 1) // 2 + 1}
    ),
    ph AS (
        SELECT a.doc_id, a.frame_no,
               CAST(sum(CASE WHEN a.k < 31 AND a.s > med.median_ac
                             THEN CAST(1 AS BIGINT) << a.k ELSE 0 END) AS BIGINT) AS hi,
               CAST(sum(CASE WHEN a.k >= 31 AND a.s > med.median_ac
                             THEN CAST(1 AS BIGINT) << (a.k - 31) ELSE 0 END) AS BIGINT) AS lo
        FROM ac a JOIN med ON a.doc_id = med.doc_id AND a.frame_no = med.frame_no
        GROUP BY a.doc_id, a.frame_no
    ),
    nf AS (SELECT doc_id, CAST(count(*) AS INT) AS n_frames FROM ph GROUP BY doc_id),
    cand AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.frame_no AS a_f, b.frame_no AS b_f,
               bit_count(CAST(xor(a.hi, b.hi) AS BIGINT))
             + bit_count(CAST(xor(a.lo, b.lo) AS BIGINT)) AS hamming
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id AND ({share})
    ),
    pair AS (
        SELECT a_id, b_id,
               CAST(count(DISTINCT a_f) AS INT) AS matched_a,
               CAST(count(DISTINCT b_f) AS INT) AS matched_b
        FROM cand WHERE hamming <= {MM23_T}
        GROUP BY a_id, b_id
    )
    SELECT a_id AS vid_a, b_id AS vid_b,
           na.n_frames AS n_frames_a, nb.n_frames AS n_frames_b,
           matched_a, matched_b,
           CAST(matched_a * 2 >= na.n_frames AND matched_b * 2 >= nb.n_frames
                AND matched_a >= {MM23_MIN_FRAMES} AND matched_b >= {MM23_MIN_FRAMES} AS INT) AS near_dup
    FROM pair
    JOIN nf na ON pair.a_id = na.doc_id
    JOIN nf nb ON pair.b_id = nb.doc_id
"""


MM23_SQL = _mm23_sql()


QUERIES = {
    "mm01_decode_stub": mm01_decode_stub,
    "mm02_frame_sample": mm02_frame_sample,
    "mm03_audio_window_stub": mm03_audio_window_stub,
    "mm04_resize_stub": mm04_resize_stub,
    "mm05_decode_image": mm05_decode_image,
    "mm06_decode_resize": mm06_decode_resize,
    "mm07_decode_audio": mm07_decode_audio,
    "mm08_video_frame_index": mm08_video_frame_index,
    "mm09_pair_curation": mm09_pair_curation,
    "mm10_video_frame_pixels": mm10_video_frame_pixels,
    "mm11_audio_features": mm11_audio_features,
    "mm12_image_dhash": mm12_image_dhash,
    "mm13_video_420_pixels": mm13_video_420_pixels,
    "mm14_audio_resample": mm14_audio_resample,
    "mm15_video_shot_detect": mm15_video_shot_detect,
    "mm16_image_entropy": mm16_image_entropy,
    "mm17_image_phash": mm17_image_phash,
    "mm18_audio_vad": mm18_audio_vad,
    "mm19_vit_patches": mm19_vit_patches,
    "mm20_audio_spectral": mm20_audio_spectral,
    "mm21_phash_search": mm21_phash_search,
    "mm22_audio_quality": mm22_audio_quality,
    "mm23_video_near_dup": mm23_video_near_dup,
}

# Operator-authored lineage through the mapInPandas barrier (see
# lineage.analyze ``declared``): every decode op carries doc_id through
# unchanged and derives its stats from payload.
DECLARED = {
    # keyed by the BARRIER's output names (the per-frame pHash frame);
    # vid_a/matched_*/near_dup derive from these downstream and resolve
    # by propagation with role 'declared'
    "mm23_video_near_dup": {
        "doc_id": ["doc_id"],
        "frame_no": ["doc_id", "payload"],
        "phash_hi": ["payload"],
        "phash_lo": ["payload"],
    },
    "mm01_decode_stub": {
        "doc_id": ["doc_id"], "n_bytes": ["payload"], "sha16": ["payload"],
        "width": ["payload"], "height": ["payload"],
    },
    "mm04_resize_stub": {
        "doc_id": ["doc_id"], "width": ["payload"], "height": ["payload"],
        "tgt_w": ["payload"], "tgt_h": ["payload"], "resized": ["payload"],
    },
    "mm05_decode_image": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "fmt", "width", "height", "n_pixels", "checksum", "sum_r", "sum_g", "sum_b"
        )},
    },
    "mm06_decode_resize": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "fmt", "width", "height", "tgt_w", "tgt_h", "resized",
            "checksum", "sum_r", "sum_g", "sum_b"
        )},
    },
    "mm07_decode_audio": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "n_channels", "rate", "n_frames", "peak", "sum_sq", "checksum", "sum_ch0"
        )},
    },
    "mm11_audio_features": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "n_windows", "zcr", "loud_window", "loud_energy", "win_checksum"
        )},
    },
    "mm12_image_dhash": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in ("width", "height", "dhash_hi", "dhash_lo")},
    },
    "mm17_image_phash": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "width", "height", "median_ac", "phash_hi", "phash_lo"
        )},
    },
    "mm18_audio_vad": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "seg_idx", "start_w", "end_w", "n_win", "seg_energy"
        )},
    },
    "mm19_vit_patches": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "py", "px", "luma_sum", "luma_min", "luma_max"
        )},
    },
    "mm20_audio_spectral": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in ("w", "p1", "p2", "p3", "p4", "dom")},
    },
    # mm21's barrier is mm17's mapInPandas: declarations attach at the
    # BARRIER's output names; the final q_id/dist/rk columns resolve
    # transitively through the downstream projections/joins.
    "mm21_phash_search": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "width", "height", "median_ac", "phash_hi", "phash_lo"
        )},
    },
    "mm22_audio_quality": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "n_frames", "n_clipped", "dc_sum", "dyn_range",
            "longest_quiet", "is_kept"
        )},
    },
    "mm16_image_entropy": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "width", "height", "n_bytes", "mode_bin", "mode_count", "entropy"
        )},
    },
    "mm08_video_frame_index": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "n_frames", "width", "height", "frame_no", "byte_offset", "n_bytes", "checksum"
        )},
    },
    "mm10_video_frame_pixels": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "n_frames", "width", "height", "frame_no",
            "n_pixels", "checksum", "sum_r", "sum_g", "sum_b"
        )},
    },
    "mm13_video_420_pixels": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "n_frames", "width", "height", "frame_no",
            "n_pixels", "checksum", "sum_r", "sum_g", "sum_b"
        )},
    },
    "mm14_audio_resample": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in (
            "rate_in", "rate_out", "n_in", "n_out",
            "peak_out", "sum_out", "checksum_out"
        )},
    },
    "mm15_video_shot_detect": {
        "doc_id": ["doc_id"],
        **{c: ["payload"] for c in ("frame_no", "abs_diff", "n_vals", "is_cut")},
    },
}

ORACLES = {
    "mm01_decode_stub": MM01_SQL,
    "mm02_frame_sample": MM02_SQL,
    "mm03_audio_window_stub": MM03_SQL,
    "mm04_resize_stub": MM04_SQL,
    "mm05_decode_image": MM05_SQL,
    "mm06_decode_resize": MM06_SQL,
    "mm07_decode_audio": MM07_SQL,
    "mm08_video_frame_index": MM08_SQL,
    "mm09_pair_curation": MM09_SQL,
    "mm10_video_frame_pixels": MM10_SQL,
    "mm11_audio_features": MM11_SQL,
    "mm12_image_dhash": MM12_SQL,
    "mm13_video_420_pixels": MM13_SQL,
    "mm14_audio_resample": MM14_SQL,
    "mm15_video_shot_detect": MM15_SQL,
    "mm16_image_entropy": MM16_SQL,
    "mm17_image_phash": MM17_SQL,
    "mm18_audio_vad": MM18_SQL,
    "mm19_vit_patches": MM19_SQL,
    "mm20_audio_spectral": MM20_SQL,
    "mm21_phash_search": MM21_SQL,
    "mm22_audio_quality": MM22_SQL,
    "mm23_video_near_dup": MM23_SQL,
}
