"""Unit tests for the pure-Python image codecs behind mm05/mm06 —
encoder→decoder round-trips across every fixture dimension combination
(so all BMP padding widths and all five PNG filter types are hit),
plus malformed-input rejection. Spark-free: these run in milliseconds.
"""

from __future__ import annotations

import pytest

from hive_lineage_spark.operators.multimodal import (
    _decode_png,
    _pixel_bytes,
    decode_image_real,
    encode_bmp,
    encode_png,
    encode_ppm,
)


@pytest.mark.parametrize("enc,fmt", [(encode_bmp, "bmp"), (encode_ppm, "ppm"), (encode_png, "png")])
def test_roundtrip_all_fixture_dims(enc, fmt):
    for d in range(91):  # covers all (d % 13, d % 7) combinations
        w, h = (d % 13) + 4, (d % 7) + 4
        rgb = _pixel_bytes(d, w, h)
        m = decode_image_real(enc(w, h, rgb))
        assert (m["fmt"], m["width"], m["height"]) == (fmt, w, h)
        assert m["pixels"] == rgb


def test_png_bad_crc_rejected():
    payload = bytearray(encode_png(5, 4, _pixel_bytes(3, 5, 4)))
    payload[20] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(payload))


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff\xe0 not decodable jpeg")
