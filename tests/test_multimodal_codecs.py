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


def test_wav_roundtrip_mono_and_stereo():
    from hive_lineage_spark.operators.multimodal import (
        AUDIO_RATE,
        _sample_vals,
        decode_audio_real,
        encode_wav,
    )

    for d in range(40):
        ch = 1 + (d % 2)
        n_frames = (d % 50) + 20
        vals = _sample_vals(d, n_frames * ch)
        m = decode_audio_real(encode_wav(ch, AUDIO_RATE, vals))
        assert (m["fmt"], m["n_channels"], m["rate"]) == ("wav", ch, AUDIO_RATE)
        assert m["samples"] == vals


def test_wav_unknown_format_raises():
    from hive_lineage_spark.operators.multimodal import decode_audio_real

    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3\x04 not decodable mp3 bytes")


def test_avi_container_walk():
    from hive_lineage_spark.operators.multimodal import (
        _frame_bytes,
        encode_avi,
        parse_avi_frames,
    )

    for d in range(24):
        n_frames, fsize = (d % 12) + 3, (d % 9) + 5
        frames = [_frame_bytes(d, f, fsize) for f in range(n_frames)]
        payload = encode_avi((d % 13) + 4, (d % 7) + 4, frames)
        m = parse_avi_frames(payload)
        assert m["fmt"] == "avi" and len(m["frames"]) == n_frames
        for f, (off, size) in enumerate(m["frames"]):
            assert payload[off : off + size] == frames[f]


def test_avi_frame_count_mismatch_rejected():
    import struct

    from hive_lineage_spark.operators.multimodal import (
        _frame_bytes,
        encode_avi,
        parse_avi_frames,
    )

    payload = bytearray(encode_avi(4, 4, [_frame_bytes(1, f, 6) for f in range(4)]))
    # lie about dwTotalFrames (offset: 12 RIFF + 8 LIST + 4 'hdrl' + 8
    # chunk header + 16 into avih)
    struct.pack_into("<I", payload, 12 + 8 + 4 + 8 + 16, 99)
    with pytest.raises(ValueError, match="declares"):
        parse_avi_frames(bytes(payload))


def test_non_avi_video_raises():
    from hive_lineage_spark.operators.multimodal import parse_avi_frames

    with pytest.raises(NotImplementedError):
        parse_avi_frames(b"\x00\x00\x00 ftypisom not parseable mp4")
