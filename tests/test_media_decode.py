"""Real media decode path (operators/udfs.py): pure-Python WAV / PPM /
BMP decoders behind the codec dispatch, driven end-to-end through the
``mapInPandas`` Arrow stage on generated fixtures. The
NotImplementedError branch remains only for formats that genuinely
need native codecs (JPEG et al.).
"""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from banksy_spark.operators.udfs import decode_media, decode_media_real


def _wav_bytes(rate=8000, n=800, channels=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * channels,
                *([int(16383 * math.sin(2 * math.pi * 440 * i / rate))] * channels),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _ppm_bytes(w=6, h=4, val=120) -> bytes:
    return (f"P6\n# comment\n{w} {h}\n255\n").encode() + bytes([val]) * (w * h * 3)


def _bmp_bytes(w=5, h=3, val=200) -> bytes:
    stride = (w * 3 + 3) & ~3
    img = (bytes([val]) * (w * 3) + b"\x00" * (stride - w * 3)) * h
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(img), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return header + info + img


def test_wav_decode_fields_and_level():
    d = decode_media_real(_wav_bytes())
    assert d["kind"] == "audio"
    assert d["width"] == 8000 and d["height"] == 1 and d["n_frames"] == 800
    # mean |sin| at amplitude 0.5 ≈ 2/pi * 0.5 ≈ 0.318
    assert 0.25 < d["mean_level"] < 0.40


def test_ppm_decode_exact():
    d = decode_media_real(_ppm_bytes())
    assert d == {
        "kind": "image", "width": 6, "height": 4, "n_frames": 1,
        "mean_level": 120 / 255,
    }


def test_bmp_decode_strips_row_padding():
    d = decode_media_real(_bmp_bytes())
    assert d["kind"] == "image" and (d["width"], d["height"]) == (5, 3)
    assert d["mean_level"] == 200 / 255  # padding bytes must not leak in


def test_unknown_format_still_gated():
    with pytest.raises(NotImplementedError):
        decode_media_real(b"\x89PNG\r\n\x1a\nxxxx")


def test_decode_media_distributed_stage(spark):
    rows = [
        (1, bytearray(_wav_bytes())),
        (2, bytearray(_ppm_bytes())),
        (3, bytearray(_bmp_bytes())),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary").repartition(3)
    got = {r["doc_id"]: r.asDict() for r in decode_media(df).collect()}
    assert got[1]["kind"] == "audio" and got[1]["n_frames"] == 800
    assert got[2]["width"] == 6 and got[2]["mean_level"] == pytest.approx(120 / 255)
    assert got[3]["height"] == 3 and got[3]["mean_level"] == pytest.approx(200 / 255)
