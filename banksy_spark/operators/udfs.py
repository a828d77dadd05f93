"""Vectorized-UDF exemplars (SURVEY.md §2.8).

Policy: zero Python row UDFs in the core operator set. When Python is
genuinely needed, it is Arrow-batched — a ``pandas_udf`` for scalar
logic, ``mapInPandas`` for batch-shaped logic — never row-at-a-time.
These two are the engine's reference implementations of that pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _camel_split_point(text: str) -> int:
    """First index i>=1 whose char is uppercase and not preceded by a
    space — the reference's char walk (bovada_pull.py:105-118). 0 = no
    boundary."""
    for i in range(1, len(text)):
        if text[i].isupper() and (i == 1 or text[i - 1] != " "):
            return i
    return 0


_UDF_CACHE: dict[str, object] = {}


def _build_udfs() -> dict[str, object]:
    """pandas_udf twins of functions.text.camel_boundary_team_1/2 (the
    regex forms). Built lazily: Spark 4 resolves the active session when
    the decorator runs, so module-import-time construction breaks when
    Python workers re-import this module.

    The expression form is the hot path; these are the exemplar of
    Arrow-batched Python (tests assert the two agree)."""
    if _UDF_CACHE:
        return _UDF_CACHE

    @pandas_udf("string")
    def camel_team_1_udf(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            i = _camel_split_point(text)
            return text if i == 0 else text[:i]

        return s.map(one)

    @pandas_udf("string")
    def camel_team_2_udf(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            i = _camel_split_point(text)
            return text if i == 0 else text[i:]

        return s.map(one)

    _UDF_CACHE["t1"] = camel_team_1_udf
    _UDF_CACHE["t2"] = camel_team_2_udf
    return _UDF_CACHE


def camel_team_1(v: Column) -> Column:
    return _build_udfs()["t1"](v)


def camel_team_2(v: Column) -> Column:
    return _build_udfs()["t2"](v)


# --- multimodal decode plumbing -------------------------------------------

_MEDIA_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint, kind string"
)


def _decode_wav(payload: bytes) -> dict:
    """Stdlib WAV decode: header fields plus the mean absolute sample
    level of the PCM payload (numpy over the raw frame buffer — real
    signal math, no audio libs needed)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, samp_w, rate, n_frames = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        raw = w.readframes(n_frames)
    if samp_w == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif samp_w == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {samp_w} not supported")
    level = float(np.abs(x).mean()) if x.size else 0.0
    return {
        "kind": "audio", "width": rate, "height": n_ch,
        "n_frames": n_frames, "mean_level": level,
    }


def _decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6) decode: whitespace/comment-tolerant header parse,
    then numpy over the RGB plane for the mean level."""
    import numpy as np

    pos, tokens = 0, []
    while len(tokens) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic != b"P6" or maxval > 255:
        raise NotImplementedError("only 8-bit binary PPM (P6) supported")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return {
        "kind": "image", "width": w, "height": h, "n_frames": 1,
        "mean_level": float(px.mean()) / maxval if px.size else 0.0,
    }


def _decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bit BMP decode: BITMAPINFOHEADER via struct,
    4-byte row padding stripped with a numpy reshape."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP stream")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if hdr_sz < 40 or bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    rows = abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * rows, offset=data_off)
    px = px.reshape(rows, stride)[:, : w * 3]
    return {
        "kind": "image", "width": w, "height": rows, "n_frames": 1,
        "mean_level": float(px.mean()) / 255.0 if px.size else 0.0,
    }


def decode_media_real(payload: bytes) -> dict:
    """The real codec hook: container sniffing + pure-Python/numpy
    decoders for the formats decodable without native libraries (WAV
    via stdlib ``wave``, binary PPM, uncompressed 24-bit BMP — header
    parse AND pixel/sample statistics, not fakes). Formats that
    genuinely need native codecs in this container (JPEG/PNG/MP4/...)
    still raise — a production deployment plugs PIL/libav into the same
    dispatch, the Arrow plumbing above it is unchanged."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "media codec not available in this environment for this format"
    )


_DECODED_SCHEMA = (
    "doc_id bigint, kind string, width bigint, height bigint, "
    "n_frames bigint, mean_level double"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Real-decode stage over a binary ``payload`` column: the same
    two-stage ``mapInPandas`` Arrow plumbing as ``fake_decode_media``,
    but each batch row routes through ``decode_media_real``. The
    per-payload Python loop is the codec itself (decoders are
    numpy-vectorized internally); batches stream partition-by-partition
    with no collect."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [decode_media_real(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(recs)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "kind", "width", "height", "n_frames", "mean_level"]]

    return df.select("doc_id", "payload").mapInPandas(decode, _DECODED_SCHEMA)


def fake_decode_media(df: DataFrame) -> DataFrame:
    """Deterministic stand-in decoder over a binary `payload` column via
    ``mapInPandas`` — the Spark-side plumbing (binary column in Arrow
    batches, schema contract, per-batch vectorized compute) is real;
    only the codec math is fake (dimensions derived from byte length).

    Scale: batches stream through Python workers partition-by-partition;
    no collect, no per-row Python calls.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": n_bytes % 640,
                    "height": (n_bytes * 7) % 480,
                    "n_frames": n_bytes % 16,
                    "kind": pdf["doc_id"].map(lambda d: "image" if d % 2 == 0 else "audio"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode, _MEDIA_SCHEMA)


_RESIZED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint, "
    "kind string, out_w bigint, out_h bigint, sampled_frames string"
)


def resize_and_sample(decoded: DataFrame, max_side: int = 128, frame_step: int = 4) -> DataFrame:
    """Second Arrow stage of the multimodal pipeline: aspect-preserving
    resize (integer arithmetic so the oracle reproduces it) plus
    every-k-th frame sampling. Chained ``mapInPandas`` stages stream
    batch-to-batch with no shuffle between them — the shape a real
    decode→preprocess pipeline has at scale.

    Real pixel resampling is stubbed (no image libs in this container);
    the geometry math and frame index selection are the actual logic a
    resize stage computes before touching pixels.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].clip(lower=1)
            h = pdf["height"].clip(lower=1)
            long_side = w.where(w >= h, h)
            out_w = (w * max_side) // long_side
            out_h = (h * max_side) // long_side
            sampled = pdf["n_frames"].map(
                lambda n: ",".join(str(i) for i in range(0, int(n), frame_step))
            )
            out = pdf.copy()
            out["out_w"] = out_w.astype("int64")
            out["out_h"] = out_h.astype("int64")
            out["sampled_frames"] = sampled
            yield out

    return decoded.mapInPandas(stage, _RESIZED_SCHEMA)
