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


def decode_media_real(payload: bytes) -> dict:
    """The real codec hook. Image/audio libraries are not available in
    this container; a production deployment would decode here (PIL /
    libav via a Pandas UDF over the same binary column)."""
    raise NotImplementedError("media codecs not available in this environment")


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
