"""Scalar-function parity tests vs the reference's Python semantics
(arbitrage_scanner.py / bovada_pull.py, re-implemented inline as the
spec — pandas/pure-Python is the reference's semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from banksy_spark.functions.odds import (
    american_to_decimal,
    normalize_even_odds,
    sign_prefix,
)
from banksy_spark.functions.text import (
    blank_if_contains_any,
    camel_boundary_team_1,
    camel_boundary_team_2,
    extract_second_word,
)


def _run(spark, values, col_fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


def test_american_to_decimal(spark):
    # reference custom_formula (arbitrage_scanner.py:360-366)
    vals = [150.0, -200.0, 0.0, 100.0, -100.0]
    expected = [2.5, 1.5, 1.0, 2.0, 2.0]
    assert _run(spark, vals, american_to_decimal, "double") == expected


def test_sign_prefix(spark):
    vals = [150, -110, 0]
    assert _run(spark, vals, sign_prefix, "int") == ["+150", "-110", "0"]


def test_normalize_even_odds_exact_spellings(spark):
    # bovada_pull.py:152-154: only 'EVEN' and 'even' are replaced
    vals = ["EVEN", "even", "Even", "+120"]
    assert _run(spark, vals, normalize_even_odds) == ["+100", "+100", "Even", "+120"]


def test_blank_if_contains_any_default_charset(spark):
    # ADVICE r1: the default '()OU' charset must not produce illegal
    # Java regex escapes (\O, \U)
    vals = ["o47.5 (-105)", "plain", "OVER", "U", "-3.5 -110"]
    out = _run(spark, vals, blank_if_contains_any)
    assert out == ["", "plain", "", "", "-3.5 -110"]


def test_extract_second_word_whitespace_runs(spark):
    # reference uses str.split() (collapses runs); 'A  B' has 2 tokens
    def ref(text):  # arbitrage_scanner.py:78-84
        words = text.split()
        return words[0] if len(words) >= 3 else text

    vals = ["3 Seattle Seahawks", "A  B", "one two", "single", "a b c d"]
    assert _run(spark, vals, extract_second_word) == [ref(v) for v in vals]


def _ref_camel_split(text):
    # bovada_pull.py:105-118 char walk
    for i in range(1, len(text)):
        if text[i].isupper() and (i == 1 or text[i - 1] != " "):
            return text[:i], text[i:]
    return text, text


CAMEL_CASES = [
    "SeahawksCardinals",
    "Red SoxYankees",
    "AB",
    "lowercase",
    "X",
    "McGee HawksJazz",
]


def test_camel_split_regex_matches_reference(spark):
    t1 = _run(spark, CAMEL_CASES, camel_boundary_team_1)
    t2 = _run(spark, CAMEL_CASES, camel_boundary_team_2)
    for v, a, b in zip(CAMEL_CASES, t1, t2):
        ra, rb = _ref_camel_split(v)
        assert (a, b) == (ra, rb), v


def test_camel_split_pandas_udf_twin_agrees(spark):
    from banksy_spark.operators.udfs import camel_team_1, camel_team_2

    df = spark.createDataFrame([(v,) for v in CAMEL_CASES], "v string")
    rows = df.select(
        camel_boundary_team_1(F.col("v")).alias("r1"),
        camel_team_1(F.col("v")).alias("u1"),
        camel_boundary_team_2(F.col("v")).alias("r2"),
        camel_team_2(F.col("v")).alias("u2"),
    ).collect()
    for r in rows:
        assert r.r1 == r.u1
        assert r.r2 == r.u2


def test_multimodal_binary_path_on_real_nonutf8_parquet(spark, tmp_path):
    """A parquet file with a TRUE binary column — invalid-UTF8 byte
    sequences included — flows through both mapInPandas stages intact:
    the Arrow transfer must hand Python raw bytes, never strings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from banksy_spark.operators.udfs import fake_decode_media, resize_and_sample

    payloads = [
        b"\xff\xfe\x00\x01" * 20,          # UTF-16 BOM + NULs: invalid UTF-8
        b"\x80\x81\x82",                   # bare continuation bytes
        bytes(range(256)),                 # every byte value once
    ]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    path = tmp_path / "media.parquet"
    pq.write_table(tbl, path)

    df = spark.read.parquet(str(path))
    assert dict(df.dtypes)["payload"] == "binary"
    out = {r.doc_id: r for r in resize_and_sample(fake_decode_media(df)).collect()}
    assert out[0].n_bytes == 80 and out[0].kind == "image"
    assert out[1].n_bytes == 3 and out[1].kind == "audio"
    assert out[2].n_bytes == 256
    # geometry on the every-byte row: w=256, h=(256*7)%480=352 → long
    # side h scales to 128, w to 256*128//352 = 93
    assert (out[2].out_w, out[2].out_h) == (93, 128)


def test_binary_payload_is_genuinely_non_utf8(spark):
    """The suite's synthetic payload (sha256-digest bytes) must not be
    decodable as UTF-8 for at least some docs — otherwise the binary
    column is text in disguise and the test proves nothing."""
    from banksy_spark.suite.llm import binary_payload

    df = spark.createDataFrame(
        [(i, f"document number {i} body") for i in range(20)], "doc_id long, text string"
    ).select("doc_id", binary_payload().alias("payload"))
    rows = df.collect()
    lens = {len(r.payload) for r in rows}
    assert lens <= {32, 64, 96, 128, 160} and len(lens) > 1  # variable length
    bad = 0
    for r in rows:
        try:
            r.payload.decode("utf-8")
        except UnicodeDecodeError:
            bad += 1
    assert bad > 0
