"""String/regex scalar functions (SURVEY.md §2.7 F1-F11, F19).

All pure Catalyst expressions. The reference does these with pandas
``.str`` ops and per-row Python (arbitrage_scanner.py:78-99,151-162;
bovada_pull.py:58-118); each maps to a built-in below.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extract_second_word(team: Column) -> Column:
    """If the value has ≥3 whitespace tokens, keep the first token, else
    the value unchanged (arbitrage_scanner.py:78-84 — strips rank
    prefixes like '3 Seattle Seahawks' one step at a time).

    The reference uses Python ``str.split()`` which collapses whitespace
    runs and drops empties, so split on ``\\s+`` after trimming (a
    literal single-space split would count empty tokens and diverge on
    inputs like ``'A  B'``).
    """
    toks = F.split(F.trim(team), r"\s+")
    return F.when(F.size(toks) >= 3, toks[0]).otherwise(team)


def right_of_first_space(v: Column) -> Column:
    """Everything after the first space, or the value if no space
    (arbitrage_scanner.py:155-160)."""
    pos = F.locate(" ", v)
    return F.when(pos > 0, F.substr(v, pos + F.lit(1))).otherwise(v)


def first_token(v: Column, sep: str = " ") -> Column:
    """First whitespace token (arbitrage_scanner.py:151 ``.str[0]``)."""
    return F.split(v, sep)[0]


def last_token(v: Column, sep: str = " ") -> Column:
    """Last whitespace token (bovada_pull.py:83-84,167 ``.str[-1]``)."""
    return F.element_at(F.split(v, sep), -1)


def blank_if_contains_any(v: Column, charset: str = "()OU") -> Column:
    """Blank the value if it contains any char of ``charset``
    (bovada_pull.py:172).

    Only non-alphanumerics are backslash-escaped: Java regex rejects
    escapes of letters that aren't named constructs (``\\O`` →
    PatternSyntaxException), while bare alphanumerics are always literal
    inside a character class.
    """
    klass = "[" + "".join(ch if ch.isalnum() else "\\" + ch for ch in charset) + "]"
    return F.when(v.rlike(klass), F.lit("")).otherwise(v)


def coerce_double(v: Column) -> Column:
    """pandas ``to_numeric(errors='coerce')`` parity: garbage → NULL
    (arbitrage_scanner.py:270-272,327-329). try_cast regardless of the
    session's ANSI flag."""
    return v.try_cast("double")


# --- CamelCase boundary split (bovada_pull.py:105-118, SURVEY F10) ---
# The reference walks characters in Python: the split point is the first
# index i>=1 whose char is uppercase and (i == 1 or text[i-1] != ' ').
# The alternation below encodes exactly that — `.` is the i==1 case,
# `.+?[^ ]` the general one (lazy ⇒ earliest boundary wins, like the
# reference's first-return). banksy_spark.operators.udfs keeps a
# pandas_udf twin of the char-walk as the vectorized-UDF exemplar, and
# tests assert the two agree.

_BOUNDARY = "^(.|.+?[^ ])(?=[A-Z])"


def camel_boundary_team_1(v: Column) -> Column:
    """Text before the first CamelCase boundary; whole value if no
    boundary (bovada_pull.py:105-110)."""
    hit = F.regexp_extract(v, _BOUNDARY, 1)
    return F.when(hit == "", v).otherwise(hit)


def camel_boundary_team_2(v: Column) -> Column:
    """Text from the first CamelCase boundary on; whole value if no
    boundary (bovada_pull.py:112-116 returns ``text`` unchanged)."""
    hit = F.regexp_extract(v, _BOUNDARY, 1)
    return F.when(hit == "", v).otherwise(F.substr(v, F.length(hit) + F.lit(1)))
