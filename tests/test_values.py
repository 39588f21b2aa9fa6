"""ValueParseUtil parity: the Column parsers in functions/values.py
against a literal Python transcription of the Java reference
(util/ValueParseUtil.java), over a fixture covering every branch and
the documented edge cases (zero vs positive, overflow, float32 unit
constants, cardinal rose, garbage)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from osm2world_spark.functions import values as V


# ---- literal transcription of ValueParseUtil.java (test oracle) ----

def _j_int(s):
    if not re.fullmatch(r"[+-]?\d+", s or ""):
        return None
    v = int(s)
    return v if -(2**31) <= v < 2**31 else None


def _j_decimal(s, constraint=None):
    v = _j_int(s)
    if v is None:
        m = re.fullmatch(r"(-?\d+)\.(\d+)", s or "")
        if m:
            before, after = _j_int(m.group(1)), _j_int(m.group(2))
            if before is not None and after is not None:
                v = abs(before) + 10.0 ** -len(m.group(2)) * after
                if m.group(1).startswith("-"):
                    v = -v
    if v is None:
        return None
    v = float(v)
    if constraint == "positive" and not v > 0:
        return None
    if constraint == "nonnegative" and not v >= 0:
        return None
    return v


def _j_speed(s):
    v = _j_decimal(s, "positive")
    if v is not None:
        return v
    m = re.fullmatch(r"(\d+)\s*km/h", s)
    if m and _j_int(m.group(1)) is not None:
        return float(_j_int(m.group(1)))
    m = re.fullmatch(r"(\d+)\s*mph", s)
    if m and _j_int(m.group(1)) is not None:
        return V.KM_PER_MILE * _j_int(m.group(1))
    return None


def _j_measure(s, factor=1.0):
    v = _j_decimal(s, "positive")
    if v is not None:
        return v * factor
    for pat, scale in ((r"([\d\.]+)\s*m", 1.0), (r"([\d\.]+)\s*km", 1000.0), (r"([\d\.]+)\s*mi", V.M_PER_MI)):
        m = re.fullmatch(pat, s)
        if m:
            inner = _j_decimal(m.group(1), "positive")
            return None if inner is None else scale * inner
    m = re.fullmatch(r"(\d+)'\s*(\d+)\"", s)
    if m:
        feet, inches = _j_int(m.group(1)), _j_int(m.group(2))
        if feet is not None and inches is not None and 0 <= inches < 12:
            return V.M_PER_INCH * (12 * feet + inches)
    return None


def _j_weight(s):
    v = _j_decimal(s, "positive")
    if v is not None:
        return v
    m = re.fullmatch(r"([\d\.]+)\s*t", s)
    return _j_decimal(m.group(1), "positive") if m else None


def _j_incline(s):
    m = re.fullmatch(r"(-?\d+(?:\.\d+)?)\s*%", s)
    return _j_decimal(m.group(1)) if m else None


_ROSE = dict(V._COMPASS)


def _j_angle(s):
    v = _j_decimal(s, "nonnegative")
    if v is not None:
        return math.fmod(v, 360.0)
    return _ROSE.get(s)


FIXTURE = [
    "50", "0", "-30", "+7", " 5", "3.5", "-12.30", "-0.0", "05.50",
    "2147483648", "1.99999999999", "..5", "5.",
    "5 km/h", "0 km/h", "50km/h", "30 mph", "30mph", "5 km/h extra",
    "3.5 m", "0.0 m", "2 km", "1.2.3 km", "10 mi", "7m", "7 t", "0 t",
    "5'11\"", "5' 11\"", "6'13\"", "0'0\"", "5'1\" tall",
    "-5.5 %", "10%", "10 %", "-0.0 %", "5 %%",
    "361", "725.5", "N", "NNE", "WSW", "NNW", "n", "NNEE", "X", "",
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(s,) for s in FIXTURE], ["raw"])
    rows = df.select(
        "raw",
        V.parse_int(F.col("raw")).alias("i"),
        V.parse_uint(F.col("raw")).alias("u"),
        V.parse_speed(F.col("raw")).alias("speed"),
        V.parse_measure(F.col("raw")).alias("measure"),
        V.parse_weight(F.col("raw")).alias("weight"),
        V.parse_incline(F.col("raw")).alias("incline"),
        V.parse_angle(F.col("raw")).alias("angle"),
    ).collect()
    return {r["raw"]: r for r in rows}


def test_int_uint(parsed):
    for s in FIXTURE:
        iv, uv = _j_int(s), _j_int(s)
        if uv is not None and uv < 0:
            uv = None
        assert parsed[s]["i"] == iv, s
        assert parsed[s]["u"] == uv, s


@pytest.mark.parametrize(
    "col,oracle",
    [
        ("speed", _j_speed),
        ("measure", _j_measure),
        ("weight", _j_weight),
        ("incline", _j_incline),
        ("angle", _j_angle),
    ],
)
def test_parsers_match_java_transcription(parsed, col, oracle):
    for s in FIXTURE:
        exp = oracle(s)
        got = parsed[s][col]
        if exp is None:
            assert got is None, (col, s, got)
        else:
            assert got == pytest.approx(exp, abs=0.0), (col, s, got, exp)


def test_branch_edge_values(parsed):
    # "0" is rejected by the POSITIVE unitless branch but "0 km/h"
    # parses through the unchecked km/h branch (reference :162-171)
    assert parsed["0"]["speed"] is None
    assert parsed["0 km/h"]["speed"] == 0.0
    # float32 unit constants, not their double cousins
    assert parsed["30 mph"]["speed"] == 30 * 1.6093440055847168
    assert parsed["5'11\""]["measure"] == 0.02539999969303608 * 71
    # inches >= 12 rejects the whole match
    assert parsed["6'13\""]["measure"] is None
    # "0.0 m" fails the inner POSITIVE check; "0'0\"" does not (:246-266)
    assert parsed["0.0 m"]["measure"] is None
    assert parsed["0'0\""]["measure"] == 0.0
    # overlong fraction overflows int32 -> null (reference int parse)
    assert parsed["1.99999999999"]["measure"] is None
    # angle wraps mod 360; cardinal rose is exact
    assert parsed["725.5"]["angle"] == pytest.approx(5.5, abs=0.0)
    assert parsed["WSW"]["angle"] == 247.5
    # Java parseInt does not trim — neither do we
    assert parsed[" 5"]["i"] is None


def _j_levels(s):
    """Literal transcription of parseLevels :443-483."""
    result = []
    for piece in re.sub(r"\s+", "", s).split(";"):
        m = re.fullmatch(r"(-?\d+)-(-?\d+)", piece)
        if m:
            a, b = _j_int(m.group(1)), _j_int(m.group(2))
            if a is None or b is None:
                continue  # NumberFormatException -> piece skipped
            result.extend(range(min(a, b), max(a, b) + 1))
        else:
            v = _j_int(piece)
            if v is not None:
                result.append(v)
    result = sorted(set(result))
    return result or None


LEVELS_FIXTURE = [
    "0", "3", "-2", "1-3", "4-2", "-5--2", "-5-10", "1;3;5", "1-3;5",
    "2; 4", " 1 - 3 ", "3-", "1-2-3", "4.5", "1;x;3", "x", "", "1;1;1",
    "99999999999-3",
]


def test_parse_levels(spark):
    df = spark.createDataFrame([(s,) for s in LEVELS_FIXTURE], ["raw"])
    got = {
        r["raw"]: r["v"]
        for r in df.select("raw", V.parse_levels(F.col("raw")).alias("v")).collect()
    }
    for s in LEVELS_FIXTURE:
        assert got[s] == _j_levels(s), (s, got[s], _j_levels(s))


def test_unitless_factor(spark):
    df = spark.createDataFrame([("2.5",), ("bad",)], ["raw"])
    got = {
        r["raw"]: r["v"]
        for r in df.select(
            "raw", V.parse_measure(F.col("raw"), unitless_factor=0.3048).alias("v")
        ).collect()
    }
    assert got["2.5"] == pytest.approx(2.5 * 0.3048, abs=0.0)
    assert got["bad"] is None


# ------------------------------------------------ random-corpus parity


def _random_corpus(n=1500):
    """Deterministic pseudo-random strings over the parsers' grammar
    fragments plus outright garbage — the fuzz companion to the
    branch-targeted FIXTURE above.  Seeded: failures reproduce."""
    import random

    rnd = random.Random(20260820)
    units = ["", " ", "km/h", " km/h", "mph", " mph", "m", " m",
             "km", " km", "mi", " mi", "t", " t", "%", " %", " x"]
    roses = ["N", "E", "S", "W", "NE", "SSW", "ESE", "NNEE", "n", "ne", ""]
    out = []
    for _ in range(n):
        k = rnd.random()
        if k < 0.55:
            sign = rnd.choice(["", "", "-", "+"])
            zeros = "0" * rnd.randrange(0, 2)
            digits = str(rnd.randrange(0, 10 ** rnd.randrange(1, 12)))
            frac = (
                "" if rnd.random() < 0.5
                else "." + "0" * rnd.randrange(0, 2)
                + str(rnd.randrange(0, 10 ** rnd.randrange(1, 12)))
            )
            out.append(sign + zeros + digits + frac + rnd.choice(units))
        elif k < 0.65:
            sp = " " if rnd.random() < 0.3 else ""
            out.append(f"{rnd.randrange(0, 9)}'{sp}{rnd.randrange(0, 15)}\"")
        elif k < 0.75:
            out.append(rnd.choice(roses))
        elif k < 0.85:
            pieces = [
                str(rnd.randrange(-9, 10))
                + ("-" + str(rnd.randrange(-9, 10)) if rnd.random() < 0.5 else "")
                for _ in range(rnd.randrange(1, 4))
            ]
            out.append(";".join(pieces))
        else:
            alphabet = " +-.0123456789kmht%'\"NSEWx/;"
            out.append("".join(rnd.choice(alphabet)
                               for _ in range(rnd.randrange(0, 10))))
    return out


def test_random_corpus_parity(spark):
    corpus = sorted(set(_random_corpus()))
    df = spark.createDataFrame([(s,) for s in corpus], ["raw"])
    rows = df.select(
        "raw",
        V.parse_int(F.col("raw")).alias("i"),
        V.parse_uint(F.col("raw")).alias("u"),
        V.parse_speed(F.col("raw")).alias("speed"),
        V.parse_measure(F.col("raw")).alias("measure"),
        V.parse_weight(F.col("raw")).alias("weight"),
        V.parse_incline(F.col("raw")).alias("incline"),
        V.parse_angle(F.col("raw")).alias("angle"),
        V.parse_levels(F.col("raw")).alias("levels"),
    ).collect()
    assert len(rows) == len(corpus)
    oracles = [
        ("speed", _j_speed), ("measure", _j_measure), ("weight", _j_weight),
        ("incline", _j_incline), ("angle", _j_angle),
    ]
    for r in rows:
        s = r["raw"]
        iv = _j_int(s)
        uv = iv if iv is None or iv >= 0 else None
        assert r["i"] == iv, ("int", s, r["i"], iv)
        assert r["u"] == uv, ("uint", s, r["u"], uv)
        for col, fn in oracles:
            exp = fn(s)
            if exp is None:
                assert r[col] is None, (col, s, r[col])
            else:
                assert r[col] == pytest.approx(exp, abs=0.0), (col, s, r[col], exp)
        assert r["levels"] == _j_levels(s), ("levels", s, r["levels"], _j_levels(s))
