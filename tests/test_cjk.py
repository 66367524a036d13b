"""CJK/Korean measures: reference goldens, algorithm properties,
JVM-vs-pandas parity (functions/cjk.py; reference
silk-plugins-asian/.../CJKReadingDistance.scala,
KoreanPhonemeDistance.scala, KoreanTranslitDistance.scala + tests)."""

import math

import pytest
from pyspark.sql import functions as F

from silk_spark.functions.cjk import (
    CJK_JVM_DICT_MAX,
    cjk_reading_distance,
    cjk_reading_scalar,
    hangul_phonemes,
    ko_soundex,
    korean_phoneme_distance,
    korean_phoneme_scalar,
    korean_translit_distance,
)

# A 15-character readings fixture: rows of the PUBLIC Unicode Unihan
# database (kHangul / kKorean / kMandarin / kJapaneseKun / kJapaneseOn
# fields) for exactly the characters the reference's golden tests use
# (CJKReadingDistanceTest.scala:23-34). None = reading absent.
READINGS = {
    "祚": ("조", "CO", "zuò", "SAIWAI", "SO"),
    "胙": ("조", "CO", "zuò", "HIMOROGI", "SO SAKU"),
    "賈": ("가 고", "KA KO", "jiǎ", "AKINAU AKINAI URU", "KO"),
    "贾": (None, None, "jiǎ", None, None),
    "逵": ("규", "KYU", "kuí", "OUJI", "KI"),
    "岛": (None, None, "dǎo", None, None),
    "範": ("범", "PEM", "fàn", "NORI", "HAN"),
    "似": ("사", "SA", "shì", "NIRU", "JI"),
    "道": ("도", "TO", "dào", "MICHI IU MICHIBIKU", "DOU TOU"),
    "南": ("남", "NAM", "nán", "MINAMI", "NAN DAN"),
    "風": ("풍", "PHWUNG", "fēng", "KAZE", "FUU FU"),
    "川": ("천", "CHEN", "chuān", "KAWA", "SEN"),
    "島": ("도", "TO", "dǎo", "SHIMA", "TOU"),
    "芳": ("방", "PANG", "fāng", "KANBASHII KAORI", "HOU"),
    "子": ("자", "CA", "zi", "KO MI OTOKO", "SHI SU"),
}

# The reference's golden pairs (CJKReadingDistanceTest.scala:23-34).
CJK_GOLDENS = [
    ("贾逵", "贾逵", 0),
    ("川島芳子", "川島芳子", 0),
    ("祚", "胙", 2),
    ("賈逵", "贾岛", 9),
    ("賈逵", "賈範", 5),
    ("賈似道", "賈南風", 10),
]


def test_cjk_reading_scalar_goldens():
    for a, b, want in CJK_GOLDENS:
        assert cjk_reading_scalar(a, b, READINGS) == want, (a, b)
        assert cjk_reading_scalar(b, a, READINGS) == want, (b, a)


def test_cjk_reading_scalar_edges():
    # char missing from the dictionary is skipped entirely
    assert cjk_reading_scalar("祚X", "胙X", READINGS) == 2
    # base longer than the other: +5 per unmatched base position
    assert cjk_reading_scalar("川島芳子", "子", READINGS) == 15
    # spaces stripped before everything (evaluate() semantics)
    assert cjk_reading_scalar("祚 ", " 胙", READINGS) == 2


def test_cjk_reading_columns_parity(spark):
    rows = [(a, b) for a, b, _ in CJK_GOLDENS] + [("祚X", "胙X"), ("川島芳子", "子")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        "a",
        "b",
        cjk_reading_distance(F.col("a"), F.col("b"), READINGS).alias("jvm"),
        cjk_reading_distance(
            F.col("a"), F.col("b"), READINGS, jvm_max_entries=0
        ).alias("udf"),
    ).collect()
    for r in got:
        want = cjk_reading_scalar(r["a"], r["b"], READINGS)
        assert r["jvm"] == want, (r["a"], r["b"])
        assert r["udf"] == want, (r["a"], r["b"])


def test_cjk_jvm_path_is_pure_codegen(spark):
    df = spark.createDataFrame([("祚", "胙")], "a string, b string")
    plan = (
        df.select(cjk_reading_distance(F.col("a"), F.col("b"), READINGS))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(READINGS) <= CJK_JVM_DICT_MAX


def test_hangul_phonemes():
    assert hangul_phonemes("한") == "ㅎㅏㄴ"
    assert hangul_phonemes("글") == "ㄱㅡㄹ"
    assert hangul_phonemes("달") == "ㄷㅏㄹ"
    assert hangul_phonemes("가") == "ㄱㅏ"  # empty jongseong stripped
    assert hangul_phonemes("a한 b") == "aㅎㅏㄴb"  # passthrough + space strip


# The reference's own phoneme tests are @ignore-d because its level-0
# path compares against Array.toString garbage
# (KoreanPhonemeDistance.scala:74); these are the values those ignored
# tests expect (KoreanPhonemeDistanceTest.scala:24-37), which the
# intended algorithm — implemented here — reproduces.
PHONEME_GOLDENS = [
    ("한글", "한글", 0),
    ("세종대왕", "세종대왕", 0),
    ("달", "돌", 1),
    ("국수", "국시", 1),
    ("도토리묵", "도토리묵무침", 5),
    ("송편", "절편", 3),
]


def test_korean_phoneme_scalar_goldens():
    for a, b, want in PHONEME_GOLDENS:
        assert korean_phoneme_scalar(a, b) == want, (a, b)
        assert korean_phoneme_scalar(b, a) == want, (b, a)


def test_korean_phoneme_limit_guard():
    # evaluate() guard: length diff > ceil(limit/3) -> infinite
    assert korean_phoneme_scalar("가", "가나다라마", limit=3.0) == math.inf
    # within the guard the alignment search still runs
    assert korean_phoneme_scalar("도토리묵", "도토리묵무침", limit=6.0) == 5


def test_korean_phoneme_alignment_cap():
    with pytest.raises(ValueError, match="max_alignments"):
        korean_phoneme_scalar("가" * 40, "나" * 20, max_alignments=100)


def test_korean_phoneme_column(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in PHONEME_GOLDENS], "a string, b string"
    )
    got = {
        (r["a"], r["b"]): r["d"]
        for r in df.select(
            "a", "b", korean_phoneme_distance(F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    for a, b, want in PHONEME_GOLDENS:
        assert got[(a, b)] == want


def test_korean_translit(spark):
    df = spark.createDataFrame(
        [
            ("haneul", "ganeul"),  # reference golden: 1
            ("dotorimook", "dotorimoog"),  # both collapse to totorimook
            ("shinhanbank", "sinhanbank"),  # algorithm gives 1 (see module doc)
            ("a b", "ab"),  # space stripping
        ],
        "a string, b string",
    )
    got = df.select(
        korean_translit_distance(F.col("a"), F.col("b")).alias("d"),
        ko_soundex(F.col("a")).alias("sx"),
    ).collect()
    assert [r["d"] for r in got] == [1.0, 0.0, 1.0, 0.0]
    assert got[0]["sx"] == "haneur"
    # limit guard mirrors evaluate(): raw length diff > limit -> inf
    g = df.limit(1).select(
        korean_translit_distance(F.col("a"), F.lit("x"), limit=2).alias("d")
    ).collect()
    assert g[0]["d"] == math.inf


def test_registry_exposure():
    from silk_spark.functions.measures import MEASURES

    for name in ("koreanTranslitDistance", "koreanPhonemeDistance", "cjkReadingDistance"):
        assert name in MEASURES


# ---------------------------------------------------------------------------
# property tests (hypothesis): algebraic invariants of the scalars
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_hangul = st.text(
    alphabet=[chr(c) for c in range(0xAC00, 0xAC00 + 600)], min_size=0, max_size=6
)
# space-free: the reference orients by RAW length BEFORE stripping
# spaces (CJKReadingDistance.scala:38-47), so spaces can flip the
# comparison base and break symmetry — pinned separately below.
_cjk_chars = st.text(alphabet=list(READINGS) + ["X"], min_size=0, max_size=8)


@settings(max_examples=60, deadline=None)
@given(_hangul, _hangul)
def test_phoneme_symmetry_and_identity(a, b):
    # evaluate() orients by length, so the measure is symmetric by
    # construction; equal inputs are distance 0
    assert korean_phoneme_scalar(a, b) == korean_phoneme_scalar(b, a)
    assert korean_phoneme_scalar(a, a) == 0.0


@settings(max_examples=60, deadline=None)
@given(_hangul, _hangul)
def test_phoneme_zero_iff_space_stripped_equal(a, b):
    d = korean_phoneme_scalar(a, b)
    assert d >= 0
    if a.replace(" ", "") == b.replace(" ", ""):
        assert d == 0.0


@settings(max_examples=60, deadline=None)
@given(_cjk_chars, _cjk_chars)
def test_cjk_reading_symmetry_and_bounds(a, b):
    d = cjk_reading_scalar(a, b, READINGS)
    assert d == cjk_reading_scalar(b, a, READINGS)
    assert 0 <= d <= 5 * max(len(a), len(b), 1)
    assert cjk_reading_scalar(a, a, READINGS) == 0


def test_cjk_reading_orientation_quirk():
    """Reference fidelity pin: evaluate() picks the comparison base by
    RAW length (ties -> str2) before stripping spaces
    (CJKReadingDistance.scala:38-47), so a space can flip the base and
    the measure is NOT symmetric across padded inputs — '祚祚' vs
    '祚 ' bases on the stripped 1-char side (distance 0), while the
    swap bases on the 2-char side (+5 for the unmatched position)."""
    assert cjk_reading_scalar("祚祚", "祚 ", READINGS) == 0
    assert cjk_reading_scalar("祚 ", "祚祚", READINGS) == 5
