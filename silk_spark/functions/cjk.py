"""CJK / Korean distance measures (pure algorithms, no external libs).

Re-expression of the reference's silk-plugins-asian catalog
(/root/reference/silk-plugins/silk-plugins-asian/src/main/scala/org/
silkframework/rule/plugins/distance/asian/KoreanTranslitDistance.scala:28-122,
KoreanPhonemeDistance.scala:31-307, CJKReadingDistance.scala:30-181).
The round-4 survey scoped these out as "libs absent", but none of the
three actually needs an external library: the Korean measures are pure
Hangul Unicode arithmetic (syllable -> jamo decomposition is defined by
the Unicode standard, U+AC00 block algebra), and the CJK reading
measure is a dictionary lookup whose dictionary — per-character
hangul/korean/mandarin/kun/on readings — is an export of the PUBLIC
Unicode Unihan database (unicode.org/charts/unihan.html) supplied by
the caller as a parameter.

Spark-first shapes:

* ``korean_translit_distance`` is a pure JVM Column (translate +
  levenshtein — whole-stage codegen, zero Python).
* ``cjk_reading_distance`` auto-selects between a pure Column
  expression (literal ``map<string,array<string>>`` + higher-order
  functions) for small dictionaries and an Arrow-batched pandas UDF
  with the dictionary captured in the closure for the full ~90k-entry
  Unihan export — the same inline-or-broadcast policy the IVF
  assignment uses (operators/similarity.py). Both paths are
  parity-pinned in tests/test_cjk.py.
* ``korean_phoneme_distance`` is an Arrow-batched pandas UDF: the
  blank-alignment search is inherently iterative (same precedent as
  jaro in measures.py). Its alignment fan-out is C(len, level), so a
  ``max_alignments`` cap turns the adversarial-input failure mode into
  a clear error instead of an OOM (same policy as the RDF pivot
  vocabulary cap in sources/rdf.py).

Reference-fidelity notes (documented divergences, both on the side of
the reference's own *intended* semantics):

* KoreanPhonemeDistance.scala:74 builds the level-0 alignment row via
  ``sh_chAr.toString()`` — Scala's ``Array[Char].toString`` yields
  ``"[C@<hash>"``, so equal-length inputs compare against garbage;
  the reference's own tests are ``ignore``-d as "not working yet"
  (KoreanPhonemeDistanceTest.scala:24-37). This implementation aligns
  level-0 inputs directly and reproduces every expected value in
  those ignored tests (달/돌=1, 국수/국시=1, 도토리묵/도토리묵무침=5,
  송편/절편=3).
* KoreanTranslitDistanceTest.scala:24-28 ``ignore``-s an expectation
  of 0 for shinhanbank/sinhanbank; the published algorithm (g->k,
  d->t, b->p, l->r, then levenshtein) gives 1 — this implementation
  follows the algorithm, not the abandoned expectation.
* cjkReadingDistance orients by RAW length BEFORE stripping spaces
  (CJKReadingDistance.scala:38-47), so space padding can flip the
  comparison base and break symmetry; reproduced faithfully and
  pinned in tests/test_cjk.py::test_cjk_reading_orientation_quirk.
"""

from __future__ import annotations

from itertools import combinations
from math import comb, inf

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# ---------------------------------------------------------------------------
# Hangul jamo decomposition (Unicode standard syllable algebra)
# ---------------------------------------------------------------------------

# KoreanPhonemeDistance.scala:183-197 — the standard Unicode jamo
# tables (19 choseong, 21 jungseong, 28 jongseong; jongseong index 0
# means "no final consonant").
_CHOSEONG = "ㄱㄲㄴㄷㄸㄹㅁㅂㅃㅅㅆㅇㅈㅉㅊㅋㅌㅍㅎ"
_JUNGSEONG = "ㅏㅐㅑㅒㅓㅔㅕㅖㅗㅘㅙㅚㅛㅜㅝㅞㅟㅠㅡㅢㅣ"
_JONGSEONG = " ㄱㄲㄳㄴㄵㄶㄷㄹㄺㄻㄼㄽㄾㄿㅀㅁㅂㅄㅅㅆㅇㅈㅊㅋㅌㅍㅎ"

_HANGUL_BASE, _HANGUL_END = 0xAC00, 0xD7A3


def hangul_phonemes(value: str) -> str:
    """Decompose Hangul syllables into their jamo phoneme string
    (KoreanPhonemeDistance.scala:181-213): U+AC00-block arithmetic,
    non-Hangul characters pass through, spaces are stripped last (the
    stripping also removes the empty-jongseong sentinel)."""
    out = []
    for ch in value:
        o = ord(ch)
        if _HANGUL_BASE <= o <= _HANGUL_END:
            u = o - _HANGUL_BASE
            jong = u % 28
            jung = (u // 28) % 21
            cho = u // 28 // 21
            out.append(_CHOSEONG[cho] + _JUNGSEONG[jung] + _JONGSEONG[jong])
        else:
            out.append(ch)
    return "".join(out).replace(" ", "")


def _lev(a: str, b: str) -> int:
    """Two-row levenshtein for the short per-syllable phoneme strings."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[len(a)]


# ---------------------------------------------------------------------------
# koreanPhonemeDistance (KoreanPhonemeDistance.scala:31-123)
# ---------------------------------------------------------------------------

# The alignment blank is the reference's Array[Char] default '\x00'
# (buildShStrLongMatrix leaves unset cells at NUL); getKoreanPhonemes
# passes it through, so its phoneme string is the 1-char NUL.
_BLANK = "\x00"


def korean_phoneme_scalar(
    s1: str, s2: str, limit: float = inf, max_alignments: int = 20000
) -> float:
    """Korean phoneme distance of one pair
    (KoreanPhonemeDistance.scala:34-123): the shorter string is
    aligned into the longer at every C(len, level) blank placement;
    per position the levenshtein of the two syllables' jamo strings is
    taken; an alignment scores 0 when all positions match, else
    ``(mismatched_positions - 1) * 3 + min_nonzero_position_distance``
    (a whole extra syllable costs a full 3-phoneme edit); the result
    is the minimum over alignments. The length guard mirrors
    evaluate(): more than ceil(limit/3) length difference (on the
    original, space-included strings) is immediately infinite."""
    if limit != inf:
        qu = int(limit // 3)
        th = qu if limit % 3 == 0 else qu + 1
        if abs(len(s1) - len(s2)) > th:
            return inf
    lo, sh = (s1, s2) if len(s1) > len(s2) else (s2, s1)
    lo = lo.replace(" ", "")
    sh = sh.replace(" ", "")
    n, level = len(lo), len(lo) - len(sh)
    if n == 0:
        return 0.0
    n_align = comb(n, level)
    if n_align > max_alignments:
        raise ValueError(
            f"koreanPhonemeDistance alignment fan-out C({n},{level}) = "
            f"{n_align} exceeds max_alignments={max_alignments}; raise the "
            "cap explicitly or pre-filter by length difference"
        )
    phon_lo = [hangul_phonemes(c) for c in lo]
    phon_sh = [hangul_phonemes(c) for c in sh]
    blank_d = [_lev(p, _BLANK) for p in phon_lo]
    best = inf
    for blanks in combinations(range(n), level):
        bset = set(blanks)
        zcnt = 0
        min_pd = inf
        k = 0
        for j in range(n):
            if j in bset:
                d = blank_d[j]
            else:
                d = _lev(phon_lo[j], phon_sh[k])
                k += 1
            if d == 0:
                zcnt += 1
            elif d < min_pd:
                min_pd = d
        sd = n - zcnt
        kpd = 0.0 if sd == 0 else (sd - 1) * 3 + min_pd
        if kpd < best:
            best = kpd
    return float(best)


def korean_phoneme_distance(
    a: Column, b: Column, limit: float = inf, max_alignments: int = 20000
) -> Column:
    """Column form of koreanPhonemeDistance: Arrow-batched pandas UDF
    (the alignment search has no Column form; jaro precedent)."""

    @pandas_udf(DoubleType())
    def _udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                korean_phoneme_scalar(x, y, limit, max_alignments)
                if x is not None and y is not None
                else None
                for x, y in zip(s1, s2)
            ]
        )

    return _udf(a, b)


# ---------------------------------------------------------------------------
# koreanTranslitDistance (KoreanTranslitDistance.scala:28-122)
# ---------------------------------------------------------------------------


def ko_soundex(col: Column) -> Column:
    """The reference's one-pass transliteration collapse
    (KoreanTranslitDistance.scala:108-122): lowercase, g->k d->t b->p
    l->r, strip spaces. Pure JVM (translate + regexp_replace)."""
    return F.regexp_replace(F.translate(F.lower(col), "gdbl", "ktpr"), " ", "")


def korean_translit_distance(a: Column, b: Column, limit: float | None = None) -> Column:
    """Levenshtein over ko_soundex forms (KoreanTranslitDistance.scala:32-37).
    With a finite ``limit`` the reference short-circuits to infinity
    when the raw length difference exceeds it."""
    d = F.levenshtein(ko_soundex(a), ko_soundex(b)).cast("double")
    if limit is None:
        return d
    return F.when(
        F.abs(F.length(a) - F.length(b)) > F.lit(float(limit)), F.lit(float("inf"))
    ).otherwise(d)


# ---------------------------------------------------------------------------
# cjkReadingDistance (CJKReadingDistance.scala:30-181)
# ---------------------------------------------------------------------------

# Readings dict: char -> (hangul, korean, mandarin, japanese_kun,
# japanese_on), None for an absent reading — the five per-character
# fields of a public Unihan export (the reference loads the same shape
# from its unihanProperties.tsv resource, CJKReadingDistance.scala:48-55).
_N_READINGS = 5


def load_unihan_readings(path: str) -> dict[str, tuple]:
    """Parse a Unihan readings TSV export: ``U+XXXX <tab> U+XXXX <tab>
    hangul <tab> korean <tab> mandarin <tab> kun <tab> on`` with the
    literal string ``null`` for absent readings (the reference's
    resource format, CJKReadingDistance.scala:48-55)."""
    readings: dict[str, tuple] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2 or not parts[0].startswith("U+"):
                continue
            ch = chr(int(parts[0][2:], 16))
            vals = parts[2:2 + _N_READINGS]
            vals += ["null"] * (_N_READINGS - len(vals))
            readings[ch] = tuple(None if v == "null" else v for v in vals)
    return readings


def cjk_reading_scalar(s1: str, s2: str, readings: dict[str, tuple]) -> int:
    """CJK reading distance of one pair (CJKReadingDistance.scala:33-180):
    strings are space-stripped, the longer becomes the comparison
    base, both are REVERSED (CJK names share surname prefixes, so the
    tail-aligned compare weights given-name characters), and per
    position each of the five readings contributes +1 unless the base
    character's reading exists and equals the other's. Characters
    missing from the dictionary are skipped entirely; base positions
    beyond the shorter string cost the full 5."""
    lo, sh = (s1, s2) if len(s1) > len(s2) else (s2, s1)
    lo = lo.replace(" ", "")
    sh = sh.replace(" ", "")
    if lo == sh:
        return 0
    rlo, rsh = lo[::-1], sh[::-1]
    dist = 0
    for i, lc in enumerate(rlo):
        left = readings.get(lc)
        if left is None:
            continue
        if i >= len(rsh):
            dist += _N_READINGS
            continue
        rc = rsh[i]
        right = readings.get(rc)
        if right is None or lc == rc:
            continue
        for f in range(_N_READINGS):
            lv = left[f]
            if lv is None or right[f] != lv:
                dist += 1
    return dist


# Above this many dictionary entries the literal-map Column expression
# would bloat the plan (same class of cliff as the IVF inlined
# centroids, similarity.py:33); switch to the closure-captured pandas
# UDF, which ships the dict once per executor via Arrow task binaries.
CJK_JVM_DICT_MAX = 256


def _reading_arrays(readings: dict[str, tuple]):
    """Map entries as (char-literal, array<string>-literal) pairs with
    the reference's 'null' sentinel restored (HOF lambdas then compare
    strings without null-vs-absent ambiguity)."""
    pairs = []
    for ch, vals in sorted(readings.items()):
        pairs.append(F.lit(ch))
        pairs.append(F.array(*[F.lit(v if v is not None else "null") for v in vals]))
    return pairs


def _cjk_reading_expr(a: Column, b: Column, readings: dict[str, tuple]) -> Column:
    """Pure-Column cjkReadingDistance for small dictionaries: a literal
    map<string,array<string>> plus higher-order functions — the whole
    comparison stays in whole-stage codegen."""
    m = F.create_map(*_reading_arrays(readings))
    sa = F.regexp_replace(a, " ", "")
    sb = F.regexp_replace(b, " ", "")
    lo = F.when(F.length(sa) > F.length(sb), sa).otherwise(sb)
    sh = F.when(F.length(sa) > F.length(sb), sb).otherwise(sa)
    rlo, rsh = F.reverse(lo), F.reverse(sh)
    n_sh = F.length(rsh)

    def per_pos(i):
        lc = rlo.substr(i + 1, F.lit(1))  # HOF index is 0-based; substr 1-based
        rc = rsh.substr(i + 1, F.lit(1))
        left = m[lc]
        right = m[rc]
        field_cost = F.aggregate(
            F.zip_with(
                left,
                right,
                lambda lv, rv: ((lv == F.lit("null")) | (lv != rv)).cast("int"),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        return (
            F.when(left.isNull(), F.lit(0))
            .when(i >= n_sh, F.lit(_N_READINGS))
            .when(right.isNull() | (lc == rc), F.lit(0))
            .otherwise(field_cost)
        )

    total = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.length(rlo) - 1), per_pos),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(lo == sh, F.lit(0)).otherwise(total)


def cjk_reading_distance(
    a: Column,
    b: Column,
    readings: dict[str, tuple],
    jvm_max_entries: int = CJK_JVM_DICT_MAX,
) -> Column:
    """cjkReadingDistance as a Column: literal-map JVM expression when
    the dictionary is small enough to inline, else an Arrow-batched
    pandas UDF capturing the dictionary in its closure (pickled once
    per executor). Paths are parity-pinned in tests/test_cjk.py."""
    if len(readings) <= jvm_max_entries:
        return _cjk_reading_expr(a, b, readings)

    @pandas_udf(DoubleType())
    def _udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                float(cjk_reading_scalar(x, y, readings))
                if x is not None and y is not None
                else None
                for x, y in zip(s1, s2)
            ]
        )

    return _udf(a, b).cast("int")


CJK_MEASURES = {
    "koreanTranslitDistance": korean_translit_distance,
    "koreanPhonemeDistance": korean_phoneme_distance,
    "cjkReadingDistance": cjk_reading_distance,
}
