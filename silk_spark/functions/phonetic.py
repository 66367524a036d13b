"""Phonetic encoders + stemmer + char normalization (pure algorithms).

Reference transformers metaphone / NYSIIS / stem / normalizeChars
(/root/reference/silk-rules/src/main/scala/org/silkframework/rule/
plugins/transformer/linguistic/MetaphoneTransformer.scala,
NysiisTransformer.scala, StemmerTransformer.scala:21,
NormalizeCharsTransformer.scala). The reference delegates metaphone/
NYSIIS to the stringmetric library; here the classic published
algorithms (Philips 1990 Metaphone, Taft 1970 NYSIIS, Porter 1980
stemmer, NFD diacritic stripping) are implemented directly — no
external libraries, vectorized pandas UDFs (Arrow-batched; the
iterative state machines have no Column form).

Like the reference (methods/Blocking.scala:19-33, which defaults to
Soundex and offers NYSIIS/Metaphone), these are meant as BLOCKING KEY
ENCODERS: block on `metaphone(name)` to compare only phonetically
similar candidates.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

VOWELS = "AEIOU"


# ---------------------------------------------------------------------------
# Metaphone (Lawrence Philips, Computer Language 7(12), 1990)
# ---------------------------------------------------------------------------


def metaphone_code(value: str) -> str:
    """Classic Metaphone phonetic code of the first word-like content."""
    w = "".join(ch for ch in value.upper() if ch.isalpha())
    if not w:
        return ""
    # initial-letter exceptions
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[:1] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[2:]
    out = []
    n = len(w)
    i = 0
    while i < n:
        c = w[i]
        # collapse doubled letters except C
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        prev = w[i - 1] if i > 0 else ""
        if c in VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                out.append("K" if prev == "S" else "X")
            elif nxt in "IEY":
                if prev != "S":
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EIY":
                out.append("J")
                i += 1  # the G is consumed by DGE/DGI/DGY
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if not (i + 2 < n and w[i + 2] in VOWELS):
                    pass  # silent GH (night, weight)
                else:
                    out.append("K")
            elif nxt == "N":
                pass  # GN, GNED: silent G
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if prev in VOWELS and nxt not in VOWELS:
                pass  # silent after vowel with no vowel following
            elif prev in "CSPTG":
                pass  # consumed by the digraph
            else:
                out.append("H")
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):
                out.append("X")
            elif nxt == "H":
                out.append("0")  # theta
            elif not (nxt == "C" and nxt2 == "H"):
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in VOWELS:
                out.append("W")
        elif c == "X":
            out.append("KS")
        elif c == "Y":
            if nxt in VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        elif c in "FJLMNR":
            out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# NYSIIS (Robert Taft, New York State Identification and Intelligence
# System, 1970) — standard (non-truncating) variant
# ---------------------------------------------------------------------------


def nysiis_code(value: str) -> str:
    w = "".join(ch for ch in value.upper() if ch.isalpha())
    if not w:
        return ""
    # first-letter transforms
    if w.startswith("MAC"):
        w = "MCC" + w[3:]
    elif w.startswith("KN"):
        w = "NN" + w[2:]
    elif w.startswith("K"):
        w = "C" + w[1:]
    elif w.startswith(("PH", "PF")):
        w = "FF" + w[2:]
    elif w.startswith("SCH"):
        w = "SSS" + w[3:]
    # last-letter transforms
    if w.endswith(("EE", "IE")):
        w = w[:-2] + "Y"
    elif w.endswith(("DT", "RT", "RD", "NT", "ND")):
        w = w[:-2] + "D"
    key = w[0]
    i = 1
    n = len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        if c == "E" and nxt == "V":
            rep = "AF"
            i += 2
        elif c in VOWELS:
            rep = "A"
            i += 1
        elif c == "Q":
            rep = "G"
            i += 1
        elif c == "Z":
            rep = "S"
            i += 1
        elif c == "M":
            rep = "N"
            i += 1
        elif c == "K":
            if nxt == "N":
                rep = "N"
                i += 2
            else:
                rep = "C"
                i += 1
        elif c == "S" and w[i : i + 3] == "SCH":
            rep = "SSS"
            i += 3
        elif c == "P" and nxt == "H":
            rep = "FF"
            i += 2
        elif c == "H" and (w[i - 1] not in VOWELS or nxt not in VOWELS):
            rep = w[i - 1]
            i += 1
        elif c == "W" and w[i - 1] in VOWELS:
            rep = w[i - 1]
            i += 1
        else:
            rep = c
            i += 1
        if rep and rep[0] != key[-1]:
            key += rep
    if key.endswith("S") and len(key) > 1:
        key = key[:-1]
    if key.endswith("AY"):
        key = key[:-2] + "Y"
    if key.endswith("A") and len(key) > 1:
        key = key[:-1]
    return key


# ---------------------------------------------------------------------------
# Porter stemmer (M. F. Porter, "An algorithm for suffix stripping",
# Program 14(3), 1980 — tartarus.org/~martin/PorterStemmer)
# ---------------------------------------------------------------------------


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(value: str) -> str:
    w = value.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    def rule(suffixes: list[tuple[str, str]], min_m: int = 0) -> None:
        nonlocal w
        for suf, rep in suffixes:
            if w.endswith(suf):
                stem = w[: len(w) - len(suf)]
                if _measure(stem) > min_m:
                    w = stem + rep
                return

    # step 2
    rule([
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ])
    # step 3
    rule([
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ])
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion"):
            stem = w[:-3]
            if stem and stem[-1] in "st" and _measure(stem) > 1:
                w = stem
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# normalizeChars (NFD strip of combining marks + special folds)
# ---------------------------------------------------------------------------

_NONDIACRITICS = {
    "Ł": "l", "ł": "l", "ß": "ss", "æ": "ae", "ø": "o", "©": "c",
    "Ð": "d", "ð": "d", "Đ": "d", "đ": "d",
    "Ɖ": "d", "ɖ": "d", "Þ": "th", "þ": "th",
}


def normalize_chars_str(value: str) -> str:
    """Diacritic stripping (NFD + drop Mn/Lm/Sk marks) plus the
    reference's special folds (ß→ss, æ→ae, þ→th, …) —
    NormalizeCharsTransformer.scala:30-77 without java.text.Normalizer."""
    decomposed = unicodedata.normalize("NFD", value)
    stripped = "".join(
        ch for ch in decomposed if unicodedata.category(ch) not in ("Mn", "Lm", "Sk")
    )
    return "".join(_NONDIACRITICS.get(ch, ch) for ch in stripped)


# ---------------------------------------------------------------------------
# Column wrappers (Arrow-batched pandas UDFs)
# ---------------------------------------------------------------------------


def _wrap(fn):
    @pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return pd.Series([fn(x) if x is not None else None for x in s])

    return _udf


_metaphone_udf = _wrap(metaphone_code)
_nysiis_udf = _wrap(nysiis_code)
_stem_udf = _wrap(porter_stem)
_normalize_chars_udf = _wrap(normalize_chars_str)


def metaphone(c: Column) -> Column:
    """Classic Metaphone code (blocking key encoder)."""
    return _metaphone_udf(c)


def nysiis(c: Column) -> Column:
    """NYSIIS code, standard Taft variant (the reference's default
    delegates to stringmetric's refined variant; codes differ in tail
    handling but group the same phonetic neighborhoods)."""
    return _nysiis_udf(c)


def stem(c: Column) -> Column:
    """Porter-stemmed form."""
    return _stem_udf(c)


def normalize_chars(c: Column) -> Column:
    """Diacritics removed, special chars folded (ö→o, ß→ss, æ→ae)."""
    return _normalize_chars_udf(c)
