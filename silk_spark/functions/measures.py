"""Distance measures as Catalyst Column builders.

Re-expression of the reference's DistanceMeasure plugin catalog
(/root/reference/silk-rules/src/main/scala/org/silkframework/rule/
similarity/DistanceMeasure.scala:20-36 and plugins/distance/**) as a
registry of functions ``(Column, Column, **params) -> Column`` that
return a *distance* (lower = closer), exactly like the reference.

Everything here is JVM-side (whole-stage codegen); the only pandas
UDF is jaro/jaro-winkler, which has no Spark builtin. Token measures
operate on ``array<string>`` columns (tokenize first with
``transformers.tokenize``).

Distance -> confidence mapping (Comparison semantics, reference
rule/similarity/Comparison.scala:71-96): ``1 - distance/threshold``,
clamped so confidence lands in [-1, 1].
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# ---------------------------------------------------------------------------
# character-based  (reference: plugins/distance/characterbased/*.scala)
# ---------------------------------------------------------------------------


def levenshtein_distance(a: Column, b: Column) -> Column:
    """Absolute edit distance (LevenshteinDistance.scala:26). Built-in."""
    return F.levenshtein(a, b).cast("double")


def levenshtein(a: Column, b: Column) -> Column:
    """Normalized edit distance in [0,1] (LevenshteinMetric.scala:36-46)."""
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        F.levenshtein(a, b).cast("double") / denom
    )


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(len1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def _jaro_winkler(
    s1: str, s2: str, p: float = 0.1, max_prefix: int = 4, boost_threshold: float = 0.7
) -> float:
    """Standard Winkler variant: prefix boost applies only when the
    Jaro similarity exceeds `boost_threshold` (0.7) — matches the
    common reference implementations (incl. DuckDB's)."""
    j = _jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


@pandas_udf(DoubleType())
def _jaro_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            1.0 - _jaro(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ]
    )


@pandas_udf(DoubleType())
def _jaro_winkler_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            1.0 - _jaro_winkler(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ]
    )


def jaro(a: Column, b: Column) -> Column:
    """Jaro distance = 1 - jaro similarity (JaroDistanceMetric.scala:21).
    Arrow-batched pandas UDF (no Spark builtin)."""
    return _jaro_dist_udf(a, b)


def jaro_winkler(a: Column, b: Column) -> Column:
    """Jaro-Winkler distance (JaroWinklerDistance.scala:21), p=0.1,
    prefix bounded at 4 — matches DuckDB's jaro_winkler_similarity."""
    return _jaro_winkler_dist_udf(a, b)


def qgrams(a: Column, b: Column, q: int = 2) -> Column:
    """Jaccard distance over padded q-gram sets (QGramsMetric.scala:32).
    The reference pads with '#' sentinels before extracting q-grams."""
    pad = "#" * (q - 1)
    ga = char_ngrams(F.concat(F.lit(pad), a, F.lit(pad)), q)
    gb = char_ngrams(F.concat(F.lit(pad), b, F.lit(pad)), q)
    return jaccard(ga, gb)


def is_substring(a: Column, b: Column) -> Column:
    """0 if either contains the other, else 1 (IsSubstringDistance.scala:7
    decision form)."""
    return F.when(a.contains(b) | b.contains(a), 0.0).otherwise(1.0)


# ---- graded substring distance (Stoilos/Stamou/Kollias ISWC 2005) ----
# reference: silk-rules/.../distance/characterbased/SubStringDistance.scala:8


def _norm_sub(s: str) -> str:
    for ch in "._ -":
        s = s.replace(ch, "")
    return s


def _find_best_substring(s1: str, s2: str, best: int):
    n1, n2 = len(s1), len(s2)
    a1 = b1 = a2 = b2 = 0
    i = 0
    while i < n1 and n1 - i > best:
        j = 0
        while n2 - j > best:
            k = i
            while j < n2 and s1[k] != s2[j]:
                j += 1
            if j != n2:
                p = j
                j += 1
                k += 1
                while j < n2 and k < n1 and s1[k] == s2[j]:
                    j += 1
                    k += 1
                if k - i > best:
                    best, a1, b1, a2, b2 = k - i, i, k, p, j
        i += 1
    return best, a1, b1, a2, b2


def _substring_score(str1: str, str2: str, granularity: int = 3) -> float:
    """Similarity in [-1, 1]; faithful port of SubStringDistance.score
    (repeated longest-common-substring removal + commonality −
    dissimilarity + Winkler prefix improvement)."""
    min_match = max(granularity, 2)
    if not str1 or not str2:
        return -1.0
    s1, s2 = str1.lower(), str2.lower()
    if s1 == s2:
        return 1.0
    s1, s2 = _norm_sub(s1), _norm_sub(s2)
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 0.0
    if len1 == 0 or len2 == 0:
        return 1.0
    common, best = 0.0, 2
    while s1 and s2 and best != 0:
        best, a1, b1, a2, b2 = _find_best_substring(s1, s2, 0)
        s1 = s1[:a1] + s1[b1:]
        s2 = s2[:a2] + s2[b2:]
        if best >= min_match:
            common += best
        else:
            best = 0
    commonality = 2.0 * common / (len1 + len2)
    # Winkler improvement runs on the ORIGINAL (unnormalized) strings
    n = min(len(str1), len(str2))
    diff = next((i for i in range(n) if str1[i] != str2[i]), n - 1)
    winkler = min(4, diff) * 0.1 * (1.0 - commonality)
    rest1, rest2 = (len1 - common) / len1, (len2 - common) / len2
    suma, product = rest1 + rest2, rest1 * rest2
    p = 0.6
    dissimilarity = 0.0 if suma - product == 0.0 else product / (p + (1.0 - p) * (suma - product))
    return commonality - dissimilarity + winkler


def substring_distance(a: Column, b: Column, granularity: int = 3) -> Column:
    """Graded substring distance: 1 − Stoilos score, 1.0 when the score
    is negative (SubStringDistance.scala evaluate). Vectorized pandas
    UDF — the iterative substring-removal loop has no Column form."""

    @pandas_udf(DoubleType())
    def _udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(xs, ys):
            if x is None or y is None:
                out.append(None)
            else:
                s = _substring_score(x, y, granularity)
                out.append(1.0 if s < 0 else 1.0 - s)
        return pd.Series(out)

    return _udf(a, b)


# ---- tokenwise distance ----
# reference: silk-rules/.../distance/tokenbased/TokenwiseStringDistance.scala:84


def _plain_levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _kendalls_tau(seq1: list[int], seq2: list[int]) -> float:
    if len(seq1) == 1:
        return 1.0
    num = 0.0
    for i in range(len(seq1)):
        for j in range(i):
            si = (seq1[i] > seq1[j]) - (seq1[i] < seq1[j])
            sj = (seq2[i] > seq2[j]) - (seq2[i] < seq2[j])
            if si == sj:
                num += 1.0
    return num / (0.5 * (len(seq1) * (len(seq1) - 1)))


def _tokenwise_eval(
    s1: str,
    s2: str,
    metric,
    split_regex: str,
    stopset: frozenset,
    stopword_weight: float,
    nonstopword_weight: float,
    match_threshold: float,
    ordering_impact: float,
    adjust_by_token_length: bool,
    ignore_case: bool,
) -> float:
    """Faithful port of TokenwiseStringDistance.evaluate: all-pairs
    token scores, greedy one-to-one alignment by descending score,
    jaccard-like weighted aggregation, optional Kendall-tau ordering."""
    import re

    def tok(s):
        parts = [t for t in re.split(split_regex, s) if t]
        return [t.lower() for t in parts] if ignore_case else parts

    t1, t2 = tok(s1), tok(s2)
    if not t1 or not t2:
        return 1.0
    w1 = [stopword_weight if t in stopset else nonstopword_weight for t in t1]
    w2 = [stopword_weight if t in stopset else nonstopword_weight for t in t2]
    if adjust_by_token_length:
        m1, m2 = max(len(t) for t in t1), max(len(t) for t in t2)
        w1 = [w * len(t) / m1 for w, t in zip(w1, t1)]
        w2 = [w * len(t) / m2 for w, t in zip(w2, t2)]
    scores = []
    for i1, x in enumerate(t1):
        for i2, y in enumerate(t2):
            s = 1.0 - metric(x, y)
            if s >= match_threshold:
                scores.append((s, i1, i2))
    scores.sort(key=lambda t: -t[0])  # stable: ties keep (i1, i2) order
    matched1, matched2 = [False] * len(t1), [False] * len(t2)
    mc1 = mc2 = 0
    last = 1.0
    align = []
    for s, i1, i2 in scores:
        if mc1 < len(t1) and mc2 < len(t2) and last > 0.0 and not matched1[i1] and not matched2[i2]:
            last = s
            matched1[i1] = matched2[i2] = True
            mc1 += 1
            mc2 += 1
            align.append((s, i1, i2))
    inter = 0.0
    union_matched = 0.0
    for s, i1, i2 in align:
        tmp = w1[i1] * w2[i2] * s
        inter += tmp
        union_matched += tmp + (w1[i1] ** 2 + w2[i2] ** 2) * (1.0 - s)
    union_unmatched = sum(w ** 2 for w, m in zip(w1, matched1) if not m) + sum(
        w ** 2 for w, m in zip(w2, matched2) if not m
    )
    union = union_matched + union_unmatched
    score = 1.0 if union == 0.0 else inter / union
    if ordering_impact > 0.0 and len(align) > 1:
        idx1 = [i for _, i in sorted(((a[1], i) for i, a in enumerate(align)), key=lambda x: -x[0])]
        idx2 = [i for _, i in sorted(((a[2], i) for i, a in enumerate(align)), key=lambda x: -x[0])]
        tau = _kendalls_tau(idx1, idx2)
        score = score * (1 - ordering_impact * (1 - tau))
    return 1.0 - score


def tokenwise_distance(
    a: Column,
    b: Column,
    metric_name: str = "levenshtein",
    split_regex: str = r"[\s\d\W]+",
    stopwords: str = "",
    stopword_weight: float = 0.01,
    nonstopword_weight: float = 0.1,
    match_threshold: float = 0.0,
    ordering_impact: float = 0.0,
    adjust_by_token_length: bool = False,
    ignore_case: bool = True,
) -> Column:
    """Hybrid token/character distance (TokenwiseStringDistance.scala:84,
    the largest single measure in the reference): token pairs scored by
    a character metric, greedily aligned one-to-one, aggregated
    jaccard-like with per-token weights. Vectorized pandas UDF (the
    greedy alignment has no Column form)."""
    if metric_name == "levenshtein":
        metric = lambda x, y: (  # noqa: E731 — normalized lev (LevenshteinMetric.scala)
            _plain_levenshtein(x, y) / max(len(x), len(y)) if (x or y) else 0.0
        )
    elif metric_name == "jaro":
        metric = lambda x, y: 1.0 - _jaro(x, y)  # noqa: E731
    elif metric_name == "jaroWinkler":
        metric = lambda x, y: 1.0 - _jaro_winkler(x, y)  # noqa: E731
    else:
        raise ValueError(f"unknown tokenwise metric {metric_name!r}")
    stopset = frozenset(
        (w.lower() if ignore_case else w) for w in __import__("re").split(r"[,\s]+", stopwords) if w
    )

    @pandas_udf(DoubleType())
    def _udf(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _tokenwise_eval(
                    x, y, metric, split_regex, stopset,
                    stopword_weight, nonstopword_weight, match_threshold,
                    ordering_impact, adjust_by_token_length, ignore_case,
                )
                if x is not None and y is not None
                else None
                for x, y in zip(xs, ys)
            ]
        )

    return _udf(a, b)


def starts_with(a: Column, b: Column) -> Column:
    return F.when(a.startswith(b), 0.0).otherwise(1.0)


def char_ngrams(c: Column, n: int = 2) -> Column:
    """Distinct character n-grams of a string as array<string> —
    JVM-side via sequence + transform (no UDF)."""
    idx = F.sequence(F.lit(1), F.length(c) - (n - 1))
    grams = F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(n))))
    # sequence(1, k) is descending for k < 1 — guard short strings to []
    return F.when(F.length(c) >= n, grams).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# equality family  (reference: plugins/distance/equality/*.scala)
# ---------------------------------------------------------------------------


def equality(a: Column, b: Column) -> Column:
    """EqualityMetric.scala:23 — 0 iff equal else 1."""
    return F.when(a == b, 0.0).otherwise(1.0)


def inequality(a: Column, b: Column) -> Column:
    return F.when(a != b, 0.0).otherwise(1.0)


def relaxed_equality(a: Column, b: Column) -> Column:
    """lowercase/trim equality (RelaxedEqualityMetric.scala:20)."""
    return F.when(F.lower(F.trim(a)) == F.lower(F.trim(b)), 0.0).otherwise(1.0)


def numeric_equality(a: Column, b: Column, precision: float = 0.0) -> Column:
    """NumericEqualityMetric.scala:12 — equal within +-precision."""
    return F.when(
        F.abs(a.cast("double") - b.cast("double")) <= precision, 0.0
    ).otherwise(1.0)


def lower_than(a: Column, b: Column, or_equal: bool = False) -> Column:
    """LowerThanMetric.scala:8."""
    cond = (a <= b) if or_equal else (a < b)
    return F.when(cond, 0.0).otherwise(1.0)


def greater_than(a: Column, b: Column, or_equal: bool = False) -> Column:
    cond = (a >= b) if or_equal else (a > b)
    return F.when(cond, 0.0).otherwise(1.0)


def constant(a: Column, b: Column, value: float = 0.0) -> Column:
    return F.lit(float(value))


# ---------------------------------------------------------------------------
# token-based  (reference: plugins/distance/tokenbased/*.scala)
# operate on array<string> token columns
# ---------------------------------------------------------------------------


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard distance 1 - |A∩B|/|A∪B| (JaccardDistance.scala:23).
    array_intersect/array_union are set ops, so duplicates collapse."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, 0.0).otherwise(1.0 - inter / union)


def dice(a: Column, b: Column) -> Column:
    """Dice distance 1 - 2|A∩B|/(|A|+|B|) over distinct tokens
    (DiceCoefficient.scala:22)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    denom = (F.size(da) + F.size(db)).cast("double")
    return F.when(denom == 0, 0.0).otherwise(1.0 - 2.0 * inter / denom)


def token_cosine(a: Column, b: Column) -> Column:
    """Cosine distance over binary token sets
    1 - |A∩B|/sqrt(|A||B|) (CosineDistanceMetric.scala:19)."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    denom = F.sqrt(F.size(da).cast("double") * F.size(db).cast("double"))
    return F.when(denom == 0, 0.0).otherwise(1.0 - inter / denom)


def soft_jaccard(a: Column, b: Column, max_distance: int = 1) -> Column:
    """Levenshtein-tolerant Jaccard (SoftJaccardDistance.scala:23):
    tokens match if edit distance <= max_distance. Higher-order
    functions only — the token-pair cross product stays JVM-side."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    # 3-arg levenshtein: banded DP with early exit for the (common)
    # far token pairs; returns -1 when the distance exceeds the bound
    matched_a = F.size(
        F.filter(da, lambda x: F.exists(db, lambda y: F.levenshtein(x, y, max_distance) >= 0))
    )
    matched_b = F.size(
        F.filter(db, lambda y: F.exists(da, lambda x: F.levenshtein(x, y, max_distance) >= 0))
    )
    # soft union = |A| + |B| - min(matchedA, matchedB); soft intersect = max(...)
    inter = F.greatest(matched_a, matched_b).cast("double")
    union = (F.size(da) + F.size(db) - F.least(matched_a, matched_b)).cast("double")
    return F.when(union == 0, 0.0).otherwise(1.0 - inter / union)


# ---------------------------------------------------------------------------
# numeric / temporal / geo  (reference: plugins/distance/numeric/*.scala)
# ---------------------------------------------------------------------------


def num(a: Column, b: Column, min_value: float | None = None, max_value: float | None = None) -> Column:
    """Absolute numeric difference, optionally normalized by the
    [min,max] range (NumMetric.scala:27)."""
    d = F.abs(a.cast("double") - b.cast("double"))
    if min_value is not None and max_value is not None and max_value > min_value:
        return d / F.lit(float(max_value - min_value))
    return d


def inside_numeric_interval(a: Column, lo: float, hi: float) -> Column:
    """InsideNumericInterval.scala:7 — 0 if value in [lo,hi]."""
    v = a.cast("double")
    return F.when((v >= lo) & (v <= hi), 0.0).otherwise(1.0)


def date_distance(a: Column, b: Column) -> Column:
    """Day-granularity date distance (DateMetric.scala:27)."""
    return F.abs(F.datediff(a.cast("date"), b.cast("date"))).cast("double")


def datetime_distance(a: Column, b: Column) -> Column:
    """Second-granularity timestamp distance (DateTimeMetric.scala:24)."""
    return F.abs(
        a.cast("timestamp").cast("long") - b.cast("timestamp").cast("long")
    ).cast("double")


def wgs84(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine great-circle distance in meters
    (GeographicDistanceMetric.scala:33) — pure Column arithmetic."""
    r = 6371000.0
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    h = F.sin(dphi) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlmb) ** 2
    return 2 * r * F.asin(F.sqrt(h))


# ---------------------------------------------------------------------------
# comparison -> confidence  (reference: rule/similarity/Comparison.scala:71-96)
# ---------------------------------------------------------------------------


def distance_to_confidence(dist: Column, threshold: float = 1.0) -> Column:
    """Map distance to confidence in [-1, 1]: 1 - d/t, floored at -1
    (reached at d >= 2t). Exactly Comparison.scala:71-78."""
    t = float(threshold) if threshold > 0 else 1.0
    return F.greatest(F.lit(1.0) - dist / t, F.lit(-1.0))


MEASURES = {
    "levenshteinDistance": levenshtein_distance,
    "levenshtein": levenshtein,
    "jaro": jaro,
    "jaroWinkler": jaro_winkler,
    "qGrams": qgrams,
    "substringDistance": substring_distance,
    "isSubstring": is_substring,
    "substring": is_substring,
    "startsWith": starts_with,
    "tokenwiseDistance": tokenwise_distance,
    "equality": equality,
    "inequality": inequality,
    "relaxedEquality": relaxed_equality,
    "numericEquality": numeric_equality,
    "lowerThan": lower_than,
    "greaterThan": greater_than,
    "constant": constant,
    "jaccard": jaccard,
    "dice": dice,
    "cosine": token_cosine,
    "softjaccard": soft_jaccard,
    "num": num,
    "insideNumericInterval": inside_numeric_interval,
    "date": date_distance,
    "dateTime": datetime_distance,
    "wgs84": wgs84,
}


# spatial relation/distance metrics join the same registry the way the
# reference's PluginFactory folds the spatial plugin in (SpatialPlugins
# registration; functions/spatial.py for semantics + scope)
from silk_spark.functions.spatial import SPATIAL_MEASURES  # noqa: E402

MEASURES.update(SPATIAL_MEASURES)

# CJK/Korean measures (AsianPlugins.scala registration; functions/cjk.py
# for semantics — pure Unicode arithmetic + caller-supplied public
# Unihan readings, no external libraries)
from silk_spark.functions.cjk import CJK_MEASURES  # noqa: E402

MEASURES.update(CJK_MEASURES)


def distance(measure: str, a: Column, b: Column, **params) -> Column:
    """Registry dispatch: distance column for a named measure."""
    return MEASURES[measure](a, b, **params)


def similarity(measure: str, a: Column, b: Column, threshold: float = 1.0, **params) -> Column:
    """Distance mapped to confidence via Comparison semantics."""
    return distance_to_confidence(distance(measure, a, b, **params), threshold)
