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


def substring_distance(a: Column, b: Column) -> Column:
    """0 if either contains the other, else 1 (SubStringDistance.scala:8
    simplified to its decision form)."""
    return F.when(a.contains(b) | b.contains(a), 0.0).otherwise(1.0)


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
    matched_a = F.size(
        F.filter(da, lambda x: F.exists(db, lambda y: F.levenshtein(x, y) <= max_distance))
    )
    matched_b = F.size(
        F.filter(db, lambda y: F.exists(da, lambda x: F.levenshtein(x, y) <= max_distance))
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
    "substring": substring_distance,
    "startsWith": starts_with,
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


def distance(measure: str, a: Column, b: Column, **params) -> Column:
    """Registry dispatch: distance column for a named measure."""
    return MEASURES[measure](a, b, **params)


def similarity(measure: str, a: Column, b: Column, threshold: float = 1.0, **params) -> Column:
    """Distance mapped to confidence via Comparison semantics."""
    return distance_to_confidence(distance(measure, a, b, **params), threshold)
