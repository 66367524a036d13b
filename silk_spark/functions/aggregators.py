"""Score aggregators: combine per-comparison confidences into one.

Reference: Aggregator interface + plugins
(/root/reference/silk-rules/src/main/scala/org/silkframework/rule/
similarity/Aggregator.scala:21-48; plugins/aggegrator/*.scala).
Confidences live in [-1, 1]; a LinkageRule emits a link iff the root
confidence >= 0 (rule/execution/Matcher.scala:273-280).

All combinators are Column expressions over sibling confidence
columns — `least`/`greatest`/arithmetic — so an entire rule tree
compiles into ONE whole-stage-codegen projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minimum(*scores: Column) -> Column:
    """Fuzzy AND (MinimumAggregator.scala:54)."""
    return F.least(*scores)


def maximum(*scores: Column) -> Column:
    """Fuzzy OR (MaximumAggregator.scala:69)."""
    return F.greatest(*scores)


def average(*scores: Column, weights: list[float] | None = None) -> Column:
    """Weighted mean (AverageAggregator.scala:79)."""
    if weights is None:
        weights = [1.0] * len(scores)
    total = float(sum(weights))
    out = None
    for s, w in zip(scores, weights):
        term = s * (w / total)
        out = term if out is None else out + term
    return out


def geometric_mean(*scores: Column) -> Column:
    """GeometricMeanAggregator.scala:91 — over [0,1]-shifted scores the
    reference uses positive confidences; here we clamp at 0 to keep the
    log defined and preserve 'any strongly-negative child kills it'."""
    n = len(scores)
    prod = None
    for s in scores:
        c = F.greatest(s, F.lit(0.0))
        prod = c if prod is None else prod * c
    return F.pow(prod, 1.0 / n)


def quadratic_mean(*scores: Column) -> Column:
    """RMS (QuadraticMeanAggregator.scala:94)."""
    n = len(scores)
    total = None
    for s in scores:
        sq = s * s
        total = sq if total is None else total + sq
    return F.sqrt(total / n)


def negate(score: Column) -> Column:
    """NegationAggregator.scala:16-29 — flip sign in [-1,1] space."""
    return -score


def scale(score: Column, factor: float = 1.0) -> Column:
    return score * F.lit(float(factor))


def handle_missing_values(score: Column, default: float = -1.0) -> Column:
    return F.coalesce(score, F.lit(float(default)))


AGGREGATORS = {
    "min": minimum,
    "max": maximum,
    "average": average,
    "geometricMean": geometric_mean,
    "quadraticMean": quadratic_mean,
    "negate": negate,
    "scale": scale,
    "handleMissingValues": handle_missing_values,
}


def aggregate_scores(name: str, *scores: Column, **params) -> Column:
    return AGGREGATORS[name](*scores, **params)
