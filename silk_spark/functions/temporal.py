"""Allen interval relations + time-unit distances.

Reference: silk-plugins-spatial-temporal temporal relation metrics
(/root/reference/silk-plugins/silk-plugins-spatial-temporal/src/main/
scala/org/silkframework/plugins/spatial_temporal/temporal/relation/
*.scala — 13 relation ids) and time-unit distances
(temporal/distance/*.scala: MillisecsDistanceMetric ... YearsDistanceMetric).

Spark mapping: each relation is a boolean Column over two intervals
(begin/end pairs) — exactly the theta/range-join predicates Catalyst
optimizes; distances are epoch arithmetic. All 13 Allen relations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Allen's 13 interval relations (s1,e1) vs (s2,e2) ----------------------


def before(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return e1 < s2


def after(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return s1 > e2


def meets(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return e1 == s2


def met_by(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return s1 == e2


def overlaps(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1 < s2) & (e1 > s2) & (e1 < e2)


def overlapped_by(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return overlaps(s2, e2, s1, e1)


def starts(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1 == s2) & (e1 < e2)


def started_by(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1 == s2) & (e1 > e2)


def during(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1 > s2) & (e1 < e2)


def contains(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1 < s2) & (e1 > e2)


def finishes(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (e1 == e2) & (s1 > s2)


def finished_by(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (e1 == e2) & (s1 < s2)


def equals(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1 == s2) & (e1 == e2)


ALLEN_RELATIONS = {
    "before": before,
    "after": after,
    "meets": meets,
    "metBy": met_by,
    "overlaps": overlaps,
    "overlappedBy": overlapped_by,
    "starts": starts,
    "startedBy": started_by,
    "during": during,
    "contains": contains,
    "finishes": finishes,
    "finishedBy": finished_by,
    "equals": equals,
}


def allen_relation(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """Classify the pair into exactly one of the 13 relations (the
    relations partition interval-pair space for proper intervals)."""
    out = F.lit(None).cast("string")
    expr = None
    for name, fn in ALLEN_RELATIONS.items():
        cond = fn(s1, e1, s2, e2)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(out)


# --- time-unit distances (temporal/distance/*.scala) ------------------------

_UNIT_SECONDS = {
    "millisecs": 0.001,
    "seconds": 1.0,
    "minutes": 60.0,
    "hours": 3600.0,
    "days": 86400.0,
    "months": 30.0 * 86400.0,
    "years": 365.0 * 86400.0,
}


def time_distance(a: Column, b: Column, unit: str = "seconds") -> Column:
    """|a - b| in the requested unit (sub-second precision kept)."""
    secs = F.abs(
        a.cast("timestamp").cast("double") - b.cast("timestamp").cast("double")
    )
    return secs / _UNIT_SECONDS[unit]
