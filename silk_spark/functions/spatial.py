"""Spatial relations, distances, transformers, and envelope-grid
blocking over WKT geometry strings — the envelope/point slice of the
reference's spatial plugin, as pure JVM Column expressions.

Reference: silk-plugins/silk-plugins-spatial-temporal/.../spatial/
utils/Utils.scala:204-330 (evaluateRelation / evaluateDistance /
indexGeometriesByEnvelope), relation/*.scala:27-40 (SContains,
SWithin, SIntersects, SDisjoint, STouches, SEquals, SOverlaps,
SCrosses, NegateMetric), distance/{Centroid,Min}DistanceMetric.scala:27,
transformer/*.scala, utils/Parser.scala:127 (latLongConcat),
utils/Constants.scala:102-113.

Geometry model — every WKT literal is reduced to the struct
``envelope = (xmin, ymin, xmax, ymax)`` plus its vertex count, with
x = first coordinate (longitude, the reference's
WGS84_LONG_LAT_SRID convention) and y = second (latitude). For the
supported exact classes — POINT and axis-aligned rectangles (a
POLYGON whose vertices coincide with its own envelope) — the JTS
topological predicates the reference delegates to coincide EXACTLY
with the closed/open interval algebra implemented here, and the
module is pinned against the reference's own golden WKT fixtures
(relation/*MetricTest.scala). For general polygons / linestrings the
envelope is the standard conservative approximation (`intersects`
may over-report, `contains` under-report) — the same envelope the
reference itself uses for its BLOCKING stage (Utils.scala:204-229);
an exact-topology verify for curved classes is JTS/Sedona territory
and stays out of scope.

Everything is whole-stage-codegen Column arithmetic: WKT parse via
``regexp_extract_all`` + higher-order functions, no Python in the
row path, so relations ride inside the same blocked candidate joins
as every other measure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _INF() -> Column:
    return F.lit(float("inf"))
_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
_PAIR = f"({_NUM})\\s+({_NUM})"

# Utils.scala / Constants.scala:102-113
EARTH_CIRCUMFERENCE_EQUATORIAL = 40075160.0
EARTH_CIRCUMFERENCE_MERIDIONAL = 40008000.0
LAT_RANGE = 180.0
LONG_RANGE = 360.0


# ---------------------------------------------------------------------------
# WKT parse -> envelope struct
# ---------------------------------------------------------------------------


def wkt_coords(g: Column) -> Column:
    """``array<struct<x,y>>`` of every coordinate pair in a WKT
    literal (POINT/MULTIPOINT/LINESTRING/POLYGON/ENVELOPE all reduce
    to their coordinate list; Parser.scala WKTReader analogue)."""
    pairs = F.regexp_extract_all(g, F.lit(_PAIR), 0)
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.regexp_extract(p, _PAIR, 1).cast("double").alias("x"),
            F.regexp_extract(p, _PAIR, 2).cast("double").alias("y"),
        ),
    )


def wkt_envelope(g: Column) -> Column:
    """``struct<xmin,ymin,xmax,ymax,n>`` envelope of a WKT literal,
    NULL when the literal has no parseable coordinates — mirroring
    the reference's parse-failure catch (Utils.scala:283-296 returns
    +inf for relations on unparseable input; NULL envelopes propagate
    the same way through the relation builders below). ``n`` carries
    the vertex count so degenerate (point) geometries stay
    distinguishable from boxes.

    ONE ``aggregate`` pass over the regex matches, with the
    null-when-empty wrap in the aggregate's FINISH lambda (where the
    accumulator is a bound variable, evaluated once). The earlier
    min/max-over-transforms form referenced the coords array five
    times — higher-order functions are CodegenFallback with no
    common-subexpression elimination, so the whole
    ``regexp_extract_all`` parse re-ran per reference (the trap
    shingles_from_tokens documents); measured ~5x on the spatial-join
    pair path. Callers that evaluate relations per JOINED PAIR should
    still materialize this struct once per ENTITY side before the
    join (a bound struct column's field access is free; an inline
    expression's is a re-parse) — see q_spatial_join."""
    pairs = F.regexp_extract_all(g, F.lit(_PAIR), 0)

    def _merge(acc: Column, p: Column) -> Column:
        sp = F.split(p, r"\s+")
        x = F.element_at(sp, 1).cast("double")
        y = F.element_at(sp, 2).cast("double")
        return F.struct(
            F.least(F.coalesce(acc["xmin"], x), x).alias("xmin"),
            F.least(F.coalesce(acc["ymin"], y), y).alias("ymin"),
            F.greatest(F.coalesce(acc["xmax"], x), x).alias("xmax"),
            F.greatest(F.coalesce(acc["ymax"], y), y).alias("ymax"),
            (acc["n"] + 1).alias("n"),
        )

    zero = F.struct(
        F.lit(None).cast("double").alias("xmin"),
        F.lit(None).cast("double").alias("ymin"),
        F.lit(None).cast("double").alias("xmax"),
        F.lit(None).cast("double").alias("ymax"),
        F.lit(0).alias("n"),
    )
    return F.aggregate(pairs, zero, _merge, lambda acc: F.when(acc["n"] > 0, acc))


# ---------------------------------------------------------------------------
# interval algebra (per axis), then DE-9IM-equivalent predicates on boxes
# ---------------------------------------------------------------------------


def _closed_overlap(a1, b1, a2, b2) -> Column:
    return (F.greatest(a1, a2) <= F.least(b1, b2))


def _open_overlap(a1, b1, a2, b2) -> Column:
    """Do the INTERIORS of two closed intervals meet?  A degenerate
    interval [a,a] is a point whose interior (in the JTS 0-dim sense
    used by Point geometries) is the point itself, so:
    point-point -> equal; point-interval -> strictly inside;
    interval-interval -> open overlap."""
    d1, d2 = a1 == b1, a2 == b2
    return (
        F.when(d1 & d2, a1 == a2)
        .when(d1, (a2 < a1) & (a1 < b2))
        .when(d2, (a1 < a2) & (a2 < b1))
        .otherwise(F.greatest(a1, a2) < F.least(b1, b2))
    )


def _env_intersects(e1: Column, e2: Column) -> Column:
    return _closed_overlap(e1["xmin"], e1["xmax"], e2["xmin"], e2["xmax"]) & _closed_overlap(
        e1["ymin"], e1["ymax"], e2["ymin"], e2["ymax"]
    )


def _env_interiors_meet(e1: Column, e2: Column) -> Column:
    return _open_overlap(e1["xmin"], e1["xmax"], e2["xmin"], e2["xmax"]) & _open_overlap(
        e1["ymin"], e1["ymax"], e2["ymin"], e2["ymax"]
    )


def _env_covers(e1: Column, e2: Column) -> Column:
    return (
        (e1["xmin"] <= e2["xmin"])
        & (e2["xmax"] <= e1["xmax"])
        & (e1["ymin"] <= e2["ymin"])
        & (e2["ymax"] <= e1["ymax"])
    )


def _is_point(e: Column) -> Column:
    return (e["xmin"] == e["xmax"]) & (e["ymin"] == e["ymax"])


def envelopes_relate(e1: Column, e2: Column, relation: str) -> Column:
    """Boolean predicate for a named relation on two envelope structs
    (Utils.scala:316-330 ``relate`` dispatch). NULL envelopes (parse
    failures) yield FALSE — they must be gated explicitly because
    ``greatest``/``least`` SKIP nulls instead of propagating them, so
    the interval algebra alone would treat a null envelope as
    unbounded. FALSE gives each caller the reference's catch-branch
    semantics (relation metrics +inf, negate metrics limit)."""
    ok = e1.isNotNull() & e2.isNotNull()
    return ok & _envelopes_relate_raw(e1, e2, relation)


def _envelopes_relate_raw(e1: Column, e2: Column, relation: str) -> Column:
    if relation == "equals":
        return (
            (e1["xmin"] == e2["xmin"])
            & (e1["ymin"] == e2["ymin"])
            & (e1["xmax"] == e2["xmax"])
            & (e1["ymax"] == e2["ymax"])
        )
    if relation == "disjoint":
        return ~_env_intersects(e1, e2)
    if relation == "intersects":
        return _env_intersects(e1, e2)
    if relation == "touches":
        return _env_intersects(e1, e2) & ~_env_interiors_meet(e1, e2)
    if relation == "contains":
        # JTS contains: covers + interiors meet (a point ON the
        # boundary is touched, not contained)
        return _env_covers(e1, e2) & _env_interiors_meet(e1, e2)
    if relation == "within":
        return _env_covers(e2, e1) & _env_interiors_meet(e1, e2)
    if relation == "overlaps":
        # same dimension, interiors meet, neither covers the other
        same_dim = _is_point(e1) == _is_point(e2)
        return (
            same_dim
            & _env_interiors_meet(e1, e2)
            & ~_env_covers(e1, e2)
            & ~_env_covers(e2, e1)
        )
    if relation == "crosses":
        # crosses needs mixed-dimension interiors whose intersection
        # has lower dimension than both — impossible for the
        # point/box classes (JTS returns false for P/A with the point
        # inside: that is "within"); lines are the out-of-scope class
        return F.lit(False)
    raise ValueError(f"unknown spatial relation: {relation}")


def _de9im_cells(e1: Column, e2: Column) -> dict[str, Column]:
    """The nine DE-9IM intersection-nonempty booleans for two closed
    envelopes (RelateMetric.scala:27 / JTS Geometry.relate). Exact for
    the supported classes: a POINT's boundary is empty (JTS
    convention) and a box is the closure of its interior, which makes
    every cell a covers/interiors-meet combination:
    - IE: interior(A) escapes closed B  <=>  NOT covers(B, A)
      (convexity: a box with any point outside convex B also has
      interior outside), and for a point A the interior IS the point;
    - IB: a point A sits ON dB ( covers(B,A) and not strictly inside),
      a box A's open set crosses dB iff interiors meet but A is not
      covered by B;
    - BB: two outlines meet iff the boxes meet and neither is
      STRICTLY inside the other's open interior;
    - BE: a box's outline escapes B exactly when the box itself does
      (convex hull of the outline is the box).
    Half-degenerate envelopes (zero extent in exactly one axis — the
    LINESTRING class) are out of scope, as everywhere in this module."""
    p1, p2 = _is_point(e1), _is_point(e2)
    ii = _env_interiors_meet(e1, e2)
    cov12, cov21 = _env_covers(e1, e2), _env_covers(e2, e1)
    inter = _env_intersects(e1, e2)
    strict_in = lambda a, b: (  # noqa: E731  a strictly inside open b
        (a["xmin"] > b["xmin"]) & (a["xmax"] < b["xmax"])
        & (a["ymin"] > b["ymin"]) & (a["ymax"] < b["ymax"])
    )
    return {
        "II": ii,
        "IB": F.when(p2, F.lit(False)).when(p1, cov21 & ~ii).otherwise(ii & ~cov21),
        "IE": ~cov21,
        "BI": F.when(p1, F.lit(False)).when(p2, cov12 & ~ii).otherwise(ii & ~cov12),
        "BB": ~p1 & ~p2 & inter & ~strict_in(e1, e2) & ~strict_in(e2, e1),
        "BE": ~p1 & ~cov21,
        "EI": ~cov12,
        "EB": ~p2 & ~cov12,
        "EE": F.lit(True),
    }


_DE9IM_ORDER = ("II", "IB", "IE", "BI", "BB", "BE", "EI", "EB", "EE")


def relate_pattern(g1: Column, g2: Column, pattern: str) -> Column:
    """JTS ``relate(other, pattern)`` for a 9-char DE-9IM pattern over
    the envelope classes: ``T`` requires a nonempty cell, ``F`` an
    empty one, ``*`` matches anything; the dimension digits 0/1/2 are
    accepted as ``T`` (cell nonemptiness is exact here, cell dimension
    is not tracked). e.g. disjoint = ``FF*FF****``."""
    if len(pattern) != 9:
        raise ValueError(f"DE-9IM pattern must have 9 chars: {pattern!r}")
    e1, e2 = wkt_envelope(g1), wkt_envelope(g2)
    cells = _de9im_cells(e1, e2)
    cond = e1.isNotNull() & e2.isNotNull()
    for ch, cell in zip(pattern, _DE9IM_ORDER):
        if ch in "T012":
            cond = cond & cells[cell]
        elif ch == "F":
            cond = cond & ~cells[cell]
        elif ch != "*":
            raise ValueError(f"bad DE-9IM char {ch!r} in {pattern!r}")
    return cond


def s_relate(g1: Column, g2: Column, pattern: str, limit: float = 1.0) -> Column:
    """RelateMetric.scala:27 distance semantics for a DE-9IM pattern:
    ``limit`` when the pattern matches, +inf otherwise / on parse
    failure."""
    return F.when(relate_pattern(g1, g2, pattern), F.lit(float(limit))).otherwise(_INF())


def s_relation(g1: Column, g2: Column, relation: str, limit: float = 1.0) -> Column:
    """Distance semantics of the reference relation metrics
    (Utils.scala:283-296 evaluateRelation): ``limit`` when the
    relation holds, +inf otherwise or on parse failure."""
    holds = envelopes_relate(wkt_envelope(g1), wkt_envelope(g2), relation)
    return F.when(holds, F.lit(float(limit))).otherwise(_INF())


def s_negate_relation(g1: Column, g2: Column, relation: str, limit: float = 1.0) -> Column:
    """NegateMetric / Utils.scala:300-313 negatsRelation: +inf when
    the relation holds, ``limit`` otherwise — and, faithfully to the
    reference's catch branch, ``limit`` (not +inf) on parse failure."""
    holds = envelopes_relate(wkt_envelope(g1), wkt_envelope(g2), relation)
    return F.when(holds, _INF()).otherwise(F.lit(float(limit)))


# ---------------------------------------------------------------------------
# distances (Utils.scala:240-268 evaluateDistance)
# ---------------------------------------------------------------------------


def _haversine(lat1, lon1, lat2, lon2) -> Column:
    r = 6371000.0
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    h = F.sin(dphi) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) ** 2
    return 2 * r * F.asin(F.sqrt(h))


def envelopes_centroid_distance(e1: Column, e2: Column, limit: float = 1.0) -> Column:
    """centroid_distance over ALREADY-PARSED envelope structs — the
    per-pair form for blocked joins where each side's envelope is
    materialized once per entity (field access on a bound struct
    column is free; on an inline wkt_envelope expression it is a
    re-parse)."""
    d = _haversine(
        (e1["ymin"] + e1["ymax"]) / 2,
        (e1["xmin"] + e1["xmax"]) / 2,
        (e2["ymin"] + e2["ymax"]) / 2,
        (e2["xmin"] + e2["xmax"]) / 2,
    ) / float(limit)
    return F.when(d <= 1.0, d).otherwise(_INF())


def centroid_distance(g1: Column, g2: Column, limit: float = 1.0) -> Column:
    """CentroidDistanceMetric.scala:27 — great-circle distance of the
    envelope centroids, normalized by ``limit``; +inf above 1.0 or on
    parse failure (Utils.scala:246-252)."""
    return envelopes_centroid_distance(wkt_envelope(g1), wkt_envelope(g2), limit)


def min_distance(g1: Column, g2: Column, limit: float = 1.0) -> Column:
    """MinDistanceMetric.scala:27 — great-circle distance of the
    nearest coordinate-space point pair (Utils.scala:253-259
    nearestPoints), normalized by ``limit``; +inf above 1.0.

    Nearest points between axis-aligned envelopes: per axis, the
    facing edges when the intervals are disjoint, else a shared
    coordinate. When an axis overlaps, JTS picks an arbitrary common
    coordinate (any choice minimizes COORDINATE-space distance); we
    pin the midpoint of the overlap so the result is deterministic —
    the geodesic length can differ from JTS's pick by the latitude
    dependence of a pure-longitude separation, documented divergence
    for overlapping boxes only (point pairs, the golden-test class,
    are exact)."""
    e1, e2 = wkt_envelope(g1), wkt_envelope(g2)

    def nearest(lo1, hi1, lo2, hi2):
        olo, ohi = F.greatest(lo1, lo2), F.least(hi1, hi2)
        shared = (olo + ohi) / 2
        return (
            F.when(olo <= ohi, F.struct(shared.alias("a"), shared.alias("b")))
            .when(hi1 < lo2, F.struct(hi1.alias("a"), lo2.alias("b")))
            .otherwise(F.struct(lo1.alias("a"), hi2.alias("b")))
        )

    nx = nearest(e1["xmin"], e1["xmax"], e2["xmin"], e2["xmax"])
    ny = nearest(e1["ymin"], e1["ymax"], e2["ymin"], e2["ymax"])
    d = _haversine(ny["a"], nx["a"], ny["b"], nx["b"]) / float(limit)
    ok = e1.isNotNull() & e2.isNotNull()
    return F.when(ok & (d <= 1.0), d).otherwise(_INF())


# ---------------------------------------------------------------------------
# envelope-grid blocking (Utils.scala:204-229 indexGeometriesByEnvelope)
# ---------------------------------------------------------------------------


def envelope_blocks(
    g: Column, blocking_parameter: float = 1.0, distance: float = 0.0
) -> Column:
    """``array<bigint>`` of grid-cell ids covering the envelope — the
    conjunction of the reference's two oneDim indices flattened to
    ``latBlock * blockCountLong + longBlock``. Feed to
    blocking.MultiBlock / the explode+equi-join candidate path like
    any other block-id array. ``distance`` pre-expands the envelope
    exactly as Utils.scala:210-211 (circumference-normalized), so a
    min-distance predicate with threshold d never loses a candidate.
    Truncation (`.toInt`, toward zero) is replicated, not floor."""
    return envelope_grid(wkt_envelope(g), blocking_parameter, distance)


def envelope_grid(
    e: Column, blocking_parameter: float = 1.0, distance: float = 0.0
) -> Column:
    """envelope_blocks over an ALREADY-PARSED envelope struct — pair
    with a per-entity materialized wkt_envelope column so the grid
    cover never re-parses WKT (see wkt_envelope docstring)."""
    bp = float(blocking_parameter)
    n_long = int(LONG_RANGE * bp) or 1
    dx = (distance / EARTH_CIRCUMFERENCE_EQUATORIAL) * LONG_RANGE
    dy = (distance / EARTH_CIRCUMFERENCE_MERIDIONAL) * LAT_RANGE
    lat_lo = ((e["ymin"] - dy) * bp).cast("int")
    lat_hi = ((e["ymax"] + dy) * bp).cast("int")
    lon_lo = ((e["xmin"] - dx) * bp).cast("int")
    lon_hi = ((e["xmax"] + dx) * bp).cast("int")
    return F.when(
        e.isNotNull(),
        F.flatten(
            F.transform(
                F.sequence(lat_lo, lat_hi),
                lambda la: F.transform(
                    F.sequence(lon_lo, lon_hi),
                    lambda lo: la.cast("bigint") * n_long + lo.cast("bigint"),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))


# ---------------------------------------------------------------------------
# transformers (spatial/transformer/*.scala)
# ---------------------------------------------------------------------------


def _fmt(c: Column) -> Column:
    # render doubles the compact way JTS toText does for integral
    # values (1 not 1.0) while keeping fractional digits
    return F.when(
        c == c.cast("bigint").cast("double"), c.cast("bigint").cast("string")
    ).otherwise(c.cast("string"))


def envelope_wkt(g: Column) -> Column:
    """EnvelopeTransformer / Utils.scala getEnvelopeFromGeometry —
    the envelope's own WKT in JTS ``getEnvelope().toText()`` form:
    POINT for degenerate envelopes, else the CCW ring
    (xmin ymin, xmax ymin, xmax ymax, xmin ymax, xmin ymin).
    Parse failures return the literal unchanged (the reference's
    catch branch)."""
    e = wkt_envelope(g)
    point = F.concat(
        F.lit("POINT ("), _fmt(e["xmin"]), F.lit(" "), _fmt(e["ymin"]), F.lit(")")
    )
    ring = F.concat(
        F.lit("POLYGON (("),
        _fmt(e["xmin"]), F.lit(" "), _fmt(e["ymin"]), F.lit(", "),
        _fmt(e["xmax"]), F.lit(" "), _fmt(e["ymin"]), F.lit(", "),
        _fmt(e["xmax"]), F.lit(" "), _fmt(e["ymax"]), F.lit(", "),
        _fmt(e["xmin"]), F.lit(" "), _fmt(e["ymax"]), F.lit(", "),
        _fmt(e["xmin"]), F.lit(" "), _fmt(e["ymin"]),
        F.lit("))"),
    )
    return F.when(e.isNull(), g).when(_is_point(e), point).otherwise(ring)


def area(g: Column) -> Column:
    """AreaTransformer / Utils.scala getAreaFromGeometry on the
    envelope class: width x height in squared coordinate units
    (exact for boxes and points; string-typed like the reference)."""
    e = wkt_envelope(g)
    a = (e["xmax"] - e["xmin"]) * (e["ymax"] - e["ymin"])
    return F.when(e.isNull(), g).otherwise(_fmt(a))


def buffer_envelope(g: Column, distance: float) -> Column:
    """BufferTransformer on the envelope class: the envelope of
    JTS ``buffer(d)`` is exactly the input envelope expanded by d on
    every side, which is what we emit (the rounded corners of the
    true buffer polygon are below envelope resolution by
    construction)."""
    e = wkt_envelope(g)
    d = float(distance)
    grown = F.concat(
        F.lit("POLYGON (("),
        _fmt(e["xmin"] - d), F.lit(" "), _fmt(e["ymin"] - d), F.lit(", "),
        _fmt(e["xmax"] + d), F.lit(" "), _fmt(e["ymin"] - d), F.lit(", "),
        _fmt(e["xmax"] + d), F.lit(" "), _fmt(e["ymax"] + d), F.lit(", "),
        _fmt(e["xmin"] - d), F.lit(" "), _fmt(e["ymax"] + d), F.lit(", "),
        _fmt(e["xmin"] - d), F.lit(" "), _fmt(e["ymin"] - d),
        F.lit("))"),
    )
    return F.when(e.isNull(), g).otherwise(grown)


def w3c_geo_point(lat: Column, long: Column) -> Column:
    """Parser.scala:127 latLongConcat: ``POINT (lat long)`` — the
    reference concatenates lat first; replicated verbatim."""
    return F.concat(
        F.lit("POINT ("), lat.cast("string"), F.lit(" "), long.cast("string"), F.lit(")")
    )


def points_to_centroid(lats: Column, longs: Column) -> Column:
    """Utils.scala pointsToCentroidTransformer: mean of the lat
    values and mean of the long values, concatenated as a POINT.
    Array columns in, one WKT out."""
    mean = lambda a: F.aggregate(  # noqa: E731
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double")
    ) / F.size(a)
    return w3c_geo_point(mean(lats), mean(longs))


RELATIONS = (
    "equals",
    "disjoint",
    "intersects",
    "touches",
    "contains",
    "within",
    "overlaps",
    "crosses",
)

SPATIAL_MEASURES = {
    **{f"s{r.capitalize()}": (lambda rel: (lambda g1, g2, limit=1.0: s_relation(g1, g2, rel, limit)))(r) for r in RELATIONS},
    "sCentroidDistance": centroid_distance,
    "sMinDistance": min_distance,
}

SPATIAL_TRANSFORMERS = {
    "envelopeTransformer": envelope_wkt,
    "geometryTransformer": envelope_wkt,
    "areaTransformer": area,
    "bufferTransformer": buffer_envelope,
    "w3cGeoTransformer": w3c_geo_point,
    "pointsToCentroidTransformer": points_to_centroid,
}
