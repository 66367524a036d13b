"""Exhaustive validation of the envelope DE-9IM algebra against an
independent rasterized topology oracle.

Universe: every point and every axis-aligned box with integer
coordinates in [-2, 2] (125 geometries, 15 625 ordered pairs). For
this universe a half-integer sample grid decides every DE-9IM cell
EXACTLY: any nonempty interior/boundary/exterior intersection of two
integer-coordinate points/boxes is an integer-corner open box, an
integer-coordinate segment, or an integer point — all of which
contain a half-integer grid point. The oracle classifies each grid
point as Interior/Boundary/Exterior per geometry straight from the
set definitions (no interval algebra anywhere near it), then derives
the named relations from the official JTS DE-9IM patterns — so a
shared blind spot with functions/spatial.py's covers/interiors-meet
derivations is structurally impossible.

One crossJoin evaluates all pairs x (9 cells + 8 relations) in a
single Spark job.
"""

import itertools

from pyspark.sql import functions as F

from silk_spark.functions.spatial import (
    _de9im_cells,
    RELATIONS,
    envelopes_relate,
    wkt_envelope,
)

COORDS = range(-2, 3)
GRID = [x / 2 for x in range(-6, 7)]  # half-integers in [-3, 3]


def _geometries():
    geoms = [("P", x, y, x, y) for x in COORDS for y in COORDS]
    geoms += [
        ("B", x0, y0, x1, y1)
        for x0, x1 in itertools.combinations(COORDS, 2)
        for y0, y1 in itertools.combinations(COORDS, 2)
    ]
    return geoms


def _wkt(kind, x0, y0, x1, y1):
    if kind == "P":
        return f"POINT ({x0} {y0})"
    return (
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


def _classify(kind, x0, y0, x1, y1, px, py):
    """I/B/E of one grid point w.r.t. one geometry, from the set
    definitions: a point's interior is itself and its boundary empty
    (JTS 0-dim convention); a box's boundary is its outline."""
    if kind == "P":
        return "I" if (px, py) == (x0, y0) else "E"
    inside_x, inside_y = x0 < px < x1, y0 < py < y1
    on_x, on_y = x0 <= px <= x1, y0 <= py <= y1
    if inside_x and inside_y:
        return "I"
    if on_x and on_y:
        return "B"
    return "E"


def _oracle_cells(g1, g2):
    seen = set()
    for px in GRID:
        for py in GRID:
            seen.add(_classify(*g1, px, py) + _classify(*g2, px, py))
    # EE is decided by any far-away point; the grid contains plenty
    return {c: (c in seen) for c in
            ("II", "IB", "IE", "BI", "BB", "BE", "EI", "EB", "EE")}


def _oracle_relations(c):
    """Named relations from the official JTS DE-9IM patterns."""
    return {
        "disjoint": not (c["II"] or c["IB"] or c["BI"] or c["BB"]),
        "intersects": c["II"] or c["IB"] or c["BI"] or c["BB"],
        "equals": c["II"] and not c["IE"] and not c["BE"]
        and not c["EI"] and not c["EB"],
        "touches": (not c["II"]) and (c["IB"] or c["BI"] or c["BB"]),
        "contains": c["II"] and not c["EI"] and not c["EB"],
        "within": c["II"] and not c["IE"] and not c["BE"],
        "overlaps": c["II"] and c["IE"] and c["EI"],
        # crosses needs dim(I1 ∩ I2) < max dim with mixed-dim operands
        # (or L/L) — identically false over points and boxes
        "crosses": False,
    }


def test_de9im_cells_and_relations_exhaustive(spark):
    geoms = _geometries()
    rows = [(i, _wkt(*g)) for i, g in enumerate(geoms)]
    df = spark.createDataFrame(rows, ["gid", "wkt"])
    L = df.select(F.col("gid").alias("i"), F.col("wkt").alias("w1"))
    R = df.select(F.col("gid").alias("j"), F.col("wkt").alias("w2"))
    e1, e2 = wkt_envelope(F.col("w1")), wkt_envelope(F.col("w2"))
    cells = _de9im_cells(e1, e2)
    cols = [F.coalesce(v, F.lit(False)).alias(f"c_{k}") for k, v in cells.items()]
    cols += [
        envelopes_relate(e1, e2, r).alias(f"r_{r}") for r in RELATIONS
    ]
    got = (
        L.crossJoin(R)
        .select("i", "j", *cols)
        .toPandas()
        .set_index(["i", "j"])
        .sort_index()
    )
    assert len(got) == len(geoms) ** 2

    bad = []
    for (i, g1), (j, g2) in itertools.product(
        enumerate(geoms), enumerate(geoms)
    ):
        want_c = _oracle_cells(g1, g2)
        want_r = _oracle_relations(want_c)
        row = got.loc[(i, j)]
        for k, v in want_c.items():
            if bool(row[f"c_{k}"]) != v:
                bad.append((g1, g2, "cell", k, bool(row[f"c_{k}"]), v))
        for k, v in want_r.items():
            if bool(row[f"r_{k}"]) != v:
                bad.append((g1, g2, "rel", k, bool(row[f"r_{k}"]), v))
    assert not bad, f"{len(bad)} mismatches; first 10: {bad[:10]}"
