"""Spatial envelope/point slice vs the reference's own golden WKT
fixtures (silk-plugins-spatial-temporal/src/test/.../spatial/
relation/*MetricTest.scala, distance/*MetricTest.scala) plus algebra
properties the goldens don't pin."""

import math

import pytest
from pyspark.sql import functions as F

from silk_spark.functions.spatial import (
    area,
    buffer_envelope,
    centroid_distance,
    envelope_blocks,
    envelope_wkt,
    min_distance,
    points_to_centroid,
    s_negate_relation,
    s_relate,
    s_relation,
    w3c_geo_point,
    wkt_envelope,
)

BOX22 = "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"
INF = float("inf")


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _rel(spark, g1, g2, relation, limit=0.0, negate=False):
    f = s_negate_relation if negate else s_relation
    return _eval(spark, f(F.lit(g1), F.lit(g2), relation, limit))


class TestRelationGoldens:
    """Each case is a reference *MetricTest.scala expectation."""

    def test_contains(self, spark):  # ContainsMetricTest.scala:33
        assert _rel(spark, BOX22, "POINT (1 1)", "contains") == 0.0

    def test_disjoint(self, spark):  # DisjointMetricTest.scala:33
        assert _rel(spark, BOX22, "POINT (3 3)", "disjoint") == 0.0

    def test_equals(self, spark):  # EqualsMetricTest.scala:33
        assert _rel(spark, "POINT (0 0)", "POINT (0 0)", "equals") == 0.0

    def test_intersects(self, spark):  # IntersectsMetricTest.scala:33
        assert (
            _rel(
                spark,
                "POLYGON ((0 0, 0 3, 3 3, 3 0, 0 0))",
                "POLYGON ((1 1, 1 2, 2 2, 2 1, 1 1))",
                "intersects",
            )
            == 0.0
        )

    def test_touches(self, spark):  # OverlapsMetricTest.scala:33 (file
        # holds the touches fixture: boxes sharing the y=2 edge)
        assert (
            _rel(spark, BOX22, "POLYGON ((0 2, 0 4, 4 4, 4 2, 0 2))", "touches")
            == 0.0
        )

    def test_overlaps(self, spark):  # TouchesMetricTest.scala:33 (file
        # holds the overlaps fixture)
        assert (
            _rel(spark, BOX22, "POLYGON ((0 1, 0 3, 3 3, 3 1, 0 1))", "overlaps")
            == 0.0
        )

    def test_within(self, spark):  # WithinMetricTest.scala:33-38
        assert _rel(spark, "POINT (1 1)", BOX22, "within") == 0.0
        assert _rel(spark, "POINT (3 3)", BOX22, "within") == INF

    def test_negate_contains(self, spark):  # NegateMetricTest.scala:15
        assert _rel(spark, BOX22, "POINT (0 3)", "contains", negate=True) == 0.0

    def test_boundary_point_not_contained(self, spark):
        # NegateMetricTest.scala:26 double-negation case reduces to:
        # JTS contains(box, corner point) is FALSE (touch, not contain)
        assert _rel(spark, BOX22, "POINT (0 2)", "contains") == INF
        assert _rel(spark, BOX22, "POINT (0 2)", "touches") == 0.0

    def test_relate_disjoint_pattern(self, spark):
        # NegateMetricTest.scala:10 FF*FF**** == disjoint
        assert (
            _eval(spark, s_relate(F.lit(BOX22), F.lit("POINT (3 3)"), "FF*FF****", 0.0))
            == 0.0
        )
        assert (
            _eval(spark, s_relate(F.lit(BOX22), F.lit("POINT (1 1)"), "FF*FF****", 0.0))
            == INF
        )

    def test_relate_named_equivalence(self, spark):
        # DE-9IM patterns for contains / within / equals agree with
        # the named relations on a mixed case set
        cases = [
            (BOX22, "POINT (1 1)"),
            (BOX22, "POINT (0 2)"),
            (BOX22, BOX22),
            (BOX22, "POLYGON ((0 1, 0 3, 3 3, 3 1, 0 1))"),
            (BOX22, "POINT (3 3)"),
            ("POINT (1 1)", BOX22),
        ]
        pat = {
            "contains": "T*****FF*",
            "within": "T*F**F***",
            "equals": "T*F**FFF*",
            "intersects": None,  # no single pattern (JTS uses 4)
        }
        for g1, g2 in cases:
            for rel in ("contains", "within", "equals"):
                named = _rel(spark, g1, g2, rel)
                via_pattern = _eval(
                    spark, s_relate(F.lit(g1), F.lit(g2), pat[rel], 0.0)
                )
                assert named == via_pattern, (g1, g2, rel)

    def test_parse_failure_semantics(self, spark):
        # Utils.scala:293-296 / :310-313 — relation +inf, negate limit
        assert _rel(spark, "nonsense", BOX22, "intersects") == INF
        assert _rel(spark, "nonsense", BOX22, "intersects", 0.5, negate=True) == 0.5

    def test_crosses_false_for_supported_classes(self, spark):
        assert _rel(spark, BOX22, "POINT (1 1)", "crosses") == INF


class TestDistanceGoldens:
    ATHENS_A = "POINT (37.9889023 23.7180747)"
    ATHENS_B = "POINT (37.9884826 23.7181476)"

    @pytest.mark.parametrize("fn", [centroid_distance, min_distance])
    def test_goldens(self, spark, fn):
        # {Centroid,Min}DistanceMetricTest.scala: identical points 0;
        # box vs its own center 0; ~47 m pair finite at limit 100,
        # +inf at limit 10
        z = _eval(spark, fn(F.lit("POINT (0 0)"), F.lit("POINT (0 0)"), 1.0))
        assert z == 0.0
        c = _eval(spark, fn(F.lit(BOX22), F.lit("POINT (1 1)"), 1.0))
        assert c == 0.0
        near = _eval(spark, fn(F.lit(self.ATHENS_A), F.lit(self.ATHENS_B), 100.0))
        assert near != INF and 0 < near <= 1.0
        assert _eval(spark, fn(F.lit(self.ATHENS_A), F.lit(self.ATHENS_B), 10.0)) == INF

    def test_min_vs_centroid_on_disjoint_boxes(self, spark):
        # min distance sees the facing edges, centroid the middles
        a = "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
        b = "POLYGON ((3 0, 3 1, 4 1, 4 0, 3 0))"
        big = 10_000_000.0
        dmin = _eval(spark, min_distance(F.lit(a), F.lit(b), big)) * big
        dcen = _eval(spark, centroid_distance(F.lit(a), F.lit(b), big)) * big
        # 2 vs 3 degrees of longitude at lat 0.5
        assert dmin < dcen
        assert dmin == pytest.approx(2 / 3 * dcen, rel=1e-3)


class TestBlocking:
    def test_envelope_grid_covers_box(self, spark):
        # box spanning lat 0..2, long 0..2 at bp=1 -> 9 cells (3x3)
        blocks = _eval(spark, envelope_blocks(F.lit(BOX22), 1.0))
        assert len(blocks) == 9 and len(set(blocks)) == 9

    def test_distance_expansion_adds_cells(self, spark):
        # Utils.scala:210-211 — a min-distance threshold pre-expands
        # the envelope so blocking never loses a candidate
        p = "POINT (0.5 0.5)"
        base = set(_eval(spark, envelope_blocks(F.lit(p), 1.0)))
        grown = set(_eval(spark, envelope_blocks(F.lit(p), 1.0, distance=120_000.0)))
        assert base < grown

    def test_shared_cell_iff_near(self, spark):
        a = set(_eval(spark, envelope_blocks(F.lit("POINT (10.2 20.3)"), 1.0)))
        b = set(_eval(spark, envelope_blocks(F.lit("POINT (10.8 20.9)"), 1.0)))
        c = set(_eval(spark, envelope_blocks(F.lit("POINT (50 50)"), 1.0)))
        assert a & b and not a & c

    def test_unparseable_empty(self, spark):
        assert _eval(spark, envelope_blocks(F.lit("junk"), 1.0)) == []


class TestTransformers:
    def test_envelope_wkt_matches_jts_forms(self, spark):
        # JTS getEnvelope().toText(): POINT for points, the
        # (min,min)->(max,min)->(max,max)->(min,max) ring for boxes
        assert _eval(spark, envelope_wkt(F.lit("POINT (1.5 2)"))) == "POINT (1.5 2)"
        assert (
            _eval(spark, envelope_wkt(F.lit("POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))")))
            == "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
        )
        assert _eval(spark, envelope_wkt(F.lit("junk"))) == "junk"

    def test_area(self, spark):
        assert _eval(spark, area(F.lit(BOX22))) == "4"
        assert _eval(spark, area(F.lit("POINT (5 5)"))) == "0"

    def test_buffer_grows_envelope(self, spark):
        out = _eval(spark, buffer_envelope(F.lit("POINT (1 1)"), 0.5))
        assert out == "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"

    def test_w3c_geo_and_centroid(self, spark):
        # Parser.scala:127 latLongConcat is lat-first, verbatim
        assert (
            _eval(spark, w3c_geo_point(F.lit(52.37), F.lit(10.73)))
            == "POINT (52.37 10.73)"
        )
        got = _eval(
            spark,
            points_to_centroid(
                F.array(F.lit("1.0"), F.lit("3.0")), F.array(F.lit("10.0"), F.lit("30.0"))
            ),
        )
        assert got == "POINT (2.0 20.0)"

    def test_envelope_struct_scientific_notation(self, spark):
        e = _eval(spark, wkt_envelope(F.lit("POINT (1e2 -2.5E-1)")))
        assert (e["xmin"], e["ymin"]) == (100.0, -0.25)


class TestPlanShape:
    def test_no_python_in_relation_plan(self, spark):
        # the whole module must stay JVM-side Column arithmetic
        df = spark.range(4).select(
            F.concat(F.lit("POINT ("), F.col("id"), F.lit(" 1)")).alias("g")
        )
        out = df.select(
            s_relation(F.col("g"), F.lit(BOX22), "within", 0.0).alias("d"),
            min_distance(F.col("g"), F.lit(BOX22), 1e6).alias("m"),
            envelope_blocks(F.col("g"), 1.0).alias("b"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_relation_inside_blocked_join(self, spark):
        # end-to-end: envelope-grid blocking + exact relation verify,
        # the same candidate-join shape as every other measure
        import math as _m

        pts = [(i, f"POINT ({i % 7} {(i * 3) % 5})") for i in range(60)]
        boxes = [
            (j, f"POLYGON (({j % 5} {j % 3}, {j % 5} {j % 3 + 2}, "
                f"{j % 5 + 2} {j % 3 + 2}, {j % 5 + 2} {j % 3}, {j % 5} {j % 3}))")
            for j in range(20)
        ]
        L = spark.createDataFrame(pts, ["lid", "g1"]).withColumn(
            "blk", F.explode(envelope_blocks(F.col("g1"), 1.0))
        )
        R = spark.createDataFrame(boxes, ["rid", "g2"]).withColumn(
            "blk", F.explode(envelope_blocks(F.col("g2"), 1.0))
        )
        got = (
            L.join(R, "blk")
            .select("lid", "rid", "g1", "g2")
            .dropDuplicates(["lid", "rid"])
            .where(s_relation(F.col("g1"), F.col("g2"), "within", 0.0) == 0.0)
            .select("lid", "rid")
        )
        want = {
            (i, j)
            for i, gp in pts
            for j, gb in boxes
            if (lambda px, py, xs, ys: xs[0] < px < xs[1] and ys[0] < py < ys[1])(
                i % 7, (i * 3) % 5, (j % 5, j % 5 + 2), (j % 3, j % 3 + 2)
            )
        }
        assert {(r["lid"], r["rid"]) for r in got.collect()} == want
        assert not _m.isnan(len(want))  # fixture sanity: nonempty set
        assert want
