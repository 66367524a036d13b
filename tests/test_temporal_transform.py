"""Allen relations + TransformSpec executor."""

import pytest
from pyspark.sql import functions as F

from silk_spark.functions.temporal import ALLEN_RELATIONS, allen_relation, time_distance
from silk_spark.operators.transform_spec import TransformSpec


class TestAllen:
    CASES = [
        # (s1, e1, s2, e2, relation)
        (0, 1, 2, 3, "before"),
        (2, 3, 0, 1, "after"),
        (0, 2, 2, 3, "meets"),
        (2, 3, 0, 2, "metBy"),
        (0, 2, 1, 3, "overlaps"),
        (1, 3, 0, 2, "overlappedBy"),
        (0, 1, 0, 3, "starts"),
        (0, 3, 0, 1, "startedBy"),
        (1, 2, 0, 3, "during"),
        (0, 3, 1, 2, "contains"),
        (2, 3, 0, 3, "finishes"),
        (0, 3, 2, 3, "finishedBy"),
        (1, 2, 1, 2, "equals"),
    ]

    def test_all_13_relations(self, spark):
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(d), want) for a, b, c, d, want in self.CASES],
            "s1 double, e1 double, s2 double, e2 double, want string",
        )
        rows = df.select(
            "want",
            allen_relation(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")).alias("got"),
        ).collect()
        for r in rows:
            assert r.got == r.want, (r.want, r.got)

    def test_relations_are_exclusive(self, spark):
        # each case triggers exactly one predicate
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(d)) for a, b, c, d, _ in self.CASES],
            "s1 double, e1 double, s2 double, e2 double",
        )
        hits = df.select(
            sum(
                fn(F.col("s1"), F.col("e1"), F.col("s2"), F.col("e2")).cast("int")
                for fn in ALLEN_RELATIONS.values()
            ).alias("n")
        ).collect()
        assert all(r.n == 1 for r in hits)

    def test_time_distance_units(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01 00:00:00", "2024-01-02 06:00:00")], "a string, b string"
        )
        r = df.select(
            time_distance(F.col("a"), F.col("b"), "hours").alias("h"),
            time_distance(F.col("a"), F.col("b"), "days").alias("d"),
        ).first()
        assert r.h == pytest.approx(30.0) and r.d == pytest.approx(1.25)


class TestTransformSpec:
    def test_execute_clean_and_quarantine(self, spark):
        df = spark.createDataFrame(
            [(1, "ok", 5.0), (2, "ok", 50.0), (3, "bad type", 5.0)],
            "id bigint, kind string, v double",
        )
        spec = (
            TransformSpec()
            .uri(["id"], prefix="urn:x:")
            .direct("id", "id")
            .complex("v_ok", lambda d: F.col("v"), validate=lambda c: c <= 10.0)
            .complex("kind_ok", lambda d: F.col("kind"), validate=lambda c: c == "ok")
        )
        out, obs = spec.execute(df)
        rows = {r.id: r for r in out.collect()}
        assert rows[1]._uri == "urn:x:1" and rows[1]._errors == []
        assert rows[2].v_ok is None and rows[2]._errors == ["v_ok"]
        assert rows[3].kind_ok is None and rows[3]._errors == ["kind_ok"]
        assert TransformSpec.clean(out).count() == 1
        assert TransformSpec.quarantine(out).count() == 2
        rep = dict(obs.get)
        assert rep["rows"] == 3 and rep["rows_with_errors"] == 2

    def test_single_projection_plan(self, spark):
        """All rules must compile into one projection (no joins/shuffles)."""
        df = spark.createDataFrame([(1, "a")], "id bigint, s string")
        spec = TransformSpec().direct("id", "id").complex("up", lambda d: F.upper("s"))
        out, _ = spec.execute(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
        assert "Exchange" not in plan and "Join" not in plan
