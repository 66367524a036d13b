"""StringMap (FastMap) execution method: mapped-space contraction,
candidate completeness vs the exact pair set (the reference harness's
pairs-completeness criterion, GenerateLinksTest.scala:110-124)."""

import pytest
from pyspark.sql import functions as F

from silk_spark.operators.stringmap import (
    fastmap_fit,
    map_value,
    stringmap_candidate_pairs,
)

NAMES = [
    "john smith", "jon smith", "john smyth", "jane smith",
    "peter miller", "petra miller", "peter muller",
    "alice johnson", "alise johnson", "bob brown", "robert brown",
    "carol white", "carole white", "david black", "davide black",
    "eve green", "eva green", "frank stone", "franka stone",
    "grace hill", "gracie hill",
]


def _true_pairs(names, t=2):
    from silk_spark.functions.measures import _plain_levenshtein

    return {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if 0 < _plain_levenshtein(a, b) <= t
    }


class TestFastMapModel:
    def test_mapped_distance_tracks_string_distance(self):
        model = fastmap_fit(NAMES, dimensionality=10, dist_threshold=2)
        c1, c2, c3 = (map_value(model, s) for s in ("john smith", "jon smith", "peter miller"))
        d = lambda a, b: sum((x - y) ** 2 for x, y in zip(a, b)) ** 0.5  # noqa: E731
        assert d(c1, c2) < d(c1, c3)  # near pair maps near, far pair far

    def test_deterministic(self):
        m1 = fastmap_fit(NAMES, dimensionality=5)
        m2 = fastmap_fit(NAMES, dimensionality=5)
        assert m1 == m2

    def test_threshold_clamped_to_true_distance(self):
        """The learned pruning radius is a max over SAMPLED in-threshold
        pairs; with a sample containing none (all strings mutually far)
        the radius must clamp to dist_threshold, never below — an
        unsampled true pair would otherwise be silently dropped."""
        import hashlib

        far = [hashlib.md5(str(i).encode()).hexdigest()[:16] for i in range(40)]
        from silk_spark.functions.measures import _plain_levenshtein

        assert all(
            _plain_levenshtein(a, b) > 2 for i, a in enumerate(far) for b in far[i + 1 :]
        )
        m = fastmap_fit(far, dimensionality=8, dist_threshold=2)
        assert m.mapped_threshold >= 2.0


class TestCandidatePairs:
    def test_pairs_completeness_on_golden(self, spark):
        """Every true lev<=2 pair must survive the mapped-space filter
        (completeness 1.0 on the golden fixture — the criterion the
        reference benchmarks each execution method against)."""
        df = spark.createDataFrame([(i, n) for i, n in enumerate(NAMES)], "id int, name string")
        cand = stringmap_candidate_pairs(
            df, df, "name", "name", dist_threshold=2, dimensionality=10, sample_size=50
        )
        got = {
            tuple(sorted((r["left_name"], r["right_name"])))
            for r in cand.collect()
            if r["left_name"] != r["right_name"]
        }
        want = {tuple(sorted(p)) for p in _true_pairs(NAMES)}
        missed = want - got
        assert not missed, f"missed true pairs: {missed}"

    def test_prunes_far_pairs(self, spark):
        df = spark.createDataFrame([(i, n) for i, n in enumerate(NAMES)], "id int, name string")
        cand = stringmap_candidate_pairs(
            df, df, "name", "name", dist_threshold=2, dimensionality=10, sample_size=50
        )
        n = len(NAMES)
        distinct = cand.filter(F.col("left_name") != F.col("right_name")).count()
        assert distinct < n * (n - 1)  # strictly fewer than all ordered pairs

    def test_recall_survives_unsampled_true_pairs(self, spark):
        """Fit on a sample that (deterministically) misses every
        in-threshold pair: 200 mutually-far hex strings dominate the
        sample, the 5 planted near-dup pairs are a drop in it. The
        clamped radius must still keep recall 1.0 on the planted
        pairs."""
        import hashlib

        base = [hashlib.md5(f"far{i}".encode()).hexdigest()[:20] for i in range(200)]
        planted = [
            ("alpha beta gamma", "alpha beta gamm"),
            ("delta epsilon zeta", "delta epsilon zet"),
            ("ping pong table", "ping pong tible"),
            ("quick brown foxes", "quick brown foxed"),
            ("lazy sleeping dog", "lazy sleeping dig"),
        ]
        names = base + [s for p in planted for s in p]
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(names)], "id int, name string"
        )
        cand = stringmap_candidate_pairs(
            df, df, "name", "name", dist_threshold=2, dimensionality=8, sample_size=40
        )
        got = {
            tuple(sorted((r["left_name"], r["right_name"]))) for r in cand.collect()
        }
        for p in planted:
            assert tuple(sorted(p)) in got, f"planted pair lost: {p}"

    def test_empty_input_returns_empty_frame(self, spark):
        df = spark.createDataFrame([], "id int, name string")
        cand = stringmap_candidate_pairs(df, df, "name", "name")
        assert cand.count() == 0
        assert "mapped_dist" in cand.columns
        assert "left_name" in cand.columns and "right_name" in cand.columns


class TestJvmCoordinateParity:
    def test_expr_matches_udf_bit_exact(self, spark):
        """The JVM Column compilation of map_value must reproduce the
        pandas-UDF coordinates BIT-FOR-BIT (same IEEE-754 op sequence:
        sequential projection subtraction, sqrt-then-square, same
        association) — any drift would silently move grid-cell
        boundaries in the candidate join."""
        from silk_spark.operators.stringmap import (
            fastmap_coordinates,
            fastmap_coordinates_expr,
        )

        model = fastmap_fit(NAMES, dimensionality=10, dist_threshold=2)
        rows = [(n,) for n in NAMES] + [("",), (None,), ("zzzz unrelated query",)]
        df = spark.createDataFrame(rows, "name string")
        got = df.select(
            "name",
            fastmap_coordinates(model)(F.col("name")).alias("udf"),
            fastmap_coordinates_expr(model, F.col("name")).alias("expr"),
        ).collect()
        for r in got:
            if r["name"] is None:
                assert r["udf"] is None and r["expr"] is None
                continue
            assert r["udf"] == r["expr"], (
                f"coordinate drift for {r['name']!r}: {r['udf']} != {r['expr']}"
            )
            # and both match the driver-side reference implementation
            assert r["expr"] == map_value(model, r["name"])
