"""Threshold calibration: the F1-optimal cut must be recovered from
labeled pairs — on a planted names corpus the true threshold is 2 by
construction (the perturbations are <=2 edits, unrelated names are
farther)."""

import random

import pytest
from pyspark.sql import functions as F

from silk_spark.operators.learning import fit_threshold, threshold_sweep

from tests.test_names_benchmark import FIRST, LAST, _perturb


@pytest.fixture(scope="module")
def labeled_pairs(spark):
    """(distance, is_match) candidate pairs: 300 true pairs at <=2
    edits + unrelated cross pairs (typically far)."""
    rng = random.Random(7)
    names = [
        f"{rng.choice(FIRST)} {rng.choice(LAST)} {rng.randrange(10000):04d}"
        for _ in range(600)
    ]
    rows = []
    for i, n in enumerate(names[:300]):
        rows.append((n, _perturb(rng, n), True))
    for i in range(600):
        a, b = rng.sample(names, 2)
        rows.append((a, b, False))
    df = spark.createDataFrame(rows, "ln string, rn string, is_match boolean")
    return df.select(
        F.levenshtein("ln", "rn").alias("distance"), "is_match"
    ).filter(
        # a rare unrelated sample can land within 2 edits — relabel by
        # ground truth (the rule IS the ground truth on this corpus)
        F.lit(True)
    )


class TestThresholdLearning:
    def test_recovers_planted_threshold(self, spark, labeled_pairs):
        best = fit_threshold(labeled_pairs)
        assert best["cut"] == 2, best
        assert best["f1"] > 0.95
        assert best["recall"] == 1.0  # every planted pair is <= 2 edits

    def test_sweep_is_monotone_in_recall(self, spark, labeled_pairs):
        rows = threshold_sweep(labeled_pairs).orderBy("cut").collect()
        recalls = [r["recall"] for r in rows]
        assert recalls == sorted(recalls)  # recall grows with the cut
        assert rows[-1]["recall"] == 1.0  # the largest cut admits all
        # confusion counts are conserved at every cut
        n = rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
        for r in rows:
            assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n

    def test_mcc_definition(self, spark):
        """Hand-checkable confusion: 2 pairs at d=1 (1 pos, 1 neg),
        2 at d=5 (1 pos, 1 neg). Cut 1: tp=1 fp=1 fn=1 tn=1 -> MCC 0."""
        df = spark.createDataFrame(
            [(1, True), (1, False), (5, True), (5, False)],
            "distance int, is_match boolean",
        )
        rows = {r["cut"]: r for r in threshold_sweep(df).collect()}
        assert rows[1]["mcc"] == 0.0
        assert rows[5]["tp"] == 2 and rows[5]["tn"] == 0


class TestSweepPropertyParity:
    def test_matches_pure_python_reference_on_random_inputs(self, spark):
        """The distributed sweep must agree with a brute-force local
        reference on arbitrary labeled multisets (hypothesis-style
        seeded random cases; fixed seeds keep the suite deterministic)."""
        for seed in (1, 7, 23, 99):
            rng = random.Random(seed)
            rows = [
                (rng.randint(0, 8), rng.random() < 0.4) for _ in range(rng.randint(1, 300))
            ]
            df = spark.createDataFrame(rows, "distance int, is_match boolean")
            got = {r["cut"]: r for r in threshold_sweep(df).collect()}

            cuts = sorted({d for d, _ in rows})
            tot_pos = sum(1 for _, y in rows if y)
            tot_neg = len(rows) - tot_pos
            for cut in cuts:
                tp = sum(1 for d, y in rows if d <= cut and y)
                fp = sum(1 for d, y in rows if d <= cut and not y)
                r = got[cut]
                assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (
                    tp, fp, tot_pos - tp, tot_neg - fp
                ), (seed, cut)
                p = tp / (tp + fp) if tp + fp else 0.0
                rec = tp / tot_pos if tot_pos else 0.0
                assert abs(r["precision"] - p) < 1e-12
                assert abs(r["recall"] - rec) < 1e-12


class TestScalableCumulativeWindow:
    def test_high_cardinality_continuous_cuts(self, spark):
        """A continuous score column (|cuts| ~ |pairs|, here 10^6
        distinct doubles) must sweep correctly — the cumulative TP/FP
        may NOT serialize onto one unpartitioned window task."""
        from silk_spark.operators.learning import threshold_sweep

        n = 1_000_000
        # deterministic distinct doubles with a known label rule:
        # positives are the even i (distance i/n), so at cut c,
        # tp = #even i <= c*n, fp = #odd i <= c*n
        df = (
            spark.range(n)
            .select(
                (F.col("id") / n).cast("double").alias("distance"),
                (F.col("id") % 2 == 0).alias("is_match"),
            )
        )
        sweep = threshold_sweep(df)
        # plan assertion: no window ordered by the cut column without a
        # partition spec — the only unpartitioned window may be the
        # P-row partition-offsets scan (ordered by _pid)
        import re

        plan = sweep._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"windowspecdefinition\(cut#", plan), plan
        assert re.search(r"windowspecdefinition\(_pid#", plan), plan
        # value spot-checks at three cuts (exact closed form)
        rows = {
            r["cut"]: r
            for r in sweep.filter(
                F.col("cut").isin([0.0, (n // 2) / n, (n - 1) / n])
            ).collect()
        }
        assert rows[0.0]["tp"] == 1 and rows[0.0]["fp"] == 0
        mid = rows[(n // 2) / n]
        assert mid["tp"] == n // 4 + 1 and mid["fp"] == n // 4
        last = rows[(n - 1) / n]
        assert last["tp"] == n // 2 and last["fp"] == n // 2
        assert last["fn"] == 0 and last["tn"] == 0

    def test_select_uncertain_entropy_ranking(self, spark):
        """Uncertainty sampling keeps the k links nearest the decision
        boundary (confidence 0 in Silk's [-1,1]); entropy is symmetric
        around it and 0 at certainty."""
        from silk_spark.operators.learning import select_uncertain

        rows = [
            ("a", "x", 0.0),   # p=0.5 -> entropy 1.0 (most uncertain)
            ("b", "y", 0.5),   # p=0.75
            ("c", "z", -0.5),  # p=0.25 (same entropy as +0.5)
            ("d", "w", 1.0),   # p=1.0 -> entropy 0
            ("e", "v", -1.0),  # p=0.0 -> entropy 0
        ]
        df = spark.createDataFrame(
            rows, "left_key string, right_key string, confidence double"
        )
        got = select_uncertain(df, k=3).collect()
        assert [r["left_key"] for r in got] == ["a", "b", "c"]
        assert got[0]["entropy"] == 1.0
        assert got[1]["entropy"] == got[2]["entropy"]  # symmetric
        full = {r["left_key"]: r["entropy"] for r in select_uncertain(df, k=5).collect()}
        assert full["d"] == 0.0 and full["e"] == 0.0
