"""GenLink GP rule-structure search: distributed fitness evaluation
math, planted-rule recovery, determinism, batching parity.

Reference semantics under test: LinkageRuleEvaluator.scala:20-75
(predicted-positive iff confidence >= 0), GenLink.scala:36-103 stop
statuses, MutationFunction.scala:46-49 / the specialized crossover
operator set."""

import pytest
from pyspark.sql import functions as F

from silk_spark.operators.genlink import (
    CandidateRule,
    ComparisonSpace,
    GenLinkParams,
    evaluate_rules,
    learn_rule,
    random_rule,
)
from silk_spark.operators.linking import Comparison


@pytest.fixture(scope="module")
def labeled_pairs(spark):  # noqa: F811
    """120 word pairs; ground truth = edit distance <= 2 (a planted
    levenshteinDistance rule with threshold in [2, 3))."""
    base = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
        "golf", "hotel", "india", "juliet",
    ]
    rows = []
    for i, w in enumerate(base):
        for j in range(12):
            if j % 4 == 0:
                other = w + "x" * (j // 4 % 2 + 1)  # dist 1-2: match
            elif j % 4 == 1:
                other = w + "xyz"  # dist exactly 3: non-match, pins
                # the learnable threshold into [2, 3)
            elif j % 4 == 2:
                other = w[:2] + "zzzz" + str(j)  # far: non-match
            else:
                other = base[(i + j) % len(base)]  # other word
            rows.append((w, other))
    df = spark.createDataFrame(rows, ["left_name", "right_name"])
    return df.withColumn(
        "is_match", F.levenshtein("left_name", "right_name") <= 2
    ).persist()


def _planted_space():
    return [ComparisonSpace("levenshteinDistance", "name", max_threshold=4.0)]


class TestEvaluateRules:
    def test_confusion_math_matches_hand_count(self, spark, labeled_pairs):  # noqa: F811
        # threshold 2.5: conf = 1 - d/2.5 >= 0 iff d <= 2.5 iff d <= 2
        rule = CandidateRule(
            "min",
            (Comparison("levenshteinDistance", "name", threshold=2.5),),
        )
        (m,) = evaluate_rules(labeled_pairs, [rule])
        n_pos = labeled_pairs.filter("is_match").count()
        n = labeled_pairs.count()
        assert (m["tp"], m["fp"]) == (n_pos, 0)
        assert (m["fn"], m["tn"]) == (0, n - n_pos)
        assert m["f1"] == 1.0 and m["mcc"] == 1.0

    def test_partial_rule_metrics(self, spark, labeled_pairs):  # noqa: F811
        # threshold 1.0 misses the distance-2 positives: recall < 1,
        # precision stays 1 (no non-match is within distance 1)
        rule = CandidateRule(
            "max",
            (Comparison("levenshteinDistance", "name", threshold=1.0),),
        )
        (m,) = evaluate_rules(labeled_pairs, [rule])
        assert m["fp"] == 0 and m["fn"] > 0
        assert m["precision"] == 1.0 and 0 < m["recall"] < 1.0
        assert 0 < m["f1"] < 1.0

    def test_eval_batch_chunking_is_invisible(self, spark, labeled_pairs):  # noqa: F811
        import random

        rng = random.Random(7)
        rules = [random_rule(rng, _planted_space()) for _ in range(9)]
        whole = evaluate_rules(labeled_pairs, rules, eval_batch=64)
        chunked = evaluate_rules(labeled_pairs, rules, eval_batch=2)
        assert whole == chunked


class TestSelectByDivergence:
    """JensenShannonDivergenceSelector.scala:33-116 semantics, hand
    computed for a single-rule committee."""

    @staticmethod
    def _h(p: float) -> float:
        import math

        if p <= 0.0 or p >= 1.0:
            return 0.0
        return (-p * math.log(p) - (1 - p) * math.log(1 - p)) / math.log(2)

    def test_hand_computed_single_rule(self, spark):  # noqa: F811
        from silk_spark.operators.genlink import select_by_divergence

        rule = CandidateRule(
            "min",
            (Comparison("levenshteinDistance", "name", threshold=2.5),),
        )
        # one positive reference at distance 1: conf 0.6, p 0.8,
        # fulfilled (conf > 0) -> p_ref = 0.8
        ref = spark.createDataFrame(
            [("alpha", "alphax", True)],
            ["left_name", "right_name", "is_match"],
        )
        # unlabeled at distances 0..4 -> q = 1.0, .8, .6, .4, .3
        links = spark.createDataFrame(
            [
                (0, "kilo", "kilo"),
                (1, "kilo", "kilox"),
                (2, "kilo", "kiloxx"),
                (3, "kilo", "kiloxyz"),
                (4, "kilo", "kilowxyz"),
            ],
            ["pair_id", "left_name", "right_name"],
        )
        out = select_by_divergence(
            links, ref, [rule], k=5, key_cols=("pair_id",)
        ).collect()
        h, p_ref = self._h, 0.8
        expect = {}
        for pid, d in [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]:
            conf = max(1.0 - d / 2.5, -1.0)
            q = conf * 0.5 + 0.5
            jsd = h((p_ref + q) / 2) - (h(p_ref) + h(q)) / 2
            expect[pid] = round(jsd + 0.5 * h(q), 6)
        got = {r["pair_id"]: r["divergence"] for r in out}
        assert got == pytest.approx(expect, abs=2e-6)
        # ordering: most divergent first
        divs = [r["divergence"] for r in out]
        assert divs == sorted(divs, reverse=True)

    def test_unfulfilled_reference_falls_back_to_full_committee(self, spark):  # noqa: F811
        from silk_spark.operators.genlink import select_by_divergence

        rule = CandidateRule(
            "min",
            (Comparison("levenshteinDistance", "name", threshold=2.5),),
        )
        # a POSITIVE reference the rule rejects (distance 4, conf < 0):
        # fulfilled set empty -> fall back to the whole committee
        ref = spark.createDataFrame(
            [("alpha", "alphwxyz", True)],
            ["left_name", "right_name", "is_match"],
        )
        links = spark.createDataFrame(
            [(0, "kilo", "kilox")], ["pair_id", "left_name", "right_name"]
        )
        out = select_by_divergence(
            links, ref, [rule], k=1, key_cols=("pair_id",)
        ).collect()
        h = self._h
        p_ref = max(1.0 - 4 / 2.5, -1.0) * 0.5 + 0.5  # 0.2
        q = 0.8
        jsd = h((p_ref + q) / 2) - (h(p_ref) + h(q)) / 2
        assert out[0]["divergence"] == pytest.approx(
            round(jsd + 0.5 * h(q), 6), abs=2e-6
        )


class TestCleanPopulation:
    """CleanPopulationTask.scala:34-160 — batched redundancy probes +
    structural duplicate removal with random backfill."""

    def test_redundant_comparison_dropped(self, spark, labeled_pairs):  # noqa: F811
        import random

        from silk_spark.operators.genlink import (
            clean_population,
            evaluate_rules,
        )

        # comparison 2 duplicates comparison 1 -> dropping it cannot
        # change fitness, so the clean must shrink the rule to one
        rule = CandidateRule(
            "min",
            (
                Comparison("levenshteinDistance", "name", threshold=2.5),
                Comparison("levenshteinDistance", "name", threshold=2.7),
            ),
        )
        (m,) = evaluate_rules(labeled_pairs, [rule])
        out = clean_population(
            labeled_pairs,
            [(rule, m["f1"])],
            _planted_space(),
            random.Random(0),
            GenLinkParams(),
        )
        assert len(out) == 1
        cleaned, fit = out[0]
        assert len(cleaned.comparisons) == 1
        assert fit == m["f1"]  # fitness inherited (reference :103-109)

    def test_load_bearing_comparisons_survive(self, spark, labeled_pairs):  # noqa: F811
        import random

        from silk_spark.operators.genlink import (
            clean_population,
            evaluate_rules,
        )

        # max-aggregation where each arm rescues pairs the other
        # rejects: name admits distance <= 2, the far-junk arm admits
        # nothing extra — but a MIN of (useful, useless-negative)
        # breaks without the useful arm, so probe a rule where BOTH
        # arms matter: max(lev(name)<=1, lev(name)<=2.5) -> dropping
        # the 2.5 arm loses the distance-2 positives
        rule = CandidateRule(
            "max",
            (
                Comparison("levenshteinDistance", "name", threshold=1.0),
                Comparison("levenshteinDistance", "name", threshold=2.5),
            ),
        )
        (m,) = evaluate_rules(labeled_pairs, [rule])
        assert m["f1"] == 1.0
        out = clean_population(
            labeled_pairs,
            [(rule, m["f1"])],
            _planted_space(),
            random.Random(0),
            GenLinkParams(),
        )
        cleaned, _ = out[0]
        # the threshold-1.0 arm is redundant (max with the 2.5 arm),
        # the 2.5 arm is load-bearing: exactly it must survive
        assert len(cleaned.comparisons) == 1
        assert cleaned.comparisons[0].threshold == 2.5

    def test_duplicates_replaced_with_fresh_rules(self, spark, labeled_pairs):  # noqa: F811
        import random

        from silk_spark.operators.genlink import clean_population

        # same measure+inputs, different thresholds: structural dups
        a = CandidateRule(
            "min", (Comparison("levenshteinDistance", "name", threshold=2.5),)
        )
        b = CandidateRule(
            "min", (Comparison("levenshteinDistance", "name", threshold=1.0),)
        )
        out = clean_population(
            labeled_pairs,
            [(a, 1.0), (b, 0.8)],
            _planted_space(),
            random.Random(0),
            GenLinkParams(),
        )
        assert len(out) == 2  # size preserved: 1 kept + 1 fresh
        kept = [r for r, f in out if f == 1.0]
        assert kept and kept[0].comparisons[0].threshold == 2.5


class TestLearnRule:
    def test_recovers_planted_rule(self, spark, labeled_pairs):  # noqa: F811
        params = GenLinkParams(
            population_size=24, max_iterations=15, destination_fmeasure=0.999
        )
        res = learn_rule(
            labeled_pairs, _planted_space(), params, seed=11
        )
        assert res["status"] == "Success"
        assert res["f1"] == 1.0
        # behavioral check on fresh probe pairs: the learned rule's
        # decision boundary admits distance 2 and rejects distance 3
        # (the planted rule), regardless of its internal structure
        probes = spark.createDataFrame(
            [("kilo", "kiloxx", True), ("kilo", "kiloxyz", False)],
            ["left_name", "right_name", "expected"],
        )
        got = {
            r["right_name"]: r["accept"]
            for r in probes.withColumn(
                "accept", res["rule"].confidence() >= 0.0
            ).collect()
        }
        assert got == {"kiloxx": True, "kiloxyz": False}

    def test_deterministic_under_seed(self, spark, labeled_pairs):  # noqa: F811
        params = GenLinkParams(population_size=12, max_iterations=3,
                               destination_fmeasure=2.0)  # never Success
        a = learn_rule(labeled_pairs, _planted_space(), params, seed=5)
        b = learn_rule(labeled_pairs, _planted_space(), params, seed=5)
        assert a["rule"].describe() == b["rule"].describe()
        assert a["history"] == b["history"]
        assert a["status"] == "MaximumIterationsReached"

    def test_ineffective_stop(self, spark, labeled_pairs):  # noqa: F811
        params = GenLinkParams(
            population_size=12,
            max_iterations=50,
            max_ineffective_iterations=2,
            destination_fmeasure=2.0,  # unreachable -> stall path
        )
        res = learn_rule(labeled_pairs, _planted_space(), params, seed=3)
        assert res["status"] in (
            "MaximumIneffectiveIterationsReached",
            "MaximumIterationsReached",
        )
        assert res["iterations"] <= 50

    def test_seed_rules_join_population(self, spark, labeled_pairs):  # noqa: F811
        perfect = CandidateRule(
            "min",
            (Comparison("levenshteinDistance", "name", threshold=2.5),),
        )
        params = GenLinkParams(population_size=8, max_iterations=2)
        res = learn_rule(
            labeled_pairs,
            _planted_space(),
            params,
            seed=1,
            seeds=[perfect],
        )
        # generation 0 already contains the planted rule -> instant Success
        assert res["status"] == "Success" and res["iterations"] == 0


class TestActiveLearning:
    """ActiveLearning.scala:46-81 — one iteration: reference
    completion, population learn, weighted-cut committee, divergence
    selection; plus a simulated 2-round label loop."""

    def test_bootstrap_reference_from_empty(self, spark, labeled_pairs):  # noqa: F811
        import random

        from silk_spark.operators.genlink import (
            complete_reference_pairs,
            random_rule,
        )

        pool = labeled_pairs.drop("is_match")
        rng = random.Random(7)
        pop = [random_rule(rng, _planted_space()) for _ in range(10)]
        ref = complete_reference_pairs(pool, None, pop)
        rows = ref.collect()
        # CompleteReferenceLinks: exactly one positive + one negative
        assert sorted(r["is_match"] for r in rows) == [False, True]
        assert set(ref.columns) == set(pool.columns) | {"is_match"}

    def test_bootstrap_adds_only_missing_class(self, spark, labeled_pairs):  # noqa: F811
        import random

        from pyspark.sql import functions as F

        from silk_spark.operators.genlink import (
            complete_reference_pairs,
            random_rule,
        )

        pool = labeled_pairs.drop("is_match")
        positives = labeled_pairs.filter("is_match").limit(3)
        rng = random.Random(7)
        pop = [random_rule(rng, _planted_space()) for _ in range(10)]
        ref = complete_reference_pairs(pool, positives, pop)
        agg = ref.agg(
            F.count_if(F.col("is_match")).alias("p"),
            F.count_if(~F.col("is_match")).alias("n"),
        ).first()
        assert (agg["p"], agg["n"]) == (3, 1)
        # already-complete labeled set passes through untouched
        complete = labeled_pairs.limit(20)
        assert complete_reference_pairs(pool, complete, pop) is complete

    def test_iteration_selects_unlabeled_links(self, spark, labeled_pairs):  # noqa: F811
        from silk_spark.operators.genlink import active_learn_iteration

        pool = labeled_pairs.drop("is_match")
        params = GenLinkParams(
            population_size=16, max_iterations=3,
            max_ineffective_iterations=3, clean_frequency=0,
        )
        out = active_learn_iteration(
            pool, None, _planted_space(), params, seed=11, n_select=4,
            key_cols=("left_name", "right_name"),
        )
        sel = out["selected"].collect()
        assert len(sel) == 4
        # selection never re-asks about a reference-labeled pair
        ref_keys = {
            (r["left_name"], r["right_name"]) for r in out["reference"].collect()
        }
        assert all(
            (r["left_name"], r["right_name"]) not in ref_keys for r in sel
        )
        # the committee honors the 0.1 x best fitness cut, sorted desc
        fits = [f for _, f in out["population"]]
        assert len(out["committee"]) == sum(1 for f in fits if f >= fits[0] * 0.1)

    def test_label_loop_recovers_planted_rule(self, spark, labeled_pairs):  # noqa: F811
        # 3 simulated user rounds: label what the selector asks for,
        # feed it back with the carried population — the final rule
        # must classify the FULL ground truth perfectly (the planted
        # threshold is learnable from few well-chosen labels; two
        # rounds of labels can still leave it unpinned below dist 2)
        from pyspark.sql import functions as F

        from silk_spark.operators.genlink import (
            active_learn_iteration,
            evaluate_rules,
        )

        pool = labeled_pairs.drop("is_match")
        params = GenLinkParams(
            population_size=20, max_iterations=6,
            max_ineffective_iterations=6, destination_fmeasure=0.999,
        )
        labeled = None
        seeds = None
        for it in range(3):
            out = active_learn_iteration(
                pool, labeled, _planted_space(), params, seed=it,
                n_select=6, key_cols=("left_name", "right_name"),
            )
            # the user labels the selected pairs (ground truth oracle)
            newly = out["selected"].select("left_name", "right_name").join(
                labeled_pairs, ["left_name", "right_name"]
            )
            labeled = out["reference"].unionByName(newly)
            seeds = [r for r, _ in out["population"]]
        (final,) = evaluate_rules(labeled_pairs, [out["rule"]])
        assert final["f1"] >= 0.95
