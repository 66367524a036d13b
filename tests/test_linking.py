"""Blocked similarity join-and-score: end-to-end link generation vs a
golden pair set — the names-benchmark pattern (/root/reference/
silk-rules/src/test/.../execution/GenerateLinksTest.scala:38-124)."""

import pytest
from pyspark.sql import functions as F

from silk_spark.datagen import near_dup_turns
from silk_spark.operators.blocking import (
    candidate_pairs,
    composite_block,
    conjunction,
    continuous_index,
    disjunction,
    full_index,
    key_block,
    multi_pass_blocks,
    qgram_blocks,
    sorted_blocks,
    tokens_blocks,
)
from silk_spark.operators.linking import (
    Aggregation,
    Comparison,
    LinkageRule,
    evaluate_links,
    generate_links,
)


@pytest.fixture(scope="module")
def names(spark):
    left = spark.createDataFrame(
        [("1", "john smith"), ("2", "mary jones"), ("3", "bob brown"), ("4", "eve adams")],
        "id string, name string",
    )
    right = spark.createDataFrame(
        [("a", "jon smith"), ("b", "marry jones"), ("c", "alice green"), ("d", "eve adams")],
        "id string, name string",
    )
    return left, right


GOLDEN = {("1", "a"), ("2", "b"), ("4", "d")}


def _run(left, right, index_builder, rule=None, **cp_kwargs):
    rule = rule or LinkageRule(Comparison("levenshteinDistance", "name", threshold=2.0), limit=1)
    pairs = candidate_pairs(left, right, index_builder, index_builder, **cp_kwargs)
    links = generate_links(pairs, rule, ["left_id"])
    return {(r.left_id, r.right_id) for r in links.select("left_id", "right_id").collect()}


class TestBlockingMethods:
    """Every execution method must reach pairs-completeness 1.0 on the
    golden set (the reference's harness criterion)."""

    def test_full(self, names):
        assert _run(*names, full_index()) == GOLDEN

    def test_qgrams(self, names):
        assert _run(*names, qgram_blocks(F.col("name"))) == GOLDEN

    def test_soundex_blocking(self, names):
        # classic key blocking on soundex of the last token (surname)
        key = F.soundex(F.element_at(F.split(F.col("name"), " "), -1))
        assert _run(*names, key_block(key)) == GOLDEN

    def test_multi_pass(self, names):
        first = F.soundex(F.element_at(F.split(F.col("name"), " "), 1))
        last = F.soundex(F.element_at(F.split(F.col("name"), " "), -1))
        assert _run(*names, multi_pass_blocks([first, last])) == GOLDEN

    def test_sorted_blocks(self, names):
        assert _run(*names, sorted_blocks(F.col("name"))) == GOLDEN

    def test_token_blocks(self, names):
        assert _run(*names, tokens_blocks(F.split(F.col("name"), " "))) == GOLDEN

    def test_salting_preserves_result(self, names):
        assert _run(*names, qgram_blocks(F.col("name")), salt=4) == GOLDEN

    def test_composite_block_exact_pairs(self, names):
        # composite blocking only catches exact (first-token, last-token) matches
        k1 = F.element_at(F.split(F.col("name"), " "), 1)
        k2 = F.element_at(F.split(F.col("name"), " "), -1)
        got = _run(*names, composite_block(k1, k2))
        assert got == {("4", "d")}

    def test_continuous_index_overlap(self, spark):
        df = spark.createDataFrame([(0.49,), (0.51,), (0.9,)], "x double")
        out = df.select(continuous_index(F.col("x"), 0.0, 1.0, 2, overlap=0.1).alias("b")).collect()
        # 0.49 and 0.51 sit near the 0.5 boundary -> both indexed into both blocks
        assert set(out[0]["b"]) & set(out[1]["b"])
        assert set(out[2]["b"]) == {1}


class TestIndexCombination:
    def test_disjunction_matches_any(self, spark):
        df = spark.createDataFrame([("x", "q")], "a string, b string")
        d = df.select(
            disjunction(key_block(F.col("a")), key_block(F.col("b"))).alias("ix")
        ).first()["ix"]
        assert len(d) == 2

    def test_conjunction_cross_product(self, spark):
        df = spark.createDataFrame([("x", "q")], "a string, b string")
        c = df.select(
            conjunction(
                multi_pass_blocks([F.col("a"), F.col("b")]),
                key_block(F.col("a")),
            ).alias("ix")
        ).first()["ix"]
        assert len(c) == 2  # 2 x 1 composite ids


class TestRuleTree:
    def test_aggregation_rule(self, names):
        rule = LinkageRule(
            Aggregation(
                "average",
                [
                    Comparison("levenshteinDistance", "name", threshold=2.0, weight=2.0),
                    Comparison("equality", "name", threshold=1.0),
                ],
            ),
            limit=1,
        )
        got = _run(*names, full_index(), rule=rule)
        assert got == GOLDEN

    def test_threshold_rejects(self, names):
        rule = LinkageRule(
            Comparison("levenshteinDistance", "name", threshold=2.0), threshold=0.9
        )
        got = _run(*names, full_index(), rule=rule)
        assert got == {("4", "d")}  # only the exact match reaches 1.0

    def test_unambiguous_filter(self, spark):
        left = spark.createDataFrame([("1", "ab")], "id string, name string")
        right = spark.createDataFrame([("a", "ab"), ("b", "ac")], "id string, name string")
        rule = LinkageRule(Comparison("levenshteinDistance", "name", threshold=2.0), unambiguous=True)
        got = _run(left, right, full_index(), rule=rule)
        assert got == set()  # two candidate links -> ambiguous -> dropped


class TestEvaluation:
    def test_metrics(self, spark):
        found = spark.createDataFrame([("1", "a"), ("2", "x")], "l string, r string")
        golden = spark.createDataFrame([("1", "a"), ("3", "c")], "l string, r string")
        m = evaluate_links(found, golden, ["l", "r"])
        assert m["correct"] == 1 and m["found"] == 2 and m["golden"] == 2
        assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5


class TestSyntheticGolden:
    def test_near_dup_fixture_end_to_end(self, spark):
        """Datagen F4 fixture: conv_id blocking + token-jaccard scoring
        must recover every golden pair with perfect quality."""
        records, golden = near_dup_turns(spark, n_pairs=50, n_distractors=100, seed=7)
        left = records.filter(F.col("rec_id").startswith("L-"))
        right = records.filter(~F.col("rec_id").startswith("L-"))
        pairs = candidate_pairs(left, right, key_block(F.col("conv_id")))
        pairs = pairs.filter(F.col("right_rec_id").startswith("R-"))
        rule = LinkageRule(
            Comparison("levenshteinDistance", "text", threshold=4.0), limit=1, threshold=0.0
        )
        links = generate_links(pairs, rule, ["left_rec_id"]).select(
            F.col("left_rec_id"), F.col("right_rec_id")
        )
        m = evaluate_links(links, golden.select("left_rec_id", "right_rec_id"), ["left_rec_id", "right_rec_id"])
        assert m["pairs_completeness"] == 1.0
        assert m["pairs_quality"] == 1.0


class TestGlobalLimitAndTimeout:
    """Silk's matching timeout / global link limit (Matcher.scala:76-81,
    LinkSpec.scala:61-66): limit() caps total links; job-group
    cancellation bounds matching wall-clock."""

    def test_global_limit_caps_total_links(self, spark, names):
        from silk_spark.operators.blocking import full_index, candidate_pairs

        left, right = names
        rule = LinkageRule(Comparison("levenshteinDistance", "name", threshold=10.0))
        pairs = candidate_pairs(left, right, full_index(), full_index())
        unlimited = generate_links(pairs, rule, ["left_id"]).count()
        assert unlimited > 2
        capped = generate_links(pairs, rule, ["left_id"], limit=2)
        assert capped.count() == 2

    def test_timeout_completes_fast_job(self, spark, names):
        from silk_spark.operators.blocking import full_index, candidate_pairs

        left, right = names
        rule = LinkageRule(Comparison("levenshteinDistance", "name", threshold=2.0), limit=1)
        pairs = candidate_pairs(left, right, full_index(), full_index())
        links = generate_links(pairs, rule, ["left_id"], timeout_sec=120.0)
        got = {(r.left_id, r.right_id) for r in links.select("left_id", "right_id").collect()}
        assert got == GOLDEN

    def test_timeout_cancels_runaway_matching(self, spark):
        """A matching job far exceeding the deadline must be cancelled —
        unscheduled tasks never start (cancellation granularity is the
        task boundary, same as Silk's partition-pair tasks) — and the
        session must stay usable afterwards. The workload is 64 tasks
        of ~4s each (~37s run to completion at 8 cores, measured): a
        2s deadline must come back in a small multiple of one task."""
        import time

        from silk_spark.operators.linking import MatchTimeout

        big = spark.range(0, 3_200_000, 1, 64).selectExpr(
            "id as left_id",
            "repeat(cast(id as string), 15) as left_name",
            "id as right_id",
            "reverse(repeat(cast(id as string), 15)) as right_name",
        )
        rule = LinkageRule(Comparison("levenshteinDistance", "name", threshold=2.0))
        t0 = time.monotonic()
        with pytest.raises(MatchTimeout):
            generate_links(big, rule, ["left_id"], timeout_sec=2.0)
        # < full-job wall by a wide margin: only in-flight tasks wrap up
        assert time.monotonic() - t0 < 25.0
        # session healthy after cancellation
        assert spark.range(5).count() == 5
