"""The reference's names benchmark, reproduced at its own scale.

GenerateLinksTest.scala:55-68,104-208 runs every execution method over
a 2,000 x 2,000 person-name corpus with rule `levenshteinDistance
threshold 2`, grading pairsCompleteness (correct/golden) and
pairsQuality (correct/found) against the golden link set. Here the
corpus is synthesized deterministically (no external data per the
graft rules), the golden set is the EXACT lev<=2 cross-pair set
(Spark-computed — stricter than a planted list: accidental near-pairs
count too), and the same per-method table is asserted:

  * every method's links are verified with the exact rule, so
    pairsQuality is 1.0 by construction — asserted, not assumed;
  * Full blocking must reach completeness 1.0 (it considers every
    pair); the reduction-style methods (soundex and other phonetic
    keys, sorted neighborhoods, qgrams) must stay above the floors the
    reference's own table exhibits for this rule family.
"""

import random

import pytest
from pyspark.sql import functions as F

from silk_spark.functions.phonetic import metaphone, nysiis
from silk_spark.functions.transformers import soundex
from silk_spark.operators.blocking import (
    candidate_pairs,
    full_index,
    key_block,
    multi_pass_blocks,
    qgram_blocks,
    sorted_blocks,
)
from silk_spark.operators.linking import (
    Comparison,
    LinkageRule,
    evaluate_links,
    generate_links,
)

FIRST = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "chris",
    "nancy", "daniel", "lisa", "matthew", "betty", "anthony", "margaret",
    "mark", "sandra", "donald", "ashley", "steven", "kimberly", "paul",
    "emily", "andrew", "donna", "joshua", "michelle",
]
LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young", "allen", "king",
    "wright", "scott", "torres", "nguyen", "hill", "flores",
]

N = 2000  # the reference benchmark's corpus size per side


def _perturb(rng: random.Random, s: str) -> str:
    """<= 2 edits, never producing the empty string."""
    ops = rng.randint(1, 2)
    out = s
    for _ in range(ops):
        i = rng.randrange(len(out))
        kind = rng.randint(0, 2)
        if kind == 0 and len(out) > 3:  # delete
            out = out[:i] + out[i + 1:]
        elif kind == 1:  # substitute
            out = out[:i] + rng.choice("abcdefghijklmnopqrstuvwxyz") + out[i + 1:]
        else:  # insert
            out = out[:i] + rng.choice("abcdefghijklmnopqrstuvwxyz") + out[i:]
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(446)
    src1 = []
    for i in range(N):
        name = f"{rng.choice(FIRST)} {rng.choice(LAST)} {rng.randrange(10000):04d}"
        src1.append((f"s{i}", name))
    # ~450 golden-linkable rows: perturbed copies of source-1 names
    # (mirrors links.nt's 446 golden links); the rest are fresh names
    src2 = []
    for i in range(N):
        if i < 450:
            src2.append((f"t{i}", _perturb(rng, src1[i][1])))
        else:
            name = f"{rng.choice(FIRST)} {rng.choice(LAST)} {rng.randrange(10000):04d}"
            src2.append((f"t{i}", name))
    left = spark.createDataFrame(src1, "id string, name string")
    right = spark.createDataFrame(src2, "id string, name string")
    # EXACT golden: every cross pair at lev <= 2 (JVM 3-arg banded
    # levenshtein over the 4M-pair cross product — oracle, not a method)
    golden = (
        left.select(F.col("id").alias("left_id"), F.col("name").alias("ln"))
        .crossJoin(right.select(F.col("id").alias("right_id"), F.col("name").alias("rn")))
        .filter(F.levenshtein("ln", "rn", 2) >= 0)
        .select("left_id", "right_id")
    ).cache()
    n_golden = golden.count()
    assert 400 <= n_golden <= 700, n_golden  # planted 450 +- accidentals
    return left, right, golden


RULE = LinkageRule(Comparison("levenshteinDistance", "name", threshold=2.0))


def _run_method(left, right, golden, index_builder, floor_completeness):
    pairs = candidate_pairs(left, right, index_builder, index_builder)
    links = generate_links(pairs, RULE, ["left_id"])
    stats = evaluate_links(links, golden, ["left_id", "right_id"])
    # exact verify => every found link IS a golden pair
    assert stats["pairs_quality"] == 1.0, stats
    assert stats["pairs_completeness"] >= floor_completeness, stats
    return stats


class TestNamesBenchmark:
    def test_full(self, spark, corpus):
        left, right, golden = corpus
        stats = _run_method(left, right, golden, full_index(), 1.0)
        assert stats["correct"] == stats["golden"]

    def test_blocking_soundex(self, spark, corpus):
        """Soundex keys the (first) token: one phonetic bucket per
        name. The reference table shows high-but-lossy completeness
        for phonetic blocking under 2-edit perturbations."""
        left, right, golden = corpus
        key = soundex(F.split(F.col("name"), " ").getItem(0))
        _run_method(left, right, golden, key_block(key), 0.55)

    def test_blocking_metaphone(self, spark, corpus):
        left, right, golden = corpus
        key = metaphone(F.split(F.col("name"), " ").getItem(0))
        _run_method(left, right, golden, key_block(key), 0.55)

    def test_blocking_nysiis(self, spark, corpus):
        left, right, golden = corpus
        key = nysiis(F.split(F.col("name"), " ").getItem(0))
        _run_method(left, right, golden, key_block(key), 0.55)

    def test_multi_pass_first_and_last(self, spark, corpus):
        """Multi-pass over BOTH name tokens: an edit that breaks one
        token's phonetic key leaves the other intact — completeness
        must beat any single pass (MultiPassBlocking.scala:13-21)."""
        left, right, golden = corpus
        toks = F.split(F.col("name"), " ")
        # F.get (null on OOB): a perturbation can eat the separator,
        # collapsing a name to fewer tokens (ANSI getItem would throw)
        idx = multi_pass_blocks(
            [soundex(F.get(toks, 0)), soundex(F.get(toks, 1))]
        )
        stats = _run_method(left, right, golden, idx, 0.80)
        single = _run_method(
            left, right, golden, key_block(soundex(F.get(toks, 0))), 0.55
        )
        assert stats["pairs_completeness"] >= single["pairs_completeness"]

    def test_sorted_blocks(self, spark, corpus):
        left, right, golden = corpus
        _run_method(left, right, golden, sorted_blocks(F.col("name"), overlap=0.5), 0.25)

    def test_qgrams(self, spark, corpus):
        left, right, golden = corpus
        _run_method(left, right, golden, qgram_blocks(F.col("name")), 0.55)
