"""Link generation: blocked similarity join-and-score + best-link filter.

Silk's GenerateLinks pipeline (/root/reference/silk-rules/src/main/
scala/org/silkframework/rule/execution/GenerateLinks.scala:63-132)
reborn as four DataFrame stages:

  1. block      — candidate_pairs() (blocking.py) = CacheLoader+Index
  2. score      — one projection evaluating the rule tree
                  (Comparison confidence + aggregator Columns)
  3. filter     — confidence >= 0 (Matcher.scala:273-280) and
                  top-k per source (Filter.scala:33-50)
  4. output     — the links DataFrame (source, target, confidence)

A LinkageRule here is a small expression-tree description compiled to
a single Column — the Spark analogue of the reference's
SimilarityOperator tree (rule/LinkageRule.scala:28-64).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from silk_spark.functions.aggregators import AGGREGATORS
from silk_spark.functions.measures import MEASURES, distance_to_confidence

# ---------------------------------------------------------------------------
# rule tree
# ---------------------------------------------------------------------------


@dataclass
class Comparison:
    """One measure over a (left, right) column pair
    (reference rule/similarity/Comparison.scala:32-96)."""

    measure: str
    left: str  # column name in the pair frame (without left_ prefix)
    right: str | None = None  # defaults to same name
    threshold: float = 1.0
    weight: float = 1.0
    params: dict = field(default_factory=dict)

    def confidence(self) -> Column:
        lcol = F.col(f"left_{self.left}")
        rcol = F.col(f"right_{self.right or self.left}")
        dist = MEASURES[self.measure](lcol, rcol, **self.params)
        return distance_to_confidence(dist, self.threshold)


@dataclass
class Aggregation:
    """Aggregator node over child Comparisons/Aggregations
    (reference rule/similarity/Aggregation.scala)."""

    aggregator: str  # key into AGGREGATORS
    children: list = field(default_factory=list)
    params: dict = field(default_factory=dict)

    def confidence(self) -> Column:
        scores = [c.confidence() for c in self.children]
        if self.aggregator == "average":
            weights = [getattr(c, "weight", 1.0) for c in self.children]
            return AGGREGATORS["average"](*scores, weights=weights)
        return AGGREGATORS[self.aggregator](*scores, **self.params)


@dataclass
class LinkageRule:
    """Root operator + filter config (rule/LinkageRule.scala:28-64,
    rule/LinkFilter.scala:26)."""

    operator: Comparison | Aggregation
    limit: int | None = None  # top-k links per source
    unambiguous: bool = False  # keep only sources with exactly one link
    threshold: float = 0.0  # emit iff confidence >= this (reference: 0.0)


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def score_pairs(pairs: DataFrame, rule: LinkageRule) -> DataFrame:
    """Stage 2+3a: evaluate the rule tree in ONE whole-stage-codegen
    projection; keep pairs at/above the rule threshold."""
    scored = pairs.withColumn("confidence", rule.operator.confidence())
    return scored.filter(F.col("confidence") >= rule.threshold)


def filter_links(
    links: DataFrame,
    source_cols: list[str],
    rule: LinkageRule,
) -> DataFrame:
    """Stage 3b: Silk's LinkFilter (rule/execution/Filter.scala:33-55)
    — per-source top-k by confidence, or unambiguous-only."""
    if rule.limit is None and not rule.unambiguous:
        return links
    w = Window.partitionBy(*source_cols)
    ordered = w.orderBy(F.col("confidence").desc())
    if rule.unambiguous:
        return (
            links.withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") == 1)
            .drop("_n")
        )
    return (
        links.withColumn("_rn", F.row_number().over(ordered))
        .filter(F.col("_rn") <= rule.limit)
        .drop("_rn")
    )


class MatchTimeout(Exception):
    """Matching exceeded its wall-clock budget and was cancelled."""


def _materialize_with_timeout(df: DataFrame, timeout_sec: float) -> DataFrame:
    """Run `df`'s materialization inside a Spark job group and cancel
    the whole group when the clock runs out — the Spark analogue of
    Silk's matcher timeout, which stops scheduling partition-pair
    tasks and interrupts running ones past the budget
    (Matcher.scala:76-81). localCheckpoint keeps the result
    DISTRIBUTED (executor block store), so a bounded-but-large link
    set never funnels through the driver.

    Granularity caveat: cancellation prevents unscheduled tasks from
    starting and interrupts running ones, but a running task only
    observes the interrupt at its next check point (record emission,
    shuffle write) — a codegen'd join loop that FILTERS OUT every row
    can run its whole partition before dying. Plan matching with many
    moderate tasks (the blocking methods in operators/blocking.py do
    exactly this), not one giant partition."""
    import os
    import threading
    import uuid

    spark = df.sparkSession
    sc = spark.sparkContext
    # Job-group thread-locality REQUIRES pinned-thread mode (the
    # default since Spark 3.2): with PYSPARK_PIN_THREAD=false every
    # Python thread shares one JVM-side thread-local, so the group set
    # below would leak to concurrent jobs and cancelJobGroup could
    # kill unrelated work in the same SparkContext. Fail loudly rather
    # than cancel someone else's job. (Classic py4j sessions only —
    # Spark Connect has no pinning concept and scopes tags per client.)
    pinned = os.environ.get("PYSPARK_PIN_THREAD", "true").lower() != "false"
    if not pinned and hasattr(sc, "setJobGroup"):
        raise RuntimeError(
            "generate_links(timeout_sec=...) needs pinned-thread mode "
            "(PYSPARK_PIN_THREAD != false): job-group cancellation from a "
            "helper thread is only safe when job groups are thread-local"
        )
    group = f"silk-match-{uuid.uuid4().hex[:8]}"
    result: dict = {}

    def run() -> None:
        # job groups are thread-local (pinned-thread mode), so the
        # group set here scopes exactly this materialization
        sc.setJobGroup(group, "generate_links matching timeout scope",
                       interruptOnCancel=True)
        try:
            result["df"] = df.localCheckpoint(eager=True)
        except Exception as e:  # noqa: BLE001 — surfaced to caller below
            result["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        sc.cancelJobGroup(group)
        t.join(30.0)
        raise MatchTimeout(
            f"matching exceeded {timeout_sec}s and was cancelled "
            f"(job group {group})"
        )
    if "err" in result:
        raise result["err"]
    return result["df"]


def generate_links(
    pairs: DataFrame,
    rule: LinkageRule,
    source_cols: list[str],
    limit: int | None = None,
    timeout_sec: float | None = None,
) -> DataFrame:
    """block(done by caller via candidate_pairs) → score → filter.

    `limit` caps the GLOBAL number of links (LinkSpec.scala:61-66 —
    distinct from the rule's per-source top-k, which filter_links
    applies): Catalyst plans it as CollectLimit, so generation stops
    early rather than filtering afterwards. `timeout_sec` bounds
    matching wall-clock via job-group cancellation (Matcher.scala:
    76-81); it forces (distributed) materialization — without a
    deadline a lazy plan has nothing to cancel — and raises
    MatchTimeout when exceeded."""
    out = filter_links(score_pairs(pairs, rule), source_cols, rule)
    if limit is not None:
        out = out.limit(int(limit))
    if timeout_sec is not None:
        return _materialize_with_timeout(out, float(timeout_sec))
    return out


# ---------------------------------------------------------------------------
# evaluation (reference rule/evaluation/EvaluationResult.scala:36-64 and
# the names-benchmark harness GenerateLinksTest.scala:110-124)
# ---------------------------------------------------------------------------


def evaluate_links(
    found: DataFrame,
    golden: DataFrame,
    keys: list[str],
) -> dict:
    """Precision / recall / F1 + pairsCompleteness / pairsQuality of a
    found link set vs a golden set, joined on `keys`."""
    f = found.select(*keys).dropDuplicates()
    g = golden.select(*keys).dropDuplicates()
    n_found = f.count()
    n_golden = g.count()
    n_correct = f.join(g, on=keys, how="inner").count()
    precision = n_correct / n_found if n_found else 0.0
    recall = n_correct / n_golden if n_golden else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "found": n_found,
        "golden": n_golden,
        "correct": n_correct,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        # reference names: pairsQuality = correct/found, pairsCompleteness = correct/golden
        "pairs_quality": precision,
        "pairs_completeness": recall,
    }
