"""Genetic-programming linkage-rule structure search (GenLink).

Reference: silk-learning/.../genlink/GenLink.scala:36-130 (evolution
loop; stop statuses Success / MaximumIneffectiveIterationsReached /
MaximumIterationsReached; scoreEpsilon 1e-4),
generation/GeneratePopulation.scala:36-59 + LinkageRuleGenerator
.scala:30-55 + ComparisonGenerator.scala:26-44 (random rules: an
aggregation drawn from {average, max, min} over 1-2 comparisons, each
with a random measure, threshold ~ U(0, maxThreshold) and integer
weight in [1, 20]), reproduction/Reproduction.scala:38-66 (elitism +
size-5 tournament selection; offspring are mutation with probability
0.25 else crossover), reproduction/MutationFunction.scala:46-49
(mutation IS crossover with a fresh random rule),
reproduction/{Threshold,Weight,DistanceMeasure,AggregationFunction,
Subtree}Crossover.scala (the specialized operator set: average the
thresholds / copy the weight / copy the measure / copy the
aggregation function / exchange a random comparison),
individual/fitness/FMeasureFitness.scala + MCCFitnessFunction.scala
with rule/evaluation/LinkageRuleEvaluator.scala:20-75
(predicted-positive iff rule confidence >= 0.0).

Spark-first reframe — the scan direction inverts. The reference
holds its reference links in driver memory and scores one rule at a
time (Reproduction.scala's `.par` over individuals). At engine scale
the LABELED PAIRS are the big side (10^8-10^10 weak-supervision
pairs), so fitness evaluation flips: each generation compiles a
BATCH of rules into one whole-stage-codegen projection (one
confidence Column per rule — flat aggregation-over-comparisons trees
stay small) and a single `.agg()` computes every rule's confusion
counts in one scan of the pairs. A generation costs
ceil(population / eval_batch) Spark jobs regardless of pair count,
the shuffle is the 1-row aggregate, and the driver-side evolution
loop only ever touches the per-rule fitness vector. eval_batch
(default 64) bounds the per-projection expression count the same way
the IVF literal budget bounds codegen size.
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from silk_spark.operators.linking import Aggregation, Comparison

# aggregations the generator draws from: LinkageRuleGenerator.scala:
# 39-43 — "average" (linear components) + "max"/"min" (boolean)
_GEN_AGGREGATIONS = ("average", "max", "min")
# ComparisonGenerator.scala:28 / LinkageRuleGenerator.scala:45
_MAX_WEIGHT = 20
# GenLink.scala:23 — fitness ties within epsilon count as ineffective
_SCORE_EPSILON = 1e-4


@dataclass(frozen=True)
class ComparisonSpace:
    """One slot the generator can instantiate — the analogue of a
    ComparisonGenerator (measure + input pair + maxThreshold)."""

    measure: str
    left: str
    right: str | None = None
    max_threshold: float = 4.0


@dataclass(frozen=True)
class GenLinkParams:
    """LearningConfiguration.Parameters:60-65 +
    ReproductionConfiguration:17-19 defaults, except population_size
    (reference 500) sized for flat rules at 64-rule eval batches."""

    population_size: int = 50
    max_iterations: int = 50
    max_ineffective_iterations: int = 50
    destination_fmeasure: float = 0.999
    mutation_probability: float = 0.25
    elitism_count: int = 3
    tournament_size: int = 5
    max_operator_count: int = 2  # LinkageRuleGenerator.scala:49
    clean_frequency: int = 5  # Parameters.cleanFrequency
    fitness: str = "f1"  # or "mcc"
    eval_batch: int = 64


@dataclass(frozen=True)
class CandidateRule:
    """A flat linkage rule: aggregator over 1..max_operator_count
    comparisons — the population individual (LinkageRuleNode of an
    AggregationNode of ComparisonNodes)."""

    aggregator: str
    comparisons: tuple = field(default_factory=tuple)  # of Comparison

    def confidence(self) -> "F.Column":
        if len(self.comparisons) == 1 and self.aggregator != "average":
            return self.comparisons[0].confidence()
        return Aggregation(
            aggregator=self.aggregator, children=list(self.comparisons)
        ).confidence()

    def describe(self) -> str:
        parts = [
            f"{c.measure}({c.left},{c.right or c.left})"
            f"<={round(c.threshold, 3)}*{int(c.weight)}"
            for c in self.comparisons
        ]
        return f"{self.aggregator}[{' | '.join(parts)}]"


def random_comparison(rng: _random.Random, space: ComparisonSpace) -> Comparison:
    """ComparisonGenerator.scala:33-43: threshold ~ U(0, max),
    weight ~ 1 + randint(0, 19)."""
    return Comparison(
        measure=space.measure,
        left=space.left,
        right=space.right,
        threshold=rng.random() * space.max_threshold,
        weight=float(rng.randrange(_MAX_WEIGHT) + 1),
    )


def random_rule(
    rng: _random.Random,
    spaces: list[ComparisonSpace],
    max_operator_count: int = 2,
) -> CandidateRule:
    """LinkageRuleGenerator.apply: random aggregation over
    1..max_operator_count comparisons drawn (with replacement, as the
    reference does) from the comparison generators."""
    n = rng.randrange(max(int(max_operator_count), 1)) + 1
    comps = tuple(
        random_comparison(rng, spaces[rng.randrange(len(spaces))])
        for _ in range(n)
    )
    return CandidateRule(
        aggregator=_GEN_AGGREGATIONS[rng.randrange(len(_GEN_AGGREGATIONS))],
        comparisons=comps,
    )


# ---------------------------------------------------------------------------
# distributed fitness evaluation
# ---------------------------------------------------------------------------


def evaluate_rules(
    pairs: DataFrame,
    rules: list[CandidateRule],
    label_col: str = "is_match",
    eval_batch: int = 64,
) -> list[dict]:
    """Confusion metrics for EVERY rule in O(len(rules)/eval_batch)
    scans of `pairs`: per batch, one projection evaluates each rule's
    confidence Column and one agg sums its (tp, fp) plus the shared
    (pos, neg) totals — LinkageRuleEvaluator.scala:20-75 semantics
    (predicted-positive iff confidence >= 0.0) at population width.
    Returns one dict per rule: tp/fp/fn/tn/precision/recall/f1/mcc."""
    y = F.col(label_col).cast("boolean")
    out: list[dict] = []
    batch = max(int(eval_batch), 1)
    for start in range(0, len(rules), batch):
        chunk = rules[start : start + batch]
        aggs = [
            F.count_if(y).cast("bigint").alias("_pos"),
            F.count_if(~y).cast("bigint").alias("_neg"),
        ]
        for i, rule in enumerate(chunk):
            pred = rule.confidence() >= 0.0
            aggs.append(F.count_if(pred & y).cast("bigint").alias(f"_tp{i}"))
            aggs.append(F.count_if(pred & ~y).cast("bigint").alias(f"_fp{i}"))
        row = pairs.agg(*aggs).first().asDict()
        pos, neg = row["_pos"], row["_neg"]
        for i in range(len(chunk)):
            tp, fp = row[f"_tp{i}"], row[f"_fp{i}"]
            fn, tn = pos - tp, neg - fp
            precision = tp / (tp + fp) if tp + fp > 0 else 0.0
            recall = tp / (tp + fn) if tp + fn > 0 else 0.0
            f1 = (
                2 * precision * recall / (precision + recall)
                if precision + recall > 0
                else 0.0
            )
            den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
            mcc = (tp * tn - fp * fn) / den**0.5 if den > 0 else 0.0
            out.append(
                {
                    "tp": tp,
                    "fp": fp,
                    "fn": fn,
                    "tn": tn,
                    "precision": precision,
                    "recall": recall,
                    "f1": f1,
                    "mcc": mcc,
                }
            )
    return out


# ---------------------------------------------------------------------------
# committee-based active-learning link selection
# ---------------------------------------------------------------------------


def select_by_divergence(
    unlabeled: DataFrame,
    reference: DataFrame,
    committee: list[CandidateRule],
    k: int = 3,
    key_cols=("left_key", "right_key"),
    label_col: str = "is_match",
    fulfilled_only: bool = True,
) -> DataFrame:
    """Jensen-Shannon-divergence link selection over a rule committee
    (active/linkselector/JensenShannonDivergenceSelector.scala:33-107):
    every REFERENCE link induces a distribution p = mean probability
    (rule confidence * 0.5 + 0.5, :96-98) over the rules that FULFILL
    it (confidence > 0 for positives, <= 0 for negatives, :81-87);
    an unlabeled link's distance from that reference link is
    JSD(p, q) + H(q)/2 with q the same mean over the same rule subset
    (:74-78, JSD/entropy :100-116); its score is the distance to the
    NEAREST reference link, and the k highest-scoring links are
    selected (:39-44, top 3 in the reference).

    The natural committee is the evolved population's elite
    (learn_rule + sorted fitness), closing the GP -> active-learning
    loop: GenLink learns rules, this picks the next links to label.

    Scale shape: the committee is compiled once per side. R
    confidence Columns on the reference frame yield one
    (fulfilled-mask, p) row per reference link, deduplicated and
    BROADCAST (reference links are the labeled set — small by
    definition). Unlabeled links are scanned ONCE, computing their R
    probabilities in codegen, then a broadcast nested-loop against
    the reference rows, a min-aggregate per link (partial map-side),
    and a TakeOrderedAndProject top-k — no shuffle of the unlabeled
    side beyond the k-row merge.

    Empty fulfilled sets (a reference link no committee rule gets
    right) fall back to the full committee instead of the reference's
    NaN mean — documented divergence, keeps every reference link
    usable."""
    R = len(committee)
    if R == 0:
        raise ValueError("committee must not be empty")
    probs = [r.confidence() * 0.5 + 0.5 for r in committee]
    y = F.col(label_col).cast("boolean")

    # reference side: per-link fulfilled mask + mean prob over it
    fulfilled = [
        F.when(y, c > 0.5).otherwise(c <= 0.5).cast("int")
        for c in probs  # conf > 0  <=>  prob > 0.5
    ]
    mask = sum(
        (f * F.lit(1 << i) for i, f in enumerate(fulfilled)), F.lit(0)
    )
    nbits = sum((f for f in fulfilled), F.lit(0))
    all_mask = F.lit((1 << R) - 1)
    ref = reference.select(
        F.when(nbits > 0, mask).otherwise(all_mask).alias("_mask"),
        F.when(nbits > 0, nbits).otherwise(F.lit(R)).alias("_nbits"),
        *[
            F.when((F.when(nbits > 0, mask).otherwise(all_mask))
                   .bitwiseAND(F.lit(1 << i)) != 0, p)
            .otherwise(F.lit(0.0))
            .alias(f"_rp{i}")
            for i, p in enumerate(probs)
        ],
    )
    psum = sum((F.col(f"_rp{i}") for i in range(R)), F.lit(0.0))
    ref = ref.select(
        "_mask", "_nbits", (psum / F.col("_nbits")).alias("_p")
    ).distinct()

    # unlabeled side: R probabilities once, then broadcast NL join
    lk = list(key_cols)
    links = unlabeled.select(
        *lk, *[p.alias(f"_q{i}") for i, p in enumerate(probs)]
    )
    joined = links.crossJoin(F.broadcast(ref))
    qsum = sum(
        (
            F.when(
                F.col("_mask").bitwiseAND(F.lit(1 << i)) != 0,
                F.col(f"_q{i}"),
            ).otherwise(F.lit(0.0))
            for i in range(R)
        ),
        F.lit(0.0),
    )
    q = qsum / F.col("_nbits")

    def _h(p):  # binary entropy in bits, 0 at the endpoints
        import math

        return F.when(
            (p > 0.0) & (p < 1.0),
            (-p * F.log(p) - (1.0 - p) * F.log(1.0 - p))
            / F.lit(math.log(2.0)),
        ).otherwise(F.lit(0.0))

    pm = (F.col("_p") + q) / 2.0
    jsd = _h(pm) - (_h(F.col("_p")) + _h(q)) / 2.0
    dist = jsd + 0.5 * _h(q)
    scored = (
        joined.withColumn("_d", dist)
        .groupBy(*lk)
        .agg(F.min("_d").alias("divergence"))
    )
    order = [F.col("divergence").desc()] + [F.col(c).asc() for c in lk]
    return (
        scored.withColumn("divergence", F.round("divergence", 6))
        .orderBy(*order)
        .limit(int(k))
    )


# ---------------------------------------------------------------------------
# reproduction
# ---------------------------------------------------------------------------


def _crossover(
    rng: _random.Random, a: CandidateRule, b: CandidateRule
) -> CandidateRule:
    """One randomly-chosen specialized crossover operator
    (CrossoverFunction.scala:36-60 picks uniformly; flat-tree forms):
    threshold-average (ThresholdCrossover), weight copy
    (WeightCrossover), measure copy (DistanceMeasureCrossover),
    aggregation-function copy (AggregationFunctionCrossover),
    comparison exchange (the SubtreeCrossover analogue for depth-2
    trees). Operators that need a comparison from each side pair the
    i-th of `a` with a random one of `b`."""
    op = rng.randrange(5)
    if op == 0:  # aggregation function from b
        return replace(a, aggregator=b.aggregator)
    ai = rng.randrange(len(a.comparisons))
    bc = b.comparisons[rng.randrange(len(b.comparisons))]
    comps = list(a.comparisons)
    if op == 1:  # average the thresholds
        comps[ai] = replace(
            comps[ai], threshold=(comps[ai].threshold + bc.threshold) / 2.0
        )
    elif op == 2:  # copy the weight
        comps[ai] = replace(comps[ai], weight=bc.weight)
    elif op == 3:  # copy the measure (keep inputs/threshold)
        comps[ai] = replace(comps[ai], measure=bc.measure)
    else:  # exchange the whole comparison
        comps[ai] = bc
    return replace(a, comparisons=tuple(comps))


def _tournament(
    rng: _random.Random, scored: list[tuple[CandidateRule, float]], size: int
) -> CandidateRule:
    """Reproduction.scala:61-65 — best of `size` uniform draws."""
    best = scored[rng.randrange(len(scored))]
    for _ in range(size - 1):
        cand = scored[rng.randrange(len(scored))]
        if cand[1] > best[1]:
            best = cand
    return best[0]


# ---------------------------------------------------------------------------
# population cleaning
# ---------------------------------------------------------------------------


def _structurally_same(a: CandidateRule, b: CandidateRule) -> bool:
    """CleanPopulationTask.compareLinkageRules/compareOperators:
    same aggregation function and every comparison of `a` has a
    counterpart in `b` with the same measure and inputs — thresholds
    and weights deliberately NOT compared (the reference treats rules
    differing only in parameters as duplicates)."""
    if a.aggregator != b.aggregator:
        return False
    key = lambda c: (c.measure, c.left, c.right or c.left)  # noqa: E731
    bkeys = [key(c) for c in b.comparisons]
    return all(key(c) in bkeys for c in a.comparisons)


def clean_population(
    pairs: DataFrame,
    scored: list[tuple[CandidateRule, float]],
    spaces: list[ComparisonSpace],
    rng: _random.Random,
    params: GenLinkParams,
    label_col: str = "is_match",
) -> list[tuple[CandidateRule, float]]:
    """CleanPopulationTask.scala:34-160 for flat rules, with the
    fitness probes BATCHED: (1) redundant-comparison removal — for
    each multi-comparison individual, every drop-one variant is
    evaluated (ALL variants across the population in one
    evaluate_rules scan) and the reference's sequential accept order
    (removeRedundantOperators:143-155: keep a drop iff fitness stays
    within fitnessEpsilon of the individual's) is replayed
    driver-side; (2) duplicate removal — sort by fitness, keep the
    first of each structural-equality run and replace the removed
    count with fresh random individuals (:45-58), scored in one more
    batched scan so the returned population is fully evaluated."""
    fit_key = "mcc" if params.fitness == "mcc" else "f1"

    # phase 1: batched redundancy probes
    variants: list[CandidateRule] = []
    spans: list[tuple[int, int]] = []  # per individual: (start, n)
    for rule, _ in scored:
        start = len(variants)
        if len(rule.comparisons) > 1:
            for i in range(len(rule.comparisons)):
                comps = tuple(
                    c for j, c in enumerate(rule.comparisons) if j != i
                )
                variants.append(replace(rule, comparisons=comps))
        spans.append((start, len(variants) - start))
    vfits = (
        [
            m[fit_key]
            for m in evaluate_rules(
                pairs, variants, label_col, params.eval_batch
            )
        ]
        if variants
        else []
    )
    cleaned: list[tuple[CandidateRule, float]] = []
    for (rule, fit), (start, n) in zip(scored, spans):
        if n == 0:
            cleaned.append((rule, fit))
            continue
        # sequential accept order over the ORIGINAL drop-one probes:
        # with <= 2 comparisons (the generator default) one accepted
        # drop ends the chain exactly as the reference does (a
        # 1-comparison rule is never emptied, cleanAggregation:137-39);
        # for wider rules only one drop lands per clean pass — later
        # passes continue the reduction (converges across cleans)
        kept = rule
        for i in range(n):
            if vfits[start + i] >= fit - _SCORE_EPSILON:
                kept = variants[start + i]
                break
        cleaned.append((kept, fit))

    # phase 2: duplicate removal + random backfill
    cleaned.sort(key=lambda rf: -rf[1])
    distinct: list[tuple[CandidateRule, float]] = []
    for rule, fit in cleaned:
        if distinct and _structurally_same(distinct[-1][0], rule):
            continue
        distinct.append((rule, fit))
    n_new = len(cleaned) - len(distinct)
    if n_new:
        fresh = [
            random_rule(rng, spaces, params.max_operator_count)
            for _ in range(n_new)
        ]
        fmet = evaluate_rules(pairs, fresh, label_col, params.eval_batch)
        distinct.extend((r, m[fit_key]) for r, m in zip(fresh, fmet))
    return distinct


# ---------------------------------------------------------------------------
# the learning activity
# ---------------------------------------------------------------------------


def learn_rule(
    pairs: DataFrame,
    spaces: list[ComparisonSpace],
    params: GenLinkParams = GenLinkParams(),
    label_col: str = "is_match",
    seed: int = 0,
    seeds: list[CandidateRule] | None = None,
) -> dict:
    """GenLink.run (GenLink.scala:36-103): seeded random population,
    then elitism + tournament reproduction until the best rule's
    F-measure reaches destination_fmeasure, fitness stalls for
    max_ineffective_iterations, or max_iterations pass. Each
    generation's fitness is one batched scan of `pairs`
    (evaluate_rules). Deterministic under `seed`.

    Returns {rule, fitness, f1, metrics, iterations, status, history}
    where history[i] is (best_fitness, mean_fitness) per generation."""
    rng = _random.Random(seed)
    fit_key = "mcc" if params.fitness == "mcc" else "f1"

    population = list(seeds or [])
    # GeneratePopulation.scala:53-58: 10% seed reuse when seeds exist
    while len(population) < params.population_size:
        population.append(random_rule(rng, spaces, params.max_operator_count))
    population = population[: params.population_size]

    def fitnesses(rules: list[CandidateRule]) -> list[dict]:
        return evaluate_rules(pairs, rules, label_col, params.eval_batch)

    metrics = fitnesses(population)
    scored = [(r, m[fit_key]) for r, m in zip(population, metrics)]
    history = []
    best_rule, best_metrics = max(
        zip(population, metrics), key=lambda rm: rm[1][fit_key]
    )
    iterations, ineffective = 0, 0
    status = "Running"
    while True:
        best_fit = best_metrics[fit_key]
        history.append(
            (best_fit, sum(s for _, s in scored) / len(scored))
        )
        if best_metrics["f1"] > params.destination_fmeasure:
            status = "Success"
            break
        if ineffective >= params.max_ineffective_iterations:
            status = "MaximumIneffectiveIterationsReached"
            break
        if iterations >= params.max_iterations:
            status = "MaximumIterationsReached"
            break
        # Reproduction.scala:41-59: keep the elite, breed the rest
        elite = [
            r
            for r, _ in sorted(scored, key=lambda rm: -rm[1])[
                : params.elitism_count
            ]
        ]
        offspring = []
        for _ in range(params.population_size - len(elite)):
            if rng.random() < params.mutation_probability:
                # MutationFunction.scala:46-49 — crossover with a
                # fresh random rule
                offspring.append(
                    _crossover(
                        rng,
                        _tournament(rng, scored, params.tournament_size),
                        random_rule(rng, spaces, params.max_operator_count),
                    )
                )
            else:
                offspring.append(
                    _crossover(
                        rng,
                        _tournament(rng, scored, params.tournament_size),
                        _tournament(rng, scored, params.tournament_size),
                    )
                )
        population = elite + offspring
        metrics = fitnesses(population)
        scored = [(r, m[fit_key]) for r, m in zip(population, metrics)]
        gen_best, gen_best_metrics = max(
            zip(population, metrics), key=lambda rm: rm[1][fit_key]
        )
        if gen_best_metrics[fit_key] <= best_fit + _SCORE_EPSILON:
            ineffective += 1  # GenLink.scala:78-81
        else:
            ineffective = 0
        if gen_best_metrics[fit_key] > best_fit:
            best_rule, best_metrics = gen_best, gen_best_metrics
        iterations += 1
        # GenLink.scala:57-60: clean every cleanFrequency iterations
        if params.clean_frequency > 0 and iterations % params.clean_frequency == 0:
            scored = clean_population(
                pairs, scored, spaces, rng, params, label_col
            )
            population = [r for r, _ in scored]
    # GenLink.scala:63-64: one final clean; re-derive the winner from
    # the cleaned population (redundant comparisons dropped) and
    # re-evaluate its full metric set
    if params.clean_frequency > 0 and scored:
        scored = clean_population(pairs, scored, spaces, rng, params, label_col)
        final_rule = max(scored, key=lambda rf: rf[1])[0]
        (final_metrics,) = evaluate_rules(
            pairs, [final_rule], label_col, params.eval_batch
        )
        if final_metrics[fit_key] >= best_metrics[fit_key] - _SCORE_EPSILON:
            best_rule, best_metrics = final_rule, final_metrics
    return {
        "rule": best_rule,
        "fitness": best_metrics[fit_key],
        "f1": best_metrics["f1"],
        "metrics": best_metrics,
        "iterations": iterations,
        "status": status,
        "history": history,
        "population": sorted(scored, key=lambda rf: -rf[1]),
    }


# ---------------------------------------------------------------------------
# the active-learning iteration
# ---------------------------------------------------------------------------


def complete_reference_pairs(
    pool: DataFrame,
    labeled: DataFrame | None,
    population: list[CandidateRule],
    label_col: str = "is_match",
    max_links: int = 50,
    max_rules: int = 10,
) -> DataFrame:
    """CompleteReferenceLinks.scala:25-71: guarantee the labeled set
    has at least one positive AND one negative pair so fitness is
    computable. A missing class is bootstrapped from the unlabeled
    pool: the first `max_links` pool pairs are scored with the mean
    confidence of up to `max_rules` population rules (one codegen
    projection over <= 50 rows); the max-confidence pair becomes the
    positive (:50-58), the min-confidence pair the negative (:60-67).
    Returns labeled ∪ bootstrapped with the pool's full column set, so
    the result feeds straight back into learn_rule."""
    y = F.col(label_col).cast("boolean")
    n_pos = n_neg = 0
    if labeled is not None:
        counts = labeled.agg(
            F.count_if(y).alias("p"), F.count_if(~y).alias("n")
        ).first()
        n_pos, n_neg = counts["p"], counts["n"]
        if n_pos > 0 and n_neg > 0:
            return labeled
    rules = population[:max_rules]
    conf = sum((r.confidence() for r in rules), F.lit(0.0)) / len(rules)
    scored = pool.drop(label_col).limit(max_links).withColumn("_conf", conf)
    parts = []
    if n_pos == 0:
        parts.append(
            scored.orderBy(F.desc("_conf"))
            .limit(1)
            .drop("_conf")
            .withColumn(label_col, F.lit(True))
        )
    if n_neg == 0:
        parts.append(
            scored.orderBy(F.asc("_conf"))
            .limit(1)
            .drop("_conf")
            .withColumn(label_col, F.lit(False))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if labeled is not None:
        out = labeled.unionByName(out)
    return out


def active_learn_iteration(
    pool: DataFrame,
    labeled: DataFrame | None,
    spaces: list[ComparisonSpace],
    params: GenLinkParams = GenLinkParams(),
    seed: int = 0,
    n_select: int = 3,
    key_cols=("left_key", "right_key"),
    label_col: str = "is_match",
    seeds: list[CandidateRule] | None = None,
) -> dict:
    """One ActiveLearning.run() pass (ActiveLearning.scala:46-81):
    (1) build the initial population (carried in via `seeds` across
    iterations, else random); (2) complete the reference links from
    the pool if a class is missing (CompleteReferenceLinks);
    (3) learn/update the population on the completed reference set
    (GenLink loop incl. periodic + final population cleaning);
    (4) committee = every individual with fitness >= 0.1 x best
    (:220-226 WeightedLinkageRule cut); (5) select the next links to
    label from the still-unlabeled pool by JS-divergence
    (config.active.selector, :228). One documented ordering
    divergence: the reference cleans the population AFTER selection;
    learn_rule cleans as its final step, so selection sees the cleaned
    population — cleaning only drops structural duplicates and
    fitness-neutral redundant comparisons, so the committee's
    decision boundary is unchanged.

    Returns learn_rule's dict plus {"reference": the completed labeled
    frame, "committee": the weighted-cut rules, "selected": a
    DataFrame of the n_select chosen key pairs} — feed `selected`
    (with labels from your oracle/user) back in as `labeled` and
    `result["population"]` rules as `seeds` for the next iteration."""
    rng = _random.Random(seed)
    init_pop = list(seeds or [])
    while len(init_pop) < params.population_size:
        init_pop.append(random_rule(rng, spaces, params.max_operator_count))
    reference = complete_reference_pairs(pool, labeled, init_pop, label_col)
    # The labeled set is small by definition (it grows by n_select per
    # user round) but its LINEAGE compounds across rounds: each round's
    # frame chains pool joins, confidence sorts, and committee codegen
    # over the previous round's plan, and learn_rule re-executes that
    # plan once per GP scan. Snap it here so every fitness scan reads a
    # materialized few-dozen-row block instead of re-deriving the whole
    # label history (unbounded plans OOM the driver by round ~3).
    reference = reference.localCheckpoint(eager=True)
    result = learn_rule(
        reference, spaces, params, label_col, seed=seed, seeds=init_pop
    )
    scored = result["population"]
    best_fit = scored[0][1]
    committee = [r for r, f in scored if f >= best_fit * 0.1] or [scored[0][0]]
    unlabeled = pool.join(
        reference.select(*key_cols), on=list(key_cols), how="left_anti"
    )
    selected = select_by_divergence(
        unlabeled,
        reference,
        committee,
        k=n_select,
        key_cols=key_cols,
        label_col=label_col,
    )
    return {
        **result,
        "reference": reference,
        "committee": committee,
        "selected": selected,
    }
