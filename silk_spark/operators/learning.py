"""Supervised threshold calibration for linkage rules.

The most-used slice of the reference's learning stack, re-expressed
distributed: given candidate pairs scored with a DISTANCE and labeled
against reference links, find the distance cut that maximizes F1 —
what Silk's learning does for the threshold parameter of a fixed rule
structure, and what its evaluation UI sweeps interactively.
Reference: silk-learning/src/main/scala/org/silkframework/learning/
LearningActivity.scala (parameter search over rule candidates),
silk-rules/.../rule/evaluation/EvaluationResult.scala:36-64 (the
precision / recall / F1 / MCC definitions reproduced here).

Full genetic-programming rule-structure search stays out of scope
(SURVEY §2.14); threshold calibration is the piece with a natural
one-pass distributed form:

    groupBy(distance)   — per-cut positives/negatives (ONE shuffle of
                          bare (distance, label) pairs)
    prefix sums         — cumulative TP/FP along increasing distance,
                          RANGE-PARTITIONED: local running sums per
                          range partition + a broadcast of per-
                          partition offsets (the classic two-phase
                          scan), so a CONTINUOUS score column with
                          |cuts| ≈ |pairs| distinct values never
                          serializes onto one task — the only
                          unpartitioned window runs over the
                          P-row partition-totals frame
    argmax F1           — deterministic (ties -> smaller cut)

At 10^10 candidate pairs this costs one narrow shuffle of (distance,
label) pairs plus two narrow shuffles of the distinct-cut frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cumulative_by_cut(per_cut: DataFrame) -> DataFrame:
    """Cumulative _pos/_neg sums along increasing `cut` WITHOUT an
    unpartitioned window: range-partition by cut (partition i holds
    strictly smaller cuts than partition i+1), take local running sums
    inside each partition, then add each partition's offset = sum of
    all earlier partitions' totals. The offsets frame has one row per
    partition — that tiny frame is the only thing an unpartitioned
    window ever touches, so a continuous score column (|cuts| ≈
    |pairs|) scales across the cluster instead of landing on one task."""
    n_parts = int(
        per_cut.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranged = per_cut.repartitionByRange(n_parts, F.col("cut").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("cut")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_ltp", F.sum("_pos").over(w_local)).withColumn(
        "_lfp", F.sum("_neg").over(w_local)
    )
    part_totals = ranged.groupBy("_pid").agg(
        F.sum("_pos").alias("_ptp"), F.sum("_neg").alias("_pfp")
    )
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # P rows only — safe unpartitioned
    offsets = part_totals.select(
        "_pid",
        F.coalesce(F.sum("_ptp").over(w_prev), F.lit(0)).alias("_otp"),
        F.coalesce(F.sum("_pfp").over(w_prev), F.lit(0)).alias("_ofp"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("tp", F.col("_ltp") + F.col("_otp"))
        .withColumn("fp", F.col("_lfp") + F.col("_ofp"))
        .drop("_pid", "_ltp", "_lfp", "_otp", "_ofp")
    )


def threshold_sweep(
    pairs: DataFrame,
    distance_col: str = "distance",
    label_col: str = "is_match",
) -> DataFrame:
    """Per-cut confusion metrics: for every distinct distance d, the
    classifier `match iff distance <= d` gets (tp, fp, fn, tn,
    precision, recall, f1, mcc) — EvaluationResult.scala:36-64
    definitions. Input: one row per labeled candidate pair."""
    lab = F.col(label_col).cast("boolean").cast("int")
    per_cut = (
        pairs.select(F.col(distance_col).alias("cut"), lab.alias("_y"))
        .groupBy("cut")
        .agg(
            F.sum("_y").alias("_pos"),
            (F.count("*") - F.sum("_y")).alias("_neg"),
        )
    )
    # totals ride a one-row broadcast, not a second pass over pairs
    totals = per_cut.agg(
        F.sum("_pos").alias("_tot_pos"), F.sum("_neg").alias("_tot_neg")
    )
    cum = _cumulative_by_cut(per_cut).crossJoin(F.broadcast(totals))
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn = (F.col("_tot_pos") - F.col("tp")).cast("double")
    tn = (F.col("_tot_neg") - F.col("fp")).cast("double")
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    mcc_den = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    mcc = F.when(mcc_den > 0, (tp * tn - fp * fn) / mcc_den).otherwise(F.lit(0.0))
    return cum.select(
        "cut",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        mcc.alias("mcc"),
    )


def binary_entropy(p: "F.Column") -> "F.Column":
    """H(p) = (−p·ln p − (1−p)·ln(1−p)) / ln 2, 0 at the endpoints —
    the reference's binary entropy (JensenShannonDivergenceSelector
    .scala:94-99, EntropySelector.scala:34-41)."""
    import math

    safe = (p > 0.0) & (p < 1.0)
    h = (-p * F.log(p) - (1.0 - p) * F.log(1.0 - p)) / F.lit(math.log(2.0))
    return F.when(safe, h).otherwise(F.lit(0.0))


def select_uncertain(
    links: DataFrame,
    k: int = 10,
    confidence_col: str = "confidence",
    key_cols=("left_key", "right_key"),
) -> DataFrame:
    """Active-learning link selection by uncertainty sampling: rank
    unlabeled candidate links by the binary entropy of p = confidence
    mapped from Silk's [−1, 1] onto [0, 1] (UniformSelector.scala:55
    `rule(...) * 0.5 + 0.5`), and keep the k most uncertain — the
    links closest to the decision boundary, whose labels teach the
    learner the most (EntropySelector.scala:29-41 picks argmax
    entropy; this is its top-k batch form, LinkSelector.scala:24).

    Scale shape: entropy is one codegen projection; the global top-k
    is orderBy + limit, which Catalyst plans as TakeOrderedAndProject
    (per-partition heaps + one k-row merge at the driver) — no
    unpartitioned window, no full sort. Ties break deterministically
    on the key columns."""
    p = (F.col(confidence_col) * 0.5 + 0.5).cast("double")
    ranked = links.withColumn("entropy", F.round(binary_entropy(p), 6))
    order = [F.col("entropy").desc()] + [F.col(c).asc() for c in key_cols]
    return ranked.orderBy(*order).limit(int(k))


def fit_threshold(
    pairs: DataFrame,
    distance_col: str = "distance",
    label_col: str = "is_match",
) -> dict:
    """The F1-optimal distance cut (ties -> smaller cut, deterministic).
    Returns the winning sweep row as a dict — feed `cut` straight into
    `Comparison(threshold=...)`."""
    best = (
        threshold_sweep(pairs, distance_col, label_col)
        .orderBy(F.col("f1").desc(), F.col("cut").asc())
        .first()
    )
    return best.asDict() if best is not None else {}
