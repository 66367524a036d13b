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
    window over cuts    — cumulative TP/FP along increasing distance
                          (the cut axis is |distinct distances| rows —
                          tiny — so the unpartitioned window is safe)
    argmax F1           — deterministic (ties -> smaller cut)

At 10^10 candidate pairs this costs one narrow shuffle; per-pair
payload is two columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    w = Window.orderBy("cut").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        per_cut.crossJoin(F.broadcast(totals))
        .withColumn("tp", F.sum("_pos").over(w))
        .withColumn("fp", F.sum("_neg").over(w))
    )
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
