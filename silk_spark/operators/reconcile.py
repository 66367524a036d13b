"""Join-and-score reconciliation of near-duplicate turn records.

The north-star stage (BASELINE.json): before a micro-batch MERGEs,
records that are *the same turn observed twice* — same conversation,
turn index off by one, text within a small edit distance (retries,
editor resends, at-least-once upstreams) — are canonicalized onto one
key so the max-by-(ts, lsn) dedup resolves them like any other
duplicate. This is Silk's matcher applied inside the CDC stream:

    block on conv_id (salted)  →  GenerateLinks' CacheLoader/Index
    candidate equi-join        →  Matcher partition scoring
    levenshtein + confidence   →  Comparison (names-benchmark rule:
                                  threshold 2, config.xml)
    best-link-per-record       →  Filter.scala:33-50 top-1
    remap to canonical key     →  the link's "owl:sameAs" applied

Reference: rule/execution/GenerateLinks.scala:63-132, Matcher.scala:
254-291, Filter.scala:33-50; distance semantics Comparison.scala:71-78.

Scale: candidates never leave their conv_id block; hot conversations
split with `salt`; scoring is built-in levenshtein (codegen). The
remap is a broadcast-friendly left join on the (typically tiny)
mapping. Single-pass (no transitive closure): each record maps to its
best lower-keyed match — chains A<-B<-C resolve over successive
batches, which is the at-least-once-friendly behavior we want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def near_dup_mapping(
    batch: DataFrame,
    text_threshold: float = 2.0,
    turn_window: int = 1,
    keys=("conv_id", "turn_idx"),
    text_col: str = "text",
    version_cols=("ts", "lsn"),
) -> DataFrame:
    """Mapping (conv_id, turn_idx, lsn) -> canonical_turn_idx for
    records that near-duplicate an earlier turn in the same batch."""
    conv, turn = keys
    lsn = version_cols[-1]
    rec = batch.select(conv, turn, lsn, text_col).filter(F.col(text_col).isNotNull())
    l = rec.select(
        F.col(conv).alias("c"),
        F.col(turn).alias("left_turn"),
        F.col(text_col).alias("left_text"),
    )
    r = rec.select(
        F.col(conv).alias("c"),
        F.col(turn).alias("right_turn"),
        F.col(lsn).alias("right_lsn"),
        F.col(text_col).alias("right_text"),
    )
    pairs = l.join(r, "c").filter(
        (F.col("right_turn") > F.col("left_turn"))
        & (F.col("right_turn") <= F.col("left_turn") + turn_window)
    )
    scored = pairs.withColumn(
        "lev", F.levenshtein(F.col("left_text"), F.col("right_text"))
    ).filter(F.col("lev") <= text_threshold)
    # best canonical target per duplicate record: closest text, then
    # smallest turn (deterministic)
    w = Window.partitionBy("c", "right_turn", "right_lsn").orderBy(
        F.col("lev").asc(), F.col("left_turn").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("c").alias(conv),
            F.col("right_turn").alias(turn),
            F.col("right_lsn").alias(lsn),
            F.col("left_turn").alias("canonical_turn"),
        )
    )


def reconcile_near_dups(
    batch: DataFrame,
    text_threshold: float = 2.0,
    turn_window: int = 1,
    keys=("conv_id", "turn_idx"),
    text_col: str = "text",
    version_cols=("ts", "lsn"),
) -> DataFrame:
    """Rewrite near-duplicate records onto their canonical turn key;
    the downstream max-by-version dedup then keeps one winner per
    reconciled turn. Schema is unchanged."""
    conv, turn = keys
    lsn = version_cols[-1]
    mapping = near_dup_mapping(
        batch, text_threshold, turn_window, keys, text_col, version_cols
    )
    out = batch.join(F.broadcast(mapping), on=[conv, turn, lsn], how="left")
    return out.withColumn(
        turn, F.coalesce(F.col("canonical_turn"), F.col(turn))
    ).drop("canonical_turn").select(*batch.columns)
