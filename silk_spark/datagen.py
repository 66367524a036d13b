"""Deterministic synthetic transcript + change-log generators (FIXTURES.md F1-F4).

Everything is a pure function of (seed, n): each event's fields derive
from its index via xxhash64 mixing, expressed as Catalyst Column
expressions over ``spark.range(n)``. No driver-side loops, no Python
RNG in the distributed path -> generating the conceptual 10^10-event
log is embarrassingly parallel and independent of partitioning.

Reference analogue: the names/cities benchmark CSVs
(/root/reference/silk-core/src/test/resources/names/source1.txt,
config.xml: levenshteinDistance threshold 2) -- near-duplicate text
variants here differ by edit distance <= 2 the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH0 = 1_700_000_000  # fixed base epoch (2023-11-14T22:13:20Z); no wall clock

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser", "calculator", "none"]

# small word bank for deterministic sentence synthesis
_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "data", "model",
    "query", "spark", "merge", "stream", "batch", "table", "shuffle",
]


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit mix of (seed, cols)."""
    return F.xxhash64(F.lit(seed), *cols)


def _u(seed: int, *cols) -> F.Column:
    """Uniform double in [0,1) derived from the hash."""
    return F.pmod(_h(seed, *cols), F.lit(1_000_000)).cast("double") / 1_000_000.0


def _word(seed: int, *cols) -> F.Column:
    arr = F.array(*[F.lit(w) for w in _WORDS])
    return F.element_at(arr, (F.pmod(_h(seed, *cols), F.lit(len(_WORDS))) + 1).cast("int"))


def _text_expr(seed: int, conv: F.Column, turn: F.Column, version: F.Column) -> F.Column:
    """Deterministic turn text; higher `version` values mutate the tail
    by <=2 edits (mirrors the reference's names benchmark rule:
    levenshteinDistance threshold 2, names/config.xml)."""
    base = F.format_string(
        "turn %s of conversation %s: %s %s %s %s",
        turn.cast("string"),
        conv.cast("string"),
        _word(seed + 11, conv, turn),
        _word(seed + 12, conv, turn),
        _word(seed + 13, conv, turn),
        _word(seed + 14, conv, turn),
    )
    # near-duplicate variant: append 0..2 deterministic chars per version
    suffix = F.when(version % 3 == 1, F.lit("!")).when(version % 3 == 2, F.lit("!?")).otherwise(F.lit(""))
    return F.concat(base, suffix)


def changelog(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    turns_per_conv: int = 20,
    seed: int = 42,
    zipf_s: float = 3.0,
    schema_cut: float = 0.4,
    jitter: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Binlog/WAL-shaped change stream (FIXTURES.md F2).

    Columns: lsn, offset, op(I/U/D), conv_id, turn_idx, role, text,
    tool, ts, schema_version. ~60/30/10 I/U/D mix; conv_id is
    Zipf-skewed (pow(u, zipf_s)) so a few conversations are hot --
    exercises skew salting. ts has bounded out-of-order jitter so the
    max-by-(ts, lsn) dedup window is meaningful. At lsn >= schema_cut*n
    events switch to schema_version=2 and may carry `tool` (F3).
    """
    df = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    conv = F.floor(F.pow(_u(seed + 1, i), F.lit(zipf_s)) * n_convs).cast("long")
    turn = F.pmod(_h(seed + 2, i), F.lit(turns_per_conv)).cast("int")
    opv = F.pmod(_h(seed + 3, i), F.lit(10))
    op = F.when(opv < 6, "I").when(opv < 9, "U").otherwise("D")
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.pmod(_h(seed + 4, i), F.lit(len(ROLES))) + 1).cast("int")
    )
    # version counter drives near-duplicate text mutation for updates
    version = F.pmod(_h(seed + 5, i), F.lit(3))
    sv = F.when(i < int(schema_cut * n_events), 1).otherwise(2).cast("int")
    tool = F.when(
        (sv == 2) & (F.pmod(_h(seed + 6, i), F.lit(4)) == 0),
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (F.pmod(_h(seed + 7, i), F.lit(len(TOOLS))) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))
    ts_index = i + (F.pmod(_h(seed + 8, i), F.lit(2 * jitter + 1)) - jitter)
    ts = F.timestamp_seconds(F.lit(EPOCH0) + ts_index)

    is_del = op == "D"
    return df.select(
        i.alias("lsn"),
        i.alias("offset"),
        op.alias("op"),
        F.format_string("conv-%08d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(is_del, F.lit(None).cast("string"))
        .otherwise(_text_expr(seed, conv, turn, version))
        .alias("text"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        ts.alias("ts"),
        sv.alias("schema_version"),
    )


def transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    turns_per_conv: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Base transcripts table (FIXTURES.md F1): dense (conv_id, turn_idx)."""
    df = spark.range(0, n_convs * turns_per_conv, 1)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int")
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.pmod(_h(seed + 4, F.col("id")), F.lit(len(ROLES))) + 1).cast("int")
    )
    return df.select(
        F.format_string("conv-%08d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        _text_expr(seed, conv, turn, F.lit(0)).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(EPOCH0) + F.col("id")).alias("ts"),
    )


def near_dup_turns(
    spark: SparkSession,
    n_pairs: int = 200,
    n_distractors: int = 400,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Join-and-score fixture (FIXTURES.md F4): returns (records, golden_pairs).

    For each seeded true-duplicate pair: two records, same conv_id,
    turn_idx differing by 0..1, text within Levenshtein distance <= 2.
    Distractors share a conv block but sit at distance > 4 (different
    word tail). Mirrors names/links.nt golden-link layout.
    """
    pairs = spark.range(0, n_pairs, 1)
    i = F.col("id")
    conv = F.format_string("conv-%08d", i)
    turn = F.pmod(_h(seed + 21, i), F.lit(10)).cast("int")
    dturn = F.pmod(_h(seed + 22, i), F.lit(2)).cast("int")  # 0 or 1
    base_text = _text_expr(seed, i, turn, F.lit(0))
    dup_text = _text_expr(seed, i, turn, F.lit(1) + F.pmod(_h(seed + 23, i), F.lit(2)))

    left = pairs.select(
        conv.alias("conv_id"), turn.alias("turn_idx"), base_text.alias("text"),
        F.concat(F.lit("L-"), i.cast("string")).alias("rec_id"),
    )
    right = pairs.select(
        conv.alias("conv_id"), (turn + dturn).alias("turn_idx"), dup_text.alias("text"),
        F.concat(F.lit("R-"), i.cast("string")).alias("rec_id"),
    )
    distract = spark.range(0, n_distractors, 1).select(
        F.format_string("conv-%08d", F.pmod(_h(seed + 24, F.col("id")), F.lit(n_pairs))).alias("conv_id"),
        (F.pmod(_h(seed + 25, F.col("id")), F.lit(10)) + 20).cast("int").alias("turn_idx"),
        F.format_string(
            "distractor %s completely different content %s %s %s %s",
            F.col("id").cast("string"),
            _word(seed + 26, F.col("id")), _word(seed + 27, F.col("id")),
            _word(seed + 28, F.col("id")), _word(seed + 29, F.col("id")),
        ).alias("text"),
        F.concat(F.lit("D-"), F.col("id").cast("string")).alias("rec_id"),
    )
    records = left.unionByName(right).unionByName(distract)
    golden = pairs.select(
        F.concat(F.lit("L-"), i.cast("string")).alias("left_rec_id"),
        F.concat(F.lit("R-"), i.cast("string")).alias("right_rec_id"),
        F.lit(True).alias("is_match"),
    )
    return records, golden
