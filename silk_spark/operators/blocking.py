"""Blocking / candidate generation: Silk's execution methods reborn.

Reference: ExecutionMethod plugins (/root/reference/silk-rules/src/
main/scala/org/silkframework/rule/execution/methods/*.scala; Index at
silk-core/.../entity/Index.scala:19-104). Silk builds a per-entity
multidimensional index and compares two entities iff their indexes
share >= 1 value (Index.matches, Index.scala:38).

Spark-first translation: every method produces an ``array<bigint>``
block-id column; candidate generation = ``explode`` + equi-join on the
block id + pair-level ``dropDuplicates``. The O(n*m) partition loops,
the 101-block hash routing and the file caches all collapse into one
shuffle the engine already optimizes (AQE skew handling replaces hot
blocks becoming stragglers).

Index combination (MultiBlock, rule/similarity/Aggregation.scala:57-66):
AND-aggregators conjunct (cross-combine) child indexes, OR-aggregators
disjunct (union) them — `conjunction` / `disjunction` below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCKS = 101  # reference default: config/Blocking.scala:40


# ---------------------------------------------------------------------------
# block-id column builders (each returns array<bigint>)
# ---------------------------------------------------------------------------


def full_index() -> Column:
    """Full.scala:10-12 — everything in one block (cross product).
    Tests only; never at scale."""
    return F.array(F.lit(0).cast("bigint"))


def key_block(key: Column, blocks: int = DEFAULT_BLOCKS) -> Column:
    """Blocking.scala:19-33 — single hash block per entity.
    The reference Soundex-encodes first; compose with
    transformers.soundex(key) for that behavior."""
    return F.array(F.pmod(F.xxhash64(key), F.lit(blocks)))


def multi_pass_blocks(keys: list[Column], blocks: int = DEFAULT_BLOCKS) -> Column:
    """MultiPassBlocking.scala:13-21 — union of hash blocks over
    several keys. Each key hashes into its own id space (offset by
    position) so different keys never collide cross-pass."""
    parts = [
        F.pmod(F.xxhash64(k), F.lit(blocks)) + i * blocks for i, k in enumerate(keys)
    ]
    return F.array_distinct(F.array(*parts))


def composite_block(k1: Column, k2: Column, blocks: int = DEFAULT_BLOCKS) -> Column:
    """CompositeBlocking.scala:11-21 — block on the concatenated pair."""
    return F.array(F.pmod(F.xxhash64(k1, F.lit("|"), k2), F.lit(blocks)))


def sorted_blocks(key: Column, overlap: float = 0.25, blocks: int = DEFAULT_BLOCKS) -> Column:
    """SortedBlocks.scala:10-45 — map a string prefix into [0,1),
    overlapping continuous blocks (sorted-neighborhood analogue).
    A value near a block boundary is also indexed into the neighbor."""
    c1 = (F.ascii(F.upper(F.substring(key, 1, 1))) - 64).cast("double") / 27.0
    c2 = (F.ascii(F.upper(F.substring(key, 2, 1))) - 64).cast("double") / 27.0
    pos = F.least(F.greatest(c1 + c2 / 27.0, F.lit(0.0)), F.lit(0.999999))
    return continuous_index(pos, 0.0, 1.0, blocks, overlap)


def continuous_index(
    value: Column, lo: float, hi: float, block_count: int, overlap: float = 0.25
) -> Column:
    """Index.continuous (Index.scala:133-159): numeric value → its
    block plus the neighbor when within `overlap` of the boundary."""
    width = (hi - lo) / block_count
    scaled = (value.cast("double") - lo) / width
    base = F.floor(scaled)
    frac = scaled - base
    left = F.when(frac < overlap, base - 1)
    right = F.when(frac > 1.0 - overlap, base + 1)
    arr = F.array_compact(F.array(base, left, right))
    clamped = F.filter(arr, lambda b: (b >= 0) & (b < block_count))
    return F.array_distinct(F.transform(clamped, lambda b: b.cast("bigint")))


def qgram_blocks(key: Column, q: int = 2, max_grams: int = 5) -> Column:
    """QGrams.scala:22-53 — pigeonhole prefix filter: index the first
    `max_grams` q-grams (of the '#'-padded string); two strings within
    edit distance t share >= 1 of their first t*q+1 grams."""
    pad = "#" * (q - 1)
    padded = F.concat(F.lit(pad), key, F.lit(pad))
    idx = F.sequence(F.lit(1), F.greatest(F.length(padded) - (q - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: padded.substr(i, F.lit(q)))
    first = F.slice(F.array_distinct(grams), 1, max_grams)
    return F.array_distinct(F.transform(first, lambda g: F.xxhash64(g)))


def tokens_blocks(tokens: Column, prefix: int | None = None) -> Column:
    """Token-hash indexing for Jaccard-family measures
    (JaccardDistance.scala:40-47). With `prefix`, keep only the
    `prefix` smallest hashes (prefix-filter sizing :41-46)."""
    hashed = F.array_distinct(F.transform(tokens, lambda t: F.xxhash64(t)))
    if prefix is not None:
        return F.slice(F.array_sort(hashed), 1, prefix)
    return hashed


# ---------------------------------------------------------------------------
# index combination (Index.conjunction / disjunction, Index.scala:44-80)
# ---------------------------------------------------------------------------


def disjunction(*indexes: Column) -> Column:
    """OR: entity matches if any child index matches → union, with each
    child offset into its own id space (mirrors Index dimension
    disjointness without tracking dimension sizes)."""
    parts = [
        F.transform(ix, lambda b: F.xxhash64(F.lit(i), b)) for i, ix in enumerate(indexes)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = F.array_union(out, p)
    return out


def conjunction(*indexes: Column) -> Column:
    """AND: entity matches only if every child matches → cross-combine
    child ids into composite ids (Index.conjunction semantics).
    Sizes multiply — keep child indexes small (the reference caps
    index sizes for the same reason, Index.scala maxIndexSize)."""
    out = indexes[0]
    for ix in indexes[1:]:
        out = F.flatten(F.transform(out, lambda a: F.transform(ix, lambda b: F.xxhash64(a, b))))
    return F.array_distinct(out)


# ---------------------------------------------------------------------------
# candidate generation
# ---------------------------------------------------------------------------


def candidate_pairs(
    left: DataFrame,
    right: DataFrame | None,
    left_index: Column,
    right_index: Column | None = None,
    salt: int = 1,
    self_key: str | None = None,
    dedup_pairs: bool = True,
) -> DataFrame:
    """Blocked candidate join: explode block ids on both sides,
    equi-join on the id, drop duplicate pairs.

    Columns are prefixed left_/right_. `right=None` → self-join
    deduplication mode: each unordered pair once via a total-order
    predicate on a synthetic row key (Matcher.scala:220-240,264's
    sourceEqualsTarget halving).

    `salt > 1` splits every block into `salt` sub-blocks on the right
    side and replicates left rows across them — the explicit hot-block
    salting Silk lacks (its hot blocks just become big O(n*m) tasks).
    """
    self_join = right is None
    if self_join:
        right = left
        right_index = left_index if right_index is None else right_index
    if right_index is None:
        right_index = left_index

    lcols = [F.col(c).alias(f"left_{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"right_{c}") for c in right.columns]
    l = left.select(*lcols, F.explode(left_index).alias("_block"))
    r = right.select(*rcols, F.explode(right_index).alias("_block"))

    if salt > 1:
        r = r.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in r.columns]), F.lit(salt)))
        l = l.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        join_keys = ["_block", "_salt"]
    else:
        join_keys = ["_block"]

    pairs = l.join(r, on=join_keys, how="inner").drop("_block", "_salt")
    if self_join:
        # compare each unordered pair exactly once; with `self_key` the
        # orientation is deterministic (left.key < right.key), else an
        # arbitrary-but-stable total order on the full row hash
        if self_key is not None:
            pairs = pairs.filter(F.col(f"left_{self_key}") < F.col(f"right_{self_key}"))
        else:
            lkey = F.xxhash64(*[F.col(f"left_{c}") for c in left.columns])
            rkey = F.xxhash64(*[F.col(f"right_{c}") for c in left.columns])
            pairs = pairs.filter(lkey < rkey)
    # single-block indexes (key_block/composite_block, salt=1) cannot
    # produce duplicate pairs — callers pass dedup_pairs=False to skip
    # the extra shuffle
    if dedup_pairs:
        pairs = pairs.dropDuplicates([c for c in pairs.columns])
    return pairs
