"""Deterministic sampling for training-mix construction.

Reproducible sampling a large-scale training-data pipeline needs:
per-stratum Bernoulli rates (language/domain mixes) and train/val/test
holdout splits that are stable across runs, engines, cluster sizes and
input order. The reference's sampling surfaces
(PeakDataSource / SampleValueAnalyzer,
silk-core/.../dataset/sampling; sources/files.py here) draw
best-effort profiling samples; a curation pipeline instead derives
membership from a HASH of the row key, so re-running the job (or
re-sharding the cluster) reproduces the same sample row-for-row, and
the decision is a pure codegen filter — zero shuffle, zero RNG state,
pushdown-friendly.

Portability contract: the unit interval is the first 15 md5 hex chars
of "<seed>:<key>" read as a 60-bit integer (the engine-portable
hex-parse used by simhash60_signature — md5 + hex-parse exist in
Spark and DuckDB alike, verified bit-identical there). Membership
compares that INTEGER against floor(fraction * 2^60) — integer
comparison, so there is no float-rounding seam between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1 << 60


def hash_bucket(key: Column, seed: int = 42) -> Column:
    """Deterministic 60-bit bucket of (seed, key): bigint in
    [0, 2^60). DuckDB twin:
    ``('0x' || substr(md5(seed || ':' || key), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def uniform_hash(key: Column, seed: int = 42) -> Column:
    """u ~ U[0,1), deterministic in (key, seed) — hash_bucket / 2^60.
    For membership tests prefer stratified_sample / split_assign,
    which compare the integer bucket directly."""
    return hash_bucket(key, seed).cast("double") / float(_SCALE)


def stratified_sample(
    df: DataFrame,
    strata: Column,
    fractions: dict,
    key: Column,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    hash_bucket(key, seed) < floor(fraction(stratum) * 2^60).

    Scale shape: one whole-stage-codegen filter — no shuffle, no
    sampling state, no sort; the same rows survive on 1 executor or
    1000, and a re-run after a crash reproduces the sample exactly
    (the property partition-local RNG sampling like df.sample cannot
    give once inputs re-split). Strata weights ride a literal
    when-chain (training mixes have tens of strata, not millions —
    for a data-driven strata table, broadcast-join the fractions in
    and compare against the joined threshold column instead)."""
    thresh = F.lit(int(float(default_fraction) * _SCALE))
    for name in sorted(fractions, reverse=True):
        thresh = F.when(
            strata == F.lit(name), F.lit(int(float(fractions[name]) * _SCALE))
        ).otherwise(thresh)
    return df.filter(hash_bucket(key, seed) < thresh)


def epoch_order(key: Column, epoch: int, seed: int = 42) -> Column:
    """Deterministic training-order key for an epoch: order rows by
    this column to get a reproducible pseudo-random permutation that
    CHANGES each epoch but is identical across runs, partitionings
    and engines — global training-order shuffling without RNG state
    (a distributed sort on a hash column; at 10^10 rows that is one
    range exchange, the same cost as any global sort). Ties are
    impossible for distinct keys up to md5 collisions."""
    return hash_bucket(key, seed=seed * 1_000_003 + int(epoch))


def split_assign(
    key: Column, weights: "dict[str, float]", seed: int = 42
) -> Column:
    """Deterministic holdout assignment: label ~ weights by cumulative
    2^60-scaled ranges over hash_bucket(key, seed) — the train/val/test
    split as a pure Column (stable under re-runs and re-sharding;
    weights should sum to ~1.0, any remainder falls to the LAST label
    in sorted order)."""
    names = sorted(weights)
    bucket = hash_bucket(key, seed)
    # ascending when-chain: earlier WHENs test SMALLER cut points, so
    # each bucket lands in the first range containing it
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(weights[name])
        cond = bucket < F.lit(int(cum * _SCALE))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
