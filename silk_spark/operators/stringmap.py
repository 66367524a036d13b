"""StringMap execution method: FastMap embedding of strings into R^d.

Reference: silk-rules/.../rule/execution/methods/StringMap.scala:13-253
(Jin, Li, Mehrotra DASFAA 2003 applying Faloutsos & Lin's FastMap,
SIGMOD 1995). Strings embed into R^dim via deterministic pivot pairs
under Levenshtein; Euclidean distance in the mapped space is a cheap
CONTRACTIVE proxy — pairs farther than the learned mapped threshold
cannot be within the string threshold, so filtering on it prunes
without (in practice) losing true pairs. The reference scans every
(source × target) pair per partition and filters on mapped distance;
here the mapped space is GRID-BLOCKED (cell width = mapped threshold,
probe own + neighbor cells per dimension — Index.continuous semantics,
silk-core/.../entity/Index.scala:133-159) so candidate generation is
an equi-join, not a cross product.

Driver-side work is bounded: pivots + mapped threshold are fit on a
collected SAMPLE (the reference fits on whole partitions, which are
<= 1000 entities anyway); per-row coordinates are computed
distributedly as pure JVM Column expressions (built-in levenshtein +
higher-order-function arithmetic — fastmap_coordinates_expr), with a
pandas-UDF twin kept only as a bit-exactness parity fixture.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from silk_spark.functions.measures import _plain_levenshtein


@dataclass
class FastMapModel:
    pivots_a: list[str]
    pivots_b: list[str]
    pivot_coords_a: list[list[float]]  # coords of pivot A per dim (prefix dims)
    pivot_coords_b: list[list[float]]
    dab: list[float]
    mapped_threshold: float


def _proj_distance(s1: str, c1: list[float], s2: str, c2: list[float], dim: int) -> float:
    """Distance in the residual space of dimension `dim`: original
    metric minus the projections onto the first `dim` axes
    (StringMap.scala getDistance).

    Float ops are explicit multiply + math.sqrt (both single-rounded
    IEEE-754) rather than `**` (libm pow, up to 1 ulp off), so this
    driver-side reference path is bit-identical to the JVM Column
    compilation (fastmap_coordinates_expr) — pinned by the parity
    test."""
    lev = float(_plain_levenshtein(s1, s2))
    d2 = lev * lev
    for k in range(dim):
        t = c1[k] - c2[k]
        d2 -= t * t
    return math.sqrt(d2 if d2 > 0 else 0.0)


def fastmap_fit(
    values: list[str],
    dimensionality: int = 20,
    dist_threshold: int = 2,
    threshold_percentage: float = 0.5,
) -> FastMapModel:
    """Deterministic FastMap fit (StringMap.scala Mapper): choose pivot
    pairs by 5 farthest-point iterations per dimension, project every
    sample, then learn the mapped-space threshold as the max mapped
    distance among sample pairs within `dist_threshold` true distance."""
    n = len(values)
    coords = [[0.0] * dimensionality for _ in range(n)]
    pa: list[int] = [0] * dimensionality
    pb: list[int] = [0] * dimensionality
    dabs: list[float] = [0.0] * dimensionality

    def dist(i: int, j: int, dim: int) -> float:
        return _proj_distance(values[i], coords[i], values[j], coords[j], dim)

    def farthest(frm: int, dim: int) -> int:
        best, best_d = 0, -1.0
        for i in range(n):
            if i == frm:
                continue
            d = dist(frm, i, dim)
            if d > best_d:
                best, best_d = i, d
        return best

    for dim in range(dimensionality):
        a, b = 0, dim % max(n, 1)
        for _ in range(5):
            a = farthest(b, dim)
            b = farthest(a, dim)
        pa[dim], pb[dim] = a, b
        dab = dist(a, b, dim)
        dabs[dim] = dab
        for i in range(n):
            if dab == 0.0:
                coords[i][dim] = 0.0
            else:
                x = dist(i, a, dim)
                y = dist(i, b, dim)
                coords[i][dim] = (x * x + dab * dab - y * y) / (2.0 * dab)

    # learn mapped threshold on the sample prefix (computeThreshold)
    k = max(int(n * threshold_percentage), 1)
    mapped_threshold = 0.0
    for i in range(k):
        for j in range(k):
            if i == j:
                continue
            d = _plain_levenshtein(values[i], values[j])
            if 0 < d <= dist_threshold:
                md = sum((coords[i][t] - coords[j][t]) ** 2 for t in range(dimensionality)) ** 0.5
                mapped_threshold = max(mapped_threshold, md)
    # CLAMP to a floor derived from the true threshold: the learned
    # radius is a max over SAMPLED in-threshold pairs — an unsampled
    # true pair with a larger mapped distance would be dropped, and
    # FastMap on Levenshtein is NOT provably contractive (residual
    # spaces can expand distances: measured expansion on an
    # adversarial fit — pivots from a disjoint string population —
    # reaches ~1.16x the true distance). The 1.5x margin covers that
    # observed expansion with headroom, so recall stays 1.0 even when
    # the sample contains no in-threshold pair at all (pinned by
    # test_recall_survives_unsampled_true_pairs). Pruning is a
    # candidate filter only — the exact verify downstream keeps
    # precision exact regardless.
    mapped_threshold = max(mapped_threshold, 1.5 * float(dist_threshold))
    return FastMapModel(
        pivots_a=[values[i] for i in pa],
        pivots_b=[values[i] for i in pb],
        pivot_coords_a=[list(coords[i]) for i in pa],
        pivot_coords_b=[list(coords[i]) for i in pb],
        dab=dabs,
        mapped_threshold=mapped_threshold + 1e-5,
    )


def map_value(model: FastMapModel, s: str) -> list[float]:
    """Project one string with the fitted pivots (StringMap.scala
    mapValue)."""
    dims = len(model.pivots_a)
    c: list[float] = []
    for dim in range(dims):
        dab = model.dab[dim]
        if dab == 0.0:
            c.append(0.0)
            continue
        x = _proj_distance(s, c, model.pivots_a[dim], model.pivot_coords_a[dim], dim)
        y = _proj_distance(s, c, model.pivots_b[dim], model.pivot_coords_b[dim], dim)
        c.append((x * x + dab * dab - y * y) / (2.0 * dab))
    return c


def fastmap_coordinates(model: FastMapModel) -> Column:
    """Column factory: pandas UDF mapping a string column to its R^dim
    coordinates (the model rides the closure as a broadcast).

    Parity/testing path only — production candidate generation uses
    fastmap_coordinates_expr (pure JVM columns, no per-row Python)."""

    @pandas_udf(ArrayType(DoubleType()))
    def _udf(s: pd.Series) -> pd.Series:
        return pd.Series([map_value(model, x) if x is not None else None for x in s])

    return _udf


def fastmap_coordinates_expr(model: FastMapModel, col: Column) -> Column:
    """map_value compiled to JVM Column expressions — the per-row hot
    path with NO Python anywhere (the north rule's requirement; the
    pandas-UDF variant ran 2×dim interpreted Levenshtein DPs per
    string and was the engine's last per-row-Python cost center).

    The FastMap recursion only ever consumes (a) the ORIGINAL
    Levenshtein distances from the string to each dimension's two
    pivots — 2×dim built-in `F.levenshtein` calls, codegen'd — and
    (b) arithmetic over the coordinates computed for EARLIER
    dimensions. (b) is expressed with higher-order functions
    (`aggregate` over the dimension sequence accumulating the
    coordinate array, `transform`/`aggregate` for the residual
    projections), which the JVM evaluates ITERATIVELY per row — a
    naive withColumn chain would let CollapseProject inline each
    coordinate into the next and blow the expression tree up
    exponentially (~3^dim nodes).

    Float-op order replicates map_value exactly (sequential
    subtraction of projection terms, sqrt-then-square, identical
    association), so results are bit-identical to the pandas UDF —
    pinned by tests (both IEEE-754 doubles with correctly-rounded
    sqrt; same op sequence ⇒ same roundings).

    Reference semantics: StringMap.scala:13-253 (mapValue /
    getDistance)."""
    dims = len(model.pivots_a)
    # pivot strings / coords / dab as ARRAY LITERALS (constant-folded
    # to one Literal each by the optimizer): each fold step below does
    # its own element_at lookups + two levenshtein expressions (each
    # referenced twice in `lev*lev`, so up to 4 evaluations per step
    # in interpreted mode — constant in dim, which is the point). The
    # obvious alternative — precomputing la = array(levenshtein(col,
    # pivot_0), ...) outside and element_at-ing it inside the lambda —
    # embeds the whole 2×dim-levenshtein array constructor into the
    # lambda body, which the interpreter re-evaluates at EVERY step:
    # O(dim²) Levenshtein DPs per row (measured ~800 µs/row at dim=10
    # vs ~20 µs/row this way).
    pa = F.array(*[F.lit(p) for p in model.pivots_a])
    pb = F.array(*[F.lit(p) for p in model.pivots_b])
    ca = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in model.pivot_coords_a]
    )
    cb = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in model.pivot_coords_b]
    )
    dab = F.array(*[F.lit(float(v)) for v in model.dab])

    def _proj_sq(acc: Column, lev_d: Column, pivot_row: Column) -> Column:
        # _proj_distance squared: lev² minus, IN ORDER, each
        # (c_k − pivot_k)² for k < d (acc holds exactly the first d
        # coords), clamped at 0 and passed through sqrt-then-square to
        # reproduce map_value's float roundings bit-for-bit
        sq_terms = F.transform(
            acc,
            lambda c, k: (c - F.element_at(pivot_row, k + F.lit(1)))
            * (c - F.element_at(pivot_row, k + F.lit(1))),
        )
        resid = F.aggregate(sq_terms, lev_d * lev_d, lambda s, t: s - t)
        root = F.sqrt(F.greatest(resid, F.lit(0.0)))
        return root * root

    def _step(acc: Column, d: Column) -> Column:
        i = d + F.lit(1)
        dab_d = F.element_at(dab, i)
        la_d = F.levenshtein(col, F.element_at(pa, i)).cast("double")
        lb_d = F.levenshtein(col, F.element_at(pb, i)).cast("double")
        x2 = _proj_sq(acc, la_d, F.element_at(ca, i))
        y2 = _proj_sq(acc, lb_d, F.element_at(cb, i))
        c_d = F.when(dab_d == F.lit(0.0), F.lit(0.0)).otherwise(
            (x2 + dab_d * dab_d - y2) / (F.lit(2.0) * dab_d)
        )
        return F.concat(acc, F.array(c_d))

    coords = F.aggregate(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        F.array().cast("array<double>"),
        _step,
    )
    return F.when(col.isNull(), F.lit(None).cast("array<double>")).otherwise(coords)


def stringmap_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    dist_threshold: int = 2,
    dimensionality: int = 20,
    sample_size: int = 200,
    block_dims: int = 3,
    seed: int = 42,
) -> DataFrame:
    """StringMap candidate generation: fit FastMap on a bounded sample
    of both sides, map every row, grid-block the first `block_dims`
    mapped coordinates at cell width = mapped threshold with ±1-cell
    probing (any pair within the threshold differs by < 1 cell per
    axis, so it shares a probed cell — recall 1.0 w.r.t. the mapped
    filter), then keep pairs with Euclidean mapped distance below the
    learned threshold. Output columns left_*/right_* + mapped_dist;
    feed to an exact verify (e.g. levenshtein <= dist_threshold)."""
    # fit on DISTINCT values: real key columns are often low-cardinality
    # relative to row count, and a multiset sample can collapse to many
    # copies of one value — then every pivot pair coincides, dab == 0
    # for all dims, every row maps to the origin, and the "grid-blocked"
    # join silently degenerates to a full cross product
    sample = [
        r["v"]
        for r in left.select(F.col(left_key).alias("v"))
        .unionByName(right.select(F.col(right_key).alias("v")))
        .filter(F.col("v").isNotNull())
        .distinct()
        .orderBy(F.xxhash64("v", F.lit(seed)))  # deterministic shuffle
        .limit(sample_size)
        .collect()
    ]
    if not sample:
        # both inputs empty / all-null keys: nothing can pair — return
        # an empty frame with the contract schema instead of crashing
        # inside the pivot fit
        lcols = [F.col(c).alias(f"left_{c}") for c in left.columns]
        rcols = [F.col(c).alias(f"right_{c}") for c in right.columns]
        return (
            left.limit(0)
            .select(*lcols)
            .crossJoin(right.limit(0).select(*rcols))
            .withColumn("mapped_dist", F.lit(0.0))
        )
    model = fastmap_fit(sample, dimensionality, dist_threshold)
    w = model.mapped_threshold

    def mapped(df: DataFrame, key: str, side: str) -> DataFrame:
        # coordinates are pure JVM Column expressions (2×dim built-in
        # levenshtein + HOF arithmetic); _parallel widens a narrow
        # local scan via the conf-driven floor (inputFiles() probe —
        # no .rdd, no exchange for an already-wide 100 TB scan)
        from silk_spark.operators.dedup_suite import _parallel

        cols = [F.col(c).alias(f"{side}_{c}") for c in df.columns]
        return _parallel(df).select(
            *cols, fastmap_coordinates_expr(model, F.col(key)).alias(f"{side}_mc")
        )

    l = mapped(left, left_key, "left")
    r = mapped(right, right_key, "right")
    # grid cell ids for the first block_dims axes; left probes ±1 cell
    cell = lambda mc, d: F.floor(F.element_at(mc, d + 1) / F.lit(w)).cast("bigint")  # noqa: E731
    probe_axes = [
        F.array(*[cell(F.col("left_mc"), d) + off for off in (-1, 0, 1)]).alias(f"_p{d}")
        for d in range(block_dims)
    ]
    l2 = l.select("*", *probe_axes)
    for d in range(block_dims):
        l2 = l2.withColumn(f"_c{d}", F.explode(f"_p{d}")).drop(f"_p{d}")
    r2 = r.select("*", *[cell(F.col("right_mc"), d).alias(f"_c{d}") for d in range(block_dims)])
    joined = l2.join(r2, [f"_c{d}" for d in range(block_dims)]).drop(
        *[f"_c{d}" for d in range(block_dims)]
    )
    sq = F.aggregate(
        F.zip_with(F.col("left_mc"), F.col("right_mc"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # No dedup needed: a (left, right) pair joins on exactly ONE cell
    # tuple — the right row's own — so the probe explosion cannot
    # produce duplicate pairs (a trailing dropDuplicates measured as
    # ~half the stage wall at sf0.1: a full extra shuffle of the
    # candidate set for zero removed rows). Filter on the SQUARED
    # distance (no sqrt on the ~13x-larger pre-filter volume).
    return (
        joined.filter(sq < F.lit(float(w) * float(w)))
        .withColumn("mapped_dist", F.sqrt(sq))
        .drop("left_mc", "right_mc")
    )
