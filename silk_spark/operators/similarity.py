"""Approximate-nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the correctness baseline; IVF (coarse
k-means-style centroid routing) as the scale path. The skeleton is
identical to Silk's matcher (block → join → score → top-k per query,
reference /root/reference/silk-rules/.../rule/execution/Matcher.scala
+ Filter.scala:33-50) with cosine in place of string measures.

Scale notes: brute-force is O(|Q|·|C|·dim) shuffled once — fine for
reranking, wrong as the primary path at 10^9 vectors. IVF keeps the
candidate set at |Q|·nprobe/ncentroids of the corpus; the centroid
table is tiny and broadcast."""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from silk_spark.operators.dedup_suite import cosine_similarity, vec_norm

# Inline centroid expressions embed k×dim float literals in ONE
# greatest/array expression — the right call for a small coarse
# quantizer (zero shuffle, whole-stage codegen), but Janino/codegen
# and plan serialization fall over around 10^4 inlined literals (a
# 10^9-vector corpus wants k=4096, dim=768+ → millions). Above this
# budget assignment/probing switch to the broadcast-DATA path: the
# centroid table rides a one-row broadcast frame and the argmax runs
# as higher-order functions, which evaluate iteratively per row (no
# generated-code growth, still zero shuffle of the corpus).
INLINE_CENTROID_FLOATS = int(os.environ.get("SILK_IVF_INLINE_MAX_FLOATS", "10000"))


def _inline_ok(cents: list[tuple[int, list[float]]]) -> bool:
    return sum(len(vec) for _, vec in cents) <= INLINE_CENTROID_FLOATS


def _centroid_row_frame(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """ONE row holding the whole centroid table (cid, vec, norm) —
    crossJoined with F.broadcast it is exactly a broadcast variable,
    but expressed as data instead of plan literals. Norms are folded
    driver-side with the same float ops as _const_cosine (`or 1.0`
    zero-guard included) so both paths score identically."""
    data = [
        (
            [
                (
                    int(cid),
                    [float(x) for x in vec],
                    math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0,
                )
                for cid, vec in sorted(cents)
            ],
        )
    ]
    return spark.createDataFrame(
        data, "_cents array<struct<cid:int,vec:array<double>,n:double>>"
    )


def _argmax_centroid_hof(v: Column, vn: Column, cents_col: Column) -> Column:
    """argmax-cosine centroid id over a centroid ARRAY COLUMN via
    aggregate (iterative, no codegen growth). Iteration is in
    ascending-cid order and a strict `>` keeps the incumbent, so ties
    resolve to the LOWER cid — the same rule as the inline
    greatest-of-(s, -cid, cid) structs."""
    init = F.struct(F.lit(float("-inf")).alias("s"), F.lit(-1).alias("cid"))

    def step(acc: Column, c: Column) -> Column:
        sim = cosine_similarity(
            v, c.getField("vec"), norm_a=vn, norm_b=c.getField("n")
        )
        return F.when(
            sim > acc.getField("s"),
            F.struct(sim.alias("s"), c.getField("cid").alias("cid")),
        ).otherwise(acc)

    return F.aggregate(cents_col, init, step).getField("cid")


def _probe_sims_hof(v: Column, vn: Column, cents_col: Column) -> Column:
    """Per-centroid (s, -cid, cid) structs from the broadcast array —
    same sort shape as the inline probing path."""
    return F.transform(
        cents_col,
        lambda c: F.struct(
            cosine_similarity(v, c.getField("vec"), norm_a=vn, norm_b=c.getField("n")).alias("s"),
            (-c.getField("cid")).alias("r"),
            c.getField("cid").alias("cid"),
        ),
    )


def assign_nearest_centroid(
    df: DataFrame,
    v: Column,
    cents: list[tuple[int, list[float]]],
    out: str = "centroid_id",
) -> DataFrame:
    """Append the nearest-centroid id, choosing inline expressions or
    the broadcast-frame HOF path by the k×dim literal budget. Both are
    zero-shuffle scans of `df`."""
    if _inline_ok(cents):
        return df.withColumn(out, nearest_centroid_expr(v, cents))
    cf = _centroid_row_frame(df.sparkSession, cents)
    return (
        df.withColumn("_vn", vec_norm(v))
        .crossJoin(F.broadcast(cf))
        .withColumn(out, _argmax_centroid_hof(v, F.col("_vn"), F.col("_cents")))
        .drop("_cents", "_vn")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the smaller side if possible,
    score every (query, corpus) pair, window top-k per query.
    Deterministic tie-break on corpus id. Norms are hoisted to the
    O(rows) inputs so the O(pairs) join computes only dot products."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cosine",
            cosine_similarity(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _const_cosine(v: Column, vec: list[float]) -> Column:
    """cosine(v, constant vector) as one codegen expression; the
    constant's norm is folded in at plan-build time."""
    import math

    arr = F.array(*[F.lit(float(x)) for x in vec])
    n = math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0
    return cosine_similarity(v, arr, norm_b=F.lit(n))


def nearest_centroid_expr(v: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine centroid id as a pure Column expression
    (greatest-of-structs, ties to the lower id). For a coarse quantizer
    k is small by definition, so inlining k dot products beats a
    broadcast join + k×|corpus| row window shuffle: assignment becomes
    a zero-shuffle scan."""
    best = F.greatest(
        *[
            F.struct(
                _const_cosine(v, vec).alias("s"),
                F.lit(-cid).alias("r"),
                F.lit(cid).alias("cid"),
            )
            for cid, vec in centroids
        ]
    )
    return best.getField("cid")


def ivf_build_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 3,
) -> DataFrame:
    """Deterministic coarse quantizer: hash-bucket means as the seed,
    then `n_iters` Lloyd iterations entirely as DataFrame ops —
    assign = zero-shuffle nearest-centroid expression (centroids are
    k×dim floats, collected and inlined per iteration, exactly a
    broadcast variable), update = ONE groupBy(centroid_id) with dim
    per-element sum aggregates + a count: zero explode, map-side
    partial aggregation, k rows shuffled per map task — the old
    posexplode formulation materialized |corpus|×dim rows per
    iteration before its partial agg (dim× row amplification ×
    n_iters over the full corpus). Above ~2048 dims (conf
    SILK_IVF_SUM_COLS_MAX — past that, dim separate aggregate
    expressions stress codegen) it falls back to the explode path,
    which trades the amplification for plan compactness. Without the
    Lloyd steps, hash-bucket means in high dimension are
    statistically indistinguishable and nearest-centroid routing
    degenerates (nprobe < k would silently lose recall)."""
    max_sum_cols = int(os.environ.get("SILK_IVF_SUM_COLS_MAX", "2048"))
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row is not None else 0

    def _means(assigned: DataFrame) -> DataFrame:
        if 0 < dim <= max_sum_cols:
            # element-wise sums as dim scalar aggregates in ONE pass
            sums = [F.sum(F.col("v")[i]).alias(f"_s{i}") for i in range(dim)]
            agg = assigned.groupBy("centroid_id").agg(
                F.count(F.lit(1)).alias("_n"), *sums
            )
            centroid = F.array(
                *[F.col(f"_s{i}") / F.col("_n") for i in range(dim)]
            )
            return agg.select("centroid_id", centroid.alias("centroid"))
        # fallback: posexplode + groupBy (any dim, amplified rows)
        return (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"),
            )
        )

    v = F.col(vec_col)
    cent_df = _means(
        corpus.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids)).alias("centroid_id"),
            v.alias("v"),
        )
    )
    for _ in range(max(n_iters, 0)):
        cents = collect_centroids(cent_df)
        cent_df = _means(
            assign_nearest_centroid(
                corpus.select(v.alias("v")), F.col("v"), cents
            ).select("centroid_id", "v")
        )
    return cent_df


def collect_centroids(cent_df: DataFrame) -> list[tuple[int, list[float]]]:
    """Materialize the (tiny) centroid table for expression inlining."""
    return sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]]) for r in cent_df.collect()
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF ANN: assign corpus vectors to their nearest (Lloyd-trained)
    centroid, route each query to its `nprobe` nearest centroids,
    exact-score only within probed cells, top-k per query. Assignment
    and probing are inlined centroid expressions (k×dim floats — a
    broadcast variable in expression form), so neither side shuffles
    before the cell-local scoring join.

    `centroids` supplies a fixed coarse quantizer (skipping the Lloyd
    fit) — for a pre-trained codebook, or for recall-provable planted
    configurations where the cell structure is known by construction
    (driver query `ann_ivf_probe`)."""
    cents = centroids or collect_centroids(
        ivf_build_centroids(corpus, n_centroids, id_col, vec_col)
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("qn"),
    )

    # corpus → nearest centroid: zero-shuffle scan (inline expressions
    # or the broadcast-frame HOF path by the k×dim literal budget)
    c_assigned = assign_nearest_centroid(c, F.col("cv"), cents)

    # query → nprobe nearest centroids: sort the k-struct array, take
    # the top slice, explode — still no shuffle
    if _inline_ok(cents):
        sims = F.array(
            *[
                F.struct(
                    _const_cosine(F.col("qv"), vec).alias("s"),
                    F.lit(-cid).alias("r"),
                    F.lit(cid).alias("cid"),
                )
                for cid, vec in cents
            ]
        )
        q_sims = q.withColumn("_sims", sims)
    else:
        cf = _centroid_row_frame(queries.sparkSession, cents)
        q_sims = q.crossJoin(F.broadcast(cf)).withColumn(
            "_sims", _probe_sims_hof(F.col("qv"), F.col("qn"), F.col("_cents"))
        ).drop("_cents")
    probed = F.slice(F.reverse(F.array_sort(F.col("_sims"))), 1, min(nprobe, len(cents)))
    q_probed = q_sims.select(
        "query_id", "qv", "qn", F.explode(probed).alias("_p")
    ).select("query_id", "qv", "qn", F.col("_p").getField("cid").alias("centroid_id"))

    scored = (
        q_probed.join(c_assigned, "centroid_id")
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cosine",
            cosine_similarity(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
