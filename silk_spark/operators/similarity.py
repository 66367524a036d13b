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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from silk_spark.operators.dedup_suite import cosine_similarity, vec_norm


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


def ivf_build_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-pass deterministic coarse quantizer: bucket vectors by
    hash(id) % n_centroids and average each bucket (a k-means iteration
    seeded deterministically; replace with ML-lib KMeans offline at
    scale — the routing/join shape below is what matters)."""
    dim_arr = F.col(vec_col)
    assigned = corpus.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_centroids)).alias("centroid_id"),
        dim_arr.alias("v"),
    )
    # element-wise mean via posexplode + groupBy (scales to any dim)
    summed = (
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
    return summed


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: assign corpus vectors to their nearest centroid, route
    each query to its `nprobe` nearest centroids (broadcast centroid
    table), exact-score only within probed cells, top-k per query."""
    centroids = ivf_build_centroids(corpus, n_centroids, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(F.col(vec_col)).alias("qn"),
    )

    # corpus → nearest centroid (broadcast join, no shuffle of the corpus)
    c_scored = c.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine_similarity(F.col("cv"), F.col("centroid"))
    )
    wc = Window.partitionBy("match_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    c_assigned = (
        c_scored.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") == 1)
        .select("match_id", "cv", "cn", "centroid_id")
    )

    # query → nprobe nearest centroids
    q_scored = q.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine_similarity(F.col("qv"), F.col("centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    q_probed = (
        q_scored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qv", "qn", "centroid_id")
    )

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
