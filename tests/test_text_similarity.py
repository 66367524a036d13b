"""Text analysis + ANN similarity search."""

import pytest
from pyspark.sql import functions as F

from silk_spark.operators.similarity import brute_force_topk, ivf_topk
from silk_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    profile_documents,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


class TestTextAnalysis:
    def test_lang_id_on_clear_samples(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat and the dog sat in the house",),
                ("el perro y la casa de los gatos en la calle",),
                ("le chat et le chien dans la maison des amis",),
                ("xyzzy qwerty",),
            ],
            "text string",
        )
        got = [r[0] for r in df.select(lang_id(F.col("text"))).collect()]
        assert got == ["en", "es", "fr", "und"]

    def test_token_counts(self, spark):
        df = spark.createDataFrame([("one two  three",)], "text string")
        r = df.select(
            token_count(F.col("text")).alias("n"),
            bpe_ish_token_count(F.col("text")).alias("p"),
        ).first()
        assert r["n"] == 3 and r["p"] == 3

    def test_quality_score_bounds(self, docs):
        vals = [r[0] for r in docs.select(quality_score(F.col("text"))).collect()]
        assert all(0.0 <= v <= 1.0 for v in vals)

    def test_fingerprint_ignores_whitespace_case(self, spark):
        df = spark.createDataFrame([("Hello  World", "hello world")], "a string, b string")
        r = df.select(
            doc_fingerprint(F.col("a")).alias("fa"),
            doc_fingerprint(F.col("b")).alias("fb"),
        ).first()
        assert r["fa"] == r["fb"]

    def test_profile_shape(self, docs):
        prof = profile_documents(docs)
        assert prof.count() == docs.count()
        assert set(prof.columns) == {"doc_id", "lang_pred", "n_tokens", "n_pieces", "quality", "fingerprint"}


class TestSimilaritySearch:
    def test_topk_exact_properties(self, emb):
        out = brute_force_topk(emb.limit(10), emb, k=5)
        rows = out.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            assert len(rs) == 5
            ranks = sorted(r.rank for r in rs)
            assert ranks == [1, 2, 3, 4, 5]
            sims = [r.cosine for r in sorted(rs, key=lambda x: x.rank)]
            assert sims == sorted(sims, reverse=True)
            assert all(r.match_id != q for r in rs)

    def test_ivf_recall_at_small_scale(self, emb):
        exact = brute_force_topk(emb.limit(20), emb, k=3)
        approx = ivf_topk(emb.limit(20), emb, k=3, n_centroids=4, nprobe=4)
        e = {(r.query_id, r.match_id) for r in exact.collect()}
        a = {(r.query_id, r.match_id) for r in approx.collect()}
        # nprobe == n_centroids probes every cell -> recall 1.0
        assert a == e

    def test_ivf_subsets_when_probing_fewer(self, emb):
        full = ivf_topk(emb.limit(10), emb, k=3, n_centroids=4, nprobe=4)
        part = ivf_topk(emb.limit(10), emb, k=3, n_centroids=4, nprobe=1)
        assert part.count() <= full.count() * 1.0 + 1e-9

    def test_ivf_partial_probe_recall_clustered(self, spark):
        """The criterion that actually exercises IVF's approximation:
        on clusterable data, Lloyd-trained centroids at nprobe=2 of 16
        must recover >= 0.9 of the exact top-5. Uses a deterministic
        planted-cluster fixture because the testdata embeddings are
        isotropic (within-label cosine ~ 0.0 — measured), where NO
        coarse quantizer can reach 0.9 at nprobe=2; hash-bucket
        pseudo-centroids fail this test, real Lloyd centroids pass."""
        import numpy as np

        rng = np.random.RandomState(42)
        centers = rng.randn(20, 32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        pts = np.repeat(centers, 30, axis=0) + 0.1 * rng.randn(600, 32)
        df = spark.createDataFrame(
            [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
            "vec_id bigint, embedding array<float>",
        )
        q = df.filter(F.col("vec_id") < 30)
        exact = brute_force_topk(q, df, k=5)
        approx = ivf_topk(q, df, k=5, n_centroids=16, nprobe=2)
        e = {(r.query_id, r.match_id) for r in exact.collect()}
        a = {(r.query_id, r.match_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.9, f"recall@5 = {recall:.3f}"

    def test_ivf_partial_probe_recall_isotropic(self, emb):
        """On the isotropic testdata, half the cells probed must still
        recover most of the exact top-5 (sanity floor; brute == oracle)."""
        exact = brute_force_topk(emb.filter(F.col("vec_id") < 30), emb, k=5)
        approx = ivf_topk(emb.filter(F.col("vec_id") < 30), emb, k=5, n_centroids=16, nprobe=8)
        e = {(r.query_id, r.match_id) for r in exact.collect()}
        a = {(r.query_id, r.match_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.75, f"recall@5 = {recall:.3f}"

    def test_lloyd_centroids_are_distinct(self, emb):
        """Lloyd iterations must separate the centroids: with hash-bucket
        means in high dim, all pairwise centroid cosines approach 1."""
        from silk_spark.operators.dedup_suite import cosine_similarity
        from silk_spark.operators.similarity import ivf_build_centroids

        cents = ivf_build_centroids(emb, n_centroids=8, n_iters=3)
        l = cents.select(F.col("centroid_id").alias("i"), F.col("centroid").alias("a"))
        r = cents.select(F.col("centroid_id").alias("j"), F.col("centroid").alias("b"))
        sims = (
            l.crossJoin(r)
            .filter(F.col("i") < F.col("j"))
            .select(cosine_similarity(F.col("a"), F.col("b")).alias("s"))
            .collect()
        )
        assert max(r["s"] for r in sims) < 0.99


class TestLargeQuantizerBroadcastPath:
    def test_broadcast_assignment_matches_inline(self, spark, emb):
        """The two assignment paths (inlined literal expressions vs the
        one-row broadcast centroid frame + HOF argmax) must pick the
        same centroid for every vector — same scoring formula, same
        lower-cid tie rule."""
        import silk_spark.operators.similarity as sim

        cents = sim.collect_centroids(
            sim.ivf_build_centroids(emb, n_centroids=8, n_iters=1)
        )
        v = emb.select("vec_id", "embedding")
        inline = sim.assign_nearest_centroid(v, sim.F.col("embedding"), cents)
        assert "_cents" not in inline.columns
        old = sim.INLINE_CENTROID_FLOATS
        sim.INLINE_CENTROID_FLOATS = 1  # force the broadcast path
        try:
            bcast = sim.assign_nearest_centroid(v, sim.F.col("embedding"), cents)
        finally:
            sim.INLINE_CENTROID_FLOATS = old
        got_i = {r["vec_id"]: r["centroid_id"] for r in inline.collect()}
        got_b = {r["vec_id"]: r["centroid_id"] for r in bcast.collect()}
        assert got_i == got_b

    def test_ivf_topk_with_k256_dim256_quantizer(self, spark):
        """k·dim = 65536 inlined literals blew the codegen/plan-size
        budget in the inline-only implementation; the broadcast path
        must handle it and, at nprobe = n_centroids (every cell
        probed), reproduce the exact brute-force top-k."""
        import random

        from silk_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        rng = random.Random(7)
        dim, k_cent, n = 256, 256, 120
        rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        cents = [(c, [rng.uniform(-1, 1) for _ in range(dim)]) for c in range(k_cent)]
        exact = brute_force_topk(df.limit(8), df, k=3)
        approx = ivf_topk(
            df.limit(8), df, k=3, n_centroids=k_cent, nprobe=k_cent, centroids=cents
        )
        e = {(r.query_id, r.match_id) for r in exact.collect()}
        a = {(r.query_id, r.match_id) for r in approx.collect()}
        assert a == e


class TestLloydMeansParity:
    def test_sum_aggregate_means_match_explode_means(self, spark):
        """The zero-explode Lloyd mean update (dim per-element sum
        aggregates) must produce the same centroids as the posexplode
        fallback. Integer-valued doubles make both paths exact, so the
        comparison is bit-level, not approximate."""
        import os

        from pyspark.sql import functions as F

        from silk_spark.operators.similarity import ivf_build_centroids

        rows = [
            (i, [float((i * 7 + j * 3) % 11) for j in range(6)])
            for i in range(200)
        ]
        emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

        def fit():
            return {
                int(r["centroid_id"]): [float(x) for x in r["centroid"]]
                for r in ivf_build_centroids(
                    emb, n_centroids=4, n_iters=2
                ).collect()
            }

        fast = fit()
        os.environ["SILK_IVF_SUM_COLS_MAX"] = "0"  # force explode path
        try:
            slow = fit()
        finally:
            del os.environ["SILK_IVF_SUM_COLS_MAX"]
        assert fast == slow

    def test_sum_aggregate_plan_has_no_explode(self, spark):
        from pyspark.sql import functions as F

        from silk_spark.operators.similarity import ivf_build_centroids

        emb = spark.createDataFrame(
            [(i, [float(i), float(i + 1)]) for i in range(50)],
            "vec_id int, embedding array<double>",
        )
        cents = ivf_build_centroids(emb, n_centroids=2, n_iters=1)
        plan = cents._jdf.queryExecution().executedPlan().toString()
        assert "Generate posexplode" not in plan, plan


class TestRepetitionSignals:
    def test_planted_fractions(self, spark):
        from silk_spark.operators.text import repetition_signals

        df = spark.createDataFrame(
            [
                (1, "a a a a"),           # words 1-1/4, 2g 1-1/3, 3g 1-1/2
                (2, "w x y z"),           # all distinct -> 0 everywhere
                (3, "solo"),              # shorter than any window -> 0
                (4, ""),                  # empty -> 0
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
        assert got[1]["dup_word_frac"] == 0.75
        assert got[1]["dup_2gram_frac"] == round(1 - 1 / 3, 6)
        assert got[1]["dup_3gram_frac"] == 0.5
        for d in (2, 3, 4):
            assert got[d]["dup_word_frac"] == 0.0
            assert got[d]["dup_2gram_frac"] == 0.0
            assert got[d]["dup_3gram_frac"] == 0.0

    def test_zero_shuffle_plan(self, spark):
        from silk_spark.operators.text import repetition_signals

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        for node in ("BatchEvalPython", "ArrowEvalPython"):
            assert node not in plan


class TestPiiRedaction:
    def test_all_categories_masked_and_counted(self, spark):
        from silk_spark.operators.text import pii_counts, redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail me at jo.doe+x@corp-mail.co or jo@a.io thanks"),
                (2, "card 4111 1111 1111 1111 ssn 123-45-6789"),
                (3, "server 192.168.0.1 call +44 555-0123 now"),
                (4, "nothing sensitive here at all"),
            ],
            "id bigint, text string",
        )
        out = {
            r["id"]: r
            for r in df.select(
                "id",
                redact_pii(F.col("text")).alias("red"),
                pii_counts(F.col("text")).alias("c"),
            ).collect()
        }
        assert out[1]["red"] == "mail me at <EMAIL> or <EMAIL> thanks"
        assert out[1]["c"]["email"] == 2
        assert out[2]["red"] == "card <CARD> ssn <SSN>"
        assert out[2]["c"]["card"] == 1 and out[2]["c"]["ssn"] == 1
        assert out[3]["red"] == "server <IP> call <PHONE> now"
        assert out[3]["c"]["ip"] == 1 and out[3]["c"]["phone"] == 1
        assert out[4]["red"] == "nothing sensitive here at all"

    def test_card_not_eaten_by_phone_ordering(self, spark):
        from silk_spark.operators.text import redact_pii

        df = spark.createDataFrame(
            [(1, "pay +1 555-0100 with 4111-1111-1111-1111 ok")],
            "id bigint, text string",
        )
        red = df.select(redact_pii(F.col("text")).alias("r")).first()["r"]
        assert "<CARD>" in red and "<PHONE>" in red
