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
