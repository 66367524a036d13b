"""Dedup suite: LSH candidate paths must reproduce brute-force truth."""

import pytest
from pyspark.sql import functions as F

from silk_spark.operators import dedup_suite as ds


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def pairset(df):
    return {(r.left_id, r.right_id) for r in df.select("left_id", "right_id").collect()}


class TestExactDedup:
    def test_groups_partition_the_corpus(self, spark, docs):
        g = ds.exact_dedup(docs)
        assert g.agg(F.sum("group_size")).first()[0] == docs.count()

    def test_detects_planted_duplicates(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello,  World!"), (2, "hello world"), (3, "different")],
            "doc_id bigint, text string",
        )
        g = ds.exact_dedup(df)
        dup = g.filter(F.col("group_size") == 2).first()
        assert dup is not None and dup["keep_id"] == 1


class TestNgramJaccard:
    def test_prefix_filter_is_lossless(self, docs):
        full = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5))
        # prefix bound floor((1-t)*|sh|)+1 is data-dependent; a generous
        # fixed prefix must agree with the exhaustive index
        pref = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5, prefix=60))
        assert pref == full

    def test_symmetric_and_thresholded(self, docs):
        out = ds.ngram_jaccard_pairs(docs, threshold=0.5)
        rows = out.collect()
        assert all(r.left_id < r.right_id for r in rows)
        assert all(r.jaccard >= 0.5 for r in rows)


class TestMinHashLSH:
    def test_recall_equals_bruteforce(self, docs):
        truth = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5))
        lsh = pairset(ds.minhash_lsh_pairs(docs, threshold=0.5))
        assert lsh == truth  # dense banding => recall 1.0 here; precision exact by verify

    def test_signatures_deterministic(self, docs):
        s1 = ds.minhash_signatures(docs.limit(20), num_perm=16).collect()
        s2 = ds.minhash_signatures(docs.limit(20), num_perm=16).collect()
        assert {r.id: r.sig for r in s1} == {r.id: r.sig for r in s2}


class TestSimHash:
    def test_precision_exact_and_recall_high(self, docs):
        truth = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5, shingle_n=2))
        got = pairset(ds.simhash_pairs(docs, threshold=0.5, shingle_n=2))
        assert got <= truth  # exact verify -> no false positives
        assert len(got) >= 0.7 * len(truth)  # banded simhash recall


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        """A 5-node chain (diameter 4), a triangle, and an isolated
        node resolve to min-id components within max_iter rounds."""
        nodes = spark.createDataFrame([(i,) for i in range(9)], "id bigint")
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7)],
            "left_id bigint, right_id bigint",
        )
        got = {
            r["id"]: r["cluster_id"]
            for r in ds.connected_components(nodes, edges, max_iter=6).collect()
        }
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 5, 8: 8}

    def test_survivorship_view(self, docs):
        out = ds.near_dup_clusters(docs, threshold=0.5).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for cid, rows in by_cluster.items():
            assert cid == min(r["doc_id"] for r in rows)
            survivors = [r for r in rows if r["is_survivor"]]
            assert len(survivors) == 1 and survivors[0]["doc_id"] == cid


class TestEmbeddingNearDup:
    def test_lsh_agrees_with_bruteforce(self, emb):
        brute = pairset(ds.embedding_near_dup_pairs(emb, threshold=0.5))
        lsh = pairset(ds.embedding_near_dup_pairs(emb, threshold=0.5, n_planes=8))
        assert lsh <= brute
        if brute:
            assert len(lsh) >= 0.5 * len(brute)

    def test_lsh_recall_in_true_near_dup_regime(self, spark):
        """At cosine >= 0.95 (actual near-duplicates, the production
        regime) hyperplane LSH with multi-probe must recover most of
        the brute-force pair set; planted pairs are tiny perturbations
        of base vectors."""
        import numpy as np

        rng = np.random.RandomState(7)
        base = rng.randn(200, 32)
        dups = base[:40] + 0.02 * rng.randn(40, 32)  # cos ~ 0.999
        vecs = np.vstack([base, dups])
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
            "vec_id bigint, embedding array<float>",
        )
        brute = pairset(ds.embedding_near_dup_pairs(df, threshold=0.95))
        lsh = pairset(ds.embedding_near_dup_pairs(df, threshold=0.95, n_planes=8, dim=32))
        assert len(brute) >= 40
        assert lsh <= brute  # exact verify: precision 1.0
        assert len(lsh) >= 0.8 * len(brute), (len(lsh), len(brute))

    def test_cosine_value(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
            "vec_id bigint, embedding array<float>",
        )
        out = ds.embedding_near_dup_pairs(df, threshold=0.99)
        rows = out.collect()
        assert len(rows) == 1 and rows[0].left_id == 1 and rows[0].right_id == 2
        assert rows[0].cosine == pytest.approx(1.0)
