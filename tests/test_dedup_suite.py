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
        # exhaustive index (prefix=None) vs the sound per-doc default
        # ("auto") vs a generous fixed prefix: identical pair sets
        full = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5, prefix=None))
        auto = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5))
        pref = pairset(ds.ngram_jaccard_pairs(docs, threshold=0.5, prefix=60))
        assert auto == full
        assert pref == full

    def test_symmetric_and_thresholded(self, docs):
        out = ds.ngram_jaccard_pairs(docs, threshold=0.5)
        rows = out.collect()
        assert all(r.left_id < r.right_id for r in rows)
        assert all(r.jaccard >= 0.5 for r in rows)

    def test_hot_shingle_stays_subquadratic(self, spark):
        """500 docs sharing one ubiquitous shingle: the exhaustive
        index pairs everything through the hot block (O(n²)); the
        default sound prefix keeps candidates near-linear AND loses no
        qualifying pair. The hot shingle sorts last ('zz...') so every
        doc's prefix excludes it."""
        n, words = 500, 12
        rows = [
            (i, " ".join(f"w{i}x{j}" for j in range(words)) + " zz hot shingle")
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        docs = df.select(
            F.col("doc_id").alias("id"), ds.word_shingles(F.col("text"), 3).alias("sh")
        )

        def n_candidates(prefix):
            idx = ds.shingle_prefix_index(docs, threshold=0.8, prefix=prefix)
            l = idx.select(F.col("id").alias("a"), "_block")
            r = idx.select(F.col("id").alias("b"), "_block")
            return (
                l.join(r, "_block")
                .filter(F.col("a") < F.col("b"))
                .dropDuplicates(["a", "b"])
                .count()
            )

        exhaustive = n_candidates(None)
        pruned = n_candidates("auto")
        assert exhaustive >= n * (n - 1) / 2  # hot blocks go quadratic
        assert pruned <= 5 * n  # sound prefix: O(n * prefix) candidates
        # and the verified result is identical (here: empty both ways)
        assert pairset(ds.ngram_jaccard_pairs(df, threshold=0.8)) == pairset(
            ds.ngram_jaccard_pairs(df, threshold=0.8, prefix=None)
        )


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

    def test_long_chain_converges_past_default_rounds(self, spark):
        """A 13-node chain (diameter 12): convergence detection must
        keep iterating until the fixpoint, not stop at a fixed round
        count — a silently-split chain was the round-2 latent bug."""
        n = 13
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "left_id bigint, right_id bigint"
        )
        got = {r["id"]: r["cluster_id"] for r in ds.connected_components(nodes, edges).collect()}
        assert got == {i: 0 for i in range(n)}

    def test_cap_exceeded_raises_not_mislabels(self, spark):
        """If the safety cap is genuinely too small, the call must fail
        loudly instead of returning split clusters."""
        n = 13
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "left_id bigint, right_id bigint"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            ds.connected_components(nodes, edges, max_iter=3)

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


class TestContentGuardAndRelease:
    def test_no_content_docs_excluded_from_lsh_paths(self, spark):
        """Null/empty texts share ONE degenerate shingle array — without
        the content guard they all band-collide into a single LSH block
        (O(m²) candidates) and emit meaningless jaccard-1.0 pairs."""
        from silk_spark.operators.dedup_suite import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_hamming_pairs,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, None),
            (4, ""),
            (5, "   ...   "),  # normalizes to empty
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        for fn in (minhash_lsh_pairs, ngram_jaccard_pairs):
            pairs = fn(df, threshold=0.5).collect()
            ids = {r["left_id"] for r in pairs} | {r["right_id"] for r in pairs}
            assert ids <= {1, 2}, f"{fn.__name__} paired no-content docs: {pairs}"
        ham = simhash_hamming_pairs(df, max_hamming=3).collect()
        ids = {r["left_id"] for r in ham} | {r["right_id"] for r in ham}
        assert ids <= {1, 2}, f"simhash paired no-content docs: {ham}"

    def test_release_persisted_unpersists_tracked_frames(self, spark):
        from silk_spark.operators import dedup_suite as ds

        df = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i}") for i in range(20)],
            "doc_id int, text string",
        )
        ds.release_persisted()  # drain frames left by earlier tests
        before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        ds.ngram_jaccard_pairs(df, threshold=0.5).count()
        ds.minhash_lsh_pairs(df, threshold=0.5).count()
        # registry is keyed per SparkSession (one session here)
        assert sum(len(v) for v in ds._PERSISTED.values()) >= 2
        released = ds.release_persisted(spark)  # session-scoped release
        assert released >= 2
        assert not ds._PERSISTED
        after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        assert after <= before, f"leaked persisted RDDs: {after - before}"

    def test_release_persisted_scoped_to_session(self, spark):
        """release_persisted(other_session) must not unpersist frames a
        different session's in-flight jobs still reuse."""
        from silk_spark.operators import dedup_suite as ds

        df = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i}") for i in range(5)],
            "doc_id int, text string",
        )
        ds.release_persisted()
        ds.ngram_jaccard_pairs(df, threshold=0.5).count()
        assert sum(len(v) for v in ds._PERSISTED.values()) >= 1
        sentinel = object()  # a "different session" key
        assert ds.release_persisted(sentinel) == 0
        assert sum(len(v) for v in ds._PERSISTED.values()) >= 1  # untouched
        assert ds.release_persisted(spark) >= 1

    def test_arrow_and_jvm_signatures_bit_identical(self, spark):
        """The Arrow numpy kernel and the JVM HOF expressions must
        produce byte-identical MinHash and SimHash signatures — the
        backend is a pure performance knob, never a semantics one."""
        from silk_spark.operators.dedup_suite import (
            minhash_signatures,
            simhash60_signature,
        )

        df = spark.createDataFrame(
            [(i, f"token{i % 7} alpha beta gamma delta {i} epsilon zeta") for i in range(40)],
            "doc_id int, text string",
        )
        outs = {}
        for impl in ("arrow", "jvm"):
            spark.conf.set("spark.silk.signatures.impl", impl)
            try:
                outs[impl, "mh"] = {
                    r["id"]: list(r["sig"]) for r in minhash_signatures(df, num_perm=32).collect()
                }
                outs[impl, "sh"] = {
                    r["id"]: r["sig"] for r in simhash60_signature(df).collect()
                }
            finally:
                spark.conf.unset("spark.silk.signatures.impl")
        assert outs["arrow", "mh"] == outs["jvm", "mh"]
        assert outs["arrow", "sh"] == outs["jvm", "sh"]


class TestDuplicateSpans:
    def test_planted_shared_span(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        df = spark.createDataFrame(
            [
                (1, f"intro words {shared} tail one"),
                (2, f"other prefix here {shared}"),
                (3, "completely unrelated text with no overlap at all ok"),
                (4, f"{shared} {shared}"),  # in-doc repeat: occ 2, doc 1
            ],
            "doc_id bigint, text string",
        )
        out = ds.duplicate_spans(df, window=8).collect()
        # the planted span must be reported once, across 3 docs, with
        # 4 occurrences (doc 4 carries it twice at stride 1... plus the
        # bridging windows of doc 4 are unique -> not reported)
        import hashlib

        h = hashlib.md5(shared.encode()).hexdigest()
        rows = {r["span_hash"]: r for r in out}
        assert h in rows
        assert rows[h]["n_docs"] == 3 and rows[h]["n_occ"] == 4

    def test_short_docs_yield_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "only four tokens here"), (2, "only four tokens here")],
            "doc_id bigint, text string",
        )
        assert ds.duplicate_spans(df, window=8).count() == 0

    def test_span_windows_match_python(self, spark):
        txt = "a b c d e f g h i j"
        df = spark.createDataFrame([(txt,)], "text string")
        got = df.select(ds.span_windows(F.col("text"), 8).alias("w")).first()["w"]
        toks = txt.split()
        want = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
        assert got == want

    def test_plan_shuffles_hash_only(self, spark, docs):
        """Two exchanges, both AFTER the md5 projection: the span text
        must never be a shuffle column."""
        plan = (
            ds.duplicate_spans(docs, window=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in ("BatchEvalPython", "ArrowEvalPython", "Expand"):
            assert node not in plan
        import re

        assert "span#" not in "".join(re.findall(r"hashpartitioning\([^)]*\)", plan))


class TestStripDuplicateSpans:
    def test_keeper_survives_others_stripped(self, spark):
        import hashlib

        shared = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [
                (1, f"{shared} x"),          # global keeper (min doc, pos 0)
                (2, f"y {shared}"),          # loses positions 1..8
                (3, "no overlap with anything else at all here now"),
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in ds.strip_duplicate_spans(df, window=8).collect()}
        assert got[1]["n_removed"] == 0
        assert got[1]["clean_fp"] == hashlib.md5(f"{shared} x".encode()).hexdigest()
        assert got[2]["n_removed"] == 8
        assert got[2]["clean_fp"] == hashlib.md5(b"y").hexdigest()
        assert got[3]["n_removed"] == 0

    def test_exact_copy_strips_to_empty(self, spark):
        import hashlib

        text = "one two three four five six seven eight nine ten"
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id bigint, text string"
        )
        got = {r["doc_id"]: r for r in ds.strip_duplicate_spans(df, window=8).collect()}
        assert got[1]["n_removed"] == 0
        assert got[2]["n_removed"] == 10  # overlapping windows cover all tokens
        assert got[2]["clean_fp"] == hashlib.md5(b"").hexdigest()

    def test_row_per_document_always(self, spark, docs):
        out = ds.strip_duplicate_spans(docs, window=8)
        assert out.count() == docs.count()
        assert out.filter(F.col("n_removed") > F.col("n_tokens")).count() == 0


class TestNormalizeEquivalence:
    """normalize_text / tokens_col / _content_guard are computed with
    positive-class regexes (the JDK-17 negated-class predicate-lambda
    cliff measured ~60x — see normalize_text's docstring); these pin
    them to the DEFINITIONAL forms the DuckDB oracles still use."""

    ROWS = [
        ("Ünïcode ΣΤΙΓΜΑΣ İstanbul ß — em.dash 42!",),
        ("   ",),
        ("",),
        (None,),
        ("a\tb\nc  d",),
        ("ALL CAPS 007",),
        ("...punct only!?",),
        ("x",),
    ]

    def _frame(self, spark):
        fx = spark.read.parquet(
            "/root/testdata/sf0.01/documents.parquet"
        ).select("text")
        return fx.unionByName(spark.createDataFrame(self.ROWS, "text string"))

    def test_normalize_matches_definitional_replace_form(self, spark):
        df = self._frame(spark)
        definitional = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), r"[^a-z0-9\s]", " "),
                r"\s+",
                " ",
            )
        )
        got = ds.normalize_text(F.col("text"))
        assert df.filter(~got.eqNullSafe(definitional)).count() == 0

    def test_tokens_match_split_form_on_guarded_rows(self, spark):
        df = self._frame(spark).filter(ds._content_guard("text"))
        definitional = F.split(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.lower("text"), r"[^a-z0-9\s]", " "),
                    r"\s+",
                    " ",
                )
            ),
            " ",
        )
        got = ds.tokens_col(F.col("text"))
        assert df.filter(~got.eqNullSafe(definitional)).count() == 0

    def test_guard_matches_normalizes_nonempty(self, spark):
        df = self._frame(spark)
        definitional = F.col("text").isNotNull() & (
            ds.normalize_text(F.col("text")) != ""
        )
        got = ds._content_guard("text")
        assert df.filter(~got.eqNullSafe(definitional)).count() == 0


class TestDecontaminate:
    def test_planted_benchmark_overlap(self, spark):
        """A train doc sharing an exact 5-token span with the eval set
        is flagged with the distinct-shared-span count; non-overlapping
        docs are absent from the result (anti-join keeps them)."""
        leak = "alpha beta gamma delta epsilon"  # 5 tokens
        bench = spark.createDataFrame(
            [(100, f"eval question about {leak} indeed")],
            "doc_id bigint, text string",
        )
        train = spark.createDataFrame(
            [
                (1, f"clean document with nothing shared here at all"),
                (2, f"contaminated start {leak} contaminated end"),
                (3, f"{leak} zeta {leak}"),  # two occurrences, one distinct span
            ],
            "doc_id bigint, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in ds.decontaminate(train, bench, window=5).collect()
        }
        assert set(rows) == {2, 3}
        assert rows[2]["n_shared_spans"] == 1
        # doc 3 repeats the span — still ONE distinct shared span
        assert rows[3]["n_shared_spans"] == 1
        import hashlib

        assert rows[2]["first_span_hash"] == hashlib.md5(leak.encode()).hexdigest()

    def test_no_overlap_is_empty(self, spark):
        bench = spark.createDataFrame(
            [(9, "benchmark sentence one two three four five")],
            "doc_id bigint, text string",
        )
        train = spark.createDataFrame(
            [(1, "totally different words in this training document")],
            "doc_id bigint, text string",
        )
        assert ds.decontaminate(train, bench, window=5).count() == 0
