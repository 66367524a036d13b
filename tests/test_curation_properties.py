"""Property tests for the curation operators: each Spark result is
checked against an independent pure-Python reference on randomized
corpora — the engine-parity discipline test_property_replay applies
to the CDC path, extended to decontamination, sampling and packing."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_DOC = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12)
_CORPUS = st.lists(_DOC, min_size=1, max_size=10)


def _spans(tokens, w):
    return {" ".join(tokens[i : i + w]) for i in range(len(tokens) - w + 1)}


@pytest.mark.usefixtures("spark")
class TestCurationProperties:
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(train=_CORPUS, bench=_CORPUS, w=st.integers(2, 4))
    def test_decontaminate_matches_bruteforce(self, spark, train, bench, w):
        from silk_spark.operators.dedup_suite import decontaminate

        tdf = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(train)],
            "doc_id bigint, text string",
        )
        bdf = spark.createDataFrame(
            [(100 + i, " ".join(t)) for i, t in enumerate(bench)],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: r["n_shared_spans"]
            for r in decontaminate(tdf, bdf, window=w).collect()
        }
        bench_spans = set().union(*(_spans(t, w) for t in bench)) if bench else set()
        want = {}
        for i, t in enumerate(train):
            n = len(_spans(t, w) & bench_spans)
            if n:
                want[i] = n
        assert got == want

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n=st.integers(1, 60),
        seed=st.integers(0, 10_000),
        rate=st.floats(0.0, 1.0),
    )
    def test_sampling_matches_python_md5_reference(self, spark, n, seed, rate):
        from silk_spark.operators.sampling import stratified_sample

        df = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("s")
        )
        got = {
            r["doc_id"]
            for r in stratified_sample(
                df, F.col("s"), {"x": rate}, key=F.col("doc_id"), seed=seed
            ).collect()
        }
        thresh = int(rate * (1 << 60))
        want = {
            i
            for i in range(n)
            if int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16) < thresh
        }
        assert got == want

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(0, 12), min_size=1, max_size=20),
        cap=st.integers(4, 16),
    )
    def test_packing_matches_python_greedy(self, spark, sizes, cap):
        from silk_spark.operators.packing import pack_sequences

        rows = [(i, " ".join(f"w{j}" for j in range(k))) for i, k in enumerate(sizes)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: r["pack_id"]
            for r in pack_sequences(df, capacity=cap, n_chunks=1).collect()
        }
        want, pack, acc = {}, 0, 0
        for i, k in enumerate(sizes):
            if acc > 0 and acc + k > cap:
                pack += 1
                acc = 0
            acc += k
            want[i] = pack
        assert got == want


def _shingle_set(tokens, n=3):
    if len(tokens) >= n:
        return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}
    return {" ".join(tokens)} if tokens else set()


@pytest.mark.usefixtures("spark")
class TestNgramPipelineProperty:
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        corpus=st.lists(
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=10),
            min_size=2, max_size=9,
        ),
        thr=st.sampled_from([0.3, 0.5, 0.8]),
    )
    def test_hashed_prefix_pipeline_matches_bruteforce(self, spark, corpus, thr):
        """End-to-end soundness+completeness of ngram_jaccard_pairs on
        random corpora: the hashed-shingle frames, int64-order prefix
        index, PPJoin length filter and exact verify must together
        reproduce the brute-force all-pairs Jaccard result — every
        optimization in the chain is provably lossless, so ANY
        divergence is a bug."""
        from silk_spark.operators.dedup_suite import (
            ngram_jaccard_pairs, release_persisted,
        )

        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(corpus)],
            "doc_id bigint, text string",
        )
        got = {
            (r["left_id"], r["right_id"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, threshold=thr).collect()
        }
        release_persisted(spark)
        want = {}
        sets = [_shingle_set(t) for t in corpus]
        for i in range(len(corpus)):
            for j in range(i + 1, len(corpus)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = 1.0 if union == 0 else inter / union
                if jac >= thr:
                    want[(i, j)] = round(jac, 6)
        assert got == want
