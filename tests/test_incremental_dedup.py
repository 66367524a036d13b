"""IncrementalDeduper: the probe-and-extend MinHash index must equal
batch-global LSH over any batch split — the order-independence
property the module docstring proves — for BOTH state backends."""

import pytest
from pyspark.sql import functions as F

from silk_spark.operators.dedup_suite import minhash_lsh_pairs, release_persisted
from silk_spark.operators.incremental_dedup import IncrementalDeduper


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _pairs(df):
    return {(r["left_id"], r["right_id"], r["jaccard"]) for r in df.collect()}


class TestIncrementalEqualsGlobal:
    def test_in_memory_state_three_batches(self, spark, docs):
        batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
        inc = _pairs(IncrementalDeduper(spark, threshold=0.5).process_batches(batches))
        glob = _pairs(minhash_lsh_pairs(docs, threshold=0.5))
        release_persisted(spark)
        assert inc == glob and len(glob) > 0

    def test_parquet_state_and_batch_order_invariance(self, spark, docs, tmp_path):
        batches = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
        d = IncrementalDeduper(spark, threshold=0.5, state_dir=str(tmp_path / "s1"))
        fwd = _pairs(d.process_batches(batches))
        d2 = IncrementalDeduper(spark, threshold=0.5, state_dir=str(tmp_path / "s2"))
        rev = _pairs(d2.process_batches(list(reversed(batches))))
        glob = _pairs(minhash_lsh_pairs(docs, threshold=0.5))
        release_persisted(spark)
        assert fwd == rev == glob

    def test_cross_batch_pair_is_split_across_steps(self, spark):
        """A planted near-dup split across two batches must surface in
        the SECOND batch's output (index probe), not the first's."""
        a = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
            "doc_id bigint, text string",
        )
        b = spark.createDataFrame(
            [(2, "alpha beta gamma delta epsilon zeta eta theta iota lambda")],
            "doc_id bigint, text string",
        )
        d = IncrementalDeduper(spark, threshold=0.5)
        first = d.process_batch(a).collect()
        second = d.process_batch(b).collect()
        assert first == []
        assert [(r["left_id"], r["right_id"]) for r in second] == [(1, 2)]
