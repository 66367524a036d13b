"""Structured Streaming face: drain a changelog dir via foreachBatch,
final state must equal the batch pipeline's (slicing-invariance)."""

import os
import shutil

import pandas as pd
import pytest

from silk_spark.checkpoint import CheckpointStore
from silk_spark.datagen import changelog
from silk_spark.streaming.pipeline import CdcPipeline, create_transcripts_table
from silk_spark.streaming.stream import run_stream_to_completion

from tests.conftest import final_state_oracle, normalize


@pytest.fixture
def workdir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_oracle_and_batch(spark, workdir):
    n = 2000
    log = changelog(spark, n, n_convs=40, turns_per_conv=8, seed=11)
    log_dir = os.path.join(workdir, "log")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    log.repartition(6).write.parquet(log_dir)

    table = create_transcripts_table(spark, os.path.join(workdir, "t_stream"), n_buckets=8)
    ckpt = CheckpointStore(os.path.join(workdir, "cp_stream"))
    run_stream_to_completion(
        spark, log_dir, table, ckpt, os.path.join(workdir, "ssc"), timeout_sec=300
    )

    got = normalize(table.read().toPandas())
    want = final_state_oracle(log.toPandas())
    pd.testing.assert_frame_equal(got, normalize(want))

    # same state as the offset-driven batch pipeline
    t2 = create_transcripts_table(spark, os.path.join(workdir, "t_batch"), n_buckets=8)
    cp2 = CheckpointStore(os.path.join(workdir, "cp_batch"))
    CdcPipeline(spark, t2, cp2, changelog=log).run(end_lsn=n, batch_size=700)
    batch_state = normalize(t2.read().toPandas())
    pd.testing.assert_frame_equal(got, batch_state)

    # lineage manifests written per non-empty micro-batch
    assert len(ckpt.all_manifests()) >= 1
