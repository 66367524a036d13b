"""Partition evolution: LakeTable.rescale_buckets.

The 100 TB growth path — widen the hash-bucket layout without
disturbing state, idempotency, time travel, or the running pipeline.
"""

import pandas as pd
import pytest

from silk_spark.checkpoint import CheckpointStore
from silk_spark.datagen import changelog
from silk_spark.streaming.pipeline import CdcPipeline, create_transcripts_table
from tests.conftest import final_state_oracle, normalize

N_EVENTS = 3000


@pytest.fixture()
def log(spark):
    return changelog(spark, N_EVENTS, n_convs=60, turns_per_conv=8, seed=7)


def _pipeline(spark, log, tmp_path, name, **table_kw):
    table = create_transcripts_table(spark, str(tmp_path / f"t_{name}"), **table_kw)
    cp = CheckpointStore(str(tmp_path / f"cp_{name}"))
    return table, CdcPipeline(spark, table, cp, changelog=log)


class TestRescale:
    def test_state_preserved_and_layout_switched(self, spark, log, tmp_path):
        table, pipe = _pipeline(spark, log, tmp_path, "a", n_buckets=8)
        pipe.run(end_lsn=N_EVENTS, batch_size=1000)
        before = normalize(table.read().toPandas())

        summary = table.rescale_buckets(32)
        assert summary["operation"] == "rescale"
        assert summary["n_buckets"] == 32
        assert table.meta["n_buckets"] == 32
        # manifest keys are all real buckets in the new layout
        keys = set(table.current_snapshot()["files"])
        assert keys <= {str(b) for b in range(32)}
        assert len(keys) > 8  # data actually spread into the wider layout
        after = normalize(table.read().toPandas())
        pd.testing.assert_frame_equal(before, after)

    def test_merges_continue_in_new_layout_and_replay_skips(self, spark, log, tmp_path):
        table, pipe = _pipeline(spark, log, tmp_path, "b", n_buckets=8)
        pipe.run(end_lsn=2000, batch_size=1000)
        table.rescale_buckets(16)
        # tail the rest of the log after the rescale
        pipe.run(end_lsn=N_EVENTS, batch_size=1000, start_lsn=2000)
        got = normalize(table.read().toPandas())
        want = final_state_oracle(log.toPandas())
        pd.testing.assert_frame_equal(got, want)
        # exactly-once across the rescale: pre-rescale batches still skip
        assert all(
            r.get("skipped")
            for r in pipe.run(end_lsn=2000, batch_size=1000, start_lsn=0)
        )
        # post-rescale merge snapshots record the new layout
        assert table.current_snapshot()["n_buckets"] == 16

    def test_time_travel_across_rescale(self, spark, log, tmp_path):
        table, pipe = _pipeline(spark, log, tmp_path, "c", n_buckets=8)
        pipe.run(end_lsn=2000, batch_size=1000)
        pre_snap = table.meta["current_snapshot_id"]
        pre_state = normalize(table.read().toPandas())
        table.rescale_buckets(32)
        pipe.run(end_lsn=N_EVENTS, batch_size=1000, start_lsn=2000)
        # the pre-rescale snapshot reads back bit-identical (its manifest
        # keys are interpreted with the OLD bucket function)
        pd.testing.assert_frame_equal(
            normalize(table.read(as_of_snapshot=pre_snap).toPandas()), pre_state
        )

    def test_lookup_after_rescale(self, spark, log, tmp_path):
        table, pipe = _pipeline(spark, log, tmp_path, "d", n_buckets=8)
        pipe.run(end_lsn=N_EVENTS, batch_size=1500)
        table.rescale_buckets(16)
        full = table.read().toPandas()
        conv = full["conv_id"].iloc[0]
        got = table.lookup(conv).toPandas()
        want = full[full["conv_id"] == conv]
        assert len(got) == len(want) > 0
        assert sorted(got["turn_idx"]) == sorted(want["turn_idx"])

    def test_rollback_across_rescale_restores_layout(self, spark, log, tmp_path):
        table, pipe = _pipeline(spark, log, tmp_path, "e", n_buckets=8)
        pipe.run(end_lsn=2000, batch_size=1000)
        pre_snap = table.meta["current_snapshot_id"]
        pre_state = normalize(table.read().toPandas())
        table.rescale_buckets(32)
        table.rollback(pre_snap)
        assert table.meta["n_buckets"] == 8
        pd.testing.assert_frame_equal(normalize(table.read().toPandas()), pre_state)
        # pipeline keeps working in the restored layout
        pipe.run(end_lsn=N_EVENTS, batch_size=1000, start_lsn=2000)
        pd.testing.assert_frame_equal(
            normalize(table.read().toPandas()), final_state_oracle(log.toPandas())
        )

    def test_mor_unpartitioned_deltas_folded(self, spark, log, tmp_path):
        table, pipe = _pipeline(
            spark, log, tmp_path, "f",
            n_buckets=8, merge_mode="mor", delta_layout="unpartitioned",
        )
        pipe.run(end_lsn=N_EVENTS, batch_size=1000)
        assert "*" in table.current_snapshot()["files"]
        table.rescale_buckets(16)
        keys = set(table.current_snapshot()["files"])
        assert "*" not in keys  # global deltas re-clustered into buckets
        pd.testing.assert_frame_equal(
            normalize(table.read().toPandas()), final_state_oracle(log.toPandas())
        )

    def test_noop_and_validation(self, spark, log, tmp_path):
        table, pipe = _pipeline(spark, log, tmp_path, "g", n_buckets=8)
        pipe.run(end_lsn=1000, batch_size=1000)
        snap = table.meta["current_snapshot_id"]
        res = table.rescale_buckets(8)
        assert res.get("noop") and table.meta["current_snapshot_id"] == snap
        with pytest.raises(ValueError):
            table.rescale_buckets(0)

    def test_legacy_snapshots_backfilled_before_rescale(self, spark, log, tmp_path):
        """Tables written before per-snapshot layouts were recorded have
        snapshot records with no 'n_buckets'; scan()'s fallback for
        those is the CURRENT meta value. rescale_buckets must backfill
        the pre-rescale layout onto them first, or time-traveling to a
        legacy snapshot after the rescale would recompute _bucket with
        the NEW count and misattribute rows."""
        table, pipe = _pipeline(spark, log, tmp_path, "legacy", n_buckets=8)
        pipe.run(end_lsn=2000, batch_size=1000)
        # simulate the legacy on-disk format: strip recorded layouts
        meta = dict(table.meta)
        meta["snapshots"] = [
            {k: v for k, v in s.items() if k != "n_buckets"}
            for s in meta["snapshots"]
        ]
        table._write_meta(meta, version=table._meta_version + 1)
        legacy_snap = table.meta["current_snapshot_id"]
        want = normalize(table.read().toPandas())

        table.rescale_buckets(32)
        # every pre-rescale snapshot now records the layout it was
        # actually written under
        assert all(
            s.get("n_buckets") == 8
            for s in table.meta["snapshots"]
            if s["snapshot_id"] <= legacy_snap
        )
        got = normalize(table.read(as_of_snapshot=legacy_snap).toPandas())
        pd.testing.assert_frame_equal(got, want)
        # and a bucket-pruned point lookup of the legacy snapshot still
        # resolves through the OLD bucket function
        key = want.iloc[0]
        rows = table.lookup(key["conv_id"], as_of_snapshot=legacy_snap).collect()
        assert len(rows) >= 1
        assert all(r["conv_id"] == key["conv_id"] for r in rows)
