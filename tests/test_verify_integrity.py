"""LakeTable.verify(): manifest integrity checks (the table fsck)."""

import os

import pytest

from silk_spark.checkpoint import CheckpointStore
from silk_spark.datagen import changelog
from silk_spark.streaming.pipeline import CdcPipeline, create_transcripts_table


@pytest.fixture()
def table(spark, tmp_path):
    log = changelog(spark, 1200, n_convs=30, turns_per_conv=6, seed=3)
    t = create_transcripts_table(spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor")
    CdcPipeline(spark, t, CheckpointStore(str(tmp_path / "cp")), changelog=log).run(
        end_lsn=1200, batch_size=400
    )
    return t


class TestVerify:
    def test_healthy_table(self, spark, table):
        res = table.verify(check_all_snapshots=True)
        assert res["ok"], res["errors"]
        assert res["files_checked"] > 0

    def test_healthy_after_expire_with_tag(self, spark, table):
        snaps = [s["snapshot_id"] for s in table.history()]
        table.tag("old", snaps[0])
        table.expire_snapshots(keep_last=1)
        res = table.verify(check_all_snapshots=True)
        assert res["ok"], res["errors"]

    def test_detects_missing_file(self, spark, table):
        snap = table.current_snapshot()
        path, _ = table._file_entry(next(iter(snap["files"].values()))[0])
        os.remove(path)
        res = table.verify()
        assert not res["ok"]
        assert any("missing file" in e for e in res["errors"])

    def test_detects_dangling_tag_and_ledger_gap(self, spark, table):
        meta = dict(table.meta)
        meta["tags"] = {"ghost": 9999}
        meta["committed_batches"] = meta["committed_batches"][1:]  # drop one
        table._write_meta(meta, version=table._meta_version + 1)
        res = table.verify(check_all_snapshots=True)
        assert not res["ok"]
        assert any("ghost" in e for e in res["errors"])
        assert any("idempotency ledger" in e for e in res["errors"])
