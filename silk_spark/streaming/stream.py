"""Structured Streaming face of the CDC engine.

``readStream`` over the append-only changelog directory →
``foreachBatch`` → the exact same ``apply_batch`` as the offset-driven
loop (streaming/pipeline.py). Correctness does not depend on
micro-batch boundaries: the max-by-(ts,lsn) dedup + version-resolved
MERGE make any slicing of the log converge to the same state, and the
Structured Streaming checkpoint adds its own exactly-once batch-id
guard on top of the table's committed-batch set (double protection —
either alone suffices).

Watermarks are deliberately unused (SURVEY.md §2.13): late/duplicate
events are resolved by version comparison at merge time, not by
dropping them, so replay determinism holds without event-time state.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from silk_spark.checkpoint import BatchManifest, CheckpointStore
from silk_spark.sources.lake import LakeTable
from silk_spark.streaming.pipeline import project_changes

CHANGELOG_DDL = (
    "lsn bigint, offset bigint, op string, conv_id string, turn_idx int, "
    "role string, text string, tool string, ts timestamp, schema_version int"
)


def changelog_schema() -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(CHANGELOG_DDL)


def stream_changelog(
    spark: SparkSession,
    changelog_dir: str,
    table: LakeTable,
    checkpoints: CheckpointStore,
    stream_checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    trigger_available_now: bool = True,
    pre_merge=None,
) -> StreamingQuery:
    """Tail new changelog parquet files and MERGE each micro-batch.

    `trigger_available_now=True` drains everything currently in the
    directory and stops (batch-style catch-up); False → continuous
    tail with the default processing-time trigger.

    `pre_merge` is the same optional DataFrame->DataFrame hook the
    offset-driven loop takes (CdcPipeline) — e.g. the join-and-score
    reconciliation (operators/reconcile.reconcile_near_dups) applied
    to every streaming micro-batch before MERGE.
    """
    src = (
        spark.readStream.schema(changelog_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changelog_dir)
    )

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bounds = batch_df.agg(
            F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
        ).first()
        if pre_merge is not None:
            batch_df = pre_merge(batch_df)
        summary = table.merge_batch(project_changes(batch_df), f"stream-{batch_id}")
        if not summary.get("skipped"):
            checkpoints.write(
                BatchManifest(
                    batch_id=f"stream-{batch_id}",
                    start_lsn=int(bounds["lo"]),
                    end_lsn=int(bounds["hi"]) + 1,
                    rows_applied=summary["rows_in_batch"],
                    rows_deleted=summary["rows_deleted"],
                    partition_stats=summary["partition_stats"],
                    snapshot_id=summary["snapshot_id"],
                    schema_id=summary["schema_id"],
                    committed_at_lsn=int(bounds["hi"]) + 1,
                )
            )

    writer = src.writeStream.foreachBatch(handle).option(
        "checkpointLocation", stream_checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_completion(
    spark: SparkSession,
    changelog_dir: str,
    table: LakeTable,
    checkpoints: CheckpointStore,
    stream_checkpoint_dir: str,
    timeout_sec: int = 600,
) -> None:
    """Drain the current changelog directory and block until done."""
    q = stream_changelog(
        spark, changelog_dir, table, checkpoints, stream_checkpoint_dir,
        trigger_available_now=True,
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
