"""Micro-batch CDC ingest loop: changelog tail -> dedup -> MERGE -> checkpoint.

The offset-driven loop is the batch face of the engine; see
`streaming/stream.py` for the Structured Streaming (`foreachBatch`)
face, which calls the exact same `apply_batch`. Reference analogue:
GenerateLinks' load -> match -> filter -> output orchestration
(/root/reference/silk-rules/src/main/scala/org/silkframework/rule/
execution/GenerateLinks.scala:63-132), with activity resume replaced
by the checkpoint store + idempotent snapshot commits.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from silk_spark.checkpoint import BatchManifest, CheckpointStore
from silk_spark.schema import ColumnSpec, TableSchema
from silk_spark.sources.lake import KEYS, VERSION_ORDER, LakeTable

# columns the table stores; changelog bookkeeping (offset, schema_version)
# stays in the log. `op` is kept as a tombstone marker; ts+lsn are the
# version tuple that makes MERGE order-insensitive across batches.
TRANSCRIPT_TABLE_COLUMNS = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("ts", "timestamp"),
    ("lsn", "bigint"),
    ("op", "string"),
]


def transcripts_schema(with_tool: bool = False) -> TableSchema:
    cols = [ColumnSpec(i + 1, n, t) for i, (n, t) in enumerate(TRANSCRIPT_TABLE_COLUMNS)]
    if with_tool:
        cols.append(ColumnSpec(len(cols) + 1, "tool", "string"))
    return TableSchema(0, cols)


def create_transcripts_table(
    spark: SparkSession,
    root: str,
    n_buckets: int = 32,
    with_tool: bool = False,
    merge_mode: str = "cow",
) -> LakeTable:
    return LakeTable.create(
        spark,
        root,
        transcripts_schema(with_tool),
        key_cols=KEYS,
        version_cols=VERSION_ORDER,
        n_buckets=n_buckets,
        merge_mode=merge_mode,
    )


def project_changes(batch: DataFrame) -> DataFrame:
    """Project raw changelog events onto the table's merge columns.
    Schema-v1 events (no `tool`) simply lack the column; the lake's
    registry evolves when v2 events first arrive."""
    cols = [c for c, _ in TRANSCRIPT_TABLE_COLUMNS]
    if "tool" in batch.columns:
        cols.append("tool")
    return batch.select(*cols)


def apply_batch(
    table: LakeTable,
    batch: DataFrame,
    batch_id: str,
    checkpoints: CheckpointStore | None = None,
    start_lsn: int = -1,
    end_lsn: int = -1,
) -> dict:
    """Apply one deduped micro-batch idempotently; write lineage manifest."""
    summary = table.merge_batch(project_changes(batch), batch_id)
    if checkpoints is not None and not summary.get("skipped"):
        checkpoints.write(
            BatchManifest(
                batch_id=batch_id,
                start_lsn=start_lsn,
                end_lsn=end_lsn,
                rows_applied=summary["rows_in_batch"],
                rows_deleted=summary["rows_deleted"],
                partition_stats=summary["partition_stats"],
                snapshot_id=summary["snapshot_id"],
                schema_id=summary["schema_id"],
                committed_at_lsn=end_lsn,
            )
        )
    return summary


class CdcPipeline:
    """Offset-range micro-batch loop over a changelog DataFrame/path.

    The changelog is assumed append-only and lsn-ordered (binlog/WAL
    shape); a batch is the half-open lsn range [start, end). Filtering
    on lsn is pushed down to the parquet scan (min/max row-group stats
    prune untouched files on a sorted log).
    """

    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        checkpoints: CheckpointStore,
        changelog: DataFrame | None = None,
        changelog_path: str | None = None,
        pre_merge=None,
    ):
        """`pre_merge` is an optional DataFrame->DataFrame hook applied
        to every batch before the MERGE — e.g. the join-and-score
        reconciliation (operators/reconcile.reconcile_near_dups)."""
        self.spark = spark
        self.table = table
        self.checkpoints = checkpoints
        self._changelog = changelog
        self._changelog_path = changelog_path
        self.pre_merge = pre_merge

    def _log(self) -> DataFrame:
        if self._changelog is not None:
            return self._changelog
        return self.spark.read.parquet(self._changelog_path)

    def resume_lsn(self) -> int:
        latest = self.checkpoints.latest()
        return int(latest["end_lsn"]) if latest else 0

    def run(
        self,
        end_lsn: int,
        batch_size: int,
        start_lsn: int | None = None,
        max_batches: int | None = None,
        stop_after: int | None = None,
        compact_every: int | None = None,
    ) -> list[dict]:
        """Process [start_lsn, end_lsn) in `batch_size` slices; resume
        from the checkpoint pointer when start_lsn is None. `stop_after`
        simulates a crash after k batches (for resume tests).
        `compact_every` folds MOR delta files every k applied batches —
        bounds read amplification on a long-running tail (file count
        per bucket stays <= k + 1)."""
        start = self.resume_lsn() if start_lsn is None else start_lsn
        log = self._log()
        results = []
        batch_no = 0
        applied = 0
        lo = start
        while lo < end_lsn:
            hi = min(lo + batch_size, end_lsn)
            batch_id = f"lsn-{lo}-{hi}"
            batch = log.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            if self.pre_merge is not None:
                batch = self.pre_merge(batch)
            summary = apply_batch(
                self.table, batch, batch_id, self.checkpoints, lo, hi
            )
            results.append(summary)
            batch_no += 1
            if not summary.get("skipped"):
                applied += 1
                if compact_every and applied % compact_every == 0:
                    self.table.compact()
            lo = hi
            if stop_after is not None and batch_no >= stop_after:
                break
            if max_batches is not None and batch_no >= max_batches:
                break
        return results
