"""LakeTable: a copy-on-write, hash-bucketed snapshot table on parquet.

Implements the Iceberg semantics the north rule needs -- atomic
snapshot commits, batch-id idempotency in the snapshot summary,
column-ID schema evolution, per-bucket file pruning -- without the
Iceberg runtime jar (not in this image). On a real cluster the
public API maps 1:1 onto an Iceberg table:

    merge_batch(...)  ->  MERGE INTO t USING changes
                          ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx
                          WHEN MATCHED AND (c.ts, c.lsn) > (t.ts, t.lsn) THEN UPDATE ...
                          WHEN NOT MATCHED THEN INSERT ...
    bucket partitioning  ->  PARTITIONED BY (bucket(N, conv_id))
    committed_batches    ->  snapshot summary property, checked before commit

Layout::

    <root>/metadata/version-hint.text     # current metadata version (atomic pointer)
    <root>/metadata/v<k>.metadata.json    # schemas + snapshot log + file manifest
    <root>/data/snap-<sid>/_bucket=<b>/*.parquet

Copy-on-write MERGE rewrites ONLY the buckets containing changed keys;
untouched buckets carry their files forward by reference. At 100 TB
with (say) 4096 buckets, a micro-batch touching 200 conversations
rewrites ~200/4096 of the table, not all of it. Deletes are kept as
tombstone rows (op='D') so the final state is invariant to how the
change log is sliced into batches; `compact()` drops them.

Reference analogue: Silk's EntitySink openTable/writeEntity/closeTable
(/root/reference/silk-core/src/main/scala/org/silkframework/dataset/
EntitySink.scala:12-50) and FileEntityCache block/partition layout
(silk-core/.../cache/FileEntityCache.scala:41-58, blocks=101 default at
config/Blocking.scala:40) -- reborn as bucketed COW snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from silk_spark.operators.dedup import latest_by_key
from silk_spark.schema import SchemaRegistry, TableSchema, align_to_schema

def _bucket_stats_from_footers(snap_dir: str) -> tuple[list[int], dict]:
    """Per-bucket row counts from the written parquet footers — local
    metadata reads (thread-pooled), no Spark job."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    changed, stats = [], {}
    if not os.path.isdir(snap_dir):
        return changed, stats

    def count_bucket(entry: str) -> tuple[str, int]:
        b = entry.split("=", 1)[1]
        bdir = os.path.join(snap_dir, entry)
        n = sum(
            pq.ParquetFile(os.path.join(bdir, f)).metadata.num_rows
            for f in os.listdir(bdir)
            if f.endswith(".parquet")
        )
        return b, n

    entries = [e for e in os.listdir(snap_dir) if e.startswith("_bucket=")]
    with ThreadPoolExecutor(max_workers=16) as pool:
        for b, n in pool.map(count_bucket, entries):
            if n > 0:
                changed.append(int(b))
                stats[b] = n
    return sorted(changed), stats


KEYS = ["conv_id", "turn_idx"]
VERSION_ORDER = ["ts", "lsn"]


def bucket_expr(col: str, n_buckets: int) -> F.Column:
    """Stable hash bucket for a key column (Iceberg bucket-transform analogue)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


class LakeTable:
    """Copy-on-write table with snapshot isolation and optimistic
    multi-writer concurrency.

    Metadata commits go through a `MetadataIO` backend (sources/io.py):
    local atomic-rename/CAS by default, in-memory fake for tests,
    conditional-PUT on a real object store. The commit point is a
    compare-and-swap create of the next versioned metadata doc — of
    two racing writers exactly one wins; the loser raises
    CommitConflictError (or refreshes and retries when
    merge_batch(commit_retries=...) allows), its data files left as
    unreferenced orphans (io.py module docstring has the protocol)."""

    def __init__(self, spark: SparkSession, root: str, meta_io=None):
        from silk_spark.sources.io import LocalMetadataIO

        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")
        self.meta_io = meta_io if meta_io is not None else LocalMetadataIO(self.meta_dir)
        self._meta: dict | None = None

    # ---------- creation / metadata ----------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: TableSchema,
        key_cols: list[str] | None = None,
        version_cols: list[str] | None = None,
        n_buckets: int = 32,
        merge_mode: str = "cow",
        meta_io=None,
        delta_layout: str = "bucketed",
    ) -> "LakeTable":
        """`delta_layout` (MOR only): "bucketed" shuffles each batch
        into the bucket layout at write time; "unpartitioned" appends
        the batch AS SCANNED — zero exchanges, the high-rate ingest
        layout (Hudi/Paimon-style append) — and `compact()` re-clusters
        the global deltas into buckets. Unpartitioned deltas cannot be
        bucket-pruned until compacted (manifest bucket key "*")."""
        assert merge_mode in ("cow", "mor")
        assert delta_layout in ("bucketed", "unpartitioned")
        t = LakeTable(spark, root, meta_io=meta_io)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        registry = SchemaRegistry(schema)
        meta = {
            "format_version": 1,
            "key_cols": key_cols or KEYS,
            "version_cols": version_cols or VERSION_ORDER,
            "n_buckets": n_buckets,
            "merge_mode": merge_mode,
            "delta_layout": delta_layout,
            "registry": registry.to_dict(),
            "current_snapshot_id": None,
            "snapshots": [],
            "committed_batches": [],
        }
        t._write_meta(meta, version=0)
        return t

    def _write_meta(self, meta: dict, version: int) -> None:
        """Commit = CAS-create of the versioned metadata doc (io.py
        protocol): of two writers that both loaded version-1, exactly
        one creates `v<version>` — the loser raises CommitConflictError
        and must refresh() + retry (merge_batch is batch_id-idempotent,
        so a blind re-apply is safe). The hint file is a best-effort
        read cache written by the winner AFTER the CAS; _load_meta
        probes past a stale hint, so a crash in between loses nothing."""
        from silk_spark.sources.io import CommitConflictError

        if not self.meta_io.try_create(f"v{version}.metadata.json", json.dumps(meta)):
            raise CommitConflictError(
                f"metadata version {version} already committed by another writer "
                f"(table {self.root}); refresh() and retry"
            )
        self.meta_io.write_atomic("version-hint.text", str(version))
        self._meta = meta
        self._meta_version = version

    def _load_meta(self) -> dict:
        version = int(self.meta_io.read("version-hint.text").strip())
        # the hint lags the CAS point if a committer crashed (or lost
        # the race) before refreshing it: probe forward to the newest
        # existing metadata doc — O(commits since hint), normally 0
        while self.meta_io.exists(f"v{version + 1}.metadata.json"):
            version += 1
        self._meta = json.loads(self.meta_io.read(f"v{version}.metadata.json"))
        self._meta_version = version
        return self._meta

    @property
    def meta(self) -> dict:
        return self._meta if self._meta is not None else self._load_meta()

    def refresh(self) -> "LakeTable":
        self._load_meta()
        return self

    @property
    def registry(self) -> SchemaRegistry:
        return SchemaRegistry.from_dict(self.meta["registry"])

    @property
    def schema(self) -> TableSchema:
        return self.registry.current

    def current_snapshot(self) -> dict | None:
        sid = self.meta["current_snapshot_id"]
        if sid is None:
            return None
        return next(s for s in self.meta["snapshots"] if s["snapshot_id"] == sid)

    def committed_batches(self) -> set:
        return set(self.meta["committed_batches"])

    # ---------- read ----------

    def _snapshot(self, snapshot_id: int) -> dict:
        for s in self.meta["snapshots"]:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(
            f"snapshot {snapshot_id} not found in table {self.root} "
            f"(have {[s['snapshot_id'] for s in self.meta['snapshots']]})"
        )

    def resolve_ref(self, ref: "int | str | None") -> int | None:
        """Resolve a snapshot reference: an int id passes through, a
        string resolves via the tag map (Iceberg tag semantics)."""
        if ref is None or isinstance(ref, int):
            return ref
        tags = self.meta.get("tags", {})
        if ref not in tags:
            raise KeyError(
                f"tag {ref!r} not found in table {self.root} (have {sorted(tags)})"
            )
        return tags[ref]

    def tag(self, name: str, snapshot_id: int | None = None) -> dict:
        """Name a committed snapshot (Iceberg tag): a durable ref the
        expiry NEVER deletes from under you — tagged snapshots (and
        their files) are retained by expire_snapshots until the tag is
        dropped. The audit anchor for a CDC table: tag the snapshot a
        replay/backfill was validated against, expire freely, and
        `read(as_of_snapshot="name")` keeps working."""
        meta = dict(self.meta)
        sid = snapshot_id if snapshot_id is not None else meta["current_snapshot_id"]
        if sid is None:
            raise ValueError("cannot tag an empty table (no committed snapshot)")
        self._snapshot(sid)  # KeyError if unknown
        tags = dict(meta.get("tags", {}))
        tags[name] = sid
        meta["tags"] = tags
        self._write_meta(meta, version=self._meta_version + 1)
        return {"tag": name, "snapshot_id": sid}

    def delete_tag(self, name: str) -> dict:
        meta = dict(self.meta)
        tags = dict(meta.get("tags", {}))
        if name not in tags:
            raise KeyError(f"tag {name!r} not found (have {sorted(tags)})")
        sid = tags.pop(name)
        meta["tags"] = tags
        self._write_meta(meta, version=self._meta_version + 1)
        return {"deleted_tag": name, "snapshot_id": sid}

    def tags(self) -> dict:
        return dict(self.meta.get("tags", {}))

    def history(self) -> list[dict]:
        """Commit history, oldest first: every snapshot's summary
        (operation, batch_id, row counts, schema_id) without the file
        manifests — the audit/time-travel index."""
        return [
            {k: v for k, v in s.items() if k != "files"} for s in self.meta["snapshots"]
        ]

    def _bucket_files(self, as_of_snapshot: int | None = None) -> dict[str, list]:
        """Manifest entries per bucket: [path, schema_id] pairs (legacy
        plain-string entries read as schema_id=None)."""
        if as_of_snapshot is not None:
            return self._snapshot(as_of_snapshot)["files"]
        snap = self.current_snapshot()
        return {} if snap is None else snap["files"]

    @staticmethod
    def _file_entry(entry) -> tuple[str, int | None]:
        if isinstance(entry, str):
            return entry, None
        return entry[0], entry[1]

    def scan(
        self,
        buckets: list[int] | None = None,
        with_tombstones: bool = True,
        resolve: bool | None = None,
        as_of_snapshot: int | None = None,
    ) -> DataFrame:
        """Read the table (optionally pruned to a bucket subset). Old
        data files are aligned to the read schema (missing columns
        -> NULL, widened types -> cast): the column-ID mapped read.

        `resolve` applies the max-by-version reduction per key — the
        merge-on-read step. Defaults to True for a MOR table (delta
        files carry multiple versions per key), False for COW (files
        are already resolved at write time).

        `as_of_snapshot` time-travels: read the file manifest (and the
        schema) AS OF that committed snapshot — snapshots are immutable
        and manifests cumulative, so this is pure metadata selection,
        no data copies (Iceberg `VERSION AS OF` semantics). A string
        `as_of_snapshot` resolves through the tag map."""
        as_of_snapshot = self.resolve_ref(as_of_snapshot)
        meta = self.meta
        if resolve is None:
            resolve = meta.get("merge_mode", "cow") == "mor"
        files_by_bucket = self._bucket_files(as_of_snapshot)
        if buckets is not None:
            # "*" = unpartitioned delta files: they may hold rows of ANY
            # bucket, so every bucket-subset read must include them
            wanted = {str(b) for b in buckets} | {"*"}
            files_by_bucket = {b: fs for b, fs in files_by_bucket.items() if b in wanted}
        all_files = [self._file_entry(e) for fs in files_by_bucket.values() for e in fs]
        registry = self.registry
        schema = self.schema
        if as_of_snapshot is not None:
            snap_sid = self._snapshot(as_of_snapshot).get("schema_id")
            if snap_sid is not None:
                schema = next(
                    v for v in registry.versions if v.schema_id == snap_sid
                )
        if not all_files:
            empty_ddl = schema.ddl() + ", _bucket int"
            return self.spark.createDataFrame([], empty_ddl)
        # Column-ID mapped read: every data file records the schema_id it
        # was written under; each schema-version group is read with EXACTLY
        # that version's schema (explicit read schema — no footer inference,
        # no mergeSchema driver cost), then projected onto the current
        # schema with Column casts (missing column -> typed NULL, widened
        # type -> cast; date->timestamp etc. is legal as an expression but
        # NOT inside the parquet reader). Inferring instead would let a
        # lexicographically-first old-schema file silently NULL an evolved
        # column for every row.
        # No basePath/partition inference either — MOR delta files for
        # one bucket live under several snap-N dirs, which Spark's dir
        # inference rejects; _bucket is recomputed from the key hash
        # (deterministic, same expression the writer used).
        by_sid: dict[int | None, list[str]] = {}
        for path, sid in all_files:
            by_sid.setdefault(sid, []).append(path)
        version_by_id = {s.schema_id: s for s in registry.versions}
        parts = []
        for sid, paths in sorted(by_sid.items(), key=lambda kv: (kv[0] is None, kv[0] or 0)):
            if sid is not None and sid in version_by_id:
                df = self.spark.read.schema(version_by_id[sid].ddl()).parquet(*paths)
            else:  # legacy manifest entry without schema_id: merge footers
                df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
            parts.append(align_to_schema(df, schema))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # bucket by the layout the snapshot being read was WRITTEN
        # under (snapshots record n_buckets; rescale_buckets changes it
        # going forward) — time travel across a rescale must interpret
        # the old manifest's bucket keys with the old bucket function
        snap_rec = (
            self._snapshot(as_of_snapshot)
            if as_of_snapshot is not None
            else self.current_snapshot()
        ) or {}
        eff_n_buckets = snap_rec.get("n_buckets", meta["n_buckets"])
        aligned = df.withColumn(
            "_bucket", bucket_expr(meta["key_cols"][0], eff_n_buckets)
        )
        if buckets is not None:
            # unpartitioned ("*") delta files carry rows of EVERY bucket;
            # after recomputing _bucket, drop the out-of-scope ones so the
            # pruned-scan contract holds (those keys' base-bucket files
            # were pruned above — resolving them against deltas alone
            # would surface stale versions)
            aligned = aligned.filter(
                F.col("_bucket").isin([int(b) for b in buckets])
            )
        if resolve:
            aligned = latest_by_key(aligned, meta["key_cols"], meta["version_cols"])
        if not with_tombstones and "op" in schema.names():
            aligned = aligned.filter((F.col("op").isNull()) | (F.col("op") != "D"))
        return aligned

    def read(self, as_of_snapshot: int | None = None) -> DataFrame:
        """Live rows (tombstones filtered, bookkeeping columns dropped),
        optionally time-traveled to an older committed snapshot."""
        return self.scan(with_tombstones=False, as_of_snapshot=as_of_snapshot).drop(
            "_bucket"
        )

    def lookup(self, key_value, as_of_snapshot: "int | str | None" = None) -> DataFrame:
        """Point lookup by the bucketing key (key_cols[0]): prune the
        scan to the ONE bucket the key hashes into, then push the key
        equality into the parquet scan. On a 4096-bucket 100 TB table
        this touches 1/4096 of the files (plus any not-yet-compacted
        unpartitioned deltas) instead of all of them — the serving-path
        read. The bucket id comes from a one-row local expression eval
        (same xxhash64 the writer used), not a cluster job.

        `as_of_snapshot` (id or tag) time-travels the lookup; the key
        hashes with THAT snapshot's recorded bucket layout, so lookups
        across a rescale_buckets boundary prune to the right bucket."""
        meta = self.meta
        key_col = meta["key_cols"][0]
        sid = self.resolve_ref(as_of_snapshot)
        snap_rec = (self._snapshot(sid) if sid is not None else self.current_snapshot()) or {}
        eff_n_buckets = snap_rec.get("n_buckets", meta["n_buckets"])
        row = (
            self.spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(key_value)), F.lit(eff_n_buckets))
                .cast("int")
                .alias("b")
            )
            .first()
        )
        return (
            self.scan(
                buckets=[int(row["b"])],
                with_tombstones=False,
                as_of_snapshot=sid,
            )
            .filter(F.col(key_col) == F.lit(key_value))
            .drop("_bucket")
        )

    # ---------- incremental / diff reads ----------

    def read_changes(
        self, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Incremental changelog read: the change rows APPENDED by the
        MOR commits in (from_snapshot, to_snapshot] — exactly the files
        those snapshots added, a pure manifest diff with no join and no
        scan of pre-existing data (Iceberg incremental append scan).
        Rows carry the original op/lineage columns, so a downstream
        consumer can chain CDC pipelines table-to-table.

        Only delta-append commits qualify: a COW merge / overwrite /
        compact rewrites files, where added-files != changed-rows —
        use `snapshot_diff` across those. Tag names resolve."""
        from_snapshot = self.resolve_ref(from_snapshot)
        to_snapshot = self.resolve_ref(to_snapshot)
        to_snapshot = (
            self.meta["current_snapshot_id"] if to_snapshot is None else to_snapshot
        )
        in_range = [
            s
            for s in self.meta["snapshots"]
            if from_snapshot < s["snapshot_id"] <= to_snapshot
        ]
        bad = [s for s in in_range if s["operation"] != "merge-mor"]
        if bad:
            raise ValueError(
                "read_changes needs every snapshot in range to be a MOR "
                f"delta-append; found {[(s['snapshot_id'], s['operation']) for s in bad]}"
                " — use snapshot_diff() across rewrites"
            )
        base = {
            p
            for fs in self._bucket_files(from_snapshot).values()
            for p, _ in map(self._file_entry, fs)
        }
        added: dict[int | None, list[str]] = {}
        for fs in self._bucket_files(to_snapshot).values():
            for p, sid in map(self._file_entry, fs):
                if p not in base:
                    added.setdefault(sid, []).append(p)
        registry = self.registry
        schema = self.schema
        if not added:
            return self.spark.createDataFrame([], schema.ddl())
        version_by_id = {s.schema_id: s for s in registry.versions}
        parts = []
        for sid, paths in sorted(added.items(), key=lambda kv: (kv[0] is None, kv[0] or 0)):
            if sid is not None and sid in version_by_id:
                df = self.spark.read.schema(version_by_id[sid].ddl()).parquet(*paths)
            else:
                df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
            parts.append(align_to_schema(df, schema))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def snapshot_diff(
        self, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Engine-level CDC between two committed snapshots, valid
        across ANY operations (COW rewrites, compactions, schema
        evolution): full-outer join of the two resolved live states on
        the key columns, emitting one row per changed key with
        `_change_type` I/U/D and `before`/`after` structs. Shuffles
        both states once on the key — the scale shape of a diff. Tag
        names resolve."""
        from_snapshot = self.resolve_ref(from_snapshot)
        to_snapshot = self.resolve_ref(to_snapshot)
        to_snapshot = (
            self.meta["current_snapshot_id"] if to_snapshot is None else to_snapshot
        )
        keys = self.meta["key_cols"]
        schema = self.schema
        old = align_to_schema(
            self.read(as_of_snapshot=from_snapshot), schema
        )
        new = align_to_schema(self.read(as_of_snapshot=to_snapshot), schema)
        vals = [c for c in schema.names() if c not in keys]
        o = old.select(
            *[F.col(k).alias(f"_ok_{k}") for k in keys],
            F.struct(*[F.col(c) for c in schema.names()]).alias("before"),
        )
        n = new.select(
            *[F.col(k).alias(f"_nk_{k}") for k in keys],
            F.struct(*[F.col(c) for c in schema.names()]).alias("after"),
        )
        cond = None
        for k in keys:
            c = o[f"_ok_{k}"] == n[f"_nk_{k}"]
            cond = c if cond is None else (cond & c)
        j = o.join(n, cond, "full_outer")
        changed = None
        for c in vals:
            d = ~F.col(f"before.{c}").eqNullSafe(F.col(f"after.{c}"))
            changed = d if changed is None else (changed | d)
        return (
            j.withColumn(
                "_change_type",
                F.when(F.col("before").isNull(), F.lit("I"))
                .when(F.col("after").isNull(), F.lit("D"))
                .when(changed if changed is not None else F.lit(False), F.lit("U")),
            )
            .filter(F.col("_change_type").isNotNull())
            .select(
                *[
                    F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
                    for k in keys
                ],
                "_change_type",
                "before",
                "after",
            )
        )

    # ---------- write / merge ----------

    def merge_batch(
        self,
        changes: DataFrame,
        batch_id: str,
        extra_summary: dict | None = None,
        commit_retries: int = 0,
    ) -> dict:
        """Idempotent MERGE of one micro-batch.

        `changes` must carry key_cols + version_cols + 'op' (+payload).
        Steps: (1) skip if batch_id already committed; (2) dedup to the
        latest event per key (max-by version); (3) apply per the table's
        merge_mode; (4) atomically commit a new snapshot whose summary
        embeds batch_id + lineage. Returns the snapshot summary (or the
        prior one if skipped).

        merge_mode (Iceberg v2 semantics):
          * "cow" — copy-on-write: rewrite only touched buckets,
            resolving base-vs-change by max version. Write cost is
            O(touched table data); reads are plain scans.
          * "mor" — merge-on-read: append the deduped batch as delta
            files per bucket — write cost O(batch), no base read; scans
            resolve versions on the fly until `compact()` folds deltas.
            At 10^10 events/day this is the only write path that keeps
            MERGE throughput independent of table size.

        Either mode converges to the same state under replay and
        out-of-order batches (the max-by-(ts,lsn) rule is associative
        and commutative over any batch slicing).
        """
        meta = dict(self.meta)
        if batch_id in meta["committed_batches"]:
            return {"skipped": True, "batch_id": batch_id}

        keys = meta["key_cols"]
        order = meta["version_cols"]
        n_buckets = meta["n_buckets"]
        mode = meta.get("merge_mode", "cow")

        # schema evolution: add new incoming columns / widen types
        registry = SchemaRegistry.from_dict(meta["registry"])
        incoming = [(f.name, f.dataType.simpleString()) for f in changes.schema.fields]
        registry.evolve(incoming)
        schema = registry.current

        changes = align_to_schema(changes, schema)
        if mode != "mor":
            # COW resolves base-vs-change at write time; shrinking the
            # change side first keeps the union small.
            changes = latest_by_key(changes, keys, order)
        # MOR: NO in-batch dedup — scan-time max-by resolution already
        # handles any number of versions per key, so the groupBy would
        # be a pure extra shuffle of the whole batch (measured ~35% of
        # batch wall-clock). The write path is ONE shuffle: bucket
        # layout. Intra-batch duplicate keys cost only bytes in the
        # delta files until compact() folds them.
        changes = changes.withColumn("_bucket", bucket_expr(keys[0], n_buckets))

        snap_id = (meta["current_snapshot_id"] or 0) + 1
        # writer-unique dir: two racing committers computing the same
        # snap_id must not share a data dir (the metadata CAS decides
        # the winner AFTER the write; the loser's files become orphans,
        # never referenced — Iceberg's failed-commit semantics)
        snap_dir = os.path.join(self.data_dir, f"snap-{snap_id}-{uuid.uuid4().hex[:8]}")

        if mode == "mor":
            # ONE Spark job per micro-batch: lineage rides the write via
            # an Observation on the change stream (no separate stats
            # job, no cache); per-bucket counts come from the freshly
            # written parquet footers (local metadata reads). At high
            # batch rates the per-batch fixed cost IS the throughput
            # ceiling, so job count matters more than anything else.
            obs = Observation()
            out = changes.observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes"),
            )
            if meta.get("delta_layout", "bucketed") == "unpartitioned":
                # ZERO-shuffle append: write the batch as scanned (the
                # only exchange-free plan — scan parallelism flows
                # straight into the parquet writers). Deltas land under
                # manifest key "*" and are re-clustered by compact().
                out.drop("_bucket").write.mode("overwrite").parquet(snap_dir)
                changed_buckets = ["*"]
                # obs.get LAST: it blocks on the async listener bus
                # (~100-500 ms after job end); done after the local
                # bookkeeping the wait overlaps it
                rows_in_batch = int(obs.get["rows"] or 0)
                rows_deleted = int(obs.get["deletes"] or 0)
                partition_stats = {"*": rows_in_batch}
            else:
                (
                    out.repartition(n_buckets, "_bucket")
                    .write.mode("overwrite")
                    .partitionBy("_bucket")
                    .parquet(snap_dir)
                )
                rows_in_batch = int(obs.get["rows"] or 0)
                rows_deleted = int(obs.get["deletes"] or 0)
                changed_buckets, partition_stats = _bucket_stats_from_footers(snap_dir)
        else:
            # COW needs the touched-bucket set BEFORE it can scan the
            # base side, so it is inherently two jobs; cache the deduped
            # batch so the aggregate isn't computed twice
            changes = changes.cache()
            stats_rows = (
                changes.groupBy("_bucket")
                .agg(
                    F.count("*").alias("rows"),
                    F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes"),
                )
                .collect()
            )
            changed_buckets = sorted(int(r["_bucket"]) for r in stats_rows)
            partition_stats = {str(r["_bucket"]): int(r["rows"]) for r in stats_rows}
            rows_in_batch = sum(partition_stats.values())
            rows_deleted = int(sum(r["deletes"] for r in stats_rows))
            if changed_buckets:
                base = self.scan(buckets=changed_buckets)
                out = latest_by_key(
                    base.unionByName(changes, allowMissingColumns=True), keys, order
                )
                # one output file set per bucket; repartition by bucket keeps
                # each parquet dir written by the executors owning that hash range
                (
                    out.repartition(max(len(changed_buckets), 1), "_bucket")
                    .write.mode("overwrite")
                    .partitionBy("_bucket")
                    .parquet(snap_dir)
                )
            changes.unpersist()

        # build new file manifest: COW replaces touched buckets' files,
        # MOR appends delta files to them ("*" = unpartitioned deltas)
        files = {b: list(fs) for b, fs in self._bucket_files().items()}
        for b in changed_buckets:
            bdir = snap_dir if b == "*" else os.path.join(snap_dir, f"_bucket={b}")
            new_files = [
                [os.path.join(bdir, f), schema.schema_id]
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")
            ]
            if mode == "mor":
                files[str(b)] = files.get(str(b), []) + new_files
            else:
                files[str(b)] = new_files

        summary = {
            "snapshot_id": snap_id,
            "parent_id": meta["current_snapshot_id"],
            "batch_id": batch_id,
            "operation": "merge" if mode == "cow" else "merge-mor",
            "schema_id": schema.schema_id,
            "rows_in_batch": rows_in_batch,
            "rows_deleted": rows_deleted,
            "buckets_rewritten": len(changed_buckets),
            "partition_stats": partition_stats,
            "n_buckets": n_buckets,
        }
        if extra_summary:
            summary.update(extra_summary)

        meta["registry"] = registry.to_dict()
        meta["snapshots"] = meta["snapshots"] + [{**summary, "files": files}]
        meta["current_snapshot_id"] = snap_id
        meta["committed_batches"] = meta["committed_batches"] + [batch_id]
        try:
            self._write_meta(meta, version=self._meta_version + 1)
        except Exception as e:
            from silk_spark.sources.io import CommitConflictError

            if not isinstance(e, CommitConflictError) or commit_retries <= 0:
                raise
            # another writer won this version: refresh to its state and
            # re-apply the whole batch on top (our files are orphans).
            # The committed_batches check at the top makes the retry a
            # no-op if the conflicting commit WAS this batch_id.
            self.refresh()
            return self.merge_batch(
                changes, batch_id, extra_summary, commit_retries=commit_retries - 1
            )
        return summary

    def overwrite(self, df: DataFrame, batch_id: str = "bootstrap") -> dict:
        """Full-table rewrite (bootstrap load)."""
        return self._rewrite(df, batch_id, "overwrite", self.meta["n_buckets"])

    def rescale_buckets(self, new_n_buckets: int) -> dict:
        """Partition evolution (Iceberg partition-spec evolution applied
        to the bucket transform): rewrite the table's resolved state —
        tombstones kept, same rationale as compact() — into
        `new_n_buckets` hash buckets, switching the layout in the SAME
        metadata commit so the manifest keys and the bucket function can
        never disagree. The growth operation for a 100 TB table: when
        per-bucket data outruns the executor-memory / target-file-size
        envelope, widen 64 -> 256 -> 4096 without touching the pipeline
        (merge_batch reads n_buckets from live metadata, so subsequent
        batches shuffle into the new layout automatically, and the
        idempotency ledger is untouched — replayed batches still skip).
        Time travel stays sound: every snapshot records the layout it
        was written under and scan() buckets by THAT, not by the
        current one. MOR unpartitioned deltas ("*") are folded into
        real buckets as a side effect (same as compact).

        Reference analogue: silk-core partitioning is fixed per run
        (workspace/activity config); growing it is exactly what the
        north rule's explicit-partitioning requirement adds."""
        new_n = int(new_n_buckets)
        if new_n < 1:
            raise ValueError(f"n_buckets must be >= 1, got {new_n}")
        if new_n == self.meta["n_buckets"]:
            return {
                "operation": "rescale",
                "noop": True,
                "n_buckets": new_n,
                "snapshot_id": self.meta["current_snapshot_id"],
            }
        # legacy tables: snapshots written before layouts were recorded
        # per-snapshot carry no 'n_buckets' — scan()'s fallback for
        # those is the CURRENT meta value, which after this rescale
        # would be the NEW count, silently misbucketing time-travel
        # reads of old snapshots. Backfill the pre-rescale layout onto
        # them in a metadata-only commit BEFORE switching layouts.
        if any("n_buckets" not in s for s in self.meta["snapshots"]):
            meta = dict(self.meta)
            meta["snapshots"] = [
                s if "n_buckets" in s else {**s, "n_buckets": meta["n_buckets"]}
                for s in meta["snapshots"]
            ]
            self._write_meta(meta, version=self._meta_version + 1)
        resolved = self.scan(with_tombstones=True).drop("_bucket")
        return self._rewrite(
            resolved, f"rescale-{uuid.uuid4().hex[:8]}", "rescale", new_n
        )

    def _rewrite(
        self, df: DataFrame, batch_id: str, operation: str, n_buckets: int
    ) -> dict:
        """Write `df` as a complete new bucketed file set and commit it
        as the current snapshot (shared by overwrite/compact/rescale).
        `n_buckets` becomes the table layout in the same commit."""
        meta = dict(self.meta)
        registry = SchemaRegistry.from_dict(meta["registry"])
        registry.evolve([(f.name, f.dataType.simpleString()) for f in df.schema.fields])
        schema = registry.current
        snap_id = (meta["current_snapshot_id"] or 0) + 1
        snap_dir = os.path.join(self.data_dir, f"snap-{snap_id}-{uuid.uuid4().hex[:8]}")
        out = align_to_schema(df, schema).withColumn(
            "_bucket", bucket_expr(meta["key_cols"][0], n_buckets)
        )
        # cluster each bucket's file by key: parquet min/max column
        # stats then let point lookups and key-range scans skip row
        # groups inside a bucket (Iceberg sort-order analogue). Only
        # maintenance rewrites pay the sort — the hot MOR append path
        # stays exchange-free.
        sort_cols = ["_bucket"] + [c for c in meta["key_cols"] if c in out.columns]
        (
            out.repartition(n_buckets, "_bucket")
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(snap_dir)
        )
        files = {}
        for entry in sorted(os.listdir(snap_dir)):
            if entry.startswith("_bucket="):
                b = entry.split("=", 1)[1]
                bdir = os.path.join(snap_dir, entry)
                files[b] = [
                    [os.path.join(bdir, f), schema.schema_id]
                    for f in sorted(os.listdir(bdir))
                    if f.endswith(".parquet")
                ]
        summary = {
            "snapshot_id": snap_id,
            "parent_id": meta["current_snapshot_id"],
            "batch_id": batch_id,
            "operation": operation,
            "schema_id": schema.schema_id,
            "n_buckets": n_buckets,
        }
        meta["registry"] = registry.to_dict()
        meta["n_buckets"] = n_buckets
        meta["snapshots"] = meta["snapshots"] + [{**summary, "files": files}]
        meta["current_snapshot_id"] = snap_id
        meta["committed_batches"] = meta["committed_batches"] + [batch_id]
        self._write_meta(meta, version=self._meta_version + 1)
        return summary

    def compact(self, drop_tombstones: bool = False) -> dict:
        """Fold every bucket's files into one resolved file set (the
        MOR maintenance job; harmless no-op semantics on COW).

        Tombstones are KEPT by default: a future batch may still carry
        an older-version event for a deleted key, and the tombstone's
        version is what out-merges it. Drop them only when the log is
        fully consumed (terminal compaction)."""
        resolved = self.scan(with_tombstones=not drop_tombstones, resolve=True)
        return self.overwrite(resolved.drop("_bucket"), batch_id=f"compact-{uuid.uuid4().hex[:8]}")

    # ---------- maintenance ----------

    def rollback(self, snapshot_id: int) -> dict:
        """Point the table back at an earlier committed snapshot
        (Iceberg `rollback_to_snapshot`): a pure metadata commit — the
        snapshot log is append-only, so the rolled-past snapshots stay
        time-travelable until expired. Batches committed after the
        rollback target are REMOVED from the idempotency ledger so the
        CDC pipeline can legitimately re-apply them."""
        meta = dict(self.meta)
        target = self._snapshot(snapshot_id)  # KeyError if unknown
        replayable = {
            s["batch_id"]
            for s in meta["snapshots"]
            if s["snapshot_id"] > snapshot_id and "batch_id" in s
        }
        summary = {
            "snapshot_id": (meta["current_snapshot_id"] or 0) + 1,
            "parent_id": meta["current_snapshot_id"],
            "operation": "rollback",
            "rolled_back_to": snapshot_id,
            "schema_id": target.get("schema_id"),
            # a rollback across a rescale restores the target's layout:
            # the manifest's bucket keys and meta.n_buckets must agree
            "n_buckets": target.get("n_buckets", meta["n_buckets"]),
        }
        meta["snapshots"] = meta["snapshots"] + [
            {**summary, "files": {b: list(fs) for b, fs in target["files"].items()}}
        ]
        meta["n_buckets"] = summary["n_buckets"]
        meta["current_snapshot_id"] = summary["snapshot_id"]
        meta["committed_batches"] = [
            b for b in meta["committed_batches"] if b not in replayable
        ]
        self._write_meta(meta, version=self._meta_version + 1)
        return summary

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Expire all but the newest `keep_last` snapshots (the current
        snapshot is always retained) and delete the data files that
        only expired snapshots reference — Iceberg `expire_snapshots`.
        Bounds metadata size and reclaims the COW/compact rewrite
        history; time travel to an expired id raises thereafter.

        The expiry is committed (CAS, like any snapshot commit) BEFORE
        any file is deleted: a crash mid-delete leaves unreferenced
        files that the next `remove_orphans()` sweep reclaims — never
        a referenced file missing."""
        meta = dict(self.meta)
        snaps = meta["snapshots"]
        keep_last = max(int(keep_last), 1)
        # retain: the newest keep_last, the current snapshot, and every
        # TAGGED snapshot (tags are durable refs — expiry must never
        # delete a snapshot a tag still points at)
        retain_ids = {s["snapshot_id"] for s in snaps[-keep_last:]}
        if meta["current_snapshot_id"] is not None:
            retain_ids.add(meta["current_snapshot_id"])
        retain_ids |= set(meta.get("tags", {}).values())
        retained = [s for s in snaps if s["snapshot_id"] in retain_ids]
        expired = [s for s in snaps if s["snapshot_id"] not in retain_ids]
        if not expired:
            return {"expired_snapshots": [], "files_deleted": 0}

        def paths(snapshot: dict) -> set:
            return {
                p
                for fs in snapshot["files"].values()
                for p, _ in map(self._file_entry, fs)
            }

        live = set().union(*(paths(s) for s in retained)) if retained else set()
        dead = sorted(set().union(*(paths(s) for s in expired)) - live)

        meta["snapshots"] = retained
        self._write_meta(meta, version=self._meta_version + 1)
        deleted = self._delete_data_files(dead)
        return {
            "expired_snapshots": [s["snapshot_id"] for s in expired],
            "files_deleted": deleted,
        }

    def remove_orphans(self) -> dict:
        """Delete data files not referenced by ANY retained snapshot —
        the debris of lost CAS commit races and crashed expiries
        (Iceberg `remove_orphan_files`). Metadata is untouched: this is
        a pure storage sweep, safe to run any time because commit
        protocol order (write files, THEN CAS the manifest) means an
        unreferenced file can never become referenced later.

        Listing is driver-side here (local filesystem); on an object
        store at 10^6+ files the same set-difference runs as a Spark
        anti-join of the listing against the manifest union."""
        referenced = {
            os.path.realpath(p)
            for s in self.meta["snapshots"]
            for fs in s["files"].values()
            for p, _ in map(self._file_entry, fs)
        }
        deleted = 0
        for entry in sorted(os.listdir(self.data_dir)):
            top = os.path.join(self.data_dir, entry)
            if not os.path.isdir(top):
                continue
            files = [
                os.path.join(dp, f)
                for dp, _dn, fn in os.walk(top)
                for f in fn
            ]
            live = [p for p in files if os.path.realpath(p) in referenced]
            if not live:
                # a wholly-unreferenced snapshot dir: a lost CAS race or
                # a fully-expired commit — remove it markers and all
                deleted += sum(1 for p in files if p.endswith(".parquet"))
                shutil.rmtree(top, ignore_errors=True)
            else:
                deleted += self._delete_data_files(
                    [
                        p
                        for p in files
                        if p.endswith(".parquet")
                        and os.path.realpath(p) not in referenced
                    ]
                )
        return {"files_deleted": deleted}

    def _delete_data_files(self, paths: list) -> int:
        deleted = 0
        for p in paths:
            try:
                os.remove(p)
                deleted += 1
            except OSError:
                pass
            d = os.path.dirname(p)
            # prune now-empty snap-*/_bucket=* dirs (ignore non-empty)
            while d.startswith(self.data_dir) and d != self.data_dir:
                try:
                    os.rmdir(d)
                except OSError:
                    break
                d = os.path.dirname(d)
        return deleted

    def verify(self, check_all_snapshots: bool = False) -> dict:
        """Manifest integrity check (the table fsck): every file a
        snapshot references must exist, every snapshot's parent chain
        must resolve, the current pointer and every tag must point at
        a known snapshot, and the batch ledger must cover every
        batch-carrying snapshot. Returns {"ok": bool, "errors": [...],
        "files_checked": n}; pure metadata + stat calls, no Spark job —
        safe to run on a live table between commits."""
        meta = self.meta
        errors: list[str] = []
        known = {s["snapshot_id"] for s in meta["snapshots"]}
        cur = meta["current_snapshot_id"]
        if cur is not None and cur not in known:
            errors.append(f"current_snapshot_id {cur} not in snapshot log")
        for name, sid in meta.get("tags", {}).items():
            if sid not in known:
                errors.append(f"tag {name!r} points at unknown snapshot {sid}")
        ledger = set(meta["committed_batches"])
        snaps = (
            meta["snapshots"]
            if check_all_snapshots
            # a dangling current pointer is already recorded above —
            # don't ALSO crash trying to load it (fsck must report
            # every corruption class it detects, never die on one)
            else ([self._snapshot(cur)] if cur is not None and cur in known else [])
        )
        # rollback() intentionally removes rolled-past batch_ids from
        # the ledger while their snapshots stay in the append-only log
        # (time-travelable until expired) — ledger coverage is only
        # required for snapshots NOT rolled past by a later rollback
        rollbacks = [s for s in meta["snapshots"] if s.get("operation") == "rollback"]

        def _rolled_past(s: dict) -> bool:
            return any(
                r["snapshot_id"] > s["snapshot_id"]
                and r.get("rolled_back_to", 0) < s["snapshot_id"]
                for r in rollbacks
            )

        files_checked = 0
        for s in snaps:
            parent = s.get("parent_id")
            # expiry may legitimately remove any non-tagged ancestor, so
            # a missing parent is fine; an ORDERING violation is not
            if parent is not None and parent >= s["snapshot_id"]:
                errors.append(
                    f"snapshot {s['snapshot_id']} has non-monotone parent {parent}"
                )
            if "batch_id" in s and s["batch_id"] not in ledger and not _rolled_past(s):
                errors.append(
                    f"snapshot {s['snapshot_id']} batch {s['batch_id']!r} "
                    "missing from the idempotency ledger (replay would re-apply)"
                )
            for fs in s["files"].values():
                for path, _sid in map(self._file_entry, fs):
                    files_checked += 1
                    if not os.path.exists(path):
                        errors.append(
                            f"snapshot {s['snapshot_id']} references missing file {path}"
                        )
        return {"ok": not errors, "errors": errors, "files_checked": files_checked}

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
