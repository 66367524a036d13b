"""silk-spark benchmark — prints ONE JSON line.

Primary metric (BASELINE.json): change-events/sec sustained MERGE
throughput on the synthesized transcript change log, with the
N-vs-4N-parallelism scaling evidence the north rule requires.

Methodology (BASELINE.md):
  * each parallelism level runs in its own subprocess, CPU-PINNED with
    taskset to exactly that many cores — local[N] alone does not bound
    the JVM's GC/IO threads to N cores, which silently inflates the
    small level and understates scaling;
  * levels are interleaved and repeated; best-of-repeats is reported
    (samples rise monotonically across a run — host warm-up — and the
    shared VM shows up to 2x noise; all samples are in the output);
  * all bench I/O (log, table, shuffle) sits on tmpfs when available;
  * warm-up batches excluded; >= 3 consecutive timed micro-batches;
  * layout constants (64 buckets, 64 shuffle partitions) are identical
    across levels — only the core count varies.

Secondary: wall-clock of the headline queries() entries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forced to full
materialization through the noop sink (count() would let Catalyst
prune the very expressions being measured).

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    big parallelism level (default 32)
  SILK_BENCH_EVENTS   merge-bench change-log size (default 16_000_000)
  SILK_BENCH_MODE     merge mode for the throughput stage (default mor)
  SILK_BENCH_REPEATS  interleaved repetitions per level (default 3)
  SILK_BENCH_SCALING  "0" to skip the small-parallelism level
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 64M default: 10.7M-event micro-batches amortize the ~2s of fixed
# per-batch latency (task scheduling, broadcast, observe listener,
# driver commit) that otherwise masks CPU scaling at 32 cores —
# batch sizing is the real-world lever too (10^10 events/day arrives
# in >=100M-event batches, where the fixed term is <1%). 64M keeps a
# full interleaved best-of-3 run under ~25 min on a quiet host.
N_EVENTS = int(os.environ.get("SILK_BENCH_EVENTS", "64000000"))
REPEATS = int(os.environ.get("SILK_BENCH_REPEATS", "3"))
RUN_SCALING = os.environ.get("SILK_BENCH_SCALING", "1") != "0"

BENCH_QUERIES = [
    "cdc_latest_by_key",
    "cdc_apply_events",
    "link_part_names",
    "link_best_match",
    "agg_pricing_summary",
    "agg_revenue_by_nation",
    "window_top_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "ann_topk",
    "text_quality",
    "text_lang_id",
    "profile_stats",
]


def make_log(n_events: int) -> str:
    """Materialize the synthetic change log ONCE (parent process,
    unpinned — setup, not measurement) and share it with every pinned
    merge subprocess. 256 range partitions: a 1/6 batch window overlaps
    ~43 files, so scan (and, with the unpartitioned layout, write)
    parallelism covers 32 cores — parquet files are one row group and
    unsplittable, so file count IS the parallelism bound."""
    from silk_spark.datagen import changelog
    from silk_spark.session import get_spark
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="silk_bench_log_", dir=base)
    log_dir = os.path.join(root, "log")
    spark = get_spark("silk-bench-datagen", cpus=CPUS, shuffle_partitions=64,
                      extra_conf={"spark.local.dir": os.path.join(root, "scratch")})
    changelog(
        spark, n_events, n_convs=max(n_events // 200, 1000), turns_per_conv=50, seed=42
    ).repartitionByRange(256, "lsn").write.parquet(log_dir)
    spark.stop()
    return log_dir


def merge_bench(cpus: int, n_events: int, log_dir: str) -> dict:
    """CDC merge throughput at one parallelism level (call inside a
    fresh, CPU-pinned subprocess — see _merge_subprocess)."""
    from silk_spark.checkpoint import CheckpointStore
    from silk_spark.session import get_spark
    from silk_spark.streaming.pipeline import CdcPipeline, create_transcripts_table
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix=f"silk_bench_{cpus}_", dir=base)
    spark = get_spark(
        f"silk-bench-{cpus}",
        cpus=cpus,
        shuffle_partitions=64,
        extra_conf={"spark.local.dir": os.path.join(root, "scratch")},
    )
    table = create_transcripts_table(
        spark, os.path.join(root, "t"), n_buckets=64,
        merge_mode=os.environ.get("SILK_BENCH_MODE", "mor"),
        delta_layout=os.environ.get("SILK_BENCH_LAYOUT", "unpartitioned"),
    )
    ckpt = CheckpointStore(os.path.join(root, "cp"))
    # path mode: footer-stats file pruning + bounds-join slicing keeps
    # the generated code batch-invariant (no per-batch Janino/JIT)
    pipe = CdcPipeline(spark, table, ckpt, changelog_path=log_dir)
    # 6 equal micro-batches: 2 warm-up (JIT/codegen), 4 timed
    batch = n_events // 6
    warm = 2 * batch
    pipe.run(end_lsn=warm, batch_size=batch)
    t0 = time.monotonic()
    pipe.run(end_lsn=n_events, batch_size=batch, start_lsn=warm)
    dt = time.monotonic() - t0
    applied = n_events - warm
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return {"cpus": cpus, "events": applied, "sec": round(dt, 3), "events_per_sec": round(applied / dt, 1)}


def query_bench(cpus: int, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod
    from silk_spark.session import get_spark

    spark = get_spark(f"silk-qbench-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    out = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return out


def _run_stage(code: str, pin_cpus: int | None) -> dict:
    cmd = [sys.executable, "-c", code]
    if pin_cpus is not None and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("@RESULT@"):
            return json.loads(line[len("@RESULT@"):])
    raise RuntimeError(f"bench subprocess failed:\n{proc.stderr[-2000:]}")


def _merge_subprocess(cpus: int, log_dir: str) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = (
        f"import json, sys; sys.path.insert(0, {repo!r}); import bench; "
        f"print('@RESULT@' + json.dumps(bench.merge_bench({cpus}, {N_EVENTS}, {log_dir!r})))"
    )
    return _run_stage(code, pin_cpus=cpus)


def _query_subprocess(cpus: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = (
        f"import json, sys; sys.path.insert(0, {repo!r}); import bench; "
        f"print('@RESULT@' + json.dumps(bench.query_bench({cpus}, {SF_DIR!r})))"
    )
    return _run_stage(code, pin_cpus=None)


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    small_cpus = max(CPUS // 4, 1)
    levels = [CPUS, small_cpus] if RUN_SCALING else [CPUS]
    log_dir = make_log(N_EVENTS)
    samples: dict[int, list[dict]] = {c: [] for c in levels}
    try:
        for _ in range(REPEATS):
            for c in levels:  # interleaved: environment drift hits both levels
                samples[c].append(_merge_subprocess(c, log_dir))
    finally:
        shutil.rmtree(os.path.dirname(log_dir), ignore_errors=True)
    # best-of-repeats: samples rise monotonically across a run (host/
    # page-cache warm-up on this shared VM), so the max is the best
    # estimate of steady-state throughput; all samples are reported
    best = {c: max(s["events_per_sec"] for s in samples[c]) for c in levels}
    result = {
        "metric": "change_events_per_sec_merge",
        "value": best[CPUS],
        "unit": "events/sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "merge": {
            f"cpus_{c}": {
                "best_events_per_sec": best[c],
                "samples": [s["events_per_sec"] for s in samples[c]],
                "events_per_run": samples[c][0]["events"],
            }
            for c in levels
        },
    }
    if RUN_SCALING:
        result["scaling_efficiency"] = round(
            (best[CPUS] / best[small_cpus]) / (CPUS / small_cpus), 3
        )
    result["queries"] = _query_subprocess(CPUS)
    result["total_query_sec"] = round(sum(result["queries"].values()), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
