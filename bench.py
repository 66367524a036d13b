"""silk-spark benchmark — prints ONE JSON line.

Primary metric (BASELINE.json): change-events/sec sustained MERGE
throughput on the synthesized transcript change log, with the
N-vs-4N-parallelism scaling evidence the north rule requires
(local[8] vs local[32] subprocesses on identical input; efficiency =
(T_32 / T_8) / 4).

Secondary: wall-clock of the headline queries() entries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forced to full
materialization through the noop sink (count() would let Catalyst
prune the very expressions being measured).

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    big parallelism level (default 32)
  SILK_BENCH_EVENTS   merge-bench change-log size (default 2_000_000)
  SILK_BENCH_SCALING  "0" to skip the small-parallelism run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SILK_BENCH_EVENTS", "2000000"))
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


def merge_bench(cpus: int, n_events: int) -> dict:
    """CDC merge throughput at one parallelism level (runs inside a
    subprocess so each level gets a fresh JVM sized to `cpus`)."""
    import shutil
    import tempfile

    from silk_spark.checkpoint import CheckpointStore
    from silk_spark.datagen import changelog
    from silk_spark.session import get_spark
    from silk_spark.streaming.pipeline import CdcPipeline, create_transcripts_table

    spark = get_spark(f"silk-bench-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix=f"silk_bench_{cpus}_")
    # log sized ~n_events; conv space sized so buckets stay hot but
    # bounded; 4 micro-batches, first is warm-up (excluded)
    log = changelog(
        spark, n_events, n_convs=max(n_events // 200, 1000), turns_per_conv=50, seed=42
    )
    log = log.repartition(cpus).cache()
    log.count()  # materialize input outside the timed region
    table = create_transcripts_table(spark, os.path.join(root, "t"), n_buckets=max(cpus * 4, 64))
    ckpt = CheckpointStore(os.path.join(root, "cp"))
    pipe = CdcPipeline(spark, table, ckpt, changelog=log)
    # 6 equal micro-batches: 2 warm-up (JIT/codegen compile — measured
    # per-batch times stabilize only after ~2 identical plan shapes),
    # 4 timed (BASELINE.md protocol: >= 3 consecutive batches)
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


def _subprocess(mode: str, cpus: int) -> dict:
    """Run one bench stage in a fresh interpreter (own JVM)."""
    code = (
        "import json, sys; sys.path.insert(0, {repo!r}); import bench; "
        "print('@RESULT@' + json.dumps("
        "bench.merge_bench({cpus}, {n}) if {mode!r} == 'merge' else bench.query_bench({cpus}, {sf!r})))"
    ).format(repo=os.path.dirname(os.path.abspath(__file__)), cpus=cpus, n=N_EVENTS, mode=mode, sf=SF_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("@RESULT@"):
            return json.loads(line[len("@RESULT@"):])
    raise RuntimeError(f"bench subprocess ({mode}, {cpus}) failed:\n{proc.stderr[-2000:]}")


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    big = _subprocess("merge", CPUS)
    result = {
        "metric": "change_events_per_sec_merge",
        "value": big["events_per_sec"],
        "unit": "events/sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "merge": {f"cpus_{CPUS}": big},
        "queries": {},
    }
    if RUN_SCALING:
        small_cpus = max(CPUS // 4, 1)
        small = _subprocess("merge", small_cpus)
        result["merge"][f"cpus_{small_cpus}"] = small
        result["scaling_efficiency"] = round(
            (big["events_per_sec"] / small["events_per_sec"]) / (CPUS / small_cpus), 3
        )
    result["queries"] = _subprocess("query", CPUS)
    result["total_query_sec"] = round(sum(result["queries"].values()), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
