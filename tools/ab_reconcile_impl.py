"""Interleaved same-window A/B: reconcile candidate-join impl
"bare" (key-only shuffle + post-join text fetch) vs "inline"
(text-carrying candidate join, the round-4 official path).

Round 4's verdict flagged merge_with_reconcile at 43.6k ev/s official
vs 3.59M plain merge (~80x per event) and asked for a measured attack
on the cost, not the correctness. The "bare" impl keeps the turn text
out of the (conv, turn-bucket) bucket exchange entirely (the inline
plan shuffles ~3 batch-volumes of text) and adds a lossless
|length diff| <= threshold band on the bare keys. This measures both
impls interleaved in one quiet window through the REAL CDC loop
(CdcPipeline + pre_merge hook + MOR merge), same changelog, fresh
table per rep, so the verdict lands in BASELINE.md as data.

Usage: python tools/ab_reconcile_impl.py [n_events] [reps]
Env: AB_PAD_CHARS=N appends a constant N-char pad to every turn text
after generation — near-dup edit distances are unchanged (both sides
of a pair get the same pad) but the per-event text volume grows to
transcript scale, which is the axis the two impls trade on.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from silk_spark import get_spark  # noqa: E402
from silk_spark.checkpoint import CheckpointStore  # noqa: E402
from silk_spark.datagen import changelog  # noqa: E402
from silk_spark.operators.reconcile import reconcile_near_dups  # noqa: E402
from silk_spark.streaming.pipeline import (  # noqa: E402
    CdcPipeline,
    create_transcripts_table,
)

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROOT = "/dev/shm/silk_ab_reconcile" if os.path.isdir("/dev/shm") else "/tmp/silk_ab_reconcile"


def run_once(spark, log_dir: str, impl: str, tag: str) -> dict:
    """One fresh-table CDC run: small warm batch, then 2 timed batches
    with the reconcile hook active under the given impl."""
    spark.conf.set("spark.silk.reconcile.impl", impl)
    root = os.path.join(ROOT, tag)
    shutil.rmtree(root, ignore_errors=True)
    table = create_transcripts_table(
        spark, os.path.join(root, "t"), n_buckets=64, merge_mode="mor"
    )
    ckpt = CheckpointStore(os.path.join(root, "cp"))
    pipe = CdcPipeline(
        spark, table, ckpt, changelog_path=log_dir, pre_merge=reconcile_near_dups
    )
    warm = N_EVENTS // 6
    pipe.run(end_lsn=warm, batch_size=warm)
    timed = N_EVENTS - warm
    t0 = time.monotonic()
    pipe.run(end_lsn=N_EVENTS, batch_size=timed // 2, start_lsn=warm)
    sec = time.monotonic() - t0
    shutil.rmtree(root, ignore_errors=True)
    return {
        "impl": impl,
        "events": timed,
        "sec": round(sec, 2),
        "events_per_sec": round(timed / sec, 1),
        "loadavg": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    la = os.getloadavg()[0]
    if la > 3.0:
        print(f"host busy (loadavg {la:.1f}) — rerun in a quiet window")
        sys.exit(1)
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(
        "ab-reconcile-impl", cpus=CPUS, shuffle_partitions=64,
        extra_conf={"spark.local.dir": os.path.join(ROOT, "scratch")},
    )
    log_dir = os.path.join(ROOT, "log")
    log = changelog(
        spark, N_EVENTS, n_convs=max(N_EVENTS // 200, 1000),
        turns_per_conv=50, seed=42,
    )
    pad = int(os.environ.get("AB_PAD_CHARS", "0"))
    if pad > 0:
        from pyspark.sql import functions as F

        filler = F.substring(
            F.repeat(F.lit("lorem ipsum dolor sit amet "), pad // 27 + 1), 1, pad
        )
        log = log.withColumn("text", F.concat(F.col("text"), F.lit(" "), filler))
        print(f"padding texts by {pad} chars", flush=True)
    log.write.mode("overwrite").parquet(log_dir)

    impls = tuple(
        os.environ.get("AB_IMPLS", "bare,inline").split(",")
    )
    results = []
    # warm-up rep (codegen/JIT), excluded from the record
    run_once(spark, log_dir, impls[0], "warm")
    for rep in range(REPS):
        for impl in impls:  # interleaved within each rep
            r = run_once(spark, log_dir, impl, f"{impl}{rep}")
            r["rep"] = rep
            results.append(r)
            print(json.dumps(r), flush=True)
    print("\nSUMMARY (events/sec):")
    for impl in impls:
        xs = [r["events_per_sec"] for r in results if r["impl"] == impl]
        print(f"  {impl}: {xs}  best={max(xs):,.0f}")
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
