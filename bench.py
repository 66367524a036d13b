"""silk-spark benchmark — prints a JSON result line per completed stage.

Primary metric (BASELINE.json): change-events/sec sustained MERGE
throughput on the synthesized transcript change log, with the
N-vs-4N-parallelism scaling evidence the north rule requires.

OUTPUT CONTRACT: after every completed stage the CURRENT cumulative
result is printed as one complete JSON line (flushed). Lines are
strictly monotone in information — a consumer should take the LAST
parsable line. The final line carries "partial": false. This makes
the artifact kill-proof: however hard the host is loaded, whatever
stages finished are on stdout already (the round-2 bench timed out
and left NOTHING — never again).

DEADLINE: the run honors a wall-clock budget (SILK_BENCH_DEADLINE,
default 1500 s). Stages are ordered by evidential value —
  1. merge throughput at the big level (the headline number),
  2. merge at the small level (scaling efficiency),
  3. the query bench (per-query regression axis),
  4. extra interleaved merge repeats (noise control, best-of)
— and later stages are shed when the remaining budget cannot cover
them (estimated from observed stage times, 1.3x safety).

Methodology (BASELINE.md):
  * each parallelism level runs in its own subprocess, CPU-PINNED with
    taskset to exactly that many cores — local[N] alone does not bound
    the JVM's GC/IO threads to N cores, which silently inflates the
    small level and understates scaling;
  * levels are interleaved within a repeat round; best-of-repeats is
    reported (samples rise monotonically across a run — host warm-up —
    and the shared VM shows up to 2x noise; all samples are emitted);
  * all bench I/O (log, table, shuffle) sits on tmpfs when available;
  * 2 small warm-up batches (JIT/codegen — the generated plan is
    batch-invariant, so warm-up needn't burn big batches), then 4
    equal LARGE timed batches (batch size amortizes the ~1-2 s fixed
    per-batch term that otherwise caps scaling efficiency);
  * layout constants (64 buckets, 64 shuffle partitions) are identical
    across levels — only the core count varies.

Secondary: wall-clock of the headline queries() entries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forced to full
materialization through the noop sink (count() would let Catalyst
prune the very expressions being measured). The query subprocess
emits one @Q@ line per finished query, so a mid-stage kill still
yields every completed timing.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     big parallelism level (default 32)
  SILK_BENCH_EVENTS    merge-bench change-log size (default 64_000_000)
  SILK_BENCH_MODE      merge mode for the throughput stage (default mor)
  SILK_BENCH_REPEATS   interleaved repetitions per level (default 2)
  SILK_BENCH_SCALING   "0" to skip the small-parallelism level
  SILK_BENCH_DEADLINE  wall-clock budget in seconds (default 1500)
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 64M with 15M timed batches: batch sizing is the real-world lever
# (10^10 events/day arrives in >=100M-event batches where the fixed
# per-batch term is <1%), and 15M is the largest that keeps a full
# deadline-managed run inside the budget on a quiet host.
N_EVENTS = int(os.environ.get("SILK_BENCH_EVENTS", "64000000"))
REPEATS = int(os.environ.get("SILK_BENCH_REPEATS", "2"))
RUN_SCALING = os.environ.get("SILK_BENCH_SCALING", "1") != "0"
DEADLINE = float(os.environ.get("SILK_BENCH_DEADLINE", "1500"))

_T0 = time.monotonic()


def _remaining() -> float:
    return DEADLINE - (time.monotonic() - _T0)


BENCH_QUERIES = [
    "cdc_latest_by_key",
    "cdc_apply_events",
    "link_part_names",
    "link_best_match",
    "link_stringmap",
    "agg_pricing_summary",
    "agg_revenue_by_nation",
    "window_top_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "ann_topk",
    "ann_ivf_topk",
    "text_quality",
    "text_lang_id",
    "profile_stats",
    "media_features",
]


def make_log(n_events: int) -> str:
    """Materialize the synthetic change log ONCE (parent process,
    unpinned — setup, not measurement) and share it with every pinned
    merge subprocess. 256 range partitions: a timed batch window
    overlaps ~60 files, so scan (and, with the unpartitioned layout,
    write) parallelism covers 32 cores — parquet files are one row
    group and unsplittable, so file count IS the parallelism bound."""
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
    fresh, CPU-pinned subprocess — see _merge_subprocess).

    Warm-up is 2 SMALL batches (the generated code is batch-invariant
    — footer-stats pruning + bounds-join slicing — so JIT/codegen
    warm-up doesn't need big batches), then 4 equal large timed
    batches over the rest of the log."""
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
    pipe = CdcPipeline(spark, table, ckpt, changelog_path=log_dir)
    warm = min(2 * 2_000_000, n_events // 8)
    pipe.run(end_lsn=warm, batch_size=max(warm // 2, 1))
    timed_events = n_events - warm
    batch = timed_events // 4
    t0 = time.monotonic()
    pipe.run(end_lsn=n_events, batch_size=batch, start_lsn=warm)
    dt = time.monotonic() - t0
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "cpus": cpus,
        "events": timed_events,
        "sec": round(dt, 3),
        "events_per_sec": round(timed_events / dt, 1),
    }


def query_bench(cpus: int, sf_dir: str, budget: float) -> None:
    """Run inside a subprocess: one @Q@ line per finished query (the
    parent collects whatever completed even if this process is killed)
    plus a final @RESULT@ line. Skips remaining queries when `budget`
    seconds have elapsed, estimating each query's cost as the max
    observed so far."""
    import __spark_entry__ as entrymod
    from silk_spark.session import get_spark

    t_start = time.monotonic()
    spark = get_spark(f"silk-qbench-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    out = {}
    worst = 30.0
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        elapsed = time.monotonic() - t_start
        if budget > 0 and elapsed + 1.3 * worst > budget:
            print(f"@SKIP@{name}", flush=True)
            continue
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        out[name] = dt
        worst = max(worst, dt)
        print(f"@Q@{name} {dt}", flush=True)
    spark.stop()
    print("@RESULT@" + json.dumps(out), flush=True)


def _run_stage(code: str, pin_cpus: int | None, timeout: float) -> tuple[dict | None, str]:
    """Run `code` in a child python, optionally CPU-pinned, killing the
    WHOLE process group on timeout (the Spark JVM is a grandchild —
    subprocess.run's kill would orphan it and the zombie JVM would
    poison later stages). Returns (parsed @RESULT@ or None, stdout)."""
    cmd = [sys.executable, "-c", code]
    if pin_cpus is not None and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        start_new_session=True,
    )
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        stdout, _ = proc.communicate()
        return None, stdout or ""
    for line in (stdout or "").splitlines():
        if line.startswith("@RESULT@"):
            return json.loads(line[len("@RESULT@"):]), stdout
    sys.stderr.write(f"bench stage produced no result:\n{(stderr or '')[-2000:]}\n")
    return None, stdout or ""


def _merge_subprocess(cpus: int, log_dir: str, n_events: int, timeout: float) -> dict | None:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = (
        f"import json, sys; sys.path.insert(0, {repo!r}); import bench; "
        f"print('@RESULT@' + json.dumps(bench.merge_bench({cpus}, {n_events}, {log_dir!r})))"
    )
    res, _ = _run_stage(code, pin_cpus=cpus, timeout=timeout)
    return res


def _query_subprocess(cpus: int, timeout: float, budget: float) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); import bench; "
        f"bench.query_bench({cpus}, {SF_DIR!r}, {budget!r})"
    )
    res, stdout = _run_stage(code, pin_cpus=None, timeout=timeout)
    if res is not None:
        return res
    # killed mid-stage: salvage the per-query lines that DID finish
    out = {}
    for line in stdout.splitlines():
        if line.startswith("@Q@"):
            name, dt = line[len("@Q@"):].rsplit(" ", 1)
            out[name] = float(dt)
    return out


GUARANTEE_EVENTS = int(os.environ.get("SILK_BENCH_GUARANTEE_EVENTS", "6000000"))


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    small_cpus = max(CPUS // 4, 1)
    levels = [CPUS, small_cpus] if RUN_SCALING else [CPUS]
    reserve = 30.0  # cleanup + final emission headroom

    # samples grouped by tier (= log size): the guarantee tier's small
    # batches carry a larger fixed-cost share, so tiers never mix in a
    # best-of. emit() reports the largest tier with a big-level sample.
    samples: dict[int, dict[int, list[dict]]] = {}
    queries: dict[str, float] = {}
    stages_done: list[str] = []
    shed: list[str] = []

    def emit(final: bool = False) -> None:
        tier = None
        for t in sorted(samples, reverse=True):
            if samples[t].get(CPUS):
                tier = t
                break
        if tier is None and samples:
            tier = max(t for t in samples if any(samples[t].values()))
        tiered = samples.get(tier, {}) if tier is not None else {}
        best = {
            c: max(s["events_per_sec"] for s in ss)
            for c, ss in tiered.items()
            if ss
        }
        result = {
            "metric": "change_events_per_sec_merge",
            "value": best.get(CPUS),
            "unit": "events/sec",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "tier_events": tier,
            "merge": {
                f"cpus_{c}": {
                    "best_events_per_sec": best[c],
                    "samples": [s["events_per_sec"] for s in tiered[c]],
                    "events_per_run": tiered[c][0]["events"],
                }
                for c in tiered
                if tiered[c]
            },
            "stages_completed": list(stages_done),
            "stages_shed": list(shed),
            "deadline_sec": DEADLINE,
            "elapsed_sec": round(time.monotonic() - _T0, 1),
            "partial": not final,
        }
        if best.get(CPUS) and best.get(small_cpus):
            result["scaling_efficiency"] = round(
                (best[CPUS] / best[small_cpus]) / (CPUS / small_cpus), 3
            )
        if queries:
            result["queries"] = dict(queries)
            result["total_query_sec"] = round(sum(queries.values()), 3)
        # ALWAYS print: a line with value=null still beats an empty
        # artifact, and the consumer takes the LAST parsable line.
        print(json.dumps(result), flush=True)

    def run_merge(c: int, log_dir: str, n_events: int, stage: str, budget: float) -> dict | None:
        res = _merge_subprocess(c, log_dir, n_events, timeout=budget)
        if res is None:
            shed.append(stage + ":timeout")
        else:
            samples.setdefault(n_events, {c2: [] for c2 in levels})[c].append(res)
            stages_done.append(stage)
        emit()
        return res

    tmp_roots: list[str] = []
    est: dict[int, float] = {}  # observed full-tier merge wall per level
    try:
        # ---- guarantee tier: a complete (headline + scaling) artifact
        # within minutes, at ANY host noise level, before the real
        # measurement starts. Overwritten by the full tier when it lands.
        g_log = make_log(GUARANTEE_EVENTS)
        tmp_roots.append(os.path.dirname(g_log))
        for c in levels:
            run_merge(c, g_log, GUARANTEE_EVENTS, f"guarantee_merge_{c}x",
                      budget=max(min(_remaining() - reserve, 300.0), 60.0))

        # ---- full tier
        if _remaining() > 0.45 * DEADLINE:
            log_dir = make_log(N_EVENTS)
            tmp_roots.append(os.path.dirname(log_dir))
            for rep in range(REPEATS):
                for c in levels:
                    stage = f"merge_{c}x_r{rep}"
                    need = 1.3 * est.get(c, 120.0)
                    if rep > 0 and _remaining() < need + reserve:
                        shed.append(stage)
                        continue
                    budget = max(min(_remaining() - reserve, 3600.0), 60.0)
                    if rep == 0:
                        # leave room for the other level + queries
                        budget = min(budget, 0.35 * DEADLINE)
                    t0 = time.monotonic()
                    res = run_merge(c, log_dir, N_EVENTS, stage, budget)
                    if res is not None:
                        est[c] = max(est.get(c, 0.0), time.monotonic() - t0)
                if rep == 0 and _remaining() > reserve + 60.0:
                    qbudget = max(min(_remaining() - reserve, 3600.0), 60.0)
                    queries.update(_query_subprocess(CPUS, timeout=qbudget, budget=qbudget - 45.0))
                    stages_done.append("queries")
                    emit()
        else:
            shed.append("full_tier:no_budget")
            if _remaining() > reserve + 60.0:
                qbudget = max(_remaining() - reserve, 60.0)
                queries.update(_query_subprocess(CPUS, timeout=qbudget, budget=qbudget - 45.0))
                stages_done.append("queries")
    finally:
        for r in tmp_roots:
            shutil.rmtree(r, ignore_errors=True)
        emit(final=True)


if __name__ == "__main__":
    main()
