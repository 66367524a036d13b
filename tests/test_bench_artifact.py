"""Artifact-size contract for bench.py's compact output line.

The driver captures only the final ~2 KB of bench stdout and parses
the last JSON line inside it; round 3 lost its own headline
(parsed: null) when the cumulative line outgrew that window. bench.py
now prints a compact final line and size-guards it at runtime by
DROPPING the per-query timings when the line would exceed 1900 bytes
— which keeps `parsed` alive but silently loses the per-query
regression axis. This test fails BEFORE that happens: adding a query
(or renaming one longer) that would push the worst-case compact line
past the window must show up as a red test, not as vanished timings
in the next official artifact.
"""

import importlib.util
import json
import sys

# import bench.py without triggering a run (it only runs under
# __main__, but keep the import explicit and path-anchored)
_spec = importlib.util.spec_from_file_location("silk_bench", "bench.py")
_bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("silk_bench", _bench)
_spec.loader.exec_module(_bench)


def _worst_case_compact_line() -> str:
    """The compact payload exactly as bench.py's emit() shapes it,
    with every numeric field at its widest realistic rendering."""
    # emit() renders compact query timings as whole seconds. The query
    # subprocess is hard-killed at qbudget <= 3600 s, so the SUM of all
    # rendered timings is < 3600 — under that constraint the
    # byte-maximal assignment is 142 total digits (greedy: 54 two-digit
    # upgrades at 10 s each, then 34 three-digit upgrades at +90 s),
    # strictly below the all-three-digit model used here (162 digits).
    # One query CAN exceed 999 s, but every 4-digit entry burns >=1000 s
    # of the sum that would otherwise buy ~30 digits as 100 s entries,
    # so all-999 stays an upper bound on any feasible line.
    queries = {name: 999 for name in _bench.BENCH_QUERIES}
    compact = {
        "metric": "change_events_per_sec_merge",
        "value": 99999999.9,
        "unit": "events/sec",
        "sf": 0.1,
        "headline_tier_events": 360000000,
        "headline_basis": "batch",
        "headline_cpus": 32,
        "levels": {"big": 32, "small": 8, "adapted": False},
        "scaling_efficiency": 0.999,
        "scaling_efficiency_by_tier": {
            "6000000": 0.999, "24000000": 0.999, "36000000": 0.999,
        },
        "hardware_efficiency_ceiling": 0.999,
        "scaling_efficiency_vs_hardware": 9.999,
        "merge_with_reconcile": {
            "events_per_sec": 99999999.9,
            "tier_events": 360000000,
            "cpus": 32,
        },
        "dedup_throughput": {
            "docs_per_sec": 99999999.9,
            "docs": 100000000,
            "pairs": 999999999,
            "cpus": 32,
            "sec": 99999.99,
        },
        "dedup_sig_eff": 0.999,
        "elapsed_sec": 99999.9,
        "partial": False,
        "queries": queries,
        "total_query_sec": 99999.9,
    }
    return json.dumps(compact, separators=(",", ":"))


def test_compact_line_fits_driver_tail_with_all_queries():
    line = _worst_case_compact_line()
    assert len(line) < 1900, (
        f"compact bench line is {len(line)} bytes at worst case; the "
        "driver tail window is ~2 KB and bench.py will start dropping "
        "per-query timings — shorten query names or prune the list"
    )


def test_every_registered_query_is_benchmarked():
    """BENCH_QUERIES must track the driver contract: every queries()
    entry is benchmarked (no silently unbenchmarked operator)."""
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    registered = set(entry.queries())
    benched = set(_bench.BENCH_QUERIES)
    assert benched <= registered, benched - registered
    missing = registered - benched
    assert not missing, f"queries missing from BENCH_QUERIES: {missing}"
