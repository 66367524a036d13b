"""Interleaved same-window A/B: shingle-frame persist vs lazy recompute.

Round-4 official bench showed dedup_ngram_jaccard 13.5 s (r3, no
persist) -> 27.0 s (r4, persist) while nearly everything else got
faster; dedup_clusters (same path) 13.3 -> 16.5 s. This measures the
two policies interleaved in one quiet window (host-contention rules:
only run when 1-min load < ~3 and steal < 0.1) so the verdict is
recorded as data, not a guess.

Usage: python tools/ab_shingle_persist.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from silk_spark import get_spark  # noqa: E402
from silk_spark.operators import dedup_suite as ds  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def loadavg1() -> float:
    return os.getloadavg()[0]


def main() -> None:
    spark = get_spark("ab-shingle-persist", cpus=32)
    queries = e.queries()
    targets = ["dedup_ngram_jaccard", "dedup_clusters"]
    results = {q: {"true": [], "false": []} for q in targets}

    # warm-up (JVM/codegen/parquet footer caches), excluded
    for q in targets:
        queries[q](spark, SF_DIR).count()
    ds.release_persisted()
    spark.catalog.clearCache()

    for rep in range(REPS):
        for mode in ("true", "false"):  # interleaved within each rep
            spark.conf.set("spark.silk.shingles.persist", mode)
            for q in targets:
                la = loadavg1()
                t0 = time.time()
                n = queries[q](spark, SF_DIR).count()
                dt = time.time() - t0
                ds.release_persisted()
                spark.catalog.clearCache()
                results[q][mode].append(round(dt, 2))
                print(
                    f"rep={rep} persist={mode} {q}: {dt:.2f}s rows={n} "
                    f"loadavg={la:.2f}",
                    flush=True,
                )
    print("\nSUMMARY (best of reps):")
    for q in targets:
        b_t = min(results[q]["true"])
        b_f = min(results[q]["false"])
        print(
            f"  {q}: persist={results[q]['true']} (best {b_t}) | "
            f"no-persist={results[q]['false']} (best {b_f}) | "
            f"winner={'persist' if b_t < b_f else 'no-persist'}"
        )


if __name__ == "__main__":
    main()
