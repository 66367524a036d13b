"""Parity pins for the fused signature path.

The fused Arrow kernels (dedup_suite) hash shingles Python-side with
functions/xxh64.py; these tests pin (1) the Python xxh64 against a live
`F.xxhash64` column over adversarial strings, (2) the vectorized batch
form against the scalar reference, and (3) fused signatures against the
JVM expression path bit for bit — the property that makes the three
`spark.silk.signatures.impl` backends interchangeable."""
from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from silk_spark.functions.xxh64 import xxh64, xxh64_batch
from silk_spark.operators import dedup_suite as ds


def _signed(u: int) -> int:
    return struct.unpack("<q", struct.pack("<Q", u))[0]


def _sample_strings() -> list[str]:
    rng = random.Random(20260820)
    alphabet = "abcdefghij klmnopqrs\tuvw"
    out = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 100)))
        for _ in range(200)
    ]
    # every tail-length class around the 4/8/32-byte boundaries, plus
    # multi-byte UTF-8 and the empty string
    out += ["x" * n for n in (1, 3, 4, 5, 7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 71)]
    out += ["", "κόσμε", "Ünïcode ΣΤΙΓΜΑΣ İstanbul ß", "naïve café — em.dash"]
    return out


def test_batch_matches_scalar():
    strs = _sample_strings()
    bs = [s.encode("utf-8") for s in strs]
    scalar = np.array([_signed(xxh64(b)) for b in bs], dtype=np.int64)
    batch = xxh64_batch(bs)
    assert (scalar == batch).all()


def test_matches_spark_xxhash64(spark):
    strs = _sample_strings()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "i long, text string"
    )
    got = np.array(
        [r[1] for r in sorted(df.select("i", F.xxhash64("text")).collect())],
        dtype=np.int64,
    )
    exp = xxh64_batch([s.encode("utf-8") for s in strs])
    assert (got == exp).all()


@pytest.mark.parametrize("which", ["minhash", "simhash60"])
def test_fused_signatures_match_jvm(spark, which):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "short"),
        (4, "a b"),
        (5, "tab\tsep\nnewline  double  space  CASE MiXeD"),
        (6, "Ünïcode ΣΤΙΓΜΑΣ İstanbul ß mixed 42 numbers 007"),
        (7, "x " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fn = ds.minhash_signatures if which == "minhash" else ds.simhash60_signature
    spark.conf.set("spark.silk.signatures.impl", "fused")
    try:
        fused = sorted(fn(df).collect())
    finally:
        spark.conf.set("spark.silk.signatures.impl", "jvm")
    try:
        jvm = sorted(fn(df).collect())
    finally:
        spark.conf.unset("spark.silk.signatures.impl")
    assert fused == jvm


def test_fused_plan_has_single_arrow_eval_and_codegen_guard(spark):
    """The fused minhash plan must be ONE ArrowEvalPython over the raw
    text column — no interpreted zip_with shingle layer riding the
    Python node's input projection (the round-5 measured 55x trap)."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    spark.conf.set("spark.silk.signatures.impl", "fused")
    try:
        plan = (
            ds.minhash_signatures(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.silk.signatures.impl")
    assert plan.count("ArrowEvalPython") == 1
    assert "zip_with" not in plan
