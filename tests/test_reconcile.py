"""Join-and-score reconciliation before merge + write-crash atomicity."""

import os

import pytest
from pyspark.sql import functions as F

from silk_spark.checkpoint import CheckpointStore
from silk_spark.operators.reconcile import near_dup_mapping, reconcile_near_dups
from silk_spark.streaming.pipeline import CdcPipeline, create_transcripts_table

ROWS = [
    # conv, turn, role, text, ts_off, lsn, op — turn 6 is a near-dup
    # resend of turn 5 (edit distance 1, adjacent index)
    ("c1", 5, "user", "hello world", 0, 1, "I"),
    ("c1", 6, "user", "hello world!", 5, 2, "I"),
    # distinct turn, far text: NOT reconciled
    ("c1", 7, "assistant", "completely different reply", 10, 3, "I"),
    # another conv: identical turn resent with same idx (plain dedup)
    ("c2", 0, "user", "hi", 0, 4, "I"),
    ("c2", 0, "user", "hi", 1, 5, "U"),
]


@pytest.fixture
def batch(spark):
    from silk_spark.datagen import EPOCH0

    df = spark.createDataFrame(
        [(c, t, r, x, o, l, op) for c, t, r, x, o, l, op in ROWS],
        "conv_id string, turn_idx int, role string, text string, off int, lsn bigint, op string",
    )
    return df.select(
        "conv_id", "turn_idx", "role", "text",
        F.timestamp_seconds(F.lit(EPOCH0) + F.col("off")).alias("ts"),
        "lsn", "op",
        F.lit(None).cast("string").alias("tool"),
    )


def test_mapping_targets_adjacent_near_dup(spark, batch):
    m = {(r.conv_id, r.turn_idx, r.lsn): r.canonical_turn for r in near_dup_mapping(batch).collect()}
    assert m == {("c1", 6, 2): 5}  # only the resend maps; c2 pair is same-key


def test_reconcile_then_merge_collapses_resend(spark, batch, tmp_path):
    t = create_transcripts_table(spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor")
    cp = CheckpointStore(str(tmp_path / "cp"))
    pipe = CdcPipeline(
        spark, t, cp, changelog=batch, pre_merge=reconcile_near_dups
    )
    pipe.run(end_lsn=10, batch_size=10)
    rows = {(r.conv_id, r.turn_idx): r for r in t.read().collect()}
    # resend won (later ts) under the canonical turn 5; no turn 6 row
    assert ("c1", 6) not in rows
    assert rows[("c1", 5)].text == "hello world!"
    assert rows[("c1", 7)].text == "completely different reply"
    assert rows[("c2", 0)].text == "hi" and rows[("c2", 0)].lsn == 5


def test_without_reconcile_both_rows_survive(spark, batch, tmp_path):
    t = create_transcripts_table(spark, str(tmp_path / "t2"), n_buckets=4)
    cp = CheckpointStore(str(tmp_path / "cp2"))
    CdcPipeline(spark, t, cp, changelog=batch).run(end_lsn=10, batch_size=10)
    keys = {(r.conv_id, r.turn_idx) for r in t.read().collect()}
    assert ("c1", 5) in keys and ("c1", 6) in keys


def test_hot_conversation_candidates_bounded(spark):
    """One conversation holding 50% of a batch must NOT cost O(m²)
    candidate pairs: (conv, turn-bucket) blocking bounds the join to
    in-window neighborhoods (each turn sees only versions of itself
    and the adjacent turn)."""
    from silk_spark.operators.reconcile import window_candidates

    m_turns, versions = 200, 2
    hot = [("hot", t, f"text of turn {t} v{v}", 10 * t + v) for t in range(m_turns) for v in range(versions)]
    cold = [(f"c{i}", 0, f"cold text {i}", 100000 + i) for i in range(m_turns * versions)]
    rec = spark.createDataFrame(
        hot + cold, "c string, turn int, text string, lsn bigint"
    )
    m = m_turns * versions  # hot-conversation records in the batch
    n_cand = window_candidates(rec, turn_window=1).count()
    # per turn: v*v pairs to the next turn -> ~m*v total; require far
    # below the O(m^2)=160k of a bare conv_id join
    assert n_cand <= 10 * m, n_cand
    # and recall is intact: every adjacent-turn pair is present
    got = window_candidates(rec, turn_window=1)
    adjacent = got.filter(F.col("right_turn") == F.col("left_turn") + 1).count()
    assert adjacent == (m_turns - 1) * versions * versions


class TestBareCandidatePath:
    """The alternative "bare"/"bare_ckpt" impls shuffle bare keys,
    never text — retained behind spark.silk.reconcile.impl after the
    round-5 A/B (BASELINE.md) showed the text-carrying default wins;
    parity and plan shape stay pinned here."""

    @pytest.fixture
    def corpus(self, spark):
        rows, lsn = [], 0
        for c in range(20):
            for t in range(30):
                rows.append(
                    (f"c{c}", t, f"turn {t} of conversation {c} says something", lsn)
                )
                lsn += 1
                if (t + c) % 4 == 0:  # near-dup resend on the next turn idx
                    rows.append(
                        (f"c{c}", t + 1,
                         f"turn {t} of conversation {c} says something!", lsn)
                    )
                    lsn += 1
                if t % 7 == 0:  # same (c, turn), second version, new lsn
                    rows.append(
                        (f"c{c}", t, f"turn {t} of conversation {c} says other", lsn)
                    )
                    lsn += 1
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string, lsn bigint"
        )

    def test_bare_mapping_matches_inline(self, spark, corpus):
        """Bit-identical mapping between the bare-key path (length band
        + late text fetch) and the legacy text-carrying join — the band
        is lossless and row multiplicity (same (c, turn), many lsn) is
        preserved by carrying left_lsn through the candidate pairs."""
        out = {}
        try:
            for impl in ("bare", "bare_ckpt", "inline"):
                spark.conf.set("spark.silk.reconcile.impl", impl)
                out[impl] = sorted(map(tuple, near_dup_mapping(corpus).collect()))
        finally:
            spark.conf.unset("spark.silk.reconcile.impl")
        assert len(out["bare"]) > 0
        assert out["bare"] == out["inline"] == out["bare_ckpt"]

    def test_candidate_shuffle_carries_no_text(self, spark, corpus):
        """No Exchange in the bare candidate plan may carry the text
        column — the bucket shuffle moves (c, turn, lsn, length) only."""
        from silk_spark.operators.reconcile import window_candidate_keys

        rec = corpus.select(
            F.col("conv_id").alias("c"), F.col("turn_idx").alias("turn"),
            "lsn", "text",
        )
        keyed = window_candidate_keys(rec, 1, band=2)
        plan = keyed._sc._jvm.PythonSQLUtils.explainString(
            keyed._jdf.queryExecution(), "formatted"
        )
        blocks = [
            b for b in plan.split("\n\n")
            if b.strip() and "Exchange" in b.strip().splitlines()[0]
        ]
        assert blocks, plan  # the blocking join does shuffle…
        for b in blocks:
            assert "text#" not in b, b  # …but never the payload


def test_crash_mid_write_leaves_table_consistent(spark, batch, tmp_path):
    """A snap dir written without a metadata commit (crash between the
    data write and the atomic version-hint flip) must be invisible;
    re-applying the batch afterwards converges normally."""
    t = create_transcripts_table(spark, str(tmp_path / "t3"), n_buckets=4, merge_mode="mor")
    cp = CheckpointStore(str(tmp_path / "cp3"))
    # simulate the torn write: orphan data files, metadata untouched
    orphan = os.path.join(t.data_dir, "snap-1", "_bucket=0")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000-dead.parquet"), "wb") as f:
        f.write(b"not a real parquet file")
    assert t.read().count() == 0  # orphan is not in any committed manifest
    CdcPipeline(spark, t, cp, changelog=batch).run(end_lsn=10, batch_size=10)
    assert t.read().count() == 4  # c1:5,6,7 + c2:0
