"""max-by-(ts,lsn) dedup: agg strategy == window strategy == pandas oracle."""

import pandas as pd

from silk_spark.datagen import changelog
from silk_spark.operators.dedup import latest_by_key, latest_by_key_window


def _oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(["ts", "lsn"], kind="mergesort")
        .drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_latest_by_key_matches_oracle(spark):
    log = changelog(spark, 3000, n_convs=50, turns_per_conv=5, seed=3)
    got = (
        latest_by_key(log)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _oracle(log.toPandas())
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_agg_and_window_strategies_agree(spark):
    log = changelog(spark, 3000, n_convs=50, turns_per_conv=5, seed=9)
    a = latest_by_key(log).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = (
        latest_by_key_window(log)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_dedup_keeps_all_columns(spark):
    log = changelog(spark, 100, seed=1)
    assert latest_by_key(log).columns == log.columns
