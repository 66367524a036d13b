import pandas as pd
import pytest

from silk_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("silk-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


def final_state_oracle(changelog_pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-pass pandas oracle: winner per (conv_id, turn_idx) is the
    event with max (ts, lsn); row is live iff the winner's op != 'D'.
    Batching-invariant by construction."""
    df = changelog_pdf.sort_values(["ts", "lsn"], kind="mergesort")
    last = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    live = last[last["op"] != "D"]
    return (
        live[["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def normalize(pdf: pd.DataFrame, cols=None) -> pd.DataFrame:
    cols = cols or ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]
    out = pdf[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return out
