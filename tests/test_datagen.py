"""Generator determinism + shape guarantees (FIXTURES.md F2)."""

from silk_spark.datagen import changelog, near_dup_turns, transcripts


def test_changelog_deterministic_and_partition_invariant(spark):
    a = changelog(spark, 2000, seed=7, num_partitions=2).toPandas()
    b = changelog(spark, 2000, seed=7, num_partitions=16).toPandas()
    a = a.sort_values("lsn").reset_index(drop=True)
    b = b.sort_values("lsn").reset_index(drop=True)
    assert a.equals(b)


def test_changelog_op_mix_and_schema_cut(spark):
    df = changelog(spark, 5000, seed=42, schema_cut=0.4).toPandas()
    mix = df["op"].value_counts(normalize=True)
    assert 0.5 < mix["I"] < 0.7
    assert 0.2 < mix["U"] < 0.4
    assert 0.05 < mix["D"] < 0.15
    assert (df.loc[df["lsn"] < 2000, "schema_version"] == 1).all()
    assert (df.loc[df["lsn"] >= 2000, "schema_version"] == 2).all()
    # v1 events never carry tool; deletes carry no payload
    assert df.loc[df["schema_version"] == 1, "tool"].isna().all()
    assert df.loc[df["op"] == "D", "text"].isna().all()


def test_changelog_skew(spark):
    df = changelog(spark, 20000, seed=42, n_convs=500).toPandas()
    counts = df["conv_id"].value_counts()
    # Zipf-ish: the hottest conversation dominates the median one
    assert counts.iloc[0] > 20 * counts.median()


def test_transcripts_dense_keys(spark):
    t = transcripts(spark, n_convs=10, turns_per_conv=5).toPandas()
    assert len(t) == 50
    assert t.groupby("conv_id")["turn_idx"].apply(lambda s: sorted(s) == list(range(5))).all()


def test_near_dup_fixture(spark):
    records, golden = near_dup_turns(spark, n_pairs=20, n_distractors=30)
    r = records.toPandas()
    assert len(r) == 70
    assert golden.count() == 20
