"""CLI surface: init -> ingest -> show -> compact round trip."""

import json
import os

from silk_spark.cli import main
from silk_spark.datagen import changelog


def test_cli_round_trip(spark, tmp_path_factory, capsys):
    root = str(tmp_path_factory.mktemp("cli"))
    log_dir = os.path.join(root, "log")
    changelog(spark, 1000, n_convs=20, seed=3).write.parquet(log_dir)
    table = os.path.join(root, "t")
    ckpt = os.path.join(root, "cp")

    assert main(["--cpus", "8", "init", "--table", table, "--merge-mode", "mor"]) == 0
    assert main([
        "--cpus", "8", "ingest", "--changelog", log_dir, "--table", table,
        "--checkpoints", ckpt, "--end-lsn", "1000", "--batch-size", "300",
    ]) == 0
    # resume: everything already applied -> zero new rows
    assert main([
        "--cpus", "8", "ingest", "--changelog", log_dir, "--table", table,
        "--checkpoints", ckpt, "--end-lsn", "1000", "--batch-size", "300",
    ]) == 0
    assert main(["--cpus", "8", "show", "--table", table, "--checkpoints", ckpt]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    created, first, resumed, shown = (json.loads(x) for x in out[-4:])
    assert created["merge_mode"] == "mor"
    assert first["rows_applied"] > 0
    assert resumed["rows_applied"] == 0
    assert shown["rows"] > 0 and shown["resume_lsn"] == 1000

    assert main(["--cpus", "8", "compact", "--table", table]) == 0
