"""CLI entry-point smoke: full incremental run over the bronze fixtures."""

from __future__ import annotations

import json

import fixtures_f1 as fx
from f1_datalakehouse_pipeline_spark.cli import main


def test_cli_run_incremental(tmp_path, capsys, spark):
    bronze = str(tmp_path / "bronze")
    wh = str(tmp_path / "wh")
    fx.generate_bronze(bronze)

    # historical bootstrap then incremental with auto-detection
    rc = main(
        ["bronze-to-silver", "--bronze", bronze, "--warehouse", wh,
         "--mode", "HISTORICAL", "--year", str(fx.YEAR)]
    )
    assert rc == 0
    rc = main(
        ["run-incremental", "--bronze", bronze, "--warehouse", wh,
         "--year", str(fx.YEAR)]
    )
    out_lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("[")]
    assert rc == 0
    reports = json.loads(out_lines[-1])
    assert reports[0]["grand_prix"] == "italian"  # auto-detected, ≙ XCom handoff
    assert all(v == "ok" for r in reports for v in r["results"].values())
