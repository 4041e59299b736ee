"""CLI front door (`python -m oaim_sandbox_spark`): inventory, SQL dumps and
an end-to-end `run` in a subprocess (own SparkSession, so the shared test
session is untouched)."""

import subprocess
import sys

from oaim_sandbox_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "oracle-backed" in out


def test_cli_oracle_and_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "lineitem" in capsys.readouterr().out.lower()
    assert main(["sql", "q1_pricing_summary"]) == 0
    assert "l_returnflag" in capsys.readouterr().out.lower()
    assert main(["oracle", "nope_not_a_query"]) == 1


def test_cli_macros(capsys):
    assert main(["macros"]) == 0
    out = capsys.readouterr().out
    assert "minhash16" in out and "cosine_distance" in out


def test_cli_run_subprocess():
    r = subprocess.run(
        [sys.executable, "-m", "oaim_sandbox_spark", "run", "q1_pricing_summary",
         "--limit", "3", "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rows" in r.stdout
