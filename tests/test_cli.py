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


def test_cli_serve_subprocess():
    """`serve` binds, answers the no-auth probes, enforces auth, and dies
    cleanly."""
    import json
    import signal
    import time
    import urllib.error
    import urllib.request

    proc = subprocess.Popen(
        [sys.executable, "-m", "oaim_sandbox_spark", "serve", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd="/root/repo",
    )
    try:
        line = proc.stdout.readline()
        assert "listening on" in line, line
        base = line.split("listening on ", 1)[1].split()[0]
        deadline = time.time() + 10
        while True:
            try:
                with urllib.request.urlopen(f"{base}/v1/liveness", timeout=2) as r:
                    assert json.load(r) == {"status": "alive"}
                break
            except urllib.error.URLError:
                assert time.time() < deadline
                time.sleep(0.2)
        try:
            urllib.request.urlopen(f"{base}/v1/models", timeout=2)
            raise AssertionError("unauthenticated /v1/models must not return 200")
        except urllib.error.HTTPError as e:
            assert e.code in (401, 403)
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
