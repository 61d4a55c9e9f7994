"""Regression tests for tools/ CLI parsing.

Round-5 verdict #3: ``tools/selfcheck.py --workers 8`` (the space form the
module docstring advertises) crashed with ``int('')``.  Pin both forms.
"""

import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)

from selfcheck import parse_cli  # noqa: E402


def test_workers_space_form():
    cli = parse_cli(["--hostile", "--workers", "8", "/root/testdata/sf0.01"])
    assert cli["workers"] == 8
    assert cli["hostile"] is True
    assert cli["rest"] == ["/root/testdata/sf0.01"]


def test_workers_equals_form():
    cli = parse_cli(["--workers=4", "sfdir", "q01_pricing_summary"])
    assert cli["workers"] == 4
    assert cli["rest"] == ["sfdir", "q01_pricing_summary"]


def test_spark_threads_both_forms():
    assert parse_cli(["--spark-threads", "4"])["n_threads"] == 4
    assert parse_cli(["--spark-threads=8"])["n_threads"] == 8


def test_defaults_and_flags():
    cli = parse_cli([])
    assert cli == {
        "hostile": False,
        "json_out": False,
        "use_cache": True,
        "workers": 1,
        "n_threads": 16,
        "rest": [],
    }
    assert parse_cli(["--no-cache"])["use_cache"] is False
    assert parse_cli(["--json"])["json_out"] is True


def test_query_names_pass_through():
    cli = parse_cli(["--workers", "2", "dir", "qA", "qB"])
    assert cli["rest"] == ["dir", "qA", "qB"]


def test_check_scaling_breach_detection(tmp_path):
    """The scaling budget gate must exit nonzero on a breached exponent
    and on a missing budgeted probe, and zero when all are in budget."""
    import json
    import subprocess

    from check_scaling import BUDGETS

    def run(queries):
        f = tmp_path / "probe.json"
        f.write_text(json.dumps({"queries": queries}) + "\n")
        return subprocess.run(
            ["python", os.path.join(TOOLS, "check_scaling.py"), str(f)],
            capture_output=True,
            text=True,
        )

    ok_row = {"time_exponent": 0.9, "t_a_sec": 1, "t_b_sec": 8,
              "rows_a": 10, "rows_b": 100}
    good = {name: dict(ok_row) for name in BUDGETS}
    assert run(good).returncode == 0

    bad = {name: dict(ok_row) for name in BUDGETS}
    bad["q27_minhash_near_dups"] = dict(ok_row, time_exponent=1.9)
    r = run(bad)
    assert r.returncode != 0 and "BREACH" in r.stdout

    missing = dict(good)
    del missing["q349_ngram_novelty"]
    r = run(missing)
    assert r.returncode != 0 and "MISSING" in r.stdout
