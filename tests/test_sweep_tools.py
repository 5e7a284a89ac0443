"""The phase-3 sweep decision plumbing (tools/sweep_decide.py).

phase4 runs the entire hardware budget under winner_env's output, so its
parsing must survive exactly the messes an append-across-reruns JSONL
accumulates: truncated lines, null values, rows from older commits.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.sweep_decide import _head_sha, _read_rows, winner_env  # noqa: E402


def _write(tmp_path, rows, extra_lines=()):
    p = tmp_path / "sweep.jsonl"
    lines = [json.dumps(r) for r in rows] + list(extra_lines)
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_rows_lenient(tmp_path):
    sha = _head_sha()
    p = _write(
        tmp_path,
        [
            {"value": 1.5, "env": "", "sha": sha},
            {"value": None, "env": "X=1", "sha": sha},  # null value
            {"value": "fast", "env": "Y=1", "sha": sha},  # non-numeric
        ],
        extra_lines=['{"value": 1.2, "env": "TRUNC', "not json at all"],
    )
    rows = _read_rows(p)
    assert [r["value"] for r in rows] == [1.5]


def test_winner_env_picks_current_sha_minimum(tmp_path):
    sha = _head_sha()
    p = _write(
        tmp_path,
        [
            {"value": 1.8, "env": "", "sha": sha},
            {"value": 1.2, "env": "FLOODER_PALLAS_PHASES=2", "sha": sha},
            # stale faster row must NOT win
            {"value": 0.4, "env": "FLOODER_WITNESS_ORDER=kd", "sha": "dead"},
            # rerun of the same combo keeps the better time
            {"value": 1.1, "env": "FLOODER_PALLAS_PHASES=2", "sha": sha},
        ],
    )
    assert winner_env(p) == "FLOODER_PALLAS_PHASES=2"


def test_winner_env_default_and_missing(tmp_path):
    sha = _head_sha()
    p = _write(tmp_path, [{"value": 1.0, "env": "", "sha": sha}])
    assert winner_env(p) == ""
    assert winner_env(str(tmp_path / "nope.jsonl")) == ""
    stale_only = _write(
        tmp_path, [{"value": 0.5, "env": "X=1", "sha": "dead"}]
    )
    assert winner_env(stale_only) == ""


def test_cli_winner_env_mode(tmp_path):
    sha = _head_sha()
    p = _write(
        tmp_path,
        [
            {"value": 2.0, "env": "", "sha": sha},
            {"value": 1.0, "env": "A=1 B=2", "sha": sha},
        ],
    )
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "sweep_decide.py"),
         "--winner-env", p],
        capture_output=True, text=True, timeout=60, cwd=REPO,
    )
    assert res.returncode == 0
    assert res.stdout.strip() == "A=1 B=2"


def test_decision_rules(tmp_path, capsys):
    """Every flag (kd included, per the round-4 verdict) needs a strict
    win to ship; stale rows are discarded loudly."""
    from tools.sweep_decide import main

    sha = _head_sha()
    p = _write(
        tmp_path,
        [
            {"value": 1.50, "env": "", "sha": sha, "vs_baseline": 1.07},
            {"value": 1.46, "env": "FLOODER_WITNESS_ORDER=kd", "sha": sha,
             "vs_baseline": 1.04},
            {"value": 1.50, "env": "FLOODER_PALLAS_MXU=1", "sha": sha,
             "vs_baseline": 1.07},
            {"value": 0.2, "env": "FLOODER_PALLAS_MXU=1", "sha": "old"},
        ],
    )
    main(p)
    out = capsys.readouterr()
    # a sub-0.1s margin now adopts (strict win is enough)
    assert "FLOODER_WITNESS_ORDER=kd     +0.0400 s  -> ADOPT" in out.out
    # MXU's margin is against best-without (the kd row), so it must lose;
    # match the margin line specifically (the ranking table also contains
    # the flag string)
    mxu_line = next(
        ln for ln in out.out.splitlines()
        if "FLOODER_PALLAS_MXU=1" in ln and "->" in ln
    )
    assert mxu_line.rstrip().endswith("DELETE")
    assert "discarded 1 sweep row" in out.err
