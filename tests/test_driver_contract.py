"""Contract tests for the driver-facing entry points.

The round driver consumes exactly two surfaces: bench.py's single stdout
JSON line and __graft_entry__'s (entry, dryrun_multichip) pair. Nothing
else pins their shapes, so a formatting regression would only surface in
a wasted hardware run.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_line_contract():
    env = dict(os.environ, JAX_PLATFORMS="cpu", FLOODER_BENCH_REPS="1")
    env.pop("_FLOODER_DRYRUN_CHILD", None)
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--points", "2000",
            "--landmarks", "40",
        ],
        capture_output=True,
        text=True,
        timeout=480,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 0, res.stderr
    lines = [ln for ln in res.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got {lines}"
    j = json.loads(lines[0])
    assert set(j) == {"metric", "value", "unit", "vs_baseline", "backend"}
    assert j["unit"] == "s"
    assert j["value"] > 0
    assert j["backend"] == "cpu"
    # non-headline config: no 1.4 s H100 reference exists, ratio is null
    assert j["metric"] == "flood_build_plus_ph_seconds_2000pts_40lms_3d"
    assert j["vs_baseline"] is None


def test_graft_entry_surface():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
    finally:
        sys.path.remove(REPO)
    fn, args = __graft_entry__.entry()
    assert callable(fn)
    assert isinstance(args, tuple)
    assert callable(__graft_entry__.dryrun_multichip)
