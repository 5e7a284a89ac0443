"""The shared CPU-forcing guard (flooder_tpu/_platform.py).

Every CPU-targeted entry point routes through force_cpu_if_requested;
these pin its env parsing in-process and the end-to-end effect in a
subprocess (the config-level update must win over the environment's
accelerator registration)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_env_parsing(monkeypatch):
    from flooder_tpu._platform import force_cpu_if_requested

    # no request -> no forcing (must not touch jax config)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert force_cpu_if_requested() is False
    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    assert force_cpu_if_requested() is False
    # whitespace/case variants all force (uniform semantics across
    # entry points was the point of centralizing the guard)
    for val in ["cpu", "cpu ", " CPU", "Cpu"]:
        monkeypatch.setenv("JAX_PLATFORMS", val)
        assert force_cpu_if_requested() is True


def test_subprocess_backend_is_cpu():
    env = dict(os.environ, JAX_PLATFORMS="cpu ")
    env.pop("_FLOODER_DRYRUN_CHILD", None)
    res = subprocess.run(
        [
            sys.executable,
            "-c",
            "from flooder_tpu._platform import force_cpu_if_requested;"
            "force_cpu_if_requested();"
            "import jax; print(jax.default_backend())",
        ],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip().splitlines()[-1] == "cpu"
