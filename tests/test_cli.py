"""CLI end-to-end tests (reference cli.py surface)."""

import json
import pickle
import subprocess
import sys

import numpy as np
import pytest

from flooder_tpu.cli import (
    device_type,
    effective_max_dim,
    load_point_cloud,
    resolve_simplex_representation,
)


def test_device_type_validation():
    import argparse

    assert device_type("cpu") == "cpu"
    assert device_type("tpu:0") == "tpu:0"
    with pytest.raises(argparse.ArgumentTypeError):
        device_type("cuda:0")
    with pytest.raises(argparse.ArgumentTypeError):
        device_type("gpu7")


def test_effective_max_dim():
    assert effective_max_dim(None, 3) == 3
    assert effective_max_dim(2, 3) == 2
    with pytest.raises(ValueError):
        effective_max_dim(0, 3)
    with pytest.raises(ValueError):
        effective_max_dim(4, 3)


def test_resolve_simplex_representation():
    assert resolve_simplex_representation(None, None) == (30, None)
    assert resolve_simplex_representation(10, None) == (10, None)
    assert resolve_simplex_representation(None, 99) == (None, 99)


def test_load_point_cloud(tmp_path):
    p = tmp_path / "cloud.npy"
    np.save(p, np.random.default_rng(0).random((100, 3)))
    arr, n, d = load_point_cloud(p)
    assert (n, d) == (100, 3) and arr.dtype == np.float32
    with pytest.raises(FileNotFoundError):
        load_point_cloud(tmp_path / "missing.npy")
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((2, 2, 2)))
    with pytest.raises(ValueError):
        load_point_cloud(bad)


def test_cli_end_to_end(tmp_path):
    cloud = tmp_path / "cloud.npy"
    rng = np.random.default_rng(42)
    theta = rng.uniform(0, 2 * np.pi, 600)
    pts = np.stack([np.cos(theta), np.sin(theta)], 1)
    pts += rng.normal(0, 0.05, pts.shape)
    np.save(cloud, pts.astype(np.float32))

    out = tmp_path / "out.pkl"
    stats = tmp_path / "stats.json"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "flooder_tpu.cli",
            "--input-file",
            str(cloud),
            "--output-file",
            str(out),
            "--stats-json",
            str(stats),
            "--num-landmarks",
            "100",
            "--points-per-edge",
            "8",
            "--device",
            "cpu",
            "--batch-size",
            "32",
        ],
        capture_output=True,
        text=True,
        timeout=500,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert res.returncode == 0, res.stderr[-2000:]
    payload = pickle.loads(out.read_bytes())
    assert set(payload) == {"diagrams", "meta"}
    assert len(payload["diagrams"]) == 2
    # the circle should show one dominant H1 bar
    d1 = payload["diagrams"][1]
    pers = d1[:, 1] - d1[:, 0]
    assert (pers > 0.3).sum() == 1
    assert payload["meta"]["n_points"] == 600
    steps = json.loads(stats.read_text())
    assert [s["name"] for s in steps] == ["Loading", "Flood complex", "Persistence"]


def test_cli_trace_dir(tmp_path):
    """--trace-dir wraps the Flood step in a jax.profiler trace and
    leaves a non-empty trace directory (phase 4 of the hardware session
    relies on this path)."""
    cloud = tmp_path / "cloud.npy"
    rng = np.random.default_rng(0)
    np.save(cloud, rng.uniform(size=(400, 2)).astype(np.float32))
    trace = tmp_path / "trace"
    res = subprocess.run(
        [
            sys.executable, "-m", "flooder_tpu.cli",
            "--input-file", str(cloud),
            "--num-landmarks", "32",
            "--points-per-edge", "4",
            "--device", "cpu",
            "--trace-dir", str(trace),
        ],
        capture_output=True,
        text=True,
        timeout=500,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert trace.is_dir() and any(trace.rglob("*"))
