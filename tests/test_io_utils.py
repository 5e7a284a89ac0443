"""Tests for io.save_to_disk and the StepTimer (reference io.py:14-57,
cli.py:41-137)."""

import pickle
import time

import jax.numpy as jnp
import numpy as np
import pytest

from flooder_tpu import save_to_disk
from flooder_tpu.utils import StepTimer


def test_save_refuses_overwrite(tmp_path):
    p = tmp_path / "obj.pkl"
    save_to_disk({"a": 1}, p)
    with pytest.raises(FileExistsError):
        save_to_disk({"a": 2}, p)
    save_to_disk({"a": 3}, p, overwrite=True)
    data = pickle.loads(p.read_bytes())
    assert data["a"] == 3


def test_save_metadata_injection(tmp_path):
    p = tmp_path / "obj.pkl"
    save_to_disk({"x": 1, "y": 2}, p)
    data = pickle.loads(p.read_bytes())
    assert set(data["_meta"]["keys"]) == {"x", "y"}
    assert "timestamp" in data["_meta"]

    p2 = tmp_path / "obj2.pkl"
    save_to_disk({"x": 1}, p2, metadata=False)
    assert "_meta" not in pickle.loads(p2.read_bytes())

    # existing _meta is preserved (setdefault semantics)
    p3 = tmp_path / "obj3.pkl"
    save_to_disk({"_meta": "mine"}, p3)
    assert pickle.loads(p3.read_bytes())["_meta"] == "mine"


def test_save_converts_jax_arrays(tmp_path):
    p = tmp_path / "arr.pkl"
    save_to_disk({"arr": jnp.ones((3, 2)), "nested": [jnp.zeros(2)]}, p)
    data = pickle.loads(p.read_bytes())
    assert isinstance(data["arr"], np.ndarray)
    assert isinstance(data["nested"][0], np.ndarray)


def test_save_non_dict(tmp_path):
    p = tmp_path / "arr2.pkl"
    save_to_disk(jnp.arange(5), p)
    assert pickle.loads(p.read_bytes()).tolist() == [0, 1, 2, 3, 4]


def test_step_timer():
    import jax

    with StepTimer("work", jax.devices("cpu")[0]) as t:
        time.sleep(0.05)
    assert t.stats.name == "work"
    assert t.stats.wall_s >= 0.05
    assert t.stats.cpu_s >= 0.0
    assert t.stats.device_kind == "cpu"


def test_step_timer_no_device():
    with StepTimer("plain") as t:
        pass
    assert t.stats.device_peak_mib is None
