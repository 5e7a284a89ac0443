"""FPS landmark tests (port of reference tests/test_landmarks.py:11-24,
plus coverage properties of the exact greedy FPS)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flooder_tpu import generate_landmarks, generate_noisy_torus_points_3d


@pytest.mark.parametrize("n_lms", [64, 256, 1024])
def test_landmark_shapes(n_lms):
    pts = generate_noisy_torus_points_3d(5000, seed=42)
    lms = generate_landmarks(pts, n_lms, start_idx=0)
    assert lms.shape == (n_lms, 3)
    assert lms.dtype == jnp.float32


def test_landmarks_are_input_points():
    pts = generate_noisy_torus_points_3d(2000, seed=1)
    lms = generate_landmarks(pts, 100, start_idx=0)
    p = np.asarray(pts)
    for lm in np.asarray(lms):
        d = np.abs(p - lm).max(axis=1)
        assert d.min() == 0.0


def test_landmarks_distinct_and_spread():
    pts = generate_noisy_torus_points_3d(3000, seed=2)
    lms = np.asarray(generate_landmarks(pts, 200, start_idx=0))
    # all distinct
    assert len(np.unique(lms, axis=0)) == 200
    # greedy FPS covers: every point within a reasonable radius of a landmark
    p = np.asarray(pts)
    d = np.sqrt(
        ((p[:, None, :] - lms[None, :200:4, :]) ** 2).sum(-1)
    ).min(1)
    assert d.max() < 2.0  # torus diameter is ~8; 50 landmarks cover well


def test_landmark_count_clamped():
    pts = generate_noisy_torus_points_3d(50, seed=3)
    lms = generate_landmarks(pts, 100, start_idx=0)
    assert lms.shape == (50, 3)


def test_landmark_invalid_count():
    pts = generate_noisy_torus_points_3d(50, seed=3)
    with pytest.raises(RuntimeError):
        generate_landmarks(pts, 0)


def test_pallas_fps_matches_xla_on_tpu():
    """The fused on-chip FPS must select exactly the XLA loop's indices
    (runs only when a TPU is attached; tests default to CPU)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("requires TPU")
    from flooder_tpu.ops.fps import farthest_point_sampling
    from flooder_tpu.ops.pallas_fps import pallas_farthest_point_sampling

    pts = generate_noisy_torus_points_3d(50000, seed=4, device="tpu")
    a = np.asarray(farthest_point_sampling(pts, 300, 0))
    b = np.asarray(pallas_farthest_point_sampling(pts, 300, 0))
    assert (a == b).all()
