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


def _assert_same_greedy_selection(pts, a, b, start):
    """Both index sequences must realize the same exact greedy FPS run:
    identical start, identical per-step farthest distances, and (absent
    exact distance ties) the identical landmark set. The Pallas kernel
    walks the cloud in Hilbert order, so on an exact tie it may pick a
    different (equally farthest) point than the XLA loop."""
    p = np.asarray(pts, dtype=np.float64)
    assert a[0] == b[0] == start
    assert len(set(a.tolist())) == len(a)
    m_a = np.full(len(p), np.inf)
    m_b = np.full(len(p), np.inf)
    for ia, ib in zip(a, b):
        da, db = m_a[ia], m_b[ib]
        assert da == db or abs(da - db) < 1e-6 * max(da, db)
        m_a = np.minimum(m_a, ((p - p[ia]) ** 2).sum(-1))
        m_b = np.minimum(m_b, ((p - p[ib]) ** 2).sum(-1))


@pytest.mark.parametrize("n,n_lms", [(500, 16), (9000, 128)])
def test_pallas_fps_interpret_matches_xla(n, n_lms):
    """The fused FPS kernel (Hilbert sort + chunk-skip sweeps) must
    realize the exact greedy selection on every backend — here in the
    Pallas interpreter so CI covers the kernel without TPU hardware."""
    from flooder_tpu.ops.fps import farthest_point_sampling
    from flooder_tpu.ops.pallas_fps import pallas_farthest_point_sampling

    pts = generate_noisy_torus_points_3d(n, seed=4)
    a = np.asarray(farthest_point_sampling(pts, n_lms, 7))
    b = np.asarray(
        pallas_farthest_point_sampling(pts, n_lms, 7, interpret=True)
    )
    _assert_same_greedy_selection(pts, a, b, 7)


def test_fps_volume_replay_matches_kernel():
    """The admission-replay model (tools/fps_volume.py) must select the
    same greedy set as the fused kernel — otherwise its chunk-visit
    counts do not price the kernel's actual work."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.fps_volume import replay
    from flooder_tpu.ops.pallas_fps import pallas_farthest_point_sampling
    from flooder_tpu.ops.pallas_flood import hilbert_codes_np

    pts = generate_noisy_torus_points_3d(9000, seed=4)
    p = np.asarray(pts, np.float32)
    bits = max(1, min(10, 24 // p.shape[1]))
    order = np.argsort(
        hilbert_codes_np(p.astype(np.float64), bits), kind="stable"
    )
    start_sorted = int(np.nonzero(order == 7)[0][0])
    sel_sorted, admitted, _ = replay(p[order], 128, start_sorted)
    a = order[sel_sorted]
    b = np.asarray(pallas_farthest_point_sampling(pts, 128, 7, interpret=True))
    _assert_same_greedy_selection(p, a, b, 7)
    # the first sweep folds the start landmark into every chunk
    assert admitted[0] == -(-len(p) // 8192)


def test_pallas_fps_matches_xla_on_tpu():
    """Same check on real TPU hardware (skips on CPU-only CI)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("requires TPU")
    from flooder_tpu.ops.fps import farthest_point_sampling
    from flooder_tpu.ops.pallas_fps import pallas_farthest_point_sampling

    pts = generate_noisy_torus_points_3d(50000, seed=4, device="tpu")
    a = np.asarray(farthest_point_sampling(pts, 300, 0))
    b = np.asarray(pallas_farthest_point_sampling(pts, 300, 0))
    _assert_same_greedy_selection(pts, a, b, 0)
