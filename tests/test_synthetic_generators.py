"""Shape/dtype smoke tests for the synthetic generators.

Port of the reference suite (tests/test_synthetic_generators.py:1-41),
parameterized over jax backends instead of torch devices.
"""

import numpy as np
import jax.numpy as jnp

from flooder_tpu import (
    generate_annulus_points_2d,
    generate_figure_eight_points_2d,
    generate_noisy_torus_points_3d,
    generate_swiss_cheese_points,
)


def test_figure_eight():
    pts = generate_figure_eight_points_2d(1234, seed=42)
    assert pts.shape == (1234, 2)
    assert pts.dtype == jnp.float32
    # seed reproducibility
    pts2 = generate_figure_eight_points_2d(1234, seed=42)
    assert np.allclose(np.asarray(pts), np.asarray(pts2))


def test_figure_eight_noise():
    for kind in ("gaussian", "uniform"):
        pts = generate_figure_eight_points_2d(
            100, noise_std=0.1, noise_kind=kind, seed=1
        )
        assert pts.shape == (100, 2)


def test_annulus():
    pts = generate_annulus_points_2d(500, radius=1.0, width=0.3, seed=42)
    assert pts.shape == (500, 2)
    assert pts.dtype == jnp.float32
    r = np.linalg.norm(np.asarray(pts), axis=1)
    assert (r <= 1.0 + 1e-5).all() and (r >= 0.7 - 1e-5).all()


def test_torus():
    pts = generate_noisy_torus_points_3d(777, seed=42)
    assert pts.shape == (777, 3)
    assert pts.dtype == jnp.float32


def test_swiss_cheese():
    pts, centres, radii = generate_swiss_cheese_points(
        2000, k=4, seed=42, device="cpu"
    )
    assert pts.shape == (2000, 3)
    assert pts.dtype == jnp.float32
    assert centres.shape == (4, 3)
    assert radii.shape == (4,)
    # no point inside a void
    p = np.asarray(pts)
    c = np.asarray(centres)
    r = np.asarray(radii)
    for j in range(4):
        d = np.linalg.norm(p - c[j], axis=1)
        assert (d >= r[j] - 1e-5).all()


def test_swiss_cheese_high_dim():
    pts, centres, radii = generate_swiss_cheese_points(
        500,
        rect_min=(0.0,) * 4,
        rect_max=(1.0,) * 4,
        k=2,
        seed=7,
    )
    assert pts.shape == (500, 4)
