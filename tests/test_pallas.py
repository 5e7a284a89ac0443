"""Pallas-engine parity tests (interpret mode on CPU).

The role of the reference's test_triton (tests/test_flooder.py:78-116):
the fused kernel path must agree with the portable dense path. On CPU the
kernel runs in the Pallas interpreter; on TPU hardware the same tests
exercise the compiled kernel.
"""

import numpy as np
import pytest

from flooder_tpu import (
    flood_complex,
    generate_landmarks,
    generate_noisy_torus_points_3d,
)
from flooder_tpu.ops.pallas_flood import morton_codes


@pytest.mark.parametrize("num_landmarks", [20, 150])
@pytest.mark.parametrize("use_rand", [True, False])
def test_pallas_vs_dense(num_landmarks, use_rand):
    kwargs = (
        {"num_rand": 256, "points_per_edge": None}
        if use_rand
        else {"num_rand": None, "points_per_edge": 10}
    )
    X = generate_noisy_torus_points_3d(1500, seed=42)
    L = generate_landmarks(X, num_landmarks, start_idx=0)

    np.random.seed(42)
    fc_dense = flood_complex(X, L, use_pallas=False, **kwargs)
    np.random.seed(42)
    fc_pallas = flood_complex(X, L, use_pallas=True, **kwargs)

    assert set(fc_dense) == set(fc_pallas)
    for simplex, val in fc_dense.items():
        got = fc_pallas[simplex]
        if np.isinf(val):
            assert np.isinf(got)
        else:
            # reference tolerance for kernel-vs-naive parity is 1e-4
            # (tests/test_flooder.py:114); the fused kernel shares the
            # difference-form numerics so agreement is much tighter
            assert abs(got - val) < 1e-5, f"{simplex}: {got} vs {val}"


def test_pallas_2d():
    from flooder_tpu import generate_figure_eight_points_2d

    X = generate_figure_eight_points_2d(800, seed=1)
    L = generate_landmarks(X, 120, start_idx=0)
    fc_dense = flood_complex(X, L, points_per_edge=12, use_pallas=False)
    fc_pallas = flood_complex(X, L, points_per_edge=12, use_pallas=True)
    for simplex, val in fc_dense.items():
        assert fc_pallas[simplex] == pytest.approx(val, abs=1e-5)


def test_pallas_tight_prune_lossless():
    """With landmarks ⊆ witnesses, the tile upper-bound pruning must not
    change any filtration value (it provably keeps the ball-argmin)."""
    X = generate_noisy_torus_points_3d(2000, seed=9)
    L = generate_landmarks(X, 120, start_idx=0)
    fc_dense = flood_complex(X, L, points_per_edge=10, use_pallas=False)
    fc_tight = flood_complex(
        X, L, points_per_edge=10, use_pallas=True, landmarks_in_cloud=True
    )
    for s, v in fc_dense.items():
        assert fc_tight[s] == pytest.approx(v, abs=1e-5, nan_ok=True)


def test_pallas_rejects_float64():
    X = np.random.default_rng(0).random((100, 3))
    with pytest.raises(TypeError):
        flood_complex(X.astype(np.float64), 20, use_pallas=True, points_per_edge=5)


def test_morton_codes_locality():
    rng = np.random.default_rng(0)
    pts = rng.random((4096, 3)).astype(np.float32)
    codes = np.asarray(morton_codes(pts, 8))
    order = np.argsort(codes)
    sorted_pts = pts[order]
    # consecutive chunks of the Morton order are spatially tight: average
    # chunk bbox diagonal must be far below the cloud diagonal
    chunks = sorted_pts.reshape(32, 128, 3)
    diag = np.linalg.norm(chunks.max(1) - chunks.min(1), axis=1)
    assert diag.mean() < 0.5 * np.sqrt(3)




def test_select_pad_pair_reseed_safety():
    """Segment-padding pairs must come from FULLY-inactive blocks: a pad
    from a merely-inactive entry of a live block is a non-consecutive
    revisit whose first-visit reseed races the block's earlier write-back
    within one launch (advisor r3, high)."""
    from flooder_tpu.ops.pallas_flood import select_pad_pair

    # one fully-inactive row (row 2) among live rows
    active = np.array(
        [[True, False], [False, True], [False, False]], dtype=bool
    )
    dist = np.array([[0.1, 9.0], [5.0, 0.2], [3.0, 7.0]])
    pair = select_pad_pair(active, dist)
    assert pair == (2, 1)  # farthest chunk of the inactive row
    assert not active[pair[0]].any()

    # inactive ENTRIES exist but every block is live → must refuse
    # (the advisor's regression case), even though (0,1)/(1,0) are free
    live = np.array([[True, False], [False, True]], dtype=bool)
    assert select_pad_pair(live, dist[:2]) is None

    # no dist given → chunk 0 of the inactive block
    assert select_pad_pair(active) == (2, 0)


def test_packed_admission_encodings_agree():
    """The u8/f16 packed admission encodings must recover the EXACT
    active set of the legacy (bool, f32) pair and preserve each block's
    nearest-first chunk order up to their quantization step (the packed
    values feed only the visit ORDER, never the distances themselves)."""
    import jax
    import jax.numpy as jnp

    from flooder_tpu.ops import pallas_flood as pf

    rng = np.random.default_rng(7)
    X = (rng.random((16384, 3)) * 5).astype(np.float32)
    eng = pf.PallasFloodEngine(jnp.asarray(X), pf.WCHUNK)

    S = pf.BS * 8
    centers = (rng.random((S, 3)) * 5).astype(np.float32)
    radii = (rng.random(S) * 1.5 + 0.1).astype(np.float32)
    k = 4
    verts = (
        centers[:, None, :]
        + (rng.random((S, k, 3)).astype(np.float32) - 0.5) * 0.3
    )
    w = rng.random((40, k)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    rt, nr, r2_total = pf._tile_geometry(len(w))
    weights_p, _ = pf._prepare_sample_weights(w, r2_total)
    args = (
        jnp.asarray(verts - centers[:, None, :]), weights_p,
        jnp.asarray(centers), jnp.asarray(radii),
        eng.chunk_lo, eng.chunk_hi,
    )
    out = {}
    for mode in ("f32", "f16", "u8"):
        *_, adm = pf._prep(
            *args, bs=pf.BS, nr=nr, rt=rt, tight=False,
            wchunk=eng.wchunk, pack=mode,
        )
        out[mode] = pf.unpack_admission(jax.device_get(adm))

    active, d2 = out["f32"]
    assert active.any() and not active.all()
    for mode in ("f16", "u8"):
        a_m, key_m = out[mode]
        np.testing.assert_array_equal(a_m, active)
        for b in range(active.shape[0]):
            idx = np.nonzero(active[b])[0]
            if len(idx) < 2:
                continue
            order = idx[np.argsort(key_m[b, idx], kind="stable")]
            true = d2[b, order]
            if mode == "u8":
                step = (true.max() - true.min()) / 254.0
            else:  # f16: relative rounding of the normalized value
                step = 2e-3 * max(true.max(), 1e-30)
            # sorted-by-packed-key must be non-decreasing in true
            # distance up to one quantization step
            assert np.all(np.diff(true) >= -step * 1.01), (mode, b)


def test_kd_order_rolled_matches_unrolled_reference():
    """The fori_loop kd ordering must reproduce the unrolled per-level
    argsort EXACTLY (the permutation is the hardware-swept witness
    ordering; any drift silently changes the measured kernel perf
    characteristics). The reference implementation here is the pre-roll
    formulation (one Python level loop, per-segment stable argsort)."""
    import functools

    import jax
    import jax.numpy as jnp

    from flooder_tpu.ops.pallas_flood import kd_order_device

    @functools.partial(jax.jit, static_argnames=("leaf",))
    def kd_order_unrolled(points, leaf):
        n, dim = points.shape
        levels = max(0, (n // leaf - 1).bit_length())
        order = jnp.arange(n, dtype=jnp.int32)
        pts = points
        for lvl in range(levels):
            nseg = 1 << lvl
            m = n // nseg
            seg = pts.reshape(nseg, m, dim)
            ext = jnp.max(seg, axis=1) - jnp.min(seg, axis=1)
            ax = jnp.argmax(ext, axis=1)
            keys = jnp.take_along_axis(
                seg, ax[:, None, None].astype(jnp.int32), axis=2
            )[:, :, 0]
            idx = jnp.argsort(keys, axis=1)
            pts = jnp.take_along_axis(
                seg, idx[:, :, None], axis=1
            ).reshape(n, dim)
            order = jnp.take_along_axis(
                order.reshape(nseg, m), idx, axis=1
            ).reshape(n)
        return order

    rng = np.random.default_rng(7)
    for n, leaf, dim in [
        (512, 512, 3),   # levels == 0 (identity)
        (4096, 512, 3),
        (8192, 512, 2),
        (4096, 512, 5),
        (2048, 256, 1),
    ]:
        pts = jnp.asarray(rng.uniform(0, 5, (n, dim)).astype(np.float32))
        got = np.asarray(kd_order_device(pts, leaf))
        want = np.asarray(kd_order_unrolled(pts, leaf))
        assert (got == want).all(), (n, leaf, dim)
        # the host fallback (small clouds skip the device compile) must
        # produce the same permutation again
        from flooder_tpu.ops.pallas_flood import kd_order_np

        host = kd_order_np(np.asarray(pts), leaf)
        assert (host == want).all(), (n, leaf, dim, "host")
        # cyclic-padding shape: duplicate rows (ties) must break the same
        dup = jnp.concatenate([pts[: n // 2], pts[: n // 2]])
        assert (
            np.asarray(kd_order_device(dup, leaf))
            == np.asarray(kd_order_unrolled(dup, leaf))
        ).all(), (n, leaf, dim, "dup")
        assert (
            kd_order_np(np.asarray(dup), leaf)
            == np.asarray(kd_order_unrolled(dup, leaf))
        ).all(), (n, leaf, dim, "host-dup")

    # Non-power-of-two leaf counts (a non-pow2 witness mesh axis yields
    # nl = 4 * n_ws * n_chunks_l): the rolled device program's segment
    # arithmetic requires pow2 nl, so the router must send these to the
    # host twin — which must still match the original unrolled recursion.
    from flooder_tpu.ops.pallas_flood import KD_HOST_MAX, use_host_kd

    for nl in (3, 6, 12):
        n, leaf, dim = nl * 512, 512, 3
        assert use_host_kd(n, leaf)
        pts = jnp.asarray(rng.uniform(0, 5, (n, dim)).astype(np.float32))
        assert (
            kd_order_np(np.asarray(pts), leaf)
            == np.asarray(kd_order_unrolled(pts, leaf))
        ).all(), (nl, "host-nonpow2")
    # large pow2 leaf counts stay on device
    assert not use_host_kd(2 * KD_HOST_MAX, 512)


def test_engine_cache_same_cloud_hit_and_eviction():
    """Repeat flood_complex calls on the SAME points object must reuse
    the engine (skipping the witness re-ordering); a different array —
    even with equal values — must miss; dead referents must be evicted
    so cached engines don't pin device memory for collected clouds."""
    from flooder_tpu import core as core_mod

    core_mod._ENGINE_CACHE.clear()
    X = generate_noisy_torus_points_3d(1200, seed=3)
    L = generate_landmarks(X, 30, start_idx=0)

    out1 = flood_complex(X, L, points_per_edge=6)
    assert len(core_mod._ENGINE_CACHE) == 1
    eng1 = core_mod._ENGINE_CACHE[0][2]
    out2 = flood_complex(X, L, points_per_edge=6)
    assert core_mod._ENGINE_CACHE[-1][2] is eng1  # hit, no rebuild
    assert out1.keys() == out2.keys()
    for s in out1:
        assert out1[s] == out2[s]

    # equal values, different object → miss (identity keying)
    Y = X + 0
    flood_complex(Y, L, points_per_edge=6)
    engines = [e[2] for e in core_mod._ENGINE_CACHE]
    assert len(engines) == 2 and engines[0] is eng1

    # capacity bound + dead-referent eviction
    del Y
    Z = generate_noisy_torus_points_3d(1100, seed=4)
    flood_complex(Z, generate_landmarks(Z, 25, start_idx=0),
                  points_per_edge=6)
    assert len(core_mod._ENGINE_CACHE) <= core_mod._ENGINE_CACHE_CAP
    assert all(e[0]() is not None for e in core_mod._ENGINE_CACHE)
    core_mod._ENGINE_CACHE.clear()
