"""Mosaic TPU lowering checks that run WITHOUT TPU hardware.

Interpret-mode parity tests (test_pallas.py, test_landmarks.py) execute
kernel *semantics* but never run the Pallas->Mosaic pipeline, so a kernel
can pass the whole suite and still fail to compile on a real chip. JAX's
cross-platform lowering (``.trace(...).lower(lowering_platforms=("tpu",))``)
runs the full Mosaic lowering (pallas_call -> tpu dialect -> serialized
``tpu_custom_call``) on any backend, catching that class of failure
off-hardware.

This caught two real compile blockers in the FPS kernel that every
interpret-mode test missed (ops/pallas_fps.py): a weak-int64 literal in
``idx // 128`` that sent Mosaic's convert_element_type rule into infinite
recursion, and a weak-float64 ``0.0`` literal that raised
"Unsupported cast: float64 -> float32".

What this does NOT cover: the Mosaic *backend* compile (tpu dialect ->
machine code, register allocation, real VMEM budget enforcement) still
happens on-device; tools/tpu_session.sh phase1/2 remain the hardware
gates for that.
"""

import jax
import jax.numpy as jnp
import pytest

from flooder_tpu.ops.pallas_flood import BS, RT, SUB, WCHUNK, _flood_pairs_call
from flooder_tpu.ops.pallas_fps import _fps_call


def _assert_lowers(traced):
    txt = traced.lower(lowering_platforms=("tpu",)).as_text()
    assert "tpu_custom_call" in txt
    return txt


def _flood_args(bs, dim, rt, nr, wchunk, sb=2, npairs=4):
    pair_s = jnp.zeros((npairs,), jnp.int32)
    pair_c = jnp.zeros((npairs,), jnp.int32)
    pair_first = jnp.ones((npairs,), jnp.int32)
    samples = jnp.zeros((sb * bs, nr, dim, rt), jnp.float32)
    witnesses = jnp.zeros((dim, wchunk), jnp.float32)
    centers = jnp.zeros((sb * bs, dim), jnp.float32)
    radii = jnp.ones((sb * bs, 1), jnp.float32)
    tile_lo = jnp.zeros((sb * bs, nr, dim), jnp.float32)
    tile_hi = jnp.ones((sb * bs, nr, dim), jnp.float32)
    ub2 = jnp.full((sb * bs, nr, 1), 1e9, jnp.float32)
    acc = jnp.full((sb * bs, nr, rt), 1e9, jnp.float32)
    return (
        pair_s, pair_c, pair_first, samples, witnesses, centers, radii,
        tile_lo, tile_hi, ub2, acc,
    )


@pytest.mark.parametrize("mxu", [False, True], ids=["vpu", "mxu"])
@pytest.mark.parametrize("dim", [2, 3])
def test_flood_kernel_lowers_to_mosaic(mxu, dim):
    """The shipped flood kernel geometry must pass Mosaic lowering for
    both the per-coordinate VPU path and the MXU dot-product path."""
    args = _flood_args(BS, dim, RT, nr=1, wchunk=WCHUNK)
    traced = _flood_pairs_call.trace(
        *args, bs=BS, dim=dim, nsub=WCHUNK // SUB, sub=SUB,
        interpret=False, mxu=mxu,
    )
    _assert_lowers(traced)


def test_flood_kernel_multi_tile_lowers():
    """Multiple sample tiles per simplex block (nr > 1) exercise the
    r_body fori_loop branch of the kernel."""
    args = _flood_args(BS, 3, RT, nr=3, wchunk=WCHUNK)
    traced = _flood_pairs_call.trace(
        *args, bs=BS, dim=3, nsub=WCHUNK // SUB, sub=SUB,
        interpret=False, mxu=False,
    )
    _assert_lowers(traced)


def test_fps_kernel_lowers_to_mosaic():
    """The manual-DMA FPS kernel (semaphores, HBM refs, scalar control
    flow) must pass Mosaic lowering — the riskiest kernel in the repo."""
    dim, chunk, nchunks, n_samples = 3, 512, 4, 16
    pts_t = jnp.zeros((dim, chunk * nchunks), jnp.float32)
    box_lo = jnp.zeros((nchunks, dim), jnp.float32)
    box_hi = jnp.ones((nchunks, dim), jnp.float32)
    start = jnp.zeros((), jnp.int32)
    traced = _fps_call.trace(
        pts_t, box_lo, box_hi, start,
        n_samples=n_samples, chunk=chunk, interpret=False,
    )
    _assert_lowers(traced)


def test_fps_kernel_2d_lowers():
    """2-D clouds pad the coordinate axis; the padded layout must lower
    too (the 40M figure-eight config runs through this shape)."""
    dim, chunk, nchunks = 4, 512, 2  # dim_pad=4 covers the 2-D cloud case
    pts_t = jnp.zeros((dim, chunk * nchunks), jnp.float32)
    box_lo = jnp.zeros((nchunks, dim), jnp.float32)
    box_hi = jnp.ones((nchunks, dim), jnp.float32)
    start = jnp.zeros((), jnp.int32)
    traced = _fps_call.trace(
        pts_t, box_lo, box_hi, start, n_samples=8, chunk=chunk,
        interpret=False,
    )
    _assert_lowers(traced)


def test_fps_larger_geometry_lowers():
    """A production-shaped FPS instance (more chunks, more landmarks)
    keeps the scalar-control-flow structure Mosaic-lowerable; the grid
    is size-independent so this stays cheap."""
    dim, chunk, nchunks, n_samples = 3, 2048, 16, 64
    pts_t = jnp.zeros((dim, chunk * nchunks), jnp.float32)
    box_lo = jnp.zeros((nchunks, dim), jnp.float32)
    box_hi = jnp.ones((nchunks, dim), jnp.float32)
    start = jnp.zeros((), jnp.int32)
    traced = _fps_call.trace(
        pts_t, box_lo, box_hi, start,
        n_samples=n_samples, chunk=chunk, interpret=False,
    )
    _assert_lowers(traced)
