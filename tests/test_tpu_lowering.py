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

The operand builders live in tools/lower_check.py (which sweeps ALL
phase-3 kernel geometries); these tests reuse them so the two
off-hardware gates can never drift to checking different geometries.

What this does NOT cover: the Mosaic *backend* compile (tpu dialect ->
machine code, register allocation, real VMEM budget enforcement) still
happens on-device; tools/tpu_session.sh phase1/2 remain the hardware
gates for that.
"""

import pytest

from tools.lower_check import lower_flood, lower_fps

from flooder_tpu.ops.pallas_flood import BS, RT, SUB, WCHUNK



@pytest.mark.parametrize("dim", [2, 3])
def test_flood_kernel_lowers_to_mosaic(dim):
    """The shipped flood kernel geometry must pass Mosaic lowering for
    both the per-coordinate VPU path and the MXU dot-product path."""
    lower_flood(BS, dim, RT, SUB, WCHUNK)


def test_flood_kernel_multi_tile_lowers():
    """Multiple sample tiles per simplex block (nr > 1) exercise the
    r_body fori_loop branch of the kernel."""
    lower_flood(BS, 3, RT, SUB, WCHUNK, nr=3)


def test_fps_kernel_lowers_to_mosaic():
    """The manual-DMA FPS kernel (semaphores, HBM refs, scalar control
    flow) must pass Mosaic lowering — the riskiest kernel in the repo."""
    lower_fps(dim=3, chunk=512, nchunks=4, n_samples=16)


def test_fps_kernel_2d_lowers():
    """2-D clouds pad the coordinate axis; the padded layout must lower
    too (the 40M figure-eight config runs through this shape)."""
    lower_fps(dim=4, chunk=512, nchunks=2, n_samples=8)


def test_fps_larger_geometry_lowers():
    """A production-shaped FPS instance (more chunks, more landmarks)
    keeps the scalar-control-flow structure Mosaic-lowerable; the grid
    is size-independent so this stays cheap."""
    lower_fps(dim=3, chunk=2048, nchunks=16, n_samples=64)
