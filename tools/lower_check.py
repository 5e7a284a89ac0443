"""Off-hardware Mosaic lowering check for the shipped kernel geometry.

Interpret-mode tests execute kernel semantics but skip the Mosaic
pipeline; this script runs the real Pallas->Mosaic lowering for the
shipped (bs, rt, sub) geometry in both ambient dims via JAX
cross-platform lowering, so a chip session never burns alive-time on
code that cannot compile. (The 2026-08-18 hardware sweep collapsed the
former per-combo matrix to this one configuration.) Usage:

    python tools/lower_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def lower_flood(bs, dim, rt, sub, wchunk, nr=1, sb=2, npairs=4):
    from flooder_tpu.ops.pallas_flood import _flood_pairs_call

    args = (
        jnp.zeros((npairs,), jnp.int32),
        jnp.zeros((npairs,), jnp.int32),
        jnp.ones((npairs,), jnp.int32),
        jnp.zeros((sb * bs, nr, dim, rt), jnp.float32),
        jnp.zeros((dim, wchunk), jnp.float32),
        jnp.zeros((sb * bs, dim), jnp.float32),
        jnp.ones((sb * bs, 1), jnp.float32),
        jnp.zeros((sb * bs, nr, dim), jnp.float32),
        jnp.ones((sb * bs, nr, dim), jnp.float32),
        jnp.full((sb * bs, nr, 1), 1e9, jnp.float32),
        jnp.full((sb * bs, nr, rt), 1e9, jnp.float32),
    )
    traced = _flood_pairs_call.trace(
        *args, bs=bs, dim=dim, nsub=wchunk // sub, sub=sub,
        interpret=False,
    )
    txt = traced.lower(lowering_platforms=("tpu",)).as_text()
    assert "tpu_custom_call" in txt


def lower_fps(dim, chunk, nchunks, n_samples):
    from flooder_tpu.ops.pallas_fps import _fps_call

    traced = _fps_call.trace(
        jnp.zeros((dim, chunk * nchunks), jnp.float32),
        jnp.zeros((dim, nchunks), jnp.float32),
        jnp.ones((dim, nchunks), jnp.float32),
        jnp.zeros((), jnp.int32),
        n_samples=n_samples, chunk=chunk, interpret=False,
    )
    txt = traced.lower(lowering_platforms=("tpu",)).as_text()
    assert "tpu_custom_call" in txt


def main():
    # config-level CPU forcing belongs here, not at import time: the
    # lowering tests import the builders above and must not clobber the
    # backend of an on-TPU pytest run (FLOODER_TEST_TPU=1)
    jax.config.update("jax_platforms", "cpu")
    # The shipped geometry in both ambient dims used by the BASELINE
    # configs (2-D figure-eight, 3-D cheese/torus). The bench runs grid
    # mode at 30 points/edge, so the top-dim sample count is C(32,3)=4960
    # (3-D) / C(31,2)=465 (2-D); lower the exact (rt, nr) tiling the
    # kernel derives from that count (pallas_flood._tile_geometry).
    r_counts = {2: 465, 3: 4960}
    failures = 0
    for dim in (2, 3):
        r_count = r_counts[dim]
        rt = min(512, -(-r_count // 128) * 128)
        nr = -(-r_count // rt)
        label = f"shipped d{dim}"
        try:
            lower_flood(8, dim, rt, 512, 2048, nr=nr)
            print(f"OK   flood {label} (rt={rt} nr={nr})")
        except Exception as e:  # noqa: BLE001
            failures += 1
            msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
            print(f"FAIL flood {label}: {msg}")
    for label, dim, chunk, nchunks, n in [
        ("3-D 1M-shape", 3, 2048, 16, 64),
        ("2-D padded", 4, 512, 2, 8),
    ]:
        try:
            lower_fps(dim, chunk, nchunks, n)
            print(f"OK   fps {label}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
            print(f"FAIL fps {label}: {msg}")
    failures += _aux_checks()
    print(f"{failures} failures")
    return 1 if failures else 0


def _aux_checks():
    """Cross-lower the auxiliary jitted device functions the engine and
    sweep compile around the kernels (plain XLA, near-zero risk, but a
    sweep combo that trips on one wastes chip time all the same)."""
    from flooder_tpu.ops.pallas_flood import (
        _active_pairs_matrix,
        hilbert_codes,
    )
    from flooder_tpu.ops.pallas_fps import _fps_prepare

    n_sblocks, bs, dim, nr, nchunks, wchunk = 4, 8, 3, 2, 6, 2048
    s_total = n_sblocks * bs
    checks = [
        (
            "active-pairs matrix",
            lambda: jax.jit(
                _active_pairs_matrix, static_argnames=("wchunk", "bs")
            ).trace(
                jnp.zeros((s_total, dim), jnp.float32),
                jnp.ones((s_total, 1), jnp.float32),
                jnp.zeros((s_total, dim), jnp.float32),
                jnp.ones((s_total, dim), jnp.float32),
                jnp.full((s_total, 1), 1e9, jnp.float32),
                jnp.zeros((nchunks, dim), jnp.float32),
                jnp.ones((nchunks, dim), jnp.float32),
                wchunk=wchunk,
                bs=bs,
            ),
        ),
        (
            "hilbert codes",
            lambda: hilbert_codes.trace(
                jnp.zeros((4096, dim), jnp.float32), bits=8
            ),
        ),
        (
            "fps prepare",
            lambda: _fps_prepare.trace(
                jnp.zeros((4096, dim), jnp.float32),
                jnp.zeros((), jnp.int32),
                chunk=2048,
                dim_pad=dim,
            ),
        ),
    ]
    failures = 0
    for label, make in checks:
        try:
            make().lower(lowering_platforms=("tpu",)).as_text()
            print(f"OK   aux {label}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
            print(f"FAIL aux {label}: {msg}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
