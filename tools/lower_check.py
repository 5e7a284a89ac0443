"""Off-hardware Mosaic lowering check for every kernel geometry the
phase-3 hardware sweep (tools/tpu_session.sh) will compile.

Interpret-mode tests execute kernel semantics but skip the Mosaic
pipeline; this script runs the real Pallas->Mosaic lowering for each
sweep combo's (bs, rt, sub, mxu) geometry via JAX cross-platform
lowering, so a chip session never burns alive-time on a variant that
cannot compile. Usage:

    python tools/lower_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def lower_flood(bs, dim, rt, sub, wchunk, mxu, nr=1, sb=2, npairs=4):
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
        interpret=False, mxu=mxu,
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


def _sweep_geometry(rt_env: int, r_count: int):
    """Replicate ``pallas_flood._tile_geometry`` for an env RT override:
    the kernel never tiles wider than the (128-padded) sample count, and
    splits the samples into nr tiles of rt lanes. Lowering the raw env
    value with nr=1 would gate the WRONG shapes (e.g. RT=8192 on the
    4960-sample bench grid really compiles rt=4992, and RT<=2048 compiles
    nr>1 multi-tile kernels)."""
    rt = min(rt_env, -(-r_count // 128) * 128)
    nr = -(-r_count // rt)
    return rt, nr


def main():
    # config-level CPU forcing belongs here, not at import time: the
    # lowering tests import the builders above and must not clobber the
    # backend of an on-TPU pytest run (FLOODER_TEST_TPU=1)
    jax.config.update("jax_platforms", "cpu")
    # (label, bs, RT-env, sub, mxu) — every geometry phase3 compiles, in
    # both ambient dims used by the BASELINE configs (2-D figure-eight,
    # 3-D cheese/torus). WCHUNK stays at its shipped 2048 in all combos.
    # The bench runs grid mode at 30 points/edge, so the top-dim sample
    # count is C(32,3)=4960 (3-D) / C(31,2)=465 (2-D); each combo lowers
    # the exact (rt, nr) tiling the kernel derives from that count.
    r_counts = {2: 465, 3: 4960}
    combos = []
    for dim in (2, 3):
        combos += [
            (f"default d{dim}", 8, 512, 512, dim, False),
            (f"PHASES=2 d{dim} (same geometry, short segments)", 8, 512, 512, dim, False),
            (f"MXU d{dim}", 8, 512, 512, dim, True),
            (f"SUB=256 d{dim}", 8, 512, 256, dim, False),
            (f"RT=256 d{dim}", 8, 256, 512, dim, False),
            (f"RT=256 SUB=256 d{dim}", 8, 256, 256, dim, False),
            (f"MXU RT=1024 d{dim}", 8, 1024, 512, dim, True),
            (f"MXU RT=2048 d{dim}", 8, 2048, 512, dim, True),
            (f"MXU RT=8192 d{dim} (96MB vmem param)", 8, 8192, 512, dim, True),
        ]
    failures = 0
    for label, bs, rt_env, sub, dim, mxu in combos:
        rt, nr = _sweep_geometry(rt_env, r_counts[dim])
        try:
            lower_flood(bs, dim, rt, sub, 2048, mxu, nr=nr)
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
        kd_order_device,
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
            "kd ordering",
            lambda: jax.jit(
                lambda p: kd_order_device(p, 2048)
            ).trace(jnp.zeros((8192, dim), jnp.float32)),
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
