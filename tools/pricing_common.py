"""Shared scene setup for the offline pricing tools.

worklist_volume, adaptive_floor, and launch_overhead all replay parts of
the production engine's pipeline (cloud -> FPS landmarks -> Delaunay top
simplices -> bounding balls -> engine visit order -> grid weights ->
tile prep) and previously each carried its own ~30-line replica of that
scaffolding — three copies to keep in lockstep with ops/pallas_flood by
hand. This module is the single replica: it calls the engine's OWN prep
functions (same constants, same jitted code), so the pair lists and tile
layouts the tools price are exactly the ones the TPU kernel would walk.

Callers must select the backend (flooder_tpu._platform guard or an
explicit jax.config.update) BEFORE calling build_scene: everything here
runs real jax ops.
"""

from __future__ import annotations

from types import SimpleNamespace


def build_scene(
    points: int,
    landmarks: int,
    *,
    cloud: str = "cheese3d",
    seed: int = 42,
    interpret: bool | None = True,
    wchunk: int | None = None,
) -> SimpleNamespace:
    """Build the full pricing scene for one configuration.

    interpret: passed to PallasFloodEngine (True for CPU-side pricing;
    None lets the engine auto-select for on-hardware use).
    wchunk: witness-chunk size override (default: the engine's shipped
    constant) — lets the volume model price the frozen choice.

    Returns a namespace with the ordered simplex data, the production
    tile prep outputs (samples/tile boxes/static bounds/work-list), and
    host-side numpy views of everything the admission models index.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu import (
        generate_figure_eight_points_2d,
        generate_landmarks,
        generate_swiss_cheese_points,
    )
    from flooder_tpu.core import _grid_host, simplex_bounding_balls
    from flooder_tpu.ops import pallas_flood as pf
    from flooder_tpu.topology import DelaunayComplex

    if cloud == "eight2d":
        # reference example_03's exact cloud parameters
        # (noise_std=0.02 gaussian, ref example_03_figure_eight_2d.py:48)
        pts = generate_figure_eight_points_2d(
            points, noise_std=0.02, noise_kind="gaussian", seed=seed
        )
    elif cloud == "cheese3d":
        pts, _, _ = generate_swiss_cheese_points(points, k=6, seed=seed)
    else:
        raise ValueError(f"unknown cloud {cloud!r}")
    pts = jnp.asarray(pts, jnp.float32)
    dim = pts.shape[1]
    lms = generate_landmarks(pts, landmarks, start_idx=0)

    # The engine freezes its chunk size to the module constant (the knob
    # was deliberately deleted); price alternatives by patching the
    # constant around construction. The HOST-side counting in this module
    # reads engine.wchunk consistently — but the engine's own kernel
    # launch path reads the module constant again (nsub = WCHUNK // SUB),
    # which is restored below, so RUNNING an overridden engine would
    # silently mis-tile. Poison its run methods to make that loud.
    saved_wc = pf.WCHUNK
    if wchunk is not None:
        pf.WCHUNK = wchunk
    try:
        engine = (
            pf.PallasFloodEngine(pts, pf.WCHUNK)
            if interpret is None
            else pf.PallasFloodEngine(pts, pf.WCHUNK, interpret=interpret)
        )
    finally:
        pf.WCHUNK = saved_wc
    if wchunk is not None and wchunk != saved_wc:
        def _no_run(*a, **k):
            raise RuntimeError(
                "scene built with a wchunk override is host-side counting "
                "only: the kernel launch reads the module WCHUNK constant "
                "and would mis-tile this engine's witness layout"
            )

        engine.min_distances = _no_run
        engine.min_distances_facemax = _no_run
    stree = DelaunayComplex(np.asarray(lms, np.float64)).create_simplex_tree()
    top = stree._verts[dim] if len(stree._verts) > dim else stree._verts[-1]
    sim_verts = lms[jnp.asarray(top)]
    centers, radii = simplex_bounding_balls(sim_verts)
    order = engine.order(centers)
    sim_verts = sim_verts[order]
    centers = centers[order]
    radii = radii[order]

    grid_np, _, _ = _grid_host(30, dim)
    weights = jnp.asarray(grid_np, jnp.float32)
    num_simplices = sim_verts.shape[0]

    # identical prep path to the production engine
    n_sblocks = 1 << max(0, (-(-num_simplices // pf.BS) - 1)).bit_length()
    s_total = n_sblocks * pf.BS
    rt, nr, r2_total = pf._tile_geometry(weights.shape[0])
    verts_p, centers_p, radii_p = pf._pad_simplices(
        sim_verts, centers, radii, s_total
    )
    weights_p, sperm = pf._prepare_sample_weights(weights, r2_total)
    verts_local = verts_p - centers_p[:, None, :]
    samples, tile_lo, tile_hi, ub2, adm_d = pf._prep(
        verts_local, weights_p, centers_p, radii_p,
        engine.chunk_lo, engine.chunk_hi,
        bs=pf.BS, nr=nr, rt=rt, tight=True, wchunk=engine.wchunk,
        pack=pf.PACK_ADMISSION,
    )

    # host-side views the admission models index
    active, _ = pf.unpack_admission(jax.device_get(adm_d))
    active = np.asarray(active)
    cen = np.asarray(centers_p)
    rad = np.asarray(radii_p)
    t_lo = np.asarray(tile_lo)
    t_hi = np.asarray(tile_hi)
    u2 = np.asarray(ub2)[:, :, 0]  # (S_total, NR)
    samp_lo_g = np.asarray(jnp.min(tile_lo, axis=1)) + cen  # (S, dim) global
    samp_hi_g = np.asarray(jnp.max(tile_hi, axis=1)) + cen

    # sub-chunk boxes from the engine's sorted witness layout
    wit = np.asarray(engine.witnesses).T  # (W, dim)
    nsub = engine.wchunk // pf.SUB
    n_chunks = wit.shape[0] // engine.wchunk
    subs = wit.reshape(n_chunks * nsub, pf.SUB, -1)
    sub_lo = subs.min(axis=1)  # (n_chunks*nsub, dim)
    sub_hi = subs.max(axis=1)

    return SimpleNamespace(
        pts=pts, lms=lms, dim=dim, engine=engine,
        sim_verts=sim_verts, centers=centers, radii=radii,
        weights=weights, num_simplices=num_simplices,
        n_sblocks=n_sblocks, s_total=s_total,
        rt=rt, nr=nr, r2_total=r2_total,
        verts_p=verts_p, centers_p=centers_p, radii_p=radii_p,
        weights_p=weights_p, sperm=sperm,
        samples=samples, tile_lo=tile_lo, tile_hi=tile_hi, ub2=ub2,
        active_d=active_d, pairdist_d=pairdist_d,
        active=active, cen=cen, rad=rad, t_lo=t_lo, t_hi=t_hi, u2=u2,
        samp_lo_g=samp_lo_g, samp_hi_g=samp_hi_g,
        wit=wit, nsub=nsub, n_chunks=n_chunks,
        sub_lo=sub_lo, sub_hi=sub_hi,
    )


def count_admission(scene, pair_s, pair_c, bnd, batch: int = 2048):
    """Replay the kernel's admission hierarchy over a work-list.

    Returns (admitted_units, admitted_tiles):
    - units: (simplex, sub-chunk) passes of the ball test AND the static
      sample-box gap vs the per-simplex static bound (the kernel's first
      in-register skip),
    - tiles: (tile, sub-chunk) units whose tile-box gap is within ``bnd``
      (shape (S_total, NR)) — pass the static u2 for the ceiling, a
      realized/converged bound for floors.

    Counting tiles inside the unit filter equals counting them inside
    the ball filter alone: a tile whose simplex-level gap fails has
    tile gap >= simplex gap > ubmax >= u2 >= bnd, so it never passes
    the tile test anyway.
    """
    import numpy as np

    from flooder_tpu.ops import pallas_flood as pf

    cen, rad = scene.cen, scene.rad
    sub_lo, sub_hi, nsub = scene.sub_lo, scene.sub_hi, scene.nsub
    t_lo, t_hi, u2 = scene.t_lo, scene.t_hi, scene.u2
    slo, shi = scene.samp_lo_g, scene.samp_hi_g

    admitted_units = 0
    admitted_tiles = 0
    for beg in range(0, len(pair_s), batch):
        ps = pair_s[beg:beg + batch]
        pc = pair_c[beg:beg + batch]
        sidx = (ps[:, None] * pf.BS + np.arange(pf.BS)[None, :]).reshape(-1)
        subi = (pc[:, None] * nsub + np.arange(nsub)[None, :]).reshape(-1)
        c_b = cen[sidx].reshape(len(ps), pf.BS, 1, -1)
        r_b = rad[sidx].reshape(len(ps), pf.BS, 1)
        bl = sub_lo[subi].reshape(len(ps), 1, nsub, -1)
        bh = sub_hi[subi].reshape(len(ps), 1, nsub, -1)
        near = np.clip(c_b, bl, bh) - c_b
        ball_ok = np.sum(near * near, axis=-1) <= r_b * r_b
        # static sample-box gap vs nearest-vertex bound
        s_lo = slo[sidx].reshape(len(ps), pf.BS, 1, -1)
        s_hi = shi[sidx].reshape(len(ps), pf.BS, 1, -1)
        gap = np.maximum(np.maximum(bl - s_hi, s_lo - bh), 0.0)
        gap2 = np.sum(gap * gap, axis=-1)
        ubmax = u2[sidx].max(axis=-1).reshape(len(ps), pf.BS, 1)
        unit_ok = ball_ok & (gap2 <= ubmax)
        admitted_units += int(unit_ok.sum())

        # tile-level admission inside admitted units
        ui, uj, uk = np.nonzero(unit_ok)
        if len(ui):
            sidx2 = ps[ui] * pf.BS + uj
            subi2 = pc[ui] * nsub + uk
            blo = sub_lo[subi2][:, None, :] - cen[sidx2][:, None, :]
            bhi = sub_hi[subi2][:, None, :] - cen[sidx2][:, None, :]
            tgap = np.maximum(
                np.maximum(blo - t_hi[sidx2], t_lo[sidx2] - bhi), 0.0
            )
            tgap2 = np.sum(tgap * tgap, axis=-1)  # (U, NR)
            admitted_tiles += int((tgap2 <= bnd[sidx2]).sum())
    return admitted_units, admitted_tiles
