"""Multi-chip scaling via jax.sharding + shard_map.

The reference is strictly single-device (SURVEY §2: no DP/TP/PP/SP, no
collectives anywhere; scale is handled by streaming batches on one GPU).
The natural TPU-native scale-out (SURVEY §5) uses a 2-D device mesh:

- ``"simplex"`` axis — data-parallel over simplex batches (embarrassingly
  parallel, no collectives),
- ``"witness"`` axis — the point cloud itself is sharded; each device
  min-reduces over its witness shard and the partial minima combine with a
  single ``lax.pmin`` over ICI (min is associative, so this composes
  exactly).

Witness sharding is what lets clouds larger than one chip's HBM
(hundreds of millions of points) stream through the same pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.flood import WITNESS_PAD, _round_up, batch_windows

SIMPLEX_AXIS = "simplex"
WITNESS_AXIS = "witness"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    simplex_parallel: Optional[int] = None,
) -> Mesh:
    """Build a ("simplex", "witness") mesh over the given devices.

    Args:
        devices: devices to use (default: all).
        simplex_parallel: requested size of the simplex (data-parallel)
            axis; the witness axis gets the remaining factor. Clamped to
            the largest divisor of the device count that is <= the request
            (so odd device counts and over-asks degrade gracefully instead
            of raising). Default: all devices on the simplex axis (no
            collectives needed).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if simplex_parallel is None:
        simplex_parallel = n
    simplex_parallel = max(1, min(int(simplex_parallel), n))
    while n % simplex_parallel != 0:
        simplex_parallel -= 1
    arr = np.asarray(devices).reshape(simplex_parallel, n // simplex_parallel)
    return Mesh(arr, (SIMPLEX_AXIS, WITNESS_AXIS))


@partial(
    jax.jit,
    static_argnames=("mesh", "wchunk", "sort_axis"),
)
def sharded_flood_min_distances(
    verts: jax.Array,
    weights: jax.Array,
    centers: jax.Array,
    radii: jax.Array,
    witnesses: jax.Array,
    *,
    mesh: Mesh,
    wchunk: int = 1024,
    sort_axis: int = 0,
) -> jax.Array:
    """Sharded version of the flood min-distance reduction.

    Args:
        verts: (nb, B, k, d) — ``nb`` must divide by the simplex-axis size.
        weights: (R, k) sample weights (replicated).
        centers/radii: (nb, B, d) / (nb, B).
        witnesses: (W, d) sorted along ``sort_axis`` and padded so that
            W divides by (witness-axis size × wchunk).
        mesh: ("simplex", "witness") mesh.
        wchunk: witness chunk length.
        sort_axis: coordinate axis the witnesses are sorted along.

    Returns:
        (nb, B, R) distances, sharded along the simplex axis.
    """
    from ..ops.flood import flood_min_distances

    def body(verts_l, weights_l, centers_l, radii_l, wit_l):
        wit_axis_l = wit_l[:, sort_axis]
        imin, imax = batch_windows(
            centers_l[..., sort_axis], radii_l, wit_axis_l, wchunk
        )
        local = flood_min_distances(
            verts_l, weights_l, centers_l, radii_l, wit_l, imin, imax,
            wchunk=wchunk,
        )
        # combine partial minima across the witness shards over ICI
        return jax.lax.pmin(local, WITNESS_AXIS)

    fn = shard_map(
        body,
        mesh=mesh,
        # the scanned min-reduction mixes varying and invariant carries;
        # skip the varying-manual-axes check (outputs are pmin-combined)
        check_vma=False,
        in_specs=(
            P(SIMPLEX_AXIS, None, None, None),
            P(None, None),
            P(SIMPLEX_AXIS, None, None),
            P(SIMPLEX_AXIS, None),
            P(WITNESS_AXIS, None),
        ),
        out_specs=P(SIMPLEX_AXIS, None, None),
    )
    return fn(verts, weights, centers, radii, witnesses)


class MeshFloodEngine:
    """Engine plugging mesh-sharded reduction into ``flood_complex``.

    Construct via ``flood_complex(..., mesh=mesh)``; witnesses are sorted
    along the widest axis, padded to the shard grid, and laid out
    shard-by-shard along the witness axis; simplex batches are sharded
    along the simplex axis.
    """

    def __init__(self, points: jax.Array, wchunk: int, mesh: Mesh):
        self.mesh = mesh
        self.wchunk = wchunk
        self.dtype = points.dtype
        n_pts, dim = points.shape
        self.mrd = int(
            jnp.argmax(jnp.max(points, axis=0) - jnp.min(points, axis=0))
        )
        pts_sorted = points[jnp.argsort(points[:, self.mrd])]
        n_wshards = mesh.shape[WITNESS_AXIS]
        total = _round_up(max(n_pts, wchunk), wchunk * n_wshards)
        if total != n_pts:
            pad = jnp.full((total - n_pts, dim), WITNESS_PAD, dtype=points.dtype)
            pts_sorted = jnp.concatenate([pts_sorted, pad], axis=0)
        self.witnesses = jax.device_put(
            pts_sorted,
            jax.sharding.NamedSharding(mesh, P(WITNESS_AXIS, None)),
        )

    def order(self, centers: jax.Array) -> jax.Array:
        return jnp.argsort(centers[:, self.mrd])

    def min_distances(self, verts, weights, centers, radii, batch_size, tight=False):
        del tight  # pruning hint used by the Pallas engine only
        num_simplices, k, dim = verts.shape
        n_sshards = self.mesh.shape[SIMPLEX_AXIS]
        bsz = max(1, min(int(batch_size), num_simplices))
        r_count = weights.shape[0]
        elem = jnp.dtype(self.dtype).itemsize
        max_b = max(1, (256 << 20) // max(1, r_count * self.wchunk * elem))
        bsz = min(bsz, max_b)
        nb = _round_up(-(-num_simplices // bsz), n_sshards)
        total = nb * bsz

        def pad(arr):
            if arr.shape[0] == total:
                return arr
            reps = jnp.repeat(arr[-1:], total - arr.shape[0], axis=0)
            return jnp.concatenate([arr, reps], axis=0)

        ns = jax.sharding.NamedSharding
        verts_b = jax.device_put(
            pad(verts).reshape(nb, bsz, k, dim),
            ns(self.mesh, P(SIMPLEX_AXIS, None, None, None)),
        )
        centers_b = jax.device_put(
            pad(centers).reshape(nb, bsz, dim),
            ns(self.mesh, P(SIMPLEX_AXIS, None, None)),
        )
        radii_b = jax.device_put(
            pad(radii).reshape(nb, bsz), ns(self.mesh, P(SIMPLEX_AXIS, None))
        )
        weights = jax.device_put(weights, ns(self.mesh, P(None, None)))

        out = sharded_flood_min_distances(
            verts_b, weights, centers_b, radii_b, self.witnesses,
            mesh=self.mesh, wchunk=self.wchunk, sort_axis=self.mrd,
        )
        return out.reshape(total, r_count)[:num_simplices]
