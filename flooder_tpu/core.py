"""Flood complex construction — TPU-native orchestration.

Rebuild of the reference pipeline (reference core.py:32-288) on the
host/device split that fits XLA (SURVEY §7): the host owns combinatorics
(Delaunay over ~1k landmarks, columnar SimplexTree assembly); the device
owns dense geometry (FPS, bounding balls, sample matmuls, masked
min-distance reductions) under ``jit`` with static shapes.

Differences from the reference worth knowing (behavior-preserving):

- The per-batch host loop (reference core.py:193-248) is replaced by a
  single scanned device dispatch per dimension pass; witness windows are
  computed vectorized on device.
- Landmark selection is exact greedy FPS on device (see ops/fps.py) instead
  of the Rust bucket-FPS approximation; ``fps_h`` is accepted for API
  compatibility and ignored.
- Filtration extraction produces columnar arrays that are bulk-assigned
  into the native SimplexTree — no per-simplex Python dict updates.
- ``use_pallas`` replaces ``use_triton`` (which remains as an alias): the
  fused Pallas TPU kernel is used by default on TPU; the dense XLA path is
  the portable fallback (and the float64 path).
"""

from __future__ import annotations

import itertools
import threading
import warnings
import weakref
from functools import lru_cache
from numbers import Integral
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .ops.flood import DenseFloodEngine, simplex_bounding_balls
from .ops.fps import farthest_point_sampling
from .topology import DelaunayComplex, SimplexTree
from .utils.device import as_jax_array, platform_of
from .utils.stagetimer import fence, stage

SUPPORTED_DTYPES = (jnp.float32, jnp.float64)

# Default witness chunk length for the scanned min-reduction (the analogue
# of the reference's hardwired BLOCK_* tile sizes, core.py:26-29, but
# picked for VMEM/VPU lane geometry instead of CUDA SMs). ``None`` selects
# a chunk adapted to the cloud size: small clouds get small chunks so tiny
# per-batch windows don't drag in thousands of padded witnesses.
WCHUNK = None


def _auto_wchunk(n_points: int) -> int:
    c = 128
    while c < 4096 and c * 64 < n_points:
        c *= 2
    return c


# Engine cache: repeat flood_complex calls on the SAME witness array (the
# common benchmark/production pattern — the reference's own harnesses call
# flood_complex repeatedly per cloud, examples/example_01:84) skip the
# witness re-ordering entirely. The filtration is engine-state independent
# (the ordering is a performance permutation; the min-fold is permutation
# invariant), so a hit changes nothing but wall clock. Entries key on the
# exact array OBJECT (weakref identity — a dead referent frees the
# engine's device arrays; id() alone would be unsound under CPython id
# reuse) plus the engine-selecting arguments. Capacity 2: engines pin the
# ordered witness copy in device memory, so this must never grow with the
# number of clouds a process touches.
#
# Limitation: callers passing HOST arrays (numpy) never hit — the
# as_jax_array conversion above creates a fresh device array per call.
# Pass the same jax array across calls to benefit (bench.py and the
# examples do); mutable host buffers cannot be identity-cached safely.
_ENGINE_CACHE: List[tuple] = []
_ENGINE_CACHE_CAP = 2
_ENGINE_CACHE_LOCK = threading.Lock()


def _cached_engine(points, key, build):
    with _ENGINE_CACHE_LOCK:
        for i, (ref, k, eng) in enumerate(_ENGINE_CACHE):
            if k == key and ref() is points:
                _ENGINE_CACHE.append(_ENGINE_CACHE.pop(i))
                return eng
        # Evict BEFORE building: the outgoing engine's device arrays must
        # be released before the new engine allocates its witness copy,
        # or peak device memory transiently holds CAP+1 engines.
        live = [e for e in _ENGINE_CACHE if e[0]() is not None]
        _ENGINE_CACHE[:] = live[-(_ENGINE_CACHE_CAP - 1):]
    eng = build()
    with _ENGINE_CACHE_LOCK:
        _ENGINE_CACHE.append((weakref.ref(points), key, eng))
        del _ENGINE_CACHE[:-_ENGINE_CACHE_CAP]
    return eng


# ---------------------------------------------------------------------------
# sampling weights
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _grid_host(n: int, dim: int):
    """Barycentric grid on the unit ``dim``-simplex with ``n`` points per
    edge, plus per-face grid-row and vertex indices.

    Stars-and-bars enumeration identical to the reference
    (core.py:369-399): C(n+dim-1, dim) points; for every vertex-subset face
    the rows lying on it, enabling one top-dimension distance pass to yield
    filtration values for all faces.
    """
    combs = np.asarray(
        list(itertools.combinations(range(n + dim - 1), dim)), dtype=np.int64
    ).reshape(-1, dim)
    c = combs.shape[0]
    padded = np.concatenate(
        [
            np.full((c, 1), -1, dtype=np.int64),
            combs,
            np.full((c, 1), n + dim - 1, dtype=np.int64),
        ],
        axis=1,
    )
    grid = np.diff(padded, axis=1) - 1  # (C, dim + 1) integer weights

    face_idxs: List[np.ndarray] = []
    vertex_idxs: List[np.ndarray] = []
    all_axes = np.arange(dim + 1)
    for k in range(dim + 1):
        fk, vk = [], []
        for comb in itertools.combinations(range(dim + 1), k):
            comb_arr = np.asarray(comb, dtype=np.int64)
            if len(comb) == 0:
                mask = np.ones(len(grid), dtype=bool)
            else:
                mask = (grid[:, comb_arr] == 0).all(axis=1)
            fk.append(np.flatnonzero(mask))
            vk.append(all_axes[~np.isin(all_axes, comb_arr)])
        face_idxs.append(np.stack(fk))
        vertex_idxs.append(np.stack(vk))

    grid_f = grid.astype(np.float64) / (n - 1)
    return grid_f, vertex_idxs, face_idxs


def generate_grid(
    n: int, dim: int, device=None, dtype=jnp.float32
) -> Tuple[jax.Array, List[jax.Array], List[jax.Array]]:
    """Generate a grid of points on the unit simplex.

    Mirrors the reference ``generate_grid`` (core.py:346-402).

    Args:
        n: Number of points per edge.
        dim: Dimension of the simplex.
        device: JAX device for the weight tensor.
        dtype: dtype of the weight tensor.

    Returns:
        (grid (C, dim+1) weights, vertex_idxs per face-codim, face_idxs per
        face-codim).
    """
    grid, vertex_idxs, face_idxs = _grid_host(n, dim)
    arr = as_jax_array(grid, dtype=dtype, device=device)
    return (
        arr,
        [jnp.asarray(v) for v in vertex_idxs],
        [jnp.asarray(f) for f in face_idxs],
    )


def generate_uniform_weights(num_rand, dim, device=None, dtype=jnp.float32):
    """Generate ``num_rand`` uniform points on the unit ``dim``-simplex.

    Normalized exponentials ``−log(1−U)`` drawn from the **host** numpy
    global RNG — matching the reference's deliberate CPU-RNG-then-move
    semantics for cross-backend determinism (core.py:405-427): seeding
    ``np.random.seed(s)`` reproduces the weights on every backend.
    """
    if dim == 0:
        w = np.ones((num_rand, 1))
    else:
        u = np.random.rand(num_rand, dim + 1)
        w = -np.log(1.0 - u)
        w = w / w.sum(axis=1, keepdims=True)
    return as_jax_array(w, dtype=dtype, device=device)


# ---------------------------------------------------------------------------
# landmarks
# ---------------------------------------------------------------------------


def generate_landmarks(
    points,
    n_lms: int,
    fps_h: Union[None, int] = None,
    start_idx: Union[int, None] = None,
) -> jax.Array:
    """Select landmarks by farthest-point sampling, on device.

    API-compatible with the reference (core.py:291-343) which wraps the
    Rust ``fpsample`` bucket-FPS on CPU. Here FPS is the exact greedy
    algorithm as a jitted JAX loop, so the cloud never leaves the device.
    ``fps_h`` (the bucket-kd-tree height of the approximate variant) is
    accepted and ignored.

    Args:
        points: (P, d) point cloud (jax/numpy array).
        n_lms: number of landmarks (clamped to P; must be > 0).
        fps_h: ignored (kept for API compatibility).
        start_idx: index of the first landmark; None picks one at random
            (host numpy RNG).

    Returns:
        (n_lms, d) jax.Array with the same dtype/device as ``points``.
    """
    if n_lms <= 0:
        raise RuntimeError(f"Number of landmarks ({n_lms}) must be positive")
    pts = as_jax_array(points)
    n_pts = pts.shape[0]
    n_lms = min(n_lms, n_pts)
    del fps_h
    if start_idx is None:
        start_idx = int(np.random.randint(n_pts))
    from .ops.pallas_fps import fits_pallas_fps

    if (
        platform_of(pts) == "tpu"
        and pts.dtype == jnp.float32
        and n_lms > 1
        and fits_pallas_fps(n_pts, pts.shape[1])
    ):
        # fused on-chip greedy loop (~10x the XLA fori_loop on TPU)
        from .ops.pallas_fps import pallas_farthest_point_sampling

        try:
            idx = pallas_farthest_point_sampling(pts, n_lms, start_idx)
        except Exception as e:  # pragma: no cover - hardware-dependent
            # Mosaic lowering/compile failures surface on the first call
            # for a new shape; the XLA loop is slower but always works.
            warnings.warn(
                f"Pallas FPS kernel failed ({type(e).__name__}); "
                "falling back to the XLA loop",
                RuntimeWarning,
                stacklevel=2,
            )
            idx = farthest_point_sampling(pts, n_lms, start_idx)
    else:
        idx = farthest_point_sampling(pts, n_lms, start_idx)
    return pts[idx]


# ---------------------------------------------------------------------------
# flood complex
# ---------------------------------------------------------------------------


def _min_combine_faces(faces: np.ndarray, vals: np.ndarray):
    """Combine duplicate face rows by taking the min of their values."""
    from .topology._keys import row_keys

    faces = np.sort(np.ascontiguousarray(faces, dtype=np.int32), axis=1)
    keys = row_keys(faces)
    order = np.argsort(keys, kind="stable")
    keys_s = keys[order]
    vals_s = np.asarray(vals, dtype=np.float64)[order]
    starts = np.flatnonzero(
        np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
    )
    mins = np.minimum.reduceat(vals_s, starts)
    return faces[order[starts]], mins


@lru_cache(maxsize=64)
def _all_face_max_fn(points_per_edge: int, dim: int):
    """Jitted per-face max for EVERY codimension in one dispatch (one
    device sync instead of one per codim; the face index tables are baked
    in as constants)."""
    _, _, face_idxs = _grid_host(points_per_edge, dim)
    tables = [np.asarray(f, dtype=np.int32) for f in face_idxs]

    @jax.jit
    def fn(dists):
        return tuple(
            jnp.max(jnp.take(dists, jnp.asarray(t), axis=1), axis=-1)
            for t in tables
        )

    return fn


def flood_complex(
    points,
    landmarks: Union[int, jax.Array],
    max_dimension: Union[None, int] = None,
    points_per_edge: Union[None, int] = 30,
    num_rand: int = None,
    batch_size: Union[None, int] = 64,
    use_pallas: Optional[bool] = None,
    return_simplex_tree: bool = False,
    fps_h: Union[None, int] = None,
    start_idx: Union[int, None] = 0,
    use_triton: Optional[bool] = None,
    wchunk: Optional[int] = WCHUNK,
    mesh=None,
    landmarks_in_cloud: Optional[bool] = None,
    _engine_override=None,
) -> Union[dict, SimplexTree]:
    """Construct a Flood complex from witness points and landmarks.

    Behavior-compatible rebuild of the reference entry point (core.py:32-288)
    on JAX: given N witness points and L landmarks, build the Delaunay
    triangulation of the landmarks and assign each simplex the covering
    radius ``max over sample points s of (min over witnesses w of |s − w|)``
    estimated from a barycentric grid (or random samples) on each simplex.

    Args:
        points: (N, d) witness points (jax/numpy array, float32/float64).
        landmarks: landmark count (FPS-sampled from ``points``) or explicit
            (L, d) landmark coordinates.
        max_dimension: top simplex dimension (default: ambient dimension).
        points_per_edge: grid resolution per edge (grid mode, default 30).
        num_rand: if set, use this many random sample points per simplex
            instead of the grid.
        batch_size: simplices per device batch.
        use_pallas: force (True) or forbid (False) the fused Pallas TPU
            kernel; None selects it automatically on TPU.
        return_simplex_tree: return a SimplexTree instead of a dict.
        fps_h: accepted for API compatibility (see generate_landmarks).
        start_idx: FPS start index (None = random).
        use_triton: deprecated alias for ``use_pallas`` (reference API).
        wchunk: witness chunk length for the device reduction.
        mesh: optional ``jax.sharding.Mesh`` with ("simplex", "witness")
            axes; selects the multi-chip engine (takes precedence over
            ``use_pallas``).
        landmarks_in_cloud: assert that every landmark is one of ``points``
            (enables provably-lossless kernel pruning). Auto-True when
            landmarks are FPS-sampled internally; default False for
            explicit landmark arrays.

    Returns:
        dict mapping simplex tuples to filtration values, or a SimplexTree.
    """
    if use_triton is not None and use_pallas is None:
        use_pallas = use_triton

    points = as_jax_array(points)
    if points.dtype not in SUPPORTED_DTYPES:
        raise TypeError(f"dtype ({points.dtype}) not supported")
    if points.dtype == jnp.float64:
        warnings.warn(
            "Using float64 on accelerator backends might be slow",
            RuntimeWarning,
            stacklevel=2,
        )
    if max_dimension is None:
        max_dimension = points.shape[1]
    if isinstance(landmarks, Integral):
        with stage("fps"):
            landmarks = generate_landmarks(
                points,
                min(int(landmarks), points.shape[0]),
                fps_h,
                start_idx=start_idx,
            )
            fence(landmarks)
        # FPS selects landmarks FROM the cloud, so every simplex vertex is
        # a witness — enables provably-lossless tile pruning in the TPU
        # kernel (see ops/pallas_flood.py).
        if landmarks_in_cloud is None:
            landmarks_in_cloud = True
    else:
        landmarks = as_jax_array(landmarks)
    tight = bool(landmarks_in_cloud)
    if platform_of(landmarks) != platform_of(points):
        raise RuntimeError(
            f"landmarks.device ({platform_of(landmarks)}) != "
            f"points.device ({platform_of(points)})"
        )
    if landmarks.dtype != points.dtype:
        raise RuntimeError(
            f"landmarks.dtype ({landmarks.dtype}) != points.dtype ({points.dtype})"
        )

    platform = platform_of(points)
    dtype = points.dtype
    if use_pallas is None:
        use_pallas = platform == "tpu" and dtype == jnp.float32

    n_pts = points.shape[0]
    if wchunk is None:
        wchunk = _auto_wchunk(n_pts)

    # Pull the (tiny) landmark coordinates to host BEFORE the engine
    # enqueues its witness-ordering device work: a D2H transfer issued
    # behind a deep device queue stalls until the queue drains on this
    # backend, so the fetch goes first and the host Delaunay below still
    # overlaps the device-side ordering.
    with stage("landmarks-d2h"):
        lms_host = np.asarray(landmarks, dtype=np.float64)

    # Construct the engine BEFORE the host-side Delaunay: engine init
    # enqueues device work (witness ordering) that then runs concurrently
    # with the CPU triangulation.
    with stage("engine-init"):
        if _engine_override is not None:
            engine = _engine_override(points, wchunk)
        elif mesh is not None:
            # use_pallas was already defaulted above (TPU + float32 → True)
            if use_pallas:
                from .parallel.sharding import MeshPallasFloodEngine

                engine = _cached_engine(
                    points, ("mesh-pallas", wchunk, mesh),
                    lambda: MeshPallasFloodEngine(points, wchunk, mesh),
                )
            else:
                from .parallel.sharding import MeshFloodEngine

                engine = _cached_engine(
                    points, ("mesh-dense", wchunk, mesh),
                    lambda: MeshFloodEngine(points, wchunk, mesh),
                )
        elif use_pallas:
            from .ops.pallas_flood import PallasFloodEngine

            engine = _cached_engine(
                points, ("pallas", wchunk, None),
                lambda: PallasFloodEngine(points, wchunk),
            )
        else:
            engine = _cached_engine(
                points, ("dense", wchunk, None),
                lambda: DenseFloodEngine(points, wchunk),
            )
        fence(getattr(engine, "witnesses", None))

    # Host combinatorics: Delaunay triangulation of the landmarks.
    with stage("delaunay"):
        stree = DelaunayComplex(lms_host).create_simplex_tree()
        levels = stree._verts  # columnar access within the package

    for d in range(max_dimension + 1):
        # Grid mode derives face filtrations from top-dimension simplices
        # (reference core.py:149-150).
        if num_rand is None and d < max_dimension:
            continue
        if d >= len(levels):
            continue
        d_simplices = levels[d]
        num_simplices = d_simplices.shape[0]
        if num_simplices == 0:
            continue

        with stage(f"dim{d}:balls+order"):
            sim_verts = landmarks[jnp.asarray(d_simplices)]  # (S, d+1, dim)
            centers, radii = simplex_bounding_balls(sim_verts)

            # Sort simplices for spatial coherence (reference
            # core.py:175-179; the engine chooses the order: sort-axis or
            # Morton).
            order = engine.order(centers)
            order_host = np.asarray(order)
            sim_verts = sim_verts[order]
            centers = centers[order]
            radii = radii[order]
            simplices_sorted = d_simplices[order_host]

        # Sample-point weights.
        if num_rand is None:
            grid_np, vertex_idxs, face_idxs = _grid_host(
                points_per_edge, max_dimension
            )
            weights = jnp.asarray(grid_np, dtype=dtype)
        else:
            weights = generate_uniform_weights(num_rand, d, dtype=dtype)

        bsz = num_simplices if batch_size is None else int(batch_size)
        facemax = getattr(engine, "min_distances_facemax", None)

        if num_rand is None:
            # One value per face of every top-dim simplex
            # (reference core.py:251-268). A shared face is computed once
            # per cofacing top-simplex, each time min-reduced over that
            # simplex's own bounding ball; the reference keeps the last
            # writer (iteration-order dependent). Here writers are combined
            # with **min** — order-independent (deterministic across
            # dtypes/backends) and the tightest of the ball-restricted
            # estimates of the true covering radius.
            with stage(f"dim{d}:distances"):
                if facemax is not None:
                    # fused epilogue: face maxima computed on the kernel's
                    # squared accumulator, no (S, R) materialization
                    fvals_all = jax.device_get(facemax(
                        sim_verts, weights, centers, radii, bsz, tight=tight,
                        face_tables=face_idxs,
                    ))
                else:
                    distances = engine.min_distances(
                        sim_verts, weights, centers, radii, bsz, tight=tight
                    )  # (S, R)
                    fn = _all_face_max_fn(points_per_edge, max_dimension)
                    fvals_all = jax.device_get(fn(distances))  # one sync
            with stage(f"dim{d}:assembly"):
                for codim, vertex_idx in enumerate(vertex_idxs):
                    fvals_host = fvals_all[codim]  # (S, F)
                    faces = simplices_sorted[:, vertex_idx]
                    face_dim = max_dimension - codim
                    uniq_faces, min_vals = _min_combine_faces(
                        faces.reshape(-1, face_dim + 1), fvals_host.reshape(-1)
                    )
                    stree.assign_filtrations(face_dim, uniq_faces, min_vals)
        else:
            with stage(f"dim{d}:distances"):
                if facemax is not None:
                    vals_host = np.asarray(facemax(
                        sim_verts, weights, centers, radii, bsz, tight=tight,
                        face_tables=None,
                    ))  # (S,)
                else:
                    distances = engine.min_distances(
                        sim_verts, weights, centers, radii, bsz, tight=tight
                    )
                    vals_host = np.asarray(jnp.max(distances, axis=-1))
            with stage(f"dim{d}:assembly"):
                stree.assign_filtrations(d, simplices_sorted, vals_host)

    with stage("monotonicity"):
        stree.make_filtration_non_decreasing()

    if return_simplex_tree:
        return stree
    with stage("dict-out"):
        return dict(
            (tuple(simplex), filtr) for simplex, filtr in stree.get_simplices()
        )
