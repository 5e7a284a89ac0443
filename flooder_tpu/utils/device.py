"""Device / array-conversion helpers.

The reference dispatches on ``torch.Tensor.device`` (core.py:103-128); the
JAX-native equivalent dispatches on the platform of a ``jax.Array``'s sharding.
These helpers centralize that logic and let the public API accept numpy
arrays, jax arrays, torch CPU tensors (anything implementing ``__array__``),
and device specs given as ``None`` / ``"cpu"`` / ``"tpu"`` / ``"tpu:0"`` /
``jax.Device``.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

DeviceLike = Union[None, str, jax.Device]


def default_backend() -> str:
    """Platform of the default JAX backend ("tpu", "cpu", ...)."""
    return jax.default_backend()


def resolve_device(device: DeviceLike) -> jax.Device:
    """Resolve a device spec to a concrete ``jax.Device``.

    Accepts ``None`` (default device), a platform string ``"cpu"`` /
    ``"tpu"``, an indexed form ``"tpu:1"``, or a ``jax.Device``.
    """
    if device is None:
        return jax.devices()[0]
    if isinstance(device, jax.Device):
        return device
    if isinstance(device, str):
        name = device.strip().lower()
        # Accept the reference CLI spelling "cuda:N" only to produce a clear
        # error message (cli.py:165-173 validates devices similarly).
        if ":" in name:
            platform, _, idx = name.partition(":")
            return jax.devices(platform)[int(idx)]
        return jax.devices(name)[0]
    raise TypeError(f"Cannot interpret device spec: {device!r}")


def device_of(x) -> Optional[jax.Device]:
    """The (single) device an array lives on, or None for host arrays."""
    if isinstance(x, jax.Array):
        devs = list(x.devices())
        if len(devs) == 1:
            return devs[0]
        return devs[0]
    return None


def platform_of(x) -> str:
    """Platform string of an array ("cpu" for host numpy arrays)."""
    d = device_of(x)
    return d.platform if d is not None else "cpu"


def as_jax_array(x, dtype=None, device: DeviceLike = None) -> jax.Array:
    """Convert ``x`` to a jax.Array, optionally casting/moving it.

    If ``device`` is None the array keeps its current placement (jax arrays)
    or lands on the default device (host arrays).
    """
    if isinstance(x, jax.Array):
        arr = x
        if dtype is not None and arr.dtype != np.dtype(dtype):
            arr = arr.astype(dtype)
        if device is not None:
            arr = jax.device_put(arr, resolve_device(device))
        return arr
    # Host path: numpy / torch-cpu / lists.
    host = np.asarray(x, dtype=dtype)
    if device is not None:
        return jax.device_put(host, resolve_device(device))
    return jnp.asarray(host)
