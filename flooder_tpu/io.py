"""IO functionality (for consistent saving).

TPU-native counterpart of the reference ``flooder/io.py:14-57``: identical
semantics (refuse overwrite unless asked; inject a ``_meta`` entry into dict
payloads), but serialization is pickle-based instead of ``torch.save`` and
jax arrays are converted to numpy so files stay framework-agnostic.
"""

from __future__ import annotations

import datetime
import pickle
from pathlib import Path
from typing import Any, Union

import jax
import numpy as np


def _to_host(obj: Any) -> Any:
    """Recursively convert jax arrays to numpy for portable serialization."""
    if isinstance(obj, jax.Array):
        return np.asarray(obj)
    if isinstance(obj, dict):
        return {k: _to_host(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        converted = [_to_host(v) for v in obj]
        return type(obj)(converted) if isinstance(obj, tuple) else converted
    return obj


def save_to_disk(
    obj: Any,
    path: Union[str, Path],
    metadata: bool = True,
    overwrite: bool = False,
) -> None:
    """Save an object to disk.

    If the object is a dictionary and ``metadata=True``, a ``_meta`` entry is
    added to a copy with timestamp and key information (reference
    io.py:48-55). If the file already exists and ``overwrite=False``, a
    FileExistsError is raised (io.py:42-44).

    Args:
        obj: The Python object to save.
        path: Destination file path.
        metadata: Whether to inject ``_meta`` into dict payloads.
        overwrite: Whether to overwrite an existing file.
    """
    path = Path(path)
    if path.exists() and not overwrite:
        raise FileExistsError(f"File already exists: {path}")

    to_save = _to_host(obj)

    if metadata and isinstance(to_save, dict):
        meta = {
            "timestamp": datetime.datetime.now().isoformat(),
            "keys": list(to_save.keys()),
        }
        to_save = dict(to_save)
        to_save.setdefault("_meta", meta)

    with path.open("wb") as f:
        pickle.dump(to_save, f, protocol=pickle.HIGHEST_PROTOCOL)
