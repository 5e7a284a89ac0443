from .device import as_jax_array, resolve_device, default_backend
from .timing import StepTimer, StepStats

__all__ = [
    "as_jax_array",
    "resolve_device",
    "default_backend",
    "StepTimer",
    "StepStats",
]
