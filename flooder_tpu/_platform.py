"""Config-level CPU-backend forcing shared by every CPU-targeted entry
point (bench, examples, pricing tools, viz generators).

The environment may force-register an accelerator plugin regardless of
``JAX_PLATFORMS`` (sitecustomize), so the env var alone does not stop a
CPU-targeted script from initializing — and hanging on a wedged — TPU.
Applying the request at the jax *config* level before the first backend
use does. This lives in its own module with no package side effects so
call sites can run it before anything touches a backend; importing jax
(or this package) is safe — only the first backend *use* initializes.
"""

import os


def force_cpu_if_requested() -> bool:
    """Honor ``JAX_PLATFORMS=cpu`` at the jax config level.

    Must be called before the first jax backend use. Whitespace and case
    in the env value are tolerated (every entry point gets identical
    semantics — a ``"cpu "`` value must not force CPU in one script and
    initialize the TPU in another). Returns True iff CPU was forced.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        return False
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
