"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding paths are
exercised on a virtual 8-device CPU mesh. This must happen before jax is
imported anywhere.

Set ``FLOODER_TEST_TPU=1`` to keep the real accelerator visible instead —
this is how the hardware-gated tests (e.g. the on-TPU FPS parity case)
are actually executed on a chip (tools/tpu_session.sh phase2).
"""

import os
import sys

ON_TPU = bool(os.environ.get("FLOODER_TEST_TPU"))
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize may force-register an accelerator platform
# regardless of JAX_PLATFORMS; override it at the config level before any
# backend is initialized.
import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
