"""Platform pinning for CLI entry points.

This environment registers a tunneled TPU PJRT plugin from sitecustomize and
exports ``JAX_PLATFORMS=axon`` — which silently overrides a user's
``JAX_PLATFORMS=cpu``: the env var is consumed at plugin-registration time,
before user code runs.  The observable failure mode is a "CPU" CLI drive
dispatching per-op over the TPU tunnel (minutes for a tiny model).

``pin_platform_from_env()`` makes the conventional env contract work again:
call it at CLI entry BEFORE any JAX backend initializes, and an explicit
``JAX_PLATFORMS`` naming a non-plugin platform is applied in-process via
``jax.config.update`` (the only override that sticks — same mechanism as
tests/conftest.py and __graft_entry__.py).
"""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "axon" not in plats.split(","):
        import jax

        jax.config.update("jax_platforms", plats)
