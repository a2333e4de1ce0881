"""Process-level runtime knobs shared by the CLI entry points."""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    """Re-apply ``JAX_PLATFORMS`` after any early jax import.

    Some runtimes install a ``sitecustomize`` that imports jax (and
    registers a hardware plugin) before this process's environment is
    consulted, freezing the platform selection — a ``JAX_PLATFORMS=cpu``
    test/CI run would silently grab the real accelerator and contend
    with whatever is using it.  Calling this first thing in ``main()``
    restores the documented env-var contract; it is a no-op once a
    backend is actually initialised.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
