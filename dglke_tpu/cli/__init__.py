"""CLI entry points.

Platform selection: some deployments register a TPU backend from
``sitecustomize`` at interpreter startup and pin ``JAX_PLATFORMS`` in the
environment before the user's shell can override it.  Re-applying the
value seen at CLI start through ``jax.config`` makes
``JAX_PLATFORMS=cpu dglke_tpu-train ...`` behave as documented: the
config value is read when the backend initializes, which is after this
module imports (the first ``jax.devices()`` happens inside the tool).
"""

import os


def _apply_platform_env() -> None:
    plat = os.environ.get("DGLKE_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized or jax unavailable; keep going


_apply_platform_env()
