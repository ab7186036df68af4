"""Restore standard JAX platform-selection semantics.

This environment's axon sitecustomize calls register() at interpreter start,
which force-sets jax_platforms="axon,cpu" via jax.config — silently trumping
a user's JAX_PLATFORMS environment variable. Calling
:func:`honor_jax_platforms_env` early re-applies the env var (standard JAX
behavior: the env var wins)."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
