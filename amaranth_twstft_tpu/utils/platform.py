"""Platform setup helpers for the axon-relayed TPU environment."""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache", "force_cpu"]


def enable_compile_cache(path: str = "/root/.cache/jax") -> None:
    """Enable JAX's persistent compilation cache.

    Cold compiles of the correlator program take minutes via the remote-
    compile relay; the axon registration hooks route cache hits through a
    fingerprint-keyed sidechannel, but only if JAX's cache is enabled at
    all.  Call before the first jit execution.
    """
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """Switch this process to the CPU backend.

    The session environment pins ``jax_platforms="axon,cpu"`` via
    sitecustomize at interpreter start, so env vars alone cannot switch —
    the config must be updated after importing jax.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
