"""Persistent XLA compilation cache setup.

First compiles through the remote TPU tunnel take minutes; with the on-disk
cache, restarted runs (resume, eval sweeps, benches) reuse compiled programs.
Call before the first jit; safe no-op if the backend rejects the config.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    try:
        if jax.config.jax_platforms == "cpu":
            # CPU-forced runs (tests, dryruns, CPU smokes): compiles are fast
            # and cached XLA:CPU AOT executables carry machine-feature
            # mismatches across hosts (cpu_aot_loader warnings; observed
            # intermittent SIGABRT mid-suite when a stale executable with an
            # unsupported instruction path runs). The cache exists for the
            # minutes-long remote TPU compiles — skip it on CPU.
            return
    except Exception:
        pass
    if cache_dir is None:
        cache_dir = os.environ.get(
            "TOMOSAR_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "tomosar2height_tpu", "jax"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def select_platform(platform: str | None) -> None:
    """Force the JAX platform from config (``device.platform``) — the TPU-side
    equivalent of the reference's ``gpu_id`` device selection (train.py:20-21).

    Must run before backend initialization. NOTE the JAX_PLATFORMS env var is
    NOT enough in axon environments (a site hook rewrites it after reading);
    the explicit config update is authoritative.
    """
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", str(platform))
    except RuntimeError as e:  # backends already initialized
        import logging

        logging.getLogger(__name__).warning(
            "device.platform=%s ignored: %s", platform, e)
