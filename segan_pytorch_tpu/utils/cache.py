"""Persistent XLA compilation cache setup.

Remote-compiled TPU programs for the full fused step take minutes to build; caching them
on disk makes every process after the first start in seconds. Called by the CLIs and
bench; safe to call multiple times.
"""
from __future__ import annotations

import os


def force_platform_from_env():
    """Honor SEGAN_TPU_PLATFORM=cpu|tpu (the container's sitecustomize pins the TPU
    backend at interpreter start, so plain JAX_PLATFORMS is too late — this clears the
    backend cache after reconfiguring). Useful for CI and for driving the CLIs while
    the single TPU chip is busy."""
    want = os.environ.get("SEGAN_TPU_PLATFORM")
    if not want:
        return
    import jax

    if want == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", want)
    try:
        import jax.extend.backend as jeb

        jeb.clear_backends()
    except Exception:
        pass


def enable_compilation_cache(path: str = None):
    import jax

    force_platform_from_env()

    path = path or os.environ.get("SEGAN_TPU_COMPILE_CACHE",
                                  "/tmp/segan_tpu_xla_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never let cache setup break training
        print(f"[!] compilation cache disabled: {e}")
