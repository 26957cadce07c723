"""Test harness config: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the remote-TPU ('axon') PJRT plugin and pins it at
interpreter start, so plain env vars are too late — we reconfigure jax and clear the
backend cache before any test touches a device.  Data-parallel tests then exercise a real
8-device mesh without TPU hardware (SURVEY §4: the JAX-native fake backend).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Share a persistent compilation cache across the whole suite (and with the CLI
# subprocess tests, which inherit SEGAN_TPU_COMPILE_CACHE via the environment):
# tests/test_cli.py recompiles the same tiny models per subprocess otherwise.
_cache_dir = os.environ.setdefault("SEGAN_TPU_COMPILE_CACHE",
                                   "/tmp/segan_tpu_xla_cache_tests")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
