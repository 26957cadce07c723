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
