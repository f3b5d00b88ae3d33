"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device behavior (decomposition, halo exchange, collectives) is tested
by running the same code on N virtual devices, mirroring how the reference
tests CAF code by launching N images (SURVEY.md section 4).

jax may already be imported (site preloading) with the tunneled TPU platform
active; force the CPU backend via config, not env vars.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
