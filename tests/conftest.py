"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device behavior (decomposition, halo exchange, collectives) is tested
by running the same code on N virtual devices, mirroring how the reference
tests CAF code by launching N images (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
