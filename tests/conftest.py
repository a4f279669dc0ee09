"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding paths (jax.sharding.Mesh + shard_map) are validated on a
virtual 8-device CPU mesh, since only one physical TPU chip is available in
this environment.  The flags must be set before JAX initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
# Oracle tests compare against float64 numpy references; x64 stays available
# while library code remains explicitly float32 on its hot paths.
jax.config.update("jax_enable_x64", True)
