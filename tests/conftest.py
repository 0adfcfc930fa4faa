"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
host platform with 8 virtual devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Must be set before jax import / backend init. Note the harness environment
# pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so assign, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon site config can override the env var after import; pin via config.
jax.config.update("jax_platforms", "cpu")

# Enable f64 so the *f64 arithmetic variants are exercised with real double
# precision on CPU (TPU runs them as f32 — see decoder.factory).
jax.config.update("jax_enable_x64", True)
