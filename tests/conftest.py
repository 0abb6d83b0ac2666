"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device mesh on the host platform —
the standard JAX trick for testing pod-slice code without a pod (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).

Note: this environment registers a TPU platform plugin in sitecustomize at
interpreter start, so besides the env vars we must also force the platform
through jax.config (env alone is consulted before the plugin overrides it).
Tests therefore never touch the (single, contended) TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
