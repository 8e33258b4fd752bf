"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without a TPU pod (SURVEY.md §4 item 5).

The environment may pre-register a TPU plugin at interpreter startup (e.g.
the axon sitecustomize), which locks the platform before env vars are read —
so the override must go through jax.config, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
