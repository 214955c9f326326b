"""Test env: force CPU backend with 8 virtual devices BEFORE backend init.

The baked axon TPU plugin (sitecustomize) claims the backend regardless of
the JAX_PLATFORMS env var, so we must override via ``jax.config`` before the
first device query. Multi-chip sharding is validated on this virtual mesh
(the driver separately dry-runs ``__graft_entry__.dryrun_multichip``);
real-TPU runs happen via ``bench.py`` only.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
