"""Test env: force CPU backend with 8 virtual devices BEFORE jax imports.

Multi-chip sharding is validated on this virtual mesh (the driver separately
dry-runs ``__graft_entry__.dryrun_multichip``); real-TPU runs happen via
``bench.py`` only.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
