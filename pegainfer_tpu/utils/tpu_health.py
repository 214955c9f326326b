"""Axon relay health: one source of truth for the tunnel port set.

The relay lives OUTSIDE the container; when it is down ``jax.devices()``
hangs forever. Check ports BEFORE touching JAX (scripts/tpu_probe.py,
bench.py), and bound backend init with an alarm for the port-open-but-
wedged case.
"""

from __future__ import annotations

import socket

# remote_compile :8083 + pool ports (libaxon_pjrt.so strings)
RELAY_PORTS = (8083, 3333, 9966, 55664, 55666)


def port_open(port: int, timeout_s: float = 2.0) -> bool:
    s = socket.socket()
    s.settimeout(timeout_s)
    try:
        s.connect(("127.0.0.1", port))
        return True
    except OSError:
        return False
    finally:
        s.close()


def relay_up() -> bool:
    return any(port_open(p) for p in RELAY_PORTS)
