"""Fast TPU-tunnel health probe (exits in seconds, never hangs).

The axon relay lives OUTSIDE the container; when it is down,
``jax.devices()`` hangs forever. This probes the relay's TCP ports first
(remote_compile :8083 + pool ports) and only touches JAX when a port is
open, with a hard alarm. Exit 0 = chip reachable and a tiny op ran.

Use before launching any long TPU run: ``python scripts/tpu_probe.py``.
"""

import pathlib
import signal
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pegainfer_tpu.utils.tpu_health import RELAY_PORTS, port_open  # noqa: E402


def main() -> int:
    open_ports = [p for p in RELAY_PORTS if port_open(p)]
    if not open_ports:
        print("tpu_probe: relay DOWN (no ports open) — infra outage, "
              "nothing in-container can restart it", flush=True)
        return 2
    print(f"tpu_probe: relay ports open: {open_ports}; trying a device op",
          flush=True)
    signal.alarm(120)  # hard kill if the claim leg wedges anyway
    import jax
    import numpy as np

    print(jax.devices(), flush=True)
    x = jax.numpy.ones((128, 128))
    print("op ok:", float(np.asarray(x @ x).sum()), flush=True)
    signal.alarm(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
