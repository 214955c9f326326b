"""Native host runtime core (C++ extension) with build-on-demand loading.

``get_module()`` returns the compiled ``pegainfer_host`` module, building it
on first use (cached under this package). Returns None if no compiler is
available — callers fall back to the pure-Python implementations in
``engine/kv.py`` (identical semantics, pinned by tests/test_native_host.py).
"""

from __future__ import annotations

import importlib.util
import logging
import os
import subprocess
import sys
import sysconfig

log = logging.getLogger("pegainfer.native")

_PKG_DIR = os.path.dirname(__file__)
_REPO_ROOT = os.path.dirname(os.path.dirname(_PKG_DIR))
_SRC = os.path.join(_REPO_ROOT, "native", "pegainfer_host.cpp")
_cached = None
_attempted = False


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_PKG_DIR, f"pegainfer_host{suffix}")


def build(force: bool = False) -> str:
    """Compile the extension directly with the platform compiler."""
    so = _so_path()
    if not force and os.path.exists(so) and (
        os.path.getmtime(so) >= os.path.getmtime(_SRC)
    ):
        return so
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", so,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def get_module(auto_build: bool = True):
    global _cached, _attempted
    if _cached is not None or _attempted:
        return _cached
    _attempted = True
    if os.environ.get("PEGAINFER_NO_NATIVE") == "1":
        return None
    try:
        so = build() if auto_build else _so_path()
        spec = importlib.util.spec_from_file_location("pegainfer_host", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["pegainfer_host"] = mod
        _cached = mod
        log.info("native host runtime loaded (%s)", so)
    except Exception as e:  # noqa: BLE001 — fall back to Python
        log.warning("native host runtime unavailable (%s); using Python", e)
        _cached = None
    return _cached
