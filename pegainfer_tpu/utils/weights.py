"""Safetensors checkpoint loading (HF layout).

Reference analog: pegainfer-core/src/weight_loader.rs:16-310 (mmap'd
safetensors shards → device). Here safetensors hands back host arrays
(bf16-capable via ml_dtypes) and the caller moves them to device — sharded
placement happens via ``parallel.sharding.place_tree`` (the GSPMD replacement
for the reference's row/col shard loaders).
"""

from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict


def safetensor_files(model_path: str) -> list:
    index = os.path.join(model_path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            idx = json.load(f)
        files = sorted({v for v in idx["weight_map"].values()})
        return [os.path.join(model_path, f) for f in files]
    files = sorted(glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {model_path}")
    return files


def load_state_dict(model_path: str) -> Dict[str, object]:
    """All tensors as host numpy arrays (bf16 via ml_dtypes)."""
    from safetensors import numpy as st_numpy

    sd: Dict[str, object] = {}
    for path in safetensor_files(model_path):
        sd.update(st_numpy.load_file(path))
    return sd
