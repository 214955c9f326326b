"""Expert-parallel MoE combine over a device mesh.

The reference's default DSv4 MoE path is NCCL all-gather + local experts +
reduce (docs/models/deepseek-v4/moe-ag-rs.md — chosen over its RDMA
all-to-all path, which measured slower on H200). This is that path on TPU:
activations are replicated (all-gathered by GSPMD), each shard runs only its
local experts for the tokens routed to them, and a psum over the expert
axis combines — collectives ride ICI, inserted explicitly via shard_map.

A `ragged_all_to_all` dispatch variant (tokens shipped instead of
replicated) is the staged optimization for multi-host prefill scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _swiglu(gate, up, limit: float):
    if limit > 0:
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
    return jax.nn.sigmoid(gate) * gate * up


def moe_ep(mesh: Mesh, x, w1, w2, w3, route_idx, route_weights,
           swiglu_limit: float, axis: str = "tp"):
    """Routed-expert MoE with experts sharded over ``axis``.

    x: [T, D] (replicated); w1/w3: [E, I, D]; w2: [E, D, I] (sharded on E);
    route_idx: [T, K] global expert ids; route_weights: [T, K] f32.
    Returns [T, D] f32 — identical math to the dense one-hot combine.
    """
    E = w1.shape[0]
    n_shards = mesh.shape[axis]
    E_loc = E // n_shards

    def local(xs, w1s, w2s, w3s, idx, wts):
        shard = jax.lax.axis_index(axis)
        base = shard * E_loc
        lr = idx - base  # [T, K] local expert ids
        in_local = (lr >= 0) & (lr < E_loc)
        cl = jnp.clip(lr, 0, E_loc - 1)
        xf = xs.astype(jnp.float32)
        # gather the routed experts' weights ([T, K, ...]); decode-sized T
        g = jnp.einsum("td,tkid->tki", xf, w1s[cl].astype(jnp.float32))
        u = jnp.einsum("td,tkid->tki", xf, w3s[cl].astype(jnp.float32))
        act = _swiglu(g, u, swiglu_limit)
        y = jnp.einsum("tki,tkdi->tkd", act, w2s[cl].astype(jnp.float32))
        w_eff = jnp.where(in_local, wts.astype(jnp.float32), 0.0)
        out = jnp.einsum("tk,tkd->td", w_eff, y)
        return jax.lax.psum(out, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )(x, w1, w2, w3, route_idx, route_weights)
