"""Expert-parallel MoE (shard_map over 8 virtual devices) vs dense combine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pegainfer_tpu.ops.moe_ep import moe_ep, _swiglu
from pegainfer_tpu.parallel.sharding import MeshConfig, make_mesh, place_tree
from jax.sharding import PartitionSpec as P


def dense_reference(x, w1, w2, w3, route_idx, route_weights, limit):
    T, K = route_idx.shape
    E = w1.shape[0]
    xf = x.astype(np.float32)
    out = np.zeros((T, x.shape[1]), np.float32)
    for t in range(T):
        for k in range(K):
            e = int(route_idx[t, k])
            g = xf[t] @ np.asarray(w1[e], np.float32).T
            u = xf[t] @ np.asarray(w3[e], np.float32).T
            act = np.asarray(_swiglu(jnp.asarray(g), jnp.asarray(u), limit))
            out[t] += float(route_weights[t, k]) * (
                act @ np.asarray(w2[e], np.float32).T
            )
    return out


def test_moe_ep_matches_dense():
    rng = np.random.default_rng(0)
    T, D, I, E, K = 3, 16, 8, 8, 2
    x = rng.standard_normal((T, D)).astype(np.float32)
    w1 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, D, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    route_idx = np.stack([rng.choice(E, K, replace=False) for _ in range(T)]).astype(np.int32)
    route_w = rng.random((T, K)).astype(np.float32)

    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    w1s = place_tree(mesh, jnp.asarray(w1), P("tp"))
    w2s = place_tree(mesh, jnp.asarray(w2), P("tp"))
    w3s = place_tree(mesh, jnp.asarray(w3), P("tp"))

    out = moe_ep(mesh, jnp.asarray(x), w1s, w2s, w3s,
                 jnp.asarray(route_idx), jnp.asarray(route_w), 7.0)
    ref = dense_reference(x, w1, w2, w3, route_idx, route_w, 7.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_moe_ep_jits_under_mesh():
    rng = np.random.default_rng(1)
    T, D, I, E, K = 2, 8, 4, 8, 2
    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    w1 = place_tree(mesh, jnp.asarray(rng.standard_normal((E, I, D)), jnp.float32), P("tp"))
    w2 = place_tree(mesh, jnp.asarray(rng.standard_normal((E, D, I)), jnp.float32), P("tp"))
    w3 = place_tree(mesh, jnp.asarray(rng.standard_normal((E, I, D)), jnp.float32), P("tp"))
    idx = jnp.asarray(rng.integers(0, E, (T, K)), jnp.int32)
    wts = jnp.asarray(rng.random((T, K)), jnp.float32)

    f = jax.jit(lambda *a: moe_ep(mesh, *a, 7.0))
    a = f(x, w1, w2, w3, idx, wts)
    b = moe_ep(mesh, x, w1, w2, w3, idx, wts, 7.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_moe_ep_a2a_matches_dense():
    """Token-shipping path (ragged_all_to_all dispatch/combine) == dense."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a

    rng = np.random.default_rng(2)
    T, D, I, E, K = 16, 16, 8, 16, 3  # T % 8 == 0 (sharded on T)
    x = rng.standard_normal((T, D)).astype(np.float32)
    w1 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, D, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    route_idx = np.stack(
        [rng.choice(E, K, replace=False) for _ in range(T)]
    ).astype(np.int32)
    route_w = rng.random((T, K)).astype(np.float32)

    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    w1s = place_tree(mesh, jnp.asarray(w1), P("tp"))
    w2s = place_tree(mesh, jnp.asarray(w2), P("tp"))
    w3s = place_tree(mesh, jnp.asarray(w3), P("tp"))
    xs = place_tree(mesh, jnp.asarray(x), P("tp"))
    idxs = place_tree(mesh, jnp.asarray(route_idx), P("tp"))
    wtss = place_tree(mesh, jnp.asarray(route_w), P("tp"))

    out = moe_ep_a2a(mesh, xs, w1s, w2s, w3s, idxs, wtss, 7.0,
                     transport="dense")
    ref = dense_reference(x, w1, w2, w3, route_idx, route_w, 7.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_moe_ep_a2a_skewed_routing():
    """All tokens routed to one shard's experts (worst-case skew)."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a

    rng = np.random.default_rng(3)
    T, D, I, E, K = 8, 8, 4, 16, 2
    x = rng.standard_normal((T, D)).astype(np.float32)
    w1 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, D, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    # experts 4 and 5 both live on shard 2 (E_loc = 2)
    route_idx = np.tile(np.array([[4, 5]], np.int32), (T, 1))
    route_w = rng.random((T, K)).astype(np.float32)

    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    w1s = place_tree(mesh, jnp.asarray(w1), P("tp"))
    w2s = place_tree(mesh, jnp.asarray(w2), P("tp"))
    w3s = place_tree(mesh, jnp.asarray(w3), P("tp"))
    xs = place_tree(mesh, jnp.asarray(x), P("tp"))
    idxs = place_tree(mesh, jnp.asarray(route_idx), P("tp"))
    wtss = place_tree(mesh, jnp.asarray(route_w), P("tp"))

    out = moe_ep_a2a(mesh, xs, w1s, w2s, w3s, idxs, wtss, 7.0,
                     transport="dense")
    ref = dense_reference(x, w1, w2, w3, route_idx, route_w, 7.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
