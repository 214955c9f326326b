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


# ── engine path: EP MoE behind the flag (VERDICT #5) ─────────────────────


def _tiny_dsv4_cfg():
    from pegainfer_tpu.models import dsv4

    return dsv4.DSv4Config(
        vocab_size=128, dim=32, moe_inter_dim=16, n_layers=3,
        num_attention_heads=8, head_dim=16, q_lora_rank=16,
        qk_rope_head_dim=8, o_groups=8, o_lora_rank=4, sliding_window=8,
        n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
        n_hash_layers=1, routed_scaling_factor=1.5, swiglu_limit=7.0,
        rms_norm_eps=1e-6, index_n_heads=8, index_head_dim=16, index_topk=4,
        max_position_embeddings=4096, rope_theta=1e4,
        compress_rope_theta=1e4, compress_ratios=(0, 4, 0),
        yarn_original_seq_len=256, yarn_factor=4.0,
    )


def test_engine_path_moe_ep_a2a():
    """The full DSv4 engine (scheduler + executor + grouped runtime) with
    expert-parallel a2a MoE enabled produces the same greedy tokens as the
    default path (dense transport = the CPU oracle for the ragged wire;
    reference analog: the PEGAINFER_DSV4_PPLX-gated pplx-ep path)."""
    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.models import dsv4, dsv4_engine

    cfg = _tiny_dsv4_cfg()
    params = dsv4.init_random_params(cfg, seed=5, dtype=jnp.float32)
    prompts = [list(range(2, 14)), [7, 9, 21, 33, 5, 80, 80, 3, 14]]

    def gen(ep_mode):
        runtime = dsv4_engine.make_runtime(cfg, params, max_model_len=64,
                                           max_slots=2)
        if ep_mode:
            assert dsv4_engine.maybe_enable_moe_ep(cfg, runtime, mode=ep_mode)
        engine = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
        outs = []
        try:
            for p in prompts:
                r = GenerateRequest(prompt_tokens=list(p), max_tokens=6,
                                    params=SamplingParams(ignore_eos=True))
                engine.submit(r)
                toks = []
                for ev in r.channel:
                    if isinstance(ev, Token):
                        toks.append(ev.id)
                    elif isinstance(ev, Finished):
                        break
                outs.append(toks)
        finally:
            engine.shutdown()
            dsv4.clear_moe_ep()
        return outs

    base = gen(None)
    ep = gen("dense")
    assert all(len(t) == 6 for t in base)
    assert ep == base


def test_engine_path_moe_ep_prefill_logits_close():
    """Runtime-level: prefill logits with EP on vs off agree to bf16
    tolerance (the non-EP grouped path dequantizes/computes routed experts
    in bf16 — round 3; the EP shard_map path keeps f32 GEMMs)."""
    from pegainfer_tpu.models import dsv4, dsv4_engine

    cfg = _tiny_dsv4_cfg()
    params = dsv4.init_random_params(cfg, seed=6, dtype=jnp.float32)
    toks = jnp.asarray(np.arange(2, 18) % 100, jnp.int32)

    def logits(ep):
        runtime = dsv4_engine.make_runtime(cfg, params, max_model_len=64,
                                           max_slots=2)
        if ep:
            dsv4_engine.maybe_enable_moe_ep(cfg, runtime, mode="dense")
        try:
            state, last, _ = runtime.prefill_fn(
                runtime.params, runtime.state, toks, jnp.int32(toks.shape[0]),
                None, jnp.int32(0))
            return np.asarray(last)
        finally:
            dsv4.clear_moe_ep()

    np.testing.assert_allclose(logits(True), logits(False),
                               rtol=3e-2, atol=3e-2)


def test_engine_path_moe_ep2():
    """EP=2 minimal expert-parallel reference (the deepseek-v2-lite crate's
    role, e2e_ep2.rs): experts split across TWO devices of the mesh; greedy
    tokens equal the single-device path; the output hash is printed so runs
    are comparable across environments (the reference pins sha256 hashes of
    its EP2 outputs)."""
    import hashlib

    from pegainfer_tpu.engine.contract import (
        EngineLoadOptions, Finished, GenerateRequest, SamplingParams, Token,
    )
    from pegainfer_tpu.engine.jax_executor import JaxExecutor
    from pegainfer_tpu.engine.scheduler import start_scheduler
    from pegainfer_tpu.models import dsv4, dsv4_engine
    from pegainfer_tpu.parallel.sharding import shard_dsv4_grouped

    cfg = _tiny_dsv4_cfg()
    params = dsv4.init_random_params(cfg, seed=11, dtype=jnp.float32)
    prompt = [5, 9, 2, 77, 31, 8, 64, 3, 22, 90]

    def gen(ep2: bool):
        runtime = dsv4_engine.make_runtime(cfg, params, max_model_len=64,
                                           max_slots=2)
        if ep2:
            from jax.sharding import Mesh

            mesh = Mesh(np.asarray(jax.devices()[:2]), ("tp",))
            dsv4.set_moe_ep(mesh, "tp", "dense")
            runtime.params, runtime.state = shard_dsv4_grouped(
                mesh, runtime.params, runtime.state
            )
        engine = start_scheduler(JaxExecutor(runtime, EngineLoadOptions()))
        try:
            r = GenerateRequest(prompt_tokens=list(prompt), max_tokens=8,
                                params=SamplingParams(ignore_eos=True))
            engine.submit(r)
            toks = []
            for ev in r.channel:
                if isinstance(ev, Token):
                    toks.append(ev.id)
                elif isinstance(ev, Finished):
                    break
            return toks
        finally:
            engine.shutdown()
            dsv4.clear_moe_ep()

    base = gen(False)
    ep2 = gen(True)
    assert len(base) == 8
    assert ep2 == base
    digest = hashlib.sha256(",".join(map(str, ep2)).encode()).hexdigest()[:16]
    print(f"ep2 output hash: {digest}")


# ── capacity-factor bounded a2a (VERDICT r2 #6) ──────────────────────────
# Reference analog: EpTopology.max_recv_tokens — receive buffers are a
# sized contract, not worst-case (pegainfer-comm/src/ep_backend.rs:25-51).


def _a2a_setup(seed, T, D, I, E, K, route_idx=None):
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a  # noqa: F401

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((T, D)).astype(np.float32)
    w1 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, D, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    if route_idx is None:
        route_idx = np.stack(
            [rng.choice(E, K, replace=False) for _ in range(T)]
        ).astype(np.int32)
    route_w = rng.random((T, K)).astype(np.float32)
    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    sh = lambda a, spec: place_tree(mesh, jnp.asarray(a), spec)  # noqa: E731
    return (mesh, x, w1, w2, w3, route_idx, route_w,
            sh(x, P("tp")), sh(w1, P("tp")), sh(w2, P("tp")),
            sh(w3, P("tp")), sh(route_idx, P("tp")), sh(route_w, P("tp")))


def test_moe_ep_a2a_capacity_no_drop_when_balanced():
    """Balanced routing under cf=2: zero drops, output == exact path."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a

    (mesh, x, w1, w2, w3, ri, rw,
     xs, w1s, w2s, w3s, idxs, wtss) = _a2a_setup(7, 16, 16, 8, 16, 3)
    out, dropped = moe_ep_a2a(mesh, xs, w1s, w2s, w3s, idxs, wtss, 7.0,
                              transport="dense", capacity_factor=2.0,
                              return_dropped=True)
    assert int(np.sum(np.asarray(dropped))) == 0
    ref = dense_reference(x, w1, w2, w3, ri, rw, 7.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_moe_ep_a2a_capacity_overflow_drops_consistently():
    """Adversarial all-to-one-shard routing under a small cf: overflow is
    detected (dropped > 0) and the output equals the oracle restricted to
    the ACCEPTED slots — dropped slots contribute exactly zero, no OOB
    writes, no garbage rows."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a

    T, D, I, E, K = 16, 8, 4, 16, 2
    # every token routes to experts 4,5 → all M*n slots target shard 2
    route_idx = np.tile(np.array([[4, 5]], np.int32), (T, 1))
    (mesh, x, w1, w2, w3, ri, rw,
     xs, w1s, w2s, w3s, idxs, wtss) = _a2a_setup(8, T, D, I, E, K, route_idx)
    n = 8
    T_loc = T // n
    M = T_loc * K  # 4 slots per shard
    cf = 2.0  # cap = 8 accepted rows on shard 2 vs 32 wanted
    out, dropped = moe_ep_a2a(mesh, xs, w1s, w2s, w3s, idxs, wtss, 7.0,
                              transport="dense", capacity_factor=cf,
                              return_dropped=True)
    dropped = np.asarray(dropped)
    cap = max(8, int(cf * M))
    assert int(dropped.sum()) == M * n - cap, dropped

    # oracle over accepted slots only: receiver (shard 2) accepts each
    # peer's block prefix in shard order until cap rows
    accepted_rw = rw.copy()
    taken = 0
    for shard in range(n):
        for t in range(shard * T_loc, (shard + 1) * T_loc):
            for k in range(K):
                if taken >= cap:
                    accepted_rw[t, k] = 0.0
                taken += 1
    ref = dense_reference(x, w1, w2, w3, ri, accepted_rw, 7.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_moe_ep_a2a_capacity_scratch_is_bounded():
    """The ragged receive buffer is cap = ceil(cf*M) rows (∝ cf), not M*n:
    pinned by inspecting the jaxpr's zeros-buffer shape."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a

    (mesh, x, w1, w2, w3, ri, rw,
     xs, w1s, w2s, w3s, idxs, wtss) = _a2a_setup(9, 16, 16, 8, 16, 3)
    T_loc, K, n = 2, 3, 8
    M = T_loc * K

    def shapes_of(cf):
        jaxpr = jax.make_jaxpr(
            lambda *a: moe_ep_a2a(mesh, *a, 7.0, transport="ragged",
                                  capacity_factor=cf)
        )(xs, w1s, w2s, w3s, idxs, wtss)
        return str(jaxpr)

    # exact: a (M*n, D+1) = (48, 17) buffer appears; cf=1.5: (16, 17)
    assert "48,17" in shapes_of(None).replace(" ", "")
    cap = max(8, -(-int(1.5 * M) // 8) * 8)
    assert f"{cap},17" in shapes_of(1.5).replace(" ", "")
    assert "48,17" not in shapes_of(1.5).replace(" ", "")


def test_moe_ep_a2a_chunked_matches_unchunked():
    """Chunked dispatch (wire scratch ∝ chunk) == one-shot a2a == dense
    reference at a prompt-scale T, and the traced program's all_to_all
    buffers are bounded by the CHUNK row count, not T (VERDICT r3 #8;
    reference EpTopology.max_recv_tokens contract, ep_backend.rs:25-97)."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a, moe_ep_a2a_chunked

    rng = np.random.default_rng(7)
    T, D, I, E, K = 128, 16, 8, 8, 2
    chunk = 32
    x = rng.standard_normal((T, D)).astype(np.float32)
    w1 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, D, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    route_idx = np.stack([rng.choice(E, K, replace=False)
                          for _ in range(T)]).astype(np.int32)
    route_w = rng.random((T, K)).astype(np.float32)

    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    w1s = place_tree(mesh, jnp.asarray(w1), P("tp"))
    w2s = place_tree(mesh, jnp.asarray(w2), P("tp"))
    w3s = place_tree(mesh, jnp.asarray(w3), P("tp"))
    xs = place_tree(mesh, jnp.asarray(x), P("tp"))
    idxs = place_tree(mesh, jnp.asarray(route_idx), P("tp"))
    wtss = place_tree(mesh, jnp.asarray(route_w), P("tp"))

    one = moe_ep_a2a(mesh, xs, w1s, w2s, w3s, idxs, wtss, 7.0,
                     transport="dense")
    chk = moe_ep_a2a_chunked(mesh, xs, w1s, w2s, w3s, idxs, wtss, 7.0,
                             transport="dense", chunk_tokens=chunk)
    np.testing.assert_allclose(np.asarray(chk), np.asarray(one),
                               rtol=1e-5, atol=1e-5)
    ref = dense_reference(x, w1, w2, w3, route_idx, route_w, 7.0)
    np.testing.assert_allclose(np.asarray(chk), ref, rtol=2e-4, atol=2e-4)

    # scratch-bytes assertion: every all_to_all in the chunked program is
    # bounded by the chunk's worst case (chunk_tokens/n per shard x K x n
    # rows x (D+1)); the one-shot program carries a T-scale buffer.
    def a2a_rows(fn, *args):
        txt = jax.jit(fn).lower(*args).as_text()
        import re
        rows = []
        for m in re.finditer(r'all_to_all[^\n]*tensor<([0-9x]+)xf32>', txt):
            dims = [int(d) for d in m.group(1).split("x")]
            if dims[-1] == D + 1:  # dispatch payload buffers
                rows.append(int(np.prod(dims[:-1])))
        return max(rows) if rows else 0

    n = 8
    per_shard_chunk = chunk // n
    chunk_worst = per_shard_chunk * K * n  # dense dispatch block rows
    big = a2a_rows(lambda *a: moe_ep_a2a(mesh, *a, 7.0, transport="dense"),
                   xs, w1s, w2s, w3s, idxs, wtss)
    small = a2a_rows(
        lambda *a: moe_ep_a2a_chunked(mesh, *a, 7.0, transport="dense",
                                      chunk_tokens=chunk),
        xs, w1s, w2s, w3s, idxs, wtss)
    assert big >= (T // n) * K * n, big
    assert 0 < small <= chunk_worst, (small, chunk_worst)


def test_moe_ep_a2a_chunked_capacity_overflow():
    """Chunking composes with the capacity-factor acceptance clamp: skewed
    routing overflows per-chunk caps; dropped slots contribute zero and
    the surviving output matches the per-chunk unchunked run."""
    from pegainfer_tpu.ops.moe_ep import moe_ep_a2a, moe_ep_a2a_chunked

    rng = np.random.default_rng(9)
    T, D, I, E, K = 64, 8, 4, 8, 2
    chunk = 16
    x = rng.standard_normal((T, D)).astype(np.float32)
    w1 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, D, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, D)).astype(np.float32) * 0.2
    route_idx = np.zeros((T, K), np.int32)  # everything to experts 0/1
    route_idx[:, 1] = 1
    route_w = rng.random((T, K)).astype(np.float32)

    mesh = make_mesh(MeshConfig(dp=1, tp=8))
    place = lambda a, p: place_tree(mesh, jnp.asarray(a), p)  # noqa: E731
    args = (place(x, P("tp")), place(w1, P("tp")), place(w2, P("tp")),
            place(w3, P("tp")), place(route_idx, P("tp")),
            place(route_w, P("tp")))

    cf = 0.75
    chk = moe_ep_a2a_chunked(mesh, *args, 7.0, transport="dense",
                             capacity_factor=cf, chunk_tokens=chunk)
    # oracle: run each chunk unchunked with the same cf
    outs = []
    for c0 in range(0, T, chunk):
        sl = slice(c0, c0 + chunk)
        outs.append(np.asarray(moe_ep_a2a(
            mesh, place(x[sl], P("tp")), args[1], args[2], args[3],
            place(route_idx[sl], P("tp")), place(route_w[sl], P("tp")),
            7.0, transport="dense", capacity_factor=cf)))
    np.testing.assert_allclose(np.asarray(chk), np.concatenate(outs),
                               rtol=1e-5, atol=1e-5)
