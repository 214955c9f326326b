"""Expert-parallel MoE combine over a device mesh.

The reference's default DSv4 MoE path is NCCL all-gather + local experts +
reduce (docs/models/deepseek-v4/moe-ag-rs.md — chosen over its RDMA
all-to-all path, which measured slower on H200). This is that path on TPU:
activations are replicated (all-gathered by GSPMD), each shard runs only its
local experts for the tokens routed to them, and a psum over the expert
axis combines — collectives ride ICI, inserted explicitly via shard_map.

`moe_ep_a2a` is the token-shipping variant (the reference's pplx-ep
RDMA all-to-all analog, pegainfer-comm/src/ep_backend.rs dispatch/combine):
tokens travel to their experts' shards via `lax.ragged_all_to_all` and the
results travel back — O(T·K·D) wire bytes instead of replicating
activations, which is what matters at multi-host prefill scale.
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


def moe_ep_a2a(mesh: Mesh, x, w1, w2, w3, route_idx, route_weights,
               swiglu_limit: float, axis: str = "tp",
               transport: str = "ragged",
               capacity_factor: float = None,
               return_dropped: bool = False):
    """Token-shipping expert-parallel MoE (4-step dispatch/combine).

    x: [T, D] sharded over ``axis`` on T (T % n_shards == 0); w1/w3:
    [E, I, D], w2: [E, D, I] sharded on E; route_idx/route_weights: [T, K]
    sharded on T. Returns [T, D] f32 sharded on T — same math as
    ``moe_ep`` / the dense one-hot combine.

    Per shard: (1) sort local (token, k) slots by destination shard and
    all-to-all the activation rows out (dispatch); (2) re-sort received
    rows by local expert and run grouped GEMMs (lax.ragged_dot_general);
    (3) reverse all-to-all the results back (combine); (4) unsort and
    weighted scatter-add at the origin.

    ``transport``: "ragged" uses ``lax.ragged_all_to_all`` — only the
    actually-routed rows travel (the wire-efficiency point of this path;
    TPU-only: XLA:CPU has no ragged-all-to-all thunk, so it cannot be
    exercised on the virtual CPU mesh). "dense" ships fixed worst-case
    blocks via ``lax.all_to_all`` — same routing/offset/grouping logic,
    runs everywhere; it is the CPU-test oracle for this function.

    ``capacity_factor`` bounds the per-shard receive scratch (the
    reference's EpTopology.max_recv_tokens contract, ep_backend.rs:25-51):
    cap = ceil(cf * M) rows instead of the exact worst case M * n. On
    overflow each receiver ACCEPTS only a prefix of each peer's block
    (acceptance sizes travel back in one extra tiny all_to_all so both
    sides agree); dropped slots contribute ZERO to their token (standard
    capacity-factor MoE semantics) — balanced routing with cf ≥ ~1.25
    never drops. None = exact worst-case buffers (the default: the engine
    path stays bit-exact vs non-EP). ``return_dropped`` additionally
    returns the per-shard dropped-slot count [n] (for tests/telemetry).
    """
    E = w1.shape[0]
    n = mesh.shape[axis]
    E_loc = E // n
    K = route_idx.shape[1]

    def local(xs, w1s, w2s, w3s, idx, wts):
        T_loc, D = xs.shape
        M = T_loc * K
        if capacity_factor is None:
            cap = M * n  # exact: every shard routes all slots here
        else:
            cap = min(M * n, max(8, -(-int(capacity_factor * M) // 8) * 8))

        flat_e = idx.reshape(M)
        dest = flat_e // E_loc  # destination shard per slot
        order = jnp.argsort(dest)  # slots grouped by destination
        send_rows = jnp.concatenate(
            [
                xs.astype(jnp.float32)[jnp.repeat(
                    jnp.arange(T_loc, dtype=jnp.int32), K)],
                (flat_e % E_loc).astype(jnp.float32)[:, None],  # local expert
            ],
            axis=1,
        )[order]  # [M, D+1] in destination order
        send_sizes = jnp.bincount(dest, length=n).astype(jnp.int32)
        input_offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(send_sizes)[:-1].astype(jnp.int32)]
        )
        # size exchange: how much each peer sends me
        want_sizes = jax.lax.all_to_all(
            send_sizes.reshape(n, 1), axis, 0, 0, tiled=False
        ).reshape(n)
        if capacity_factor is None:
            recv_sizes = want_sizes
            acc_for_me = send_sizes
            dropped = jnp.zeros((1,), jnp.int32)  # [1] per shard -> [n] global
        else:
            # acceptance clamp: take each peer's prefix until cap is full,
            # then ship the accepted sizes back so senders truncate the
            # same rows (both sides stay consistent)
            before = jnp.concatenate(
                [jnp.zeros(1, jnp.int32),
                 jnp.cumsum(want_sizes)[:-1].astype(jnp.int32)]
            )
            recv_sizes = jnp.clip(cap - before, 0, want_sizes)
            acc_for_me = jax.lax.all_to_all(
                recv_sizes.reshape(n, 1), axis, 0, 0, tiled=False
            ).reshape(n)
            dropped = jnp.sum(send_sizes - acc_for_me).reshape(1)

        if transport == "ragged":
            # where my data lands in each peer's receive buffer
            recv_offsets = jnp.concatenate(
                [jnp.zeros(1, jnp.int32),
                 jnp.cumsum(recv_sizes)[:-1].astype(jnp.int32)]
            )
            output_offsets = jax.lax.all_to_all(
                recv_offsets.reshape(n, 1), axis, 0, 0, tiled=False
            ).reshape(n)
            # (1) dispatch: rows from peer j land at recv_offsets[j];
            # I ship only the prefixes my peers accept (acc_for_me)
            rx = jax.lax.ragged_all_to_all(
                send_rows,
                jnp.zeros((cap, D + 1), jnp.float32),
                input_offsets, acc_for_me, output_offsets, recv_sizes,
                axis_name=axis,
            )
            rx_valid = jnp.arange(cap) < jnp.sum(recv_sizes)
        else:
            # (1) dispatch, dense blocks: slot for dest d, k-th row = d*M + k.
            # The dense wire is inherently worst-case (n fixed M-row blocks),
            # so its buffers do NOT shrink with the capacity factor — it is
            # the CPU semantics-oracle: acceptance shows up as recv_sizes
            # (clamped prefixes), making rows past the acceptance invalid
            # exactly like the bounded ragged path.
            capD = M * n
            buf = jnp.zeros((capD, D + 1), jnp.float32)
            pos = dest[order] * M + (
                jnp.arange(M, dtype=jnp.int32) - input_offsets[dest[order]]
            )
            buf = buf.at[pos].set(send_rows)
            rx = jax.lax.all_to_all(
                buf.reshape(n, M, D + 1), axis, 0, 0, tiled=False
            ).reshape(capD, D + 1)
            # block j holds recv_sizes[j] ACCEPTED rows
            rx_valid = (jnp.arange(capD, dtype=jnp.int32) % M) < jnp.repeat(
                recv_sizes, M)

        rx_e = jnp.where(rx_valid, rx[:, D].astype(jnp.int32), E_loc)

        # (2) local grouped expert GEMMs. Padding rows carry key E_loc: they
        # sort last, bincount(length=E_loc) drops them, and rows past
        # sum(group_sizes) are outside the ragged region — garbage results
        # that are never consumed.
        e_order = jnp.argsort(rx_e)
        rows = rx[e_order, :D]
        group_sizes = jnp.bincount(rx_e, length=E_loc).astype(jnp.int32)
        dn = jax.lax.RaggedDotDimensionNumbers(
            dot_dimension_numbers=(((1,), (2,)), ((), ())),
            lhs_ragged_dimensions=[0],
            rhs_group_dimensions=[0],
        )
        g = jax.lax.ragged_dot_general(
            rows, w1s.astype(jnp.float32), group_sizes, dn)
        u = jax.lax.ragged_dot_general(
            rows, w3s.astype(jnp.float32), group_sizes, dn)
        act = _swiglu(g, u, swiglu_limit)
        y = jax.lax.ragged_dot_general(
            act, w2s.astype(jnp.float32), group_sizes, dn)  # [cap, D]
        y = jnp.zeros_like(y).at[e_order].set(y)  # back to received order

        # (3) combine: reverse shipment — I return to shard i the rows I
        # ACCEPTED from it; they land where i originally sent them from.
        if transport == "ragged":
            rev_output_offsets = jax.lax.all_to_all(
                input_offsets.reshape(n, 1), axis, 0, 0, tiled=False
            ).reshape(n)
            back = jax.lax.ragged_all_to_all(
                y,
                jnp.zeros((M, D), jnp.float32),
                recv_offsets, recv_sizes, rev_output_offsets, acc_for_me,
                axis_name=axis,
            )  # [M, D] aligned with send_rows (destination order)
        else:
            back_blocks = jax.lax.all_to_all(
                y.reshape(n, M, D), axis, 0, 0, tiled=False
            ).reshape(M * n, D)
            back = back_blocks[pos]  # undo the dispatch scatter layout

        # (4) unsort + weighted combine at the origin. Slots past a peer's
        # acceptance contribute ZERO (the ragged back-buffer never writes
        # them; the dense oracle's garbage rows are masked explicitly).
        dest_sorted = dest[order]
        accepted = (
            jnp.arange(M, dtype=jnp.int32) - input_offsets[dest_sorted]
        ) < acc_for_me[dest_sorted]
        flat_t = jnp.repeat(jnp.arange(T_loc, dtype=jnp.int32), K)
        w_flat = wts.astype(jnp.float32).reshape(M)
        out = jnp.zeros((T_loc, D), jnp.float32).at[flat_t[order]].add(
            back * jnp.where(accepted, w_flat[order], 0.0)[:, None]
        )
        return out, dropped

    out, dropped = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )(x, w1, w2, w3, route_idx, route_weights)
    if return_dropped:
        return out, dropped
    return out


def moe_ep_a2a_chunked(mesh: Mesh, x, w1, w2, w3, route_idx, route_weights,
                       swiglu_limit: float, axis: str = "tp",
                       transport: str = "ragged",
                       capacity_factor: float = None,
                       chunk_tokens: int = 1024):
    """``moe_ep_a2a`` with the dispatch/combine wire scratch bounded PER
    CHUNK instead of per call (VERDICT r3 #8; reference contract:
    EpTopology.max_recv_tokens sizes the rank buffers ONCE,
    pegainfer-comm/src/ep_backend.rs:25-97 — a prompt-sized prefill must
    not inflate them). Rows are processed in ``chunk_tokens``-token global
    chunks under one lax.scan (one traced a2a body); scratch per shard is
    ∝ chunk_tokens·K rather than T·K. Same math as moe_ep_a2a: chunks
    partition the token axis and MoE is token-independent.
    """
    T, D = x.shape
    n = mesh.shape[axis]
    # per-chunk global rows: multiple of n (shard_map needs equal shards)
    per = max(n, (min(chunk_tokens, T) // n) * n)
    if T <= per:
        return moe_ep_a2a(mesh, x, w1, w2, w3, route_idx, route_weights,
                          swiglu_limit, axis=axis, transport=transport,
                          capacity_factor=capacity_factor)
    C = -(-T // per)
    pad = C * per - T
    xs = jnp.pad(x, ((0, pad), (0, 0))).reshape(C, per, D)
    idxs = jnp.pad(route_idx, ((0, pad), (0, 0))).reshape(
        C, per, route_idx.shape[1])
    wtss = jnp.pad(route_weights, ((0, pad), (0, 0))).reshape(
        C, per, route_weights.shape[1])  # pad rows: weight 0 → contribute 0

    def body(_, args):
        xc, ic, wc = args
        out = moe_ep_a2a(mesh, xc, w1, w2, w3, ic, wc, swiglu_limit,
                         axis=axis, transport=transport,
                         capacity_factor=capacity_factor)
        return None, out

    _, outs = jax.lax.scan(body, None, (xs, idxs, wtss))
    return outs.reshape(C * per, D)[:T]
