"""Prefill/decode disaggregation (PD handoff).

A prefill-side executor runs the prompt, then the request MOVES to a
decode-side executor with its own KV pool and state — in deployment a
different host or mesh slice. The payload is host numpy (exactly the
bytes that would cross DCN): the request's KV page contents, its per-slot
recurrent state rows (hybrid models), and bookkeeping. The decode side
allocates its own pages, scatters the rows in, seeds a slot, and the
request decodes there as if it had prefilled locally.

The reference carries this as a design doc only
(docs/models/deepseek-v4/prefix-paged-kv-pd-handoff.md); this implements
the TPU-native design from docs/prefix-cache-design.md: the page arrays
are layout-identical on both sides, so handoff = gather + ship + scatter
+ a page-table rewrite. Model support = two (four for hybrids) small
gather/scatter hooks on ModelRuntime (export/import_pages_fn,
slot_export/import_fn).

Scope: executor-level seam. A disaggregated scheduler routes
(prefill engine → payload → decode engine); the scheduling policy around
it is deployment-specific and intentionally not baked in here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pegainfer_tpu.engine.executor import PrefillPlan, PrefillStepItem

# jit wrappers are cached per hook function: a fresh jax.jit(...) per call
# would re-trace and re-lower on every handoff (jit caches executables per
# wrapper object), putting a compile on the handoff latency path.
_JIT: dict = {}


def _jitted(fn, donate_first: bool = False):
    key = (fn, donate_first)
    w = _JIT.get(key)
    if w is None:
        w = jax.jit(fn, donate_argnums=(0,) if donate_first else ())
        _JIT[key] = w
    return w


@dataclass
class HandoffPayload:
    """Everything the decode side needs (host-resident, DCN-shippable)."""

    request_id: int
    prompt_len: int
    first_token: int
    kv_rows: Optional[np.ndarray]  # gathered pages (None: pages-less model,
    # e.g. DSv4's slot-ring caches — the slot snapshot is the whole payload)
    state_snap: Optional[Any] = None  # per-slot rows (numpy pytree)


def prefill_and_export(ex, item: PrefillStepItem) -> HandoffPayload:
    """Run ``item``'s prefill on executor ``ex``, gather its KV/state into
    a host payload, and release every resource it held on ``ex``."""
    rt = ex.rt
    if rt.export_pages_fn is None and rt.slot_export_fn is None:
        raise ValueError("model provides no export hooks (no PD support)")
    res = ex.execute_prefill(PrefillPlan(requests=[item], echo=item.echo))
    st = ex.acct.get(item.request_id)
    prompt_len = st.length
    rows = None
    if rt.export_pages_fn is not None:
        pages = list(st.pages)
        rows = np.asarray(_jitted(rt.export_pages_fn)(
            ex.state, jnp.asarray(pages, jnp.int32)))
    snap = None
    if rt.slot_export_fn is not None:
        slot = ex._slot(item.request_id)
        snap = jax.tree.map(
            np.asarray,
            _jitted(rt.slot_export_fn)(ex.state, jnp.int32(slot)),
        )
    payload = HandoffPayload(
        request_id=item.request_id,
        prompt_len=prompt_len,
        first_token=res.requests[0].first_token,
        kv_rows=rows,
        state_snap=snap,
    )
    ex.release_request(item.request_id)
    return payload


def import_request(ex, payload: HandoffPayload) -> None:
    """Materialize a handed-off request on executor ``ex``: allocate local
    pages, scatter the shipped rows, seed the slot state, and register the
    KV accounting — after this the request decodes on ``ex`` exactly as if
    it had prefilled here (feed ``payload.first_token`` as the first
    decode input)."""
    rt = ex.rt
    if payload.kv_rows is not None and rt.import_pages_fn is None:
        raise ValueError("payload has pages but model lacks import_pages_fn")
    st = ex.acct.state(payload.request_id)
    if st.length or st.pages:
        raise ValueError(f"request {payload.request_id} already present")
    st.ensure_capacity(ex.acct.pool, payload.prompt_len)
    if payload.kv_rows is not None:
        n_pages = -(-payload.prompt_len // ex.rt.page_size)
        ids = jnp.asarray(st.pages[:n_pages], jnp.int32)
        imp = _jitted(rt.import_pages_fn, donate_first=True)
        ex.state = imp(ex.state, jnp.asarray(payload.kv_rows), ids)
    st.advance(payload.prompt_len)
    if payload.state_snap is not None:
        if rt.slot_import_fn is None:
            raise ValueError("payload has state but model lacks slot_import_fn")
        slot = ex._slot(payload.request_id)
        ex.state = _jitted(rt.slot_import_fn, donate_first=True)(
            ex.state, jax.tree.map(jnp.asarray, payload.state_snap),
            jnp.int32(slot))
