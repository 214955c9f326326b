"""Native host core (C++) vs the pure-Python reference semantics."""

import numpy as np
import pytest

from pegainfer_tpu.engine import kv as pykv
from pegainfer_tpu.native import get_module

host = get_module()
pytestmark = pytest.mark.skipif(host is None, reason="no C++ toolchain")


def test_pool_alloc_free_matches_python():
    np_pool = pykv.PagePool(16)
    c_pool = host.HostPool(16)
    assert c_pool.available == np_pool.available == 15
    a = c_pool.alloc(4)
    b = np_pool.alloc(4)
    assert a == b  # same LIFO order
    c_pool.free(a[:2])
    np_pool.free(b[:2])
    assert c_pool.available == np_pool.available
    with pytest.raises(ValueError):
        c_pool.free([0])
    with pytest.raises(RuntimeError):
        c_pool.alloc(100)


def test_kv_lifecycle():
    pool = host.HostPool(32)
    kvs = host.HostKv(pool, 4)
    kvs.ensure(7, 10)  # 3 pages
    assert len(kvs.pages(7)) == 3
    kvs.advance(7, 10)
    assert kvs.length(7) == 10
    kvs.ensure(7, 13)  # grow to 4
    assert len(kvs.pages(7)) == 4
    with pytest.raises(RuntimeError):
        kvs.advance(7, 100)
    avail0 = pool.available
    kvs.release(7)
    assert pool.available == avail0 + 4
    assert kvs.length(7) == 0


def test_assemble_matches_python_loop():
    page_size = 4
    pool = host.HostPool(64)
    kvs = host.HostKv(pool, page_size)
    rids = [3, 9]
    for rid, tokens in zip(rids, [6, 11]):
        kvs.ensure(rid, tokens)
        kvs.advance(rid, tokens)

    B, P, extra, dead = 4, 8, 3, 99
    buf = kvs.assemble(rids, [101, 202], B, P, extra, dead, [0, 1])
    arr = np.frombuffer(buf, np.int32)
    tokens = arr[:B]
    positions = arr[B:2 * B]
    tables = arr[2 * B:2 * B + B * P].reshape(B, P)
    seq_lens = arr[2 * B + B * P:3 * B + B * P]
    slots = arr[3 * B + B * P:]

    assert tokens.tolist() == [101, 202, 0, 0]
    assert positions.tolist() == [6, 11, 0, 0]
    assert seq_lens.tolist() == [7, 12, 0, 0]
    assert slots.tolist() == [0, 1, dead, dead]
    # rid 3: 6 tokens + 1 + extra 3 = 10 → 3 pages; rid 9: 11+4=15 → 4 pages
    assert (tables[0] > 0).sum() == 3
    assert (tables[1] > 0).sum() == 4
    assert tables[0].tolist()[:3] == kvs.pages(3)
    # python mirror agrees on page math
    assert pykv.pages_needed(10, page_size) == 3
    assert pykv.pages_needed(15, page_size) == 4


def test_admit_matches_python():
    class R:  # deferred item
        def __init__(self, p, m):
            self.prompt_len, self.max_tokens = p, m

    class A:  # active item
        def __init__(self, p, m, g):
            self.prompt_len, self.max_tokens, self.generated_count = p, m, g

    deferred = [R(10, 5), R(100, 50), R(4, 2)]
    active = [A(8, 20, 3)]
    page_size, available, max_pages = 4, 12, 16

    py = pykv.admit_deferred_requests(deferred, active, page_size, available, max_pages)
    py_verdicts = []
    for r in deferred:
        if any(r is x for x in py.pending):
            py_verdicts.append(1)
        elif any(r is x for x in py.rejected):
            py_verdicts.append(2)
        else:
            py_verdicts.append(0)

    c_verdicts = host.admit(
        [(r.prompt_len, r.max_tokens) for r in deferred],
        [(a.prompt_len, a.max_tokens, a.generated_count) for a in active],
        page_size, available, max_pages,
    )
    assert c_verdicts == py_verdicts


def test_admit_randomized_parity():
    rng = np.random.default_rng(0)

    class R:
        def __init__(self, p, m):
            self.prompt_len, self.max_tokens = int(p), int(m)

    class A(R):
        def __init__(self, p, m, g):
            super().__init__(p, m)
            self.generated_count = int(g)

    for _ in range(50):
        deferred = [R(rng.integers(1, 60), rng.integers(1, 40)) for _ in range(6)]
        active = [
            A(rng.integers(1, 60), g + rng.integers(1, 20), g)
            for g in rng.integers(1, 10, size=3)
        ]
        ps = int(rng.choice([1, 4, 16]))
        avail = int(rng.integers(0, 60))
        maxp = int(rng.integers(4, 40))
        py = pykv.admit_deferred_requests(deferred, active, ps, avail, maxp)
        pyv = [
            1 if any(r is x for x in py.pending)
            else 2 if any(r is x for x in py.rejected) else 0
            for r in deferred
        ]
        cv = host.admit(
            [(r.prompt_len, r.max_tokens) for r in deferred],
            [(a.prompt_len, a.max_tokens, a.generated_count) for a in active],
            ps, avail, maxp,
        )
        assert cv == pyv
