"""Paged KV cache allocator invariants.

Mirrors the reference's allocator test coverage
(tests/kernels/test_mem_manager.py:10 TestKVCacheMemoryManager and the
embedded ReqTokensManager unittest, req_tokens_manager.py:69-106), adapted to
the paged design: allocation success/exhaustion accounting, page uniqueness,
free-then-realloc roundtrips, and the prefill/decode write paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.executor.kv_cache import (
    alloc_decode,
    alloc_prefill,
    cdiv,
    create_kv_cache,
    free_requests,
    kv_write_decode,
    kv_write_prefill,
)


def make_cache(num_pages=32, page_size=4, max_reqs=8, max_seq_len=32):
    return create_kv_cache(
        num_layers=2,
        num_kv_heads=2,
        head_dim=8,
        num_pages=num_pages,
        page_size=page_size,
        max_reqs=max_reqs,
        max_seq_len=max_seq_len,
        dtype=jnp.float32,
    )


def owned_pages(cache, req):
    n = int(cdiv(cache.seq_lens[req], cache.page_size))
    return set(np.asarray(cache.page_table[req][:n]).tolist())


def test_prefill_alloc_unique_pages_and_lengths():
    cache = make_cache()
    req_ids = jnp.array([0, 1, 2], jnp.int32)
    lens = jnp.array([5, 4, 9], jnp.int32)  # 2 + 1 + 3 pages
    cache = alloc_prefill(cache, req_ids, lens)
    assert int(cache.free_top.sum()) == 32 - 6
    np.testing.assert_array_equal(np.asarray(cache.seq_lens[:3]), [5, 4, 9])
    all_pages = owned_pages(cache, 0) | owned_pages(cache, 1) | owned_pages(cache, 2)
    assert len(all_pages) == 6  # no page handed out twice


def test_decode_alloc_pops_only_on_page_boundary():
    cache = make_cache(page_size=4)
    req_ids = jnp.array([0, 1], jnp.int32)
    cache = alloc_prefill(cache, req_ids, jnp.array([4, 3], jnp.int32))
    top0 = int(cache.free_top.sum())
    # req0 at len 4 (full page) -> next token needs a new page;
    # req1 at len 3 -> fits in the current page.
    cache = alloc_decode(cache, req_ids)
    assert int(cache.free_top.sum()) == top0 - 1
    np.testing.assert_array_equal(np.asarray(cache.seq_lens[:2]), [5, 4])
    assert len(owned_pages(cache, 0)) == 2
    assert len(owned_pages(cache, 1)) == 1


def test_free_returns_pages_to_stack():
    cache = make_cache()
    req_ids = jnp.array([0, 1], jnp.int32)
    cache = alloc_prefill(cache, req_ids, jnp.array([8, 8], jnp.int32))
    assert int(cache.free_top.sum()) == 32 - 4
    cache = free_requests(cache, jnp.array([0], jnp.int32))
    assert int(cache.free_top.sum()) == 32 - 2
    assert int(cache.seq_lens[0]) == 0
    # Freed pages are reusable and the stack holds no duplicates among free.
    free = np.asarray(cache.free_stack[: int(cache.free_top.sum())])
    assert len(set(free.tolist())) == len(free)
    # Still-live pages of req1 must not be in the free region.
    assert not (owned_pages(cache, 1) & set(free.tolist()))


def test_alloc_free_roundtrip_many():
    cache = make_cache(num_pages=16, page_size=4, max_reqs=4, max_seq_len=16)
    for _ in range(5):
        req_ids = jnp.array([0, 1, 2, 3], jnp.int32)
        lens = jnp.array([4, 8, 12, 16], jnp.int32)
        cache = alloc_prefill(cache, req_ids, lens)
        assert int(cache.free_top.sum()) == 16 - 10
        cache = free_requests(cache, req_ids)
        assert int(cache.free_top.sum()) == 16
        free = np.asarray(cache.free_stack)
        assert sorted(free.tolist()) == list(range(16))


def test_kv_write_prefill_then_read_back():
    cache = make_cache(page_size=4, max_seq_len=16)
    B, S, Hkv, D = 2, 6, 2, 8
    req_ids = jnp.array([0, 1], jnp.int32)
    lens = jnp.array([6, 5], jnp.int32)
    cache = alloc_prefill(cache, req_ids, lens)
    k_new = jnp.arange(B * S * Hkv * D, dtype=jnp.float32).reshape(B, S, Hkv, D)
    v_new = -k_new
    table_rows = cache.page_table[req_ids]
    kv = kv_write_prefill(
        cache.kv_pages, 1, k_new, v_new, table_rows,
        jnp.zeros((B,), jnp.int32), lens,
    ).pages
    # Read back token (b=1, s=3) from the pool through the table
    # (planes [L, 2, T, Hkv*D]; flat row = page * page_size + offset).
    pos = 3
    row = int(table_rows[1, pos // 4]) * 4 + pos % 4
    np.testing.assert_allclose(
        np.asarray(kv[1, 0, row]).reshape(Hkv, D), np.asarray(k_new[1, 3])
    )
    np.testing.assert_allclose(
        np.asarray(kv[1, 1, row]).reshape(Hkv, D), np.asarray(v_new[1, 3])
    )
    # Layer 0 untouched.
    assert float(jnp.sum(jnp.abs(kv[0]))) == 0.0
    # Pad position (b=1, s=5) dropped: layer 1's K plane holds exactly the
    # valid tokens of both requests.
    assert float(jnp.sum(jnp.abs(kv[1, 0]))) == pytest.approx(
        float(jnp.sum(jnp.abs(k_new[0, :6]))) + float(jnp.sum(jnp.abs(k_new[1, :5])))
    )


def test_kv_write_decode_and_inactive_drop():
    cache = make_cache(page_size=4, max_seq_len=16)
    req_ids = jnp.array([0, 1], jnp.int32)
    cache = alloc_prefill(cache, req_ids, jnp.array([4, 4], jnp.int32))
    cache = alloc_decode(cache, req_ids)
    B, Hkv, D = 2, 2, 8
    k_new = jnp.ones((B, Hkv, D), jnp.float32) * jnp.array([[[7.0]], [[9.0]]])
    table_rows = cache.page_table[req_ids]
    pos = cache.seq_lens[req_ids] - 1
    active = jnp.array([True, False])
    kv = kv_write_decode(
        cache.kv_pages, 0, k_new, k_new, table_rows, pos, active
    ).pages
    row0 = int(table_rows[0, 1]) * 4  # offset 0 of req0's second page
    np.testing.assert_allclose(np.asarray(kv[0, :, row0]), 7.0)
    # Inactive request wrote nothing anywhere (K and V halves both written
    # for the active one).
    assert float(jnp.sum(jnp.abs(kv))) == pytest.approx(2 * 7.0 * Hkv * D)


def test_alloc_is_jittable():
    cache = make_cache()
    step = jax.jit(alloc_decode)
    cache = alloc_prefill(cache, jnp.array([0], jnp.int32), jnp.array([3], jnp.int32))
    for _ in range(6):
        cache = step(cache, jnp.array([0], jnp.int32))
    assert int(cache.seq_lens[0]) == 9
    assert len(owned_pages(cache, 0)) == 3
