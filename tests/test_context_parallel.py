"""Context-parallel decode attention: KV pool sharded over a mesh axis.

Beyond-reference (SURVEY.md §2.6: SP/CP absent in the reference; §5: the
split-KV LSE algebra is CP-combinable by design). Parity gates: the sharded
result must match the single-device kernel / XLA reference on a replicated
pool — bf16-class tolerance, every pool dtype, with and without the engine's
virtual newest-token protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import lite_llama_tpu.ops.ref as ref
from lite_llama_tpu.parallel.context_parallel import cp_paged_flash_decode
from tests.test_attention_kernels import build_paged_kv

pytestmark = pytest.mark.quick


def cp_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("cp",))


def shard_pool(kv_pool, mesh):
    """Place the pool sharded on the token-row axis (what the engine's
    sharding policy would do for a cp axis)."""
    pages = jax.device_put(
        kv_pool.pages, NamedSharding(mesh, P(None, None, "cp", None))
    )
    scales = (
        jax.device_put(kv_pool.scales, NamedSharding(mesh, P(None, "cp", None)))
        if kv_pool.scales is not None
        else None
    )
    return type(kv_pool)(
        pages=pages, scales=scales, page_size=kv_pool.page_size,
        num_kv_heads=kv_pool.num_kv_heads, head_dim=kv_pool.head_dim,
    )


@pytest.mark.parametrize("quantized", [False, True])
def test_cp_decode_matches_replicated(quantized):
    """Pages scattered across 4 shards (the permutation table guarantees
    requests straddle shard boundaries) must reproduce the replicated
    result; includes a one-token and a page-boundary request."""
    B, Nq, Hkv, D, ps = 3, 8, 2, 128, 16
    L, Pg, ppr = 2, 32, 8
    lens = [33, 1, 48]
    mesh = cp_mesh(4)
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(0), L, Hkv, Pg, ps, D, B, ppr, lens,
        quantized=quantized,
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Nq, D), jnp.float32)
    pool_sharded = shard_pool(kv_pool, mesh)
    for layer in (0, 1):
        want = ref.paged_decode_attention(
            q, kv_pool, layer, table, lens_arr, ppr * ps
        )
        got = cp_paged_flash_decode(
            q, pool_sharded, layer, table, lens_arr, mesh,
            max_seq_len=ppr * ps, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5,
            err_msg=f"layer={layer} quantized={quantized}",
        )


def test_cp_decode_narrow_head_int8():
    """D=64 + int8 pool (Llama-3.2-1B shape) over the cp axis — the wide
    score-domain form composes with the shard-local page view."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 64, 16
    L, Pg, ppr = 2, 32, 8
    lens = [47, 16]
    mesh = cp_mesh(4)
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(2), L, Hkv, Pg, ps, D, B, ppr, lens,
        quantized=True,
    )
    q = jax.random.normal(jax.random.PRNGKey(3), (B, Nq, D), jnp.float32)
    want = ref.paged_decode_attention(q, kv_pool, 0, table, lens_arr, ppr * ps)
    got = cp_paged_flash_decode(
        q, shard_pool(kv_pool, mesh), 0, table, lens_arr, mesh,
        max_seq_len=ppr * ps, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_cp_decode_virtual_new_token():
    """The engine's deferred-scatter decode protocol (pool holds seq-1
    tokens, newest K/V ride as args) folds in AFTER the cross-device
    combine; must match the single-device virtual-token path."""
    from lite_llama_tpu.ops.attention_decode import paged_flash_decode

    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, Pg, ppr = 2, 32, 8
    lens = [34, 17]  # pool holds 33 / 16 tokens; newest rides separately
    mesh = cp_mesh(4)
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(4), L, Hkv, Pg, ps, D, B, ppr, lens
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Nq, D), jnp.float32)
    k_new = jax.random.normal(jax.random.PRNGKey(6), (B, Hkv, D), jnp.float32)
    v_new = jax.random.normal(jax.random.PRNGKey(7), (B, Hkv, D), jnp.float32)
    want = paged_flash_decode(
        q, kv_pool, 0, table, lens_arr, ppr * ps, interpret=True,
        k_new=k_new, v_new=v_new,
    )
    got = cp_paged_flash_decode(
        q, shard_pool(kv_pool, mesh), 0, table, lens_arr, mesh,
        max_seq_len=ppr * ps, interpret=True, k_new=k_new, v_new=v_new,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_cp_decode_empty_and_single_shard():
    """A request whose pages all land on ONE shard plus an empty slot:
    other shards contribute l=0 terms and the combine must stay NaN-free."""
    B, Nq, Hkv, D, ps = 2, 4, 2, 128, 16
    L, ppr = 1, 4
    Pg = 8  # 2 pages per shard on cp=4
    mesh = cp_mesh(4)
    # Hand-build: request 0 owns pages 0,1 (both on shard 0); request 1 empty.
    kv_pool, _ = build_paged_kv(
        jax.random.PRNGKey(8), L, Hkv, Pg, ps, D, B, ppr, [32, 0]
    )
    table = jnp.asarray([[0, 1, 0, 0], [0, 0, 0, 0]], jnp.int32)
    lens_arr = jnp.asarray([32, 0], jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, Nq, D), jnp.float32)
    want = ref.paged_decode_attention(q, kv_pool, 0, table, lens_arr, ppr * ps)
    got = cp_paged_flash_decode(
        q, shard_pool(kv_pool, mesh), 0, table, lens_arr, mesh,
        max_seq_len=ppr * ps, interpret=True,
    )
    got_np = np.asarray(got)
    assert np.isfinite(got_np[0]).all()
    np.testing.assert_allclose(
        got_np[0], np.asarray(want)[0], rtol=3e-5, atol=3e-5
    )
