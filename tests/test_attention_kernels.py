"""Pallas attention kernels vs pure-XLA references (interpret mode on CPU).

Mirrors the reference's kernel test recipe (tests/kernels/kernels_test.py:
random inputs, Triton vs naive torch, allclose) — here Pallas (interpret) vs
ops/ref.py, which itself is HF-parity tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.ops import ref
from lite_llama_tpu.ops.attention_decode import paged_flash_decode


def build_paged_kv(key, L, Hkv, P, ps, D, B, ppr, lens, dtype=jnp.float32):
    """Random pool + a page table whose live entries are a permutation of
    distinct pages (like the allocator produces)."""
    kv_pages = jax.random.normal(key, (L, P, 2, Hkv, ps, D), dtype)
    rng = np.random.default_rng(0)
    perm = rng.permutation(P)
    table = np.zeros((B, ppr), np.int32)
    idx = 0
    for b in range(B):
        n = -(-int(lens[b]) // ps)
        table[b, :n] = perm[idx : idx + n]
        idx += n
    return kv_pages, jnp.asarray(table)


@pytest.mark.parametrize(
    "B,Nq,Hkv,D,ps,lens",
    [
        (2, 8, 2, 128, 16, [33, 7]),
        (3, 4, 4, 128, 16, [16, 1, 47]),  # G=1, boundary length, len 1
        (1, 16, 2, 64, 32, [63]),
    ],
)
def test_paged_flash_decode_matches_ref(B, Nq, Hkv, D, ps, lens):
    L, P = 2, 32
    ppr = 8
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(0), L, Hkv, P, ps, D, B, ppr, lens
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Nq, D), jnp.float32)
    for layer in (0, 1):
        want = ref.paged_decode_attention(
            q, kv_pages, layer, table, lens_arr, ppr * ps
        )
        got = paged_flash_decode(
            q, kv_pages, layer, table, lens_arr, ppr * ps, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"layer={layer}",
        )


def test_paged_flash_decode_bf16():
    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, P, ppr = 1, 16, 8
    lens = [25, 60]
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(2), L, Hkv, P, ps, D, B, ppr, lens, jnp.bfloat16
    )
    q = jax.random.normal(jax.random.PRNGKey(3), (B, Nq, D), jnp.bfloat16)
    want = ref.paged_decode_attention(q, kv_pages, 0, table, lens_arr, ppr * ps)
    got = paged_flash_decode(q, kv_pages, 0, table, lens_arr, ppr * ps, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
