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


from lite_llama_tpu.executor.kv_cache import KVPool


def build_paged_kv(key, L, Hkv, P, ps, D, B, ppr, lens, dtype=jnp.float32,
                   quantized=False):
    """Random pool + a page table whose live entries are a permutation of
    distinct pages (like the allocator produces)."""
    meta = dict(page_size=ps, num_kv_heads=Hkv, head_dim=D)
    shape = (L, 2, P * ps, Hkv * D)
    if quantized == "fp8":
        kv_pages = KVPool(
            pages=jax.random.normal(key, shape, jnp.float32).astype(
                jnp.float8_e4m3fn
            ),
            scales=None, **meta,
        )
    elif quantized:
        from lite_llama_tpu.executor.kv_cache import SCALE_LANES
        import jax.numpy as _jnp

        # Merged scale rows [L, T, SCALE_LANES]: K in lanes [0, Hkv), V in
        # [SL/2, SL/2 + Hkv) (executor/kv_cache.py KVPool).
        sc2 = jax.random.uniform(
            jax.random.fold_in(key, 1), (L, 2, P * ps, Hkv),
            jnp.float32, 0.005, 0.02,
        ).astype(jnp.bfloat16)
        half_l = SCALE_LANES // 2
        sc = _jnp.concatenate(
            [
                _jnp.pad(sc2[:, 0], ((0, 0), (0, 0), (0, half_l - Hkv))),
                _jnp.pad(sc2[:, 1], ((0, 0), (0, 0), (0, half_l - Hkv))),
            ],
            axis=-1,
        )
        kv_pages = KVPool(
            pages=jax.random.randint(key, shape, -127, 128, jnp.int8),
            scales=sc,
            **meta,
        )
    else:
        kv_pages = KVPool(
            pages=jax.random.normal(key, shape, dtype),
            scales=None, **meta,
        )
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
            q, kv_pages, layer, table, lens_arr, interpret=True
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
    got = paged_flash_decode(q, kv_pages, 0, table, lens_arr, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_paged_flash_decode_virtual_token():
    """Deferred-write protocol: newest token via k_new/v_new + LSE combine."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, P, ppr = 2, 32, 8
    lens = [34, 8]  # lengths INCLUDING the new token
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(0), L, Hkv, P, ps, D, B, ppr, lens
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Nq, D), jnp.float32)
    k_new = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, D), jnp.float32)
    v_new = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, D), jnp.float32)
    want = ref.paged_decode_attention(
        q, kv_pages, 0, table, lens_arr, ppr * ps, k_new=k_new, v_new=v_new
    )
    got = paged_flash_decode(
        q, kv_pages, 0, table, lens_arr, interpret=True,
        k_new=k_new, v_new=v_new,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )
    # Also check the ref's splice agrees with writing the token to the pool
    # and attending normally.
    from lite_llama_tpu.executor.kv_cache import kv_write_decode

    pos = lens_arr - 1
    kv2 = kv_write_decode(kv_pages, 0, k_new, v_new, table, pos)
    want2 = ref.paged_decode_attention(q, kv2, 0, table, lens_arr, ppr * ps)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(want2), rtol=3e-5, atol=3e-5
    )


def test_paged_decode_int8_kv_dispatch_matches_dequant():
    """INT8+scales pools run the XLA gather path; it must equal attention on
    an explicitly dequantized pool."""
    import lite_llama_tpu.ops as ops
    from lite_llama_tpu.executor.kv_cache import KVPool as _KVPool

    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, P, ppr = 2, 32, 8
    lens = [33, 9]
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(4), L, Hkv, P, ps, D, B, ppr, lens, quantized=True
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Nq, D), jnp.float32)
    # Dequantize the whole pool into an fp32 pool (planes [L, 2, T, Hkv*D];
    # MERGED scales [L, T, SCALE_LANES]: K in lanes [0, Hkv), V in
    # [SL/2, SL/2+Hkv)).
    T = P * ps
    SL = kv_pages.scales.shape[-1]
    sc = jnp.stack(
        [kv_pages.scales[:, :, :Hkv],
         kv_pages.scales[:, :, SL // 2 : SL // 2 + Hkv]],
        axis=1,
    )  # [L, 2, T, Hkv]
    deq = (
        kv_pages.pages.reshape(L, 2, T, Hkv, D).astype(jnp.float32)
        * sc.astype(jnp.float32)[..., None]
    ).reshape(L, 2, T, Hkv * D)
    kv_deq = _KVPool(pages=deq, scales=None, page_size=ps,
                     num_kv_heads=Hkv, head_dim=D)
    for layer in (0, 1):
        want = ref.paged_decode_attention(
            q, kv_deq, layer, table, lens_arr, ppr * ps
        )
        got = ops.paged_decode_attention(
            q, kv_pages, layer, table, lens_arr, ppr * ps
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-3, atol=3e-3,
            err_msg=f"layer={layer}",
        )


def test_paged_flash_decode_int8_kv_kernel():
    """INT8+scales pool through the PALLAS kernel (interpret): in-kernel
    score-domain dequant must match the XLA dequantizing-gather reference
    (VERDICT round 1, missing #3: int8-KV used to fall back to XLA)."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, P, ppr = 2, 32, 8
    lens = [33, 9]
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(4), L, Hkv, P, ps, D, B, ppr, lens, quantized=True
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Nq, D), jnp.float32)
    for layer in (0, 1):
        want = ref.paged_decode_attention(
            q, kv_pages, layer, table, lens_arr, ppr * ps
        )
        got = paged_flash_decode(
            q, kv_pages, layer, table, lens_arr, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"layer={layer}",
        )


def test_paged_flash_decode_int8_kv_kernel_narrow_head():
    """INT8 pool with D=64 (Llama-3.2-1B shape) through the Pallas kernel —
    the wide score-domain form covers narrow heads too (VERDICT r2 next #7;
    r2's dispatcher excluded quantized D%128!=0 pools)."""
    import lite_llama_tpu.ops as ops
    from lite_llama_tpu.ops import set_backend

    B, Nq, Hkv, D, ps = 2, 8, 2, 64, 16
    L, P, ppr = 2, 32, 8
    lens = [33, 9]
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(4), L, Hkv, P, ps, D, B, ppr, lens, quantized=True
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Nq, D), jnp.float32)
    want = ref.paged_decode_attention(q, kv_pages, 0, table, lens_arr, ppr * ps)
    got = paged_flash_decode(
        q, kv_pages, 0, table, lens_arr, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # and the dispatcher actually routes quantized D=64 to the kernel now
    # (stubbed return: executing non-interpret Pallas on CPU is not the
    # point — the routing decision is)
    set_backend("pallas")
    try:
        import unittest.mock as mock

        with mock.patch(
            "lite_llama_tpu.ops.attention_decode.paged_flash_decode",
            return_value=want,
        ) as spy:
            out = ops.paged_decode_attention(
                q, kv_pages, 0, table, lens_arr, ppr * ps
            )
            assert spy.called and out is want
    finally:
        set_backend("auto")


def test_paged_flash_decode_int8_kv_kernel_virtual_token():
    """INT8 pool + deferred-write virtual token (the engine's actual decode
    configuration when kv_quant='int8')."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, P, ppr = 1, 32, 8
    lens = [34, 8]
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(6), L, Hkv, P, ps, D, B, ppr, lens, quantized=True
    )
    q = jax.random.normal(jax.random.PRNGKey(7), (B, Nq, D), jnp.float32)
    k_new = jax.random.normal(jax.random.PRNGKey(8), (B, Hkv, D), jnp.float32)
    v_new = jax.random.normal(jax.random.PRNGKey(9), (B, Hkv, D), jnp.float32)
    want = ref.paged_decode_attention(
        q, kv_pages, 0, table, lens_arr, ppr * ps, k_new=k_new, v_new=v_new
    )
    got = paged_flash_decode(
        q, kv_pages, 0, table, lens_arr, interpret=True,
        k_new=k_new, v_new=v_new,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_paged_flash_decode_fp8_kv():
    """Scale-free fp8 pool through the Pallas kernel (interpret)."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, P, ppr = 2, 32, 8
    lens = [33, 9]
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(4), L, Hkv, P, ps, D, B, ppr, lens,
        quantized="fp8",
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Nq, D), jnp.float32)
    for layer in (0, 1):
        want = ref.paged_decode_attention(
            q, kv_pages, layer, table, lens_arr, ppr * ps
        )
        got = paged_flash_decode(
            q, kv_pages, layer, table, lens_arr, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-3, atol=3e-3,
            err_msg=f"layer={layer}",
        )


def test_int8_kv_cache_roundtrip_through_decoder():
    """INT8 KV end-to-end: quantized-cache decode logits close to bf16-cache
    (perplexity-parity gate, BASELINE.md)."""
    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.executor.kv_cache import alloc_prefill, create_kv_cache
    from lite_llama_tpu.models.decoder import (
        AttnContext, decoder_prefill, decoder_decode, init_decoder_params)

    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=97, max_seq_len=32,
                      dtype=jnp.float32)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    B, S = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 97)
    lens = jnp.full((B,), S, jnp.int32)
    outs = {}
    for quant in (False, True):
        cache = create_kv_cache(2, 2, cfg.head_dim, num_pages=16, page_size=4,
                                max_reqs=B, max_seq_len=32, dtype=jnp.float32,
                                quantized=quant)
        req = jnp.arange(B, dtype=jnp.int32)
        cache = alloc_prefill(cache, req, lens)
        ctx = AttnContext(cache.page_table[req], lens,
                          jnp.zeros((B,), jnp.int32), lens)
        logits, kv = decoder_prefill(params, cfg, cache.kv_pages, ctx,
                                     input_ids=ids)
        cache.kv_pages = kv
        from lite_llama_tpu.executor.kv_cache import alloc_decode
        cache = alloc_decode(cache, req)
        pos = cache.seq_lens[req] - 1
        ctx = AttnContext(cache.page_table[req], cache.seq_lens[req], pos,
                          jnp.ones((B,), jnp.int32), jnp.ones((B,), bool))
        dl, kv = decoder_decode(params, cfg, cache.kv_pages, ctx,
                                input_ids=jnp.asarray([3, 5]))
        outs[quant] = (np.asarray(logits), np.asarray(dl))
        if quant:
            assert kv.pages.dtype == jnp.int8
            assert kv.scales is not None
    # prefill + decode logits close between bf16-KV and int8-KV paths
    for a, b in zip(outs[False], outs[True]):
        p1 = jax.nn.softmax(jnp.asarray(a), -1)
        p2 = jax.nn.softmax(jnp.asarray(b), -1)
        tv = float(jnp.max(jnp.sum(jnp.abs(p1 - p2), -1))) / 2
        assert tv < 0.03, f"total variation {tv}"


def test_paged_flash_decode_empty_slot():
    """Empty slots (seq_len 0) under the virtual-page protocol: kv_lens must
    clamp at 0 — a -1 length defeats the kernel's empty-slot skip and leaks
    DMA semaphore signals on real hardware (chip crash). Masked outputs for
    the empty slot must still be finite."""
    B, Nq, Hkv, D, ps = 3, 8, 2, 128, 16
    L, P, ppr = 1, 16, 4
    lens = [33, 0, 9]  # middle slot empty
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pages, table = build_paged_kv(
        jax.random.PRNGKey(0), L, Hkv, P, ps, D, B, ppr, [33, 1, 9]
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Nq, D), jnp.float32)
    k_new = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, D), jnp.float32)
    got = paged_flash_decode(
        q, kv_pages, 0, table, lens_arr, interpret=True,
        k_new=k_new, v_new=k_new,
    )
    assert np.isfinite(np.asarray(got[0])).all()
    assert np.isfinite(np.asarray(got[2])).all()
    # live slots must match the reference with the new token spliced in
    want = ref.paged_decode_attention(
        q, kv_pages, 0, table, lens_arr, ppr * ps, k_new=k_new, v_new=k_new
    )
    for b in (0, 2):
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want[b]), rtol=3e-5, atol=3e-5
        )
