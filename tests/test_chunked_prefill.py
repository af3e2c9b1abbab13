"""Chunked / long-context prefill (VERDICT r1 missing #4).

Three layers of checking:
1. ref.chunked_prefill_attention == full-sequence attention restricted to the
   chunk rows (the XLA contract is itself validated against first principles).
2. The Pallas streamed kernel (interpret) == the XLA contract, for both the
   fresh path and the paged-history path.
3. Engine end-to-end: a prompt longer than ``prefill_chunk`` produces the
   same greedy generation as the single-shot path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.ops import ref
from lite_llama_tpu.ops.attention_prefill import (
    flash_prefill,
    flash_prefill_chunked,
)
from lite_llama_tpu.executor.kv_cache import (
    KVPool,
    alloc_prefill,
    create_kv_cache,
    kv_write_prefill,
)


def _setup_history(key, B, S_hist, S_c, Hkv, D, ps, lens_total):
    """Build a pool containing each request's first (lens-S_c) tokens and
    return (cache, k_full, v_full) where k_full covers the whole sequence."""
    num_pages = 64
    L = 1
    cache = create_kv_cache(
        L, Hkv, D, num_pages=num_pages, page_size=ps, max_reqs=B,
        max_seq_len=S_hist + S_c, dtype=jnp.float32,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    cache = alloc_prefill(cache, req, lens_arr)
    k_full = jax.random.normal(
        key, (B, S_hist + S_c, Hkv, D), jnp.float32
    )
    v_full = jax.random.normal(
        jax.random.fold_in(key, 1), (B, S_hist + S_c, Hkv, D), jnp.float32
    )
    # Engine semantics: the chunk boundary is GLOBAL (position S_hist); a
    # request's history is its first min(len, S_hist) tokens.
    hist_lens = jnp.minimum(lens_arr, S_hist)
    kv = kv_write_prefill(
        cache.kv_pages, 0, k_full[:, :S_hist], v_full[:, :S_hist],
        cache.page_table[req], jnp.zeros((B,), jnp.int32), hist_lens,
    )
    cache.kv_pages = kv
    return cache, req, k_full, v_full, hist_lens


@pytest.mark.parametrize("lens_total,S_hist,S_c", [
    ([40, 25], 32, 16),   # both have history
    ([40, 10], 32, 16),   # second request fully inside history (no chunk rows)
    ([33, 48], 32, 16),
])
def test_ref_chunked_equals_full_attention(lens_total, S_hist, S_c):
    B, Hkv, Nq, D, ps = 2, 2, 4, 64, 16
    key = jax.random.PRNGKey(0)
    cache, req, k_full, v_full, hist_lens = _setup_history(
        key, B, S_hist, S_c, Hkv, D, ps, lens_total
    )
    S = S_hist + S_c
    q_full = jax.random.normal(jax.random.PRNGKey(2), (B, S, Nq, D), jnp.float32)
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    # ground truth: full-sequence ragged causal attention
    want_full = ref.prefill_attention(q_full, k_full, v_full, lens_arr)
    # chunked: history = first min(len, S_hist) tokens (in pool)
    chunk_lens = jnp.clip(lens_arr - S_hist, 0, S_c)
    got = ref.chunked_prefill_attention(
        q_full[:, S_hist:], k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
    )
    for b in range(B):
        n = int(chunk_lens[b])
        if n == 0:
            continue
        np.testing.assert_allclose(
            np.asarray(got[b, :n]),
            np.asarray(want_full[b, int(hist_lens[b]): int(hist_lens[b]) + n]),
            rtol=2e-5, atol=2e-5, err_msg=f"b={b}",
        )


@pytest.mark.parametrize("lens_total,S_hist,S_c,bq,bk", [
    ([40, 25], 32, 16, 16, 16),
    ([40, 10], 32, 16, 8, 16),
    ([48, 33], 32, 16, 16, 16),
])
def test_pallas_chunked_matches_ref(lens_total, S_hist, S_c, bq, bk):
    B, Hkv, Nq, D, ps = 2, 2, 4, 64, 16
    key = jax.random.PRNGKey(3)
    cache, req, k_full, v_full, hist_lens = _setup_history(
        key, B, S_hist, S_c, Hkv, D, ps, lens_total
    )
    q_c = jax.random.normal(jax.random.PRNGKey(4), (B, S_c, Nq, D), jnp.float32)
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    chunk_lens = jnp.clip(lens_arr - S_hist, 0, S_c)
    want = ref.chunked_prefill_attention(
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
    )
    got = flash_prefill_chunked(
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
        interpret=True, block_q=bq, block_k=bk,
    )
    for b in range(B):
        n = int(chunk_lens[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), np.asarray(want[b, :n]),
            rtol=2e-5, atol=2e-5, err_msg=f"b={b}",
        )


@pytest.mark.slow
def test_streamed_prefill_long_sequence():
    """The streamed kernel's VMEM footprint is independent of S: run S=8192
    (the round-1 kernel's BlockSpec held the full [S, D] stream in VMEM and
    could not reach this length on-chip). Interpret mode, minimal heads."""
    B, S, Nq, Hkv, D = 1, 8192, 2, 1, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Nq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D), jnp.float32)
    lens = jnp.asarray([7000], jnp.int32)
    got = flash_prefill(q, k, v, lens, interpret=True,
                        block_q=2048, block_k=2048)
    want = ref.prefill_attention(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(got[0, :7000]), np.asarray(want[0, :7000]),
        rtol=3e-5, atol=3e-5,
    )


@pytest.mark.slow
def test_streamed_prefill_16k():
    """S=16384 parity (VERDICT r1 next #4's done-criterion): single head,
    4k blocks keep the interpreted iteration count tractable."""
    B, S, Nq, Hkv, D = 1, 16384, 1, 1, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Nq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D), jnp.float32)
    lens = jnp.asarray([16000], jnp.int32)
    got = flash_prefill(q, k, v, lens, interpret=True,
                        block_q=4096, block_k=4096)
    want = ref.prefill_attention(q, k, v, lens)
    sel = np.r_[0:64, 8000:8064, 15936:16000]  # spot-check rows
    np.testing.assert_allclose(
        np.asarray(got[0, sel]), np.asarray(want[0, sel]),
        rtol=5e-5, atol=5e-5,
    )


@pytest.mark.quick
def test_engine_long_prompt_matches_single_shot():
    """Greedy generation with prefill_chunk smaller than the prompt must
    match the single-shot prefill path token for token."""
    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.models.decoder import init_decoder_params

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=151,
        max_seq_len=128, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, 151, size=45).tolist(),
        rng.integers(0, 151, size=23).tolist(),
    ]
    outs = {}
    for chunk in (2048, 16):  # single-shot vs 3-chunk path
        eng = InferenceEngine(
            cfg, params, page_size=8, max_reqs=2, num_pages=64,
            prefill_chunk=chunk, decode_chunk=4,
        )
        gen = TextGenerator(eng)
        outs[chunk] = [
            o.token_ids
            for o in gen.generate_tokens(prompts, max_gen_len=8,
                                         temperature=0.0)
        ]
    assert outs[2048] == outs[16], outs


@pytest.mark.quick
def test_engine_long_prompt_quantized_pool_bounded_fallback():
    """ADVICE r2 medium: a quantized pool routes chunked prefill through the
    XLA fallback — which must (a) receive a page-rounded history bound far
    below pages_per_req * page_size, and (b) still match the single-shot
    quantized path token for token."""
    from unittest import mock

    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.ops import ref as ops_ref

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=151,
        max_seq_len=512, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 151, size=45).tolist(),
               rng.integers(0, 151, size=23).tolist()]
    seen_bounds = []
    orig = ops_ref.chunked_prefill_attention

    def spy(*a, **kw):
        seen_bounds.append(kw.get("max_hist_len"))
        return orig(*a, **kw)

    outs = {}
    for chunk in (2048, 16):
        with mock.patch.object(
            ops_ref, "chunked_prefill_attention", side_effect=spy
        ):
            eng = InferenceEngine(
                cfg, params, page_size=8, max_reqs=2, num_pages=128,
                prefill_chunk=chunk, decode_chunk=4, kv_quant="int8",
            )
            gen = TextGenerator(eng)
            outs[chunk] = [
                o.token_ids
                for o in gen.generate_tokens(prompts, max_gen_len=8,
                                             temperature=0.0)
            ]
    assert outs[2048] == outs[16], outs
    # The chunked path ran and every fallback call got a TIGHT bound:
    # max_seq_len=512 would be 64 pages; the 45-token prompt in 16-token
    # chunks needs at most 64 tokens of history (pow2-bucketed pages).
    bounds = [b for b in seen_bounds if b is not None]
    assert bounds, "chunked fallback never saw a history bound"
    assert max(bounds) <= 64, bounds

def test_packed_narrow_head_fresh_prefill_parity():
    """D=64 multi-head (Llama-3.2-1B-shaped GQA: Hkv=8 packs to 4 wide
    heads) through the head-packed STREAMED kernel — VERDICT r2 next #7:
    narrow heads used to take the VMEM-resident fallback capped near ~8k."""
    from lite_llama_tpu.ops.attention_prefill import pack_factor

    assert pack_factor(64, 8) == 2
    assert pack_factor(64, 1) == 0  # unpackable -> VMEM fallback
    assert pack_factor(128, 8) == 1
    B, S, Hkv, G, D = 2, 64, 8, 4, 64
    Nq = Hkv * G
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Nq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D), jnp.float32)
    lens = jnp.asarray([50, 33], jnp.int32)
    got = flash_prefill(q, k, v, lens, interpret=True,
                        block_q=32, block_k=32)
    want = ref.prefill_attention(q, k, v, lens)
    for b in range(B):
        n = int(lens[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), np.asarray(want[b, :n]),
            rtol=2e-5, atol=2e-5, err_msg=f"b={b}",
        )


@pytest.mark.slow
def test_packed_narrow_head_chunked_16k():
    """1B-shaped 16k chunked prefill on the Pallas path (VERDICT r2 next #7
    done-criterion): D=64 head-packed streamed kernel with 12k of PAGED
    POOL history + a 4k chunk, vs the XLA contract. Hkv=2 keeps the
    interpreted iteration count tractable; the packing (f=2) and the
    page-walk DMA layout are exactly the 1B configuration's."""
    B, Hkv, Nq, D, ps = 1, 2, 4, 64, 512
    S_hist, S_c = 12288, 4096
    lens_total = [16000]
    key = jax.random.PRNGKey(7)
    cache, req, k_full, v_full, hist_lens = _setup_history(
        key, B, S_hist, S_c, Hkv, D, ps, lens_total
    )
    q_c = jax.random.normal(
        jax.random.PRNGKey(8), (B, S_c, Nq, D), jnp.float32
    )
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    chunk_lens = jnp.clip(lens_arr - S_hist, 0, S_c)
    want = ref.chunked_prefill_attention(
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
    )
    got = flash_prefill_chunked(
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
        interpret=True, block_q=2048, block_k=2048,
    )
    n = int(chunk_lens[0])
    sel = np.r_[0:32, n // 2 : n // 2 + 32, n - 32 : n]
    np.testing.assert_allclose(
        np.asarray(got[0, sel]), np.asarray(want[0, sel]),
        rtol=5e-5, atol=5e-5,
    )


def test_ref_blocked_history_matches_dense():
    """Long histories stream through the fallback's online-softmax block
    scan instead of dense [B, Hq, S, T_h] scores (the ~10 GB OOM cliff for
    quantized pools at 8k history — ADVICE r2 medium, second half). With
    _HIST_BLOCK patched small, the blocked path must match the dense
    formulation bit-for-tolerance on the same inputs."""
    import unittest.mock as mock

    from lite_llama_tpu.ops import ref as ref_mod

    B, Hkv, Nq, D, ps = 2, 2, 4, 64, 16
    S_hist, S_c = 96, 32
    lens_total = [120, 100]
    key = jax.random.PRNGKey(11)
    cache, req, k_full, v_full, hist_lens = _setup_history(
        key, B, S_hist, S_c, Hkv, D, ps, lens_total
    )
    q_c = jax.random.normal(
        jax.random.PRNGKey(12), (B, S_c, Nq, D), jnp.float32
    )
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    chunk_lens = jnp.clip(lens_arr - S_hist, 0, S_c)
    args = (
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
    )
    want = ref.chunked_prefill_attention(*args)  # dense (96 <= 2048)
    with mock.patch.object(ref_mod, "_HIST_BLOCK", 32):
        got = ref_mod.chunked_prefill_attention(*args)  # 3 blocks
    for b in range(B):
        n = int(chunk_lens[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), np.asarray(want[b, :n]),
            rtol=2e-5, atol=2e-5, err_msg=f"b={b}",
        )


def _setup_history_quant(key, B, S_hist, S_c, Hkv, D, ps, lens_total):
    """Like _setup_history but with an INT8-quantized pool (quantize-on-
    write through kv_write_prefill, like the engine)."""
    cache = create_kv_cache(
        1, Hkv, D, num_pages=64, page_size=ps, max_reqs=B,
        max_seq_len=S_hist + S_c, dtype=jnp.float32, quantized=True,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    cache = alloc_prefill(cache, req, lens_arr)
    k_full = jax.random.normal(key, (B, S_hist + S_c, Hkv, D), jnp.float32)
    v_full = jax.random.normal(
        jax.random.fold_in(key, 1), (B, S_hist + S_c, Hkv, D), jnp.float32
    )
    hist_lens = jnp.minimum(lens_arr, S_hist)
    cache.kv_pages = kv_write_prefill(
        cache.kv_pages, 0, k_full[:, :S_hist], v_full[:, :S_hist],
        cache.page_table[req], jnp.zeros((B,), jnp.int32), hist_lens,
    )
    return cache, req, k_full, v_full, hist_lens


@pytest.mark.parametrize("D", [128, 64], ids=["D128", "D64-packed"])
def test_pallas_chunked_int8_pool_matches_ref(D):
    """INT8 pool history through the STREAMED Pallas kernel (per-page scale
    slabs + whole-tile in-kernel dequant) == the XLA dequantizing-gather
    contract — both for D=128 and for the head-packed D=64 form. Extends
    the history-streaming kernel to quantized pools (ADVICE r2 medium's
    second half; r2 asserted them out)."""
    B, Hkv, Nq, ps = 2, 2, 4, 16
    S_hist, S_c = 32, 16
    lens_total = [44, 37]
    key = jax.random.PRNGKey(21)
    cache, req, k_full, v_full, hist_lens = _setup_history_quant(
        key, B, S_hist, S_c, Hkv, D, ps, lens_total
    )
    q_c = jax.random.normal(
        jax.random.PRNGKey(22), (B, S_c, Nq, D), jnp.float32
    )
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    chunk_lens = jnp.clip(lens_arr - S_hist, 0, S_c)
    want = ref.chunked_prefill_attention(
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
    )
    got = flash_prefill_chunked(
        q_c, k_full[:, S_hist:], v_full[:, S_hist:],
        chunk_lens, hist_lens, cache.kv_pages, 0, cache.page_table[req],
        interpret=True, block_q=16, block_k=16,
    )
    for b in range(B):
        n = int(chunk_lens[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), np.asarray(want[b, :n]),
            rtol=2e-4, atol=2e-4, err_msg=f"b={b}",
        )
