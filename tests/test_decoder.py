"""Decoder model correctness.

The key invariant (the reference checks this against HF layer-by-layer,
tests/models/test_qwen2.py:112/:195; HF-parity itself is covered in
test_hf_parity.py): running prefill over a prompt and then decode steps
through the paged KV cache must reproduce exactly the logits of a single
prefill over the concatenated sequence — i.e. the paged-cache path and the
dense path are the same function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig, Qwen2Config, Qwen3Config
from lite_llama_tpu.executor.kv_cache import (
    alloc_decode,
    alloc_prefill,
    create_kv_cache,
)
from lite_llama_tpu.models.decoder import (
    AttnContext,
    decoder_decode,
    decoder_prefill,
    init_decoder_params,
)

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=256,
    max_seq_len=32,
    dtype=jnp.float32,
)


def run_prefill_full(cfg, params, ids, lens):
    """Prefill over the whole [B, S] batch with a fresh cache."""
    B, S = ids.shape
    cache = create_kv_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        num_pages=64, page_size=4, max_reqs=B, max_seq_len=cfg.max_seq_len,
        dtype=jnp.float32,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    cache = alloc_prefill(cache, req, lens)
    ctx = AttnContext(
        table_rows=cache.page_table[req],
        seq_lens=lens,
        start_pos=jnp.zeros((B,), jnp.int32),
        chunk_lens=lens,
    )
    logits, _ = decoder_prefill(params, cfg, cache.kv_pages, ctx, input_ids=ids)
    return logits


@pytest.mark.parametrize(
    "cfg_cls,kwargs",
    [
        (LlamaConfig, {}),
        (Qwen2Config, {}),
        (Qwen3Config, {"head_dim": 16}),
        (LlamaConfig, {"tie_word_embeddings": False}),
        (LlamaConfig, {"rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                                        "low_freq_factor": 1.0,
                                        "high_freq_factor": 4.0,
                                        "original_max_position_embeddings": 16}}),
    ],
    ids=["llama", "qwen2-bias", "qwen3-qknorm", "untied", "llama3-rope"],
)
def test_prefill_then_decode_matches_full_prefill(cfg_cls, kwargs):
    cfg = cfg_cls(**{**TINY, **kwargs})
    key = jax.random.PRNGKey(0)
    params = init_decoder_params(cfg, key)
    B, S_prompt, S_total = 2, 5, 9
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S_total), 0, cfg.vocab_size)
    lens_total = jnp.array([S_total, S_total - 2], jnp.int32)

    # Ground truth: one prefill over the full sequences.
    full_logits = run_prefill_full(cfg, params, ids, lens_total)

    # Paged path: prefill the prompt, then decode token by token.
    cache = create_kv_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        num_pages=64, page_size=4, max_reqs=B, max_seq_len=cfg.max_seq_len,
        dtype=jnp.float32,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens_prompt = jnp.array([S_prompt, S_prompt - 1], jnp.int32)
    cache = alloc_prefill(cache, req, lens_prompt)
    ctx = AttnContext(
        table_rows=cache.page_table[req],
        seq_lens=lens_prompt,
        start_pos=jnp.zeros((B,), jnp.int32),
        chunk_lens=lens_prompt,
    )
    logits_p, kv = decoder_prefill(params, cfg, cache.kv_pages, ctx, input_ids=ids)
    cache.kv_pages = kv

    # Prefill logits at each valid position match the full run.
    for b, lp in enumerate([S_prompt, S_prompt - 1]):
        np.testing.assert_allclose(
            np.asarray(logits_p[b, :lp]), np.asarray(full_logits[b, :lp]),
            rtol=2e-4, atol=2e-4,
        )

    # Decode the remaining tokens, feeding the *true* next tokens.
    cur = jnp.array([S_prompt, S_prompt - 1], jnp.int32)
    n_steps = int(jnp.max(lens_total - cur))
    for _ in range(n_steps):
        active = cur < lens_total
        cache = alloc_decode_masked(cache, req, active)
        pos = cur  # position being written for active rows
        tok = jnp.take_along_axis(ids, jnp.minimum(pos, S_total - 1)[:, None], axis=1)[:, 0]
        ctx = AttnContext(
            table_rows=cache.page_table[req],
            seq_lens=jnp.where(active, cur + 1, cur),
            start_pos=pos,
            chunk_lens=jnp.ones((B,), jnp.int32),
            active=active,
        )
        logits_d, kv = decoder_decode(
            params, cfg, cache.kv_pages, ctx, input_ids=tok
        )
        cache.kv_pages = kv
        for b in range(B):
            p = int(pos[b])
            if bool(active[b]):
                np.testing.assert_allclose(
                    np.asarray(logits_d[b]),
                    np.asarray(full_logits[b, p]),
                    rtol=2e-4, atol=2e-4,
                    err_msg=f"b={b} pos={p}",
                )
        cur = jnp.where(active, cur + 1, cur)


def alloc_decode_masked(cache, req_ids, active):
    """Decode-alloc only the active rows (inactive rows keep their length)."""
    old = cache.seq_lens[req_ids]
    c2 = alloc_decode(cache, req_ids)
    # Roll back inactive rows' length bump (page pops for them are rare and
    # harmless here; production uses the scheduler's active set).
    new_lens = jnp.where(active, c2.seq_lens[req_ids], old)
    c2.seq_lens = c2.seq_lens.at[req_ids].set(new_lens)
    return c2
