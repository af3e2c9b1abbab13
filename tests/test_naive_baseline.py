"""The XLA-naive baseline must compute the SAME model as the engine — the
vs_naive speedup in bench.py is only meaningful if both sides produce the
same logits for the same weights and context."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarks.naive_baseline import _forward_naive
from lite_llama_tpu.config import LlamaConfig
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


@pytest.mark.quick
def test_naive_forward_matches_engine_decoder():
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=101,
        max_seq_len=32, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    B, S, max_seq = 2, 5, 32
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, size=(B, S)).astype(np.int32)

    # Engine path: paged prefill + one paged decode step.
    cache = create_kv_cache(2, 2, cfg.head_dim, num_pages=16, page_size=8,
                            max_reqs=B, max_seq_len=max_seq,
                            dtype=jnp.float32)
    req = jnp.arange(B, dtype=jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)
    cache = alloc_prefill(cache, req, lens)
    ctx = AttnContext(cache.page_table[req], lens,
                      jnp.zeros((B,), jnp.int32), lens)
    logits_p, kv = decoder_prefill(params, cfg, cache.kv_pages, ctx,
                                   input_ids=jnp.asarray(prompt))
    cache.kv_pages = kv
    next_tok = jnp.argmax(logits_p[:, S - 1], -1).astype(jnp.int32)
    cache = alloc_decode(cache, req)
    pos = cache.seq_lens[req] - 1
    ctx = AttnContext(cache.page_table[req], cache.seq_lens[req], pos,
                      jnp.ones((B,), jnp.int32), jnp.ones((B,), bool))
    logits_d, _ = decoder_decode(params, cfg, cache.kv_pages, ctx,
                                 input_ids=next_tok)

    # Naive path: dense KV, one position at a time.
    kv_naive = jnp.zeros(
        (2, B, max_seq, 2, cfg.num_key_value_heads, cfg.head_dim),
        jnp.float32,
    )
    logits_n = None
    for t in range(S):
        h = params["embed"][jnp.asarray(prompt[:, t])]
        logits_n, kv_naive = _forward_naive(
            params, cfg, h, kv_naive, t, t + 1, max_seq
        )
    np.testing.assert_allclose(
        np.asarray(logits_n), np.asarray(logits_p[:, S - 1]),
        rtol=2e-4, atol=2e-4,
    )
    h = params["embed"][next_tok]
    logits_n2, _ = _forward_naive(params, cfg, h, kv_naive, S, S + 1, max_seq)
    np.testing.assert_allclose(
        np.asarray(logits_n2), np.asarray(logits_d), rtol=2e-4, atol=2e-4
    )


@pytest.mark.quick
def test_dense_scan_step_matches_naive_forward():
    """The competent dense-scan baseline (vs_dense_scan in bench.py) must
    compute the same model as the per-token naive step — greedy tokens agree
    step for step from the same dense cache state."""
    from benchmarks.naive_baseline import _dense_scan_step

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=101,
        max_seq_len=32, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    B, max_seq = 2, 32
    kv_naive = jnp.zeros((2, B, max_seq, 2, 2, cfg.head_dim), jnp.float32)
    kv_scan = jnp.zeros((2, 2, B, max_seq, 2, cfg.head_dim), jnp.float32)
    tok_n = tok_s = jnp.asarray([3, 7], jnp.int32)
    key = jax.random.PRNGKey(1)
    for t in range(4):
        logits_n, kv_naive = _forward_naive(
            params, cfg, params["embed"][tok_n], kv_naive, t, t + 1, max_seq
        )
        tok_n = jnp.argmax(logits_n, -1).astype(jnp.int32)
        # temperature 0 -> greedy inside _dense_scan_step's sampler
        tok_s, kv_scan = _dense_scan_step(
            params, cfg, kv_scan, tok_s, t, key, 0.0, 0.9
        )
        assert tok_n.tolist() == tok_s.tolist(), f"step {t}"
    # cache layouts hold the same values ([L,B,S,2,h,d] vs [L,2,B,S,h,d])
    np.testing.assert_allclose(
        np.asarray(kv_naive.transpose(0, 3, 1, 2, 4, 5)),
        np.asarray(kv_scan), rtol=1e-5, atol=1e-5,
    )


def test_dense_scan_tps_runs():
    """dense_scan_decode_tps drives its scanned chunks end to end on a tiny
    config (the bench.py vs_dense_scan row's code path)."""
    from benchmarks.naive_baseline import dense_scan_decode_tps

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=101,
        max_seq_len=64, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    out = dense_scan_decode_tps(
        cfg, params, bs=2, prompt_len=4, measure_steps=8, warmup_steps=4,
        chunk=4, max_seq=64,
    )
    assert out["tokens_per_s"] > 0 and out["measure_steps"] >= 8
