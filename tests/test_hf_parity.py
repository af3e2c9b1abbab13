"""Logit parity vs HuggingFace transformers (torch CPU).

The reference's de-facto model test is a side-by-side HF comparison
(tests/models/test_qwen2.py:112 prefill_stage_compare / :195
decode_stage_compare, run manually on real checkpoints). Here the same check
is a real CI test: build a *tiny* HF model from config with random init,
convert its weights through the real converter (utils/weights.py), and demand
fp32 logit agreement for prefill and for step-by-step paged decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

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
)
from lite_llama_tpu.utils.weights import convert_hf_state_dict

TINY = dict(
    hidden_size=64,
    intermediate_size=112,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=128,
    max_position_embeddings=64,
)


def build_hf(model_type, tie, **extra):
    torch.manual_seed(0)
    if model_type == "llama":
        hf_cfg = transformers.LlamaConfig(
            **TINY, tie_word_embeddings=tie, rope_theta=10000.0, **extra
        )
        model = transformers.LlamaForCausalLM(hf_cfg)
        ours = LlamaConfig.from_dict(hf_cfg.to_dict(), dtype=jnp.float32,
                                     max_seq_len=64)
    elif model_type == "qwen2":
        hf_cfg = transformers.Qwen2Config(**TINY, tie_word_embeddings=tie)
        model = transformers.Qwen2ForCausalLM(hf_cfg)
        ours = Qwen2Config.from_dict(hf_cfg.to_dict(), dtype=jnp.float32,
                                     max_seq_len=64)
    elif model_type == "qwen3":
        hf_cfg = transformers.Qwen3Config(
            **TINY, head_dim=16, tie_word_embeddings=tie
        )
        model = transformers.Qwen3ForCausalLM(hf_cfg)
        ours = Qwen3Config.from_dict(hf_cfg.to_dict(), dtype=jnp.float32,
                                     max_seq_len=64)
    else:
        raise ValueError(model_type)
    model.eval()
    return model, ours


@pytest.mark.parametrize(
    "model_type,tie",
    [("llama", True), ("llama", False), ("qwen2", True), ("qwen3", False)],
    ids=["llama-tied", "llama-untied", "qwen2", "qwen3"],
)
def test_prefill_and_decode_match_hf(model_type, tie):
    model, cfg = build_hf(model_type, tie)
    params = convert_hf_state_dict(model.state_dict(), cfg)

    B, S = 2, 7
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(B, S))

    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    # --- prefill parity
    cache = create_kv_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        num_pages=16, page_size=4, max_reqs=B, max_seq_len=32,
        dtype=jnp.float32,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)
    cache = alloc_prefill(cache, req, lens)
    ctx = AttnContext(cache.page_table[req], lens,
                      jnp.zeros((B,), jnp.int32), lens)
    logits, kv = decoder_prefill(
        params, cfg, cache.kv_pages, ctx, input_ids=jnp.asarray(ids)
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, rtol=1e-3, atol=2e-4
    )
    cache.kv_pages = kv

    # --- decode parity: feed 3 more tokens one at a time
    more = rng.integers(0, cfg.vocab_size, size=(B, 3))
    full = np.concatenate([ids, more], axis=1)
    with torch.no_grad():
        hf_full = model(torch.tensor(full)).logits.numpy()
    for t in range(3):
        cache = alloc_decode(cache, req)
        pos = cache.seq_lens[req] - 1
        ctx = AttnContext(cache.page_table[req], cache.seq_lens[req], pos,
                          jnp.ones((B,), jnp.int32), jnp.ones((B,), bool))
        logits_d, kv = decoder_decode(
            params, cfg, cache.kv_pages, ctx,
            input_ids=jnp.asarray(full[:, S + t]),
        )
        cache.kv_pages = kv
        np.testing.assert_allclose(
            np.asarray(logits_d), hf_full[:, S + t], rtol=1e-3, atol=2e-4,
            err_msg=f"decode step {t}",
        )


def test_llama3_rope_scaling_matches_hf():
    scaling = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 32,
    }
    model, cfg = build_hf("llama", True, rope_scaling=scaling)
    assert cfg.rope_scaling is not None
    params = convert_hf_state_dict(model.state_dict(), cfg)
    B, S = 1, 9
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, size=(B, S))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()
    cache = create_kv_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        num_pages=16, page_size=4, max_reqs=B, max_seq_len=32,
        dtype=jnp.float32,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)
    cache = alloc_prefill(cache, req, lens)
    ctx = AttnContext(cache.page_table[req], lens,
                      jnp.zeros((B,), jnp.int32), lens)
    logits, _ = decoder_prefill(
        params, cfg, cache.kv_pages, ctx, input_ids=jnp.asarray(ids)
    )
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=1e-3, atol=2e-4)


def test_converted_roundtrip(tmp_path):
    """Offline converter roundtrip (reference tests/others/test_convert.py)."""
    from lite_llama_tpu.utils.weights import load_converted, save_converted

    model, cfg = build_hf("qwen2", True)
    params = convert_hf_state_dict(model.state_dict(), cfg)
    save_converted(params, cfg, str(tmp_path / "out"))
    reloaded = load_converted(str(tmp_path / "out"), dtype=jnp.float32)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(reloaded)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # config roundtrip through load_config
    from lite_llama_tpu.config import load_config

    cfg2 = load_config(str(tmp_path / "out"))
    assert cfg2.model_type == "qwen2"
    assert cfg2.hidden_size == cfg.hidden_size
