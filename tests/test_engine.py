"""Engine construction guards."""

import jax
import jax.numpy as jnp


def test_engine_rejects_dtype_mismatch():
    """fp32 weights against a bf16 config must fail loudly at construction
    (previously surfaced as an inscrutable lax.scan carry-dtype error deep
    inside the first prefill trace)."""
    import pytest
    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.models.decoder import init_decoder_params

    cfg32 = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=97,
        max_seq_len=64, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg32, jax.random.PRNGKey(0))
    cfg_bf16 = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=97,
        max_seq_len=64, dtype=jnp.bfloat16,
    )
    with pytest.raises(ValueError, match="config.dtype"):
        InferenceEngine(cfg_bf16, params, page_size=8, max_reqs=2,
                        num_pages=16)


def test_auto_num_pages_without_memory_stats(monkeypatch):
    """When the runtime has no memory_stats(), _auto_num_pages must compute
    a fit from the device-HBM table minus measured parameter bytes instead
    of silently sizing for max_reqs*max_seq_len (VERDICT r3 next #10 —
    that oversubscription OOMed at alloc time on stats-less runtimes)."""
    import unittest.mock as mock

    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.executor.kv_cache import kv_cache_bytes
    from lite_llama_tpu.models.decoder import init_decoder_params

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=97,
        max_seq_len=64, dtype=jnp.float32,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(cfg, params, page_size=8, max_reqs=4,
                             num_pages=16)

    class NoStats:
        device_kind = "weird accelerator"

        def memory_stats(self):
            raise RuntimeError("not implemented on this runtime")

    with mock.patch.object(jax, "devices", return_value=[NoStats()]):
        n = engine._auto_num_pages(0.9)
    per_page = kv_cache_bytes(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        1, engine.page_size, cfg.dtype,
    )
    want = engine.max_reqs * -(-cfg.max_seq_len // engine.page_size)
    # 16 GiB fallback * 0.9 - params - 1 GiB margin, floored at 64
    budget = 16 * (1 << 30) * 0.9
    fit = int((budget - engine._param_bytes() - (1 << 30)) // per_page)
    assert n == max(64, min(want, fit))
    # a huge theoretical demand must clamp to the computed fit, not `want`
    engine.max_reqs = 10**9
    with mock.patch.object(jax, "devices", return_value=[NoStats()]):
        n2 = engine._auto_num_pages(0.9)
    assert n2 <= max(64, fit)
