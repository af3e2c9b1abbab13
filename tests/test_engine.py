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
