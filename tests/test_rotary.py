"""RoPE frequency-generation parity vs HF transformers' rope utils
(VERDICT r1 missing #5 / next #9: 'dynamic' and 'longrope' used to silently
degrade to the default frequencies)."""

import math
import types

import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.models.rotary import compute_inv_freq


def _cfg(rope_scaling, max_seq_len, mpe=64, head_dim=32, **extra):
    cfg = LlamaConfig(
        hidden_size=128, intermediate_size=256, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=4, head_dim=head_dim,
        vocab_size=64, max_seq_len=max_seq_len,
        max_position_embeddings=mpe, rope_theta=10000.0,
        rope_scaling=rope_scaling,
    )
    for k, v in extra.items():
        setattr(cfg, k, v)
    return cfg


def _hf_cfg(cfg):
    """Duck-typed config for transformers' rope init functions."""
    return types.SimpleNamespace(
        rope_theta=cfg.rope_theta,
        hidden_size=cfg.num_attention_heads * cfg.head_dim,
        num_attention_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        original_max_position_embeddings=getattr(
            cfg, "original_max_position_embeddings", None
        ),
        rope_scaling=cfg.rope_scaling,
        partial_rotary_factor=1.0,
    )


@pytest.mark.quick
@pytest.mark.parametrize("max_seq_len", [64, 256])
def test_dynamic_ntk_matches_hf(max_seq_len):
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    scaling = {"rope_type": "dynamic", "factor": 4.0}
    cfg = _cfg(scaling, max_seq_len)
    got, att = compute_inv_freq(cfg)
    want, want_att = ROPE_INIT_FUNCTIONS["dynamic"](
        _hf_cfg(cfg), device=None, seq_len=max_seq_len
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)
    assert att == float(want_att)


@pytest.mark.quick
@pytest.mark.parametrize("max_seq_len", [32, 256])
def test_longrope_matches_hf(max_seq_len):
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    dim_half = 16
    rng = np.random.default_rng(0)
    scaling = {
        "rope_type": "longrope",
        "short_factor": rng.uniform(1.0, 1.2, dim_half).tolist(),
        "long_factor": rng.uniform(2.0, 8.0, dim_half).tolist(),
    }
    # Phi-3 style: original_max_position_embeddings on the config itself.
    cfg = _cfg(scaling, max_seq_len, mpe=128,
               original_max_position_embeddings=64)
    got, att = compute_inv_freq(cfg)
    want, want_att = ROPE_INIT_FUNCTIONS["longrope"](
        _hf_cfg(cfg), device=None, seq_len=max_seq_len
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6)
    assert abs(att - float(want_att)) < 1e-9


@pytest.mark.quick
def test_dynamic_ntk_short_sequences_use_original_base():
    """ADVICE r2: HF keeps the ORIGINAL base until the live sequence exceeds
    max_position_embeddings; the forward must select the unscaled table for
    short requests instead of serving scaled (wrong-for-short-contexts)
    frequencies on every request."""
    import jax.numpy as jnp
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from lite_llama_tpu.models.decoder import _rope_tables
    from lite_llama_tpu.models.rotary import compute_inv_freq_dual
    from lite_llama_tpu.ops import rope_cos_sin

    scaling = {"rope_type": "dynamic", "factor": 4.0}
    cfg = _cfg(scaling, max_seq_len=256)  # mpe=64 << max_seq_len
    long_t, short_t, threshold, att = compute_inv_freq_dual(cfg)
    assert short_t is not None and threshold == 64
    # Short table == HF at seq_len <= mpe (original base).
    want_short, _ = ROPE_INIT_FUNCTIONS["dynamic"](
        _hf_cfg(cfg), device=None, seq_len=32
    )
    np.testing.assert_allclose(short_t, np.asarray(want_short), rtol=1e-6)
    # Long table == HF at the engine max.
    want_long, _ = ROPE_INIT_FUNCTIONS["dynamic"](
        _hf_cfg(cfg), device=None, seq_len=256
    )
    np.testing.assert_allclose(long_t, np.asarray(want_long), rtol=1e-6)
    # Forward-side selection: one short and one long request in a batch get
    # different tables at the same position index.
    positions = jnp.asarray([[5], [5]], jnp.int32)
    seq_lens = jnp.asarray([32, 200], jnp.int32)
    cos, sin = _rope_tables(cfg, positions, seq_lens)
    cs, _ = rope_cos_sin(positions[:1], jnp.asarray(short_t), att)
    cl, _ = rope_cos_sin(positions[1:], jnp.asarray(long_t), att)
    np.testing.assert_allclose(np.asarray(cos[0]), np.asarray(cs[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cos[1]), np.asarray(cl[0]), rtol=1e-6)
    # Non-dynamic types: single static table, no dual machinery.
    plain = _cfg(None, max_seq_len=256)
    t, s, th, _ = compute_inv_freq_dual(plain)
    assert s is None and th == 0


@pytest.mark.quick
def test_unknown_rope_type_raises():
    cfg = _cfg({"rope_type": "su"}, 64)
    with pytest.raises(ValueError, match="unsupported rope_scaling"):
        compute_inv_freq(cfg)
