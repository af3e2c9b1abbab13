"""Fused-QKV projection (VERDICT r1 next #8): one [H, (Nq+2Nkv)*D] matmul
per layer, shard-periodic head ordering, exact parity with the canonical
wq/wkv layout — plain, quantized, and under a tensor-parallel mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig, Qwen2Config
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import TextGenerator
from lite_llama_tpu.models.decoder import (
    AttnContext,
    decoder_prefill,
    fuse_qkv_params,
    init_decoder_params,
)
from lite_llama_tpu.executor.kv_cache import alloc_prefill, create_kv_cache
from lite_llama_tpu.parallel.shardings import ShardingPolicy, make_mesh


def _cfg(attention_bias=False, qk_norm=False, cls=LlamaConfig):
    kw = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, vocab_size=96,
        max_seq_len=64, dtype=jnp.float32,
    )
    if cls is Qwen2Config:
        return Qwen2Config(**kw)
    return LlamaConfig(**kw)


def _prefill_logits(cfg, params, shard=None):
    shard = shard or ShardingPolicy(mesh=None)
    B, S = 2, 8
    cache = create_kv_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        num_pages=32, page_size=8, max_reqs=B, max_seq_len=64,
        dtype=jnp.float32,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)
    cache = alloc_prefill(cache, req, lens)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    ctx = AttnContext(cache.page_table[req], lens, jnp.zeros((B,), jnp.int32), lens)
    logits, _ = decoder_prefill(params, cfg, cache.kv_pages, ctx,
                                input_ids=ids, shard=shard)
    return np.asarray(logits)


@pytest.mark.quick
@pytest.mark.parametrize("bias", [False, True])
def test_fused_matches_unfused(bias):
    cfg = _cfg(cls=Qwen2Config if bias else LlamaConfig)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_qkv_params(params, tp=1)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    if bias:
        assert "qkv_bias" in fused["layers"]
    a = _prefill_logits(cfg, params)
    b = _prefill_logits(cfg, fused)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_fused_shard_periodic_order_tp2():
    """tp=2 fusion reorders heads shard-periodically; logits must still
    match the canonical layout exactly (split restores canonical order)."""
    cfg = _cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_qkv_params(params, tp=2)

    class _FakeShard(ShardingPolicy):
        @property
        def tp(self):
            return 2

    a = _prefill_logits(cfg, params)
    b = _prefill_logits(cfg, fused, shard=_FakeShard(mesh=None))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_quantized_matches_unfused_quantized():
    from lite_llama_tpu.quant.qtensor import quantize_decoder_params

    cfg = _cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_decoder_params(params, jnp.int8)
    fusedq = fuse_qkv_params(qparams, tp=1)
    assert "wqkv" in fusedq["layers"]
    a = _prefill_logits(cfg, qparams)
    b = _prefill_logits(cfg, fusedq)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_engine_fuses_and_generates_identically():
    """Engine-level: fuse_qkv on/off must produce identical greedy tokens."""
    cfg = _cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]
    outs = {}
    for fuse in (False, True):
        eng = InferenceEngine(cfg, params, page_size=8, max_reqs=2,
                              num_pages=32, decode_chunk=4, fuse_qkv=fuse)
        if fuse:
            assert "wqkv" in eng.params["layers"]
        outs[fuse] = [
            o.token_ids for o in TextGenerator(eng).generate_tokens(
                prompts, max_gen_len=6, temperature=0.0)
        ]
    assert outs[False] == outs[True]


def test_fused_tp_mesh_parity():
    """Fused + real tp=2 mesh on the virtual CPU devices: logits parity with
    the unsharded unfused model (exercises the wqkv PartitionSpec and the
    shard-periodic split under GSPMD)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg = _cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    a = _prefill_logits(cfg, params)
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    shard = ShardingPolicy(mesh=mesh)
    fused = fuse_qkv_params(params, tp=2)
    sharded = shard.shard_params(cfg, fused)
    with mesh:
        b = _prefill_logits(cfg, sharded, shard=shard)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
