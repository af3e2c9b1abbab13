"""Quantized weights × parallelism (VERDICT r2 next #4: the QTensor
PartitionSpecs, the quantized-fusion tp path and the unfusable guard were
code without tests — advisor r1 finding #5 was only half-closed).

Covers: (a) int8-weight engine on a tp=2 mesh == single-device int8 engine
token for token (exercises parallel/shardings.py qtensor specs and the
QTensor fuse-with-tp path in models/decoder.py fuse_qkv_params);
(b) int8-weight engine under dp=2; (c) the unfusable-quantized-wkv
ValueError."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import TextGenerator
from lite_llama_tpu.models.decoder import init_decoder_params
from lite_llama_tpu.parallel.shardings import make_mesh
from lite_llama_tpu.quant.qtensor import QTensor, quantize_decoder_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def tiny_cfg():
    return LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=96,
        max_seq_len=64, dtype=jnp.float32, eos_token_id=95,
    )


def _qparams(cfg):
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    return quantize_decoder_params(params, jnp.int8)


def _generate(engine, prompts):
    return [
        o.token_ids
        for o in TextGenerator(engine).generate_tokens(
            prompts, max_gen_len=8, temperature=0.0
        )
    ]


@pytest.mark.parametrize("tp,dp", [(2, 1), (2, 2), (1, 2)])
def test_quantized_engine_mesh_parity(tp, dp):
    cfg = tiny_cfg()
    qparams = _qparams(cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 1], [5, 5, 5, 5]]
    base = InferenceEngine(cfg, qparams, page_size=8, max_reqs=4,
                           num_pages=32)
    want = _generate(base, prompts)
    mesh = make_mesh(tp=tp, dp=dp)
    sharded = InferenceEngine(
        cfg, qparams, page_size=8, max_reqs=4 * dp, num_pages=32 * dp,
        mesh=mesh,
    )
    if tp > 1:
        # auto-fused under tp; storage stays quantized end to end
        assert isinstance(sharded.params["layers"]["wqkv"], QTensor)
        q = sharded.params["layers"]["wqkv"].q
        assert q.dtype == jnp.int8
        # the flat O axis is actually tp-sharded on the mesh
        assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // tp
    got = _generate(sharded, prompts)
    assert got == want


def test_quantized_dp_engine_disjoint_state():
    from lite_llama_tpu.generation.sampling import SamplingParams

    cfg = tiny_cfg()
    qparams = _qparams(cfg)
    mesh = make_mesh(tp=2, dp=2)
    engine = InferenceEngine(cfg, qparams, page_size=8, max_reqs=8,
                             num_pages=64, mesh=mesh)
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    slots = engine.admit_requests([16] * 4)
    assert {s // engine.M_local for s in slots} == {0, 1}
    engine.prefill(prompts, SamplingParams.make(4, temperature=0.0), slots)
    per_shard = {}
    for sh in engine.cache.seq_lens.addressable_shards:
        live = int((np.asarray(sh.data) > 0).sum())
        per_shard.setdefault(sh.index[0].start or 0, live)
    assert sorted(per_shard.values()) == [2, 2], per_shard


def test_unfused_quantized_wkv_cannot_shard():
    """A contiguous tp shard of quantized wkv's flat output axis crosses the
    K|V boundary; the policy must refuse loudly (parallel/shardings.py
    unfusable_quantized) instead of producing wrong shards."""
    cfg = tiny_cfg()
    qparams = _qparams(cfg)
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="fuse QKV first"):
        InferenceEngine(
            cfg, qparams, page_size=8, max_reqs=4, num_pages=32,
            mesh=mesh, fuse_qkv=False,
        )


@pytest.mark.parametrize("group_size", [None, 16], ids=["perchan", "g16"])
def test_int4_engine_mesh_parity(group_size):
    """Packed INT4 (optionally C-grouped scales) under tp=2: fusion must
    concatenate the PACKED byte axis without splitting nibble pairs, the
    grouped scale gets its nG axis replicated by the sharding policy, and
    generation matches the single-device int4 engine token for token."""
    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q4 = quantize_decoder_params(params, jnp.int4, group_size=group_size)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    base = InferenceEngine(cfg, q4, page_size=8, max_reqs=4, num_pages=32)
    want = _generate(base, prompts)
    sharded = InferenceEngine(
        cfg, q4, page_size=8, max_reqs=4, num_pages=32,
        mesh=make_mesh(tp=2, dp=1),
    )
    fused = sharded.params["layers"]["wqkv"]
    assert isinstance(fused, QTensor) and fused.packed
    if group_size is not None:
        assert fused.grouped and fused.scale.ndim == 3
    assert _generate(sharded, prompts) == want


def test_int4_qwen2_bias_engine_tp_parity():
    """Qwen2 (attention biases) with int4 weights under tp=2: the fused
    qkv_bias rides alongside the packed fused weight; parity vs
    single-device int4."""
    from lite_llama_tpu.config import Qwen2Config

    cfg = Qwen2Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=96,
        max_seq_len=64, dtype=jnp.float32, eos_token_id=95,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(3))
    q4 = quantize_decoder_params(params, jnp.int4, group_size=16)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    base = InferenceEngine(cfg, q4, page_size=8, max_reqs=4, num_pages=32)
    want = _generate(base, prompts)
    sharded = InferenceEngine(
        cfg, q4, page_size=8, max_reqs=4, num_pages=32,
        mesh=make_mesh(tp=2, dp=1),
    )
    assert "qkv_bias" in sharded.params["layers"]
    assert _generate(sharded, prompts) == want


@pytest.mark.parametrize("tp,dp", [(2, 1), (2, 2)])
def test_int8_kv_engine_mesh_parity(tp, dp):
    """INT8-KV pool on a mesh: the merged scale planes [L, T, SCALE_LANES]
    shard dp on the token axis with lanes replicated
    (parallel/shardings.py _cache_leaf_sharding) — greedy tokens must match
    the single-device int8-KV engine."""
    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 1], [5, 5, 5, 5]]
    base = InferenceEngine(cfg, params, page_size=8, max_reqs=4,
                           num_pages=32, kv_quant="int8")
    want = _generate(base, prompts)
    mesh = make_mesh(tp=tp, dp=dp)
    sharded = InferenceEngine(
        cfg, params, page_size=8, max_reqs=4 * dp, num_pages=32 * dp,
        mesh=mesh, kv_quant="int8",
    )
    assert sharded.cache.kv_pages.scales.ndim == 3
    got = _generate(sharded, prompts)
    assert got == want
