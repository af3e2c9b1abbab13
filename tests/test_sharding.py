"""Tensor-parallel sharding correctness on a virtual 8-device CPU mesh.

The reference has no distributed anything (SURVEY.md §2.6); these tests cover
the TPU-native scaling obligation: identical logits/tokens with tp=8, tp=4/dp=2
vs single-device, with weights and KV pages actually sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import TextGenerator
from lite_llama_tpu.models.decoder import init_decoder_params
from lite_llama_tpu.parallel.shardings import ShardingPolicy, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def tiny_cfg():
    return LlamaConfig(
        hidden_size=64,
        intermediate_size=128,  # divisible by 8
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=96,  # divisible by 8 for vocab sharding
        max_seq_len=64,
        dtype=jnp.float32,
        eos_token_id=95,
    )


def make_engines(tp, dp):
    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    base = InferenceEngine(cfg, params, page_size=8, max_reqs=4, num_pages=32)
    mesh = make_mesh(tp=tp, dp=dp)
    sharded = InferenceEngine(
        cfg, params, page_size=8, max_reqs=4, num_pages=32, mesh=mesh
    )
    return base, sharded


@pytest.mark.parametrize("tp,dp", [(8, 1), (4, 2)])
def test_sharded_generation_matches_single_device(tp, dp):
    base, sharded = make_engines(tp, dp)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    out_b = TextGenerator(base).generate_tokens(
        prompts, max_gen_len=10, temperature=0.0
    )
    out_s = TextGenerator(sharded).generate_tokens(
        prompts, max_gen_len=10, temperature=0.0
    )
    for b, s in zip(out_b, out_s):
        assert b.token_ids == s.token_ids


def test_params_actually_sharded():
    _, sharded = make_engines(8, 1)
    wq = sharded.params["layers"]["wq"]
    shards = wq.addressable_shards
    assert len(shards) == 8
    # head axis (axis 2) split 8 ways
    assert shards[0].data.shape[2] == wq.shape[2] // 8
    kp = sharded.cache.kv_pages.pages
    # planes [L, 2, T, Hkv*D]: head-channel axis (last) split 8 ways
    assert kp.addressable_shards[0].data.shape[3] == kp.shape[3] // 8


def test_mesh_requires_divisibility():
    cfg = tiny_cfg()
    mesh = make_mesh(tp=8)
    policy = ShardingPolicy(mesh)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    specs = policy.param_specs(cfg, params)
    assert specs["layers"]["wq"] is not None
