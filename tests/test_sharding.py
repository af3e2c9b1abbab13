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
    wqkv = sharded.params["layers"]["wqkv"]  # engine fuses QKV by default
    shards = wqkv.addressable_shards
    assert len(shards) == 8
    # fused head axis (axis 2) split 8 ways
    assert shards[0].data.shape[2] == wqkv.shape[2] // 8
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


# ---------------------------------------------------------------------------
# Data parallelism — the dp axis must carry REAL work division (VERDICT r1
# missing #1: it used to be decorative replication).


def _make_dp_engine(tp, dp, max_reqs_per_group=4, pages_per_group=32):
    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(tp=tp, dp=dp)
    return InferenceEngine(
        cfg, params, page_size=8, max_reqs=max_reqs_per_group * dp,
        num_pages=pages_per_group * dp, mesh=mesh,
    ), cfg, params


def test_dp_shards_hold_disjoint_requests():
    from lite_llama_tpu.generation.sampling import SamplingParams

    engine, cfg, _ = _make_dp_engine(tp=4, dp=2)
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    slots = engine.admit_requests([16] * 4)
    groups = {s // engine.M_local for s in slots}
    assert groups == {0, 1}, slots  # admission balanced across groups
    engine.prefill(prompts, SamplingParams.make(4, temperature=0.0), slots)
    per_shard = {}
    for sh in engine.cache.seq_lens.addressable_shards:
        live = int((np.asarray(sh.data) > 0).sum())
        per_shard.setdefault(sh.index[0].start or 0, live)
    counts = sorted(per_shard.values())
    assert counts == [2, 2], per_shard  # disjoint: 2 requests per dp shard
    # The dp shards of the KV pool hold DIFFERENT data (replication would
    # make them byte-identical).
    pool_shards = {}
    for sh in engine.cache.kv_pages.pages.addressable_shards:
        pool_shards.setdefault(sh.index[2].start or 0, np.asarray(sh.data))
    a, b = list(pool_shards.values())[:2]
    assert not np.array_equal(a, b)


def test_dp_generation_matches_single_device():
    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    base = InferenceEngine(cfg, params, page_size=8, max_reqs=4, num_pages=32)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 1], [5, 5, 5, 5]]
    want = [o.token_ids for o in TextGenerator(base).generate_tokens(
        prompts, max_gen_len=8, temperature=0.0)]
    engine, _, _ = _make_dp_engine(tp=2, dp=2)
    got = [o.token_ids for o in TextGenerator(engine).generate_tokens(
        prompts, max_gen_len=8, temperature=0.0)]
    assert got == want


def test_dp_does_not_replicate_flops():
    """(dp=2, tp=4) at batch 2B must cost ~the same PER-DEVICE flops as
    (dp=1, tp=4) at batch B — the compile-level proof that dp divides work
    instead of replicating it (the r1 dryrun could not catch this: logits
    parity is trivially satisfied by replication)."""
    from lite_llama_tpu.generation.sampling import SamplingParams

    def decode_cost(engine, n_reqs, n=4):
        slots = engine.admit_requests([16] * n_reqs)
        pos, req_local, W = engine._group_layout(slots)
        Bl = engine.dp * W
        fn = engine._get_chunk_jit(n)
        args = (
            engine.params, engine.cache, jnp.asarray(req_local),
            jnp.zeros((Bl,), jnp.int32), jnp.zeros((Bl,), bool),
            jnp.full((Bl,), 16, jnp.int32), jax.random.PRNGKey(0),
            SamplingParams.make(Bl), jnp.asarray(n, jnp.int32),
        )
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return cost["flops"]

    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    mesh1 = make_mesh(tp=4, dp=1, devices=jax.devices()[:4])
    eng1 = InferenceEngine(cfg, params, page_size=8, max_reqs=4,
                           num_pages=32, mesh=mesh1)
    f1 = decode_cost(eng1, 4)
    eng2, _, _ = _make_dp_engine(tp=4, dp=2)
    f2 = decode_cost(eng2, 8)  # double the batch, two dp groups
    ratio = f2 / f1
    assert ratio < 1.35, (
        f"per-device flops ratio {ratio:.2f} — dp=2 at 2x batch should cost "
        f"~1x per device (replication would cost ~2x)"
    )
