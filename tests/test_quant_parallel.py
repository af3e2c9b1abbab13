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


# ---------------------------------------------------------------------------
# Pallas W4A8 kernel under tensor parallelism (VERDICT r3 next #1)


@pytest.mark.parametrize("grouped", [None, 64], ids=["perchan", "g64"])
def test_qmm_tp_wrapper_out_kind(grouped):
    """kind='out' (byte axis tp-sharded): the manual-tp shard_map wrapper
    == the single-device kernel bit for bit (x is replicated, so the
    per-shard activation quantization is identical)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lite_llama_tpu.ops.qmatmul import (
        qmm_tp_supported, quantized_matmul_packed,
        quantized_matmul_packed_tp,
    )
    from lite_llama_tpu.quant.qtensor import quantize

    tp = 4
    mesh = make_mesh(tp=tp, dp=2)
    L, C, O = 2, 256, 4096  # Oh=2048, per-shard 512
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, C, O), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, C), jnp.float32)
    qt = quantize(ws, (1,), jnp.int4, group_size=grouped)
    nG = qt.scale.shape[-2] if qt.grouped else None
    assert qmm_tp_supported("out", C, qt.q.shape[-1], nG, 5, tp)
    q = jax.device_put(qt.q, NamedSharding(mesh, P(None, None, "tp")))
    s_spec = P(None, None, "tp") if qt.grouped else P(None, "tp")
    s = jax.device_put(qt.scale, NamedSharding(mesh, s_spec))
    got = jax.jit(
        lambda x, q, s: quantized_matmul_packed_tp(
            x, q, s, jnp.asarray(1, jnp.int32), mesh, "out",
            out_dtype=jnp.float32, interpret=True,
        )
    )(x, q, s)
    want = quantized_matmul_packed(
        x, qt.q, qt.scale, jnp.asarray(1, jnp.int32), interpret=True,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grouped", [None, 64], ids=["perchan", "g64"])
def test_qmm_tp_wrapper_contract_kind(grouped):
    """kind='contract' (C axis tp-sharded, psum): equals the exact
    emulation — per shard, single-device kernel on the local (x, q, scale)
    slices, summed — and stays within W4A8 tolerance of full precision."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lite_llama_tpu.ops.qmatmul import (
        qmm_tp_supported, quantized_matmul_packed,
        quantized_matmul_packed_tp,
    )
    from lite_llama_tpu.quant.qtensor import quantize

    tp = 4
    mesh = make_mesh(tp=tp, dp=2)
    L, C, O = 2, 1024, 256  # per-shard C=256
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, C, O), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, C), jnp.float32)
    qt = quantize(ws, (1,), jnp.int4, group_size=grouped)
    nG = qt.scale.shape[-2] if qt.grouped else None
    assert qmm_tp_supported("contract", C, qt.q.shape[-1], nG, 5, tp)
    q = jax.device_put(qt.q, NamedSharding(mesh, P(None, "tp", None)))
    s_spec = P(None, "tp", None) if qt.grouped else P(None, None)
    s = jax.device_put(qt.scale, NamedSharding(mesh, s_spec))
    got = jax.jit(
        lambda x, q, s: quantized_matmul_packed_tp(
            x, q, s, jnp.asarray(0, jnp.int32), mesh, "contract",
            out_dtype=jnp.float32, interpret=True,
        )
    )(x, q, s)
    # exact emulation of the shard_map body
    Cl = C // tp
    nGl = (nG // tp) if qt.grouped else None
    want = sum(
        quantized_matmul_packed(
            x[:, i * Cl : (i + 1) * Cl],
            qt.q[:, i * Cl : (i + 1) * Cl],
            qt.scale[:, i * nGl : (i + 1) * nGl] if qt.grouped else qt.scale,
            jnp.asarray(0, jnp.int32), interpret=True,
            out_dtype=jnp.float32,
        )
        for i in range(tp)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    full = jnp.einsum("bc,co->bo", x, qt.dequant(jnp.float32)[0])
    rel = float(jnp.max(jnp.abs(got - full)) / jnp.max(jnp.abs(full)))
    assert rel < 0.02, rel


def _kernel_cfg():
    """Shapes whose per-shard packed widths stay kernel-legal at tp=2
    (Oh_local % 128 == 0 everywhere: fused qkv 512->256->128/shard,
    gate_up I=512, lm_head V=1024)."""
    return LlamaConfig(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        vocab_size=1024, max_seq_len=64, dtype=jnp.float32,
        eos_token_id=1023, tie_word_embeddings=False,
    )


def test_int4_kernel_engine_tp_logit_parity(monkeypatch):
    """End to end: a tp=2 engine with packed-int4 weights routes its
    matmuls through the Pallas W4A8 kernel via the manual-tp shard_map
    (asserted by probe), and its prefill logits match the single-device
    kernel engine within W4A8 per-shard activation-quant tolerance (the
    contract-sharded matmuls fit each shard's int8 row scale to its own
    slice, so exact bit parity is not expected; VERDICT r3 next #1)."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.models.decoder import AttnContext, decoder_prefill
    from lite_llama_tpu.ops import qmatmul as qmm

    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q4 = quantize_decoder_params(params, jnp.int4, group_size=64)
    ids = jnp.asarray(
        [[1, 2, 3, 4, 5, 0, 0, 0], [9, 8, 7, 0, 0, 0, 0, 0]], jnp.int32
    )
    lens = jnp.asarray([5, 3], jnp.int32)
    ctx = AttnContext(
        table_rows=jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        seq_lens=lens, start_pos=jnp.zeros((2,), jnp.int32),
        chunk_lens=lens,
    )
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")  # interpret mode on CPU (ops._interpret)
    try:
        base = InferenceEngine(cfg, q4, page_size=8, max_reqs=4,
                               num_pages=32)
        want, _ = jax.jit(
            lambda p, c: decoder_prefill(p, cfg, c, ctx, input_ids=ids)
        )(base.params, base.cache.kv_pages)

        calls = []
        real = qmm.quantized_matmul_packed_tp

        def probe(*a, **k):
            calls.append(k.get("kind") or a[5])
            return real(*a, **k)

        monkeypatch.setattr(qmm, "quantized_matmul_packed_tp", probe)
        sharded = InferenceEngine(
            cfg, q4, page_size=8, max_reqs=4, num_pages=32,
            mesh=make_mesh(tp=2, dp=1),
        )
        got, _ = jax.jit(
            lambda p, c: decoder_prefill(
                p, cfg, c, ctx, input_ids=ids, shard=sharded._mshard
            )
        )(sharded.params, sharded.cache.kv_pages)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert {"out", "contract"} <= set(calls), calls
    a, b = np.asarray(want), np.asarray(got)
    assert np.abs(a - b).max() < 0.03 * np.abs(a).max(), (
        np.abs(a - b).max(), np.abs(a).max()
    )


def test_int4_kernel_engine_tp_dp_token_parity():
    """tp=2 x dp=2 (manual-dp shard_map OUTSIDE, manual-tp shard_map
    INSIDE — the nested partial-manual pattern) generates EXACTLY the
    tokens of the tp=2 dp=1 kernel engine: dp splits requests without
    touching the math, so this parity is bit-exact even though W4A8
    per-shard activation quantization keeps tp engines off bit parity
    with the single-chip engine."""
    import lite_llama_tpu.ops as ops_mod

    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q4 = quantize_decoder_params(params, jnp.int4, group_size=64)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 1], [5, 5, 5, 5]]
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        tp_only = InferenceEngine(
            cfg, q4, page_size=8, max_reqs=4, num_pages=32,
            mesh=make_mesh(tp=2, dp=1),
        )
        want = _generate(tp_only, prompts)
        nested = InferenceEngine(
            cfg, q4, page_size=8, max_reqs=8, num_pages=64,
            mesh=make_mesh(tp=2, dp=2),
        )
        got = _generate(nested, prompts)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert got == want


def test_sigma_tp_dequant_matches_canonical():
    """sigma_tp=2's per-block σ layout stores the SAME values as the
    whole-axis σ layout, just block-permuted: with per-channel (ungrouped)
    scales the scale fits are identical (gate_up's byte pairs never cross
    a block boundary; down_proj's per-output-channel amax is row-order
    invariant), so dequantize_tree must round-trip both to EXACTLY the
    same canonical weights."""
    from lite_llama_tpu.quant.qtensor import dequantize_tree

    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    d1 = dequantize_tree(
        quantize_decoder_params(params, jnp.int4, sigma_ffn=True),
        jnp.float32,
    )
    d2 = dequantize_tree(
        quantize_decoder_params(
            params, jnp.int4, sigma_ffn=True, sigma_tp=2
        ),
        jnp.float32,
    )
    for key in ("gate_up_proj", "down_proj"):
        a = np.asarray(d1["layers"][key])
        b = np.asarray(d2["layers"][key])
        assert a.shape == b.shape, (key, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=key)


def test_sigma_tp_engine_parity_and_guard():
    """σ-FFN weights quantized with sigma_tp=2 run on a tp=2 mesh (each
    contiguous shard is one σ block) and generate exactly the tokens of
    the same params on a single device; mismatched sigma_groups != tp is
    rejected eagerly by the sharding layer."""
    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q_tp = quantize_decoder_params(
        params, jnp.int4, group_size=64, sigma_ffn=True, sigma_tp=2
    )
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [3, 1]]
    base = InferenceEngine(cfg, q_tp, page_size=8, max_reqs=4,
                           num_pages=32)
    want = _generate(base, prompts)
    sharded = InferenceEngine(
        cfg, q_tp, page_size=8, max_reqs=4, num_pages=32,
        mesh=make_mesh(tp=2, dp=1),
    )
    got = _generate(sharded, prompts)
    assert got == want
    # Whole-axis σ (sigma_tp=1) on a tp=2 mesh: shard boundaries would cut
    # across σ — must be rejected, not silently mis-sharded.
    q_1 = quantize_decoder_params(
        params, jnp.int4, group_size=64, sigma_ffn=True
    )
    with pytest.raises(ValueError, match="sigma_tp"):
        InferenceEngine(
            cfg, q_1, page_size=8, max_reqs=4, num_pages=32,
            mesh=make_mesh(tp=2, dp=1),
        )


def test_sigma_tp_kernel_routing(monkeypatch):
    """With the pallas backend, σ-tp weights ride the manual-tp W4A8
    kernel (probe-asserted, including the flat gate_up 'out' call and the
    σ-row down_proj 'contract' call) and prefill logits match the
    single-device σ kernel engine within per-shard activation-quant
    tolerance (same bound as the canonical-layout tp kernel test)."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.models.decoder import AttnContext, decoder_prefill
    from lite_llama_tpu.ops import qmatmul as qmm

    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q_tp = quantize_decoder_params(
        params, jnp.int4, group_size=64, sigma_ffn=True, sigma_tp=2
    )
    ids = jnp.asarray(
        [[1, 2, 3, 4, 5, 0, 0, 0], [9, 8, 7, 0, 0, 0, 0, 0]], jnp.int32
    )
    lens = jnp.asarray([5, 3], jnp.int32)
    ctx = AttnContext(
        table_rows=jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        seq_lens=lens, start_pos=jnp.zeros((2,), jnp.int32),
        chunk_lens=lens,
    )
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        base = InferenceEngine(cfg, q_tp, page_size=8, max_reqs=4,
                               num_pages=32)
        want, _ = jax.jit(
            lambda p, c: decoder_prefill(p, cfg, c, ctx, input_ids=ids)
        )(base.params, base.cache.kv_pages)

        calls = []
        real = qmm.quantized_matmul_packed_tp

        def probe(*a, **k):
            calls.append(k.get("kind") or a[5])
            return real(*a, **k)

        monkeypatch.setattr(qmm, "quantized_matmul_packed_tp", probe)
        sharded = InferenceEngine(
            cfg, q_tp, page_size=8, max_reqs=4, num_pages=32,
            mesh=make_mesh(tp=2, dp=1),
        )
        got, _ = jax.jit(
            lambda p, c: decoder_prefill(
                p, cfg, c, ctx, input_ids=ids, shard=sharded._mshard
            )
        )(sharded.params, sharded.cache.kv_pages)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert {"out", "contract"} <= set(calls), calls
    a, b = np.asarray(want), np.asarray(got)
    assert np.abs(a - b).max() < 0.03 * np.abs(a).max(), (
        np.abs(a - b).max(), np.abs(a).max()
    )


def test_tp_attention_wrappers_route_and_match(monkeypatch):
    """Round 4: under tp>1 with the pallas backend and a non-quantized
    pool, decode/prefill/chunked-prefill attention run through manual-tp
    shard_map wrappers (each shard's kernel sees only its kv-head slice —
    a bare pallas_call is GSPMD-opaque and would replicate the pool on
    real multi-chip hardware). Greedy tokens must match the single-device
    pallas engine bit for bit (attention is head-independent, so the
    sharded math is identical)."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.parallel import tp_attention as tpa

    # D=128: the chunked history kernel needs per-SHARD packability
    # (pack_factor(D, Hkv/tp) >= 1); D=32 with 2 local kv heads cannot
    # pack and correctly falls back to the XLA path instead.
    cfg = LlamaConfig(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=1024, max_seq_len=128, dtype=jnp.float32,
        eos_token_id=1023, tie_word_embeddings=False,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    # prompts > prefill_chunk force the chunked path too
    prompts = [list(range(2, 42)), [9, 8, 7]]
    calls = []
    for name in ("tp_paged_flash_decode", "tp_flash_prefill",
                 "tp_flash_prefill_chunked"):
        real = getattr(tpa, name)

        def probe(*a, _n=name, _r=real, **k):
            calls.append(_n)
            return _r(*a, **k)

        monkeypatch.setattr(tpa, name, probe)
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        base = InferenceEngine(cfg, params, page_size=8, max_reqs=4,
                               num_pages=64, prefill_chunk=32)
        want = _generate(base, prompts)
        sharded = InferenceEngine(
            cfg, params, page_size=8, max_reqs=4, num_pages=64,
            prefill_chunk=32, mesh=make_mesh(tp=2, dp=1),
        )
        got = _generate(sharded, prompts)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert {"tp_paged_flash_decode", "tp_flash_prefill_chunked"} <= set(
        calls
    ), set(calls)
    assert got == want


def test_tp_quantized_pool_attention_kernel_parity(monkeypatch):
    """INT8 pools now ride the manual-tp Pallas attention wrappers too
    (closing round 4's self-reported gap): the merged scale slab stays
    REPLICATED over tp — its lanes index GLOBAL heads — and an in-kernel
    ``head_offset`` shifts the one-hot scale selectors to each shard's
    head range (ops/attention_decode.py, ops/attention_prefill.py,
    parallel/tp_attention.py). Routing is probe-asserted for both the
    decode and the chunked-prefill (paged-history) kernels, and greedy
    tokens must match the single-device pallas int8-KV engine bit for bit
    (per-(token, head) quantization and per-head attention math are
    sharding-invariant)."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.parallel import tp_attention as tpa

    cfg = LlamaConfig(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=1024, max_seq_len=128, dtype=jnp.float32,
        eos_token_id=1023, tie_word_embeddings=False,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(1))
    # First prompt > prefill_chunk forces the chunked paged-history path
    # (the quantized history dequant is where head_offset matters).
    prompts = [list(range(2, 42)), [9, 8, 7]]
    calls = []
    for name in ("tp_paged_flash_decode", "tp_flash_prefill_chunked"):
        real = getattr(tpa, name)

        def probe(*a, _n=name, _r=real, **k):
            calls.append(_n)
            return _r(*a, **k)

        monkeypatch.setattr(tpa, name, probe)
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        base = InferenceEngine(cfg, params, page_size=8, max_reqs=4,
                               num_pages=64, prefill_chunk=32,
                               kv_quant="int8")
        want = _generate(base, prompts)
        sharded = InferenceEngine(
            cfg, params, page_size=8, max_reqs=4, num_pages=64,
            prefill_chunk=32, kv_quant="int8",
            mesh=make_mesh(tp=2, dp=1),
        )
        got = _generate(sharded, prompts)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert {"tp_paged_flash_decode", "tp_flash_prefill_chunked"} <= set(
        calls
    ), set(calls)
    assert got == want


def test_riffle_tp_kernel_routing(monkeypatch):
    """Riffle-packed weights (riffle_tp=2) ride the manual-tp W4A8 kernel
    (probe-asserted for both the 'out' and 'contract' kinds) and prefill
    logits match the single-device riffle kernel engine within per-shard
    activation-quant tolerance — the riffle analogue of
    test_sigma_tp_kernel_routing (round 5: riffle supersedes σ, kernel
    output canonical with no interleave anywhere)."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.models.decoder import AttnContext, decoder_prefill
    from lite_llama_tpu.ops import qmatmul as qmm

    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    q_tp = quantize_decoder_params(
        params, jnp.int4, group_size=64, riffle=True, riffle_tp=2
    )
    L = q_tp["layers"]
    assert "wqkv" in L and L["wqkv"].riffle_groups == 2
    assert L["gate_up_proj"].riffle_groups == 2
    assert L["o_proj"].riffle_groups == 1  # 'contract': whole-axis block
    assert L["down_proj"].riffle_groups == 1
    ids = jnp.asarray(
        [[1, 2, 3, 4, 5, 0, 0, 0], [9, 8, 7, 0, 0, 0, 0, 0]], jnp.int32
    )
    lens = jnp.asarray([5, 3], jnp.int32)
    ctx = AttnContext(
        table_rows=jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        seq_lens=lens, start_pos=jnp.zeros((2,), jnp.int32),
        chunk_lens=lens,
    )
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        base = InferenceEngine(cfg, q_tp, page_size=8, max_reqs=4,
                               num_pages=32)
        want, _ = jax.jit(
            lambda p, c: decoder_prefill(p, cfg, c, ctx, input_ids=ids)
        )(base.params, base.cache.kv_pages)

        calls = []
        real = qmm.quantized_matmul_packed_tp

        def probe(*a, **k):
            calls.append(k.get("kind") or a[5])
            return real(*a, **k)

        monkeypatch.setattr(qmm, "quantized_matmul_packed_tp", probe)
        sharded = InferenceEngine(
            cfg, q_tp, page_size=8, max_reqs=4, num_pages=32,
            mesh=make_mesh(tp=2, dp=1),
        )
        got, _ = jax.jit(
            lambda p, c: decoder_prefill(
                p, cfg, c, ctx, input_ids=ids, shard=sharded._mshard
            )
        )(sharded.params, sharded.cache.kv_pages)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert {"out", "contract"} <= set(calls), calls
    a, b = np.asarray(want), np.asarray(got)
    assert np.abs(a - b).max() < 0.03 * np.abs(a).max(), (
        np.abs(a - b).max(), np.abs(a).max()
    )


def test_riffle_tp_mismatch_rejected():
    """Riffle block counts that do not match the mesh must be rejected by
    the sharding layer for 'out'-sharded weights."""
    from lite_llama_tpu.parallel.shardings import ShardingPolicy

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    cfg = _kernel_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_decoder_params(params, jnp.int4, group_size=64,
                                 riffle=True, riffle_tp=1)
    pol = ShardingPolicy(mesh=make_mesh(tp=2, dp=1))
    with pytest.raises(ValueError, match="riffle"):
        pol.shard_params(cfg, qp)
