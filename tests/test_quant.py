"""Weight-only INT8/FP8 quantization correctness.

Beyond-reference capability (BASELINE.md targets): quantized projections must
keep logits close to full precision, generation must run end-to-end, and
qeinsum must equal einsum-on-dequantized exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import TextGenerator
from lite_llama_tpu.models.decoder import init_decoder_params
from lite_llama_tpu.quant.qtensor import (
    QTensor,
    dequantize_tree,
    qeinsum,
    quantize,
    quantize_decoder_params,
)

CFG = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=97,
    max_seq_len=64,
    dtype=jnp.float32,
)


@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn],
                         ids=["int8", "fp8"])
def test_qeinsum_matches_dequant(qdtype):
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 16), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32), jnp.float32)
    qt = quantize(w, (0,), qdtype)
    assert qt.q.dtype == qdtype
    assert qt.scale.shape == (64,)  # flat out-channel scales
    assert qt.q.shape == (32, 64)  # [C, O] storage
    got = qeinsum("bh,hnd->bnd", x, qt)
    want = jnp.einsum("bh,hnd->bnd", x, qt.dequant(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_int4_pack_unpack_roundtrip():
    """Packed-int4 storage: two signed nibbles per int8 byte along O
    (byte j = columns (2j, 2j+1) as (low, high) nibble), with unpack() the
    exact pack inverse (VERDICT r2 next #3 — int4 weights halve int8's HBM
    traffic; plain int8 shift arithmetic throughout: no s4 dtype (jit-arg
    RecursionError) and no weight-side nibble interleave (3.3x slowdown))."""
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 16), jnp.float32)
    qt = quantize(w, (0,), jnp.int4)
    assert qt.packed and qt.q.dtype == jnp.int8
    assert qt.q.shape == (32, 32)  # [C, O//2] packed bytes
    u = qt.unpack()
    assert u.shape == (32, 64) and u.dtype == jnp.int8
    vals = np.asarray(u)
    assert vals.min() >= -7 and vals.max() <= 7
    # unpack . pack is the identity on the quantized grid: requantizing the
    # dequantized weight reproduces the same packed bytes
    qt2 = quantize(qt.dequant(jnp.float32), (0,), jnp.int4)
    np.testing.assert_array_equal(np.asarray(qt2.q), np.asarray(qt.q))


@pytest.mark.parametrize("group_size", [None, 8], ids=["perchan", "g8"])
@pytest.mark.parametrize("qdtype", [jnp.int4, jnp.int8], ids=["int4", "int8"])
def test_qeinsum_matches_dequant_int4_grouped(qdtype, group_size):
    """qeinsum == einsum-on-dequantized for packed int4 and for C-grouped
    scales (grouped scales are int4's accuracy recovery: per-channel int4
    over a deep contraction is lossy on a 16-level grid)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 16), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32), jnp.float32)
    qt = quantize(w, (0,), qdtype, group_size=group_size)
    if group_size is not None:
        # packed int4 scales are PAIRED (one per byte column, [nG, O/2]);
        # int8 keeps full per-channel resolution [nG, O].
        o_sc = 32 if qt.packed else 64
        assert qt.scale.shape == (32 // group_size, o_sc)
    got = qeinsum("bh,hnd->bnd", x, qt)
    want = jnp.einsum("bh,hnd->bnd", x, qt.dequant(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_int4_stacked_scan_slice():
    """Layer-stacked int4 QTensor sliced per-layer (the decoder's lax.scan
    access pattern) keeps packed storage + grouped scales consistent."""
    ws = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 4, 16), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32), jnp.float32)
    qt = quantize(ws, (1,), jnp.int4, group_size=16)
    assert qt.q.shape == (3, 32, 32) and qt.scale.shape == (3, 2, 32)
    sl = jax.tree_util.tree_map(lambda a: a[1], qt)
    got = qeinsum("bh,hnd->bnd", x, sl)
    want = jnp.einsum("bh,hnd->bnd", x, sl.dequant(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    one = quantize(ws[1], (0,), jnp.int4, group_size=16)
    np.testing.assert_array_equal(np.asarray(one.q), np.asarray(sl.q))


def test_int4_grouped_recovers_accuracy():
    """The point of grouped scales: per-group amax tracks outliers, so g=32
    int4 must beat per-channel int4 on reconstruction error for a weight
    with per-row outliers."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    w[rng.integers(0, 256, 8), :] *= 20.0  # contraction-dim outlier rows
    w = jnp.asarray(w)
    err_pc = float(jnp.mean(jnp.abs(
        quantize(w, (0,), jnp.int4).dequant(jnp.float32) - w)))
    err_g = float(jnp.mean(jnp.abs(
        quantize(w, (0,), jnp.int4, group_size=32).dequant(jnp.float32) - w)))
    # 0.7 (not 0.5): paired byte-column scales (quant/qtensor.py) trade a
    # little amax resolution — amplified here by the deliberately
    # heavy-tailed outliers — for a scale layout the matmul kernel can
    # apply without any even/odd split; grouping must still clearly win.
    assert err_g < err_pc * 0.7, (err_g, err_pc)


def test_quantize_roundtrip_error_small():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 64), jnp.float32) * 0.05
    qt = quantize(w, (0,), jnp.int8)
    err = jnp.abs(qt.dequant(jnp.float32) - w)
    # int8 symmetric: max error ~ scale/2 per channel
    assert float(jnp.max(err / jnp.max(jnp.abs(w), 0, keepdims=True))) < 0.01


@pytest.mark.parametrize(
    "qdtype,group_size",
    [(jnp.int8, None), (jnp.float8_e4m3fn, None), (jnp.int4, 16)],
    ids=["int8", "fp8", "int4-g16"],
)
def test_quantized_decoder_logits_close(qdtype, group_size):
    from lite_llama_tpu.executor.kv_cache import alloc_prefill, create_kv_cache
    from lite_llama_tpu.models.decoder import AttnContext, decoder_prefill

    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_decoder_params(params, qdtype, group_size=group_size)
    # Tree structure sanity: projections are QTensors
    assert isinstance(qparams["layers"]["wq"], QTensor)
    assert qparams["layers"]["attn_norm"] is params["layers"]["attn_norm"]

    B, S = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    lens = jnp.full((B,), S, jnp.int32)

    def run(p):
        cache = create_kv_cache(
            cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
            num_pages=16, page_size=4, max_reqs=B, max_seq_len=32,
            dtype=jnp.float32,
        )
        req = jnp.arange(B, dtype=jnp.int32)
        cache = alloc_prefill(cache, req, lens)
        ctx = AttnContext(cache.page_table[req], lens,
                          jnp.zeros((B,), jnp.int32), lens)
        logits, _ = decoder_prefill(p, cfg, cache.kv_pages, ctx, input_ids=ids)
        return logits

    full = run(params)
    quant = run(qparams)
    dequant = run(dequantize_tree(qparams, jnp.float32))
    # quantized forward == forward on dequantized weights (same math)
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(dequant), rtol=1e-3, atol=1e-3
    )
    # and close to full precision in probability space
    pf = jax.nn.softmax(full, -1)
    pq = jax.nn.softmax(quant, -1)
    tv = float(jnp.max(jnp.sum(jnp.abs(pf - pq), -1))) / 2
    assert tv < 0.05, f"total variation {tv}"


@pytest.mark.parametrize(
    "qdtype,group_size", [(jnp.int8, None), (jnp.int4, 32)],
    ids=["int8", "int4-g32"],
)
def test_quantized_generation_end_to_end(qdtype, group_size):
    cfg = LlamaConfig(**CFG, eos_token_id=96)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_decoder_params(params, qdtype, group_size=group_size)
    engine = InferenceEngine(cfg, qparams, page_size=8, max_reqs=4,
                             num_pages=32, decode_chunk=4)
    gen = TextGenerator(engine)
    out = gen.generate_tokens([[1, 2, 3], [7, 8]], max_gen_len=8,
                              temperature=0.0)
    assert all(1 <= len(o.token_ids) <= 8 for o in out)
    # greedy path matches generation with explicitly dequantized weights
    engine2 = InferenceEngine(cfg, dequantize_tree(qparams, jnp.float32),
                              page_size=8, max_reqs=4, num_pages=32,
                              decode_chunk=4)
    out2 = TextGenerator(engine2).generate_tokens(
        [[1, 2, 3], [7, 8]], max_gen_len=8, temperature=0.0
    )
    for a, b in zip(out, out2):
        assert a.token_ids == b.token_ids


# ---------------------------------------------------------------------------
# Pallas packed-int4 matmul kernel (ops/qmatmul.py) — interpret mode on CPU


@pytest.mark.parametrize("grouped", [None, 128], ids=["perchan", "g128"])
def test_qmatmul_kernel_matches_dequant(grouped):
    """The W4A8 streaming int4 kernel == einsum of the int8-quantized
    activations against the dequantized weight (the kernel is EXACT integer
    math after activation quantization), for layer-stacked storage indexed
    by a traced layer id (the decoder scan's access pattern) —
    per-pair-channel and C-grouped scales."""
    from lite_llama_tpu.ops.qmatmul import (
        qmm_supported,
        quantize_activations,
        quantized_matmul_packed,
    )

    L, C, O = 3, 256, 512
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, C, O), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, C), jnp.float32)
    qt = quantize(ws, (1,), jnp.int4, group_size=grouped)
    nG = qt.scale.shape[-2] if qt.grouped else None
    assert qmm_supported(C, O // 2, nG, 5)
    xi, xs, _ = quantize_activations(x, nG or 1)
    for l in (0, 2):
        got = quantized_matmul_packed(
            x, qt.q, qt.scale, jnp.asarray(l, jnp.int32),
            interpret=True, out_dtype=jnp.float32,
        )
        sl = jax.tree_util.tree_map(lambda a, l=l: a[l], qt)
        want = jnp.einsum(
            "bc,co->bo", xi.astype(jnp.float32), sl.dequant(jnp.float32)
        ) * xs[:, None]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )
        # and the A8 step itself stays close to the full-precision product
        full = jnp.einsum("bc,co->bo", x, sl.dequant(jnp.float32))
        rel = float(
            jnp.max(jnp.abs(got - full)) / jnp.max(jnp.abs(full))
        )
        assert rel < 0.02, rel


def test_qeinsum_layer_indexed_matches_sliced():
    """qeinsum on a layer-indexed stacked QTensor (decoder scan form) ==
    qeinsum on the sliced per-layer tensor, including an extra stack dim
    (the gate_up [L, 2, H, I] shape)."""
    import dataclasses

    L, H, I = 3, 64, 96
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, 2, H, I), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, H), jnp.float32)
    qt = quantize(ws, (2,), jnp.int4, group_size=32)

    def run(li):
        layered = dataclasses.replace(qt, layer=li)
        return qeinsum("bh,chi->bci", x, layered)

    got = jax.jit(run)(jnp.asarray(1, jnp.int32))
    sl = jax.tree_util.tree_map(lambda a: a[1], qt)
    want = qeinsum("bh,chi->bci", x, sl)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_int4_padded_wide_output():
    """Wide, 512-misaligned output axes (the 128256 llama vocab) pad their
    packed storage to a 1024 multiple for lane-aligned kernel DMA; every
    consumer (dequant, qeinsum XLA path, the kernel itself) slices back to
    the logical width."""
    from lite_llama_tpu.ops.qmatmul import (
        quantize_activations, quantized_matmul_packed,
    )

    C, O = 256, 8448  # O/2 = 4224, not 512-aligned -> pads to 9216
    w = jax.random.normal(jax.random.PRNGKey(0), (C, O), jnp.float32)
    qt = quantize(w, (0,), jnp.int4, group_size=128)
    assert qt.q.shape == (C, 9216 // 2) and qt.out_shape == (O,)
    dq = qt.dequant(jnp.float32)
    assert dq.shape == (C, O)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, C), jnp.float32)
    got = qeinsum("bc,co->bo", x, qt)
    assert got.shape == (3, O)
    want = jnp.einsum("bc,co->bo", x, dq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # the kernel path sees the padded storage and zero-fills the pad cols
    xi, xs, _ = quantize_activations(x, qt.scale.shape[-2])
    yk = quantized_matmul_packed(
        x, qt.q[None], qt.scale[None], jnp.asarray(0, jnp.int32),
        interpret=True, out_dtype=jnp.float32,
    )
    assert yk.shape == (3, 9216)
    wantk = jnp.einsum(
        "bc,co->bo", xi.astype(jnp.float32), dq) * xs[:, None]
    np.testing.assert_allclose(np.asarray(yk[:, :O]), np.asarray(wantk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(yk[:, O:]), 0.0, atol=1e-4)


@pytest.mark.parametrize("grouped", [None, 64], ids=["perchan", "g64"])
def test_qmatmul_int8_kernel_matches(grouped):
    """The W8A8 int8 kernel == einsum of int8-quantized activations against
    the dequantized weight (exact integer math after activation quant)."""
    from lite_llama_tpu.ops.qmatmul import (
        qmm_supported,
        quantize_activations,
        quantized_matmul_int8,
    )

    L, C, O = 3, 256, 512
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, C, O), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, C), jnp.float32)
    qt = quantize(ws, (1,), jnp.int8, group_size=grouped)
    assert not qt.packed
    nG = qt.scale.shape[-2] if qt.grouped else None
    assert qmm_supported(C, O, nG, 5)
    xi, xs, _ = quantize_activations(x, nG or 1)
    for l in (0, 2):
        got = quantized_matmul_int8(
            x, qt.q, qt.scale, jnp.asarray(l, jnp.int32),
            interpret=True, out_dtype=jnp.float32,
        )
        sl = jax.tree_util.tree_map(lambda a, l=l: a[l], qt)
        want = jnp.einsum(
            "bc,co->bo", xi.astype(jnp.float32), sl.dequant(jnp.float32)
        ) * xs[:, None]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_sigma_ffn_matches_canonical():
    """σ-shuffled FFN (sigma_ffn=True): gate/up outputs stay in even/odd-
    concatenated order and down_proj consumes σ-permuted rows — the full
    pipeline must equal einsum on the σ tree's own dequantized (canonical)
    weights, and generation must match the dequantized engine."""
    from lite_llama_tpu.ops.ref import swiglu

    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_decoder_params(params, jnp.int4, group_size=16,
                                 sigma_ffn=True)
    gu, dn = qp["layers"]["gate_up_proj"], qp["layers"]["down_proj"]
    assert gu.sigma_out and dn.sigma_in
    # Round 4: σ-FFN stores gate/up FLAT [L, H, 2I] (one kernel launch per
    # layer — each pallas launch costs ~3.3 us fixed); the σ output is the
    # quarters [ge | ue | go | uo] and swiglu runs per even/odd quarter.
    assert gu.q.ndim == 3 and len(gu.out_shape) == 1
    # one layer's FFN: quantized σ pipeline vs dequantized canonical math
    gu0 = jax.tree_util.tree_map(lambda a: a[0], gu)
    dn0 = jax.tree_util.tree_map(lambda a: a[0], dn)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.hidden_size),
                          jnp.float32)
    y = qeinsum("bh,hj->bj", x, gu0)  # σ quarters
    q4 = y.shape[-1] // 4
    prod = jnp.concatenate(
        [
            swiglu(y[:, :q4], y[:, q4 : 2 * q4]),
            swiglu(y[:, 2 * q4 : 3 * q4], y[:, 3 * q4 :]),
        ],
        axis=-1,
    )
    got = qeinsum("bi,ih->bh", prod, dn0)
    gu_dq = gu0.dequant(jnp.float32)  # canonical [H, 2I] (gate | up cols)
    I = gu_dq.shape[-1] // 2
    dn_dq = dn0.dequant(jnp.float32)  # canonical [I, H]
    gu_full = jnp.einsum("bh,hj->bj", x, gu_dq)
    want = jnp.einsum(
        "bi,ih->bh", swiglu(gu_full[:, :I], gu_full[:, I:]), dn_dq,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
    # end-to-end generation parity vs the dequantized tree
    engine = InferenceEngine(cfg, qp, page_size=8, max_reqs=4, num_pages=32,
                             decode_chunk=4)
    out = TextGenerator(engine).generate_tokens(
        [[1, 2, 3], [7, 8]], max_gen_len=8, temperature=0.0)
    engine2 = InferenceEngine(cfg, dequantize_tree(qp, jnp.float32),
                              page_size=8, max_reqs=4, num_pages=32,
                              decode_chunk=4)
    out2 = TextGenerator(engine2).generate_tokens(
        [[1, 2, 3], [7, 8]], max_gen_len=8, temperature=0.0)
    for a, b in zip(out, out2):
        assert a.token_ids == b.token_ids


def test_sigma_ffn_rejected_under_tp():
    """σ-marked tensors must be rejected by the tp sharding layer (shard
    boundaries cut across the σ order)."""
    from lite_llama_tpu.parallel.shardings import make_mesh, ShardingPolicy
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_decoder_params(params, jnp.int4, group_size=16,
                                 sigma_ffn=True)
    mesh = make_mesh(tp=2, dp=1)
    pol = ShardingPolicy(mesh=mesh)
    with pytest.raises(ValueError, match="sigma_ffn=False"):
        pol.shard_params(cfg, qp)


def test_sigma_out_with_padded_output():
    """σ-ordered output slicing must drop each HALF's lane padding (a flat
    [:O] slice of [evens|odds] keeps the evens' zero-pad tail and drops real
    odd columns — review finding, round 3)."""
    import dataclasses
    from lite_llama_tpu.ops.qmatmul import (
        quantize_activations, quantized_matmul_packed,
    )

    C, O = 64, 8448  # O/2 = 4224, not 512-aligned -> storage pads to 4608
    w = jax.random.normal(jax.random.PRNGKey(0), (C, O), jnp.float32)
    qt = dataclasses.replace(
        quantize(w, (0,), jnp.int4, group_size=32), sigma_out=True
    )
    assert qt.q.shape[-1] == 4608  # padded per-half storage
    x = jax.random.normal(jax.random.PRNGKey(1), (3, C), jnp.float32)
    got = qeinsum("bc,co->bo", x, qt)
    assert got.shape == (3, O)
    dq = qt.dequant(jnp.float32)  # canonical [C, O]
    full = jnp.einsum("bc,co->bo", x, dq)
    # σ order: evens then odds of the CANONICAL product
    want = jnp.concatenate([full[:, 0::2], full[:, 1::2]], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # layered kernel path (interpret): same σ slicing rule
    lt = dataclasses.replace(
        qt, q=qt.q[None], scale=qt.scale[None],
        layer=jnp.asarray(0, jnp.int32),
    )
    import lite_llama_tpu.ops as ops_mod
    prev = ops_mod._BACKEND
    ops_mod.set_backend("xla")  # keep dispatch off pallas on CPU
    try:
        got2 = qeinsum("bc,co->bo", x, lt)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Riffle-packed column order (round 5: byte j packs canonical cols
# (j, j + Wb/2) per block, so the kernel's no-interleave output IS canonical
# — measured +8.0% on the int4+int8KV headline)


@pytest.mark.parametrize("blocks", [1, 2])
def test_riffle_qeinsum_matches_dequant(blocks):
    """Riffled qeinsum must equal einsum on its own dequantized (canonical)
    weight — grouped scales, both block counts, XLA dual-dot path."""
    C, O = 64, 128
    w = jax.random.normal(jax.random.PRNGKey(0), (C, O), jnp.float32)
    qt = quantize(w, (0,), jnp.int4, group_size=16, riffle_blocks=blocks)
    assert qt.riffle_groups == blocks
    dq = qt.dequant(jnp.float32)
    assert dq.shape == (C, O)
    # int4 g=16 quantization error only (no layout error)
    assert float(jnp.abs(dq - w).max()) < float(jnp.abs(w).max()) * 0.15
    x = jax.random.normal(jax.random.PRNGKey(1), (3, C), jnp.float32)
    got = qeinsum("bc,co->bo", x, qt)
    want = jnp.einsum("bc,co->bo", x, dq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_riffle_padded_wide_output():
    """Riffle + lane-alignment padding (the lm_head case): pad columns land
    at the END of the recombined canonical axis, so the trailing
    [:O_logical] slice is exact — on both the XLA path and the layered
    kernel path (interpret)."""
    import dataclasses

    C, O = 64, 8448  # O/2 = 4224 -> storage pads to 4608
    w = jax.random.normal(jax.random.PRNGKey(0), (C, O), jnp.float32)
    qt = quantize(w, (0,), jnp.int4, group_size=32, riffle_blocks=1)
    assert qt.q.shape[-1] == 4608
    x = jax.random.normal(jax.random.PRNGKey(1), (3, C), jnp.float32)
    dq = qt.dequant(jnp.float32)
    assert dq.shape == (C, O)
    got = qeinsum("bc,co->bo", x, qt)
    want = jnp.einsum("bc,co->bo", x, dq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    import lite_llama_tpu.ops as ops_mod

    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        lt = dataclasses.replace(
            qt, q=qt.q[None], scale=qt.scale[None],
            layer=jnp.asarray(0, jnp.int32),
        )
        got_k = qeinsum("bc,co->bo", x, lt)
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert got_k.shape == (3, O)
    # W4A8 kernel path: activation int8 quantization tolerance
    rel = float(jnp.abs(got_k - want).max() / jnp.abs(want).max())
    assert rel < 0.05, rel


def test_riffle_decoder_params_layout_and_parity():
    """quantize_decoder_params(riffle=True): wqkv fused before packing,
    gate_up flat [L, H, 2I], per-key riffle block counts; dequantize_tree
    folds back to canonical; generation matches the dequantized engine."""
    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_decoder_params(params, jnp.int4, group_size=16,
                                 riffle=True)
    L = qp["layers"]
    assert "wqkv" in L and "wq" not in L  # fused before packing
    assert L["wqkv"].riffle_groups == 1
    gu, dn = L["gate_up_proj"], L["down_proj"]
    assert gu.riffle_groups == 1 and gu.q.ndim == 3
    assert not gu.sigma_out and not dn.sigma_in
    assert dn.riffle_groups == 1
    assert L["o_proj"].riffle_groups == 1

    # dequantized tree folds back to canonical layouts and drives a
    # token-identical engine
    engine = InferenceEngine(cfg, qp, page_size=8, max_reqs=4, num_pages=32,
                             decode_chunk=4)
    out = TextGenerator(engine).generate_tokens(
        [[1, 2, 3], [7, 8]], max_gen_len=8, temperature=0.0)
    engine2 = InferenceEngine(cfg, dequantize_tree(qp, jnp.float32),
                              page_size=8, max_reqs=4, num_pages=32,
                              decode_chunk=4)
    out2 = TextGenerator(engine2).generate_tokens(
        [[1, 2, 3], [7, 8]], max_gen_len=8, temperature=0.0)
    for a, b in zip(out, out2):
        assert a.token_ids == b.token_ids


def test_riffle_logits_close_to_bf16():
    """Riffled int4 g=16 logits stay close to full precision (same gate the
    canonical int4 layout passes) — the riffle scale pairing (j, j+Wb/2)
    must not measurably change quantization quality."""
    from lite_llama_tpu.executor.kv_cache import alloc_prefill, create_kv_cache
    from lite_llama_tpu.models.decoder import AttnContext, decoder_prefill

    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_decoder_params(params, jnp.int4, group_size=16,
                                 riffle=True)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([8], jnp.int32)

    def logits_for(p):
        cache = create_kv_cache(
            cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
            num_pages=8, page_size=8, max_reqs=1, max_seq_len=64,
            dtype=jnp.float32,
        )
        cache = alloc_prefill(cache, jnp.asarray([0], jnp.int32), lens)
        ctx = AttnContext(
            table_rows=cache.page_table[:1], seq_lens=lens,
            start_pos=jnp.zeros((1,), jnp.int32), chunk_lens=lens,
        )
        lg, _ = decoder_prefill(p, cfg, cache.kv_pages, ctx, input_ids=ids)
        return np.asarray(lg)

    lq = logits_for(qp)
    lf = logits_for(params)
    rel = np.abs(lq - lf).max() / np.abs(lf).max()
    assert rel < 0.25, rel  # int4 g=16 on a tiny model: same bound as σ


def test_riffle_sigma_mutually_exclusive():
    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="mutually exclusive"):
        quantize_decoder_params(params, jnp.int4, group_size=16,
                                sigma_ffn=True, riffle=True)


def test_riffle_fuse_after_pack_rejected():
    """Byte-fusing riffled wq/wkv must be refused loudly (riffled bytes
    carry no contiguous canonical slices)."""
    import dataclasses

    from lite_llama_tpu.models.decoder import fuse_qkv_params

    cfg = LlamaConfig(**CFG)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_decoder_params(params, jnp.int4, group_size=16)
    qp["layers"]["wq"] = dataclasses.replace(
        qp["layers"]["wq"], riffle_groups=1
    )
    with pytest.raises(ValueError, match="riffle"):
        fuse_qkv_params(qp)
