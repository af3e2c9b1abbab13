"""Context-parallel decode attention: KV pool sharded over a mesh axis.

Beyond-reference (SURVEY.md §2.6: SP/CP absent in the reference; §5: the
split-KV LSE algebra is CP-combinable by design). Parity gates: the sharded
result must match the single-device kernel / XLA reference on a replicated
pool — bf16-class tolerance, every pool dtype, with and without the engine's
virtual newest-token protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import lite_llama_tpu.ops.ref as ref
from lite_llama_tpu.parallel.context_parallel import cp_paged_flash_decode
from tests.test_attention_kernels import build_paged_kv

pytestmark = pytest.mark.quick


def cp_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("cp",))


def shard_pool(kv_pool, mesh):
    """Place the pool sharded on the token-row axis (what the engine's
    sharding policy would do for a cp axis)."""
    pages = jax.device_put(
        kv_pool.pages, NamedSharding(mesh, P(None, None, "cp", None))
    )
    scales = (
        jax.device_put(kv_pool.scales, NamedSharding(mesh, P(None, "cp", None)))
        if kv_pool.scales is not None
        else None
    )
    return type(kv_pool)(
        pages=pages, scales=scales, page_size=kv_pool.page_size,
        num_kv_heads=kv_pool.num_kv_heads, head_dim=kv_pool.head_dim,
    )


@pytest.mark.parametrize("quantized", [False, True])
def test_cp_decode_matches_replicated(quantized):
    """Pages scattered across 4 shards (the permutation table guarantees
    requests straddle shard boundaries) must reproduce the replicated
    result; includes a one-token and a page-boundary request."""
    B, Nq, Hkv, D, ps = 3, 8, 2, 128, 16
    L, Pg, ppr = 2, 32, 8
    lens = [33, 1, 48]
    mesh = cp_mesh(4)
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(0), L, Hkv, Pg, ps, D, B, ppr, lens,
        quantized=quantized,
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Nq, D), jnp.float32)
    pool_sharded = shard_pool(kv_pool, mesh)
    for layer in (0, 1):
        want = ref.paged_decode_attention(
            q, kv_pool, layer, table, lens_arr, ppr * ps
        )
        got = cp_paged_flash_decode(
            q, pool_sharded, layer, table, lens_arr, mesh,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5,
            err_msg=f"layer={layer} quantized={quantized}",
        )


def test_cp_decode_narrow_head_int8():
    """D=64 + int8 pool (Llama-3.2-1B shape) over the cp axis — the wide
    score-domain form composes with the shard-local page view."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 64, 16
    L, Pg, ppr = 2, 32, 8
    lens = [47, 16]
    mesh = cp_mesh(4)
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(2), L, Hkv, Pg, ps, D, B, ppr, lens,
        quantized=True,
    )
    q = jax.random.normal(jax.random.PRNGKey(3), (B, Nq, D), jnp.float32)
    want = ref.paged_decode_attention(q, kv_pool, 0, table, lens_arr, ppr * ps)
    got = cp_paged_flash_decode(
        q, shard_pool(kv_pool, mesh), 0, table, lens_arr, mesh,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_cp_decode_virtual_new_token():
    """The engine's deferred-scatter decode protocol (pool holds seq-1
    tokens, newest K/V ride as args) folds in AFTER the cross-device
    combine; must match the single-device virtual-token path."""
    from lite_llama_tpu.ops.attention_decode import paged_flash_decode

    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, Pg, ppr = 2, 32, 8
    lens = [34, 17]  # pool holds 33 / 16 tokens; newest rides separately
    mesh = cp_mesh(4)
    lens_arr = jnp.asarray(lens, jnp.int32)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(4), L, Hkv, Pg, ps, D, B, ppr, lens
    )
    q = jax.random.normal(jax.random.PRNGKey(5), (B, Nq, D), jnp.float32)
    k_new = jax.random.normal(jax.random.PRNGKey(6), (B, Hkv, D), jnp.float32)
    v_new = jax.random.normal(jax.random.PRNGKey(7), (B, Hkv, D), jnp.float32)
    want = paged_flash_decode(
        q, kv_pool, 0, table, lens_arr, interpret=True,
        k_new=k_new, v_new=v_new,
    )
    got = cp_paged_flash_decode(
        q, shard_pool(kv_pool, mesh), 0, table, lens_arr, mesh,
        interpret=True, k_new=k_new, v_new=v_new,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5
    )


def test_cp_decode_empty_and_single_shard():
    """A request whose pages all land on ONE shard plus an empty slot:
    other shards contribute l=0 terms and the combine must stay NaN-free."""
    B, Nq, Hkv, D, ps = 2, 4, 2, 128, 16
    L, ppr = 1, 4
    Pg = 8  # 2 pages per shard on cp=4
    mesh = cp_mesh(4)
    # Hand-build: request 0 owns pages 0,1 (both on shard 0); request 1 empty.
    kv_pool, _ = build_paged_kv(
        jax.random.PRNGKey(8), L, Hkv, Pg, ps, D, B, ppr, [32, 0]
    )
    table = jnp.asarray([[0, 1, 0, 0], [0, 0, 0, 0]], jnp.int32)
    lens_arr = jnp.asarray([32, 0], jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, Nq, D), jnp.float32)
    want = ref.paged_decode_attention(q, kv_pool, 0, table, lens_arr, ppr * ps)
    got = cp_paged_flash_decode(
        q, shard_pool(kv_pool, mesh), 0, table, lens_arr, mesh,
        interpret=True,
    )
    got_np = np.asarray(got)
    assert np.isfinite(got_np[0]).all()
    np.testing.assert_allclose(
        got_np[0], np.asarray(want)[0], rtol=3e-5, atol=3e-5
    )


# ---------------------------------------------------------------------------
# Engine-level context parallelism (VERDICT r3 next #3: CP wired into the
# engine — mesh axis, pool sharding, decode routing, kv writes)


def _cp_cfg():
    from lite_llama_tpu.config import LlamaConfig

    return LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=97, max_seq_len=128, dtype=jnp.float32, eos_token_id=96,
    )


def test_cp_engine_greedy_parity():
    """A cp=4 engine (pool token rows sharded over the cp mesh axis,
    decode routed through cp_paged_flash_decode inside the jitted chunk)
    generates the same greedy tokens as the single-device engine, and its
    pool is ACTUALLY row-sharded on the mesh."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.parallel.shardings import make_mesh

    cfg = _cp_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    # Multi-page prompts so requests straddle cp shard boundaries.
    prompts = [rng.integers(0, 96, size=n).tolist() for n in (37, 22)]
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")  # identical decode kernel on both engines
    try:
        base = InferenceEngine(cfg, params, page_size=8, max_reqs=2,
                               num_pages=64)
        want = [
            o.token_ids for o in TextGenerator(base).generate_tokens(
                prompts, max_gen_len=6, temperature=0.0)
        ]
        mesh = make_mesh(cp=4)
        assert mesh.axis_names == ("dp", "cp", "tp")
        eng = InferenceEngine(cfg, params, page_size=8, max_reqs=2,
                              num_pages=64, mesh=mesh)
        pages = eng.cache.kv_pages.pages
        local = pages.addressable_shards[0].data.shape
        assert local[2] == pages.shape[2] // 4  # rows really sharded
        got = [
            o.token_ids for o in TextGenerator(eng).generate_tokens(
                prompts, max_gen_len=6, temperature=0.0)
        ]
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert got == want


def test_cp_engine_chunked_prefill_long_prompt():
    """Long prompts through the cp engine: chunked prefill takes the
    GSPMD-partitionable XLA history path (force_ref — a pallas_call is
    opaque to the row shard), decode runs cp-sharded; parity vs the
    single-device engine on the same chunked configuration."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.parallel.shardings import make_mesh

    cfg = _cp_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 96, size=n).tolist() for n in (70, 45)]
    kw = dict(page_size=8, max_reqs=2, num_pages=64, prefill_chunk=32)
    prev = ops_mod._BACKEND
    ops_mod.set_backend("xla")  # chunked ref path on both engines
    try:
        base = InferenceEngine(cfg, params, **kw)
        want = [
            o.token_ids for o in TextGenerator(base).generate_tokens(
                prompts, max_gen_len=5, temperature=0.0)
        ]
        eng = InferenceEngine(cfg, params, mesh=make_mesh(cp=4), **kw)
        got = [
            o.token_ids for o in TextGenerator(eng).generate_tokens(
                prompts, max_gen_len=5, temperature=0.0)
        ]
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert got == want


def test_cp_engine_rejects_dp_tp_composition():
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.parallel.shardings import make_mesh

    cfg = _cp_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="cp mesh axis"):
        InferenceEngine(cfg, params, page_size=8, max_reqs=4, num_pages=64,
                        mesh=make_mesh(cp=2, dp=2))


def test_cp_rejects_mis_sharded_pool():
    """ADVICE r3: a replicated (or differently-sharded) pool must be
    rejected eagerly — jit would otherwise silently reshard the FULL pool
    per call (a collective that negates the claimed 1/N HBM traffic)."""
    B, Nq, Hkv, D, ps = 2, 8, 2, 128, 16
    L, Pg, ppr = 1, 16, 4
    mesh = cp_mesh(4)
    kv_pool, table = build_paged_kv(
        jax.random.PRNGKey(0), L, Hkv, Pg, ps, D, B, ppr, [33, 9]
    )
    q = jax.random.normal(jax.random.PRNGKey(1), (B, Nq, D), jnp.float32)
    lens_arr = jnp.asarray([33, 9], jnp.int32)
    with pytest.raises(ValueError, match="resharded"):
        cp_paged_flash_decode(  # replicated pool: not P(None,None,cp,None)
            q, kv_pool, 0, table, lens_arr, mesh, interpret=True,
        )


# ---------------------------------------------------------------------------
# Context-parallel CHUNKED PREFILL at kernel speed (VERDICT r4 next #4: the
# history walk used to force_ref under cp>1, leaving long-prompt prefill —
# exactly where cp should pay — off the kernel path)


from lite_llama_tpu.parallel.context_parallel import cp_flash_prefill_chunked


def _chunk_history_fixture(key, B, Hkv, D, ps, Pg, lens_total, S_hist, S_c,
                           quantized=False):
    """History pool (first S_hist tokens in pages) + chunk q/k/v."""
    from lite_llama_tpu.executor.kv_cache import (
        alloc_prefill, create_kv_cache, kv_write_prefill,
    )

    L = 2
    cache = create_kv_cache(
        L, Hkv, D, num_pages=Pg, page_size=ps, max_reqs=B,
        max_seq_len=S_hist + S_c, dtype=jnp.float32,
        quantized=quantized,
    )
    req = jnp.arange(B, dtype=jnp.int32)
    lens_arr = jnp.asarray(lens_total, jnp.int32)
    cache = alloc_prefill(cache, req, lens_arr)
    k_full = jax.random.normal(key, (B, S_hist + S_c, Hkv, D), jnp.float32)
    v_full = jax.random.normal(
        jax.random.fold_in(key, 1), (B, S_hist + S_c, Hkv, D), jnp.float32
    )
    hist_lens = jnp.minimum(lens_arr, S_hist)
    for li in range(L):
        cache.kv_pages = kv_write_prefill(
            cache.kv_pages, li, k_full[:, :S_hist], v_full[:, :S_hist],
            cache.page_table[req], jnp.zeros((B,), jnp.int32), hist_lens,
        )
    chunk_lens = jnp.clip(lens_arr - S_hist, 0, S_c)
    q = jax.random.normal(
        jax.random.fold_in(key, 2), (B, S_c, 4, D), jnp.float32
    )
    return cache, req, q, k_full[:, S_hist:], v_full[:, S_hist:], \
        chunk_lens, hist_lens


@pytest.mark.parametrize("quantized", [False, True])
def test_cp_chunked_prefill_matches_replicated(quantized):
    """Sharded history walk + leader-only chunk phase + LSE combine must
    reproduce the replicated chunked-prefill result (both layers; one
    request fully inside history so its chunk rows are empty)."""
    B, Hkv, D, ps, Pg = 2, 2, 128, 16, 32
    S_hist, S_c = 32, 16
    mesh = cp_mesh(4)
    cache, req, q, k_c, v_c, chunk_lens, hist_lens = _chunk_history_fixture(
        jax.random.PRNGKey(0), B, Hkv, D, ps, Pg, [40, 25], S_hist, S_c,
        quantized=quantized,
    )
    pool_sharded = shard_pool(cache.kv_pages, mesh)
    table = cache.page_table[req]
    for layer in (0, 1):
        want = ref.chunked_prefill_attention(
            q, k_c, v_c, chunk_lens, hist_lens, cache.kv_pages, layer, table,
        )
        got = cp_flash_prefill_chunked(
            q, k_c, v_c, chunk_lens, hist_lens, pool_sharded, layer, table,
            mesh, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=f"layer={layer} quantized={quantized}",
        )


def test_cp_chunked_prefill_no_history():
    """First chunk of a prompt (start_pos = 0): only the leader's causal
    chunk phase contributes; non-leader shards export identity states."""
    B, Hkv, D, ps, Pg = 2, 2, 128, 16, 32
    S_c = 32
    mesh = cp_mesh(4)
    cache, req, q, k_c, v_c, chunk_lens, hist_lens = _chunk_history_fixture(
        jax.random.PRNGKey(3), B, Hkv, D, ps, Pg, [20, 32], 0, S_c,
    )
    pool_sharded = shard_pool(cache.kv_pages, mesh)
    table = cache.page_table[req]
    want = ref.chunked_prefill_attention(
        q, k_c, v_c, chunk_lens, hist_lens, cache.kv_pages, 0, table,
    )
    got = cp_flash_prefill_chunked(
        q, k_c, v_c, chunk_lens, hist_lens, pool_sharded, 0, table,
        mesh, interpret=True,
    )
    B_, S_, Nq_ = got.shape[:3]
    valid = np.asarray(chunk_lens)
    for b in range(B_):
        np.testing.assert_allclose(
            np.asarray(got)[b, : valid[b]], np.asarray(want)[b, : valid[b]],
            rtol=2e-4, atol=2e-4,
        )


def test_cp_engine_chunked_prefill_kernel_path(monkeypatch):
    """VERDICT r4 next #4 done-criterion: a cp=4 engine prefilling a
    multi-chunk prompt routes chunked prefill through the Pallas cp kernel
    (probe-asserted) and generates the same greedy tokens as the
    single-device kernel engine."""
    import lite_llama_tpu.ops as ops_mod
    from lite_llama_tpu import parallel as _par  # noqa: F401
    import lite_llama_tpu.parallel.context_parallel as cp_mod
    from lite_llama_tpu.config import LlamaConfig
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.parallel.shardings import make_mesh

    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=128,
        vocab_size=97, max_seq_len=256, dtype=jnp.float32, eos_token_id=96,
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, 96, size=n).tolist() for n in (70, 45)]
    kw = dict(page_size=8, max_reqs=2, num_pages=64, prefill_chunk=32)
    calls = []
    real = cp_mod.cp_flash_prefill_chunked

    def probe(*a, **k):
        calls.append(True)
        return real(*a, **k)

    monkeypatch.setattr(cp_mod, "cp_flash_prefill_chunked", probe)
    prev = ops_mod._BACKEND
    ops_mod.set_backend("pallas")
    try:
        base = InferenceEngine(cfg, params, **kw)
        want = [
            o.token_ids for o in TextGenerator(base).generate_tokens(
                prompts, max_gen_len=5, temperature=0.0)
        ]
        eng = InferenceEngine(cfg, params, mesh=make_mesh(cp=4), **kw)
        got = [
            o.token_ids for o in TextGenerator(eng).generate_tokens(
                prompts, max_gen_len=5, temperature=0.0)
        ]
    finally:
        ops_mod.set_backend(prev if prev else "auto")
    assert calls, "cp engine did not route chunked prefill via the cp kernel"
    assert got == want
