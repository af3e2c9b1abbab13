"""Prompt-prefix caching (beyond-reference; the reference's prompt-cache
kernel is dead code — context_flashattention_nopad.py:140).

Correctness bar: prefix-cached generations must be token-identical to
uncached ones; page accounting must balance across reuse, donation, and
eviction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import TextGenerator


def _cfg():
    return LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=151,
        max_seq_len=128, dtype=jnp.float32,
    )


def _params(cfg):
    from lite_llama_tpu.models.decoder import init_decoder_params

    return init_decoder_params(cfg, jax.random.PRNGKey(0))


def _engine(cfg, params, prefix=True, **kw):
    kw.setdefault("page_size", 8)
    kw.setdefault("max_reqs", 4)
    kw.setdefault("num_pages", 48)
    kw.setdefault("decode_chunk", 4)
    return InferenceEngine(cfg, params, prefix_cache=prefix, **kw)


SYS = list(range(40, 60))  # 20 tokens = 2 full pages (page_size 8) + tail


@pytest.mark.quick
def test_prefix_reuse_is_token_identical():
    cfg = _cfg()
    params = _params(cfg)
    ref_eng = _engine(cfg, params, prefix=False)
    eng = _engine(cfg, params, prefix=True)
    p1 = SYS + [7, 8, 9]
    p2 = SYS + [11, 12]
    gen_ref = TextGenerator(ref_eng)
    gen = TextGenerator(eng)
    want1 = gen_ref.generate_tokens([p1], max_gen_len=6, temperature=0.0)
    want2 = gen_ref.generate_tokens([p2], max_gen_len=6, temperature=0.0)
    # First pass: no hits, donates the prompt's full pages on release.
    got1 = gen.generate_tokens([p1], max_gen_len=6, temperature=0.0)
    assert eng.stats.prefix_hits == 0
    assert got1[0].token_ids == want1[0].token_ids
    pt_first = eng.stats.prefill_tokens
    # Second pass with a shared system prefix: must hit and stay identical.
    got2 = gen.generate_tokens([p2], max_gen_len=6, temperature=0.0)
    assert eng.stats.prefix_hits == 1
    assert eng.stats.prefix_tokens_reused == 16  # 2 pages * 8 tokens
    assert got2[0].token_ids == want2[0].token_ids
    # And fewer prompt tokens were actually computed.
    assert eng.stats.prefill_tokens - pt_first < len(p2)


@pytest.mark.quick
def test_exact_prompt_rerun_recomputes_last_token():
    """A prompt that IS a cached prefix (all full pages) must still sample
    correctly — the last token is always recomputed."""
    cfg = _cfg()
    params = _params(cfg)
    eng = _engine(cfg, params)
    p = SYS[:16]  # exactly 2 pages
    gen = TextGenerator(eng)
    a = gen.generate_tokens([p], max_gen_len=5, temperature=0.0)
    b = gen.generate_tokens([p], max_gen_len=5, temperature=0.0)
    assert eng.stats.prefix_hits == 1
    assert a[0].token_ids == b[0].token_ids


def test_page_accounting_balances():
    cfg = _cfg()
    params = _params(cfg)
    eng = _engine(cfg, params)
    gen = TextGenerator(eng)
    for tail in ([1], [2, 3], [4, 5, 6]):
        gen.generate_tokens([SYS + tail], max_gen_len=4, temperature=0.0)
    # All slots free; pages = free pool + pages held by cache entries.
    held = sum(e[0] for e in eng.prefix[0].entries.values())
    assert eng._host_free_pages + held == eng.num_pages
    assert all(e[2] == 0 for e in eng.prefix[0].entries.values())  # no refs
    # Device stack must agree with the host count.
    assert int(eng.cache.free_top.sum()) == eng._host_free_pages


def test_eviction_frees_pages_under_pressure():
    cfg = _cfg()
    params = _params(cfg)
    eng = _engine(cfg, params, num_pages=16)  # tight pool
    gen = TextGenerator(eng)
    # Three distinct 2-page prefixes -> 3 cached entries (6 pages held).
    for base in (0, 30, 60):
        gen.generate_tokens([list(range(base, base + 17))],
                            max_gen_len=3, temperature=0.0)
    keys_before = set(eng.prefix[0].entries)
    held = sum(e[0] for e in eng.prefix[0].entries.values())
    assert held == 6 and len(keys_before) == 3
    # free = 10 pages; a request needing 13 forces LRU eviction.
    big = list(range(90, 90 + 40))
    out = gen.generate_tokens([big], max_gen_len=60, temperature=0.0)
    assert out[0].token_ids
    evicted = keys_before - set(eng.prefix[0].entries)
    assert evicted  # at least one LRU entry was evicted to make room
    held_after = sum(e[0] for e in eng.prefix[0].entries.values())
    assert eng._host_free_pages + held_after == eng.num_pages
    assert int(eng.cache.free_top.sum()) == eng._host_free_pages


def test_rolled_back_admission_never_donates():
    """An admission that rolls back (capacity exhausted) releases slots that
    were NEVER prefilled — their page-table rows are zeros/stale and must
    not be registered as prefix entries (code-review finding: registering
    them spliced page 0 into later requests and double-freed on eviction)."""
    cfg = _cfg()
    params = _params(cfg)
    eng = _engine(cfg, params, num_pages=16, max_reqs=4)
    gen = TextGenerator(eng)
    long_prompt = list(range(40))
    with pytest.raises(RuntimeError):
        # Two 100-token budgets cannot fit a 16-page pool -> rollback.
        gen.generate_tokens([long_prompt, long_prompt[::-1]],
                            max_gen_len=60, temperature=0.0)
    assert eng.prefix[0].entries == {}  # nothing donated from the rollback
    assert eng._host_free_pages == eng.num_pages
    assert not eng._slot_prompt and not eng._slot_prefix
    # The engine still works normally afterwards.
    out = gen.generate_tokens([long_prompt], max_gen_len=4, temperature=0.0)
    assert out[0].token_ids


def test_eviction_never_frees_the_entry_being_acquired():
    """A prefix hit whose entry is also the only evictable LRU entry must
    survive eviction-for-capacity (code-review finding: acquire() after
    evicting the same key raised KeyError / aliased freed pages)."""
    cfg = _cfg()
    params = _params(cfg)
    eng = _engine(cfg, params, num_pages=16, max_reqs=4)
    gen = TextGenerator(eng)
    sys_prompt = list(range(60, 77))  # 2 full pages cached on release
    gen.generate_tokens([sys_prompt], max_gen_len=3, temperature=0.0)
    assert len(eng.prefix[0].entries) == 1
    # Now a request sharing the prefix that needs nearly the whole pool:
    # eviction pressure must not pop the entry we are about to splice.
    out = gen.generate_tokens([sys_prompt + [1, 2, 3]], max_gen_len=80,
                              temperature=0.0)
    assert out[0].token_ids
    assert eng.stats.prefix_hits == 1


def test_prefix_cache_with_dp_groups():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from lite_llama_tpu.parallel.shardings import make_mesh

    cfg = _cfg()
    params = _params(cfg)
    mesh = make_mesh(tp=1, dp=2, devices=jax.devices()[:2])
    eng = InferenceEngine(cfg, params, page_size=8, max_reqs=4, num_pages=48,
                          decode_chunk=4, mesh=mesh, prefix_cache=True)
    gen = TextGenerator(eng)
    ref = _engine(cfg, params, prefix=False)
    p1, p2 = SYS + [7, 8], SYS + [9, 10, 11]
    want = [o.token_ids for o in TextGenerator(ref).generate_tokens(
        [p1, p2], max_gen_len=5, temperature=0.0)]
    gen.generate_tokens([p1], max_gen_len=5, temperature=0.0)
    got2 = gen.generate_tokens([p2], max_gen_len=5, temperature=0.0)
    # Second request must be routed to the group holding the prefix.
    assert eng.stats.prefix_hits == 1
    got1 = gen.generate_tokens([p1], max_gen_len=5, temperature=0.0)
    assert [got1[0].token_ids, got2[0].token_ids] == want
