"""End-to-end multimodal generation through LlavaEngine (tiny random model),
plus prompt-template coverage (reference utils/prompt_templates.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlavaConfig
from lite_llama_tpu.executor.llava_engine import LlavaEngine
from lite_llama_tpu.generation.llava_generate import LlavaTextGenerator
from lite_llama_tpu.models.llava import init_llava_params

IMG_TOK = 120


@pytest.fixture(scope="module")
def engine():
    cfg = LlavaConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
        ),
        text_config=dict(
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        ),
        image_token_index=IMG_TOK,
        max_seq_len=64,
        dtype=jnp.float32,
        eos_token_id=127,
    )
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    return LlavaEngine(cfg, params, page_size=8, max_reqs=4, num_pages=48,
                       decode_chunk=4)


def test_multimodal_stream_generates(engine):
    gen = LlavaTextGenerator(engine)
    px = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
    prompts = [[5, IMG_TOK, 9, 17], [3, IMG_TOK, 4]]
    collected = [[] for _ in prompts]
    for new in gen.stream_tokens_multimodal(prompts, px, max_gen_len=8,
                                            temperature=0.0):
        for i, ids in enumerate(new):
            collected[i].extend(ids)
    assert all(1 <= len(c) <= 8 for c in collected)
    assert all(0 <= t < 128 for c in collected for t in c)
    # slots/pages recycled
    assert len(engine._free_slots) == 4
    assert int(engine.cache.free_top.sum()) == engine.num_pages


def test_text_only_through_llava_engine(engine):
    """Prompts without images run the plain-LM path of the same engine."""
    from lite_llama_tpu.generation.generate import TextGenerator

    gen = TextGenerator(engine)
    out = gen.generate_tokens([[1, 2, 3]], max_gen_len=5, temperature=0.0)
    assert 1 <= len(out[0].token_ids) <= 5


def test_expanded_lens(engine):
    assert engine.expanded_lens([[5, IMG_TOK, 9]]) == [3 + (4 - 1)]  # 4 patches
    assert engine.expanded_lens([[5, 9]]) == [2]


def _mm_tokens(engine, px, prompts):
    gen = LlavaTextGenerator(engine)
    collected = [[] for _ in prompts]
    for new in gen.stream_tokens_multimodal(prompts, px, max_gen_len=8,
                                            temperature=0.0):
        for i, ids in enumerate(new):
            collected[i].extend(ids)
    return collected


def test_llava_tp_mesh_parity(engine):
    """VERDICT r2 next #8: tp=2 mesh multimodal generation must match the
    single-device engine token for token (LM sharded, vision replicated)."""
    from lite_llama_tpu.parallel.shardings import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg = engine.config
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    px = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
    prompts = [[5, IMG_TOK, 9, 17], [3, IMG_TOK, 4]]
    want = _mm_tokens(engine, px, prompts)
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    sharded = LlavaEngine(cfg, params, page_size=8, max_reqs=4,
                          num_pages=48, decode_chunk=4, mesh=mesh)
    # the LM actually shards; the vision tower replicates
    wqkv = sharded.params["lm"]["layers"]["wqkv"]
    assert wqkv.addressable_shards[0].data.shape[2] == wqkv.shape[2] // 2
    got = _mm_tokens(sharded, px, prompts)
    assert got == want


def test_llava_dp_refused():
    """A dp mesh must be refused loudly (the mm prefill has no dp group
    layout — silent request misplacement otherwise)."""
    from lite_llama_tpu.parallel.shardings import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    cfg = LlavaConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
        ),
        text_config=dict(
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        ),
        image_token_index=IMG_TOK, max_seq_len=64, dtype=jnp.float32,
    )
    params = init_llava_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(tp=1, dp=2, devices=jax.devices()[:2])
    with pytest.raises(NotImplementedError, match="data parallelism"):
        LlavaEngine(cfg, params, page_size=8, max_reqs=4, num_pages=48,
                    mesh=mesh)


def test_prompt_templates():
    from lite_llama_tpu.utils.prompts import get_prompter, get_stop_token_ids

    lp = get_prompter("llama")
    p1 = lp.insert_prompt("hi")
    assert "<|start_header_id|>user<|end_header_id|>" in p1
    lp.update_last_reply("hello!")
    p2 = lp.build_prompt("again")
    assert "hello!" in p2 and p2.count("user") >= 2

    qp = get_prompter("qwen2")
    assert "<|im_start|>assistant" in qp.insert_prompt("hi")

    l2 = get_prompter("llama", "/models/Llama-2-7b")
    assert "[INST]" in l2.insert_prompt("hi")

    vp = get_prompter("llava")
    assert "<image>" in vp.insert_prompt("what is this?")

    assert get_stop_token_ids("qwen2") == [151643, 151645]
    assert 128009 in get_stop_token_ids("llama")


def test_tokenizer_image_token():
    from lite_llama_tpu.generation.llava_generate import tokenizer_image_token

    class FakeTok:
        def encode(self, s, add_special_tokens=True):
            ids = [ord(c) % 100 for c in s.strip() if not c.isspace()]
            return ([1] if add_special_tokens else []) + ids

    ids = tokenizer_image_token("ab <image> cd", FakeTok(), 777)
    assert ids.count(777) == 1
    assert ids[0] == 1
