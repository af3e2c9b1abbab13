"""LLaVA multimodal parity vs HF transformers (torch CPU).

Covers the reference's multimodal stack (llava.py:33-148 + models/utils.py:296
merge): CLIP tower, projector, image-token expansion, and LM prefill over the
merged embeddings — against a tiny random HF LlavaForConditionalGeneration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from lite_llama_tpu.config import LlavaConfig
from lite_llama_tpu.executor.kv_cache import alloc_prefill, create_kv_cache
from lite_llama_tpu.models.decoder import AttnContext
from lite_llama_tpu.models.llava import (
    encode_images,
    expand_image_tokens_host,
    llava_prefill,
    merge_image_features,
)
from lite_llama_tpu.utils.weights import convert_hf_llava_state_dict

IMG_TOK = 120


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=32,
    )
    tc = transformers.LlamaConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        rope_theta=10000.0,
    )
    hf_cfg = transformers.LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        image_seq_length=4,
    )
    hf = transformers.LlavaForConditionalGeneration(hf_cfg)
    hf.eval()
    ours_cfg = LlavaConfig(
        vision_config=vc.to_dict(),
        text_config=tc.to_dict(),
        image_token_index=IMG_TOK,
        max_seq_len=64,
        dtype=jnp.float32,
    )
    params = convert_hf_llava_state_dict(hf.state_dict(), ours_cfg)
    return hf, ours_cfg, params


def test_vision_encode_matches_hf(models):
    hf, cfg, params = models
    px = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        hidden = hf.model.vision_tower(
            torch.tensor(px), output_hidden_states=True
        ).hidden_states[-2][:, 1:]
        want = hf.model.multi_modal_projector(hidden).numpy()
    got = np.asarray(encode_images(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llava_prefill_matches_hf(models):
    hf, cfg, params = models
    P = cfg.num_image_patches  # 4
    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    raw = [5, 9, IMG_TOK, 17, 33]  # one <image> placeholder
    hf_ids = [5, 9] + [IMG_TOK] * P + [17, 33]  # HF expects pre-expanded
    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=torch.tensor(px),
        ).logits.numpy()

    exp_lens = expand_image_tokens_host([raw], IMG_TOK, P)
    S_out = 16  # padded bucket
    cache = create_kv_cache(
        cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
        num_pages=16, page_size=4, max_reqs=1, max_seq_len=64,
        dtype=jnp.float32,
    )
    req = jnp.arange(1, dtype=jnp.int32)
    lens = jnp.asarray(exp_lens, jnp.int32)
    cache = alloc_prefill(cache, req, lens)
    ctx = AttnContext(cache.page_table[req], lens,
                      jnp.zeros((1,), jnp.int32), lens)
    ids = np.zeros((1, S_out), np.int32)
    ids[0, : len(raw)] = raw
    logits, _ = llava_prefill(
        params, cfg, cache.kv_pages, ctx,
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(px),
        has_image=jnp.ones((1,), bool),
        raw_lens=jnp.asarray([len(raw)], jnp.int32),
    )
    n = exp_lens[0]
    assert n == len(hf_ids)
    np.testing.assert_allclose(
        np.asarray(logits[0, :n]), hf_logits[0], rtol=2e-3, atol=2e-3
    )


def test_merge_without_image_is_plain_embedding(models):
    _, cfg, params = models
    ids = jnp.asarray([[5, 9, 17, 0, 0]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    feats = jnp.zeros((1, cfg.num_image_patches, cfg.hidden_size), jnp.float32)
    out, new_lens, pos = merge_image_features(
        ids, lens, feats, jnp.zeros((1,), bool),
        params["lm"]["embed"], IMG_TOK, 8,
    )
    assert int(new_lens[0]) == 3
    want = np.asarray(params["lm"]["embed"])[np.asarray(ids[0, :3])]
    np.testing.assert_allclose(np.asarray(out[0, :3]), want)
    assert float(jnp.sum(jnp.abs(out[0, 3:]))) == 0.0


@pytest.mark.quick
def test_vis_images_terminal_render(tmp_path, capsys):
    """Terminal image echo (reference utils/image_process.py:45-73 parity):
    ANSI half-block rendering plus the non-tty fallback label."""
    import os

    from PIL import Image

    from lite_llama_tpu.utils.image import render_image_ansi, vis_images

    p = tmp_path / "img.png"
    Image.new("RGB", (16, 8), (255, 0, 0)).save(p)
    txt = render_image_ansi(str(p), max_width=8)
    assert "\x1b[38;2;" in txt and "▀" in txt
    assert len(txt.splitlines()) >= 1
    vis_images([str(p)])  # non-tty in pytest -> size label path
    out = capsys.readouterr().out
    assert "img.png" in out and ("[image 16x8]" in out or "▀" in out)
