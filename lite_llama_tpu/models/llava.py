"""LLaVA-1.5 multimodal model: CLIP tower + projector + Llama LM.

Capability parity with the reference's ``LlavaLlama``
(/root/reference/lite_llama/models/llava.py:33-148) and its merge utilities
(models/utils.py:296 merge_input_ids_with_image_features):

- vision encode: tower hidden layer -2, drop CLS ("default" strategy,
  llava.py:65-75), 2-layer GELU projector (:14-30)
- image-token expansion: each <image> placeholder (id 32000, constants.py:8)
  expands into num_patches patch embeddings via the cumsum position remap
  (models/utils.py:340-378) — already vectorized in the reference and
  expressed here directly in jnp
- prefill-only encode; decode steps are plain LM steps (llava.py:131-139)

TPU-native: everything (tower, projector, merge, LM prefill) is one jitted
function; the expanded sequence length is static (padded bucket), and the
merge is pure gather/scatter arithmetic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .decoder import AttnContext, decoder_prefill, init_decoder_params
from .vision import init_vision_params, vision_forward


def init_llava_params(cfg, key, dtype=None) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = dtype or cfg.dtype
    H_v = cfg.vision_config.hidden_size
    H_t = cfg.hidden_size
    lm = init_decoder_params(cfg, k1)
    vision = init_vision_params(cfg.vision_config, k2, dtype=dtype)

    def init(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    ka, kb = jax.random.split(k3)
    projector = {
        "w1": init(ka, (H_v, H_t)),
        "b1": jnp.zeros((H_t,), dtype),
        "w2": init(kb, (H_t, H_t)),
        "b2": jnp.zeros((H_t,), dtype),
    }
    return {"lm": lm, "vision": vision, "projector": projector}


def encode_images(params: dict, cfg, pixel_values: jax.Array) -> jax.Array:
    """pixel_values [N_img, C, H, W] -> patch embeddings [N_img, P, H_text]
    (reference vision_encode, llava.py:77-91)."""
    hidden = vision_forward(
        params["vision"], cfg.vision_config, pixel_values,
        cfg.vision_feature_layer,
    )
    feats = hidden[:, 1:]  # drop CLS ("default" select strategy)
    pr = params["projector"]
    x = feats @ pr["w1"] + pr["b1"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x @ pr["w2"] + pr["b2"]


def expand_image_tokens_host(
    input_ids, image_token: int, num_patches: int
):
    """Host-side length computation: expanded_len(per row) and the padded
    target length. input_ids: list[list[int]]."""
    out = []
    for row in input_ids:
        n_img = sum(1 for t in row if t == image_token)
        out.append(len(row) + n_img * (num_patches - 1))
    return out


def merge_image_features(
    input_ids: jax.Array,  # int32 [B, S] (padded with pad_id)
    lens: jax.Array,  # int32 [B] — valid tokens in input_ids
    image_features: jax.Array,  # [B, P, H] — one image per request (or zeros)
    has_image: jax.Array,  # bool [B]
    embed_table: jax.Array,  # [V, H]
    image_token: int,
    S_out: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Expand each <image> token into its patch embeddings.

    Returns (inputs_embeds [B, S_out, H], new_lens [B], position_ids [B, S_out]).
    The cumsum position remap is the reference's merge algorithm
    (models/utils.py:340-378) expressed directly.
    """
    B, S = input_ids.shape
    P = image_features.shape[1]
    H = embed_table.shape[1]

    s = jnp.arange(S, dtype=jnp.int32)
    valid = s[None, :] < lens[:, None]
    is_img = (input_ids == image_token) & valid & has_image[:, None]
    # Each image token occupies P positions; text tokens occupy 1.
    sizes = jnp.where(is_img, P, 1) * valid.astype(jnp.int32)
    starts = jnp.cumsum(sizes, axis=1) - sizes  # exclusive cumsum [B, S]
    new_lens = jnp.sum(sizes, axis=1)

    # Scatter text embeddings to their new positions.
    embeds = embed_table[input_ids]  # [B, S, H]
    text_dst = jnp.where(valid & ~is_img, starts, S_out)  # OOB -> drop
    out = jnp.zeros((B, S_out, H), embed_table.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, S))
    out = out.at[bidx, text_dst].set(embeds, mode="drop")

    # Scatter patch embeddings: image i's patch p goes to img_start + p.
    # One image per request (the reference's generator also assumes one
    # image per prompt, llava_generate_stream.py:206).
    img_start = jnp.sum(jnp.where(is_img, starts, 0), axis=1)  # [B]
    pdx = jnp.arange(P, dtype=jnp.int32)
    patch_dst = img_start[:, None] + pdx[None, :]  # [B, P]
    patch_dst = jnp.where(has_image[:, None], patch_dst, S_out)
    bpdx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, P))
    out = out.at[bpdx, patch_dst].set(
        image_features.astype(embed_table.dtype), mode="drop"
    )

    positions = jnp.arange(S_out, dtype=jnp.int32)[None, :].repeat(B, 0)
    return out, new_lens, positions


def llava_prefill(
    params: dict,
    cfg,
    kv_pages: jax.Array,
    ctx: AttnContext,
    input_ids: jax.Array,  # int32 [B, S_expanded] ALREADY expanded? no: raw
    pixel_values: Optional[jax.Array] = None,  # [B, C, H, W]
    has_image: Optional[jax.Array] = None,  # bool [B]
    raw_lens: Optional[jax.Array] = None,  # int32 [B] — pre-expansion lengths
    shard=None,
    chunked: bool = False,
    last_only: bool = False,
    hist_bound=None,
):
    """Multimodal prefill: encode -> merge -> LM prefill with inputs_embeds.

    ``ctx`` must already be allocated for the EXPANDED lengths
    (the reference over-allocates (image_size/patch)^2-1 slots per image,
    model_executor.py:309-316; here the host computes expanded lengths with
    expand_image_tokens_host and allocates exactly).
    """
    from ..parallel.shardings import ShardingPolicy

    shard = shard or ShardingPolicy(mesh=None)
    B, S_out = input_ids.shape
    if pixel_values is not None:
        feats = encode_images(params, cfg, pixel_values)
        if has_image is None:
            has_image = jnp.ones((B,), bool)
        embeds, new_lens, positions = merge_image_features(
            input_ids, raw_lens, feats, has_image,
            params["lm"]["embed"], cfg.image_token_index, S_out,
        )
    else:
        embeds = params["lm"]["embed"][input_ids]
        positions = None
    return decoder_prefill(
        params["lm"], cfg, kv_pages, ctx,
        inputs_embeds=embeds, positions=positions, shard=shard,
        chunked=chunked, last_only=last_only, hist_bound=hist_bound,
    )
