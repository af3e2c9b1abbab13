"""CLIP ViT vision tower — functional JAX implementation.

Capability parity with the reference's LLaVA vision path: the reference runs
the HF torch CLIP tower as-is (/root/reference/lite_llama/models/llava.py:47,
:77-91 vision_encode — "pure PyTorch, not custom kernels" per SURVEY.md §2.3);
this is a from-scratch JAX tower so the whole multimodal prefill jits on TPU.

Architecture (CLIP-L/14-336 shape, HF CLIPVisionModel semantics):
patch conv (expressed as unfold+matmul, MXU-friendly) + CLS token + learned
position embeddings -> pre-layernorm -> N pre-LN transformer blocks with
bidirectional MHA and quick_gelu MLP. Returns the requested hidden layer
(LLaVA uses the penultimate, vision_feature_layer=-2, llava.py:65-75).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from ..ops.activations import quick_gelu  # noqa: E402 (shared activation lib)


def layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def init_vision_params(vcfg, key, dtype=jnp.float32, scale=0.02) -> dict:
    H = vcfg.hidden_size
    L = vcfg.num_hidden_layers
    I = vcfg.intermediate_size
    C = vcfg.num_channels
    p = vcfg.patch_size
    n_pos = vcfg.num_patches + 1
    ks = jax.random.split(key, 8)

    def init(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "ln1_scale": jnp.ones((L, H), dtype),
        "ln1_bias": jnp.zeros((L, H), dtype),
        "wq": init(ks[0], (L, H, H)),
        "wk": init(ks[1], (L, H, H)),
        "wv": init(ks[2], (L, H, H)),
        "wo": init(ks[3], (L, H, H)),
        "bq": jnp.zeros((L, H), dtype),
        "bk": jnp.zeros((L, H), dtype),
        "bv": jnp.zeros((L, H), dtype),
        "bo": jnp.zeros((L, H), dtype),
        "ln2_scale": jnp.ones((L, H), dtype),
        "ln2_bias": jnp.zeros((L, H), dtype),
        "fc1_w": init(ks[4], (L, H, I)),
        "fc1_b": jnp.zeros((L, I), dtype),
        "fc2_w": init(ks[5], (L, I, H)),
        "fc2_b": jnp.zeros((L, H), dtype),
    }
    return {
        "patch_embed": init(ks[6], (C * p * p, H)),  # unfold-matmul form
        "class_embed": init(ks[7], (H,)),
        "pos_embed": init(jax.random.PRNGKey(7), (n_pos, H)),
        "pre_ln_scale": jnp.ones((H,), dtype),
        "pre_ln_bias": jnp.zeros((H,), dtype),
        "layers": layers,
    }


def _patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] -> [B, n_patches, C*patch*patch] (channel-major per patch,
    matching HF's Conv2d weight layout [out, C, ph, pw])."""
    B, C, H, W = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, ph, pw]
    return x.reshape(B, gh * gw, C * patch * patch)


def vision_forward(
    params: dict,
    vcfg,
    pixel_values: jax.Array,  # [B, C, H, W] fp32
    feature_layer: int = -2,
) -> jax.Array:
    """Returns hidden states [B, 1+num_patches, H] of the selected layer."""
    L = vcfg.num_hidden_layers
    Hn = vcfg.num_attention_heads
    D = vcfg.hidden_size // Hn
    eps = vcfg.layer_norm_eps

    patches = _patchify(
        pixel_values.astype(params["patch_embed"].dtype), vcfg.patch_size
    )
    h = patches @ params["patch_embed"]  # [B, N, H]
    B, N, H = h.shape
    cls = jnp.broadcast_to(params["class_embed"], (B, 1, H))
    h = jnp.concatenate([cls, h], axis=1) + params["pos_embed"]
    h = layer_norm(h, params["pre_ln_scale"], params["pre_ln_bias"], eps)

    # Layer index to stop at (HF semantics: hidden_states[i] is the INPUT of
    # block i; hidden_states[-2] == output of block L-2 == input of block L-1).
    stop = feature_layer % (L + 1)

    def block(x, lp):
        residual = x
        y = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
        q = (y @ lp["wq"] + lp["bq"]).reshape(B, N + 1, Hn, D)
        k = (y @ lp["wk"] + lp["bk"]).reshape(B, N + 1, Hn, D)
        v = (y @ lp["wv"] + lp["bv"]).reshape(B, N + 1, Hn, D)
        logits = jnp.einsum(
            "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / D**0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhst,bthd->bshd", probs, v)
        x = residual + attn.reshape(B, N + 1, H) @ lp["wo"] + lp["bo"]
        residual = x
        y = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
        y = quick_gelu(y @ lp["fc1_w"] + lp["fc1_b"])
        return residual + y @ lp["fc2_w"] + lp["fc2_b"]

    # Unrolled python loop: `stop` is static, so only the needed blocks are
    # traced at all (the common LLaVA case runs L-1 of L blocks).
    lp_list = [
        jax.tree_util.tree_map(lambda a: a[i], params["layers"]) for i in range(L)
    ]
    x = h
    for i in range(L):
        if i < stop:
            x = block(x, lp_list[i])
    return x
