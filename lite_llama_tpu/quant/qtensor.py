"""Weight-only quantization: INT8 / FP8 tensors with per-channel scales.

Beyond-reference capability (the reference's quantization is vestigial: a dead
CLI arg at generate.py:50 and an unused int8-KV kernel under kernels/others/ —
SURVEY.md §2.6). Design:

- ``QTensor`` is a pytree (q, scale): ``q`` int8 or float8_e4m3fn, ``scale``
  fp32 shaped exactly like the weight's OUTPUT dims (contraction axes
  removed), so after ``y = x @ q`` the scale broadcasts onto y's trailing
  dims directly.
- ``quantize_decoder_params`` quantizes the big projection matrices
  (wq/wkv/o_proj/gate_up/down, untied lm_head); norms, biases and the
  embedding stay high-precision (the embedding is a gather; quantizing it
  saves nothing in the matmul path and costs accuracy).
- The matmul keeps the scale OUT of the contraction: for per-output-channel
  scales, x @ (q*s) == (x @ q) * s, so XLA runs the dot on the quantized
  weights (cast fused into the MXU operand load) and applies one cheap
  multiply after. Weight HBM traffic halves (bf16 -> int8), which is the
  decode bottleneck.
- QTensor leaves stack/slice transparently under ``lax.scan`` (both q and
  scale carry the layer axis), so the scanned decoder needs no changes beyond
  routing matmuls through ``qeinsum``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class QTensor:
    """Quantized weight + per-output-channel scale.

    q: [*shape]; scale: fp32 [*out_dims] (q.shape minus contract_axes).
    ``contract_axes`` (static) are the contraction axes of the UNSLICED
    stacked tensor — used only by ``dequant`` on the full tree.
    """

    q: jax.Array
    scale: jax.Array
    contract_axes: Tuple[int, ...] = field(
        default=(0,), metadata=dict(static=True)
    )

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def dequant(self, dtype=jnp.bfloat16) -> jax.Array:
        s = self.scale
        for ax in sorted(self.contract_axes):
            s = jnp.expand_dims(s, ax)
        return (self.q.astype(jnp.float32) * s).astype(dtype)


def quantize(w: jax.Array, contract_axes, qdtype=jnp.int8) -> QTensor:
    """Symmetric per-output-channel quantization over ``contract_axes``."""
    contract_axes = tuple(
        ax % w.ndim for ax in (
            contract_axes if isinstance(contract_axes, (tuple, list))
            else (contract_axes,)
        )
    )
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axes, keepdims=True)
    if qdtype == jnp.int8:
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    else:  # fp8 e4m3: max finite 448
        scale = jnp.maximum(amax, 1e-8) / 448.0
        q = (wf / scale).astype(jnp.float8_e4m3fn)
    return QTensor(
        q=q,
        scale=jnp.squeeze(scale, axis=contract_axes),
        contract_axes=contract_axes,
    )


def qeinsum(pattern: str, x: jax.Array, w: Any, out_dtype=None) -> jax.Array:
    """einsum that accepts a plain array or a QTensor for ``w``.

    For QTensor the dot runs on the raw quantized values and the per-channel
    scale multiplies the result (exact: scales are constant along the
    contraction). Requires the einsum's output trailing dims to be exactly
    the weight's out dims (true for every decoder projection).
    """
    if isinstance(w, QTensor):
        dt = out_dtype or x.dtype
        y = jnp.einsum(
            pattern, x, w.q.astype(dt), preferred_element_type=jnp.float32
        )
        return (y * w.scale).astype(dt)
    return jnp.einsum(pattern, x, w)


# Decoder-layer weights to quantize, with contraction axes of the stacked
# [L, ...] arrays (models/decoder.py layout).
_LAYER_QUANT_AXES = {
    "wq": (1,),  # [L, H, Nq, D]
    "wkv": (1,),  # [L, H, 2, Nkv, D]
    "o_proj": (1, 2),  # [L, Nq, D, H]
    "gate_up_proj": (1,),  # [L, H, 2, I]
    "down_proj": (1,),  # [L, I, H]
}


def quantize_decoder_params(params: dict, qdtype=jnp.int8) -> dict:
    """Quantize the projection matrices of a decoder param tree (returns a
    new tree; norms/biases/embed untouched)."""
    out = dict(params)
    layers = dict(params["layers"])
    for key, axes in _LAYER_QUANT_AXES.items():
        if key in layers:
            layers[key] = quantize(layers[key], axes, qdtype)
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize(params["lm_head"], (0,), qdtype)
    return out


def dequantize_tree(params, dtype=jnp.bfloat16):
    """Replace every QTensor with its dequantized array (for testing)."""

    def walk(node):
        if isinstance(node, QTensor):
            return node.dequant(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
