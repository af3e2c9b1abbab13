"""Weight-only quantization: INT8 / FP8 / packed-INT4 tensors with
per-channel or C-grouped scales.

Beyond-reference capability (the reference's quantization is vestigial: a dead
CLI arg at generate.py:50 and an unused int8-KV kernel under kernels/others/ —
SURVEY.md §2.6). Design:

- ``QTensor`` is a pytree (q, scale): ``q`` int8 or float8_e4m3fn stored as
  a 2-D-per-layer matrix ``[*stack, C, O]`` (contraction dims flattened to
  C, output dims to O) with ``scale`` fp32 ``[*stack, O]``. The flattening
  matters on TPU: sub-byte-tiled dtypes pad the second-to-last dim to the
  sublane tile (32 rows for int8/fp8), so a logical ``[H, 2, I]`` gate/up
  weight stored 4-D would physically bloat several-fold in HBM — measured as
  hard OOMs on a 3B model that nominally uses a quarter of the chip. With
  [C, O] storage both trailing dims are large and tiling is free.
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

import functools
from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class QTensor:
    """Quantized weight + per-output-channel (or grouped) scale.

    q: [*stack, C, O] (contraction dims flattened to C, out dims to O);
    scale: fp32 [*stack, O], or [*stack, nG, O] for C-grouped scales
    (group g covers contraction rows [g*C/nG, (g+1)*C/nG)). ``unit_shape``
    (static) is the logical per-layer shape (contract dims + out dims, stack
    axes excluded) used to restore the original view in ``dequant``;
    ``out_shape`` (static) is the logical output-dims tuple qeinsum reshapes
    results to. Slicing the layer axis under ``lax.scan`` keeps the statics
    intact.

    ``packed=True`` (INT4): ``q`` is int8 ``[*stack, C, O//2]`` holding two
    signed nibbles per byte along the OUTPUT axis, produced/consumed with
    ``lax.bitcast_convert_type`` (so nibble order is bitcast-consistent by
    construction). Storage stays int8 because passing s4 arrays as jit args
    trips a TPU-plugin RecursionError (probed, round 2); the s4 view exists
    only INSIDE jitted bodies, where XLA handles it natively. Weight HBM
    traffic is then a QUARTER of bf16 — decode is weight-bandwidth-bound at
    ~86%% SOL (docs/performance_optimization.md), making int4 the biggest
    remaining single-chip lever (VERDICT r2 next #3)."""

    q: jax.Array
    scale: jax.Array
    unit_shape: Tuple[int, ...] = field(
        default=(), metadata=dict(static=True)
    )
    out_shape: Tuple[int, ...] = field(
        default=(), metadata=dict(static=True)
    )
    packed: bool = field(default=False, metadata=dict(static=True))

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def n_stack(self) -> int:
        return self.q.ndim - 2

    @property
    def grouped(self) -> bool:
        return self.scale.ndim == self.n_stack + 2

    def unpack(self) -> jax.Array:
        """The [*stack, C, O] integer-valued weight view (s4 for packed)."""
        if not self.packed:
            return self.q
        q4 = jax.lax.bitcast_convert_type(self.q, jnp.int4)
        return q4.reshape(*q4.shape[:-2], q4.shape[-2] * 2)

    def dequant(self, dtype=jnp.bfloat16) -> jax.Array:
        w = self.unpack().astype(jnp.float32)
        if self.grouped:
            nG = self.scale.shape[-2]
            C, O = w.shape[-2], w.shape[-1]
            wg = w.reshape(*w.shape[:-2], nG, C // nG, O)
            w = (wg * self.scale[..., :, None, :]).reshape(
                *w.shape[:-2], C, O
            )
        else:
            w = w * self.scale[..., None, :]
        return w.reshape(*w.shape[:-2], *self.unit_shape).astype(dtype)


def quantize(
    w: jax.Array, contract_axes, qdtype=jnp.int8,
    group_size: int | None = None,
) -> QTensor:
    """Symmetric per-output-channel quantization over ``contract_axes``.

    ``contract_axes`` must be contiguous, preceded only by stack axes and
    followed only by output axes (true for every decoder weight) — the
    result is stored flattened to [*stack, C, O].

    ``qdtype=jnp.int4`` stores packed nibble pairs in int8 (see QTensor).
    ``group_size`` (must divide C) switches to C-grouped scales
    [*stack, C/group_size, O] — the standard accuracy recovery for int4's
    16-level grid (per-channel int4 over a 3k-deep contraction is lossy)."""
    contract_axes = tuple(
        sorted(
            ax % w.ndim
            for ax in (
                contract_axes
                if isinstance(contract_axes, (tuple, list))
                else (contract_axes,)
            )
        )
    )
    first, last = contract_axes[0], contract_axes[-1]
    assert contract_axes == tuple(range(first, last + 1)), contract_axes
    stack = w.shape[:first]
    C = 1
    for ax in contract_axes:
        C *= w.shape[ax]
    out_shape = w.shape[last + 1 :]
    O = 1
    for d in out_shape:
        O *= d

    w2 = w.reshape(*stack, C, O)
    if jnp.dtype(qdtype) == jnp.dtype(jnp.int4):
        assert O % 2 == 0, f"int4 packing needs an even output width, got {O}"
    if group_size is not None:
        assert C % group_size == 0, (C, group_size)
    # The fp32 math runs JITTED and per-stack-slice: quantizing a stacked 3B
    # gate/up weight eagerly materializes several full fp32 intermediates
    # (~5.7 GB each) whose async OOM surfaces much later at an unrelated
    # sync point — a genuinely nasty failure mode. lax.map keeps the
    # transient at one layer's worth.
    q, scale = _quantize_2d_stacked(
        w2, jnp.dtype(qdtype).name, bool(stack), group_size
    )
    return QTensor(
        q=q,
        scale=scale,
        unit_shape=tuple(w.shape[first:]),
        out_shape=tuple(out_shape),
        packed=jnp.dtype(qdtype) == jnp.dtype(jnp.int4),
    )


@functools.partial(
    jax.jit, static_argnames=("qdtype_name", "stacked", "group_size")
)
def _quantize_2d_stacked(w2, qdtype_name: str, stacked: bool, group_size):
    def one(w):  # [C, O]
        C, O = w.shape
        wf = w.astype(jnp.float32)
        if group_size is not None:
            wf = wf.reshape(C // group_size, group_size, O)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        if qdtype_name == "int8":
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        elif qdtype_name == "int4":
            scale = jnp.maximum(amax, 1e-8) / 7.0
            q4 = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int4)
            # Pack nibble pairs along O via bitcast (unpack is the inverse
            # bitcast, so the byte order round-trips by construction).
            q4 = q4.reshape(C, O)
            q = jax.lax.bitcast_convert_type(
                q4.reshape(C, O // 2, 2), jnp.int8
            )
        else:  # fp8 e4m3: max finite 448
            scale = jnp.maximum(amax, 1e-8) / 448.0
            q = (wf / scale).astype(jnp.float8_e4m3fn)
        if qdtype_name != "int4":
            q = q.reshape(C, O)
        scale = jnp.squeeze(scale, -2)  # [O] or [nG, O]
        return q, scale

    if stacked:
        flat = w2.reshape(-1, *w2.shape[-2:])
        q, scale = jax.lax.map(one, flat)
        return (
            q.reshape(*w2.shape[:-2], *q.shape[-2:]),
            scale.reshape(*w2.shape[:-2], *scale.shape[1:]),
        )
    return one(w2)


def qeinsum(pattern: str, x: jax.Array, w: Any, out_dtype=None) -> jax.Array:
    """einsum that accepts a plain array or a QTensor for ``w``.

    For QTensor the op ignores the pattern string and runs the flattened
    2-D matmul directly: x's trailing dims are collapsed to the stored
    contraction width C, the dot runs on the raw quantized values, the
    per-channel scale multiplies the result (exact: scales are constant
    along the contraction), and the output is reshaped to the weight's
    logical out dims. Requires the einsum's output trailing dims to be
    exactly the weight's out dims (true for every decoder projection).
    """
    if isinstance(w, QTensor):
        dt = out_dtype or x.dtype
        C = w.q.shape[-2]
        k, prod = 0, 1
        while prod != C:
            k += 1
            assert k <= x.ndim, (x.shape, C)
            prod *= x.shape[-k]
        batch = x.shape[: x.ndim - k]
        n_stack = w.n_stack  # e.g. gate_up sliced under scan: [2, H, I]
        xr = x.reshape(*batch, C)
        wq = w.unpack().astype(dt)  # int8/int4-view/fp8 -> matmul dtype
        O = wq.shape[-1]
        if w.grouped:
            # C-grouped scales: per-group dots batched over nG, then the
            # per-(group, channel) scale and a sum over groups. Exact: the
            # scale is constant within each group's contraction slice.
            nG = w.scale.shape[-2]
            Gs = C // nG
            xg = xr.reshape(*batch, nG, Gs)
            wg = wq.reshape(*w.q.shape[:-2], nG, Gs, O)
            bdim = len(batch)
            y = jax.lax.dot_general(
                xg, wg,
                (((bdim + 1,), (n_stack + 1,)), ((bdim,), (n_stack,))),
                preferred_element_type=jnp.float32,
            )  # [nG, *batch, *stack, O]
            sg = jnp.moveaxis(w.scale, -2, 0)  # [nG, *stack, O]
            sg = sg.reshape(nG, *([1] * bdim), *w.q.shape[:-2], O)
            y = jnp.sum(y * sg, axis=0)
        else:
            y = jax.lax.dot_general(
                xr, wq,
                (((len(batch),), (n_stack,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [*batch, *stack, O]
            y = y * w.scale  # scale [*stack, O] broadcasts over batch
        return y.reshape(*batch, *w.q.shape[:-2], *w.out_shape).astype(dt)
    return jnp.einsum(pattern, x, w)


# Decoder-layer weights to quantize, with contraction axes of the stacked
# [L, ...] arrays (models/decoder.py layout).
_LAYER_QUANT_AXES = {
    "wq": (1,),  # [L, H, Nq, D]
    "wkv": (1,),  # [L, H, 2, Nkv, D]
    "wqkv": (1,),  # [L, H, Ntot, D] (engine-fused)
    "o_proj": (1, 2),  # [L, Nq, D, H]
    "gate_up_proj": (2,),  # [L, 2, H, I] (stack (L, 2), contract H)
    "down_proj": (1,),  # [L, I, H]
}


def quantize_decoder_params(
    params: dict, qdtype=jnp.int8, drop_originals: bool = False,
    group_size: int | None = None,
) -> dict:
    """Quantize the projection matrices of a decoder param tree (returns a
    new tree; norms/biases/embed untouched).

    ``drop_originals=True`` MUTATES the input tree, releasing each bf16
    weight as soon as its quantized replacement exists — halving peak HBM
    during on-device quantization of a model that barely fits twice."""
    out = dict(params)
    layers = params["layers"] if drop_originals else dict(params["layers"])
    for key, axes in _LAYER_QUANT_AXES.items():
        if key in layers:
            w = layers.pop(key) if drop_originals else layers[key]
            layers[key] = quantize(w, axes, qdtype, group_size=group_size)
            if drop_originals:
                jax.block_until_ready(layers[key].q)
                del w
    out["layers"] = layers
    if "lm_head" in params:
        w = params.pop("lm_head") if drop_originals else params["lm_head"]
        out["lm_head"] = quantize(w, (0,), qdtype, group_size=group_size)
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
