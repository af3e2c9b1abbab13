"""Packed-INT4 weight matmul — Pallas TPU kernel.

Decode is weight-bandwidth-bound, so int4 weights are the single biggest
single-chip lever (half of int8's traffic; the reference's only
quantization artifact is a dead GPTQ skeleton,
/root/reference/lite_llama/kernels/others/fused_linear.py:95, which never
dequantizes). XLA cannot be trusted with the unpack: the measured A/B on
v5e showed the shift+cast chain materializing the unpacked halves in HBM,
leaving int4 SLOWER than int8 end-to-end (9.5 vs 7.2 ms/step). This kernel
streams the PACKED bytes only:

- Weights stay layer-STACKED in HBM (``[Lf, C, O/2]`` int8, two nibbles per
  byte along the output axis); the layer index rides in scalar-prefetch SMEM
  and selects the block row in the BlockSpec index map — no per-layer
  dynamic-slice copy under the decoder's ``lax.scan`` (a pallas operand
  sliced per layer would force XLA to materialize a full-weight copy every
  step, tripling traffic).
- Grid ``(nM, nO, nC)`` with C innermost; fp32 accumulators live in VMEM
  scratch across the C sweep (the standard Pallas matmul accumulation
  pattern), double-buffered operand DMA comes free from the grid pipeline.
- In-VMEM unpack: low nibble = ``(b << 4) >> 4`` (arithmetic), high =
  ``b >> 4`` — two int8 shift ops feeding the MXU as bf16 casts. The two
  nibble halves are the EVEN and ODD output columns; the kernel emits them
  as separate [M, O/2] outputs and the (tiny) interleave to canonical
  column order happens on the activations in XLA — the weight itself is
  never interleaved (a cross-lane nibble shuffle; measured 3.3x slower).
- Scales are PAIRED per byte column (``[Lf, O/2]`` or C-grouped
  ``[Lf, nG, O/2]``, quant/qtensor.py): one scale row multiplies both
  halves' partial dots, applied per C-group inside the accumulation loop —
  grouped scales cost ``nG`` extra [M, BO/2] VPU multiplies, nothing on the
  DMA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(n: int, candidates=(512, 256, 128)) -> int | None:
    for b in candidates:
        if n % b == 0:
            return b
    return None


def qmm_supported(C: int, Oh: int, n_groups: int | None, M: int) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA dual-dot
    path otherwise. M is capped because the kernel streams the full weight
    per M-tile — the win is the skinny (decode / last-position) matmul;
    wide prefill matmuls are compute-bound and fine in XLA."""
    if M > 256:
        return False
    BC = _pick_block(C)
    if BC is None:
        return False
    if n_groups is not None:
        gs = C // n_groups
        if gs == 0 or BC % gs != 0:
            return False
    return Oh % 128 == 0


def _qmm_kernel(
    layer_ref,  # [1] int32 scalar prefetch: flat layer index
    x_ref,  # [BM, BC] VMEM
    w_ref,  # [1, BC, BOh] VMEM (packed bytes)
    s_ref,  # [1, GB, BOh] (grouped) or [1, BOh] (per-pair-channel) f32
    oe_ref,  # [BM, BOh] out: even output columns
    oo_ref,  # [BM, BOh] out: odd output columns
    acc_e,  # [BM, BOh] f32 scratch
    acc_o,
    *,
    nC: int,
    GB: int,  # scale groups per C block (1 when per-channel)
    mat_dtype,
):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        acc_e[...] = jnp.zeros_like(acc_e)
        acc_o[...] = jnp.zeros_like(acc_o)

    # Nibble unpack in int32: Mosaic has no i8 vector shifts (arith.shli on
    # vector<i8> fails to legalize on v5e); the VPU lanes are 32-bit anyway,
    # so the i32 cast is the native form. Sign-extension first makes
    # (b << 28) >> 28 the signed low nibble and b >> 4 the signed high one.
    w32 = w_ref[0].astype(jnp.int32)  # [BC, BOh]
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, jnp.int32(28)), jnp.int32(28)
    ).astype(mat_dtype)
    hi = jax.lax.shift_right_arithmetic(w32, jnp.int32(4)).astype(mat_dtype)
    x = x_ref[...].astype(mat_dtype)  # [BM, BC]
    Gs = x.shape[1] // GB
    for g in range(GB):  # static unroll; GB = BC/group_size (or 1)
        xg = x[:, g * Gs : (g + 1) * Gs]
        sg = (s_ref[0, g] if s_ref.ndim == 3 else s_ref[0])[None, :]
        pe = jax.lax.dot_general(
            xg, lo[g * Gs : (g + 1) * Gs],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        po = jax.lax.dot_general(
            xg, hi[g * Gs : (g + 1) * Gs],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Exact: the scale is constant within the group's contraction slice,
        # so scaling each group's partial sum == scaling the total.
        acc_e[...] += pe * sg
        acc_o[...] += po * sg

    @pl.when(c == nC - 1)
    def _():
        oe_ref[...] = acc_e[...].astype(oe_ref.dtype)
        oo_ref[...] = acc_o[...].astype(oo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def quantized_matmul_packed(
    x: jax.Array,  # [M, C] bf16/f32
    q: jax.Array,  # [Lf, C, Oh] int8 (packed nibble pairs along O)
    scale: jax.Array,  # [Lf, Oh] or [Lf, nG, Oh] f32 (paired scales)
    layer: jax.Array | int,  # flat layer index into Lf
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """Returns [M, 2*Oh] in canonical output-column order (dtype
    ``out_dtype`` or x's — the fp32 accumulators cast once, so fp32 output
    keeps full accumulation precision for logits)."""
    out_dtype = out_dtype or x.dtype
    M, C = x.shape
    Lf, _, Oh = q.shape
    grouped = scale.ndim == 3
    BC = _pick_block(C)
    BOh = _pick_block(Oh, (512, 256, 128))
    if BOh is None:
        BOh = 128  # Oh % 128 == 0 is guaranteed by qmm_supported
    nC, nO = C // BC, Oh // BOh
    GB = (BC * scale.shape[1]) // C if grouped else 1
    mat_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    if grouped:
        s_spec = pl.BlockSpec(
            (1, GB, BOh), lambda m, o, c, l: (l[0], c, o)
        )
    else:
        s_spec = pl.BlockSpec((1, BOh), lambda m, o, c, l: (l[0], o))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nO, nC),  # M <= 256 rides one tile (qmm_supported)
        in_specs=[
            pl.BlockSpec((M, BC), lambda m, o, c, l: (m, c)),
            pl.BlockSpec((1, BC, BOh), lambda m, o, c, l: (l[0], c, o)),
            s_spec,
        ],
        out_specs=[
            pl.BlockSpec((M, BOh), lambda m, o, c, l: (m, o)),
            pl.BlockSpec((M, BOh), lambda m, o, c, l: (m, o)),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, BOh), jnp.float32),
            pltpu.VMEM((M, BOh), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _qmm_kernel, nC=nC, GB=GB, mat_dtype=mat_dtype
    )
    ye, yo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((M, Oh), out_dtype),
            jax.ShapeDtypeStruct((M, Oh), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layer_arr, x, q, scale)
    # Canonical column order: even/odd interleave on the small result.
    return jnp.stack([ye, yo], axis=-1).reshape(M, 2 * Oh)
