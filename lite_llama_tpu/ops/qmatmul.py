"""Packed-INT4 weight matmul — Pallas TPU kernel (W4A8: int8 MXU dots).

Decode is weight-bandwidth-bound, so int4 weights are the single biggest
single-chip lever (half of int8's traffic; the reference's only
quantization artifact is a dead GPTQ skeleton,
/root/reference/lite_llama/kernels/others/fused_linear.py:95, which never
dequantizes). Two measured dead ends shaped this design:

- XLA cannot be trusted with the unpack: the shift+cast chain materializes
  the unpacked halves in HBM, leaving int4 SLOWER than int8 end-to-end
  (9.5 vs 7.2 ms/step on v5e).
- A Pallas kernel that unpacks nibbles to bf16 in VMEM and runs bf16 dots
  is NOT bandwidth-bound either: with decode-sized M (≈12 rows), the MXU
  ingests each weight tile padded to 128 rows, and TWO bf16 half-dots plus
  the per-byte VPU unpack capped the packed stream at ~250 GB/s (~2 ms for
  the 197 MB lm_head; profiled ~5.5 ms of a 6.9 ms decode step in these
  matmuls).

So the weight bytes must go MXU-direct, never touching the VPU: quantize
the activations to int8 per row (W4A8) and run int8xint8->int32 MXU dots
(native on v5e, 2x bf16 rate) on the RAW packed bytes:

- Encoding (quant/qtensor.py): byte = 16*hi + (lo + 8) with hi, lo in
  [-7, 7] — the low nibble stored with a +8 bias so it is a plain unsigned
  field. Then for activation row x:
      g0 = dot_i8(x, b)         (raw bytes — ZERO weight-side VPU work)
      g1 = dot_i8(x, b & 15)    (one AND per byte, the only VPU touch)
      dot(x, hi) = (g0 - g1) / 16          (exact integer multiple)
      dot(x, lo) = g1 - 8*sum(x)           (bias is constant per C-group)
  The -8*sum(x) correction is per (row, scale-group) and is applied
  IN-KERNEL: the row sums reduce from the already-resident int8 x block
  and subtract from g1 in exact i32/fp32 before the scale multiply
  (round 4 — the earlier out-of-kernel [M, nG] x [nG, Oh]
  HIGHEST-precision dot plus its extra [M, O] fp32 pass cost ~0.3 ms per
  3B decode step). The per-row activation scale also folds into the
  output write.
- Weights stay layer-STACKED in HBM (``[Lf, C, O/2]`` int8); the layer
  index rides in scalar-prefetch SMEM and selects the block row in the
  BlockSpec index map — no per-layer dynamic-slice copy under the
  decoder's ``lax.scan``.
- Grid ``(nM, nO, nC)`` with C innermost; fp32 accumulators live in VMEM
  scratch across the C sweep; double-buffered operand DMA comes free from
  the grid pipeline.
- The two nibble halves are the EVEN and ODD output columns; the kernel
  emits them as separate [M, O/2] outputs and the (tiny) interleave to
  canonical column order happens on the results in XLA — the weight is
  never interleaved (a cross-lane nibble shuffle; measured 3.3x slower).
- Scales are PAIRED per byte column (``[Lf, O/2]`` or C-grouped
  ``[Lf, nG, O/2]``, quant/qtensor.py): one scale row multiplies both
  halves' partial dots (the odd row carrying the deferred /16), applied
  per C-group inside the accumulation loop.

Numerics: this path is W4A8 — activations are per-row symmetrically
quantized to int8 (dynamic, exact-integer kernel after that). The XLA
dual-dot fallback (CPU, tp>1) stays W4A16. Model-level accuracy of the
per-row activation quantization is covered by tests/test_quant.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

# Output-block ceiling for the packed kernel (A/B knob; measured on v5e:
# see docs/performance_optimization.md round-4 anatomy).
_BO_MAX = int(os.environ.get("LITE_LLAMA_TPU_QMM_BO", "512"))


def _pick_block(n: int, candidates=(512, 256, 128)) -> int | None:
    for b in candidates:
        if b <= _BO_MAX and n % b == 0:
            return b
    return None


_BC_MAX = int(os.environ.get("LITE_LLAMA_TPU_QMM_BC", "4096"))
# TIMING-ONLY A/B for the riffle-packed column order idea
# (docs/performance_optimization.md): =1 skips the canonical even/odd
# interleave on EVERY packed matmul output — byte-identical traffic and
# FLOPs to what a riffle-packed weight layout would execute, but the
# output columns come back σ-ordered, so results are WRONG outside
# throughput measurement. Measures the interleave's true end-to-end cost
# without committing to the whole-model hidden-axis re-layout.
_QMM_RIFFLE_AB = os.environ.get("LITE_LLAMA_TPU_QMM_RIFFLE_AB", "0") == "1"
# One concatenated (b | b&15) dot per group instead of two (default ON:
# measured 4.773 vs 4.827 ms/step at the 3B int4+int8KV config — the dots
# are MXU-latency-bound at decode M, so halving the issue count slightly
# beats the extra VPU concat pass; =0 restores the two-dot form).
_QMM_CAT = os.environ.get("LITE_LLAMA_TPU_QMM_CAT", "1") == "1"


def _pick_bc(C: int, n_groups: int | None) -> int | None:
    """Contraction block size. Mosaic requires the scale block's
    second-to-last dim (GB = BC/group_size) to be a multiple of 8 OR the
    whole group axis — grouped scales take the LARGEST multiple of 8*gs
    that divides C under the tile cap (shallow grids with 8*gs-deep blocks
    measured DMA-latency-bound: the 3B wq matmul streamed at ~340 GB/s with
    BC=1024 vs ~2x that with the full-C block — round-4 anatomy), falling
    back to the whole C as one block (always legal)."""
    if n_groups is None or n_groups == 1:
        # Per-channel scales have no GB constraint: prefer bigger C blocks
        # (1-2 MB int8 tiles) — 512-deep blocks measurably understream HBM.
        return _pick_block(C, (4096, 2048, 1024, 512, 256, 128))
    gs = C // n_groups
    if gs == 0 or C % gs != 0:
        return None
    base = 8 * gs
    if C % base == 0:
        best = base
        m = 2
        while m * base <= min(C, _BC_MAX):
            if C % (m * base) == 0:
                best = m * base
            m += 1
        return best
    if C <= 4096:
        return C  # GB == nG: "equal to the full dim" is always legal
    return None


def qmm_tp_supported(
    kind: str, C: int, Oh: int, n_groups: int | None, M: int, tp: int
) -> bool:
    """Whether the manual-tp shard_map wrapper can run the packed kernel:
    per-SHARD shapes must be kernel-legal and the sharded axis must divide.

    kind='out': the byte/output axis Oh is tp-sharded (wqkv / gate_up /
    lm_head — parallel/shardings.py); each shard runs [M, C] x [C, Oh/tp].
    kind='contract': the contraction axis C is tp-sharded (o_proj / down);
    grouped scales need whole groups per shard (tp | nG), and the partial
    outputs psum over 'tp'."""
    nG = n_groups or 1
    if kind == "out":
        return Oh % tp == 0 and qmm_supported(C, Oh // tp, nG, M)
    if kind == "contract":
        if C % tp:
            return False
        if nG > 1 and nG % tp:
            return False
        return qmm_supported(C // tp, Oh, max(1, nG // tp), M)
    return False


def _ctx_mesh(mesh):
    """The mesh the inner shard_map must name: inside an enclosing manual
    region (the engine's manual-dp shard_map) JAX requires the CONTEXT
    abstract mesh; at top level (plain jit) the concrete mesh is correct."""
    am = jax.sharding.get_abstract_mesh()
    return mesh if am.empty else am


def quantized_matmul_packed_tp(
    x: jax.Array,  # [M, C] activations (global view)
    q: jax.Array,  # [Lf, C, Oh] packed bytes, tp-sharded per ``kind``
    scale: jax.Array,  # [Lf, (nG,) Oh] paired scales
    layer: jax.Array | int,
    mesh,
    kind: str,  # 'out' | 'contract'
    out_dtype=None,
    interpret: bool = False,
    interleave: bool = True,
) -> jax.Array:
    """W4A8 packed matmul under TENSOR PARALLELISM: a manual-tp shard_map
    whose body runs the single-chip Pallas kernel on the local weight shard
    (pallas_call is opaque to GSPMD, so tp>1 otherwise falls back to the
    XLA W4A16 dual-dot — VERDICT r3 next #1). kind='out' shards the packed
    byte axis (each shard emits its contiguous slice of the output columns);
    kind='contract' shards the contraction (activations arrive head/ffn-
    sharded, partial results psum over 'tp'). Activation int8 quantization
    happens per shard: for 'contract' each shard fits its own row scale to
    its slice — at worst a tighter fit than the global row scale."""
    from jax.sharding import PartitionSpec as P

    out_dtype = out_dtype or x.dtype
    grouped = scale.ndim == 3
    layer_arr = jnp.asarray(layer, jnp.int32)
    if kind == "out":
        in_specs = (
            P(None, None),
            P(None, None, "tp"),
            P(None, None, "tp") if grouped else P(None, "tp"),
            P(),
        )
        out_specs = P(None, "tp")

        def body(xl, ql, sl, ll):
            return quantized_matmul_packed(
                xl, ql, sl, ll, interpret=interpret, out_dtype=out_dtype,
                interleave=interleave,
            )

    else:
        in_specs = (
            P(None, "tp"),
            P(None, "tp", None),
            P(None, "tp", None) if grouped else P(None, None),
            P(),
        )
        out_specs = P(None, None)

        def body(xl, ql, sl, ll):
            y = quantized_matmul_packed(
                xl, ql, sl, ll, interpret=interpret,
                out_dtype=jnp.float32, interleave=interleave,
            )
            return jax.lax.psum(y, "tp").astype(out_dtype)

    # check_vma=False: pallas_call's out_shape ShapeDtypeStructs carry no
    # varying-mesh-axes annotation, which the vma checker rejects inside a
    # manual region.
    return jax.shard_map(
        body, mesh=_ctx_mesh(mesh), in_specs=in_specs,
        out_specs=out_specs, axis_names={"tp"}, check_vma=False,
    )(x, q, scale, layer_arr)


def qmm_supported(C: int, Oh: int, n_groups: int | None, M: int) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA dual-dot
    path otherwise. M is capped because the kernel streams the full weight
    per M-tile — the win is the skinny (decode / last-position) matmul;
    wide prefill matmuls are compute-bound and fine in XLA."""
    if M > 256:
        return False
    if _pick_bc(C, n_groups) is None:
        return False
    return Oh % 128 == 0


def quantize_activations(x: jax.Array, n_groups: int):
    """Per-row symmetric int8 activation quantization (the A8 in W4A8).

    Returns (x_i8 [M, C], x_scale f32 [M], sumx f32 [M, n_groups]) where
    sumx[m, g] is the integer sum of row m over scale group g — the
    constant needed to undo the +8 low-nibble storage bias."""
    M, C = x.shape
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-30) / 127.0
    xi = jnp.clip(jnp.round(xf / xs[:, None]), -127, 127).astype(jnp.int8)
    sumx = jnp.sum(
        xi.reshape(M, n_groups, C // n_groups).astype(jnp.int32), axis=2
    ).astype(jnp.float32)
    return xi, xs, sumx


def _qmm8_kernel(
    layer_ref,  # [1] int32 scalar prefetch: flat layer index
    x_ref,  # [BM, BC] VMEM int8
    w_ref,  # [1, BC, BO] VMEM int8 (plain signed weights)
    s_ref,  # [1, GB, BO] f32
    o_ref,  # [BM, BO] out
    acc,  # [BM, BO] f32 scratch
    *,
    nC: int,
    GB: int,
):
    """W8A8: one raw int8 MXU dot per group — no nibbles, no bias."""
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wq = w_ref[0]
    x = x_ref[...]
    Gs = x.shape[1] // GB
    for g in range(GB):
        xg = x[:, g * Gs : (g + 1) * Gs]
        sg = s_ref[0, g][None, :]
        gd = jax.lax.dot_general(
            xg, wq[g * Gs : (g + 1) * Gs],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc[...] += gd.astype(jnp.float32) * sg

    @pl.when(c == nC - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def quantized_matmul_int8(
    x: jax.Array,  # [M, C] bf16/f32 activations
    q: jax.Array,  # [Lf, C, O] int8
    scale: jax.Array,  # [Lf, O] or [Lf, nG, O] f32
    layer: jax.Array | int,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """W8A8 layered int8 matmul: per-row int8 activations against the raw
    int8 weight bytes on the MXU. Same layer-stacked scalar-prefetch
    streaming as the int4 kernel.

    NOT routed by default: measured SLOWER than XLA's fused dequantizing
    dot at the 3B decode shapes (1113 vs 1443 tok/s end-to-end at
    gen=1900) — XLA streams the int8 convert into the MXU at ~760 GB/s vs
    this kernel's ~590, and unlike int4 there is no nibble unpack XLA
    mishandles. Kept as the measured A/B and a basis for future large-M
    (prefill) W8A8 where activation-quant amortizes differently."""
    out_dtype = out_dtype or x.dtype
    M, C = x.shape
    Lf, _, O = q.shape
    if scale.ndim == 2:
        scale = scale[:, None, :]
    nG = scale.shape[1]
    if not qmm_supported(C, O, nG, M) or O % 128:
        raise ValueError(
            f"quantized_matmul_int8: unsupported shape C={C}, O={O}, "
            f"nG={nG}, M={M} (needs O%128==0, a legal C block, M<=256) — "
            "use the XLA dequantizing dot instead"
        )
    BC = _pick_bc(C, nG)
    BO = _pick_block(O, (512, 256, 128)) or 128
    nC, nO = C // BC, O // BO
    GB = 1 if nG == 1 else (BC * nG) // C

    xi, xs, _ = quantize_activations(x, nG)

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    if nG == 1:
        s_spec = pl.BlockSpec((1, 1, BO), lambda m, o, c, l: (l[0], 0, o))
    else:
        s_spec = pl.BlockSpec((1, GB, BO), lambda m, o, c, l: (l[0], c, o))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nO, nC),
        in_specs=[
            pl.BlockSpec((M, BC), lambda m, o, c, l: (m, c)),
            pl.BlockSpec((1, BC, BO), lambda m, o, c, l: (l[0], c, o)),
            s_spec,
        ],
        out_specs=[pl.BlockSpec((M, BO), lambda m, o, c, l: (m, o))],
        scratch_shapes=[pltpu.VMEM((M, BO), jnp.float32)],
    )
    (y,) = pl.pallas_call(
        functools.partial(_qmm8_kernel, nC=nC, GB=GB),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((M, O), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layer_arr, xi, q, scale)
    return (y * xs[:, None]).astype(out_dtype)


def _qmm_kernel(
    layer_ref,  # [1] int32 scalar prefetch: flat layer index
    x_ref,  # [BM, BC] VMEM int8
    w_ref,  # [1, BC, BOh] VMEM (packed bytes)
    s_ref,  # [1, GB, BOh] f32 (GB=1 with a constant block: per-channel)
    xs_ref,  # [BM, 1] f32 per-row activation scales
    oe_ref,  # [BM, BOh] out: even output columns (bias-corrected, scaled)
    oo_ref,  # [BM, BOh] out: odd output columns
    acc_e,  # [BM, BOh] f32 scratch
    acc_o,
    *,
    nC: int,
    GB: int,  # scale groups per C block (1 when per-channel)
):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        acc_e[...] = jnp.zeros_like(acc_e)
        acc_o[...] = jnp.zeros_like(acc_o)

    b = w_ref[0]  # [BC, BOh] int8 raw packed bytes
    lo_enc = b & jnp.int8(15)  # biased low nibble, 0..15 (AND is the only
    # i8 vector op Mosaic legalizes on v5e — probed: shifts/adds crash)
    x = x_ref[...]  # [BM, BC] int8
    Gs = x.shape[1] // GB
    BOh = b.shape[1]
    if _QMM_CAT:
        # A/B variant: lane-concatenate (b | lo_enc) once per tile and run
        # ONE [M, gs] x [gs, 2*BOh] dot per group — at decode M the dots
        # are MXU-latency-bound, so halving the issue count may beat the
        # extra VPU concat pass.
        wcat = jnp.concatenate([b, lo_enc], axis=1)  # [BC, 2*BOh]
    for g in range(GB):  # static unroll; GB = BC/group_size (or 1)
        xg = x[:, g * Gs : (g + 1) * Gs]
        sg = s_ref[0, g][None, :]
        if _QMM_CAT:
            gcat = jax.lax.dot_general(
                xg, wcat[g * Gs : (g + 1) * Gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            g0 = gcat[:, :BOh]
            g1 = gcat[:, BOh:]
        else:
            g0 = jax.lax.dot_general(
                xg, b[g * Gs : (g + 1) * Gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            g1 = jax.lax.dot_general(
                xg, lo_enc[g * Gs : (g + 1) * Gs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        # Exact: the scale is constant within the group's contraction
        # slice. The +8 low-nibble storage bias is undone IN-KERNEL as the
        # per-(row, group) constant 8*sum(x_g), with the row sums reduced
        # from the already-resident int8 x block — exact integer math in
        # i32/fp32 (the wrapper's old [M, nG] x [nG, Oh] HIGHEST-precision
        # dot cost ~0.27 ms/step at the 3B config); (g0 - g1) = 16 *
        # dot(x, hi), the /16 rides the odd scale row.
        xsum = jnp.sum(
            xg.astype(jnp.int32), axis=1, keepdims=True
        )  # [BM, 1]
        corr = (g1 - 8 * xsum).astype(jnp.float32)
        acc_e[...] += corr * sg
        acc_o[...] += (g0 - g1).astype(jnp.float32) * (sg * 0.0625)

    @pl.when(c == nC - 1)
    def _():
        # Per-row activation scale folded into the output write (saves one
        # [M, O] fp32 pass per matmul in XLA).
        xs = xs_ref[...]  # [BM, 1]
        oe_ref[...] = (acc_e[...] * xs).astype(oe_ref.dtype)
        oo_ref[...] = (acc_o[...] * xs).astype(oo_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype", "interleave")
)
def quantized_matmul_packed(
    x: jax.Array,  # [M, C] bf16/f32 activations
    q: jax.Array,  # [Lf, C, Oh] int8 (packed nibble pairs along O)
    scale: jax.Array,  # [Lf, Oh] or [Lf, nG, Oh] f32 (paired scales)
    layer: jax.Array | int,  # flat layer index into Lf
    interpret: bool = False,
    out_dtype=None,
    interleave: bool = True,
) -> jax.Array:
    """Returns [M, 2*Oh] in canonical output-column order (dtype
    ``out_dtype`` or x's). W4A8: quantizes x per row to int8, runs the
    exact-integer kernel, applies the -8*sum(x) bias correction and the
    activation scale on the way out (fp32 end to end after the dots).

    ``interleave=False`` returns the halves CONCATENATED (even columns
    then odd — "σ order"): the canonical interleave is a cross-lane
    layout copy XLA materializes (~4.5 us per big FFN matmul), which
    σ-shuffled FFN pipelines skip entirely (quant/qtensor.py sigma_out)."""
    out_dtype = out_dtype or x.dtype
    M, C = x.shape
    Lf, _, Oh = q.shape
    if scale.ndim == 2:  # per-pair-channel -> degenerate single group
        scale = scale[:, None, :]
    nG = scale.shape[1]
    BC = _pick_bc(C, nG)
    BOh = _pick_block(Oh, (512, 256, 128))
    if BOh is None:
        BOh = 128  # Oh % 128 == 0 is guaranteed by qmm_supported
    nC, nO = C // BC, Oh // BOh
    # Scale-block rows per C block: nG==1 means one row serves every C
    # block (per-channel scales are C-independent); otherwise GB = BC/gs,
    # legal by construction (_pick_bc: multiple of 8, or the full axis).
    GB = 1 if nG == 1 else (BC * nG) // C

    xi, xs, _ = quantize_activations(x, nG)  # row sums recomputed in-kernel

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    if nG == 1:
        s_spec = pl.BlockSpec((1, 1, BOh), lambda m, o, c, l: (l[0], 0, o))
    else:
        s_spec = pl.BlockSpec(
            (1, GB, BOh), lambda m, o, c, l: (l[0], c, o)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nO, nC),  # M <= 256 rides one tile (qmm_supported)
        in_specs=[
            pl.BlockSpec((M, BC), lambda m, o, c, l: (m, c)),
            pl.BlockSpec((1, BC, BOh), lambda m, o, c, l: (l[0], c, o)),
            s_spec,
            pl.BlockSpec((M, 1), lambda m, o, c, l: (m, 0)),
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
    kernel = functools.partial(_qmm_kernel, nC=nC, GB=GB)
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
    )(layer_arr, xi, q, scale, xs[:, None])
    # Bias correction and the per-row activation scale happen IN-KERNEL
    # (full-fp32 VPU — the old HIGHEST-precision [M, nG] x [nG, Oh] dot +
    # the extra [M, O] scale pass cost ~0.3 ms/step at 3B). Only the
    # canonical column order remains: even/odd interleave on the small
    # result (or a cheap concat in σ order).
    if interleave and not _QMM_RIFFLE_AB:
        return jnp.stack([ye, yo], axis=-1).reshape(M, 2 * Oh)
    return jnp.concatenate([ye, yo], axis=-1)
