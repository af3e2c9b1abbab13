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

import dataclasses
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
    (group g covers contraction rows [g*C/nG, (g+1)*C/nG)). Packed int4
    tensors store PAIRED scales — [*stack, O/2] / [*stack, nG, O/2], one
    scale per byte column shared by its two output channels — so q and
    scale slice/shard on the same byte axis and the matmul kernel applies
    one scale row to both nibble halves. ``unit_shape``
    (static) is the logical per-layer shape (contract dims + out dims, stack
    axes excluded) used to restore the original view in ``dequant``;
    ``out_shape`` (static) is the logical output-dims tuple qeinsum reshapes
    results to. Slicing the layer axis under ``lax.scan`` keeps the statics
    intact.

    ``packed=True`` (INT4): ``q`` is int8 ``[*stack, C, O//2]`` holding two
    nibbles per byte along the OUTPUT axis — byte j packs output columns
    (2j, 2j+1) as ``16*hi + (lo + 8)``: hi (col 2j+1) a signed high nibble,
    lo (col 2j) stored with a +8 bias as an unsigned low field. The bias is
    what lets the Pallas W4A8 kernel (ops/qmatmul.py) feed the RAW bytes to
    int8 MXU dots and undo the bias as a per-group constant — zero per-byte
    VPU work on the weight stream. Adjacent-pair order keeps byte-axis
    slicing semantics trivial (a byte slice [a, b) IS the output slice
    [2a, 2b) — what fuse_qkv_params and the tp shardings rely on). The s4
    dtype appears NOWHERE — s4 jit args trip a TPU-plugin RecursionError
    (probed, round 2), and the earlier in-jit ``bitcast_convert_type``+
    nibble-interleave-reshape unpack measured 3.3x slower per scanned layer
    than int8 (the [C, O//2, 2] -> [C, O] reshape is a cross-lane nibble
    shuffle). The XLA fallback path never interleaves the weight either:
    qeinsum runs TWO dots on the decoded nibble halves (even / odd output
    columns) and interleaves the tiny [B, O/2] OUTPUTS instead. Weight HBM
    traffic is then a QUARTER of bf16 — decode is weight-bandwidth-bound
    (docs/performance_optimization.md), making int4 the biggest remaining
    single-chip lever (VERDICT r2 next #3)."""

    q: jax.Array
    scale: jax.Array
    unit_shape: Tuple[int, ...] = field(
        default=(), metadata=dict(static=True)
    )
    out_shape: Tuple[int, ...] = field(
        default=(), metadata=dict(static=True)
    )
    packed: bool = field(default=False, metadata=dict(static=True))
    # σ-shuffled FFN markers (packed int4, tp=1 only — see
    # quantize_decoder_params(sigma_ffn=True)). The packed matmul emits the
    # even/odd output halves separately; interleaving them back to
    # canonical order is a cross-lane layout copy XLA materializes
    # (profiled ~9 us/layer on the two FFN matmuls). Since SwiGLU is
    # elementwise, the FFN inner axis can stay in "σ order" — gate/up
    # outputs CONCATENATED (evens then odds, sigma_out=True) and down_proj
    # quantized with its contraction rows pre-permuted to match
    # (sigma_in=True). The residual-stream order is untouched.
    sigma_out: bool = field(default=False, metadata=dict(static=True))
    sigma_in: bool = field(default=False, metadata=dict(static=True))
    # σ BLOCK count (quantize_decoder_params sigma_tp): the FFN axis is
    # split into ``sigma_groups`` contiguous blocks, each independently in
    # σ order. A contiguous tp shard of the stored axis is then exactly
    # one block — per-shard the manual-tp kernel's natural even/odd-concat
    # output IS the block's σ order, which is what makes σ-FFN compose
    # with tensor parallelism (shardings.py requires sigma_groups == tp).
    # 1 = the single-device layout (whole-axis σ).
    sigma_groups: int = field(default=1, metadata=dict(static=True))
    # RIFFLE-packed column order (quantize(riffle_blocks=N), round 5):
    # byte j of block b packs canonical block columns (j, j + Wb/2) — lo
    # nibble the first half, hi nibble the second — so the packed matmul's
    # natural no-interleave [evens | odds] output IS the canonical column
    # order (per block). This deletes the canonical-order interleave copy
    # from EVERY packed matmul and needs NO consumer-side permutations
    # (measured +8.0% on the int4+int8KV headline: 2188 -> 2363 tok/s,
    # docs/performance_optimization.md round 5). N > 1 blocks make it
    # tp-composable exactly like sigma_groups (one contiguous byte shard =
    # one block whose concat output is its canonical slice). 0 = classic
    # adjacent-pair packing. Scale pairing follows the byte: scale[j]
    # covers canonical cols (j, j + Wb/2). Mutually exclusive with σ.
    riffle_groups: int = field(default=0, metadata=dict(static=True))
    # For fused wqkv tensors: the tensor-parallel degree the SHARD-PERIODIC
    # head order was built for (models/decoder.fuse_qkv_params). The
    # unfuse reshape must use THIS value, not the running mesh's tp — a
    # riffle tree is fused at quantization time (riffle_tp) and may run on
    # a smaller mesh (e.g. single-chip tests of tp-layout weights). 0 =
    # unset (engine-fused at init; the running shard.tp is then correct).
    fused_tp: int = field(default=0, metadata=dict(static=True))
    # Set (to a traced scalar) inside the decoder's layer scan: q/scale stay
    # LAYER-STACKED and ``layer`` indexes axis 0 at use time — the Pallas
    # matmul kernel then block-reads the layer's tiles straight from the
    # stacked HBM array via scalar prefetch instead of forcing a per-layer
    # dynamic-slice copy of the whole weight (ops/qmatmul.py).
    layer: Any = None

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

    def unpack_halves(self):
        """(even, odd) int8 nibble halves ``[*stack, C, O//2]`` — even[j] is
        output column 2j, odd[j] is 2j+1. The byte is ``16*hi + (lo + 8)``
        (low nibble stored with a +8 bias so it is a plain unsigned field —
        what lets the Pallas W4A8 kernel dot the RAW bytes, ops/qmatmul.py);
        no s4, no interleave (the hot qeinsum path consumes the halves
        directly)."""
        b = self.q
        even = (b & jnp.int8(15)) - jnp.int8(8)
        odd = jax.lax.shift_right_arithmetic(b, jnp.int8(4))
        return even, odd

    def unpack(self) -> jax.Array:
        """The [*stack, C, O] integer-valued weight view (int8 values in
        [-7, 7] for packed int4). OFF the hot path (dequant/tests): the
        final stack-reshape interleave is the cross-lane shuffle qeinsum
        exists to avoid."""
        if not self.packed:
            return self.q
        even, odd = self.unpack_halves()
        return jnp.stack([even, odd], axis=-1).reshape(
            *self.q.shape[:-1], self.q.shape[-1] * 2
        )

    def dequant(self, dtype=jnp.bfloat16) -> jax.Array:
        if self.riffle_groups:
            # Riffle order: lo-nibble columns are each block's FIRST half,
            # hi the SECOND — per-block concat (not interleave) restores
            # the stored-axis canonical order, and the paired scale tiles
            # the same way (scale[j] covers cols (j, j + Wb/2)).
            even, odd = self.unpack_halves()
            N = self.riffle_groups
            w = _sigma_concat(even.astype(jnp.float32),
                              odd.astype(jnp.float32), N)
            self = dataclasses.replace(
                self, scale=_sigma_concat(self.scale, self.scale, N)
            )
        else:
            w = self.unpack().astype(jnp.float32)
            self = dataclasses.replace(
                self, scale=jnp.repeat(self.scale, 2, axis=-1)
            ) if self.packed else self  # paired [.., O/2] -> canonical
        if self.grouped:
            nG = self.scale.shape[-2]
            C, O = w.shape[-2], w.shape[-1]
            wg = w.reshape(*w.shape[:-2], nG, C // nG, O)
            w = (wg * self.scale[..., :, None, :]).reshape(
                *w.shape[:-2], C, O
            )
        else:
            w = w * self.scale[..., None, :]
        C = w.shape[-2]
        if self.sigma_in:
            # Undo the σ row pre-permutation (AFTER the scale multiply —
            # grouped scales were fit over the stored row order) so the
            # dequantized weight is canonical: stored row i holds canonical
            # contraction row sigma(i) (quantize_decoder_params), applied
            # independently per σ block (sigma_groups).
            N = self.sigma_groups
            W = C // N
            half = W // 2
            inv_blk = jnp.stack(
                [jnp.arange(half), half + jnp.arange(half)], axis=-1
            ).reshape(-1)
            inv = (
                jnp.arange(N)[:, None] * W + inv_blk[None, :]
            ).reshape(-1)
            w = jnp.take(w, inv, axis=-2)
        O_logical = 1
        for d in self.unit_shape:
            O_logical *= d
        O_logical //= C
        w = w[..., :O_logical]  # drop lane-alignment padding (quantize())
        return w.reshape(*w.shape[:-2], *self.unit_shape).astype(dtype)


def quantize(
    w: jax.Array, contract_axes, qdtype=jnp.int8,
    group_size: int | None = None, riffle_blocks: int = 0,
) -> QTensor:
    """Symmetric per-output-channel quantization over ``contract_axes``.

    ``contract_axes`` must be contiguous, preceded only by stack axes and
    followed only by output axes (true for every decoder weight) — the
    result is stored flattened to [*stack, C, O].

    ``qdtype=jnp.int4`` stores packed nibble pairs in int8 (see QTensor).
    ``group_size`` (must divide C) switches to C-grouped scales
    [*stack, C/group_size, O] — the standard accuracy recovery for int4's
    16-level grid (per-channel int4 over a 3k-deep contraction is lossy).

    ``riffle_blocks=N`` (int4 only) stores the RIFFLE column order: per
    block of the (padded) output axis, byte j packs canonical block
    columns (j, j + Wb/2), so the packed matmul's no-interleave
    [evens | odds] output is already canonical (QTensor.riffle_groups).
    Implemented as a column pre-permutation before the standard pair
    packing — permuted col 2j = block col j, col 2j+1 = block col
    j + Wb/2 — which also pairs the scales correctly. Lane-alignment
    padding composes: pad columns land at the END of the recombined
    canonical axis, so consumers' trailing [:O_logical] slice stays
    valid (unlike σ, which needs per-half slicing)."""
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
    pad_to = 0
    if jnp.dtype(qdtype) == jnp.dtype(jnp.int4):
        assert O % 2 == 0, f"int4 packing needs an even output width, got {O}"
        if O >= 8192 and (O // 2) % 512:
            # Pad wide, oddly-sized output axes (the 128256-wide llama
            # vocab) so the packed width is 512-lane aligned: the Pallas
            # kernel's BOh falls from 512 to 128 otherwise, turning the
            # weight stream into 128-byte strided DMA (lm_head profiled
            # 711 us vs ~150 us at SOL). Consumers slice outputs back to
            # the logical width (storage width != prod(out_shape) marks a
            # padded tensor — no extra field needed).
            pad_to = -(-O // 1024) * 1024
        if riffle_blocks:
            O_p = pad_to or O
            assert O_p % riffle_blocks == 0 and (
                O_p // riffle_blocks
            ) % 2 == 0, (O_p, riffle_blocks)
    else:
        assert not riffle_blocks, "riffle_blocks is int4-packing-only"
    if group_size is not None:
        assert C % group_size == 0, (C, group_size)
    # The fp32 math runs JITTED and per-stack-slice: quantizing a stacked 3B
    # gate/up weight eagerly materializes several full fp32 intermediates
    # (~5.7 GB each) whose async OOM surfaces much later at an unrelated
    # sync point — a genuinely nasty failure mode. lax.map keeps the
    # transient at one layer's worth. The lane-alignment pad and the riffle
    # column pre-permutation run INSIDE the per-slice map for the same
    # reason: eager whole-stack pad/take copies of a 2.8 GB gate_up stack
    # (round 5) pushed the quantization-time peak past HBM
    # nondeterministically, surfacing as ResourceExhausted at much later
    # sync points.
    q, scale = _quantize_2d_stacked(
        w2, jnp.dtype(qdtype).name, bool(stack), group_size,
        pad_to=pad_to, riffle_blocks=int(riffle_blocks),
    )
    return QTensor(
        q=q,
        scale=scale,
        unit_shape=tuple(w.shape[first:]),
        out_shape=tuple(out_shape),
        packed=jnp.dtype(qdtype) == jnp.dtype(jnp.int4),
        riffle_groups=int(riffle_blocks),
    )


@functools.partial(
    jax.jit,
    static_argnames=("qdtype_name", "stacked", "group_size", "pad_to",
                     "riffle_blocks"),
)
def _quantize_2d_stacked(w2, qdtype_name: str, stacked: bool, group_size,
                         pad_to: int = 0, riffle_blocks: int = 0):
    import numpy as _np

    def one(w):  # [C, O]
        if pad_to and pad_to > w.shape[-1]:
            w = jnp.pad(w, [(0, 0)] * (w.ndim - 1)
                        + [(0, pad_to - w.shape[-1])])
        if riffle_blocks:
            # Riffle column pre-permutation (AFTER padding, so the perm is
            # over the stored axis): permuted col 2j = block col j,
            # permuted col 2j+1 = block col j + Wb/2. Standard pair
            # packing of the permuted matrix then yields the riffle bytes
            # AND the correctly-paired scales. Static numpy indices; the
            # take runs per slice in the INPUT dtype (one layer's worth of
            # transient, not a whole-stack copy).
            N = riffle_blocks
            O_p = w.shape[-1]
            Wb = O_p // N
            half = Wb // 2
            idx_blk = _np.stack(
                [_np.arange(half), half + _np.arange(half)], axis=-1
            ).reshape(-1)
            perm = (
                _np.arange(N)[:, None] * Wb + idx_blk[None, :]
            ).reshape(-1)
            w = jnp.take(w, perm, axis=-1)
        C, O = w.shape
        wf = w.astype(jnp.float32)
        if group_size is not None:
            wf = wf.reshape(C // group_size, group_size, O)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        if qdtype_name == "int8":
            scale = jnp.maximum(amax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        elif qdtype_name == "int4":
            # PAIRED output-channel scales: columns (2j, 2j+1) — one packed
            # byte — share one scale, so the stored scale is [.., O/2] and
            # every downstream byte-axis slice/shard applies identically to
            # q and scale (and the matmul kernel multiplies both nibble
            # halves by the same [.., O/2] row — no even/odd scale split
            # anywhere). Accuracy cost is one amax over channel pairs.
            amax2 = jnp.max(
                amax.reshape(*amax.shape[:-1], O // 2, 2), axis=-1
            )  # [.., 1, O/2]: pair-reduce the contraction-reduced amax
            scale = jnp.maximum(amax2, 1e-8) / 7.0
            sfull = jnp.repeat(scale, 2, axis=-1)
            q4 = jnp.clip(jnp.round(wf / sfull), -7, 7).astype(jnp.int8)
            # Pack adjacent output pairs: byte j = 16*(col 2j+1) + (col 2j
            # + 8) — the low nibble carries a +8 bias so it is an unsigned
            # field, which lets the W4A8 kernel (ops/qmatmul.py) run int8
            # MXU dots on the raw bytes and undo the bias as a constant.
            q4 = q4.reshape(C, O // 2, 2)
            q = ((q4[..., 1] << 4) | (q4[..., 0] + 8)).astype(jnp.int8)
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


def _interleave_last(a: jax.Array, b: jax.Array) -> jax.Array:
    """[..., O/2] even/odd column pairs -> [..., O] canonical order."""
    return jnp.stack([a, b], axis=-1).reshape(*a.shape[:-1], 2 * a.shape[-1])


def _sigma_concat(even: jax.Array, odd: jax.Array, groups: int) -> jax.Array:
    """[..., h] even/odd halves -> [..., 2h] in per-BLOCK σ order: block b
    of the output is [evens_b | odds_b] (groups=1: the whole-axis σ order
    [evens | odds]). Pure reshapes for groups=1; a block re-concat
    otherwise — matching the layout the manual-tp kernel emits per shard
    and the row order σ-tp down_proj was quantized for."""
    h = even.shape[-1]
    if groups == 1:
        return jnp.concatenate([even, odd], axis=-1)
    hb = h // groups
    e = even.reshape(*even.shape[:-1], groups, hb)
    o = odd.reshape(*odd.shape[:-1], groups, hb)
    return jnp.concatenate([e, o], axis=-1).reshape(
        *even.shape[:-1], 2 * h
    )


def _qeinsum_layered(
    pattern: str, x: jax.Array, w: QTensor, out_dtype, allow_kernel: bool,
    shard=None, tp_kind=None,
) -> jax.Array:
    """A layer-stacked QTensor used at ``w.layer``. On TPU, packed int4
    weights with kernel-supported shapes ride the Pallas streaming matmul
    (ops/qmatmul.py) against the STACKED storage — single-chip directly,
    or per shard through a manual-tp shard_map when ``shard.tp > 1`` and
    ``tp_kind`` names the weight's tp layout ('out' | 'contract'); every
    other case slices the layer (identical to what lax.scan's xs-slicing
    used to do) and falls through to the XLA path."""
    from .. import ops as _ops
    from ..ops import qmatmul as _qmm

    dt = out_dtype or x.dtype
    C, Os = w.q.shape[-2], w.q.shape[-1]
    rest = w.q.shape[1:-2]  # stack dims after the layer axis (e.g. (2,))
    n_rest = 1
    for d in rest:
        n_rest *= d
    xr = x.reshape(-1, C)
    M = xr.shape[0]
    nG = w.scale.shape[-2] if w.grouped else None
    tp = 1 if shard is None else shard.tp
    use_tp_kernel = (
        tp > 1
        and tp_kind is not None
        and getattr(shard, "tp_kernel", True)
        and w.packed
        # σ tensors ride the tp kernel when their block count matches the
        # mesh: one tp shard = one σ block, and the per-shard kernel's
        # even/odd-concat output IS the block's σ order (sigma_groups).
        and (
            not (w.sigma_out or w.sigma_in) or w.sigma_groups == tp
        )
        # Riffle tensors compose per kind: 'out' shards the byte axis, so
        # one tp shard must be one riffle block (groups == tp); 'contract'
        # keeps the output axis whole on every shard, so the layout must
        # be the single whole-axis block (groups == 1) whose per-shard
        # [evens | odds] concat is already canonical.
        and (
            not w.riffle_groups
            or w.riffle_groups == (tp if tp_kind == "out" else 1)
        )
        and _ops._use_pallas()
        and _qmm.qmm_tp_supported(tp_kind, C, Os, nG, M, tp)
    )
    if use_tp_kernel or (
        allow_kernel
        and tp == 1
        and w.packed
        and _ops._use_pallas()
        and _qmm.qmm_supported(C, Os, nG, M)
    ):
        # Packed int4 ONLY: XLA materializes the nibble unpack in HBM, so
        # the kernel is the only bandwidth-true path. Plain int8 measured
        # FASTER through XLA's fused dequantizing dot (1443 vs 1113 tok/s
        # at the 3B gen=1900 row) — its convert feeds the MXU at ~760 GB/s
        # vs this kernel's ~590; quantized_matmul_int8 is kept as the
        # measured A/B (and a basis for large-M W8A8), not routed.
        qf = w.q.reshape(-1, C, Os)
        sf = w.scale.reshape(-1, *w.scale.shape[1 + len(rest):])
        O_logical = 1
        for d in w.out_shape:
            O_logical *= d

        def _unpad(y):
            # Drop lane-alignment padding (quantize()). σ order stores
            # [evens(Os) | odds(Os)]: each half must be sliced to its own
            # real width (a flat [:O_logical] slice would keep the evens'
            # zero-pad tail and drop real odd columns).
            if w.sigma_out and 2 * Os != O_logical:
                h = O_logical // 2
                return jnp.concatenate([y[:, :h], y[:, Os : Os + h]], -1)
            return y[:, :O_logical]

        interpret = jax.default_backend() != "tpu"
        interleave = not (w.sigma_out or w.riffle_groups)
        if use_tp_kernel:
            # σ: per-shard concat = the shard's σ block. Riffle
            # (riffle_groups == tp enforced above): per-shard concat = the
            # shard's CANONICAL block, so the gathered output is canonical.
            outs = [
                _unpad(
                    _qmm.quantized_matmul_packed_tp(
                        xr, qf, sf, w.layer * n_rest + j, shard.mesh,
                        tp_kind, out_dtype=dt, interpret=interpret,
                        interleave=interleave,
                    )
                )
                for j in range(n_rest)
            ]
        else:
            outs = [
                _qmm.quantized_matmul_packed(
                    xr, qf, sf, w.layer * n_rest + j, out_dtype=dt,
                    interleave=interleave, interpret=interpret,
                )
                for j in range(n_rest)
            ]
            if w.sigma_out and w.sigma_groups > 1:
                # Single-chip run of σ-tp-quantized weights (testing /
                # degraded meshes): the kernel emitted the WHOLE-axis
                # [evens | odds]; re-concat into per-block σ order. (On
                # the matching tp mesh the per-shard outputs are already
                # block-ordered and this branch never runs.)
                outs = [
                    _sigma_concat(
                        y[..., : y.shape[-1] // 2],
                        y[..., y.shape[-1] // 2:],
                        w.sigma_groups,
                    )
                    for y in outs
                ]
            elif w.riffle_groups > 1:
                # Single-chip run of riffle-tp weights: whole-axis
                # [evens | odds] -> per-block canonical concat (pad still
                # lands at the end, _unpad's trailing slice stays valid).
                outs = [
                    _sigma_concat(
                        y[..., : y.shape[-1] // 2],
                        y[..., y.shape[-1] // 2:],
                        w.riffle_groups,
                    )
                    for y in outs
                ]
            outs = [_unpad(y) for y in outs]
        y = outs[0] if not rest else jnp.stack(outs, axis=1)
        batch = x.shape[: x.ndim - _contract_ndims(x, C)]
        return y.reshape(*batch, *rest, *w.out_shape).astype(dt)
    sliced = QTensor(
        q=jax.lax.dynamic_index_in_dim(w.q, w.layer, 0, keepdims=False),
        scale=jax.lax.dynamic_index_in_dim(
            w.scale, w.layer, 0, keepdims=False
        ),
        unit_shape=w.unit_shape,
        out_shape=w.out_shape,
        packed=w.packed,
        sigma_out=w.sigma_out,
        sigma_in=w.sigma_in,
        sigma_groups=w.sigma_groups,
        riffle_groups=w.riffle_groups,
        fused_tp=w.fused_tp,
    )
    return qeinsum(pattern, x, sliced, out_dtype)


def _contract_ndims(x: jax.Array, C: int) -> int:
    """How many trailing dims of x flatten to the contraction width C."""
    k, prod = 0, 1
    while prod != C:
        k += 1
        assert k <= x.ndim, (x.shape, C)
        prod *= x.shape[-k]
    return k


def qeinsum(
    pattern: str, x: jax.Array, w: Any, out_dtype=None,
    allow_kernel: bool = True, shard=None, tp_kind=None,
) -> jax.Array:
    """einsum that accepts a plain array or a QTensor for ``w``.

    For QTensor the op ignores the pattern string and runs the flattened
    2-D matmul directly: x's trailing dims are collapsed to the stored
    contraction width C, the dot runs on the raw quantized values, the
    per-channel scale multiplies the result (exact: scales are constant
    along the contraction), and the output is reshaped to the weight's
    logical out dims. Requires the einsum's output trailing dims to be
    exactly the weight's out dims (true for every decoder projection).

    ``allow_kernel=False`` keeps layer-indexed packed weights off the
    Pallas kernel. Under tensor parallelism a bare pallas_call is opaque
    to GSPMD, so kernel routing needs ``shard`` (the ShardingPolicy, for
    the mesh) and ``tp_kind`` ('out': output/byte axis tp-sharded;
    'contract': contraction axis tp-sharded) — qeinsum then runs the
    kernel per shard inside a manual-tp shard_map
    (ops/qmatmul.quantized_matmul_packed_tp). Without them, tp>1 falls
    back to the XLA dual-dot path, which partitions like any dot.
    """
    if isinstance(w, QTensor) and w.layer is not None:
        return _qeinsum_layered(
            pattern, x, w, out_dtype, allow_kernel, shard, tp_kind
        )
    if isinstance(w, QTensor):
        dt = out_dtype or x.dtype
        C = w.q.shape[-2]
        batch = x.shape[: x.ndim - _contract_ndims(x, C)]
        n_stack = w.n_stack  # e.g. gate_up sliced under scan: [2, H, I]
        xr = x.reshape(*batch, C)
        # Packed int4: TWO dots on the shifted nibble halves (even / odd
        # output columns), interleaving only the small RESULTS — the weight
        # itself is never interleaved (a cross-lane nibble shuffle that
        # measured 3.3x slower per scanned layer than int8).
        halves = w.unpack_halves() if w.packed else (w.q,)
        Os = w.q.shape[-1]  # stored width: O (plain) or O/2 (packed bytes)
        M_rows = 1
        for d in batch:
            M_rows *= d
        if w.grouped and M_rows >= 512:
            # Wide batches (prefill): dequantize each half ONCE ([C, Os]
            # row-wise scale) and run a plain dot. The group-batched
            # formulation below materializes a [nG, M, Os] fp32
            # intermediate — at an 8k-prompt chunk that is ~3 GB per
            # projection and profiled as HALF the whole prefill (int4
            # prefill ran 4.8x slower than bf16 until this split).
            nG = w.scale.shape[-2]
            Gs = C // nG
            ys = [
                jax.lax.dot_general(
                    xr,
                    (
                        h.reshape(*w.q.shape[:-2], nG, Gs, Os).astype(
                            jnp.float32
                        )
                        * w.scale[..., :, None, :]
                    ).astype(dt).reshape(*w.q.shape[:-2], C, Os),
                    (((len(batch),), (n_stack,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in halves
            ]
        elif w.grouped:
            # C-grouped scales: per-group dots batched over nG, then the
            # per-(group, channel) scale and a sum over groups. Exact: the
            # scale is constant within each group's contraction slice.
            # Packed scales are PAIRED ([*stack, nG, O/2], one per byte
            # column), so each nibble half is scaled by the SAME rows and
            # the halves interleave after the group sum. (Small-M only —
            # decode-shaped fallbacks; see the M_rows >= 512 branch.)
            nG = w.scale.shape[-2]
            Gs = C // nG
            xg = xr.reshape(*batch, nG, Gs)
            bdim = len(batch)
            sg = jnp.moveaxis(w.scale, -2, 0)  # [nG, *stack, Os]
            sg = sg.reshape(nG, *([1] * bdim), *w.q.shape[:-2], Os)
            ys = [
                jnp.sum(
                    jax.lax.dot_general(
                        xg,
                        h.astype(dt).reshape(*w.q.shape[:-2], nG, Gs, -1),
                        (((bdim + 1,), (n_stack + 1,)), ((bdim,), (n_stack,))),
                        preferred_element_type=jnp.float32,
                    )  # [nG, *batch, *stack, Os]
                    * sg,
                    axis=0,
                )
                for h in halves
            ]
        else:
            ys = [
                jax.lax.dot_general(
                    xr, h.astype(dt),
                    (((len(batch),), (n_stack,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [*batch, *stack, Os]
                * w.scale  # [*stack, Os] broadcasts over batch
                for h in halves
            ]
        O_logical = 1
        for d in w.out_shape:
            O_logical *= d
        if len(ys) == 1:
            y = ys[0][..., :O_logical]
        elif w.sigma_out:  # σ order: evens then odds, no interleave copy
            # (per σ BLOCK when sigma_groups > 1 — the tp-composable form).
            # Slice pad off EACH half (a flat slice of the concat would
            # keep the evens' zero-pad tail and drop real odd columns).
            h = O_logical // 2
            y = _sigma_concat(
                ys[0][..., :h], ys[1][..., :h], w.sigma_groups
            )
        elif w.riffle_groups:
            # Riffle order: per-block concat of the halves IS canonical,
            # with any lane-alignment pad at the very end.
            y = _sigma_concat(ys[0], ys[1], w.riffle_groups)[
                ..., :O_logical
            ]
        else:
            y = _interleave_last(*ys)[..., :O_logical]
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
    group_size: int | None = None, sigma_ffn: bool = False,
    sigma_tp: int = 1, riffle: bool = False, riffle_tp: int = 1,
) -> dict:
    """Quantize the projection matrices of a decoder param tree (returns a
    new tree; norms/biases/embed untouched).

    ``drop_originals=True`` MUTATES the input tree, releasing each bf16
    weight as soon as its quantized replacement exists — halving peak HBM
    during on-device quantization of a model that barely fits twice.

    ``sigma_ffn=True`` (packed int4) keeps the FFN inner axis in "σ
    order": gate/up outputs come back as the packed matmul's natural
    even/odd column halves concatenated (no interleave copy) and
    down_proj is quantized with its contraction rows pre-permuted to
    match. SwiGLU is elementwise, so the math is identical; the
    residual-stream order is untouched.

    ``sigma_tp=N`` makes the σ layout TENSOR-PARALLEL-composable: the FFN
    axis splits into N contiguous blocks — block b holds [gate_b | up_b]
    with σ applied WITHIN the block — so a contiguous tp shard of the
    stored axis is exactly one block, and each shard's manual-tp kernel
    output is already in its block's σ order (no cross-shard interleave).
    Quantize with sigma_tp == the serving mesh's tp (the sharding layer
    enforces the match); sigma_tp=1 is the single-device layout.

    ``riffle=True`` (packed int4; round 5 — supersedes σ-FFN and measured
    +8.0% on the int4+int8KV headline) stores EVERY packed weight in the
    riffle column order (quantize(riffle_blocks=N)): the kernel's natural
    no-interleave output is already canonical, so the even/odd interleave
    copy disappears from every matmul of the step — wqkv, o_proj, gate_up,
    down AND lm_head — with no consumer-side permutations at all. gate_up
    additionally flattens to one [L, H, 2I] matmul (one launch per layer,
    the same launch saving σ had), laid out per riffle block as
    [gate_b | up_b] so SwiGLU splits each block's halves elementwise.
    ``riffle_tp=N`` makes it tensor-parallel composable the same way
    sigma_tp does (one contiguous byte shard = one block; the sharding
    layer enforces riffle_groups == tp). Mutually exclusive with
    sigma_ffn."""
    sigma = sigma_ffn and jnp.dtype(qdtype) == jnp.dtype(jnp.int4)
    riff = riffle and jnp.dtype(qdtype) == jnp.dtype(jnp.int4)
    assert not (sigma and riff), (
        "sigma_ffn and riffle are mutually exclusive packing layouts"
    )
    N = max(int(sigma_tp), 1)
    Nr = max(int(riffle_tp), 1) if riff else 0
    if riff and "wq" in params.get("layers", {}):
        # Riffled bytes have no contiguous-canonical-slice semantics, so a
        # POST-quantization byte-concat fusion (models/decoder.py
        # fuse_qkv_params on QTensors) cannot apply — fuse the bf16
        # weights FIRST (shard-periodic for riffle_tp, matching the tp
        # byte shards) and riffle-quantize the fused wqkv. Note: this
        # builds the fused copy before quantization, so drop_originals
        # peak memory is one fused-qkv bf16 tensor higher.
        from ..models.decoder import fuse_qkv_params

        fused = fuse_qkv_params(params, tp=Nr)
        if drop_originals:
            # Preserve drop_originals' memory contract: fuse_qkv_params
            # returns a NEW layers dict, so popping from it would leave the
            # caller's tree holding every bf16 weight (the whole point of
            # drop_originals is freeing each one as its quantized
            # replacement lands — without this, quantizing a 3B tree peaked
            # at full-bf16 + quantized and OOMed the chip). Rewrite the
            # CALLER's layers dict in place so the unfused wq/wkv free now
            # and later pops release the only remaining references.
            orig_layers = params["layers"]
            orig_layers.clear()
            orig_layers.update(fused["layers"])
            params = dict(fused)
            params["layers"] = orig_layers
        else:
            params = fused
        _mark_fused_tp = Nr  # the unfuse reshape needs THIS tp, not the
        # running mesh's (models/decoder._project_qkv)
    else:
        _mark_fused_tp = 0
    out = dict(params)
    layers = params["layers"] if drop_originals else dict(params["layers"])
    for key, axes in _LAYER_QUANT_AXES.items():
        if key in layers:
            w = layers.pop(key) if drop_originals else layers[key]
            if sigma and key == "down_proj":
                # Stored row i <- canonical row sigma(i): per σ block,
                # evens then odds — matching the σ-ordered gate/up output
                # this row consumes (block = one tp shard's slice).
                I = w.shape[1]
                W = I // N
                assert I % N == 0 and W % 2 == 0, (I, N)
                blk = jnp.concatenate(
                    [jnp.arange(0, W, 2), jnp.arange(1, W, 2)]
                )
                perm = (
                    jnp.arange(N)[:, None] * W + blk[None, :]
                ).reshape(-1)
                w = jnp.take(w, perm, axis=1)
            if riff and key == "gate_up_proj":
                # Riffle also flattens gate/up into ONE [L, H, 2I] matmul
                # (same launch saving as σ), laid out per riffle block b
                # as [gate_b | up_b] — the riffle-packed kernel output is
                # then each block's canonical halves, SwiGLU splits them
                # elementwise, and the products land in CANONICAL I order
                # (down_proj needs no row permutation, unlike σ).
                L_, _, H_, I_ = w.shape
                assert I_ % Nr == 0 and (I_ // Nr) % 2 == 0, (I_, Nr)
                w = jnp.transpose(
                    w.reshape(L_, 2, H_, Nr, I_ // Nr), (0, 2, 3, 1, 4)
                ).reshape(L_, H_, 2 * I_)
                axes = (1,)
            if sigma and key == "gate_up_proj":
                # σ-FFN also FLATTENS gate/up into ONE [L, H, 2I] matmul
                # (output cols [gate_b | up_b] per σ block b): the packed
                # kernel then launches once per layer instead of once per
                # (L, 2) stack slice — each pallas launch costs ~3.3 us
                # fixed on this platform (round-4 anatomy), so halving
                # FFN-up launches is a real decode win. The σ
                # (no-interleave) output is [ge | ue | go | uo] quarters
                # per block; _mlp swiglus the even and odd quarters
                # independently per block, which lands the products in
                # exactly the σ row order down_proj was quantized for.
                L_, _, H_, I_ = w.shape
                assert I_ % N == 0 and (I_ // N) % 2 == 0, (I_, N)
                w = jnp.transpose(
                    w.reshape(L_, 2, H_, N, I_ // N), (0, 2, 3, 1, 4)
                ).reshape(L_, H_, 2 * I_)
                axes = (1,)
            # Riffle block count per weight: tp-SHARDED output axes (wqkv /
            # gate_up — 'out' kind) need one block per shard; 'contract'
            # weights (o_proj / down) keep their output axis replicated, so
            # ONE whole-axis block is both correct for any tp and the form
            # whose per-shard [evens | odds] concat is already canonical.
            nr_key = 0 if not riff else (
                Nr if key in ("wq", "wkv", "wqkv", "gate_up_proj") else 1
            )
            layers[key] = quantize(w, axes, qdtype, group_size=group_size,
                                   riffle_blocks=nr_key)
            if key == "wqkv" and _mark_fused_tp:
                layers[key] = dataclasses.replace(
                    layers[key], fused_tp=_mark_fused_tp
                )
            if riff and key == "gate_up_proj":
                # The per-block SwiGLU split assumes an unpadded stored
                # axis (true for every real FFN width — 2I is 512-aligned).
                assert 2 * layers[key].q.shape[-1] == w.shape[-1], (
                    "riffle gate_up hit quantize()'s lane-alignment "
                    "padding — unsupported"
                )
            if sigma and key in ("gate_up_proj", "down_proj"):
                if key == "gate_up_proj":
                    # σ's block math assumes an unpadded stored axis (the
                    # per-half pad slicing cannot see block boundaries).
                    assert 2 * layers[key].q.shape[-1] == w.shape[-1], (
                        "σ-FFN gate_up hit quantize()'s lane-alignment "
                        "padding — unsupported with sigma_ffn"
                    )
                layers[key] = dataclasses.replace(
                    layers[key],
                    sigma_groups=N,
                    **{"sigma_out" if key == "gate_up_proj" else "sigma_in":
                       True},
                )
            if drop_originals:
                jax.block_until_ready(layers[key].q)
                del w
    out["layers"] = layers
    if "lm_head" in params:
        w = params.pop("lm_head") if drop_originals else params["lm_head"]
        out["lm_head"] = quantize(w, (0,), qdtype, group_size=group_size,
                                  riffle_blocks=Nr)
        if drop_originals:
            # Drain before returning (like the per-layer syncs above): the
            # lm_head quantize's fp32 transients otherwise pipeline into
            # whatever the caller dispatches next (engine build).
            jax.block_until_ready(out["lm_head"].q)
            del w
    elif "embed" in params and not (
        jnp.dtype(qdtype) == jnp.dtype(jnp.int4)
        and params["embed"].shape[0] % 2
    ):
        # Tied embeddings (llama-3.2): materialize a QUANTIZED head from the
        # embedding table. Without this, every decode step's unembed reads
        # the full bf16 table (788 MB for 3B — profiled at ~1.04 ms/step,
        # a quarter of the whole step); the packed head reads 98 MB through
        # the W4A8 kernel instead. The bf16 table stays for input gathers
        # (gathers touch B rows, not the matrix). Odd-vocab int4 (unpaddable
        # packing) keeps the dense tied unembed.
        out["lm_head"] = quantize(
            jnp.transpose(params["embed"]), (0,), qdtype,
            group_size=group_size, riffle_blocks=Nr,
        )
        if drop_originals:
            jax.block_until_ready(out["lm_head"].q)  # drain (see above)
    return out


def dequantize_tree(params, dtype=jnp.bfloat16):
    """Replace every QTensor with its dequantized array (for testing),
    restoring each weight's ORIGINAL model layout — the σ-FFN flat
    gate_up ([L, H, 2I], quantize_decoder_params sigma_ffn) folds back to
    the canonical [L, 2, H, I]."""

    def walk(node, key=None):
        if isinstance(node, QTensor):
            w = node.dequant(dtype)
            if key == "gate_up_proj" and w.ndim == 3 and (
                node.sigma_out or node.riffle_groups
            ):
                # Fold the flat per-block [gate_b | up_b] layout back to
                # the canonical [L, 2, H, I] (inverse of the sigma_tp /
                # riffle_tp blocking in quantize_decoder_params).
                N = node.sigma_groups if node.sigma_out else (
                    node.riffle_groups
                )
                L_, H_, I2 = w.shape
                w = jnp.transpose(
                    w.reshape(L_, H_, N, 2, I2 // (2 * N)), (0, 3, 1, 2, 4)
                ).reshape(L_, 2, H_, I2 // 2)
            return w
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)
