"""Ragged causal flash-attention (prefill) — Pallas TPU kernel.

Functional equivalent of the reference's "nopad" FlashAttention-2 prefill
kernel (/root/reference/lite_llama/kernels/flashattention2_nopad.py:40-268):
causal masking, GQA via query-head -> kv-head mapping (:73), online softmax
with the exp2 trick (:134), per-request raggedness. The reference packs ragged
requests into one row axis with b_start_loc/b_seq_len (:182-195); under XLA's
static shapes we instead take a padded [B, S] batch plus per-request lengths —
pad queries produce garbage no caller reads, and pad keys are masked.

Blocked FA-2 structure: grid (batch, q-head, q-block); the key/value stream
for the (batch, kv-head) pair stays VMEM-resident across q-blocks (Pallas
skips re-fetch when the block index is unchanged), and the inner loop walks
key blocks only up to the causal frontier of the q-block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)
NEG_INF = float(-1e30)

DEFAULT_BQ = 128
DEFAULT_BK = 128


def _prefill_kernel(
    seq_lens_ref,  # [B] int32 (scalar prefetch)
    q_ref,  # [1, 1, BQ, D] VMEM
    k_ref,  # [1, 1, S, D] VMEM (whole key stream for this (b, kv head))
    v_ref,  # [1, 1, S, D] VMEM
    out_ref,  # [1, 1, BQ, D] VMEM
    *,
    sm_scale: float,
    block_k: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[2]
    BK = block_k
    seq_len = seq_lens_ref[b]

    q = q_ref[0, 0].astype(jnp.float32) * (sm_scale * LOG2E)  # [BQ, D]
    q_pos = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)

    # Causal frontier: highest key this q-block can see is qi*BQ + BQ - 1;
    # also never beyond this request's length.
    kv_hi = jnp.minimum((qi + 1) * BQ, seq_len)
    n_blocks = pl.cdiv(kv_hi, BK)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * BK, BK), :]  # [BK, D]
        v = v_ref[0, 0, pl.ds(j * BK, BK), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        k_pos = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        valid = (k_pos <= q_pos) & (k_pos < seq_len)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * corr + pv

    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret", "block_q", "block_k")
)
def flash_prefill(
    q: jax.Array,  # [B, S, Nq, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,
    seq_lens: jax.Array,  # int32 [B]
    sm_scale: float | None = None,
    interpret: bool = False,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
) -> jax.Array:
    B, S, Nq, D = q.shape
    Hkv = k.shape[2]
    G = Nq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / (D**0.5)
    BQ = min(block_q, S)
    BK = min(block_k, S)
    assert S % BQ == 0 and S % BK == 0, (S, BQ, BK)

    # Head-major layout so q blocks are (seq, head_dim) tiles.
    qt = q.transpose(0, 2, 1, 3)  # [B, Nq, S, D]
    kt = k.transpose(0, 2, 1, 3)  # [B, Hkv, S, D]
    vt = v.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Nq, S // BQ),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BQ, D), lambda b, h, i, *_: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, S, D), lambda b, h, i, *_: (b, h // G, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, S, D), lambda b, h, i, *_: (b, h // G, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, D), lambda b, h, i, *_: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _prefill_kernel, sm_scale=float(sm_scale), block_k=BK
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(seq_lens, qt, kt, vt)
    return out.transpose(0, 2, 1, 3)  # back to [B, S, Nq, D]
