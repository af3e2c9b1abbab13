"""Paged flash-decode attention — Pallas TPU kernel.

The hot kernel of the engine: decode-step attention (one query token per
request) reading K/V *directly out of the paged HBM pool* through the page
table. Functional equivalent of the reference's two-stage split-KV Triton
flash decoding (/root/reference/lite_llama/kernels/flashdecoding.py:7-299,
gather-through-indirection at :84-89), re-designed for TPU bandwidth:

- Pool layout [L, P, 2, Hkv, ps, D]: one page = K+V for *all* kv heads in one
  contiguous tile, so each page is two large contiguous DMAs (K half + V
  half) — DMA size, not allocation granularity, is what HBM bandwidth cares
  about on TPU, and the decode step is bandwidth-bound.
- Grid is (B,): one program per request walks its live pages, UNROLL pages
  per loop iteration with a double-buffered (2 x UNROLL deep) async-DMA
  pipeline. Tail DMAs clamp to the last live page (real data, masked out) so
  no uninitialized VMEM ever reaches the MXU.
- GQA-on-MXU trick: instead of Hkv small per-head dots ([G, D] x [D, ps],
  G ~ 1..8 rows — wasting the MXU's 128-row dim), ALL query heads form the
  M axis ([Nq, D]) and ALL heads' keys form the N axis ([D, UNROLL*Hkv*ps]).
  Cross-head scores are junk — but those FLOPs ride MXU rows that would idle
  anyway, and a precomputed block-identity mask sets them to -inf so the
  softmax + P@V (zeros kill cross-head V terms) stay exact. Net: 2 matmul
  issues per iteration instead of 2*Hkv*UNROLL.
- INT8 KV cache (beyond-reference): pages arrive int8 with per-(token, head)
  scales; the score matrix is descaled per *column* after the Q@K dot
  (s[:, j] *= sk[j] — exact, scales are per key token) and P is rescaled per
  column before P@V (pv = (p * sv) @ v_q — exact for the same reason). KV HBM
  traffic halves again.
- Online softmax in base-2 (exp2 with log2(e)-folded scale — the reference's
  Triton trick, flashattention2_nopad.py:134) with fp32 running max / sum /
  accumulator. The (m, l, acc) form stays ring/context-parallel combinable
  (SURVEY.md §5).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BUF = 2  # buffer slots (double buffering), each holding UNROLL pages
DEFAULT_UNROLL = 4  # pages fetched + processed per loop iteration
LOG2E = math.log2(math.e)
NEG_INF = float(-1e30)  # large-negative instead of -inf: exp2 flushes to 0
# and (unlike -inf) can never produce NaN via inf-inf in the m update.


def _decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    page_table_ref,  # [B, ppr] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, Nq, D] VMEM (this request's q)
    kv_pages_ref,  # [L, P, 2, Hkv, ps, D] HBM
    kv_scales_ref,  # [L, P, 2, Hkv, ps] HBM (dummy [1,1,2,Hkv,ps] if bf16)
    # outputs
    out_ref,  # [1, Nq, D] VMEM
    m_ref,  # [1, Nq, 128] VMEM fp32 (running max, exp2 domain; col 0 valid)
    l_ref,  # [1, Nq, 128] VMEM fp32 (softmax denominator; col 0 valid)
    # scratch
    kv_buf,  # [N_BUF, 2, UNROLL, Hkv, ps, D] VMEM (page-major, K/V halves)
    sc_buf,  # [N_BUF, 2, UNROLL, Hkv, ps] VMEM fp32 (or [1,...] dummy)
    sems,  # DMA sems [N_BUF, UNROLL]
    sc_sems,  # DMA sems [N_BUF, UNROLL]
    *,
    sm_scale: float,
    page_size: int,
    num_kv_heads: int,
    UNROLL: int,
    quantized: bool,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    # kv_len: tokens present in the pool (callers pass seq_len or seq_len-1
    # when the newest token rides separately as a "virtual page").
    kv_len = seq_lens_ref[b]
    num_pages = pl.cdiv(kv_len, page_size)
    n_iters = pl.cdiv(num_pages, UNROLL)

    Nq, D = q_ref.shape[1], q_ref.shape[2]
    Hkv = num_kv_heads
    G = Nq // Hkv
    ps = page_size
    Wp = UNROLL * Hkv * ps  # score columns per iteration
    q = q_ref[0].astype(jnp.float32) * (sm_scale * LOG2E)  # [Nq, D]

    # Column decomposition: col = f*(Hkv*ps) + h2*ps + j.
    col = jax.lax.broadcasted_iota(jnp.int32, (Nq, Wp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Nq, Wp), 0)
    col_h = (col % (Hkv * ps)) // ps
    head_ok = col_h == (row // G)  # block-identity mask (loop-invariant)
    pos_base = (col // (Hkv * ps)) * ps + (col % ps)  # in-window position

    def start_iter_dma(it, slot):
        """Fetch pages [it*UNROLL, ...) (clamped) into the slot, page-major.

        One page = two contiguous chunks (K half, V half) of Hkv*ps*D each."""
        base = it * UNROLL
        for f in range(UNROLL):
            page_idx = jnp.minimum(base + f, num_pages - 1)
            page_id = page_table_ref[b, page_idx]
            pltpu.make_async_copy(
                kv_pages_ref.at[layer, page_id],
                kv_buf.at[slot, :, f],
                sems.at[slot, f],
            ).start()
            if quantized:
                pltpu.make_async_copy(
                    kv_scales_ref.at[layer, page_id],
                    sc_buf.at[slot, :, f],
                    sc_sems.at[slot, f],
                ).start()

    start_iter_dma(0, 0)

    def body(it, carry):
        m, l, acc = carry
        slot = jax.lax.rem(it, N_BUF)

        @pl.when(it + 1 < n_iters)
        def _():
            start_iter_dma(it + 1, jax.lax.rem(it + 1, N_BUF))

        for f in range(UNROLL):
            pltpu.make_async_copy(
                kv_pages_ref.at[layer, 0],
                kv_buf.at[slot, :, f],
                sems.at[slot, f],
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    kv_scales_ref.at[layer, 0],
                    sc_buf.at[slot, :, f],
                    sc_sems.at[slot, f],
                ).wait()

        k = kv_buf[slot, 0].reshape(Wp, D)  # [UNROLL*Hkv*ps, D]
        v = kv_buf[slot, 1].reshape(Wp, D)
        if quantized:
            k = k.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nq, Wp] — cross-head blocks are junk, masked next
        if quantized:
            sk = sc_buf[slot, 0].reshape(Wp)
            s = s * sk[None, :]
        valid = head_ok & (it * (UNROLL * ps) + pos_base < kv_len)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))  # [Nq, 1]
        p = jnp.exp2(s - m_new)  # [Nq, Wp]; junk/pad cols -> 0
        corr = jnp.exp2(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            sv = sc_buf[slot, 1].reshape(Wp)
            p_v = (p * sv[None, :]).astype(jnp.bfloat16)
            v_mat = v.astype(jnp.bfloat16)
        else:
            p_v = p.astype(v.dtype)
            v_mat = v
        pv = jax.lax.dot_general(
            p_v, v_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nq, D] — zero weights kill cross-head V terms
        return m_new, l_new, acc * corr + pv

    m0 = jnp.full((Nq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Nq, 1), jnp.float32)
    acc0 = jnp.zeros((Nq, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_iters, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    out_ref[0] = out.astype(out_ref.dtype)
    m_ref[0] = jnp.broadcast_to(m, (Nq, 128))
    l_ref[0] = jnp.broadcast_to(l, (Nq, 128))


@functools.partial(
    jax.jit,
    static_argnames=("max_seq_len", "sm_scale", "interpret", "unroll"),
)
def paged_flash_decode(
    q: jax.Array,  # [B, Nq, D]
    kv_pool,  # KVPool: pages [L, P, 2, Hkv, ps, D] (+ scales when int8)
    layer: jax.Array | int,
    page_table: jax.Array,  # int32 [B, ppr]
    seq_lens: jax.Array,  # int32 [B]
    max_seq_len: int | None = None,
    sm_scale: float | None = None,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    k_new: jax.Array | None = None,  # [B, Hkv, D] — newest token, NOT in pool
    v_new: jax.Array | None = None,
) -> jax.Array:
    """When (k_new, v_new) are given, the pool holds only seq_lens-1 tokens;
    the newest token is folded in via an exact LSE combine OUTSIDE the kernel
    (the kernel returns its online-softmax (m, l) state — the same algebra a
    ring/context-parallel combine would use). This lets the decode step defer
    all pool writes to one post-scan scatter: the pool stays read-only inside
    the layer scan, so XLA keeps it aliased in place instead of ping-pong
    copying it every layer (measured 288ms -> ~20ms per 3B decode step)."""
    kv_pages = kv_pool.pages
    quantized = kv_pool.quantized
    B, Nq, D = q.shape
    L, P, _, Hkv, ps, _ = kv_pages.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D**0.5)

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    if quantized:
        kv_scales = kv_pool.scales
        sc_scratch = pltpu.VMEM((N_BUF, 2, unroll, Hkv, ps), jnp.float32)
    else:
        kv_scales = jnp.zeros((1, 1, 2, Hkv, ps), jnp.float32)
        sc_scratch = pltpu.VMEM((1, 2, 1, Hkv, ps), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, Nq, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, Nq, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Nq, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Nq, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_BUF, 2, unroll, Hkv, ps, D), kv_pages.dtype),
            sc_scratch,
            pltpu.SemaphoreType.DMA((N_BUF, unroll)),
            pltpu.SemaphoreType.DMA((N_BUF, unroll)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        sm_scale=float(sm_scale),
        page_size=ps,
        num_kv_heads=Hkv,
        UNROLL=unroll,
        quantized=quantized,
    )
    kv_lens = seq_lens if k_new is None else seq_lens - 1
    out, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Nq, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Nq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(layer_arr, page_table, kv_lens, q, kv_pages, kv_scales)
    if k_new is None:
        return out
    # Exact LSE combine with the virtual newest token (exp2 domain, scales
    # folded the same way as inside the kernel).
    G = Nq // Hkv
    m1 = m[..., 0]  # [B, Nq]
    l1 = l[..., 0]
    qf = q.astype(jnp.float32) * (sm_scale * LOG2E)
    qg = qf.reshape(B, Hkv, G, D)
    s2 = jnp.einsum(
        "bhgd,bhd->bhg", qg, k_new.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(B, Nq)
    m_out = jnp.maximum(m1, s2)
    c1 = jnp.exp2(m1 - m_out)  # pool-side correction
    c2 = jnp.exp2(s2 - m_out)  # new-token weight
    l_out = l1 * c1 + c2
    v2 = jnp.broadcast_to(
        v_new.astype(jnp.float32)[:, :, None, :], (B, Hkv, G, D)
    ).reshape(B, Nq, D)
    num = (
        out.astype(jnp.float32) * (l1 * c1)[..., None] + v2 * c2[..., None]
    )
    return (num / jnp.maximum(l_out, 1e-30)[..., None]).astype(q.dtype)
