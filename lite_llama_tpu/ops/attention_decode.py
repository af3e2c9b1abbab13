"""Paged flash-decode attention — Pallas TPU kernel.

The hot kernel of the engine: decode-step attention (one query token per
request) reading K/V *directly out of the paged HBM pool* through the page
table. Functional equivalent of the reference's two-stage split-KV Triton
flash decoding (/root/reference/lite_llama/kernels/flashdecoding.py:7-299,
gather-through-indirection at :84-89), re-designed for TPU bandwidth:

- Pool layout [L, P, 2, Hkv, ps, D]: one page = K+V for *all* kv heads in one
  contiguous tile, so each page is a single large DMA (256KB for Llama-3B at
  ps=64) — DMA size is what HBM bandwidth cares about on TPU, and the decode
  step is bandwidth-bound.
- Grid is (B,): one program per request walks exactly ceil(seq_len/ps) live
  pages with a 4-deep async-DMA prefetch pipeline (the TPU analogue of the
  reference's split-KV grid axis — no gathered K/V is ever materialized; the
  XLA fallback in ref.py materializes).
- All kv heads are processed together per page via head-batched dots
  ([Hkv, G, D] x [Hkv, ps, D]); GQA groups ride the sublane dim.
- Online softmax (running max / sum / accumulator, fp32) — the reference's
  stage-1 partials + stage-2 LSE reduce collapsed into one pass; the
  (m, l, acc) form stays ring/context-parallel combinable (SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BUF = 4  # DMA prefetch depth


def _decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    page_table_ref,  # [B, ppr] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, Nq, D] VMEM (this request's q)
    kv_pages_ref,  # [L, P, 2, Hkv, ps, D] HBM
    # outputs
    out_ref,  # [1, Nq, D] VMEM
    # scratch
    kv_buf,  # [N_BUF, 2, Hkv, ps, D] VMEM
    sems,  # DMA sems [N_BUF]
    *,
    sm_scale: float,
    page_size: int,
    num_kv_heads: int,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)

    Nq, D = q_ref.shape[1], q_ref.shape[2]
    Hkv = num_kv_heads
    G = Nq // Hkv
    ps = page_size
    q = q_ref[0].astype(jnp.float32) * sm_scale  # [Nq, D]
    qg = q.reshape(Hkv, G, D)

    def dma(i, slot):
        page_id = page_table_ref[b, i]
        return pltpu.make_async_copy(
            kv_pages_ref.at[layer, page_id], kv_buf.at[slot], sems.at[slot]
        )

    # Prologue: fill the pipeline.
    for j in range(N_BUF - 1):
        @pl.when(j < num_pages)
        def _():
            dma(j, j).start()

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, N_BUF)

        # Issue the DMA N_BUF-1 ahead; its slot is the one consumed at i-1.
        @pl.when(i + N_BUF - 1 < num_pages)
        def _():
            dma(i + N_BUF - 1, jax.lax.rem(i + N_BUF - 1, N_BUF)).start()

        dma(i, slot).wait()
        k = kv_buf[slot, 0]  # [Hkv, ps, D]
        v = kv_buf[slot, 1]

        s = jax.lax.dot_general(
            qg, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, G, ps]
        pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, ps), 2)
        s = jnp.where(pos < seq_len, s, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        p = jnp.exp(s - m_new)  # [Hkv, G, ps]
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=2, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, G, D]
        return m_new, l_new, acc * corr + pv

    m0 = jnp.full((Hkv, G, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((Hkv, G, 1), jnp.float32)
    acc0 = jnp.zeros((Hkv, G, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    out_ref[0] = out.reshape(Nq, D).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("max_seq_len", "sm_scale", "interpret")
)
def paged_flash_decode(
    q: jax.Array,  # [B, Nq, D]
    kv_pages: jax.Array,  # [L, P, 2, Hkv, ps, D]
    layer: jax.Array | int,
    page_table: jax.Array,  # int32 [B, ppr]
    seq_lens: jax.Array,  # int32 [B]
    max_seq_len: int | None = None,
    sm_scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    B, Nq, D = q.shape
    L, P, _, Hkv, ps, _ = kv_pages.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D**0.5)

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, Nq, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Nq, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, 2, Hkv, ps, D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        sm_scale=float(sm_scale),
        page_size=ps,
        num_kv_heads=Hkv,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(layer_arr, page_table, seq_lens, q, kv_pages)
