"""Tensor-parallel wrappers for the Pallas attention kernels.

A bare ``pallas_call`` is opaque to GSPMD: on a tp>1 mesh XLA replicates
its operands, so tp-sharded attention would gather the FULL KV pool onto
every chip — silently erasing tensor parallelism's whole point for the
decode loop. These wrappers make the head sharding explicit with a
manual-tp ``shard_map`` (the same nested-partial-manual pattern the W4A8
matmul uses, ops/qmatmul.py): each shard runs the UNCHANGED single-chip
kernel over its own kv-head slice of the pool and its own query heads —
attention is embarrassingly parallel over kv heads, so there is NO
collective in the hot loop (SURVEY.md §5's design goal: decode attention
fully chip-local).

Shard alignment: queries shard contiguously on the head axis
(ShardingPolicy.heads) and the pool's flat channel axis ``Hkv*D`` shards
contiguously on tp (shardings.py _cache_leaf_sharding), so shard s's
``Nq/t`` query heads attend exactly its ``Hkv/t`` kv heads — GQA group
structure is preserved within the shard.

INT8 pools: the merged per-token scale slab's K/V lanes index GLOBAL
heads ([0, Hkv) and [SL/2, SL/2+Hkv)), so it cannot be lane-sliced to
match the pages' head shard (and a narrower local slab would break the
128-lane DMA tiling the layout exists for — executor/kv_cache.py KVPool
docstring). Instead the slab stays REPLICATED over tp (it is 1/8 the
pool's bytes at Hkv=8/D=128; per-chip slab DMA traffic equals the tp=1
kernel's, i.e. the tp win applies to the int8 page bytes, not the scale
side-band) and each shard passes ``head_offset = axis_index('tp') *
Hkv_local`` into the kernels, which shift their one-hot scale selectors
to the shard's global head range (ops/attention_decode.py,
ops/attention_prefill.py).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from ..executor.kv_cache import KVPool
from ..ops.qmatmul import _ctx_mesh


def _local_pool(pages, scales, template: KVPool, tp: int) -> KVPool:
    return KVPool(
        pages=pages,
        scales=scales,
        page_size=template.page_size,
        num_kv_heads=template.num_kv_heads // tp,
        head_dim=template.head_dim,
    )


def tp_supported(kv_pool: KVPool, num_q_heads: int, tp: int) -> bool:
    return (
        kv_pool.num_kv_heads % tp == 0
        and num_q_heads % tp == 0
    )


def tp_paged_flash_decode(
    q: jax.Array,  # [B, Nq, D], head axis tp-sharded
    kv_pool: KVPool,  # pages [L, 2, T, Hkv*D], channel axis tp-sharded
    layer,
    page_table: jax.Array,
    seq_lens: jax.Array,
    mesh,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
    k_new: Optional[jax.Array] = None,  # [B, Hkv, D], head axis tp-sharded
    v_new: Optional[jax.Array] = None,
):
    from ..ops.attention_decode import paged_flash_decode

    tp = mesh.shape["tp"]
    quantized = kv_pool.quantized
    hl = kv_pool.num_kv_heads // tp

    def local(ql, pages, layer, table, lens, kn, vn, *maybe_scales):
        scales = maybe_scales[0] if quantized else None
        pool = _local_pool(pages, scales, kv_pool, tp)
        hoff = jax.lax.axis_index("tp") * hl if quantized else 0
        return paged_flash_decode(
            ql, pool, layer, table, lens, sm_scale=sm_scale,
            interpret=interpret, k_new=kn, v_new=vn, head_offset=hoff,
        )

    import jax.numpy as jnp

    in_specs = [
        P(None, "tp", None),
        P(None, None, None, "tp"),
        P(),
        P(None, None),
        P(None,),
        P(None, "tp", None),
        P(None, "tp", None),
    ]
    args = [q, kv_pool.pages, jnp.asarray(layer, jnp.int32), page_table,
            seq_lens, k_new, v_new]
    if quantized:
        # Replicated merged scale slab — lanes index GLOBAL heads (module
        # docstring); the in-kernel head_offset does the shard alignment.
        in_specs.append(P(None, None, None))
        args.append(kv_pool.scales)

    return jax.shard_map(
        local,
        mesh=_ctx_mesh(mesh),
        in_specs=tuple(in_specs),
        out_specs=P(None, "tp", None),
        axis_names={"tp"},
        check_vma=False,
    )(*args)


def tp_flash_prefill(
    q: jax.Array,  # [B, S, Nq, D], head axis tp-sharded
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,
    seq_lens: jax.Array,
    mesh,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
):
    from ..ops.attention_prefill import flash_prefill

    def local(ql, kl, vl, lens):
        return flash_prefill(ql, kl, vl, lens, sm_scale,
                             interpret=interpret)

    return jax.shard_map(
        local,
        mesh=_ctx_mesh(mesh),
        in_specs=(
            P(None, None, "tp", None),
            P(None, None, "tp", None),
            P(None, None, "tp", None),
            P(None,),
        ),
        out_specs=P(None, None, "tp", None),
        axis_names={"tp"},
        check_vma=False,
    )(q, k, v, seq_lens)


def tp_flash_prefill_chunked(
    q: jax.Array,  # [B, Sc, Nq, D]
    k: jax.Array,  # [B, Sc, Hkv, D]
    v: jax.Array,
    chunk_lens: jax.Array,
    start_pos: jax.Array,
    kv_pool: KVPool,
    layer,
    table_rows: jax.Array,
    mesh,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
):
    from ..ops.attention_prefill import flash_prefill_chunked

    tp = mesh.shape["tp"]
    quantized = kv_pool.quantized
    hl = kv_pool.num_kv_heads // tp

    def local(ql, kl, vl, clens, spos, pages, layer, table, *maybe_scales):
        scales = maybe_scales[0] if quantized else None
        pool = _local_pool(pages, scales, kv_pool, tp)
        hoff = jax.lax.axis_index("tp") * hl if quantized else 0
        return flash_prefill_chunked(
            ql, kl, vl, clens, spos, pool, layer, table, sm_scale,
            interpret=interpret, head_offset=hoff,
        )

    import jax.numpy as jnp

    in_specs = [
        P(None, None, "tp", None),
        P(None, None, "tp", None),
        P(None, None, "tp", None),
        P(None,),
        P(None,),
        P(None, None, None, "tp"),
        P(),
        P(None, None),
    ]
    args = [q, k, v, chunk_lens, start_pos, kv_pool.pages,
            jnp.asarray(layer, jnp.int32), table_rows]
    if quantized:
        # Replicated merged scale slab (module docstring): the in-kernel
        # head_offset aligns the selectors with this shard's heads.
        in_specs.append(P(None, None, None))
        args.append(kv_pool.scales)

    return jax.shard_map(
        local,
        mesh=_ctx_mesh(mesh),
        in_specs=tuple(in_specs),
        out_specs=P(None, None, "tp", None),
        axis_names={"tp"},
        check_vma=False,
    )(*args)
