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

Scope: bf16/fp8 (scale-free) pools. INT8 pools carry merged per-token
scale slabs whose K/V lanes are laid out for the GLOBAL head count
([0, Hkv) and [SL/2, SL/2+Hkv)); a tp lane-slice of the slab does not
line up with the pages' head shard, so quantized pools keep the previous
behavior (XLA reference path partitions under GSPMD; the in-kernel
head-offset needed to fix this is a known follow-up). The engine/decoder
routes accordingly (models/decoder.py).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from ..executor.kv_cache import KVPool
from ..ops.qmatmul import _ctx_mesh


def _local_pool(pages, template: KVPool, tp: int) -> KVPool:
    return KVPool(
        pages=pages,
        scales=None,
        page_size=template.page_size,
        num_kv_heads=template.num_kv_heads // tp,
        head_dim=template.head_dim,
    )


def tp_supported(kv_pool: KVPool, num_q_heads: int, tp: int) -> bool:
    return (
        not kv_pool.quantized
        and kv_pool.num_kv_heads % tp == 0
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

    def local(ql, pages, layer, table, lens, kn, vn):
        pool = _local_pool(pages, kv_pool, tp)
        return paged_flash_decode(
            ql, pool, layer, table, lens, sm_scale=sm_scale,
            interpret=interpret, k_new=kn, v_new=vn,
        )

    import jax.numpy as jnp

    return jax.shard_map(
        local,
        mesh=_ctx_mesh(mesh),
        in_specs=(
            P(None, "tp", None),
            P(None, None, None, "tp"),
            P(),
            P(None, None),
            P(None,),
            P(None, "tp", None),
            P(None, "tp", None),
        ),
        out_specs=P(None, "tp", None),
        axis_names={"tp"},
        check_vma=False,
    )(q, kv_pool.pages, jnp.asarray(layer, jnp.int32), page_table,
      seq_lens, k_new, v_new)


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

    def local(ql, kl, vl, clens, spos, pages, layer, table):
        pool = _local_pool(pages, kv_pool, tp)
        return flash_prefill_chunked(
            ql, kl, vl, clens, spos, pool, layer, table, sm_scale,
            interpret=interpret,
        )

    import jax.numpy as jnp

    return jax.shard_map(
        local,
        mesh=_ctx_mesh(mesh),
        in_specs=(
            P(None, None, "tp", None),
            P(None, None, "tp", None),
            P(None, None, "tp", None),
            P(None,),
            P(None,),
            P(None, None, None, "tp"),
            P(),
            P(None, None),
        ),
        out_specs=P(None, None, "tp", None),
        axis_names={"tp"},
        check_vma=False,
    )(q, k, v, chunk_lens, start_pos, kv_pool.pages,
      jnp.asarray(layer, jnp.int32), table_rows)
