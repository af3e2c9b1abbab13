"""Op dispatch layer.

Every compute op has (a) a pure-XLA reference implementation (``ref.py``) and
(b) where it pays off, a Pallas TPU kernel. This module picks per-op at call
time based on the active backend and the ``LITE_LLAMA_TPU_BACKEND`` override
(``xla`` | ``pallas`` | ``auto``). Tests pin ``xla`` vs ``pallas``
(interpret mode) against each other.

The reference's equivalent surface is lite_llama/kernels/__init__.py:1-13.
"""

from __future__ import annotations

import os
from functools import partial

import jax

from . import ref
from . import activations  # noqa: F401 (activation inventory)
from .ref import (  # re-export pure ops that XLA already fuses optimally
    apply_rope,
    rope_cos_sin,
    softmax_split,
    gather_kv_pages,
)

_BACKEND = os.environ.get("LITE_LLAMA_TPU_BACKEND", "auto")


def set_backend(name: str) -> None:
    """Force 'xla' or 'pallas' (or 'auto') for all dispatched ops."""
    global _BACKEND
    assert name in ("xla", "pallas", "auto")
    _BACKEND = name


def _use_pallas() -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    """Pallas interpret mode off-TPU: ``set_backend('pallas')`` on a CPU
    host (tests) runs every kernel through the interpreter instead of
    crashing in Mosaic — the CPU-testability the reference lacks
    (SURVEY.md §4)."""
    return jax.default_backend() != "tpu"


# --- norm / mlp: ALWAYS the XLA form in the model path — on TPU, XLA fuses
# these elementwise chains into the surrounding matmuls, so a pallas_call here
# would add materialization boundaries. Standalone fused Pallas versions live
# in ops/norms.py (kernel-inventory parity, tested against these).

rms_norm = ref.rms_norm
skip_rms_norm = ref.skip_rms_norm
swiglu = ref.swiglu


# --- attention: the hot ops, Pallas on TPU.

def prefill_attention(q, k, v, seq_lens, sm_scale=None):
    if _use_pallas():
        from . import attention_prefill

        return attention_prefill.flash_prefill(
            q, k, v, seq_lens, sm_scale, interpret=_interpret()
        )
    return ref.prefill_attention(q, k, v, seq_lens, sm_scale)


def chunked_prefill_attention(
    q, k, v, chunk_lens, start_pos, kv_pool, layer, page_table, sm_scale=None,
    max_hist_len=None, force_ref: bool = False,
):
    """Chunk queries attend pool history [0, start_pos) + causal chunk
    prefix. Pallas streams history pages from the pool — including INT8
    pools (int8 tiles + per-page scale slabs, whole-tile in-kernel dequant);
    scale-free fp8 or otherwise dtype-mismatched pools fall back to the XLA
    reference, which streams long histories in blocks.

    ``max_hist_len`` (static) bounds the history span the FALLBACK gathers:
    without it the dense path scored the full page-table span per layer per
    chunk (ADVICE r2 medium). The engine threads a page-rounded bound from
    its host-side chunk bookkeeping. The Pallas kernel ignores it (its
    per-request page walk is already bounded by the traced start_pos)."""
    from . import attention_prefill

    # ``force_ref``: a pallas_call is opaque to GSPMD, so a context-parallel
    # (row-sharded) pool must take the XLA reference path, which partitions
    # like any gather+dot (the decoder passes shard.cp > 1).
    if (
        not force_ref
        and _use_pallas()
        and (
            kv_pool.quantized  # int8+scales: in-kernel dequant
            or kv_pool.pages.dtype == k.dtype
            or q.dtype == jax.numpy.float32
        )
        and q.shape[1] >= kv_pool.page_size  # kernel needs BK % page_size == 0
        # 128-lane DMA alignment: D % 128 == 0 directly, or narrow heads
        # that pack (128/D adjacent heads per wide head — e.g. D=64; see
        # attention_prefill.pack_factor). Unpackable shapes fall back.
        and attention_prefill.pack_factor(q.shape[-1], k.shape[2]) >= 1
    ):
        return attention_prefill.flash_prefill_chunked(
            q, k, v, chunk_lens, start_pos, kv_pool, layer, page_table,
            sm_scale, interpret=_interpret(),
        )
    return ref.chunked_prefill_attention(
        q, k, v, chunk_lens, start_pos, kv_pool, layer, page_table, sm_scale,
        max_hist_len=max_hist_len,
    )


def paged_decode_attention(
    q, kv_pool, layer, page_table, seq_lens,
    max_seq_len=None, sm_scale=None, k_new=None, v_new=None,
):
    # bf16, scale-free fp8 AND int8+scales pools all ride the Pallas kernel:
    # int8 scales are DMA'd per page alongside the tiles and applied in the
    # SCORE domain (attention_decode._decode_kernel), preserving the int8
    # bandwidth saving end to end; quantized pools take the wide form, so
    # any head_dim (including D=64) is kernel-path (r2's D%128 exclusion is
    # gone — the tile-view dequant that required it was replaced).
    if _use_pallas():
        from . import attention_decode

        # max_seq_len is NOT forwarded: the kernel's page walk is bounded
        # by the traced seq_lens (a dead static knob only caused spurious
        # recompiles — ADVICE r3); the XLA fallback below still uses it to
        # bound its dense gather.
        return attention_decode.paged_flash_decode(
            q, kv_pool, layer, page_table, seq_lens,
            sm_scale, k_new=k_new, v_new=v_new,
            interpret=_interpret(),
        )
    return ref.paged_decode_attention(
        q, kv_pool, layer, page_table, seq_lens,
        max_seq_len, sm_scale, k_new=k_new, v_new=v_new,
    )
