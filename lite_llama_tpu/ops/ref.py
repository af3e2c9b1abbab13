"""Pure-JAX (XLA) reference implementations of every compute op.

These define the numerical contract for the Pallas kernels (each Pallas kernel
is tested against the function here) and double as a portable fallback path on
CPU. Semantics mirror the reference's Triton kernel set
(/root/reference/lite_llama/kernels/__init__.py:1-13), re-expressed
functionally:

- rms_norm / skip_rms_norm   <- skip_rmsnorm.py:118,147 (fused residual-add+norm)
- swiglu                     <- swiglu.py:53 (silu(gate)*up, fp32 sigmoid)
- apply_rope                 <- rope_emb.py:7 (rotate-half on q and k)
- prefill_attention          <- flashattention2_nopad.py:40 (causal, GQA, ragged)
- paged_decode_attention     <- flashdecoding.py:7,202 (split-KV decode through
                                the token-indirection table; here: page table)
- softmax_split              <- softmax_split.py:9-63 (large-vocab softmax)

All softmax/normalization math is fp32 regardless of input dtype, matching the
reference's in-kernel fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# History-block width for the streamed chunked-prefill fallback: above this
# the dense [B, Hq, S_chunk, T_h] score form is replaced by an online-softmax
# scan over TB-token blocks (memory ~ S_chunk * TB instead of S_chunk * T_h).
_HIST_BLOCK = 2048


def cdiv_int(a: int, b: int) -> int:
    """Ceil-div; the canonical definition — executor/kv_cache.py re-exports
    it as ``cdiv`` (ops is the lower layer, so the import points this way)."""
    return -(-a // b)

# ---------------------------------------------------------------------------
# Norms


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def skip_rms_norm(
    x: jax.Array, residual: jax.Array | None, weight: jax.Array, eps: float = 1e-5
):
    """Fused residual-add + RMSNorm.

    Returns ``(normed, new_residual)`` where ``new_residual = x + residual``;
    models thread the residual through layers exactly like the reference
    (llama.py:206-296). ``residual=None`` means plain RMSNorm of ``x``.
    """
    if residual is not None:
        x = x + residual
    return rms_norm(x, weight, eps), x


# ---------------------------------------------------------------------------
# MLP


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    g = gate.astype(jnp.float32)
    return (g * jax.nn.sigmoid(g) * up.astype(jnp.float32)).astype(gate.dtype)


# ---------------------------------------------------------------------------
# RoPE


def rope_cos_sin(
    positions: jax.Array, inv_freq: jax.Array, attention_scaling: float = 1.0
):
    """cos/sin tables for given integer positions.

    positions: int32 [...]; inv_freq: fp32 [head_dim//2], or per-request
    [B, head_dim//2] (dynamic-NTK per-request table selection — broadcasts
    over positions' trailing axes, requiring positions.shape[0] == B).
    Returns fp32 (cos, sin) with shape positions.shape + [head_dim//2].
    """
    if inv_freq.ndim == 2:
        inv_freq = inv_freq.reshape(
            inv_freq.shape[0], *([1] * (positions.ndim - 1)), -1
        )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return (
        jnp.cos(freqs) * attention_scaling,
        jnp.sin(freqs) * attention_scaling,
    )


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE. x: [..., heads, head_dim]; cos/sin: [..., head_dim//2]
    (broadcast over the heads axis)."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention


def _repeat_kv(x: jax.Array, groups: int, head_axis: int) -> jax.Array:
    if groups == 1:
        return x
    return jnp.repeat(x, groups, axis=head_axis)


def prefill_attention(
    q: jax.Array,  # [B, S, Hq, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,  # [B, S, Hkv, D]
    seq_lens: jax.Array,  # int32 [B] — actual lengths; positions >= len are pad
    sm_scale: float | None = None,
) -> jax.Array:
    """Causal self-attention over a padded batch with per-request lengths.

    The reference packs ragged requests into one row-axis ("nopad",
    flashattention2_nopad.py:182-195); under XLA static shapes we instead pad
    to the bucket length and mask — pad positions contribute nothing and their
    outputs are garbage that the caller never reads.
    """
    B, S, Hq, D = q.shape
    groups = Hq // k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (D**0.5)
    k = _repeat_kv(k, groups, 2)
    v = _repeat_kv(v, groups, 2)
    logits = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * sm_scale
    pos = jnp.arange(S, dtype=jnp.int32)
    causal = pos[:, None] >= pos[None, :]
    valid = pos[None, :, None] < seq_lens[:, None, None]  # [B, S(t), 1]->mask k pos
    mask = causal[None, None, :, :] & valid[:, None, :, :].transpose(0, 1, 3, 2)
    logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def gather_kv_pages(
    kv_pool,  # KVPool: pages [L, T, 2, Hkv, D] flat rows (+ scales when int8)
    layer: jax.Array | int,
    page_table: jax.Array,  # int32 [B, max_pages]
    max_seq_len: int,
    out_dtype=None,
):
    """Gather one layer's K/V rows for each request out of the paged pool into
    dense [B, Hkv, max_seq_len, D] views (XLA fallback for the decode kernel),
    dequantizing INT8 caches on the way out.

    A single fused gather over the flattened (layer, row) axis — no
    materialized per-layer slice of the pool.
    """
    pages = kv_pool.pages
    L, _, T, HD = pages.shape
    Hkv, D = kv_pool.num_kv_heads, kv_pool.head_dim
    ps = kv_pool.page_size
    n = max_seq_len // ps
    pt = page_table[:, :n]  # [B, n]
    off = jnp.arange(ps, dtype=jnp.int32)
    rows = (pt[:, :, None] * ps + off[None, None, :]).reshape(
        pt.shape[0], n * ps
    )  # [B, S]
    B, S = rows.shape
    # Gather both planes: [2, B, S, Hkv, D]
    kv = pages[layer].reshape(2 * T, HD)[
        (jnp.arange(2)[:, None, None] * T + rows[None])
    ].reshape(2, B, S, Hkv, D)
    if kv_pool.quantized:
        # Merged scales [L, T, SCALE_LANES]: one row per token carries K in
        # lanes [0, Hkv) and V in [SL/2, SL/2 + Hkv).
        SL = kv_pool.scales.shape[-1]
        srow = kv_pool.scales[layer][rows]  # [B, S, SL]
        sc = jnp.stack(
            [srow[..., :Hkv], srow[..., SL // 2 : SL // 2 + Hkv]], axis=0
        )  # [2, B, S, Hkv]
        kv = kv.astype(jnp.float32) * sc.astype(jnp.float32)[..., None]
        kv = kv.astype(out_dtype or jnp.float32)
    kv = kv.transpose(0, 1, 3, 2, 4)  # [2, B, Hkv, S, D]
    return kv[0], kv[1]


def paged_decode_attention(
    q: jax.Array,  # [B, Hq, D] — one new token per request
    kv_pool,  # KVPool
    layer: jax.Array | int,
    page_table: jax.Array,  # int32 [B, max_pages]
    seq_lens: jax.Array,  # int32 [B] — lengths INCLUDING the new token
    max_seq_len: int | None = None,
    sm_scale: float | None = None,
    k_new: jax.Array | None = None,  # [B, Hkv, D] — newest token, NOT in pool
    v_new: jax.Array | None = None,
) -> jax.Array:
    """Decode-step attention reading K/V through the page table.

    Functional equivalent of the reference's two-stage split-KV flash decoding
    (flashdecoding.py:7-263); the Pallas kernel version streams only the live
    pages, this XLA version gathers then masks. When (k_new, v_new) are given,
    the pool holds seq_lens-1 tokens and the newest token is spliced into the
    gathered view at position seq_lens-1 (deferred-write protocol).
    """
    B, Hq, D = q.shape
    Hkv = kv_pool.num_kv_heads
    page_size = kv_pool.page_size
    if max_seq_len is None:
        max_seq_len = page_table.shape[1] * page_size
    if sm_scale is None:
        sm_scale = 1.0 / (D**0.5)
    k, v = gather_kv_pages(kv_pool, layer, page_table, max_seq_len, q.dtype)
    if k_new is not None:
        bidx = jnp.arange(B)
        pos_new = seq_lens - 1  # [B]
        k = k.at[bidx, :, pos_new, :].set(k_new.astype(k.dtype))
        v = v.at[bidx, :, pos_new, :].set(v_new.astype(v.dtype))
    groups = Hq // Hkv
    qg = q.reshape(B, Hkv, groups, D)
    logits = jnp.einsum(
        "bhgd,bhtd->bhgt", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * sm_scale
    t = jnp.arange(max_seq_len, dtype=jnp.int32)
    mask = t[None, :] < seq_lens[:, None]  # [B, T]
    logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgt,bhtd->bhgd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, Hq, D).astype(q.dtype)


def chunked_prefill_attention(
    q: jax.Array,  # [B, S_c, Hq, D] — this chunk's queries
    k: jax.Array,  # [B, S_c, Hkv, D] — this chunk's keys
    v: jax.Array,
    chunk_lens: jax.Array,  # int32 [B] — valid rows in this chunk
    start_pos: jax.Array,  # int32 [B] — tokens already in the paged pool
    kv_pool,  # KVPool
    layer: jax.Array | int,
    page_table: jax.Array,  # int32 [B, max_pages]
    sm_scale: float | None = None,
    max_hist_len: int | None = None,
) -> jax.Array:
    """Chunked-prefill attention: every chunk query attends the request's
    pool history [0, start_pos) plus the causal prefix of the current chunk.
    XLA contract for ops.attention_prefill.flash_prefill_chunked (which
    streams the history pages instead of gathering them densely)."""
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv
    ps = kv_pool.page_size
    if max_hist_len is None:
        max_hist_len = page_table.shape[1] * ps
    if sm_scale is None:
        sm_scale = 1.0 / (D**0.5)
    qh = q.transpose(0, 2, 1, 3)  # [B, Hq, S, D]
    kc = _repeat_kv(k.transpose(0, 2, 1, 3), groups, 1)  # [B, Hq, S, D]
    vc = _repeat_kv(v.transpose(0, 2, 1, 3), groups, 1)
    t_c = jnp.arange(S, dtype=jnp.int32)
    causal = t_c[None, :, None] >= t_c[None, None, :]  # [1, S(q), S(k)]
    mask_c = causal & (t_c[None, None, :] < chunk_lens[:, None, None])
    NEG = -1e30  # finite mask value: keeps the online-softmax guards exact

    if max_hist_len <= _HIST_BLOCK:
        # Short history: one dense gather + joint softmax (the original
        # contract formulation).
        k_h, v_h = gather_kv_pages(
            kv_pool, layer, page_table, max_hist_len, q.dtype
        )
        kh = _repeat_kv(k_h, groups, 1)  # [B, Hq, T_h, D]
        vh = _repeat_kv(v_h, groups, 1)
        s_hist = jnp.einsum(
            "bhsd,bhtd->bhst", qh, kh, preferred_element_type=jnp.float32
        ) * sm_scale
        s_chunk = jnp.einsum(
            "bhsd,bhtd->bhst", qh, kc, preferred_element_type=jnp.float32
        ) * sm_scale
        t_h = jnp.arange(max_hist_len, dtype=jnp.int32)
        mask_h = t_h[None, :] < start_pos[:, None]  # [B, T_h]
        s_hist = jnp.where(mask_h[:, None, None, :], s_hist, -jnp.inf)
        s_chunk = jnp.where(mask_c[:, None, :, :], s_chunk, -jnp.inf)
        s_all = jnp.concatenate([s_hist, s_chunk], axis=-1)
        p = jax.nn.softmax(s_all, axis=-1)
        p_h, p_c = p[..., :max_hist_len], p[..., max_hist_len:]
        out = jnp.einsum(
            "bhst,bhtd->bshd", p_h.astype(q.dtype), vh,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bhst,bhtd->bshd", p_c.astype(q.dtype), vc,
            preferred_element_type=jnp.float32,
        )
        return out.astype(q.dtype)

    # Long history: STREAM it in _HIST_BLOCK-token blocks under lax.scan
    # with an online softmax, instead of materializing [B, Hq, S, T_h] fp32
    # scores (at an 8k history that dense form is ~10 GB — an OOM cliff this
    # fallback used to hit for quantized pools, which bypass the Pallas
    # history-streaming kernel; ADVICE r2 medium, second half).
    TB = _HIST_BLOCK
    assert TB % ps == 0
    bp = TB // ps
    n_blocks = cdiv_int(max_hist_len, TB)
    need = n_blocks * bp
    pt_pad = (
        page_table[:, :need] if page_table.shape[1] >= need
        else jnp.pad(page_table, ((0, 0), (0, need - page_table.shape[1])))
    )  # pad pages gather garbage rows; the t_abs >= start_pos mask kills them

    def body(carry, i):
        m, l, acc = carry
        pt_blk = jax.lax.dynamic_slice_in_dim(pt_pad, i * bp, bp, axis=1)
        k_h, v_h = gather_kv_pages(kv_pool, layer, pt_blk, TB, q.dtype)
        kh = _repeat_kv(k_h, groups, 1)  # [B, Hq, TB, D]
        vh = _repeat_kv(v_h, groups, 1)
        s = jnp.einsum(
            "bhsd,bhtd->bhst", qh, kh, preferred_element_type=jnp.float32
        ) * sm_scale
        t_abs = i * TB + jnp.arange(TB, dtype=jnp.int32)
        mask = t_abs[None, :] < start_pos[:, None]  # [B, TB]
        s = jnp.where(mask[:, None, None, :], s, NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(s > 0.5 * NEG, jnp.exp(s - m_new), 0.0)
        corr = jnp.where(m > 0.5 * NEG, jnp.exp(m - m_new), 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhst,bhtd->bhsd", p.astype(q.dtype), vh,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc * corr + pv), None

    m0 = jnp.full((B, Hq, S, 1), NEG, jnp.float32)
    l0 = jnp.zeros((B, Hq, S, 1), jnp.float32)
    acc0 = jnp.zeros((B, Hq, S, D), jnp.float32)
    (m_h, l_h, acc_h), _ = jax.lax.scan(
        body, (m0, l0, acc0), jnp.arange(n_blocks, dtype=jnp.int32)
    )

    # Chunk part (dense [S, S] — bounded by the engine's prefill_chunk),
    # then the standard two-part LSE combine.
    s_chunk = jnp.einsum(
        "bhsd,bhtd->bhst", qh, kc, preferred_element_type=jnp.float32
    ) * sm_scale
    s_chunk = jnp.where(mask_c[:, None, :, :], s_chunk, NEG)
    m_c = jnp.max(s_chunk, axis=-1, keepdims=True)
    p_c = jnp.where(s_chunk > 0.5 * NEG, jnp.exp(s_chunk - m_c), 0.0)
    l_c = jnp.sum(p_c, axis=-1, keepdims=True)
    o_c = jnp.einsum(
        "bhst,bhtd->bhsd", p_c.astype(q.dtype), vc,
        preferred_element_type=jnp.float32,
    )
    m_t = jnp.maximum(m_h, m_c)
    a = jnp.where(m_h > 0.5 * NEG, jnp.exp(m_h - m_t), 0.0)
    b = jnp.where(m_c > 0.5 * NEG, jnp.exp(m_c - m_t), 0.0)
    out = (acc_h * a + o_c * b) / jnp.maximum(l_h * a + l_c * b, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


# ---------------------------------------------------------------------------
# Softmax (sampling path)


def softmax_split(logits: jax.Array) -> jax.Array:
    """Numerically-stable softmax over the vocab axis in fp32
    (reference softmax_split.py:63 — used on [batch, vocab] before top-p)."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
