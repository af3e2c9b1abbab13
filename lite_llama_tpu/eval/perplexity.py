"""Corpus perplexity through the engine's own forward path.

BASELINE.md:40-42 gates quantized configs on PERPLEXITY parity, and the
reference's acceptance tier is side-by-side real-checkpoint runs
(/root/reference/tests/models/test_qwen2.py:112,195;
/root/reference/examples/evaluator/eval.py:14-96). This module is the
measurement half of that gate (docs/validation.md is the recipe):
``corpus_perplexity`` scores token sequences with the SAME code generation
uses — chunked prefill through the paged pool — so a quantized-weight tree
exercises the quantized matmuls and a quantized KV pool exercises the
in-kernel dequant history reads (an eval that bypassed the pool would
validate int8-KV not at all).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def corpus_perplexity(
    cfg,
    params: dict,
    seqs: Sequence[Sequence[int]],
    *,
    kv_quant=False,  # False | True/'int8' | 'fp8' — pool the history rides
    batch_size: int = 4,
    chunk: int = 256,
    page_size: int = 16,
    shard=None,
) -> dict:
    """Next-token perplexity of ``seqs`` under the decoder.

    Each batch runs as a fresh paged-cache session: successive ``chunk``-
    sized windows prefill through ``decoder_prefill(chunked=True)``, so
    positions past the first window attend pool HISTORY — the exact
    read path (and kernel) long-prompt serving uses, including quantized
    pools. Returns ``{"perplexity", "nll", "tokens"}`` with natural-log
    NLL per predicted token.
    """
    from ..executor.kv_cache import (
        alloc_prefill,
        cdiv,
        create_kv_cache,
        kv_write_prefill,  # noqa: F401 (decoder_prefill writes internally)
    )
    from ..models.decoder import AttnContext, decoder_prefill, _NOSHARD

    shard = shard if shard is not None else _NOSHARD
    seqs = [list(s) for s in seqs if len(s) >= 2]
    assert seqs, "perplexity needs sequences of >= 2 tokens"
    total_lp = 0.0
    total_n = 0

    @jax.jit
    def chunk_logprobs(params, kv_pages, table_rows, seq_lens, start_pos,
                       chunk_lens, ids_chunk, next_ids, valid):
        ctx = AttnContext(
            table_rows=table_rows,
            seq_lens=seq_lens,
            start_pos=start_pos,
            chunk_lens=chunk_lens,
            active=chunk_lens > 0,
        )
        logits, kv_pages = decoder_prefill(
            params, cfg, kv_pages, ctx, input_ids=ids_chunk, shard=shard,
            chunked=True,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(
            logp, next_ids[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
        tok_lp = jnp.where(valid, tok_lp, 0.0)
        return jnp.sum(tok_lp), jnp.sum(valid), kv_pages

    for b0 in range(0, len(seqs), batch_size):
        batch = seqs[b0 : b0 + batch_size]
        B = len(batch)
        lens = np.asarray([len(s) for s in batch], np.int32)
        S = int(cdiv(int(lens.max()), chunk) * chunk)
        toks = np.zeros((B, S + 1), np.int32)
        for i, s in enumerate(batch):
            toks[i, : len(s)] = s
        cache = create_kv_cache(
            cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
            num_pages=B * cdiv(S, page_size) + 2, page_size=page_size,
            max_reqs=B, max_seq_len=max(S, chunk),
            dtype=cfg.dtype, quantized=kv_quant,
        )
        req = jnp.arange(B, dtype=jnp.int32)
        cache = alloc_prefill(cache, req, jnp.asarray(lens))
        kv_pages = cache.kv_pages
        table_rows = cache.page_table[req]
        for c0 in range(0, S, chunk):
            chunk_lens = np.clip(lens - c0, 0, chunk).astype(np.int32)
            if not chunk_lens.any():
                break
            ids_chunk = toks[:, c0 : c0 + chunk]
            # logits[:, j] predict token at global position c0 + j + 1.
            next_ids = toks[:, c0 + 1 : c0 + chunk + 1]
            j = np.arange(chunk, dtype=np.int32)[None, :]
            valid = (c0 + j + 1) < lens[:, None]
            lp, n, kv_pages = chunk_logprobs(
                params, kv_pages, table_rows, jnp.asarray(lens),
                jnp.full((B,), c0, jnp.int32), jnp.asarray(chunk_lens),
                jnp.asarray(ids_chunk), jnp.asarray(next_ids),
                jnp.asarray(valid),
            )
            total_lp += float(lp)
            total_n += int(n)
    nll = -total_lp / max(total_n, 1)
    return {
        "perplexity": math.exp(nll),
        "nll": nll,
        "tokens": total_n,
    }
