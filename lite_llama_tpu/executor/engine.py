"""InferenceEngine: the executor facade.

Capability parity with the reference's ``ModelExecutor``
(/root/reference/lite_llama/executor/model_executor.py:25-369): builds
config + weights, sizes and owns the KV pool, allocates KV for prefill and
decode, and dispatches the forward. The disabled CUDA-graph runner
(cuda_graph.py:14-181) is subsumed by ``jax.jit``: each (batch, bucket-length)
specialization is a captured executable, replayed with donated buffers.

TPU-native design:
- prefill and decode are separately jitted closures over the (static) config;
  the KV cache pytree is donated so pools update in place in HBM.
- decode runs in *chunks*: ``lax.scan`` over N steps fully on device
  (alloc -> forward -> sample -> eos bookkeeping), so the host syncs once per
  chunk instead of once per token — the TPU equivalent of CUDA-graph replay,
  but it also absorbs sampling and the allocator.
- a host-side capacity guard refuses admission when the page pool could be
  exhausted (the in-jit allocator is masked arithmetic and cannot raise).
- prompt lengths are bucketed (powers of two) to bound recompiles.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BaseConfig, load_config
from ..models.decoder import AttnContext, decoder_decode, decoder_prefill
from ..generation.sampling import SamplingParams, log_softmax_gather, sample
from .kv_cache import (
    PagedKVCache,
    alloc_decode,
    alloc_prefill,
    cdiv,
    create_kv_cache,
    free_requests,
    kv_cache_bytes,
)


def next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pad1(x, n: int, fill):
    """Pad a [B] device/np vector to [n] with ``fill``."""
    x = np.asarray(x)
    out = np.full((n,), fill, x.dtype)
    out[: x.shape[0]] = x
    return jnp.asarray(out)


@dataclasses.dataclass
class EngineStats:
    prefill_tokens: int = 0
    decode_tokens: int = 0
    chunks: int = 0


class InferenceEngine:
    """Owns params + paged KV cache + jitted step functions for one model."""

    def __init__(
        self,
        config: BaseConfig,
        params: dict,
        *,
        page_size: int = 16,
        max_reqs: int = 64,
        num_pages: Optional[int] = None,
        hbm_util: float = 0.9,
        decode_chunk: int = 32,
        kv_quant=False,  # False | True/'int8' | 'fp8' (scale-free e4m3)
        forward_prefill=None,
        forward_decode=None,
        mesh=None,
        seed: int = 0,
    ):
        from ..parallel.shardings import ShardingPolicy

        self.config = config
        self.shard = ShardingPolicy(mesh=mesh)
        self.params = self.shard.shard_params(config, params)
        params = self.params
        self.page_size = page_size
        self.max_reqs = max_reqs
        self.decode_chunk = decode_chunk
        self._fwd_prefill = forward_prefill or decoder_prefill
        self._fwd_decode = forward_decode or decoder_decode
        if num_pages is None:
            num_pages = self._auto_num_pages(hbm_util)
        self.num_pages = num_pages
        self.kv_quant = kv_quant
        self.cache = self.shard.shard_cache(
            create_kv_cache(
                config.num_hidden_layers,
                config.num_key_value_heads,
                config.head_dim,
                num_pages=num_pages,
                page_size=page_size,
                max_reqs=max_reqs,
                max_seq_len=config.max_seq_len,
                dtype=config.dtype,
                quantized=kv_quant,
            )
        )
        self._key = jax.random.PRNGKey(seed)
        self._free_slots = list(range(max_reqs))
        self._host_free_pages = num_pages
        self.stats = EngineStats()
        self._prefill_jit = jax.jit(self._prefill_step, donate_argnums=(1,))
        self._chunk_jit = jax.jit(
            self._decode_chunk, donate_argnums=(1,), static_argnames=("n_steps",)
        )
        self.pad_id = config.pad_token_id if config.pad_token_id is not None else 0
        eos = config.eos_token_ids
        self._eos_array = jnp.asarray(eos if eos else [-1], jnp.int32)

    # -- construction -----------------------------------------------------
    @classmethod
    def build(
        cls, ckpt_dir: str, dtype=jnp.bfloat16, max_seq_len=None, **kw
    ) -> "InferenceEngine":
        """Load config + weights from an HF or engine-converted checkpoint dir
        (the reference's ModelExecutor.build, model_executor.py:33)."""
        from ..utils.weights import (
            is_converted_checkpoint,
            load_converted,
            load_hf_checkpoint,
        )

        overrides = {"dtype": dtype}
        if max_seq_len is not None:
            overrides["max_seq_len"] = max_seq_len
        config = load_config(ckpt_dir, **overrides)
        if is_converted_checkpoint(ckpt_dir):
            params = load_converted(ckpt_dir, dtype=dtype)
        else:
            params = load_hf_checkpoint(ckpt_dir, config)
        return cls(config, params, **kw)

    def _auto_num_pages(self, hbm_util: float) -> int:
        """Size the KV pool from free device memory (the reference's
        ComputeMaxAvailableBlocks profiling, mem_manager.py:16-143 — here we
        ask the runtime instead of measuring a dummy forward)."""
        cfg = self.config
        want = self.max_reqs * cdiv(cfg.max_seq_len, self.page_size)
        per_page = kv_cache_bytes(
            cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim,
            1, self.page_size, cfg.dtype,
        )
        try:
            stats = jax.devices()[0].memory_stats()
            free = stats["bytes_limit"] * hbm_util - stats["bytes_in_use"]
            fit = int(free // per_page)
            return max(64, min(want, fit))
        except Exception:
            return want

    # -- jitted step functions -------------------------------------------
    def _prefill_step(self, params, cache, ids, lens, req_ids, key, sampling):
        cfg = self.config
        cache = alloc_prefill(cache, req_ids, lens)
        ctx = AttnContext(
            table_rows=cache.page_table[req_ids],
            seq_lens=lens,
            start_pos=jnp.zeros_like(lens),
            chunk_lens=lens,
        )
        logits, kv = self._fwd_prefill(
            params, cfg, cache.kv_pages, ctx, input_ids=ids,
            shard=self.shard,
        )
        cache = dataclasses.replace(cache, kv_pages=kv)
        B = ids.shape[0]
        last = logits[jnp.arange(B), lens - 1]
        tok = sample(last, key, sampling)
        lp = log_softmax_gather(last, tok)
        return cache, tok, last, lp

    def _decode_chunk(
        self, params, cache, req_ids, tok, done, stop_lens, key, sampling,
        n_limit, *, n_steps: int,
    ):
        """Runs ``n_steps`` (static, bucketed) scan iterations but only the
        first ``n_limit`` (traced) advance any state — steps past the limit
        execute masked, so one compiled shape serves every tail length."""
        cfg = self.config
        eos = self._eos_array
        pad = self.pad_id

        def body(carry, xs):
            step_key, step_i = xs
            cache, tok, done = carry
            step_ok = step_i < n_limit
            active = ~done & step_ok
            cache = alloc_decode(cache, req_ids, active)
            pos = cache.seq_lens[req_ids] - 1
            ctx = AttnContext(
                table_rows=cache.page_table[req_ids],
                seq_lens=cache.seq_lens[req_ids],
                start_pos=pos,
                chunk_lens=jnp.ones_like(pos),
                active=active,
            )
            logits, kv = self._fwd_decode(
                params, cfg, cache.kv_pages, ctx, input_ids=tok,
                shard=self.shard,
            )
            cache = dataclasses.replace(cache, kv_pages=kv)
            next_tok = sample(logits, step_key, sampling)
            # Steps past n_limit are frozen: carry and emissions unchanged.
            next_tok = jnp.where(step_ok, next_tok, tok)
            emit = jnp.where(done | ~step_ok, pad, next_tok)
            emit_lp = jnp.where(
                done | ~step_ok, 0.0, log_softmax_gather(logits, next_tok)
            )
            hit_eos = jnp.isin(next_tok, eos) & step_ok
            hit_len = (cache.seq_lens[req_ids] >= stop_lens) & step_ok
            new_done = done | hit_eos | hit_len
            return (cache, next_tok, new_done), (emit, emit_lp)

        keys = jax.random.split(key, n_steps)
        steps = jnp.arange(n_steps, dtype=jnp.int32)
        (cache, tok, done), (toks, lps) = jax.lax.scan(
            body, (cache, tok, done), (keys, steps)
        )
        return cache, tok, done, toks, lps  # [n_steps, B] each

    # -- host API ---------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def acquire_slots(self, n: int) -> List[int]:
        if len(self._free_slots) < n:
            raise RuntimeError(
                f"request slots exhausted: want {n}, free {len(self._free_slots)}"
            )
        return [self._free_slots.pop(0) for _ in range(n)]

    def release_slots(self, slots: Sequence[int], lens: Sequence[int]):
        if not hasattr(self, "_free_jit"):
            self._free_jit = jax.jit(free_requests, donate_argnums=(0,))
        self.cache = self._free_jit(
            self.cache, jnp.asarray(slots, jnp.int32)
        )
        for s, n in zip(slots, lens):
            self._host_free_pages += cdiv(n, self.page_size)
        self._free_slots.extend(slots)

    def reserve_pages(self, total_lens: Sequence[int]):
        """Host-side capacity guard: the in-jit allocator cannot fail, so
        admission control happens here (improves on the reference, which
        warns and returns None that callers ignore — mem_manager.py:196-210)."""
        need = sum(cdiv(n, self.page_size) for n in total_lens)
        if need > self._host_free_pages:
            raise RuntimeError(
                f"KV pool exhausted: need {need} pages, free {self._host_free_pages}"
            )
        self._host_free_pages -= need

    def prefill(self, token_lists: Sequence[Sequence[int]], sampling, slots):
        """Pad to a bucket, run jitted prefill, sample first tokens.
        Returns (first_tokens [B] np, lens np, last_logits).

        BOTH dims bucket to powers of two: sequence by padding with pad_id,
        batch by appending dummy rows (lens 0, slot id == max_reqs, dropped
        by the allocator's OOB mode) — so a continuous-batching scheduler
        admitting odd batch sizes reuses a handful of compiled shapes
        instead of paying a multi-second XLA compile per (B, S) pair."""
        B = len(token_lists)
        Bp = next_pow2(B)
        lens = np.zeros((Bp,), np.int32)
        lens[:B] = [len(t) for t in token_lists]
        S = next_pow2(int(lens.max()))
        ids = np.full((Bp, S), self.pad_id, np.int32)
        for i, t in enumerate(token_lists):
            ids[i, : len(t)] = t
        slots_p = list(slots) + [self.max_reqs] * (Bp - B)
        samp_p = sampling
        if Bp != B:
            samp_p = SamplingParams(
                temperature=_pad1(sampling.temperature, Bp, 1.0),
                top_p=_pad1(sampling.top_p, Bp, 1.0),
                top_k=_pad1(sampling.top_k, Bp, 0),
            )
        self.cache, tok, last, lp = self._prefill_jit(
            self.params,
            self.cache,
            jnp.asarray(ids),
            jnp.asarray(lens),
            jnp.asarray(slots_p, jnp.int32),
            self._next_key(),
            samp_p,
        )
        self.stats.prefill_tokens += int(lens.sum())
        return (
            np.asarray(tok)[:B],
            lens[:B],
            last[:B],
            np.asarray(lp)[:B],
        )

    def decode(self, slots, tok, done, stop_lens, sampling, n_steps: int):
        """Run one jitted multi-step decode chunk. Returns (tokens
        [n_steps, B] np.int32 — pad-filled after each row's eos, done np).

        ``n_steps`` is bucketed to {decode_chunk, pow2 tails} so the jitted
        chunk compiles for a handful of shapes instead of one per distinct
        tail length (an unlucky tail used to pay a multi-second XLA compile
        mid-generation). The true count rides in as a traced limit: overshoot
        steps execute fully masked (state frozen), and their rows are
        trimmed from the result."""
        run_steps = (
            self.decode_chunk
            if n_steps >= self.decode_chunk
            else next_pow2(n_steps)
        )
        self.cache, tok, done, toks, lps = self._chunk_jit(
            self.params,
            self.cache,
            jnp.asarray(slots, jnp.int32),
            tok,
            done,
            jnp.asarray(stop_lens, jnp.int32),
            self._next_key(),
            sampling,
            jnp.asarray(n_steps, jnp.int32),
            n_steps=run_steps,
        )
        out = np.asarray(toks)[:n_steps]
        self.stats.chunks += 1
        self.stats.decode_tokens += int(out.shape[0] * out.shape[1])
        return tok, done, out, np.asarray(lps)[:n_steps]
