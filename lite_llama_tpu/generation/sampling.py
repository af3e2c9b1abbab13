"""On-device sampling: temperature / top-p / top-k / greedy.

Capability parity with the reference's sampler (`sample_top_p`,
lite_llama/generate.py:16-47: sort → cumsum → renormalize → multinomial; greedy
fallback at temperature==0, generate_stream.py:174).

TPU-native design: everything runs inside the jitted decode step on fp32
logits — no host round-trip per token. Per-request parameter vectors (not
scalars) so one batch can mix sampling settings, which continuous batching
needs. Filtering uses cutoff-value comparison instead of scatter-back through
the sort permutation (cheaper on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    """Per-request sampling knobs, each [B] fp32/int32."""

    temperature: jax.Array  # <=0 means greedy
    top_p: jax.Array  # 1.0 disables
    top_k: jax.Array  # 0 disables

    @staticmethod
    def make(batch: int, temperature=0.6, top_p=0.9, top_k=0):
        return SamplingParams(
            temperature=jnp.full((batch,), temperature, jnp.float32),
            top_p=jnp.full((batch,), top_p, jnp.float32),
            top_k=jnp.full((batch,), top_k, jnp.int32),
        )


def top_p_mask(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Mask (with -inf) tokens outside the top-p nucleus. logits [B, V] fp32,
    top_p [B]."""
    sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    # Keep tokens whose preceding cumulative mass is < top_p (always keeps
    # the argmax). The cutoff is the smallest kept logit.
    keep = (csum - probs) < top_p[:, None]
    n_keep = jnp.sum(keep.astype(jnp.int32), axis=-1)  # >= 1
    cutoff = jnp.take_along_axis(sorted_logits, (n_keep - 1)[:, None], axis=-1)
    return jnp.where(logits >= cutoff, logits, -jnp.inf)


def top_k_mask(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """Mask tokens outside the per-request top-k. top_k [B] int32; 0 = off."""
    V = logits.shape[-1]
    sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    k = jnp.where(top_k > 0, jnp.minimum(top_k, V), V)
    cutoff = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    return jnp.where(logits >= cutoff, logits, -jnp.inf)


def sample(
    logits: jax.Array,  # [B, V] fp32
    key: jax.Array,
    params: SamplingParams,
) -> jax.Array:
    """Sample next tokens [B] int32. Greedy where temperature <= 0."""
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(params.temperature, 1e-6)[:, None]
    scaled = logits / temp
    scaled = top_k_mask(scaled, params.top_k)
    scaled = top_p_mask(scaled, params.top_p)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(params.temperature <= 0.0, greedy_tok, sampled)


def log_softmax_gather(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """Per-token logprobs (the reference's generete_with_probs.py path)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, None].astype(jnp.int32), axis=-1)[:, 0]
