"""Greedy speculative decoding with prompt-lookup (n-gram) drafts.

Beyond-reference capability (the reference decodes strictly one token per
forward; SURVEY.md §3.2). No draft model is needed: drafts come from
matching the request's own recent n-gram against its prompt+generation
history ("prompt lookup decoding") — on summarization/extraction/code
workloads the continuation often already appears verbatim in the context,
so several tokens verify per forward; on novel text acceptance simply
drops to zero and the step degrades to one model token per forward.

TPU-native mechanics: the verify step is ONE jitted program
(engine.spec_verify) — optimistic page allocation, a ragged CHUNKED
prefill over [current_token | drafts] against the paged pool (the same
kernel long prompts use), device-side longest-matching-prefix acceptance,
and a page/length REWIND (kv_cache.rewind_requests) for rejected rows.
Every emitted token is the argmax of a genuine model forward over its
true prefix, so the stream is a valid greedy decode by construction;
under MATCHING kernel numerics it is token-identical to TextGenerator
(tests/test_speculative.py asserts exact parity on the fp32 CPU path).
In bf16 the chunked-verify and paged-decode attention kernels round
differently, so near-tie argmaxes can diverge between the two streams —
the spec stream remains self-consistent greedy.

Two execution modes:

- CHUNKED (default, ``chunk_steps > 0``): drafting runs ON DEVICE
  (``device_prompt_lookup`` — batched n-gram match over a device-resident
  token history) and ``chunk_steps`` verify iterations scan inside one
  jitted dispatch (engine.spec_decode_chunk), so the host syncs once per
  chunk — the same dispatch discipline as plain chunked decoding. This
  removed the per-step host RTT that made the original per-step form
  SLOWER than plain decoding on this repo's tunneled chip (0.19x
  measured, ~26 ms/fetch on the critical path per step).
- PER-STEP (``chunk_steps=0``): the original host-drafted loop — one
  engine.spec_verify + one fetch per step. Kept as the simplest reference
  implementation and the A/B baseline.

Speedup remains workload-dependent either way: acceptance comes from the
continuation already appearing in the context (summarization/extraction/
code), and each verify forward costs more than a decode step (K-token
chunked prefill vs 1-token decode), so novel-text workloads still decode
faster WITHOUT speculation.

Greedy (temperature=0) only: temperature>0 needs rejection resampling to
preserve the sampling distribution — out of scope for this layer.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..executor.engine import InferenceEngine
from .generate import CompletionOutput, TextGenerator, _make_sampling


def device_prompt_lookup(
    history: jnp.ndarray,  # int32 [B, S] — row b valid in [0, hist_len[b])
    hist_len: jnp.ndarray,  # int32 [B]
    k: int,
    ngram: int = 3,
    min_ngram: int = 1,
):
    """Jittable batched prompt-lookup drafting — the device half of what
    makes speculative decoding CHUNKABLE (engine.spec_decode_chunk): with
    the drafter on device, R verify steps scan inside one dispatch and the
    host syncs once per chunk instead of once per step (the measured
    killer on tunneled chips — module docstring).

    Same policy as ``prompt_lookup_draft``: longest n first (ngram down to
    min_ngram), most recent earlier occurrence of the row's last n-gram
    wins, continuation clamped to the valid history. Returns
    ``(drafts [B, k] int32, d [B] int32)`` — row b proposes d[b] <= k
    tokens (cols >= d[b] are zeroed). Cost: sum(n) shifted [B, S]
    compares + reductions — noise next to one model forward."""
    B, S = history.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    best_s = jnp.full((B,), -1, jnp.int32)
    best_n = jnp.zeros((B,), jnp.int32)
    for n in range(ngram, min_ngram - 1, -1):
        # tail[b, i] = history[b, hist_len[b] - n + i]
        ti = hist_len[:, None] - n + jnp.arange(n, dtype=jnp.int32)[None, :]
        tail = jnp.take_along_axis(history, jnp.maximum(ti, 0), axis=1)
        m = jnp.ones((B, S), bool)
        for i in range(n):
            # history[b, s + i] for all s — roll's wrap-around entries sit
            # at s > hist_len - n - 1 and are masked below.
            m &= jnp.roll(history, -i, axis=1) == tail[:, i : i + 1]
        m &= pos[None, :] <= hist_len[:, None] - n - 1
        m &= hist_len[:, None] > n
        s_n = jnp.max(jnp.where(m, pos[None, :], -1), axis=1)
        take = (best_n == 0) & (s_n >= 0)
        best_s = jnp.where(take, s_n, best_s)
        best_n = jnp.where(take, n, best_n)
    start = best_s + best_n  # first continuation position
    di = start[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    drafts = jnp.take_along_axis(
        history, jnp.clip(di, 0, S - 1), axis=1
    )
    d = jnp.where(best_n > 0, jnp.clip(hist_len - start, 0, k), 0)
    drafts = jnp.where(
        jnp.arange(k, dtype=jnp.int32)[None, :] < d[:, None], drafts, 0
    )
    return drafts, d


def prompt_lookup_draft(
    history: Sequence[int], k: int, ngram: int = 3, min_ngram: int = 1
) -> List[int]:
    """Propose up to ``k`` tokens by matching the last n-gram of ``history``
    against its earlier occurrences (longest n first, most recent match
    wins). Returns [] when nothing matches."""
    h = list(history)
    n_hist = len(h)
    for n in range(ngram, min_ngram - 1, -1):
        if n_hist <= n:
            continue
        tail = h[-n:]
        # scan right-to-left for the most recent earlier occurrence
        for s in range(n_hist - n - 1, -1, -1):
            if h[s : s + n] == tail:
                cont = h[s + n : s + n + k]
                if cont:
                    return cont
                break
    return []


class SpeculativeTextGenerator:
    """Greedy batch completion with prompt-lookup speculative decoding.

    Same contract as TextGenerator.generate_tokens(temperature=0) — the
    token streams are identical — but repetitive/extractive prompts decode
    several tokens per model forward."""

    def __init__(self, engine: InferenceEngine, tokenizer=None,
                 draft_len: int = 4, ngram: int = 3,
                 chunk_steps: int = 8):
        """``chunk_steps > 0`` (default): DEVICE-side drafting + a
        ``chunk_steps``-deep verify scan per dispatch
        (engine.spec_decode_chunk) — one host sync per chunk, the
        tunnel-tolerant form. ``chunk_steps=0``: the legacy host-drafted
        per-step loop (one sync per verify step; kept as the simplest
        reference implementation and for A/B)."""
        assert engine.dp == 1, "speculative decoding: dp meshes unsupported"
        self.engine = engine
        self.tokenizer = tokenizer
        self.draft_len = draft_len
        self.ngram = ngram
        self.chunk_steps = chunk_steps
        self._tg = TextGenerator(engine, tokenizer)  # eos wiring + decode
        self.eos_ids = self._tg.eos_ids

    def generate_tokens(
        self,
        prompt_tokens: Sequence[Sequence[int]],
        max_gen_len: int = 128,
        temperature: float = 0.0,
        echo: bool = False,
    ) -> List[CompletionOutput]:
        assert temperature == 0.0, (
            "speculative decoding is greedy-only (temperature=0); "
            "rejection resampling for temperature>0 is not implemented"
        )
        eng = self.engine
        B = len(prompt_tokens)
        K = self.draft_len + 1  # chunk = [current token | drafts]
        lens = [len(t) for t in prompt_tokens]
        max_total = [
            min(l + max_gen_len, eng.config.max_seq_len) for l in lens
        ]
        slots = eng.admit_requests(max_total, prompts=prompt_tokens)
        sampling = _make_sampling(B, 0.0, 1.0, 0)
        first_tok, _, _, _ = eng.prefill(prompt_tokens, sampling, slots)

        if self.chunk_steps > 0:
            return self._finish(
                prompt_tokens, lens, max_total, echo,
                self._run_chunked(
                    prompt_tokens, first_tok, slots, max_total
                ),
            )

        history = [list(p) + [int(first_tok[i])]
                   for i, p in enumerate(prompt_tokens)]
        out_tokens: List[List[int]] = [[int(first_tok[i])] for i in range(B)]
        cur = [int(t) for t in first_tok]  # current next-token per row
        done = [
            cur[i] in self.eos_ids or lens[i] + 1 >= max_total[i]
            for i in range(B)
        ]
        while not all(done):
            chunk = np.zeros((B, K), np.int32)
            chunk_lens = np.zeros((B,), np.int32)
            for i in range(B):
                if done[i]:
                    continue
                # room: tokens the pool may still take is bounded by the
                # reservation; generation stops at max_total[i] total.
                room = max_total[i] - len(history[i])
                if room <= 0:
                    done[i] = True
                    continue
                # A step emits up to len(drafts)+1 tokens (accepted drafts
                # plus the bonus); clamp so the row can never overshoot its
                # max_total budget.
                drafts = prompt_lookup_draft(
                    history[i], min(self.draft_len, room - 1), self.ngram
                )
                chunk[i, 0] = cur[i]
                c = 1 + len(drafts)
                chunk[i, 1:c] = drafts
                chunk_lens[i] = c
            if not chunk_lens.any():
                break
            emit, n_emit, next_tok = eng.spec_verify(
                slots, chunk, chunk_lens
            )
            for i in range(B):
                if done[i] or chunk_lens[i] == 0:
                    continue
                row = [int(t) for t in emit[i, : int(n_emit[i])]]
                for t in row:
                    out_tokens[i].append(t)
                    history[i].append(t)
                    if t in self.eos_ids or (
                        len(history[i]) >= max_total[i]
                    ):
                        done[i] = True
                        break
                cur[i] = int(next_tok[i])

        eng.release_slots(slots, max_total)
        return self._finish(prompt_tokens, lens, max_total, echo,
                            out_tokens)

    def _run_chunked(self, prompt_tokens, first_tok, slots, max_total):
        """Device-side chunked loop: history/drafting/verify/termination
        all live on device; the host fetches each chunk's emitted tokens
        once (engine.spec_decode_chunk). Releases the slots before
        returning."""
        import jax.numpy as jnp

        eng = self.engine
        B = len(prompt_tokens)
        S = eng.config.max_seq_len
        hist = np.zeros((B, S), np.int32)
        hl = np.zeros((B,), np.int32)
        for i, p in enumerate(prompt_tokens):
            hist[i, : len(p)] = p
            hist[i, len(p)] = int(first_tok[i])
            hl[i] = len(p) + 1
        cur = np.asarray(first_tok, np.int32)
        done = np.asarray([
            int(cur[i]) in self.eos_ids or hl[i] >= max_total[i]
            for i in range(B)
        ], bool)
        out_tokens = [[int(first_tok[i])] for i in range(B)]
        history, hist_len, cur_d, done_d = (
            jnp.asarray(hist), jnp.asarray(hl), jnp.asarray(cur),
            jnp.asarray(done),
        )
        while not done.all():
            history, hist_len, cur_d, done_d, emits, keeps, done = (
                eng.spec_decode_chunk(
                    slots, history, hist_len, cur_d, done_d, max_total,
                    n_steps=self.chunk_steps, draft_len=self.draft_len,
                    ngram=self.ngram,
                )
            )
            for s in range(emits.shape[0]):
                for i in range(B):
                    out_tokens[i].extend(
                        int(t) for t in emits[s, i, : int(keeps[s, i])]
                    )
        eng.release_slots(slots, max_total)
        return out_tokens

    def _finish(self, prompt_tokens, lens, max_total, echo, out_tokens):
        results = []
        for i in range(len(prompt_tokens)):
            toks = out_tokens[i][: max_total[i] - lens[i]]
            toks = self._tg._truncate_at_eos(toks)
            finish = (
                "stop" if (toks and toks[-1] in self.eos_ids) else "length"
            )
            ids = (list(prompt_tokens[i]) if echo else []) + toks
            results.append(
                CompletionOutput(
                    token_ids=ids, text=self._tg._decode(ids),
                    finish_reason=finish,
                )
            )
        return results
