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

Deployment caveat (measured): each verify step must fetch the acceptance
result to build the next step's drafts, so per-step host latency is on
the critical path. On THIS repo's tunneled chip (~26 ms/fetch) that makes
spec decoding SLOWER than chunked plain decoding (0.19x measured) — the
feature pays off on direct-attached hardware (per-step sync ~50 us)
with extractive/repetitive workloads, and a device-side drafter + multi-
step verify scan is the known path to tunnel-tolerance.

Greedy (temperature=0) only: temperature>0 needs rejection resampling to
preserve the sampling distribution — out of scope for this layer.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..executor.engine import InferenceEngine
from .generate import CompletionOutput, TextGenerator, _make_sampling


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
                 draft_len: int = 4, ngram: int = 3):
        assert engine.dp == 1, "speculative decoding: dp meshes unsupported"
        self.engine = engine
        self.tokenizer = tokenizer
        self.draft_len = draft_len
        self.ngram = ngram
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
        results = []
        for i in range(B):
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
