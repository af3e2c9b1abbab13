"""User-facing generation APIs.

Capability parity with the reference's generation layer (SURVEY.md §2.4):
- ``GenerateText.text_completion``            (lite_llama/generate.py:190)
- ``GenerateStreamText.text_completion_stream`` (generate_stream.py:222)
- per-token logprobs                          (generete_with_probs.py:57)

TPU-native delta: generation is driven through the engine's chunked on-device
decode (one host sync per chunk, not per token); the streaming API trades
chunk size down (default 4) for latency while the batch API uses large chunks
for throughput. Detokenization is incremental per request, like the
reference's last_yielded_pos bookkeeping (generate_stream.py:138-213).
"""

from __future__ import annotations

import dataclasses
from typing import Generator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..executor.engine import InferenceEngine
from .sampling import SamplingParams, log_softmax_gather


@dataclasses.dataclass
class CompletionOutput:
    token_ids: List[int]
    text: Optional[str] = None
    logprobs: Optional[List[float]] = None
    finish_reason: str = "length"  # or "stop"


# Special tags never allowed inside user-supplied chat content
# (reference generete_with_probs.py:33-37).
SPECIAL_TAGS = ["[INST]", "[/INST]", "<<SYS>>", "<</SYS>>"]
UNSAFE_ERROR = "Error: special tags are not allowed as part of the prompt."


def _make_sampling(B, temperature, top_p, top_k) -> SamplingParams:
    return SamplingParams.make(B, temperature=temperature, top_p=top_p, top_k=top_k)


class TextGenerator:
    """Batch + streaming completion over an InferenceEngine."""

    def __init__(self, engine: InferenceEngine, tokenizer=None):
        self.engine = engine
        self.tokenizer = tokenizer
        eos = engine.config.eos_token_ids
        if not eos and tokenizer is not None and tokenizer.eos_token_id is not None:
            eos = [tokenizer.eos_token_id]
            engine._eos_array = jnp.asarray(eos, jnp.int32)
        self.eos_ids = set(eos or [])

    # -- token-level ------------------------------------------------------
    def generate_tokens(
        self,
        prompt_tokens: Sequence[Sequence[int]],
        max_gen_len: int = 128,
        temperature: float = 0.6,
        top_p: float = 0.9,
        top_k: int = 0,
        echo: bool = False,
        logprobs: bool = False,
    ) -> List[CompletionOutput]:
        """Non-streaming batch completion (reference generate.py:90-188;
        per-token logprobs per generete_with_probs.py:57)."""
        eng = self.engine
        B = len(prompt_tokens)
        lens = [len(t) for t in prompt_tokens]
        max_total = [
            min(l + max_gen_len, eng.config.max_seq_len) for l in lens
        ]
        slots = eng.admit_requests(max_total, prompts=prompt_tokens)
        sampling = _make_sampling(B, temperature, top_p, top_k)

        first_tok, lens_arr, _, lp0 = eng.prefill(prompt_tokens, sampling, slots)
        out_tokens = [[int(first_tok[i])] for i in range(B)]
        out_lps = [[float(lp0[i])] for i in range(B)]
        done_host = np.asarray(
            [t in self.eos_ids or lens[i] + 1 >= max_total[i]
             for i, t in enumerate(first_tok)]
        )
        tok = jnp.asarray(first_tok)
        done = jnp.asarray(done_host)
        steps_left = max(mt - l - 1 for mt, l in zip(max_total, lens))
        if steps_left > 0 and not bool(done_host.all()):
            # ONE decode call for the whole budget: the engine chunks
            # internally (and early-exits when all rows finish), so the
            # batch layout + sampling arrays upload once instead of once
            # per chunk — per-chunk host->device transfers measurably
            # dominated generation overhead on tunneled devices.
            tok, done, toks, lps = eng.decode(
                slots, tok, done, max_total, sampling, n_steps=steps_left
            )
            for i in range(B):
                if not done_host[i]:
                    out_tokens[i].extend(int(t) for t in toks[:, i])
                    out_lps[i].extend(float(v) for v in lps[:, i])
            done_host = np.asarray(done)

        eng.release_slots(slots, max_total)
        results = []
        for i in range(B):
            # Trim chunk-overshoot pads, then cut at eos.
            toks_i = out_tokens[i][: max_total[i] - lens[i]]
            toks_i = self._truncate_at_eos(toks_i)
            finish = "stop" if (toks_i and toks_i[-1] in self.eos_ids) else "length"
            ids = (list(prompt_tokens[i]) if echo else []) + toks_i
            lps_i = None
            if logprobs:
                lps_i = out_lps[i][: len(toks_i)]
                if echo:
                    # Keep token_ids and logprobs index-aligned: prompt
                    # positions get None (prompt logprobs are not computed —
                    # prefill unembeds only the last position).
                    lps_i = [None] * len(prompt_tokens[i]) + lps_i
            results.append(
                CompletionOutput(
                    token_ids=ids,
                    text=self._decode(ids),
                    logprobs=lps_i,
                    finish_reason=finish,
                )
            )
        return results

    def stream_tokens(
        self,
        prompt_tokens: Sequence[Sequence[int]],
        max_gen_len: int = 128,
        temperature: float = 0.6,
        top_p: float = 0.9,
        top_k: int = 0,
        chunk: int = 4,
    ) -> Generator[List[List[int]], None, None]:
        """Streaming: yields the newly generated token ids per request after
        every chunk (reference generate_stream.py:93-220)."""
        eng = self.engine
        B = len(prompt_tokens)
        lens = [len(t) for t in prompt_tokens]
        max_total = [min(l + max_gen_len, eng.config.max_seq_len) for l in lens]
        slots = eng.admit_requests(max_total, prompts=prompt_tokens)
        sampling = _make_sampling(B, temperature, top_p, top_k)
        try:
            first_tok, _, _, lp0 = eng.prefill(prompt_tokens, sampling, slots)
            done_host = np.asarray(
                [t in self.eos_ids or lens[i] + 1 >= max_total[i]
                 for i, t in enumerate(first_tok)]
            )
            produced = [1] * B
            yield [[int(first_tok[i])] for i in range(B)]
            tok = jnp.asarray(np.asarray(first_tok))
            done = jnp.asarray(done_host)
            steps_left = max(mt - l - 1 for mt, l in zip(max_total, lens))
            while steps_left > 0 and not bool(done_host.all()):
                n = min(chunk, steps_left)
                tok, done, toks, lps = eng.decode(
                    slots, tok, done, max_total, sampling, n_steps=n
                )
                new_done = np.asarray(done)
                out = []
                for i in range(B):
                    if done_host[i]:
                        out.append([])
                    else:
                        remaining = max_total[i] - lens[i] - produced[i]
                        row = [int(t) for t in toks[:, i]][:remaining]
                        row = self._truncate_at_eos(row)
                        produced[i] += len(row)
                        out.append(row)
                done_host = new_done
                steps_left -= n
                yield out
        finally:
            eng.release_slots(slots, max_total)

    # -- text-level -------------------------------------------------------
    def text_completion(
        self, prompts: Sequence[str], **kw
    ) -> List[CompletionOutput]:
        assert self.tokenizer is not None, "text API requires a tokenizer"
        toks = [self.tokenizer.encode(p) for p in prompts]
        return self.generate_tokens(toks, **kw)

    def chat_completion(
        self,
        dialogs: Sequence[Sequence[dict]],
        temperature: float = 0.6,
        top_p: float = 0.9,
        max_gen_len: Optional[int] = None,
        logprobs: bool = False,
    ) -> List[dict]:
        """Multi-turn chat completion (reference generete_with_probs.py:314).

        Each dialog is a list of {"role": system|user|assistant,
        "content": str} messages; roles must alternate user/assistant after
        an optional leading system message and end with a user turn. Prompts
        render through the tokenizer's chat template when it has one (the
        HF-native path), else through the model-family prompter. Returns
        ChatPrediction dicts: {"generation": {"role", "content"},
        "tokens"?, "logprobs"?}.
        """
        assert self.tokenizer is not None, "chat API requires a tokenizer"
        if max_gen_len is None:
            max_gen_len = self.engine.config.max_seq_len - 1
        unsafe = [
            any(tag in m["content"] for tag in SPECIAL_TAGS for m in d)
            for d in dialogs
        ]
        prompt_tokens = []
        for dialog in dialogs:
            assert dialog and dialog[-1]["role"] == "user", (
                "last message must be from the user"
            )
            body = dialog[1:] if dialog[0]["role"] == "system" else dialog
            assert all(m["role"] == "user" for m in body[::2]) and all(
                m["role"] == "assistant" for m in body[1::2]
            ), "roles must alternate user/assistant"
            if getattr(self.tokenizer, "chat_template", None):
                ids = self.tokenizer.apply_chat_template(
                    list(dialog), add_generation_prompt=True
                )
            else:
                from ..utils.prompts import get_prompter

                prompter = get_prompter(self.engine.config.model_type)
                if dialog[0]["role"] == "system":
                    prompter.system_prompt = dialog[0]["content"]
                for user_msg, reply in zip(body[::2], body[1::2]):
                    prompter.insert_prompt(user_msg["content"])
                    prompter.update_last_reply(reply["content"])
                text = prompter.insert_prompt(body[-1]["content"])
                ids = self.tokenizer.encode(text)
            prompt_tokens.append(ids)
        outs = self.generate_tokens(
            prompt_tokens,
            max_gen_len=max_gen_len,
            temperature=temperature,
            top_p=top_p,
            logprobs=logprobs,
        )
        preds = []
        for out, is_unsafe in zip(outs, unsafe):
            pred = {
                "generation": {
                    "role": "assistant",
                    "content": UNSAFE_ERROR if is_unsafe else (out.text or ""),
                }
            }
            if logprobs:
                pred["tokens"] = [
                    self.tokenizer.decode([t]) for t in out.token_ids
                ]
                pred["logprobs"] = out.logprobs
            preds.append(pred)
        return preds

    def text_completion_stream(
        self, prompts: Sequence[str], **kw
    ) -> Generator[List[str], None, None]:
        """Yields per-request newly decoded text fragments."""
        assert self.tokenizer is not None
        toks = [self.tokenizer.encode(p) for p in prompts]
        pending: List[List[int]] = [[] for _ in prompts]
        for new in self.stream_tokens(toks, **kw):
            frags = []
            for i, ids in enumerate(new):
                pending[i].extend(ids)
                text = self.tokenizer.decode(pending[i])
                # Hold back incomplete UTF-8 (replacement char at the tail).
                if text and not text.endswith("�"):
                    frags.append(text)
                    pending[i] = []
                else:
                    frags.append("")
            yield frags

    # -- helpers ----------------------------------------------------------
    def _truncate_at_eos(self, ids: List[int]) -> List[int]:
        for j, t in enumerate(ids):
            if t in self.eos_ids:
                return ids[: j + 1]
        return ids

    def _decode(self, ids: List[int]) -> Optional[str]:
        if self.tokenizer is None:
            return None
        stop = [t for t in ids if t not in self.eos_ids]
        return self.tokenizer.decode(stop)
