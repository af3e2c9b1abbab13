"""Multimodal (LLaVA) generation.

Capability parity with the reference's ``LlavaGeneratorStream``
(/root/reference/lite_llama/llava_generate_stream.py:76-342):
``tokenizer_image_token`` splits on <image> and splices the image token id
(:23-73); images are preprocessed and passed to the multimodal prefill; decode
streams through the plain LM path with positions offset by the expanded
length (:212-225 — handled by the engine's seq_lens here).
"""

from __future__ import annotations

from typing import Generator, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..executor.llava_engine import LlavaEngine
from ..utils.image import process_images
from .generate import TextGenerator, _make_sampling


def tokenizer_image_token(
    prompt: str, tokenizer, image_token_id: int, placeholder: str = "<image>"
) -> List[int]:
    """Tokenize text around <image> placeholders and splice the image token id
    (reference llava_generate_stream.py:23-73)."""
    chunks = prompt.split(placeholder)
    ids: List[int] = []
    for i, chunk in enumerate(chunks):
        part = tokenizer.encode(chunk, add_special_tokens=(i == 0))
        ids.extend(part)
        if i < len(chunks) - 1:
            ids.append(image_token_id)
    return ids


class LlavaTextGenerator(TextGenerator):
    """Streaming/batch completion over a LlavaEngine with image inputs."""

    engine: LlavaEngine

    def stream_tokens_multimodal(
        self,
        prompt_tokens: Sequence[Sequence[int]],  # raw, 1 <image> per request
        pixel_values: Optional[np.ndarray],
        max_gen_len: int = 128,
        temperature: float = 0.6,
        top_p: float = 0.9,
        top_k: int = 0,
        chunk: int = 4,
    ) -> Generator[List[List[int]], None, None]:
        eng = self.engine
        B = len(prompt_tokens)
        exp_lens = eng.expanded_lens(prompt_tokens)
        max_total = [
            min(l + max_gen_len, eng.config.max_seq_len) for l in exp_lens
        ]
        slots = eng.admit_requests(max_total)
        sampling = _make_sampling(B, temperature, top_p, top_k)
        try:
            first_tok, lens, _, lp0 = eng.prefill_multimodal(
                prompt_tokens, pixel_values, sampling, slots
            )
            done_host = np.asarray(
                [int(t) in self.eos_ids or exp_lens[i] + 1 >= max_total[i]
                 for i, t in enumerate(first_tok)]
            )
            produced = [1] * B
            yield [[int(first_tok[i])] for i in range(B)]
            tok = jnp.asarray(np.asarray(first_tok))
            done = jnp.asarray(done_host)
            steps_left = max(mt - l - 1 for mt, l in zip(max_total, exp_lens))
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
                        remaining = max_total[i] - exp_lens[i] - produced[i]
                        row = [int(t) for t in toks[:, i]][:remaining]
                        row = self._truncate_at_eos(row)
                        produced[i] += len(row)
                        out.append(row)
                done_host = new_done
                steps_left -= n
                yield out
        finally:
            eng.release_slots(slots, max_total)

    def text_completion_stream_mm(
        self,
        prompts: Sequence[str],
        image_items: Sequence,  # paths / PIL images / base64, one per prompt
        **kw,
    ) -> Generator[List[str], None, None]:
        assert self.tokenizer is not None
        img_id = self.engine.config.image_token_index
        toks = [
            tokenizer_image_token(p, self.tokenizer, img_id) for p in prompts
        ]
        px = (
            process_images(
                image_items, self.engine.config.vision_config.image_size
            )
            if image_items
            else None
        )
        pending: List[List[int]] = [[] for _ in prompts]
        for new in self.stream_tokens_multimodal(toks, px, **kw):
            frags = []
            for i, ids in enumerate(new):
                pending[i].extend(ids)
                text = self.tokenizer.decode(pending[i])
                if text and not text.endswith("�"):
                    frags.append(text)
                    pending[i] = []
                else:
                    frags.append("")
            yield frags
