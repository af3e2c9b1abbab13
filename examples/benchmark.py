"""Inference speed comparison: lite_llama_tpu engine vs HF transformers.

Capability parity with /root/reference/examples/benchmark.py:152
(``compare_inference_speed``): run the same templated prompts through the
engine and through ``transformers`` generate(), report wall-clock, output
tokens, tokens/s, and ms/token for both, plus a sample output comparison.

TPU delta: the honest same-hardware baseline is the XLA-naive JAX decoder
(benchmarks/naive_baseline.py — dense no-donation KV, per-token jit, host
sampling: the moral equivalent of transformers.generate() on this chip),
enabled with ``--naive``. The torch-CPU transformers path (``--hf-model``)
remains available for output-quality comparison but is labeled as a
CROSS-HARDWARE number — it says nothing about engine efficiency.

Usage:
    python examples/benchmark.py <converted_or_hf_ckpt_dir> \
        [--naive] [--hf-model <hf_dir>] [--batch 12] [--max-gen-len 1900]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time
from typing import List, Optional

DEFAULT_PROMPTS = [
    "I believe the meaning of life is",
    "Simply put, the theory of relativity states that",
    "A brief message congratulating the team on the launch:",
    "Roosevelt was the first president of the United States, he has",
    "Translate English to French: cheese =>",
    "Explain how photosynthesis works in two sentences.",
    "Write a haiku about the ocean.",
    "The capital of Japan is",
    "List three uses for a paperclip.",
    "In a distant future, humanity has",
    "The recipe for a perfect omelette starts with",
    "Quantum computers differ from classical computers because",
]


def engine_inference(
    ckpt_dir: str,
    prompts: List[str],
    temperature: float,
    top_p: float,
    max_gen_len: int,
    max_seq_len: int,
):
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.utils.common import count_tokens

    engine = InferenceEngine.build(
        ckpt_dir, dtype=jnp.bfloat16, max_reqs=len(prompts), max_seq_len=max_seq_len
    )
    tokenizer = AutoTokenizer.from_pretrained(ckpt_dir)
    gen = TextGenerator(engine, tokenizer)

    # Warm-up / compile pass (reference inference.py:54-61).
    gen.text_completion(
        ["Hello World"] * len(prompts),
        temperature=temperature, top_p=top_p, max_gen_len=8,
    )
    jax.block_until_ready(engine.cache.kv_pages)

    start = time.perf_counter()
    outs = gen.text_completion(
        prompts, temperature=temperature, top_p=top_p, max_gen_len=max_gen_len
    )
    jax.block_until_ready(engine.cache.kv_pages)
    elapsed = time.perf_counter() - start
    texts = [o.text or "" for o in outs]
    tokens = count_tokens(texts, tokenizer)
    return texts, elapsed, tokens


def transformers_inference(
    hf_model_name: str,
    prompts: List[str],
    temperature: float,
    top_p: float,
    max_gen_len: int,
    device: str = "cpu",
):
    """HF generate() timing (reference examples/benchmark.py:94-149)."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from lite_llama_tpu.utils.common import count_tokens

    tokenizer = AutoTokenizer.from_pretrained(hf_model_name)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.eos_token
    model = AutoModelForCausalLM.from_pretrained(
        hf_model_name, torch_dtype=torch.float32 if device == "cpu" else torch.float16
    ).to(device)
    model.eval()

    enc = tokenizer(prompts, return_tensors="pt", padding=True).to(device)
    with torch.no_grad():  # warm-up
        model.generate(**enc, max_new_tokens=8, do_sample=False)

    start = time.perf_counter()
    with torch.no_grad():
        out = model.generate(
            **enc,
            max_new_tokens=max_gen_len,
            do_sample=temperature > 0,
            temperature=max(temperature, 1e-5),
            top_p=top_p,
            pad_token_id=tokenizer.pad_token_id,
        )
    elapsed = time.perf_counter() - start
    gen_ids = out[:, enc["input_ids"].shape[1] :]
    texts = tokenizer.batch_decode(gen_ids, skip_special_tokens=True)
    tokens = count_tokens(texts, tokenizer)
    return texts, elapsed, tokens


def compare_inference_speed(
    ckpt_dir: str,
    hf_model_name: Optional[str],
    prompts: List[str],
    temperature: float = 0.6,
    top_p: float = 0.9,
    max_gen_len: int = 1900,
    max_seq_len: int = 2048,
    print_result: bool = True,
    skip_hf: bool = False,
    naive: bool = False,
):
    from lite_llama_tpu.utils.common import get_model_type
    from lite_llama_tpu.utils.prompts import get_prompter

    model_type = get_model_type(ckpt_dir)
    prompter = get_prompter(model_type, ckpt_dir)
    templated = []
    for p in prompts:
        templated.append(prompter.insert_prompt(p))
        prompter.reset()

    eng_texts, eng_time, eng_tokens = engine_inference(
        ckpt_dir, templated, temperature, top_p, max_gen_len, max_seq_len
    )
    print(f"lite_llama_tpu inference time: {eng_time:.4f} s")
    print(f"lite_llama_tpu output tokens:  {eng_tokens}")
    print(f"lite_llama_tpu throughput:     {eng_tokens / eng_time:.2f} tokens/s")
    print(
        f"lite_llama_tpu per-token latency: "
        f"{1000 * eng_time / max(eng_tokens, 1):.4f} ms/token"
    )

    if naive:
        # Same-chip XLA-naive baseline (the honest comparison).
        import jax.numpy as jnp
        from benchmarks.naive_baseline import naive_decode_tps
        from lite_llama_tpu.config import load_config
        from lite_llama_tpu.models.decoder import init_decoder_params
        import jax as _jax

        cfg = load_config(ckpt_dir, dtype=jnp.bfloat16, max_seq_len=max_seq_len)
        nparams = init_decoder_params(cfg, _jax.random.PRNGKey(0))
        res = naive_decode_tps(cfg, nparams, bs=len(prompts), prompt_len=32,
                               max_seq=max_seq_len)
        print(f"naive-XLA (same chip) throughput: "
              f"{res['tokens_per_s']:.2f} tokens/s "
              f"({res['ms_per_step']:.2f} ms/step; {res['note']})")
        print(f"engine vs naive-XLA speedup:      "
              f"{eng_tokens / eng_time / res['tokens_per_s']:.2f}x")

    if not skip_hf and hf_model_name:
        print("NOTE: the transformers row below runs torch on CPU — a "
              "cross-hardware sanity/quality check, NOT an efficiency "
              "comparison (use --naive for the same-chip baseline).")
        hf_texts, hf_time, hf_tokens = transformers_inference(
            hf_model_name, templated, temperature, top_p, max_gen_len
        )
        print(f"transformers inference time:   {hf_time:.4f} s")
        print(f"transformers output tokens:    {hf_tokens}")
        print(f"transformers throughput:       {hf_tokens / hf_time:.2f} tokens/s")
        print(
            f"transformers per-token latency: "
            f"{1000 * hf_time / max(hf_tokens, 1):.4f} ms/token"
        )
        if print_result and hf_texts:
            print(f"\n[lite_llama_tpu]: {eng_texts[0][:400]}")
            print(f"\n[transformers]:   {hf_texts[0][:400]}")
    elif print_result and eng_texts:
        print(f"\n[lite_llama_tpu]: {eng_texts[0][:400]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="converted or HF checkpoint dir")
    ap.add_argument("--hf-model", default=None, help="HF dir for the torch side")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--max-gen-len", type=int, default=1900)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--skip-hf", action="store_true")
    ap.add_argument("--naive", action="store_true",
                    help="also run the same-chip XLA-naive baseline")
    args = ap.parse_args()

    prompts = (DEFAULT_PROMPTS * ((args.batch // len(DEFAULT_PROMPTS)) + 1))[
        : args.batch
    ]
    compare_inference_speed(
        args.checkpoint,
        args.hf_model or args.checkpoint,
        prompts,
        temperature=args.temperature,
        top_p=args.top_p,
        max_gen_len=args.max_gen_len,
        max_seq_len=args.max_seq_len,
        skip_hf=args.skip_hf,
        naive=args.naive,
    )


if __name__ == "__main__":
    main()
