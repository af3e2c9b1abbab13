"""Headline benchmark: Llama-3.2-3B decode throughput at the reference's
north-star config (bs=12, prompt~25, max_gen=1900 — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is tokens/s relative to the reference's published 730.45
tokens/s (lite_llama on an RTX 3090, README.md:118-124).

Weights are randomly initialized (zero-egress environment — no checkpoint
downloads); throughput is architecture- and shape-faithful, which is what the
metric measures. Sampling matches the reference benchmark defaults
(temperature 0.6, top-p 0.9 — examples/benchmark.py).

Env knobs: BENCH_MODEL (preset name), BENCH_BS, BENCH_GEN, BENCH_PROMPT,
BENCH_PAGE, BENCH_CHUNK, BENCH_QUICK=1 (small smoke config),
BENCH_QUANT=int8|fp8 (weight-only quantized matmuls),
BENCH_KV_QUANT=1 (INT8 KV cache).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TOKENS_PER_S = 730.45  # reference north star (BASELINE.md)


def main():
    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.generate import TextGenerator
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.models.presets import get_preset

    quick = os.environ.get("BENCH_QUICK") == "1"
    model = os.environ.get("BENCH_MODEL", "llama-3.2-3b")
    bs = int(os.environ.get("BENCH_BS", 12))
    gen_len = int(os.environ.get("BENCH_GEN", 64 if quick else 1900))
    prompt_len = int(os.environ.get("BENCH_PROMPT", 25))
    page_size = int(os.environ.get("BENCH_PAGE", 64))
    chunk = int(os.environ.get("BENCH_CHUNK", 128))

    max_seq = 1 << (prompt_len + gen_len + 1).bit_length()
    max_seq = max(256, min(max_seq, 4096))
    cfg = get_preset(model, dtype=jnp.bfloat16, max_seq_len=max_seq)
    if quick:
        cfg.num_hidden_layers = 4

    rng = np.random.default_rng(0)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    quant = os.environ.get("BENCH_QUANT", "")
    kv_env = os.environ.get("BENCH_KV_QUANT", "")
    kv_quant = {"1": True, "int8": True, "fp8": "fp8"}.get(kv_env, False)
    if quant:
        from lite_llama_tpu.quant.qtensor import quantize_decoder_params

        qdtype = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
        params = quantize_decoder_params(params, qdtype, drop_originals=True)
    num_pages = bs * ((prompt_len + gen_len + page_size) // page_size + 1) + 16
    engine = InferenceEngine(
        cfg,
        params,
        page_size=page_size,
        max_reqs=bs,
        num_pages=num_pages,
        decode_chunk=chunk,
        kv_quant=kv_quant,
    )
    # Random weights sample EOS at random; disable it so every run measures
    # the same fixed token count (otherwise throughput varies with RNG luck
    # as early-finished slots idle out the batch tail).
    engine._eos_array = jnp.asarray([-1], jnp.int32)
    gen = TextGenerator(engine)
    gen.eos_ids = set()
    prompts = [
        rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
        for _ in range(bs)
    ]

    # Warm-up / compile (same shapes, few steps).
    for o in gen.generate_tokens(
        prompts, max_gen_len=min(gen_len, 2 * chunk + 2),
        temperature=0.6, top_p=0.9,
    ):
        assert o.token_ids
    jax.block_until_ready(engine.cache.kv_pages)

    t0 = time.perf_counter()
    outs = gen.generate_tokens(prompts, max_gen_len=gen_len, temperature=0.6, top_p=0.9)
    jax.block_until_ready(engine.cache.kv_pages)
    dt = time.perf_counter() - t0

    total_out = sum(len(o.token_ids) for o in outs)
    tps = total_out / dt
    ms_per_tok = 1000.0 * dt / max(total_out, 1)
    tag = f" w{quant}" if quant else ""
    tag += f" kv-{'fp8' if kv_quant == 'fp8' else 'int8'}" if kv_quant else ""
    result = {
        "metric": f"tokens/s {model}{tag} bs={bs} gen={gen_len} ({jax.default_backend()})",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TOKENS_PER_S, 3),
        "detail": {
            "total_time_s": round(dt, 3),
            "ms_per_token": round(ms_per_tok, 4),
            "output_tokens": total_out,
            "prompt_len": prompt_len,
            "page_size": page_size,
            "decode_chunk": chunk,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
