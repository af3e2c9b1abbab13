"""Repeat-measure the headline config (W4A8 int4 + sigma-FFN + int8-KV,
Llama-3.2-3B bs=12 gen=1900) N times inside ONE process and print every
sample plus median/spread.

Round-5 motivation (VERDICT r4 weak #1 / next #1): BENCH_r04 captured
2187.7 tok/s for a config the README claimed at 2514 — either run-to-run
variance on the tunneled chip is ~13% or commit 3ad2297 regressed the
kernels. One sample per row cannot distinguish these; this harness can.

Usage: python benchmarks/headline_repeat.py [N] [--gen G] [--quant int4|'' ]
Prints one JSON line with all samples.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    gen_len = int(os.environ.get("BENCH_GEN", 1900))
    quant = os.environ.get("BENCH_QUANT", "int4")
    kv_quant = os.environ.get("BENCH_KV_QUANT", "1") == "1"
    bs = int(os.environ.get("BENCH_BS", 12))
    prompt_len = 25
    chunk = 128

    from bench import build_engine, run_engine
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.models.presets import get_preset
    from lite_llama_tpu.quant.qtensor import quantize_decoder_params

    max_seq = 1 << (prompt_len + gen_len + 1).bit_length()
    max_seq = max(256, min(max_seq, 32768))
    cfg = get_preset("llama-3.2-3b", dtype=jnp.bfloat16, max_seq_len=max_seq)
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
        for _ in range(bs)
    ]
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    if quant:
        qdtypes = {"int8": jnp.int8, "int4": jnp.int4,
                   "fp8": jnp.float8_e4m3fn}
        riffle = os.environ.get("BENCH_RIFFLE", "1") == "1"
        params = quantize_decoder_params(
            params, qdtypes[quant], drop_originals=True,
            group_size=128 if quant == "int4" else None,
            sigma_ffn=quant == "int4" and not riffle,
            riffle=quant == "int4" and riffle,
        )
    engine = build_engine(cfg, params, bs, prompt_len, gen_len, 64, chunk,
                          kv_quant)
    del params
    gc.collect()

    samples = []
    for i in range(n):
        row = run_engine(engine, prompts, gen_len, chunk)
        samples.append(row["tokens_per_s"])
        print(f"[repeat] sample {i}: {row}", file=sys.stderr, flush=True)
    arr = np.asarray(samples)
    out = {
        "config": f"{quant or 'bf16'}{'+int8kv' if kv_quant else ''} "
                  f"bs={bs} gen={gen_len}",
        "samples": samples,
        "median": float(np.median(arr)),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "spread_pct": round(100.0 * (arr.max() - arr.min()) / np.median(arr),
                            2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
