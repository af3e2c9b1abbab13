"""Decode-step anatomy: make the per-step cost breakdown SUM to the measured
step time (VERDICT r3 weak #2: the round-3 docs claimed ~3.7 ms of parts for
a measured 6.28 ms step at the int4+int8KV bs=12 config — 40% unaccounted).

Method: time the full engine decode chunk per step, then time jitted
SUBGRAPHS of the step in isolation (same shapes, same weights):

  matmuls      — the four projection matmuls + unembed on [B, H] activations
                 through the real qeinsum path (packed-int4 Pallas kernel)
  attention    — paged decode attention per layer (int8 pool) + rope + norms
  kv/alloc     — alloc_decode + post-scan kv_write_decode_all
  sample       — approx top-p sampler + logprob gather on [B, V] logits
  step         — one full decoder_decode + sample (no chunk scan)
  chunk/step   — the engine's scanned chunk, amortized per step

Run on the real chip:  python benchmarks/decode_anatomy.py [--steps 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--model", default="3b", choices=["3b", "1b"])
    args = ap.parse_args()

    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.sampling import (
        SamplingParams, log_softmax_gather, sample,
    )
    from lite_llama_tpu.models.decoder import (
        AttnContext, decoder_decode, init_decoder_params,
    )
    from lite_llama_tpu.models.presets import llama32_1b, llama32_3b
    from lite_llama_tpu.quant.qtensor import qeinsum, quantize_decoder_params
    from lite_llama_tpu import ops

    preset = llama32_3b if args.model == "3b" else llama32_1b
    cfg = preset(dtype=jnp.bfloat16, max_seq_len=2048)
    B = args.batch
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    params = quantize_decoder_params(
        params, jnp.int4, drop_originals=True, group_size=128,
        sigma_ffn=True,
    )
    engine = InferenceEngine(
        cfg, params, page_size=64, max_reqs=B,
        num_pages=B * (cfg.max_seq_len // 64) + 8,
        decode_chunk=32, kv_quant="int8",
    )
    del params
    prompts = [list(range(2, 34)) for _ in range(B)]
    samp = SamplingParams.make(B, temperature=0.6, top_p=0.9)
    slots = engine.admit_requests([1024] * B)
    engine.prefill(prompts, samp, slots)

    rows = {}

    # -- full chunk, amortized per step -----------------------------------
    sess = engine.start_decode_session(
        slots, np.full((B,), 5, np.int32), np.zeros((B,), bool),
        [1024] * B, samp,
    )
    n = engine.decode_chunk

    def run_chunk():
        return engine.collect_decode_chunk(
            engine.dispatch_decode_chunk(sess, n)
        )[0]

    t_chunk = timeit(run_chunk, iters=max(4, args.steps // n))
    rows["chunk/step"] = t_chunk / n
    print(f"chunk/step {rows['chunk/step']:.3f} ms", flush=True)

    # -- one bare decode step (forward + sample, no scan/alloc) ------------
    cache = engine.cache
    req = jnp.asarray(slots, jnp.int32)
    ctx = AttnContext(
        table_rows=cache.page_table[req],
        seq_lens=cache.seq_lens[req],
        start_pos=cache.seq_lens[req] - 1,
        chunk_lens=jnp.ones((B,), jnp.int32),
        active=jnp.ones((B,), bool),
    )
    tok = jnp.full((B,), 5, jnp.int32)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step_fwd(params, pages, tok):
        logits, kv = decoder_decode(params, cfg, pages, ctx, input_ids=tok)
        return logits

    rows["fwd(step, no sample)"] = timeit(
        functools.partial(step_fwd, engine.params, cache.kv_pages), tok
    )
    print(f"fwd {rows['fwd(step, no sample)']:.3f} ms", flush=True)

    @jax.jit
    def step_full(params, pages, tok, key):
        logits, kv = decoder_decode(params, cfg, pages, ctx, input_ids=tok)
        t = sample(logits, key, samp, mode="approx")
        return t, log_softmax_gather(logits, t)

    rows["fwd+sample"] = timeit(
        functools.partial(step_full, engine.params, cache.kv_pages), tok, key
    )
    print(f"fwd+sample {rows['fwd+sample']:.3f} ms", flush=True)

    # -- matmuls only -------------------------------------------------------
    L = cfg.num_hidden_layers
    lay = engine.params["layers"]
    x = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)

    import dataclasses as dc

    def matmuls(x, li):
        lp = {k: (dc.replace(v, layer=li) if hasattr(v, "q") else v)
              for k, v in lay.items()}
        q = qeinsum("bh,hnd->bnd", x, lp["wq"]) if "wq" in lp else None
        kv = qeinsum("bh,hcnd->bcnd", x, lp["wkv"]) if "wkv" in lp else None
        attn = jnp.zeros(
            (B, cfg.num_attention_heads, cfg.head_dim), jnp.bfloat16
        )
        o = qeinsum("bnd,ndh->bh", attn, lp["o_proj"])
        gu = qeinsum("bh,chi->bci", x, lp["gate_up_proj"])
        dn = qeinsum(
            "bi,ih->bh", gu[:, 0] * gu[:, 1], lp["down_proj"]
        )
        return o + dn + (0 if q is None else q.sum() * 0)

    @jax.jit
    def all_layers_matmuls(x):
        def body(c, li):
            return c + matmuls(x, li), None
        out, _ = jax.lax.scan(
            body, jnp.zeros((B, cfg.hidden_size), jnp.bfloat16),
            jnp.arange(L, dtype=jnp.int32),
        )
        return out

    rows["matmuls (all layers)"] = timeit(all_layers_matmuls, x)
    print(f"matmuls {rows['matmuls (all layers)']:.3f} ms", flush=True)

    # -- unembed ------------------------------------------------------------
    from lite_llama_tpu.models.decoder import _unembed

    @jax.jit
    def unembed(x):
        return _unembed(engine.params, cfg, x)

    rows["unembed"] = timeit(unembed, x)
    print(f"unembed {rows['unembed']:.3f} ms", flush=True)

    # -- attention only (all layers) ----------------------------------------
    k_new = jnp.zeros(
        (B, cfg.num_key_value_heads, cfg.head_dim), jnp.bfloat16
    )
    qh = jnp.zeros((B, cfg.num_attention_heads, cfg.head_dim), jnp.bfloat16)

    @jax.jit
    def attn_all_layers(qh, pages):
        def body(c, li):
            a = ops.paged_decode_attention(
                qh, pages, li, ctx.table_rows, ctx.seq_lens,
                None, None, k_new=k_new, v_new=k_new,
            )
            return c + a, None
        out, _ = jax.lax.scan(
            body, jnp.zeros_like(qh), jnp.arange(L, dtype=jnp.int32)
        )
        return out

    rows["attention (all layers)"] = timeit(attn_all_layers, qh, cache.kv_pages)
    print(f"attention {rows['attention (all layers)']:.3f} ms", flush=True)

    # -- sampling / logprobs --------------------------------------------------
    logits = jnp.zeros((B, cfg.vocab_size), jnp.float32)

    @jax.jit
    def samp_only(logits, key):
        t = sample(logits, key, samp, mode="approx")
        return t, log_softmax_gather(logits, t)

    rows["sample+logprob"] = timeit(samp_only, logits, key)
    print(f"sample {rows['sample+logprob']:.3f} ms", flush=True)

    # -- kv write + alloc ----------------------------------------------------
    from lite_llama_tpu.executor.kv_cache import alloc_decode, kv_write_decode_all

    k_all = jnp.zeros(
        (L, B, cfg.num_key_value_heads, cfg.head_dim), jnp.bfloat16
    )

    @jax.jit
    def kv_ops(cache):
        c = alloc_decode(cache, req, jnp.ones((B,), bool))
        pages = kv_write_decode_all(
            c.kv_pages, k_all, k_all, ctx.table_rows, ctx.start_pos,
            jnp.ones((B,), bool),
        )
        return c.seq_lens, pages.pages.shape

    rows["alloc+kv_write"] = timeit(lambda c: kv_ops(c)[0], cache)
    print(f"alloc+kv {rows['alloc+kv_write']:.3f} ms", flush=True)

    print(f"\nconfig: {args.model} int4(sigma,g128)+int8KV  B={B}  "
          f"backend={jax.default_backend()}")
    print(f"{'component':28s} {'ms':>9s}")
    for k, v in rows.items():
        print(f"{k:28s} {v:9.3f}")
    acc = (rows["matmuls (all layers)"] + rows["attention (all layers)"]
           + rows["unembed"] + rows["sample+logprob"]
           + rows["alloc+kv_write"])
    print(f"{'sum of parts':28s} {acc:9.3f}")
    print(f"{'unaccounted vs chunk/step':28s} "
          f"{rows['chunk/step'] - acc:9.3f}")


if __name__ == "__main__":
    main()
