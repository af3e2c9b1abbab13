"""Trace-based decode-step anatomy (VERDICT r3 next #4).

Captures a jax.profiler trace of the engine's REAL decode chunk (the
executable serving actually runs) and aggregates device-op durations from
the xprof JSON, grouped by repo source line — so the per-step breakdown
sums to the measured step by construction (standalone micro-jits on a
tunneled device are swamped by the ~25 ms dispatch RTT).

Run: python benchmarks/decode_trace.py [--model 3b|1b] [--batch 12]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--model", default="3b", choices=["3b", "1b"])
    ap.add_argument("--trace-dir", default="/tmp/llt_trace")
    ap.add_argument("--top", type=int, default=28)
    args = ap.parse_args()

    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.generation.sampling import SamplingParams
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.models.presets import llama32_1b, llama32_3b
    from lite_llama_tpu.quant.qtensor import quantize_decoder_params

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
    print("prefill done", flush=True)

    sess = engine.start_decode_session(
        slots, np.full((B,), 5, np.int32), np.zeros((B,), bool),
        [1024] * B, samp,
    )
    n = engine.decode_chunk

    def run_chunk():
        return engine.collect_decode_chunk(
            engine.dispatch_decode_chunk(sess, n)
        )[0]

    run_chunk()  # compile
    t0 = time.perf_counter()
    for _ in range(4):
        run_chunk()
    step_ms = (time.perf_counter() - t0) / (4 * n) * 1000
    print(f"measured chunk step: {step_ms:.3f} ms "
          f"({1000.0 * B / step_ms:.0f} tok/s)", flush=True)

    os.system(f"rm -rf {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir):
        for _ in range(2):
            run_chunk()
    print("trace captured", flush=True)

    # -- parse the xprof trace.json.gz --------------------------------------
    paths = glob.glob(
        os.path.join(args.trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace under {args.trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-op events carry args.source / args.name; host threads don't.
    by_src = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        arga = e.get("args") or {}
        src = arga.get("source")
        if not src and "run_id" not in arga and "source" not in arga:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        # keep only TensorCore op events (they carry a source or an hlo name)
        if src or arga.get("long_name"):
            total += dur
            by_op[name.split(".")[0]] += dur
            if src:
                by_src[src.split(" ")[0]] += dur
    n_steps = 2 * n
    print(f"\ntotal traced device-op time/step: {total / n_steps / 1000:.3f}"
          f" ms over {n_steps} steps")
    print(f"\n== by source line (ms/step) ==")
    for src, dur in by_src.most_common(args.top):
        print(f"{dur / n_steps / 1000:8.4f}  {src}")
    print(f"\n== by op family (ms/step) ==")
    for op, dur in by_op.most_common(args.top):
        print(f"{dur / n_steps / 1000:8.4f}  {op}")


if __name__ == "__main__":
    main()
