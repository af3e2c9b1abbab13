"""Wall-clock dp-scaling measurement — VERDICT r2 next #1 (second half).

Measures decode wall-time for (dp=2, tp=4) at batch 2B vs (dp=1, tp=4) at
batch B on the 8-virtual-CPU-device mesh. What it can assert depends on the
host: on a multi-core machine the dp groups execute concurrently and
throughput must scale (>=1.7x); on a single-core host (this environment —
the verify notes record nproc=1) every virtual device shares one core, so
dp=2 at 2x batch necessarily costs ~2x wall-clock — the assertion then is
that the dp=2 step does the DOUBLED batch in one step WITHOUT pathological
overhead (ratio stays near the serialized 2x, not 3-4x), i.e. dp adds no
per-step cost beyond its share of compute. The compile-level
per-device-FLOPs proof (test_sharding.py) plus the 2-process execution test
(test_multihost.py) carry the rest; real >=85% DCN scaling needs two
physical hosts (BASELINE.md:39).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.config import LlamaConfig
from lite_llama_tpu.executor.engine import InferenceEngine
from lite_llama_tpu.generation.generate import _make_sampling
from lite_llama_tpu.models.decoder import init_decoder_params
from lite_llama_tpu.parallel.shardings import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg():
    # Large enough that a decode step is compute-dominated (not dispatch):
    # ~50M params of matmul per step at hidden 256.
    return LlamaConfig(
        hidden_size=256, intermediate_size=512, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=512,
        max_seq_len=256, dtype=jnp.float32, eos_token_id=None,
    )


def _decode_wall_s(engine, bs: int, n_steps: int) -> float:
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 512, size=8).tolist() for _ in range(bs)]
    sampling = _make_sampling(bs, 0.0, 1.0, 0)
    # Room for prompt + warm-up (8 steps) + measured steps: otherwise the
    # tail of the measured chunk runs frozen at the stop length and the
    # reported tok/s silently counts pad emissions.
    max_total = [8 + 8 + n_steps + 1] * bs
    slots = engine.admit_requests(max_total)
    first, _, _, _ = engine.prefill(prompts, sampling, slots)
    tok = jnp.asarray(first)
    done = jnp.zeros((bs,), bool)
    # Warm-up chunk compiles the decode graph for this (B, chunk) shape.
    engine.decode(slots, tok, done, max_total, sampling, n_steps=8)
    t0 = time.perf_counter()
    engine.decode(slots, tok, done, max_total, sampling, n_steps=n_steps)
    dt = time.perf_counter() - t0
    engine.release_slots(slots, max_total)
    return dt


@pytest.mark.slow
def test_dp2_wallclock_scaling():
    cfg = _cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    B, steps = 4, 64

    e1 = InferenceEngine(
        cfg, params, page_size=16, max_reqs=2 * B, num_pages=128,
        decode_chunk=8, mesh=make_mesh(tp=4, dp=1),
    )
    t1 = _decode_wall_s(e1, B, steps)

    e2 = InferenceEngine(
        cfg, params, page_size=16, max_reqs=2 * B, num_pages=128,
        decode_chunk=8, mesh=make_mesh(tp=4, dp=2),
    )
    t2 = _decode_wall_s(e2, 2 * B, steps)

    tput1 = B * steps / t1
    tput2 = 2 * B * steps / t2
    ratio = tput2 / tput1
    print(f"\ndp1 tput={tput1:.1f} tok/s, dp2(2x batch) tput={tput2:.1f} "
          f"tok/s, ratio={ratio:.2f}, cores={os.cpu_count()}")
    if (os.cpu_count() or 1) >= 8:
        # Real concurrency available: dp=2 must scale.
        assert ratio >= 1.7, (tput1, tput2)
    else:
        # Single/few-core host: devices serialize, so doubling the batch
        # across dp=2 should land near 1x throughput (2x wall for 2x work).
        # Guard against dp adding pathological per-step overhead.
        assert ratio >= 0.6, (tput1, tput2)
