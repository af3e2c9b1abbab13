"""W4A8 kernel block-shape A/B on the real chip: stream rate of the packed
matmul at the 3B decode shapes for different output-block ceilings
(LITE_LLAMA_TPU_QMM_BO) and contraction blocks. One in-graph repeat scan
amortizes the ~25 ms tunnel dispatch RTT."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from lite_llama_tpu.ops import qmatmul as qmm
    from lite_llama_tpu.quant.qtensor import quantize

    M = 12
    R = 50  # in-graph repeats
    shapes = [  # (name, C, O, L) — 3B decode matmuls (g128 scales)
        ("wq", 3072, 3072, 28),
        ("wkv", 3072, 2048, 28),
        ("o", 3072, 3072, 28),
        ("gate_up", 3072, 8192, 56),
        ("down", 8192, 3072, 28),
        ("lm_head", 3072, 129024, 1),
    ]
    print(f"BO ceiling = {qmm._BO_MAX}")
    total_ms = 0.0
    total_gb = 0.0
    for name, C, O, L in shapes:
        w = jax.random.normal(
            jax.random.PRNGKey(0), (L, C, O), jnp.float32
        ).astype(jnp.bfloat16)
        qt = quantize(w.astype(jnp.float32), (1,), jnp.int4, group_size=128)
        x = jax.random.normal(jax.random.PRNGKey(1), (M, C), jnp.bfloat16)

        @jax.jit
        def rep(x, q, s):
            def body(c, li):
                y = qmm.quantized_matmul_packed(
                    x, q, s, li % L, out_dtype=jnp.bfloat16
                )
                return c + y[:, :1].astype(jnp.float32), None
            out, _ = jax.lax.scan(
                body, jnp.zeros((M, 1), jnp.float32),
                jnp.arange(R * L if L < 8 else L, dtype=jnp.int32),
            )
            return out

        reps = R * L if L < 8 else L
        out = rep(x, qt.q, qt.scale)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(rep(x, qt.q, qt.scale))
            ts.append(time.perf_counter() - t0)
        ms = np.median(ts) * 1000 / reps
        gb = qt.q.size / L / 1e9  # bytes streamed per call = one layer
        rate = gb / (ms / 1000)
        print(f"{name:9s} C{C} O{O} x{L}: {ms*1000:8.1f} us/call  "
              f"{rate:6.0f} GB/s", flush=True)
        total_ms += ms * L
        total_gb += gb * L  # one step touches every layer once
    print(f"\nper-step total: {total_ms:.3f} ms, {total_gb*1000:.0f} MB, "
          f"{total_gb/(total_ms/1000):.0f} GB/s")


if __name__ == "__main__":
    main()
