"""Pallas norm/swiglu/prefill-attention kernels vs XLA refs (interpret mode).

Reference recipe: tests/kernels/kernels_test.py test_rmsnorm (:84),
test_fused_ffn (:72), test_flash_attention (:163).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lite_llama_tpu.ops import norms, ref
from lite_llama_tpu.ops.attention_prefill import flash_prefill


@pytest.mark.parametrize("shape", [(4, 7, 128), (300, 256)])
def test_pallas_rms_norm(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), shape[-1:], jnp.float32)
    got = norms.rms_norm(x, w, 1e-5, interpret=True)
    want = ref.rms_norm(x, w, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_skip_rms_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 128), jnp.float32)
    r = jax.random.normal(jax.random.PRNGKey(1), (6, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    got, gres = norms.skip_rms_norm(x, r, w, 1e-5, interpret=True)
    want, wres = ref.skip_rms_norm(x, r, w, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gres), np.asarray(wres), rtol=1e-5, atol=1e-5)


def test_pallas_swiglu():
    g = jax.random.normal(jax.random.PRNGKey(0), (10, 256), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(1), (10, 256), jnp.float32)
    got = norms.swiglu(g, u, interpret=True)
    want = ref.swiglu(g, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "B,S,Nq,Hkv,D,lens,bq,bk",
    [
        (2, 64, 4, 2, 128, [64, 33], 32, 32),
        (1, 128, 8, 8, 64, [100], 64, 64),  # MHA, ragged
        (2, 32, 4, 1, 128, [5, 17], 32, 32),  # MQA, tiny lens
    ],
)
def test_flash_prefill_matches_ref(B, S, Nq, Hkv, D, lens, bq, bk):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Nq, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D), jnp.float32)
    seq_lens = jnp.asarray(lens, jnp.int32)
    want = ref.prefill_attention(q, k, v, seq_lens)
    got = flash_prefill(q, k, v, seq_lens, interpret=True, block_q=bq, block_k=bk)
    # Compare only valid (non-pad) rows.
    for b in range(B):
        n = lens[b]
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), np.asarray(want[b, :n]),
            rtol=2e-5, atol=2e-5, err_msg=f"b={b}",
        )
