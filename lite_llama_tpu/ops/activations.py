"""Activation function library.

Capability parity with the reference's activation kernels
(/root/reference/lite_llama/kernels/activations.py:10-47: gelu via erf, relu,
leaky_relu, tanh, silu — plus quick_gelu used by the CLIP tower). On TPU
these are deliberately plain jnp/jax.nn functions, NOT Pallas kernels: XLA
fuses elementwise chains into the surrounding matmuls, so a pallas_call here
would only add materialization boundaries (the same rationale as the norm /
swiglu ops — ops/__init__.py). The reference itself barely used its Triton
versions (llava.py imports gelu but calls F.gelu, llava.py:10 vs :28).

All functions compute in fp32 and cast back to the input dtype, matching the
reference kernels' fp32 internals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fp32(fn):
    def wrapped(x: jax.Array, *a, **kw) -> jax.Array:
        return fn(x.astype(jnp.float32), *a, **kw).astype(x.dtype)

    wrapped.__name__ = fn.__name__
    return wrapped


@_fp32
def gelu(x):
    """Exact (erf) GELU — reference activations.py:10 (erf formulation)."""
    return 0.5 * x * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


@_fp32
def gelu_tanh(x):
    """tanh-approximated GELU (HF 'gelu_new' / 'gelu_pytorch_tanh')."""
    return jax.nn.gelu(x, approximate=True)


@_fp32
def quick_gelu(x):
    """x * sigmoid(1.702 x) — the CLIP tower's activation
    (models/vision.py)."""
    return x * jax.nn.sigmoid(1.702 * x)


@_fp32
def relu(x):
    return jnp.maximum(x, 0.0)


@_fp32
def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


@_fp32
def tanh(x):
    return jnp.tanh(x)


@_fp32
def silu(x):
    return x * jax.nn.sigmoid(x)


# HF config `hidden_act` name -> callable (reference kernels/others/
# activation_layers.py wrapped HF ACT2FN the same way).
ACT2FN = {
    "gelu": gelu,
    "gelu_new": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": relu,
    "leaky_relu": leaky_relu,
    "tanh": tanh,
    "silu": silu,
    "swish": silu,
}
