"""Fused residual-add + RMSNorm and SwiGLU — Pallas TPU kernels.

Kernel-inventory parity with the reference's Triton norm/activation set
(/root/reference/lite_llama/kernels/skip_rmsnorm.py:118-225 and swiglu.py:53):
fp32 internal math, residual written back fused with the add.

NOTE on defaults: the model path (ops/__init__.py) intentionally routes norms
and swiglu to the pure-XLA forms — on TPU, XLA fuses these elementwise chains
into the surrounding matmuls, and a pallas_call here would *add* materialization
boundaries. These kernels exist as standalone fused implementations (tested
against the refs) for use where a fusion boundary already exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256


def _rms_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _skip_rms_kernel(x_ref, r_ref, w_ref, o_ref, res_ref, *, eps: float):
    s = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    res_ref[:] = s.astype(res_ref.dtype)
    var = jnp.mean(s * s, axis=-1, keepdims=True)
    o_ref[:] = (s * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _swiglu_kernel(g_ref, u_ref, o_ref):
    g = g_ref[:].astype(jnp.float32)
    o_ref[:] = (g * jax.nn.sigmoid(g) * u_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _row_grid(x2, H, interpret):
    n = x2.shape[0]
    br = min(ROW_BLOCK, n)
    # Pad rows to a block multiple.
    pad = (-n) % br
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2, br, x2.shape[0] // br


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def rms_norm(x, weight, eps=1e-5, interpret=False):
    shape = x.shape
    H = shape[-1]
    x2, br, nblk = _row_grid(x.reshape(-1, H), H, interpret)
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, weight)
    n = 1
    for d in shape[:-1]:
        n *= d
    return out[:n].reshape(shape)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def skip_rms_norm(x, residual, weight, eps=1e-5, interpret=False):
    if residual is None:
        return rms_norm(x, weight, eps, interpret=interpret), x
    shape = x.shape
    H = shape[-1]
    x2, br, nblk = _row_grid(x.reshape(-1, H), H, interpret)
    r2, _, _ = _row_grid(residual.reshape(-1, H), H, interpret)
    out, res = pl.pallas_call(
        functools.partial(_skip_rms_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
        ],
        interpret=interpret,
    )(x2, r2, weight)
    n = 1
    for d in shape[:-1]:
        n *= d
    return out[:n].reshape(shape), res[:n].reshape(shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def swiglu(gate, up, interpret=False):
    shape = gate.shape
    H = shape[-1]
    g2, br, nblk = _row_grid(gate.reshape(-1, H), H, interpret)
    u2, _, _ = _row_grid(up.reshape(-1, H), H, interpret)
    out = pl.pallas_call(
        _swiglu_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(g2.shape, gate.dtype),
        interpret=interpret,
    )(g2, u2)
    n = 1
    for d in shape[:-1]:
        n *= d
    return out[:n].reshape(shape)
