"""Fused Pallas kernel: logistic-regression log-posterior + gradient.

BASELINE.json: "vectorized log-prob + leapfrog at roofline per chip".
For the logreg benchmark family the whole potential-energy evaluation —
logits matmul (MXU), Bernoulli terms (VPU), prior, AND the gradient's
second matmul — fuses into ONE kernel over a chain-batched weight block:

    val[c]  = Σ_n [ y_n·l_cn − softplus(l_cn) ] − ‖w_c‖²/(2σ²)
    grad[c] = (y − σ(l_c)) @ X − w_c/σ²          with  l_c = X @ w_c

X stays VMEM-resident per chain block; both matmuls hit the MXU with a
[BC,d]x[d,N] and [BC,N]x[N,d] contraction.  A `jax.custom_vjp` wrapper
exposes a scalar log-posterior whose value_and_grad costs one kernel
launch — this is what the leapfrog consumes.

Pure-JAX reference path included (used on CPU and in tests; the Pallas
path activates on TPU backends).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def logreg_value_and_grad_reference(
    w: Array, x: Array, y: Array, prior_scale: float
) -> Tuple[Array, Array]:
    """Pure-JAX fused reference: w [C,d] -> (val [C], grad [C,d])."""
    logits = w @ x.T  # [C, N]
    ll = jnp.sum(y[None, :] * logits - jax.nn.softplus(logits), axis=-1)
    val = ll - 0.5 * jnp.sum(w * w, axis=-1) / prior_scale**2
    grad = (y[None, :] - jax.nn.sigmoid(logits)) @ x - w / prior_scale**2
    return val, grad


def _kernel(w_ref, x_ref, y_ref, val_ref, grad_ref, *, prior_inv_var: float):
    w = w_ref[:]  # [BC, d]
    x = x_ref[:]  # [N, d]
    y = y_ref[:]  # [1, N]
    logits = jax.lax.dot_general(
        w, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BC, N]
    resid = y - jax.nn.sigmoid(logits)  # [BC, N]
    ll = jnp.sum(y * logits - jax.nn.softplus(logits), axis=-1, keepdims=True)
    val_ref[:] = ll - 0.5 * prior_inv_var * jnp.sum(w * w, axis=-1, keepdims=True)
    grad_ref[:] = (
        jax.lax.dot_general(
            resid, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        - prior_inv_var * w
    )


def logreg_value_and_grad_pallas(
    w: Array, x: Array, y: Array, prior_scale: float, block_chains: int = 256,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Pallas path: w [C,d] -> (val [C], grad [C,d]); grid over chain blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, d = w.shape
    n = x.shape[0]
    bc = min(block_chains, _round_up(c, 8))
    c_pad = _round_up(c, bc)
    if c_pad != c:
        w = jnp.pad(w, ((0, c_pad - c), (0, 0)))
    y2 = y.astype(jnp.float32).reshape(1, n)

    grid = (c_pad // bc,)
    val, grad = pl.pallas_call(
        functools.partial(_kernel, prior_inv_var=1.0 / prior_scale**2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * c_pad * n * d,
            bytes_accessed=(c_pad * d + n * d + n + c_pad * d + c_pad) * 4,
            transcendentals=2 * c_pad * n,
        ),
        interpret=interpret,
    )(w, x, y2)
    return val[:c, 0], grad[:c]


def make_logreg_log_posterior(x, y, prior_scale: float = 1.0,
                              use_pallas: str = "auto"):
    """Returns batched log-posterior f(w [C,d]) -> [C] with a custom VJP
    backed by the fused kernel: value_and_grad = ONE kernel pass."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"

    def fused(w):
        if use_pallas:
            return logreg_value_and_grad_pallas(w, x, y, prior_scale)
        return logreg_value_and_grad_reference(w, x, y, prior_scale)

    @jax.custom_vjp
    def log_post(w):
        return fused(w)[0]

    def fwd(w):
        val, grad = fused(w)
        return val, grad

    def bwd(grad, g):
        return (g[:, None] * grad,)

    log_post.defvjp(fwd, bwd)
    return log_post
