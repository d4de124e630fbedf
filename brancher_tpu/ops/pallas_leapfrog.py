"""Pallas fused leapfrog: L integrator steps in ONE kernel launch.

BASELINE.json north star: "NUTS/HMC (Pallas **leapfrog** + vectorized
log-joint)".  Round 1 fused only the potential's value+grad; the momentum
half-steps and position drift still round-tripped z/r/grad through HBM
between XLA loop iterations, and every iteration paid loop dispatch.
Here the whole trajectory runs inside one kernel: z, r, grad and the
design matrix X stay VMEM-resident across a fori_loop of steps
(VERDICT r1 next-round #2; ROADMAP r1 #3).

Families match ops/pallas_glm.py (the recognizer supplies the design):
  * bernoulli_logit:  y ~ Bernoulli(sigmoid(X z + b))
  * normal_learned:   y ~ N(X z + b, exp(u z + c0))
both with diagonal-Gaussian priors in z and diagonal mass.

Used by the chain-batched HMC and ChEES engines (uniform, dynamic step
counts — passed as an SMEM scalar; the in-kernel fori_loop handles a
traced bound).  NUTS cannot use it (per-leaf tree bookkeeping between
steps).  X must fit VMEM (~6 MB gate); larger datasets keep the N-tiled
potential kernel + XLA loop.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# family math shared by the leapfrog body (whole-X, VMEM-resident) ------

def _bern_vg(z, x, y, b, mask, m, iv, ll_scale):
    logits = jax.lax.dot_general(
        z, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b
    ll = jnp.sum((y * logits - jax.nn.softplus(logits)) * mask, -1, keepdims=True)
    dz = z - m
    val = ll_scale * ll - 0.5 * jnp.sum(dz * dz * iv, -1, keepdims=True)
    resid = (y - jax.nn.sigmoid(logits)) * mask
    grad = ll_scale * jax.lax.dot_general(
        resid, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) - dz * iv
    return val, grad


def _normal_vg(z, x, y, b, mask, m, iv, u, c0, n_real, ll_scale):
    s = jnp.sum(z * u, -1, keepdims=True) + c0  # [BC, 1]
    e2 = jnp.exp(-2.0 * s)
    loc = jax.lax.dot_general(
        z, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b
    resid = (y - loc) * mask
    rss = jnp.sum(resid * resid, -1, keepdims=True)
    dz = z - m
    val = (
        ll_scale * (-0.5 * e2 * rss - n_real * s)
        - 0.5 * jnp.sum(dz * dz * iv, -1, keepdims=True)
    )
    g_loc = e2 * jax.lax.dot_general(
        resid, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    grad = ll_scale * (g_loc + (e2 * rss - n_real) * u) - dz * iv
    return val, grad


def _leap_kernel(eps_ref, n_ref, z_ref, r_ref, g_ref, x_ref, yb_ref,
                 m_ref, iv_ref, im_ref, u_ref,
                 z_out, r_out, val_out, g_out,
                 *, family: str, ll_scale: float, c0: float, n_real: int):
    z = z_ref[:]
    r = r_ref[:]
    g = g_ref[:]
    eps = eps_ref[0, 0]
    n = n_ref[0, 0]
    x = x_ref[:]
    y = yb_ref[0:1, :]
    b = yb_ref[1:2, :]
    mask = yb_ref[2:3, :]
    m = m_ref[:]
    iv = iv_ref[:]
    im = im_ref[:]  # inverse mass [1, D]
    u = u_ref[:]

    if family == "bernoulli_logit":
        vg = lambda zz: _bern_vg(zz, x, y, b, mask, m, iv, ll_scale)
    else:
        vg = lambda zz: _normal_vg(zz, x, y, b, mask, m, iv, u, c0,
                                   n_real, ll_scale)

    def body(i, carry):
        z, r, v, g = carry
        r = r + 0.5 * eps * g
        z = z + eps * im * r
        v, g = vg(z)
        r = r + 0.5 * eps * g
        return (z, r, v, g)

    v0 = jnp.zeros((z.shape[0], 1), jnp.float32)
    z, r, v, g = jax.lax.fori_loop(0, n, body, (z, r, v0, g))
    z_out[:] = z
    r_out[:] = r
    val_out[:] = v
    g_out[:] = g


def build_fused_leapfrog(
    family: str,
    x: Array,
    y: Array,
    b: Array,
    prior_mean: Array,
    prior_inv_var: Array,
    u: Optional[Array] = None,
    c0: float = 0.0,
    ll_scale: float = 1.0,
    block_chains: int = 1024,
    vmem_budget_bytes: int = 6 * 1024 * 1024,
    interpret: bool = False,
) -> Optional[Callable]:
    """Returns leapfrog(z, r, grad, eps, inv_mass, n_steps) ->
    (z1, r1, val1, grad1), or None when X exceeds the VMEM gate.

    All chains advance n_steps (a traced scalar) with z/r/grad resident
    in VMEM; one kernel launch per trajectory.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    n_pad = _round_up(n, 256)
    if n_pad * d * 4 > vmem_budget_bytes:
        return None
    xp = jnp.pad(jnp.asarray(x, jnp.float32), ((0, n_pad - n), (0, 0)))
    yb = jnp.stack([
        jnp.pad(jnp.asarray(y, jnp.float32), (0, n_pad - n)),
        jnp.pad(jnp.asarray(b, jnp.float32), (0, n_pad - n)),
        jnp.concatenate([jnp.ones((n,), jnp.float32),
                         jnp.zeros((n_pad - n,), jnp.float32)]),
    ])  # [3, N]
    m2 = jnp.asarray(prior_mean, jnp.float32).reshape(1, d)
    iv2 = jnp.asarray(prior_inv_var, jnp.float32).reshape(1, d)
    u2 = (jnp.zeros((1, d), jnp.float32) if u is None
          else jnp.asarray(u, jnp.float32).reshape(1, d))

    kernel = functools.partial(
        _leap_kernel, family=family, ll_scale=float(ll_scale),
        c0=float(c0), n_real=int(n),
    )

    def leapfrog(z, r, grad, eps, inv_mass, n_steps):
        c = z.shape[0]
        bc = min(block_chains, _round_up(c, 8))
        c_pad = _round_up(c, bc)
        pad = c_pad - c
        if pad:
            z = jnp.pad(z, ((0, pad), (0, 0)))
            r = jnp.pad(r, ((0, pad), (0, 0)))
            grad = jnp.pad(grad, ((0, pad), (0, 0)))
        grid = (c_pad // bc,)
        im2 = jnp.broadcast_to(
            jnp.asarray(inv_mass, jnp.float32), (d,)
        ).reshape(1, d)
        eps_a = jnp.asarray(eps, jnp.float32).reshape(1, 1)
        n_a = jnp.asarray(n_steps, jnp.int32).reshape(1, 1)

        cd_spec = pl.BlockSpec((bc, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        row_spec = lambda rows: pl.BlockSpec(
            (rows, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
        z1, r1, val1, g1 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                cd_spec, cd_spec, cd_spec,
                pl.BlockSpec((n_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                row_spec(1), row_spec(1), row_spec(1), row_spec(1),
            ],
            out_specs=[
                cd_spec,
                cd_spec,
                pl.BlockSpec((bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                cd_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((c_pad, d), jnp.float32),
                jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((c_pad, d), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * c_pad * n_pad * d * 32,
                bytes_accessed=(4 * c_pad * d + n_pad * d) * 4,
                transcendentals=2 * c_pad * n_pad * 32,
            ),
            interpret=interpret,
        )(eps_a, n_a, z, r, grad, xp, yb, m2, iv2, im2, u2)
        return z1[:c], r1[:c], val1[:c, 0], g1[:c]

    return leapfrog


def reference_leapfrog(value_and_grad_fn) -> Callable:
    """XLA loop-of-potential fallback with identical signature (used on
    CPU and when the VMEM gate rejects the dataset)."""

    def leapfrog(z, r, grad, eps, inv_mass, n_steps):
        def body(i, carry):
            z, r, v, g = carry
            r = r + 0.5 * eps * g
            z = z + eps * inv_mass[None, :] * r
            v, g = value_and_grad_fn(z)
            r = r + 0.5 * eps * g
            return (z, r, v, g)

        v0 = jnp.zeros((z.shape[0],), z.dtype)
        return jax.lax.fori_loop(0, n_steps, body, (z, r, v0, grad))

    return leapfrog
