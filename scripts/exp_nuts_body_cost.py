"""Bisect the vectorized-NUTS while-body cost on the real TPU.

Variants (all: while_loop of 64 iterations, C=1024, d=32, fused pallas
potential):
  full        — the real nuts_transition_batched body
  no_ck       — checkpoints stores removed (no dynamic_update_slice)
  no_uturn    — U-turn einsum sweep removed
  leap_only   — just the leapfrog + trivial counter
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

from brancher_tpu.models.logistic_regression import (
    logistic_regression_model, make_logreg_data,
)
from brancher_tpu.ops.pallas_logreg import logreg_value_and_grad_pallas

C, D, N, ITERS = 1024, 32, 1000, 64
x, y, _ = make_logreg_data(num_points=N, dim=D, seed=0)
xj, yj = jnp.asarray(x), jnp.asarray(np.asarray(y, np.float32))
vg = lambda w: logreg_value_and_grad_pallas(w, xj, yj, 1.0)

z0 = jax.random.normal(jax.random.PRNGKey(0), (C, D)) * 0.1
val0, grad0 = jax.jit(vg)(z0)
inv_mass = jnp.ones((D,))
eps = jnp.asarray(0.05)
KDIM = 9


def leap(z, r, dirn):
    eps_c = (eps * dirn)[:, None]
    r_half = r + 0.5 * eps_c * grad0
    z_new = z + eps_c * inv_mass[None, :] * r_half
    val, g = vg(z_new)
    r_new = r_half + 0.5 * eps_c * g
    return z_new, r_new, val, g


def run_variant(name, body_extra):
    def cond(s):
        return s[0] < ITERS

    def body(s):
        n, z, r, ck = s
        dirn = jnp.where(jax.random.bernoulli(jax.random.fold_in(jax.random.PRNGKey(1), n), 0.5, (C,)), 1.0, -1.0)
        z, r, val, g = leap(z, r, dirn)
        ck = body_extra(n, z, r, ck)
        return (n + 1, z, r, ck)

    ck0 = jnp.zeros((C, KDIM, D))
    f = jax.jit(lambda z, r: jax.lax.while_loop(cond, body, (0, z, r, ck0)))
    r0 = jax.random.normal(jax.random.PRNGKey(2), (C, D))
    out = jax.block_until_ready(f(z0, r0))
    t0 = time.time()
    for _ in range(5):
        out = jax.block_until_ready(f(z0, r0))
    dt = (time.time() - t0) / 5 / ITERS
    print(f"{name}: {dt*1e6:.1f} us/iteration", flush=True)


def extra_none(n, z, r, ck):
    return ck


def extra_ck(n, z, r, ck):
    pc = jax.lax.population_count(n)
    upd = jax.lax.dynamic_update_slice_in_dim(ck, z[:, None, :], pc, axis=1)
    return jnp.where((n % 2) == 0, upd, ck)


def extra_uturn(n, z, r, ck):
    rho = z[:, None, :] - ck
    dot_a = jnp.einsum("ckd,ckd->ck", rho, ck)
    dot_b = jnp.einsum("ckd,ckd->ck", rho, jnp.broadcast_to(r[:, None, :], rho.shape))
    turn = jnp.logical_or(dot_a <= 0, dot_b <= 0)
    return ck + 1e-30 * jnp.sum(turn)  # keep it live


def extra_both(n, z, r, ck):
    return extra_uturn(n, z, r, extra_ck(n, z, r, ck))


run_variant("leap_only", extra_none)
run_variant("leap+ck", extra_ck)
run_variant("leap+uturn", extra_uturn)
run_variant("leap+both", extra_both)

# the real transition for reference
from brancher_tpu.inference.vectorized_nuts import nuts_transition_batched
f = jax.jit(lambda z, v, g, k: nuts_transition_batched(
    vg, z, v, g, eps, inv_mass, k, max_depth=6))
out = jax.block_until_ready(f(z0, val0, grad0, jax.random.PRNGKey(3)))
t0 = time.time()
REP = 20
nsum = 0
for i in range(REP):
    out = f(z0, val0, grad0, jax.random.fold_in(jax.random.PRNGKey(4), i))
    jax.block_until_ready(out)
    nsum += int(out[5])
dt = (time.time() - t0) / nsum
print(f"real transition: {dt*1e6:.1f} us/iteration ({nsum/REP:.0f} iters/draw avg)", flush=True)
