"""Adaptive tempered SMC sampler for static models.

Complements the particle filter (smc.py): SMC-as-posterior-sampler over
any ProbabilisticModel.  Target sequence: prior(z) * lik(z)^beta with
0 = beta_0 < ... < beta_K = 1; each temperature increment is chosen
ADAPTIVELY by bisection so the incremental-weight ESS hits a target
fraction — the classic adaptive-tempering scheme, implemented with
fixed-trip-count bisection + a bounded while loop so the whole sampler is
one XLA program.

Moves between temperatures: systematic resampling + a few chain-batched
HMC rejuvenation steps on the tempered density (the [P, d] particle block
is the chain block — same roofline-friendly shape as vectorized NUTS).
Returns particles, log-evidence estimate (the SMC normalizing-constant
telescope), and the temperature ladder actually used.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from .smc import systematic_resample_indices

Array = jax.Array


class TemperedSMCResult(NamedTuple):
    particles: Array  # [P, d] unconstrained
    log_evidence: Array
    betas: Array  # [max_stages+1] temperature ladder (padded with 1.0)
    num_stages: Array
    ess_history: Array  # [max_stages]


def _ess_from_logw(logw: Array) -> Array:
    w = jax.nn.softmax(logw)
    return 1.0 / jnp.sum(w * w)


def tempered_smc(
    log_prior_fn: Callable[[Array], Array],  # [P,d] -> [P]
    log_lik_fn: Callable[[Array], Array],  # [P,d] -> [P]
    z0: Array,  # [P, d] prior draws
    key: Array,
    ess_target: float = 0.5,
    rejuvenation_steps: int = 3,
    hmc_step_size: float = 0.2,
    hmc_num_leapfrog: int = 8,
    max_stages: int = 50,
    bisection_iters: int = 26,
) -> TemperedSMCResult:
    p, d = z0.shape
    dtype = z0.dtype

    def next_beta(beta, log_lik):
        """Largest beta' in (beta, 1] with incremental ESS >= target."""
        def bisect(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            ess = _ess_from_logw((mid - beta) * log_lik)
            ok = ess >= ess_target * p
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        full_ok = _ess_from_logw((1.0 - beta) * log_lik) >= ess_target * p
        lo, hi = jax.lax.fori_loop(
            0, bisection_iters, bisect, (beta, jnp.asarray(1.0, dtype))
        )
        return jnp.where(full_ok, 1.0, lo)

    def hmc_rejuvenate(k, z, beta):
        """A few MH-corrected HMC steps targeting prior * lik^beta."""
        def logpost(zz):
            return log_prior_fn(zz) + beta * log_lik_fn(zz)

        vg = jax.vmap(jax.value_and_grad(lambda zrow: logpost(zrow[None, :])[0]))

        def one(i, carry):
            z, val, grad, k = carry
            k, k_mom, k_acc = jax.random.split(k, 3)
            r0 = jax.random.normal(k_mom, (p, d), dtype)
            h0 = -val + 0.5 * jnp.sum(r0 * r0, -1)

            def leap(j, c):
                z, r, val, grad = c
                r = r + 0.5 * hmc_step_size * grad
                z = z + hmc_step_size * r
                val, grad = vg(z)
                r = r + 0.5 * hmc_step_size * grad
                return (z, r, val, grad)

            z1, r1, val1, grad1 = jax.lax.fori_loop(
                0, hmc_num_leapfrog, leap, (z, r0, val, grad)
            )
            h1 = -val1 + 0.5 * jnp.sum(r1 * r1, -1)
            delta = jnp.where(jnp.isnan(h1), -jnp.inf, h0 - h1)
            accept = jax.random.uniform(k_acc, (p,)) < jnp.exp(jnp.minimum(delta, 0.0))
            z = jnp.where(accept[:, None], z1, z)
            val = jnp.where(accept, val1, val)
            grad = jnp.where(accept[:, None], grad1, grad)
            return (z, val, grad, k)

        val, grad = vg(z)
        z, _, _, _ = jax.lax.fori_loop(0, rejuvenation_steps, one, (z, val, grad, k))
        return z

    def cond(carry):
        stage, beta, z, log_ev, betas, esss = carry
        return jnp.logical_and(beta < 1.0, stage < max_stages)

    def body(carry):
        stage, beta, z, log_ev, betas, esss = carry
        log_lik = log_lik_fn(z)
        beta_new = next_beta(beta, log_lik)
        logw = (beta_new - beta) * log_lik
        # evidence increment: log mean of incremental weights
        inc = jax.scipy.special.logsumexp(logw) - jnp.log(float(p))
        log_ev = log_ev + inc
        ess = _ess_from_logw(logw)

        k_stage = jax.random.fold_in(key, stage)
        k_res, k_rej = jax.random.split(k_stage)
        idx = systematic_resample_indices(k_res, logw)
        z = jnp.take(z, idx, axis=0)
        z = hmc_rejuvenate(k_rej, z, beta_new)

        betas = betas.at[stage + 1].set(beta_new)
        esss = esss.at[stage].set(ess)
        return (stage + 1, beta_new, z, log_ev, betas, esss)

    betas0 = jnp.ones((max_stages + 1,), dtype).at[0].set(0.0)
    carry = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype),
        z0,
        jnp.zeros((), dtype),
        betas0,
        jnp.zeros((max_stages,), dtype),
    )
    stage, beta, z, log_ev, betas, esss = jax.lax.while_loop(cond, body, carry)
    return TemperedSMCResult(z, log_ev, betas, stage, esss)


def smc_posterior_sample(
    model,
    num_particles: int = 1024,
    key: Optional[Array] = None,
    given=None,
    params=None,
    **smc_kwargs,
):
    """Tempered-SMC posterior sampling on a ProbabilisticModel.

    Returns (constrained sample dict [P, ...], TemperedSMCResult).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    comp = model.compiled() if hasattr(model, "compiled") else model
    if params is None:
        params = comp.initial_params
    _, unravel = jax.flatten_util.ravel_pytree(comp.z_example())

    def parts(zrow):
        return comp.log_density_z_parts(params, unravel(zrow), given)

    log_prior_fn = jax.vmap(lambda zr: parts(zr)[0])
    log_lik_fn = jax.vmap(lambda zr: parts(zr)[1])

    k_init, k_run = jax.random.split(key)

    def prior_z(k):
        vals = comp.sample_one(params, k, given)
        latents = {n: vals[n] for n in comp.continuous_latent_names}
        return jax.flatten_util.ravel_pytree(comp.unconstrain(params, latents))[0]

    z0 = jax.vmap(prior_z)(jax.random.split(k_init, num_particles))
    res = jax.jit(
        lambda z, k: tempered_smc(log_prior_fn, log_lik_fn, z, k, **smc_kwargs)
    )(z0, k_run)
    constrained = jax.vmap(lambda zr: {
        n: comp.constrain(params, unravel(zr), given)[n]
        for n in comp.continuous_latent_names
    })(res.particles)
    return constrained, res
