"""Particle Gibbs with Ancestor Sampling (PGAS): joint state + parameter
inference in state-space models (the SMC^2/particle-MCMC family,
ROADMAP r2 #8 — the conditional-SMC counterpart to pmmh.py).

Andrieu, Doucet & Holenstein (2010) introduced Particle Gibbs: a Gibbs
sampler alternating (a) a CONDITIONAL particle filter that keeps one
reference trajectory alive and samples a new trajectory from the
resulting particle system, and (b) a parameter update given the sampled
trajectory (complete-data posterior).  Lindsten, Jordan & Schön (2014)
added ANCESTOR SAMPLING: at every step the reference particle's ancestor
is redrawn with probability proportional to w_{t-1}^i * f(x_t^ref |
x_{t-1}^i), which breaks path degeneracy and makes the sampler mix with
far fewer particles.

TPU-first structure (no reference counterpart — Brancher has no SMC at
all, SURVEY.md §0):

  * one PGAS sweep is a single ``lax.scan`` over time with the particle
    axis vmapped inside the step (same layout as smc.particle_filter);
    the pinned reference particle is lane P-1 — pinning is one
    ``.at[-1].set``, branch-free;
  * trajectory backtracking is a reverse ``lax.scan`` over the stored
    ancestor matrix;
  * the outer Gibbs loop (sweep + random-walk MH on theta against the
    complete-data log posterior, Robbins-Monro scale adaptation) is one
    more ``lax.scan``; chains are vmapped — C chains x P particles x T
    timesteps run as ONE batched tensor program.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .smc import StateSpace

Array = jax.Array


class PGResult(NamedTuple):
    thetas: Array  # [C, S, D]
    trajectories: Array  # [C, S, T, ...state] sampled state paths
    accept_rate: Array  # scalar (theta-MH acceptance)
    proposal_scale: Array  # [D]


def _pgas_sweep(ssm: StateSpace, ys: Array, x_ref: Array,
                num_particles: int, key: Array,
                ancestor_sampling: bool = True):
    """One conditional-SMC sweep; returns a newly sampled trajectory
    [T, ...state] (jointly with its ancestry, marginalized out)."""
    t_len = ys.shape[0]
    p = num_particles

    k_init, k_scan, k_pick = jax.random.split(key, 3)
    x0 = jax.vmap(ssm.init_sample)(jax.random.split(k_init, p))
    x0 = x0.at[-1].set(x_ref[0])  # pin the reference particle
    lw0 = jax.vmap(lambda x: ssm.obs_log_prob(ys[0], x, 0))(x0)

    def step(carry, inp):
        x, lw = carry
        t, k = inp
        k_res, k_anc, k_prop = jax.random.split(k, 3)

        # multinomial ancestors for the P-1 free particles
        anc = jax.random.categorical(k_res, lw, shape=(p,))
        if ancestor_sampling:
            # reference ancestor ~ w_{t-1}^i * f(x_t^ref | x_{t-1}^i)
            ref_next = x_ref[t]
            trans_to_ref = jax.vmap(
                lambda xp: ssm.trans_log_prob(ref_next, xp, t)
            )(x)
            anc_ref = jax.random.categorical(k_anc, lw + trans_to_ref)
        else:
            anc_ref = jnp.asarray(p - 1, anc.dtype)
        anc = anc.at[-1].set(anc_ref)

        x_par = jnp.take(x, anc, axis=0)
        keys = jax.random.split(k_prop, p)
        x_new = jax.vmap(lambda kk, xp: ssm.trans_sample(kk, xp, t))(keys, x_par)
        x_new = x_new.at[-1].set(x_ref[t])  # pin
        lw_new = jax.vmap(lambda xx: ssm.obs_log_prob(ys[t], xx, t))(x_new)
        return (x_new, lw_new), (x_new, anc)

    ts = jnp.arange(1, t_len)
    (x_fin, lw_fin), (xs_tail, ancs) = jax.lax.scan(
        step, (x0, lw0), (ts, jax.random.split(k_scan, t_len - 1))
    )
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)  # [T, P, ...]

    # backtrack one sampled path: j_T ~ Cat(w_T); j_{t-1} = anc_t[j_t]
    j_last = jax.random.categorical(k_pick, lw_fin)

    def back(j, anc_t):
        return anc_t[j], j

    j0, js_tail = jax.lax.scan(back, j_last, ancs, reverse=True)
    js = jnp.concatenate([j0[None], js_tail], axis=0)  # [T]
    traj = jax.vmap(lambda xt, jt: xt[jt])(xs, js)
    return traj


def _complete_data_log_post(make_ssm, log_prior, theta, traj, ys):
    """log p(theta) + log p(x_{0:T-1}, y_{0:T-1} | theta)."""
    ssm = make_ssm(theta)
    t_len = ys.shape[0]
    lp = log_prior(theta) + ssm.init_log_prob(traj[0])
    lp = lp + ssm.obs_log_prob(ys[0], traj[0], 0)
    ts = jnp.arange(1, t_len)
    lp = lp + jnp.sum(
        jax.vmap(lambda t: ssm.trans_log_prob(traj[t], traj[t - 1], t))(ts)
    )
    lp = lp + jnp.sum(
        jax.vmap(lambda t: ssm.obs_log_prob(ys[t], traj[t], t))(ts)
    )
    return lp


def particle_gibbs_sample(
    make_ssm: Callable[[Array], StateSpace],
    ys: Array,
    log_prior: Callable[[Array], Array],
    theta0: Array,
    num_samples: int = 500,
    num_warmup: int = 300,
    num_particles: int = 64,
    num_chains: int = 8,
    key: Optional[Array] = None,
    init_proposal_scale: float = 0.1,
    target_accept: float = 0.44,
    ancestor_sampling: bool = True,
    mh_steps_per_sweep: int = 2,
) -> PGResult:
    """Particle Gibbs with ancestor sampling over (theta, x_{0:T-1}).

    make_ssm(theta [D]) -> StateSpace built from traced theta (same
    contract as pmmh.pmmh_sample).  Compared to PMMH, PGAS mixes with
    far fewer particles (ancestor sampling breaks path degeneracy) and
    yields posterior STATE trajectories, not just parameters.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    ys = jnp.asarray(ys)
    theta0 = jnp.atleast_1d(jnp.asarray(theta0, jnp.float32))
    d = theta0.shape[-1]
    k_init, k_ref, k_run = jax.random.split(key, 3)
    if theta0.ndim == 1:
        theta0 = theta0[None, :] + 0.01 * jax.random.normal(
            k_init, (num_chains, d)
        )

    # initial reference trajectories: one unconditional filter draw each
    # (a plain prior rollout also works; the filter start mixes faster)
    def init_ref(theta, k):
        ssm = make_ssm(theta)
        k0, ks = jax.random.split(k)
        x0 = ssm.init_sample(k0)

        def roll(x, inp):
            t, kk = inp
            x_n = ssm.trans_sample(kk, x, t)
            return x_n, x_n

        ts = jnp.arange(1, ys.shape[0])
        _, tail = jax.lax.scan(roll, x0, (ts, jax.random.split(ks, ys.shape[0] - 1)))
        return jnp.concatenate([x0[None], tail], axis=0)

    refs0 = jax.vmap(init_ref)(theta0, jax.random.split(k_ref, theta0.shape[0]))

    def gibbs_step(carry, inp):
        theta, ref, log_scale = carry
        k, warm = inp
        c = theta.shape[0]
        k_sweep, k_mh = jax.random.split(jnp.asarray(k))

        # (a) conditional SMC: new trajectory given theta
        def sweep(th, rf, kk):
            return _pgas_sweep(make_ssm(th), ys, rf, num_particles, kk,
                               ancestor_sampling)

        ref = jax.vmap(sweep)(theta, ref, jax.random.split(k_sweep, c))

        # (b) random-walk MH on theta | trajectory (complete-data target)
        lp = jax.vmap(
            lambda th, rf: _complete_data_log_post(make_ssm, log_prior, th, rf, ys)
        )(theta, ref)

        def mh_once(carry2, kk):
            theta, lp, log_scale = carry2
            k_p, k_a = jax.random.split(kk)
            prop = theta + jnp.exp(log_scale)[None, :] * jax.random.normal(
                k_p, theta.shape, theta.dtype
            )
            lp_new = jax.vmap(
                lambda th, rf: _complete_data_log_post(
                    make_ssm, log_prior, th, rf, ys
                )
            )(prop, ref)
            log_ratio = lp_new - lp
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            acc = jnp.log(jax.random.uniform(k_a, (theta.shape[0],))) < log_ratio
            theta = jnp.where(acc[:, None], prop, theta)
            lp = jnp.where(acc, lp_new, lp)
            acc_rate = jnp.mean(jnp.minimum(1.0, jnp.exp(log_ratio)))
            log_scale = log_scale + jnp.where(
                warm, 0.05 * (acc_rate - target_accept), 0.0
            )
            return (theta, lp, log_scale), jnp.mean(acc.astype(jnp.float32))

        (theta, lp, log_scale), accs = jax.lax.scan(
            mh_once, (theta, lp, log_scale),
            jax.random.split(k_mh, mh_steps_per_sweep),
        )
        return (theta, ref, log_scale), (theta, ref, jnp.mean(accs))

    total = num_warmup + num_samples
    keys = jax.random.split(k_run, total)
    warm_flags = jnp.arange(total) < num_warmup

    @jax.jit
    def run(theta0, refs0):
        carry0 = (theta0, refs0,
                  jnp.full((d,), jnp.log(init_proposal_scale), jnp.float32))
        (_, _, log_scale), (thetas, trajs, accs) = jax.lax.scan(
            gibbs_step, carry0, (keys, warm_flags)
        )
        return thetas, trajs, accs, jnp.exp(log_scale)

    thetas, trajs, accs, scale = run(theta0, refs0)
    thetas = jnp.swapaxes(thetas[num_warmup:], 0, 1)  # [C, S, D]
    trajs = jnp.swapaxes(trajs[num_warmup:], 0, 1)  # [C, S, T, ...]
    return PGResult(
        thetas=thetas,
        trajectories=trajs,
        accept_rate=jnp.mean(accs[num_warmup:]),
        proposal_scale=scale,
    )
