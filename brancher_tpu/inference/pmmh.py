"""Particle-marginal Metropolis-Hastings (PMMH): parameter inference in
state-space models (the SMC^2 / particle-MCMC capability, ROADMAP r1 #8).

Andrieu, Doucet & Holenstein (2010): a Metropolis chain over parameters
theta whose likelihood is the particle filter's UNBIASED marginal
estimate p_hat(y | theta) — exact posterior over theta despite the noisy
likelihood (pseudo-marginal argument).

TPU-first structure: the theta chains are vmapped, so every MCMC step
runs `num_chains` complete particle filters as ONE batched tensor
program ([C] chains x [P] particles x scan over T).  Random-walk
proposal scale adapts during warmup by Robbins-Monro toward the 0.234
optimum.  The whole run is one jitted scan.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .smc import StateSpace, particle_filter

Array = jax.Array


class PMMHResult(NamedTuple):
    thetas: Array  # [C, S, D]
    log_marginals: Array  # [C, S]
    accept_rate: Array  # scalar
    proposal_scale: Array  # [D]


def pmmh_sample(
    make_ssm: Callable[[Array], StateSpace],
    ys: Array,
    log_prior: Callable[[Array], Array],
    theta0: Array,
    num_samples: int = 500,
    num_warmup: int = 300,
    num_particles: int = 256,
    num_chains: int = 8,
    key: Optional[Array] = None,
    init_proposal_scale: float = 0.1,
    target_accept: float = 0.234,
    ess_threshold: float = 0.5,
    mesh=None,
    chain_axis: str = "chain",
    shard: str = "chain",
    particle_axis: str = "particle",
) -> PMMHResult:
    """make_ssm(theta [D]) -> StateSpace built from traced theta.

    theta0: [D] or [C, D] initial parameter points (chains jitter around
    a single point automatically).

    mesh + shard="chain" (default): shard the theta chains over
    ``chain_axis`` via shard_map — each device runs its chains' particle
    filters locally (the particle axis stays on-device, the natural PMMH
    layout) while the Robbins-Monro proposal-scale adaptation reaches
    consensus with a pmean over the chain axis (ROADMAP r2 #8).

    mesh + shard="particle" (ROADMAP #7): when P per chain exceeds one
    device, each chain's ``num_particles`` split into per-device ISLAND
    filters (Vergé et al. 2015); the chain's likelihood estimate is the
    log-mean-exp of the per-island unbiased estimates — itself unbiased,
    so the pseudo-marginal argument is untouched.  Theta chains are
    REPLICATED across devices; the only collectives are an O(1)
    pmax/psum per filter to combine island estimates, so accept
    decisions are bitwise identical on every device.  Particle state
    never crosses ICI.

    mesh + shard="both" (ROADMAP r3 #8): the 2-D composition on a mesh
    carrying BOTH ``chain_axis`` and ``particle_axis`` — theta chains
    shard over the chain axis while each chain's particles split into
    island filters over the particle axis.  Per chain-shard the particle
    collectives (pmax/psum) run only over the particle sub-axis, so the
    island-combined likelihood is replicated within a chain row and the
    accept decisions stay bitwise identical across its particle
    replicas; the Robbins-Monro consensus pmean runs only over the chain
    sub-axis.  This is the SMC²-scale layout: C×P work on C_dev×P_dev
    chips with O(1) scalars over ICI per filter.

    Reproducibility note: sharded runs fold the device index into the
    run key (shard="chain") or the filter keys (shard="particle"), so
    the same `key` yields DIFFERENT chains under mesh vs no-mesh and
    across mesh sizes — statistically equivalent, not bitwise
    reproducible across mesh configurations.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    ys = jnp.asarray(ys)
    theta0 = jnp.atleast_1d(jnp.asarray(theta0, jnp.float32))
    d = theta0.shape[-1]
    k_init, k_run = jax.random.split(key)
    if theta0.ndim == 1:
        theta0 = theta0[None, :] + 0.01 * jax.random.normal(
            k_init, (num_chains, d)
        )

    def _make_loglik_batch(n_particles, key_tweak=None):
        def loglik(theta, k):
            if key_tweak is not None:
                k = key_tweak(k)
            res = particle_filter(
                make_ssm(theta), ys, n_particles, k,
                ess_threshold=ess_threshold,
            )
            return res.log_marginal

        return jax.vmap(loglik)

    total = num_warmup + num_samples
    ts = jnp.arange(total)
    warm_flags = ts < num_warmup
    k_ll0 = jax.random.fold_in(k_run, total + 1)

    def _run(theta0, ll0, lp0, k_base, axis_name, loglik_batch):
        def step(carry, inp):
            theta, ll, lp, log_scale = carry
            t, warm = inp
            k_prop, k_pf, k_acc = jax.random.split(
                jax.random.fold_in(k_base, t), 3
            )
            scale = jnp.exp(log_scale)
            prop = theta + scale[None, :] * jax.random.normal(
                k_prop, theta.shape, theta.dtype
            )
            lp_new = jax.vmap(log_prior)(prop)
            ll_new = loglik_batch(prop, jax.random.split(k_pf, theta.shape[0]))
            log_ratio = (ll_new + lp_new) - (ll + lp)
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            accept = jnp.log(
                jax.random.uniform(k_acc, (theta.shape[0],))
            ) < log_ratio
            theta = jnp.where(accept[:, None], prop, theta)
            ll = jnp.where(accept, ll_new, ll)
            lp = jnp.where(accept, lp_new, lp)
            # Robbins-Monro scale adaptation during warmup only; sharded
            # runs reach consensus on the GLOBAL accept rate over ICI
            acc_rate = jnp.mean(jnp.minimum(1.0, jnp.exp(log_ratio)))
            if axis_name is not None:
                acc_rate = jax.lax.pmean(acc_rate, axis_name)
            log_scale = jnp.where(
                warm, log_scale + 0.05 * (acc_rate - target_accept), log_scale
            )
            return (theta, ll, lp, log_scale), (theta, ll, accept)

        carry0 = (theta0, ll0, lp0,
                  jnp.full((d,), jnp.log(init_proposal_scale), jnp.float32))
        (theta, ll, lp, log_scale), (thetas, lls, accepts) = jax.lax.scan(
            step, carry0, (ts, warm_flags)
        )
        return thetas, lls, accepts, jnp.exp(log_scale)

    if mesh is not None and shard not in ("chain", "particle", "both"):
        raise ValueError(f"unknown shard mode {shard!r}")
    if mesh is None:
        loglik_batch = _make_loglik_batch(num_particles)
        ll0 = loglik_batch(theta0, jax.random.split(k_ll0, theta0.shape[0]))
        lp0 = jax.vmap(log_prior)(theta0)
        thetas, lls, accepts, scale = jax.jit(
            lambda a, b, c: _run(a, b, c, k_run, None, loglik_batch)
        )(theta0, ll0, lp0)
    elif shard == "chain":
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        loglik_batch = _make_loglik_batch(num_particles)
        ll0 = loglik_batch(theta0, jax.random.split(k_ll0, theta0.shape[0]))
        lp0 = jax.vmap(log_prior)(theta0)
        n_dev = mesh.shape[chain_axis]
        if theta0.shape[0] % n_dev != 0:
            raise ValueError(
                f"num_chains={theta0.shape[0]} must divide over mesh axis "
                f"{chain_axis!r} of size {n_dev}"
            )

        def body(th, l0, p0):
            kb = jax.random.fold_in(k_run, jax.lax.axis_index(chain_axis))
            return _run(th, l0, p0, kb, chain_axis, loglik_batch)

        thetas, lls, accepts, scale = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(P(chain_axis), P(chain_axis), P(chain_axis)),
                out_specs=(P(None, chain_axis), P(None, chain_axis),
                           P(None, chain_axis), P()),
                check_vma=False,
            )
        )(theta0, ll0, lp0)
    elif shard == "both":  # 2-D chain x particle mesh (ROADMAP r3 #8)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_cdev = mesh.shape[chain_axis]
        n_pdev = mesh.shape[particle_axis]
        if theta0.shape[0] % n_cdev != 0:
            raise ValueError(
                f"num_chains={theta0.shape[0]} must divide over mesh axis "
                f"{chain_axis!r} of size {n_cdev}"
            )
        if num_particles % n_pdev != 0:
            raise ValueError(
                f"num_particles={num_particles} must divide over mesh axis "
                f"{particle_axis!r} of size {n_pdev}"
            )
        local_p = num_particles // n_pdev

        def body(th):
            my_c = jax.lax.axis_index(chain_axis)
            my_p = jax.lax.axis_index(particle_axis)
            # chain-shard key: distinct proposal streams per chain row;
            # island key tweak: distinct particle streams per column.
            kb = jax.random.fold_in(k_run, my_c)
            local = _make_loglik_batch(
                local_p, key_tweak=lambda k: jax.random.fold_in(k, my_p)
            )

            def combined(thetas_c, keys_c):
                lml = local(thetas_c, keys_c)  # [C_local] island estimates
                m = jax.lax.pmax(lml, particle_axis)
                s = jax.lax.psum(jnp.exp(lml - m), particle_axis)
                return m + jnp.log(s / n_pdev)

            ll0 = combined(
                th, jax.random.split(jax.random.fold_in(k_ll0, my_c),
                                     th.shape[0])
            )
            lp0 = jax.vmap(log_prior)(th)
            return _run(th, ll0, lp0, kb, chain_axis, combined)

        thetas, lls, accepts, scale = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(P(chain_axis),),
                out_specs=(P(None, chain_axis), P(None, chain_axis),
                           P(None, chain_axis), P()),
                check_vma=False,
            )
        )(theta0)
    else:  # shard == "particle": island filters per device (ROADMAP #7)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape[particle_axis]
        if num_particles % n_dev != 0:
            raise ValueError(
                f"num_particles={num_particles} must divide over mesh axis "
                f"{particle_axis!r} of size {n_dev}"
            )
        local_p = num_particles // n_dev

        def body(th):
            my = jax.lax.axis_index(particle_axis)
            # per-device particle keys; everything else replicated so the
            # accept decisions agree bitwise across devices
            local = _make_loglik_batch(
                local_p, key_tweak=lambda k: jax.random.fold_in(k, my)
            )

            def combined(thetas_c, keys_c):
                lml = local(thetas_c, keys_c)  # [C] island estimates
                m = jax.lax.pmax(lml, particle_axis)
                s = jax.lax.psum(jnp.exp(lml - m), particle_axis)
                return m + jnp.log(s / n_dev)  # unbiased island average

            ll0 = combined(th, jax.random.split(k_ll0, th.shape[0]))
            lp0 = jax.vmap(log_prior)(th)
            return _run(th, ll0, lp0, k_run, None, combined)

        thetas, lls, accepts, scale = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(P(),),
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            )
        )(theta0)
    thetas = jnp.swapaxes(thetas[num_warmup:], 0, 1)  # [C, S, D]
    lls = jnp.swapaxes(lls[num_warmup:], 0, 1)
    return PMMHResult(
        thetas=thetas,
        log_marginals=lls,
        accept_rate=jnp.mean(accepts[num_warmup:]),
        proposal_scale=scale,
    )
