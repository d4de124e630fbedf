"""Sequential Monte Carlo: particle filtering with sharded particles.

Net-new vs reference (BASELINE.json: "SMC with particle resampling ...
particles shard across the pod slice; systematic resampling runs over ICI
collectives"; SURVEY.md §2 "Parallelism", §7.5).

Design:
  * The bootstrap particle filter is ONE ``lax.scan`` over time; the
    particle axis is vmapped inside each step (dense VPU/MXU work).
  * Systematic resampling: sorted-uniform positions against the weight
    CDF via ``jnp.searchsorted`` — O(P log P), branch-free.
  * Adaptive resampling at an ESS threshold uses ``lax.cond``-free
    select (always compute indices, select identity when ESS is high) —
    keeps the scan body straight-line for XLA.
  * Multi-device: particles shard over a mesh axis.  Weight
    normalization, ESS and the incremental marginal likelihood are O(1)
    psum/pmax reductions (ops/resampling.py); resampling all-gathers
    ONLY the O(P) weight vector to build the global systematic CDF.
    Particle STATE moves point-to-point via ``ppermute`` ring rounds
    (ops/resampling.py::ring_exchange), and only on steps where the
    adaptive-ESS trigger fires (``lax.cond`` — the predicate is
    replicated across shards, so collectives stay matched).  The
    ``exchange="gather"`` mode keeps the round-1 all-gather path for
    comparison; ``exchange="island"`` never moves state at all.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class StateSpace(NamedTuple):
    """Explicit state-space spec consumed by the particle filter."""

    init_sample: Callable  # (key) -> x0
    init_log_prob: Callable  # (x0) -> scalar
    trans_sample: Callable  # (key, x_prev, t) -> x
    trans_log_prob: Callable  # (x, x_prev, t) -> scalar
    obs_log_prob: Callable  # (y_t, x_t, t) -> scalar


class SMCResult(NamedTuple):
    log_marginal: Array  # log p(y_{1:T}) estimate
    particles: Array  # final particles [P, ...]
    weights: Array  # final normalized weights [P]
    filter_means: Array  # E[x_t | y_{1:t}] per t
    ess_history: Array  # effective sample size per t


def systematic_resample_indices(key: Array, log_weights: Array) -> Array:
    """Systematic resampling: stratified positions through the CDF."""
    p = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    positions = (u0 + jnp.arange(p, dtype=w.dtype)) / p
    idx = jnp.searchsorted(cdf, positions)
    return jnp.clip(idx, 0, p - 1)


def multinomial_resample_indices(key: Array, log_weights: Array) -> Array:
    p = log_weights.shape[0]
    return jax.random.categorical(key, log_weights, shape=(p,))


def _ess(log_weights: Array) -> Array:
    w = jax.nn.softmax(log_weights)
    return 1.0 / jnp.sum(w * w)


def particle_filter(
    ssm: StateSpace,
    ys: Array,
    num_particles: int,
    key: Array,
    ess_threshold: float = 0.5,
    resampling: str = "systematic",
) -> SMCResult:
    """Single-device bootstrap particle filter (vmapped particle axis)."""
    t_len = ys.shape[0]
    resampler = (
        systematic_resample_indices if resampling == "systematic"
        else multinomial_resample_indices
    )

    k_init, k_scan = jax.random.split(key)
    x0 = jax.vmap(ssm.init_sample)(jax.random.split(k_init, num_particles))
    lw0 = jax.vmap(lambda x: ssm.obs_log_prob(ys[0], x, 0))(x0)

    def step(carry, inp):
        x, lw, log_ml = carry
        t, k = inp
        k_res, k_prop = jax.random.split(k)

        # adaptive resampling (branch-free select)
        ess = _ess(lw)
        do_resample = ess < ess_threshold * num_particles
        idx = resampler(k_res, lw)
        iota = jnp.arange(num_particles)
        sel = jnp.where(do_resample, idx, iota)
        x = jnp.take(x, sel, axis=0)
        # after resampling weights reset to uniform (keep log-mean for ml)
        lse = jax.scipy.special.logsumexp(lw)
        lw = jnp.where(
            do_resample, jnp.zeros_like(lw), lw - lse + jnp.log(float(num_particles))
        )

        keys = jax.random.split(k_prop, num_particles)
        x_new = jax.vmap(lambda kk, xx: ssm.trans_sample(kk, xx, t))(keys, x)
        l_obs = jax.vmap(lambda xx: ssm.obs_log_prob(ys[t], xx, t))(x_new)
        lw_new = lw + l_obs

        # incremental marginal-likelihood: log mean of unnormalized ratio
        inc = jax.scipy.special.logsumexp(lw_new) - jax.scipy.special.logsumexp(lw)
        log_ml = log_ml + inc

        w = jax.nn.softmax(lw_new)
        mean_t = jnp.tensordot(w, x_new, axes=(0, 0))
        return (x_new, lw_new, log_ml), (mean_t, _ess(lw_new))

    ts = jnp.arange(1, t_len)
    keys = jax.random.split(k_scan, t_len - 1)
    log_ml0 = jax.scipy.special.logsumexp(lw0) - jnp.log(float(num_particles))
    (x, lw, log_ml), (means, esss) = jax.lax.scan(
        step, (x0, lw0, log_ml0), (ts, keys)
    )

    w0 = jax.nn.softmax(lw0)
    mean0 = jnp.tensordot(w0, x0, axes=(0, 0))
    filter_means = jnp.concatenate([mean0[None], means], axis=0)
    ess_history = jnp.concatenate([_ess(lw0)[None], esss])
    return SMCResult(log_ml, x, jax.nn.softmax(lw), filter_means, ess_history)


def island_particle_filter(
    ssm: StateSpace,
    ys: Array,
    num_particles: int,
    key: Array,
    mesh,
    particle_axis: str = "particle",
    ess_threshold: float = 0.5,
) -> SMCResult:
    """Island particle filter: NO cross-device state movement at all.

    Each shard ("island", cf. Vergé et al. 2015) runs a complete local
    particle filter with local adaptive systematic resampling; an island
    carries a scalar log-weight (its running marginal-likelihood
    estimate).  The global estimate combines islands by log-mean-exp —
    an UNBIASED estimator.  The only collectives are O(1)/O(d) psums for
    the log-marginal and the weighted filter means; particle state never
    crosses ICI (SURVEY.md §7 hard part #4: "resample locally per shard"
    — the zero-exchange end of that design space; the global-systematic
    variant below is the full-exchange end).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.shape[particle_axis]
    if num_particles % n_dev != 0:
        raise ValueError("num_particles must divide the particle-axis size")
    local_p = num_particles // n_dev
    t_len = ys.shape[0]

    def body(keys_local, shared_key):
        my = jax.lax.axis_index(particle_axis)
        k_isl = jax.random.fold_in(shared_key, my)

        x0 = jax.vmap(ssm.init_sample)(keys_local)
        lw0 = jax.vmap(lambda x: ssm.obs_log_prob(ys[0], x, 0))(x0)

        def island_logmeanexp(v):
            # log( (1/n_dev) sum_islands exp(v) ) over the mesh axis
            m = jax.lax.pmax(v, particle_axis)
            s = jax.lax.psum(jnp.exp(v - m), particle_axis)
            return m + jnp.log(s / n_dev)

        def step(carry, t):
            x, lw, isl_lw = carry
            k_t = jax.random.fold_in(k_isl, t)
            k_res, k_prop = jax.random.split(k_t)

            # local adaptive systematic resampling (island-internal)
            ess = _ess(lw)
            do_resample = ess < ess_threshold * local_p
            idx = systematic_resample_indices(k_res, lw)
            iota = jnp.arange(local_p)
            sel = jnp.where(do_resample, idx, iota)
            x = jnp.take(x, sel, axis=0)
            lse = jax.scipy.special.logsumexp(lw)
            lw = jnp.where(
                do_resample, jnp.zeros_like(lw), lw - lse + jnp.log(float(local_p))
            )

            keys = jax.vmap(lambda i: jax.random.fold_in(k_prop, i))(iota)
            x_new = jax.vmap(lambda kk, xx: ssm.trans_sample(kk, xx, t))(keys, x)
            l_obs = jax.vmap(lambda xx: ssm.obs_log_prob(ys[t], xx, t))(x_new)
            lw_new = lw + l_obs

            # island weight accumulates the local incremental likelihood
            inc = jax.scipy.special.logsumexp(lw_new) - jax.scipy.special.logsumexp(lw)
            isl_lw = isl_lw + inc

            # cross-island weighted filter mean: O(d) psums only
            w_local = jax.nn.softmax(lw_new)
            local_mean = jnp.tensordot(w_local, x_new, axes=(0, 0))
            isl_w = jnp.exp(isl_lw - island_logmeanexp(isl_lw)) / n_dev
            global_mean = jax.lax.psum(isl_w * local_mean, particle_axis)
            ess_global = jax.lax.psum(_ess(lw_new), particle_axis)
            return (x_new, lw_new, isl_lw), (global_mean, ess_global)

        ts = jnp.arange(1, t_len)
        isl_lw0 = jax.scipy.special.logsumexp(lw0) - jnp.log(float(local_p))
        (x, lw, isl_lw), (means, esss) = jax.lax.scan(step, (x0, lw0, isl_lw0), ts)

        log_ml = island_logmeanexp(isl_lw)
        w0 = jax.nn.softmax(lw0)
        mean0 = jax.lax.pmean(jnp.tensordot(w0, x0, axes=(0, 0)), particle_axis)
        filter_means = jnp.concatenate([mean0[None], means], axis=0)
        ess_history = jnp.concatenate(
            [jax.lax.psum(_ess(lw0), particle_axis)[None], esss]
        )
        lw_all = jax.lax.all_gather(lw, particle_axis).reshape(-1)
        return log_ml, x, jax.nn.softmax(lw_all), filter_means, ess_history

    k_particles, k_shared = jax.random.split(key)
    particle_keys = jax.random.split(k_particles, num_particles)
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(particle_axis), P()),
        out_specs=(P(), P(particle_axis), P(), P(), P()),
        check_vma=False,
    )
    log_ml, x, w, means, ess = jax.jit(sharded)(particle_keys, k_shared)
    return SMCResult(log_ml, x, w, means, ess)


def sharded_particle_filter(
    ssm: StateSpace,
    ys: Array,
    num_particles: int,
    key: Array,
    mesh,
    particle_axis: str = "particle",
    ess_threshold: float = 0.5,
    exchange: str = "ppermute",
) -> SMCResult:
    """Particle filter with particles sharded over a mesh axis.

    Global systematic resampling, two state-movement strategies:
      * "ppermute" (default): all-gather ONLY the O(P) weight vector;
        ancestor states travel point-to-point via ppermute ring rounds,
        and only on steps where the adaptive trigger fires
        (ops/resampling.py — VERDICT r1 #7).
      * "gather": the round-1 full state all-gather every step.
    Both produce identical filter means given the same key (the
    resampling indices are the same global systematic draw).
    For a zero-state-exchange alternative see ``island_particle_filter``.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..ops.resampling import (
        distributed_ess,
        distributed_logsumexp,
        ring_exchange,
    )

    n_dev = mesh.shape[particle_axis]
    if num_particles % n_dev != 0:
        raise ValueError("num_particles must divide the particle-axis size")
    local_p = num_particles // n_dev
    t_len = ys.shape[0]
    use_ring = exchange == "ppermute"

    def body(keys_local, shared_key):
        # keys_local: per-shard particle keys; shared_key: replicated, so
        # resampling decisions are IDENTICAL on every shard.
        my = jax.lax.axis_index(particle_axis)

        x0 = jax.vmap(ssm.init_sample)(keys_local)
        lw0 = jax.vmap(lambda x: ssm.obs_log_prob(ys[0], x, 0))(x0)

        def global_mean(lw_local, x_local):
            """Weighted mean over all shards: O(d) psums, no state gather."""
            lse = distributed_logsumexp(lw_local, particle_axis)
            w_local = jnp.exp(lw_local - lse)
            return jax.lax.psum(
                jnp.tensordot(w_local, x_local, axes=(0, 0)), particle_axis
            )

        def step(carry, t):
            x, lw, log_ml = carry
            k_t = jax.random.fold_in(shared_key, t)
            k_res = jax.random.fold_in(k_t, 1)
            k_prop = jax.random.fold_in(k_t, 2)

            # weights only (O(P)): needed for the global systematic CDF
            lw_all = jax.lax.all_gather(lw, particle_axis).reshape(-1)
            ess = _ess(lw_all)
            do_resample = ess < ess_threshold * num_particles
            idx_global = systematic_resample_indices(k_res, lw_all)
            # this shard keeps global slots [my*local_p, (my+1)*local_p)
            my_idx = jax.lax.dynamic_slice_in_dim(idx_global, my * local_p, local_p)
            iota = my * local_p + jnp.arange(local_p)

            if use_ring:
                # state exchange ONLY when resampling triggers; the
                # predicate is replicated so every shard takes the same
                # branch and the ring collectives stay matched
                def do_exchange(x):
                    return ring_exchange(x, my_idx, particle_axis)

                def no_exchange(x):
                    return x

                x = jax.lax.cond(do_resample, do_exchange, no_exchange, x)
            else:
                x_all = jax.lax.all_gather(x, particle_axis)
                x_all = x_all.reshape((-1,) + x_all.shape[2:])
                sel = jnp.where(do_resample, my_idx, iota)
                x = jnp.take(x_all, sel, axis=0)
            lse = jax.scipy.special.logsumexp(lw_all)
            lw = jnp.where(
                do_resample,
                jnp.zeros_like(lw),
                lw - lse + jnp.log(float(num_particles)),
            )

            prop_keys = jax.vmap(lambda i: jax.random.fold_in(k_prop, i))(iota)
            x_new = jax.vmap(lambda kk, xx: ssm.trans_sample(kk, xx, t))(prop_keys, x)
            l_obs = jax.vmap(lambda xx: ssm.obs_log_prob(ys[t], xx, t))(x_new)
            lw_new = lw + l_obs

            inc = (
                distributed_logsumexp(lw_new, particle_axis)
                - distributed_logsumexp(lw, particle_axis)
            )
            log_ml = log_ml + inc

            mean_t = global_mean(lw_new, x_new)
            return (x_new, lw_new, log_ml), (
                mean_t, distributed_ess(lw_new, particle_axis)
            )

        ts = jnp.arange(1, t_len)
        log_ml0 = (
            distributed_logsumexp(lw0, particle_axis)
            - jnp.log(float(num_particles))
        )
        (x, lw, log_ml), (means, esss) = jax.lax.scan(
            step, (x0, lw0, log_ml0), ts
        )
        mean0 = global_mean(lw0, x0)
        filter_means = jnp.concatenate([mean0[None], means], axis=0)
        ess_history = jnp.concatenate(
            [distributed_ess(lw0, particle_axis)[None], esss]
        )
        lw_all = jax.lax.all_gather(lw, particle_axis).reshape(-1)
        return log_ml, x, jax.nn.softmax(lw_all), filter_means, ess_history

    k_particles, k_shared = jax.random.split(key)
    particle_keys = jax.random.split(k_particles, num_particles)
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(particle_axis), P()),
        out_specs=(P(), P(particle_axis), P(), P(), P()),
        check_vma=False,
    )
    log_ml, x, w, means, ess = jax.jit(sharded)(particle_keys, k_shared)
    return SMCResult(log_ml, x, w, means, ess)


def smc_sample(
    ssm: StateSpace,
    ys: Array,
    num_particles: int = 1024,
    key: Optional[Array] = None,
    mesh=None,
    particle_axis: str = "particle",
    ess_threshold: float = 0.5,
    exchange: str = "ppermute",
) -> SMCResult:
    """User entry point: particle-filter an explicit StateSpace spec.

    exchange (sharded only):
      * "ppermute" (default) — exact global systematic resampling;
        weights all-gather (O(P)), ancestor STATE moves point-to-point
        over ppermute ring rounds and only when the adaptive trigger
        fires (ops/resampling.py).
      * "gather" (alias "global") — exact global systematic resampling
        with a full state all-gather every step (round-1 path, kept for
        comparison).
      * "island" — per-shard local resampling, islands combined by
        weight (NO cross-device particle movement; scales to any pod
        size at slightly higher estimator variance).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if mesh is not None:
        if exchange == "global":
            exchange = "gather"
        if exchange not in ("ppermute", "gather", "island"):
            raise ValueError(f"unknown exchange mode {exchange!r}")
        if exchange == "island":
            return island_particle_filter(
                ssm, ys, num_particles, key, mesh, particle_axis, ess_threshold
            )
        return sharded_particle_filter(
            ssm, ys, num_particles, key, mesh, particle_axis, ess_threshold,
            exchange=exchange,
        )
    return jax.jit(
        lambda k: particle_filter(ssm, ys, num_particles, k, ess_threshold)
    )(key)
