"""No-U-Turn Sampler — iterative, fixed-shape, XLA-native.

Net-new vs reference (BASELINE.json: "NUTS/HMC (Pallas leapfrog +
vectorized log-joint)"; SURVEY.md §7.3, "hard parts" #1).  Design notes:

* Multinomial NUTS (Betancourt) with biased progressive sampling, the
  generalized U-turn criterion, and Stan-style divergence threshold.
* The recursive tree of Hoffman & Gelman is rebuilt ITERATIVELY: one
  `lax.while_loop` over doublings, an inner `lax.while_loop` adding one
  leapfrog leaf at a time, and a checkpoint stack of max_depth+1 states
  for U-turn checks — leaf index bit-arithmetic (population_count of the
  leaf index) addresses the stack, so every shape is static and the whole
  sampler jits once and vmaps across chains.
* Positions are flat unconstrained vectors; all inner products are dense
  VPU reductions.  Momenta are forward-time momenta regardless of
  integration direction, so subtree momentum sums need no sign gymnastics.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import ChainState, kinetic_energy

Array = jax.Array


class _Leaf(NamedTuple):
    z: Array
    r: Array
    pe: Array
    grad: Array


class _SubtreeState(NamedTuple):
    n: Array  # leaves added so far
    end: _Leaf  # newest leaf (the subtree's moving end)
    cum_rsum: Array  # sum of momenta over leaves added so far
    log_weight: Array
    prop: _Leaf  # current proposal within the subtree
    z_ckpts: Array  # [max_depth+1, dim]
    r_ckpts: Array
    rsum_ckpts: Array  # cumulative momentum sum BEFORE the checkpoint leaf
    turning: Array
    diverging: Array
    sum_accept: Array
    count: Array
    key: Array


class _TreeState(NamedTuple):
    left: _Leaf
    right: _Leaf
    prop: _Leaf
    r_sum: Array
    log_weight: Array
    depth: Array
    turning: Array
    diverging: Array
    sum_accept: Array
    count: Array
    key: Array


def _one_leapfrog(potential_fn, leaf: _Leaf, step: Array, inv_mass: Array) -> _Leaf:
    r = leaf.r - 0.5 * step * leaf.grad
    z = leaf.z + step * inv_mass * r
    pe, grad = jax.value_and_grad(potential_fn)(z)
    r = r - 0.5 * step * grad
    return _Leaf(z, r, pe, grad)


def _is_turning(rho: Array, r_a: Array, r_b: Array, inv_mass: Array) -> Array:
    va = inv_mass * r_a
    vb = inv_mass * r_b
    return jnp.logical_or(jnp.dot(rho, va) <= 0.0, jnp.dot(rho, vb) <= 0.0)


class NUTS:
    """NUTS kernel config (plugs into mcmc.sample)."""

    def __init__(self, max_depth: int = 10, target_accept: float = 0.8,
                 max_delta_energy: float = 1000.0, pipelined: bool = False,
                 lookahead: int = 16):
        self.max_depth = max_depth
        self.target_accept = target_accept
        self.max_delta_energy = max_delta_energy
        # pipelined=True (vectorized chain_method only): chains start
        # their next draw immediately on U-turn instead of idling until
        # the slowest chain's tree completes — worth ~= the lockstep
        # waste factor (diagnostics 'chain_leapfrog'; 3.16x measured on
        # the eight-schools funnel, 1.35x on the non-centered ARD bench
        # config, 1.0x on well-conditioned posteriors).  lookahead: the
        # output-ring depth — a chain may run at most this many draws
        # ahead of the slowest before idling (vectorized_nuts.py
        # _pipelined_sampling).
        self.pipelined = pipelined
        self.lookahead = lookahead

    def make_step(self, potential_fn: Callable):
        max_depth = self.max_depth
        max_delta = self.max_delta_energy

        def build_subtree(key, start: _Leaf, num_leaves, step, inv_mass, h0, dim, dtype):
            ckpt_shape = (max_depth + 1, dim)
            init = _SubtreeState(
                n=jnp.zeros((), jnp.int32),
                end=start,
                cum_rsum=jnp.zeros((dim,), dtype),
                log_weight=-jnp.inf,
                prop=start,
                z_ckpts=jnp.zeros(ckpt_shape, dtype),
                r_ckpts=jnp.zeros(ckpt_shape, dtype),
                rsum_ckpts=jnp.zeros(ckpt_shape, dtype),
                turning=jnp.asarray(False),
                diverging=jnp.asarray(False),
                sum_accept=jnp.zeros((), dtype),
                count=jnp.zeros((), dtype),
                key=key,
            )

            def cond(s: _SubtreeState):
                return jnp.logical_and(
                    s.n < num_leaves,
                    jnp.logical_not(jnp.logical_or(s.turning, s.diverging)),
                )

            def body(s: _SubtreeState):
                leaf = _one_leapfrog(potential_fn, s.end, step, inv_mass)
                h = leaf.pe + kinetic_energy(leaf.r, inv_mass)
                h = jnp.where(jnp.isnan(h), jnp.inf, h)
                delta = h - h0
                diverging = delta > max_delta
                accept = jnp.exp(jnp.minimum(h0 - h, 0.0))
                sum_accept = s.sum_accept + accept
                count = s.count + 1.0

                n = s.n
                pc = jax.lax.population_count(n)
                even = (n % 2) == 0
                # store checkpoint (left endpoints): slot = popcount(n)
                z_ck = jnp.where(even, s.z_ckpts.at[pc].set(leaf.z), s.z_ckpts)
                r_ck = jnp.where(even, s.r_ckpts.at[pc].set(leaf.r), s.r_ckpts)
                rs_ck = jnp.where(even, s.rsum_ckpts.at[pc].set(s.cum_rsum), s.rsum_ckpts)

                cum_rsum = s.cum_rsum + leaf.r

                # U-turn checks against completed subtrees ending at this
                # (odd) leaf: slots popcount(n)-trailing_ones(n) .. popcount(n)-1.
                # Statically unrolled masked sweep over the max_depth+1 slots
                # (cheap VPU work) — avoids a dynamic-bound while loop, which
                # costs far more in compile time and per-iteration latency.
                trailing_ones = jax.lax.population_count((n ^ (n + 1)) >> 1)
                idx_hi = pc  # exclusive
                idx_lo = pc - trailing_ones
                turning = jnp.asarray(False)
                for k_slot in range(max_depth + 1):
                    active = jnp.logical_and(k_slot >= idx_lo, k_slot < idx_hi)
                    rho = cum_rsum - rs_ck[k_slot]
                    turn_k = _is_turning(rho, r_ck[k_slot], leaf.r, inv_mass)
                    turning = jnp.logical_or(turning, jnp.logical_and(active, turn_k))
                turning = jnp.logical_and(jnp.logical_not(even), turning)

                # progressive multinomial proposal within the subtree
                lw_leaf = h0 - h
                new_lw = jnp.logaddexp(s.log_weight, lw_leaf)
                k1, k2 = jax.random.split(s.key)
                p_swap = jnp.exp(lw_leaf - new_lw)
                swap = jax.random.uniform(k1, ()) < p_swap
                prop = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(swap, a, b), leaf, s.prop
                )

                bad = jnp.logical_or(diverging, turning)
                # on a bad leaf the whole subtree is discarded by the caller;
                # freeze proposal/weights but still record accept stats.
                prop = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(bad, b, a), prop, s.prop
                )
                new_lw = jnp.where(bad, s.log_weight, new_lw)
                cum_rsum = jnp.where(bad, s.cum_rsum, cum_rsum)

                return _SubtreeState(
                    n=n + 1,
                    end=leaf,
                    cum_rsum=cum_rsum,
                    log_weight=new_lw,
                    prop=prop,
                    z_ckpts=z_ck,
                    r_ckpts=r_ck,
                    rsum_ckpts=rs_ck,
                    turning=turning,
                    diverging=diverging,
                    sum_accept=sum_accept,
                    count=count,
                    key=k2,
                )

            return jax.lax.while_loop(cond, body, init)

        def step(key: Array, state: ChainState, step_size: Array, inv_mass: Array):
            dim = state.z.shape[0]
            dtype = state.z.dtype
            k_mom, k_loop = jax.random.split(key)
            r0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
            h0 = state.pe + kinetic_energy(r0, inv_mass)
            leaf0 = _Leaf(state.z, r0, state.pe, state.grad)

            tree0 = _TreeState(
                left=leaf0,
                right=leaf0,
                prop=leaf0,
                r_sum=r0,
                log_weight=jnp.zeros((), dtype),
                depth=jnp.zeros((), jnp.int32),
                turning=jnp.asarray(False),
                diverging=jnp.asarray(False),
                sum_accept=jnp.zeros((), dtype),
                count=jnp.zeros((), dtype),
                key=k_loop,
            )

            def cond(t: _TreeState):
                return jnp.logical_and(
                    t.depth < max_depth,
                    jnp.logical_not(jnp.logical_or(t.turning, t.diverging)),
                )

            def body(t: _TreeState):
                k_dir, k_sub, k_merge, k_next = jax.random.split(t.key, 4)
                go_right = jax.random.bernoulli(k_dir, 0.5)
                step_signed = jnp.where(go_right, step_size, -step_size)
                start = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(go_right, a, b), t.right, t.left
                )
                num_leaves = jnp.left_shift(jnp.asarray(1, jnp.int32), t.depth)
                sub = build_subtree(
                    k_sub, start, num_leaves, step_signed, inv_mass, h0, dim, dtype
                )

                sum_accept = t.sum_accept + sub.sum_accept
                count = t.count + sub.count
                bad_sub = jnp.logical_or(sub.turning, sub.diverging)

                # merge proposal (biased progressive across subtrees)
                p_take = jnp.exp(jnp.minimum(sub.log_weight - t.log_weight, 0.0))
                take = jnp.logical_and(
                    jnp.logical_not(bad_sub),
                    jax.random.uniform(k_merge, ()) < p_take,
                )
                prop = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(take, a, b), sub.prop, t.prop
                )

                # update ends / totals only when subtree is valid
                new_right = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(go_right, a, b), sub.end, t.right
                )
                new_left = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(go_right, b, a), sub.end, t.left
                )
                right = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(bad_sub, b, a), new_right, t.right
                )
                left = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(bad_sub, b, a), new_left, t.left
                )
                r_sum = jnp.where(bad_sub, t.r_sum, t.r_sum + sub.cum_rsum)
                log_weight = jnp.where(
                    bad_sub, t.log_weight, jnp.logaddexp(t.log_weight, sub.log_weight)
                )

                # whole-trajectory U-turn check
                full_turn = _is_turning(r_sum, left.r, right.r, inv_mass)
                turning = jnp.logical_or(sub.turning, full_turn)

                return _TreeState(
                    left=left,
                    right=right,
                    prop=prop,
                    r_sum=r_sum,
                    log_weight=log_weight,
                    depth=t.depth + 1,
                    turning=turning,
                    diverging=sub.diverging,
                    sum_accept=sum_accept,
                    count=count,
                    key=k_next,
                )

            tree = jax.lax.while_loop(cond, body, tree0)

            new_state = ChainState(tree.prop.z, tree.prop.pe, tree.prop.grad)
            accept_prob = tree.sum_accept / jnp.maximum(tree.count, 1.0)
            stats = {
                "accept_prob": accept_prob,
                "diverging": tree.diverging,
                "energy": tree.prop.pe + kinetic_energy(tree.prop.r, inv_mass),
                "num_steps": tree.count.astype(jnp.int32),
                "tree_depth": tree.depth,
            }
            return new_state, stats

        return step


def nuts_sample(model, **kwargs):
    """Convenience: run NUTS on a ProbabilisticModel (see mcmc.sample)."""
    from .mcmc import sample

    kernel = NUTS(**{k: kwargs.pop(k) for k in list(kwargs)
                     if k in ("max_depth", "target_accept", "max_delta_energy")})
    return sample(model, kernel=kernel, **kwargs)
